import os

import yaml

from dicttts_tpu.config import Config, deep_merge, load_config, parse_override_string


def _write(path, data):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(data, f)


def test_inheritance_chain(tmp_path):
    root = str(tmp_path)
    _write(f"{root}/base.yaml", {"a": 1, "b": {"c": 2, "d": 3}, "lr": 0.1})
    _write(f"{root}/mid.yaml", {"base_config": "./base.yaml", "b": {"c": 20}, "e": "x"})
    _write(f"{root}/leaf.yaml", {"base_config": ["./mid.yaml"], "a": 100})
    cfg = load_config(config=f"{root}/leaf.yaml", save=False)
    assert cfg["a"] == 100
    assert cfg["b"] == {"c": 20, "d": 3}  # deep merge
    assert cfg["e"] == "x"
    assert cfg["lr"] == 0.1


def test_multiple_bases_later_wins(tmp_path):
    root = str(tmp_path)
    _write(f"{root}/b1.yaml", {"k": 1, "only1": True})
    _write(f"{root}/b2.yaml", {"k": 2, "only2": True})
    _write(f"{root}/leaf.yaml", {"base_config": ["./b1.yaml", "./b2.yaml"]})
    cfg = load_config(config=f"{root}/leaf.yaml", save=False)
    assert cfg["k"] == 2 and cfg["only1"] and cfg["only2"]


def test_cycle_guard(tmp_path):
    root = str(tmp_path)
    _write(f"{root}/a.yaml", {"base_config": "./b.yaml", "a": 1})
    _write(f"{root}/b.yaml", {"base_config": "./a.yaml", "b": 2})
    cfg = load_config(config=f"{root}/a.yaml", save=False)
    assert cfg["a"] == 1 and cfg["b"] == 2


def test_override_string_typed():
    cfg = {"lr": 0.1, "flag": False, "dims": [1, 2], "nest": {"x": 5}, "name": "a"}
    parse_override_string("lr=2,flag=True,dims=[3 4],nest.x=9,name=b,new_int=7", cfg)
    assert cfg["lr"] == 2.0 and isinstance(cfg["lr"], float)
    assert cfg["flag"] is True
    assert cfg["dims"] == [3, 4]
    assert cfg["nest"]["x"] == 9
    assert cfg["name"] == "b"
    assert cfg["new_int"] == 7


def test_exp_dir_persistence_and_reset(tmp_path):
    root = str(tmp_path)
    _write(f"{root}/c.yaml", {"lr": 0.1})
    ckpt = f"{root}/ckpts"
    cfg = load_config(config=f"{root}/c.yaml", exp_name="e1", overrides="lr=0.5", checkpoints_root=ckpt)
    assert cfg["lr"] == 0.5
    # saved config takes precedence over the yaml tree
    cfg2 = load_config(config=f"{root}/c.yaml", exp_name="e1", checkpoints_root=ckpt)
    assert cfg2["lr"] == 0.5
    # unless reset
    cfg3 = load_config(config=f"{root}/c.yaml", exp_name="e1", reset=True, checkpoints_root=ckpt, save=False)
    assert cfg3["lr"] == 0.1


def test_frozen_config_wrapper():
    c = Config({"a": 1, "b": {"c": 2}})
    assert c.a == 1 and c["b"]["c"] == 2 and c.get("zz", 7) == 7
    try:
        c.a = 5
        raise AssertionError("should be immutable")
    except AttributeError:
        pass
    assert c.replace(a=9).a == 9 and c.a == 1


def test_deep_merge_no_shared_state():
    dst = {"x": {"y": 1}}
    deep_merge(dst, {"x": {"z": 2}, "w": 3})
    assert dst == {"x": {"y": 1, "z": 2}, "w": 3}


def test_shipped_configs_cls_paths_resolve():
    """Every *_cls dotted path in every shipped yaml must import (guards
    against configs pointing at modules that don't exist)."""
    import glob
    import importlib

    import dicttts_tpu

    cfg_root = os.path.join(os.path.dirname(dicttts_tpu.__file__), "configs")
    yamls = glob.glob(os.path.join(cfg_root, "**", "*.yaml"), recursive=True)
    assert yamls, "no shipped configs found"
    checked = 0
    for path in yamls:
        data = yaml.safe_load(open(path)) or {}
        for key, val in data.items():
            if not (key.endswith("_cls") and isinstance(val, str) and "." in val):
                continue
            module_name, cls_name = val.rsplit(".", 1)
            mod = importlib.import_module(module_name)
            assert hasattr(mod, cls_name), f"{path}: {key}={val} has no attr {cls_name}"
            checked += 1
    assert checked >= 7  # task_cls x5 + pre_align_cls + binarizer_cls


def test_every_dataset_config_launches_its_task():
    """Every shipped dataset recipe must resolve through the config DAG and
    construct its task object (VERDICT r2 #7: all baselines launchable from
    shipped configs, no hand-written YAML needed)."""
    import glob
    import importlib

    import dicttts_tpu

    cfg_root = os.path.join(os.path.dirname(dicttts_tpu.__file__), "configs")
    yamls = glob.glob(os.path.join(cfg_root, "datasets", "**", "*.yaml"), recursive=True)
    built = 0
    for path in sorted(yamls):
        cfg = load_config(config=path, save=False)
        if "base_text2mel" in path:  # shared fragment, not a launchable leaf
            continue
        task_path = cfg.get("task_cls")
        assert task_path, f"{path} resolves to no task_cls"
        module_name, cls_name = task_path.rsplit(".", 1)
        task_cls = getattr(importlib.import_module(module_name), cls_name)
        task_cls(cfg)  # model + optimizer wiring must build without data
        built += 1
    # dict_tts x2, hifigan x2, fs2, ps_flow, ps_adv
    assert built >= 7, f"only {built} dataset recipes built"
