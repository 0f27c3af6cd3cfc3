"""scripts/pron_inspect.py — pron_utils-equivalent inspection CLI."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_meta(path, rows):
    with open(path, "w", encoding="utf-8") as f:
        f.write(",item_name,text,pinyin_tokens,wav_fn_pred,wav_fn_gt\n")
        for i, (name, text, toks) in enumerate(rows):
            f.write(f"{i},{name},{text},{toks},p.wav,g.wav\n")


def test_tsv_label_parsing(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from pron_inspect import load_tsv_labels

    lab = tmp_path / "labels.tsv"
    # reference pron_utils.get_label format: alternating char/pinyin, odd
    # indices are the syllables; tone-5 stripped
    lab.write_text("000001\t卡 ka3 尔 er3 普 pu3\n000002\t门 men5\n", encoding="utf-8")
    gold, ids = load_tsv_labels(str(lab))
    assert gold == [["ka3", "er3", "pu3"], ["men"]]
    assert ids == ["000001", "000002"]


def test_inspect_cli_end_to_end(tmp_path):
    labels = tmp_path / "labels.csv"
    labels.write_text(
        ",item_name,spk,txt,ph,wav_fn,others\n"
        "0,1,SPK1,卡尔普,<BOS> k a3 | er3 | p u3 <EOS>,x.wav,{}\n",
        encoding="utf-8",
    )
    good = tmp_path / "run_good"
    bad = tmp_path / "run_bad"
    good.mkdir()
    bad.mkdir()
    _write_meta(good / "meta.csv", [("1", "卡尔普", "k a3  er3 p u3")])
    _write_meta(bad / "meta.csv", [("1", "卡尔普", "k a4  er3 p u3")])
    # a toy dict where 卡 is a heteronym (2 readings)
    d = tmp_path / "dict.json"
    d.write_text(
        json.dumps({"卡": {"kǎ": ["g"], "qiǎ": ["g"]}, "尔": {"ěr": ["g"]}}, ensure_ascii=False),
        encoding="utf-8",
    )
    out = subprocess.run(
        [sys.executable, "scripts/pron_inspect.py", str(good), str(bad),
         "--labels", str(labels), "--dict_path", str(d)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    lines = [l for l in out.stdout.splitlines() if l.startswith("|") and "run_" in l]
    assert len(lines) == 2
    good_line = next(l for l in lines if "run_good" in l)
    bad_line = next(l for l in lines if "run_bad" in l)
    assert "| 0 | 0.0 |" in good_line.replace("  ", " ")  # 0 err items, 0 PER
    assert "ka4" in out.stdout and "ka3" in out.stdout  # mismatch printed
    assert "| 1 |" in bad_line  # one utterance with errors
