"""Strict-reference NSW mode: normalized text must be string-identical to
the ACTUAL reference normalizer (/root/reference/utils/text_norm.py) on a
20+-sentence fixture covering the divergent categories (VERDICT r2 #9).

The reference module is loaded as a test oracle only (like
test_model_parity.py loads the torch modules)."""

import importlib.util
import os

import pytest

REF_FN = "/root/reference/utils/text_norm.py"


def _ref_norm():
    spec = importlib.util.spec_from_file_location("ref_text_norm", REF_FN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.NSWNormalizer


FIXTURE = [
    # digit codes (4-32 digits -> digit-by-digit in the reference)
    "编号2048",
    "12306订票",
    "房间号是1001",
    "密码是83749921",
    # times are NOT verbalized by the reference (':' is punctuation)
    "3:15开会",
    "12:00整",
    # dates
    "2022年1月5日",
    "89年3月7日",
    "10月10日",
    # money
    "这件衣服12块5",
    "花了34.5元",
    "共1000000元",
    "大概30多块钱",
    # phones
    "电话13812345678",
    # fractions / percentages / decimals
    "占比3/4",
    "涨了20%",
    "1.5倍",
    "0.5毫米",
    "1/3的人",
    # quantifier cardinals incl. 两-selection
    "他有2个苹果",
    "200斤",
    "2只猫",
    "一共115元",
    "15个人",
    "今年55岁",
    "第15名",
]


@pytest.mark.skipif(not os.path.exists(REF_FN), reason="reference tree absent")
def test_strict_mode_matches_reference_exactly():
    from dicttts_tpu.text.text_norm import NSWNormalizer

    Ref = _ref_norm()
    mismatches = []
    for s in FIXTURE:
        ref = Ref(s).normalize()  # reference default: remove_punc=True
        ours = NSWNormalizer(s).normalize(remove_punc=True, strict_reference=True)
        if ref != ours:
            mismatches.append((s, ref, ours))
    assert not mismatches, "\n".join(f"{s!r}: ref={r!r} ours={o!r}" for s, r, o in mismatches)


def test_default_mode_keeps_tts_readings():
    """The non-strict default intentionally verbalizes times and reads
    4-6-digit quantities as cardinals."""
    from dicttts_tpu.text.text_norm import NSWNormalizer

    assert "三点十五分" in NSWNormalizer("3:15开会").normalize()
    assert "两千零四十八" in NSWNormalizer("共2048人参加").normalize()


def test_g2p_strict_flag_threads_through():
    """nsw_strict_reference must flow from config into the g2p preprocess."""
    import json

    from dicttts_tpu.text.pinyin import ZhG2P

    toy = {"编": {"biān": ["g"]}, "号": {"hào": ["g"]}}
    fn = "/tmp/strict_toy_dict.json"
    json.dump(toy, open(fn, "w"), ensure_ascii=False)
    strict = ZhG2P(fn, strict_nsw=True).preprocess("编号2048")
    loose = ZhG2P(fn, strict_nsw=False).preprocess("编号2048")
    assert "二零四八" in strict
    assert "两千零四十八" in loose
