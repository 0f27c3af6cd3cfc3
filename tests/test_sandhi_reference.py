"""Sentence-level sandhi fixtures against the REAL zh-dict.json
(reference rule coverage: POS-conditioned neutral tone, 不/一, merges,
erhua gating — VERDICT round-1 missing #3)."""

import os

import pytest

from dicttts_tpu.text.pinyin import load_dict
from dicttts_tpu.text.sandhi import SandhiProcessor

REAL_DICT = "/root/reference/data/zh-dict.json"

pytestmark = pytest.mark.skipif(not os.path.exists(REAL_DICT), reason="zh-dict.json absent")


@pytest.fixture(scope="module")
def sp():
    return SandhiProcessor(load_dict(REAL_DICT))


def _reading(sp_, ch, idx):
    """idx is 1-based into the char's dict readings."""
    return sp_.zh_dict.prons(ch)[idx - 1] if idx > 0 else None


def test_bu_before_tone4(sp):
    out = sp.process_sandhi("不是")
    assert _reading(sp, "不", out[0]) == "bú"


def test_bu_before_tone3_stays_bu4(sp):
    out = sp.process_sandhi("不好")
    assert _reading(sp, "不", out[0]) == "bù"


def test_bu_neutral_in_v_bu_v(sp):
    out = sp.process_sandhi("看不懂")
    assert _reading(sp, "不", out[1]) == "bu"


def test_yi_before_tone4(sp):
    out = sp.process_sandhi("一样")
    assert _reading(sp, "一", out[0]) == "yí"


def test_yi_before_tone1(sp):
    out = sp.process_sandhi("一天")
    assert _reading(sp, "一", out[0]) == "yì"


def test_yi_ordinal_stays_tone1(sp):
    out = sp.process_sandhi("第一名")
    assert _reading(sp, "一", out[1]) == "yī"


def test_yi_neutral_between_reduplication(sp):
    # jieba may cut 看一看 as one word or _merge_yi folds 看/一/看
    out = sp.process_sandhi("看一看")
    assert _reading(sp, "一", out[1]) == "yi"


def test_yi_in_numerals_unchanged(sp):
    out = sp.process_sandhi("二一零")
    # numeral context: 一 keeps its citation reading (index set, tone1)
    assert _reading(sp, "一", out[1]) == "yī"


def test_le_particle_neutral(sp):
    out = sp.process_sandhi("走了")
    assert _reading(sp, "了", out[1]) == "le"


def test_de_particle_neutral(sp):
    out = sp.process_sandhi("我的书")
    assert _reading(sp, "的", out[1]) == "de"


def test_de_lexical_exception_e2(sp):
    out = sp.process_sandhi("值得")
    assert _reading(sp, "得", out[1]) == "dé"


def test_zi_suffix_neutral(sp):
    out = sp.process_sandhi("桌子")
    assert _reading(sp, "子", out[1]) == "zi"


def test_zi_must_not_neutral(sp):
    out = sp.process_sandhi("电子")
    r = _reading(sp, "子", out[1])
    assert r in (None, "zǐ")  # never the neutral zi


def test_men_suffix_neutral(sp):
    out = sp.process_sandhi("我们")
    assert _reading(sp, "们", out[1]) == "men"


def test_reduplication_neutral(sp):
    out = sp.process_sandhi("妈妈")
    assert _reading(sp, "妈", out[1]) == "ma"


def test_must_neural_tone_word(sp):
    out = sp.process_sandhi("他的枕头")
    assert _reading(sp, "头", out[3]) in (None, "tou")  # dict may lack neutral tou


def test_erhua_merge_and_neutral(sp):
    # 鸟儿 is in must_erhua: 儿 merges into the word and reads neutral
    out = sp.process_sandhi("鸟儿")
    assert _reading(sp, "儿", out[1]) == "er"


def test_not_erhua_keeps_er2(sp):
    out = sp.process_sandhi("女儿")
    assert _reading(sp, "儿", out[1]) in (None, "ér")


def test_bu_merge_keeps_alignment(sp):
    # 不 merges with the following word; chars after it stay aligned
    out = sp.process_sandhi("我不知道了")
    assert _reading(sp, "不", out[1]) == "bù"  # 知 tone1 -> bu4
    assert _reading(sp, "了", out[4]) == "le"


def test_indices_length_matches_text(sp):
    text = "今天天气真不错，我们一起去看一看吧。"
    out = sp.process_sandhi(text)
    assert len(out) == len(text)
