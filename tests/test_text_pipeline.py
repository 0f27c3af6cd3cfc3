import json
import os

import numpy as np
import pytest

from dicttts_tpu.eval.metrics import dtw_distance, duration_errors, f0_dtw
from dicttts_tpu.eval.per import edit_distance, pron_error_rate, wer
from dicttts_tpu.text.pinyin import ZhG2P, load_dict, pinyin_to_tone3
from dicttts_tpu.text.sandhi import SandhiProcessor
from dicttts_tpu.text.text_norm import digits2chn, normalize_text, num2chn
from dicttts_tpu.text.textgrid import parse_textgrid, textgrid_to_mel2ph

TOY_DICT = {
    "你": {"nǐ": ["代词，称对方。"]},
    "好": {"hǎo": ["优点多的。"], "hào": ["喜爱。"]},
    "不": {"bù": ["否定副词。"], "fǒu": ["古同否。"], "bú": ["口语变调。"], "bu": ["轻声。"]},
    "一": {"yī": ["数名。"], "yi": ["轻声。"], "yí": ["变调阳平。"], "yì": ["变调去声。"]},
    "是": {"shì": ["表示肯定。"]},
    "天": {"tiān": ["日。"]},
    "的": {"de": ["助词。"], "dí": ["真实。"], "dì": ["目标。"]},
    "妈": {"mā": ["母亲。"], "ma": ["轻声。"]},
}


@pytest.fixture()
def toy_dict_path(tmp_path):
    p = str(tmp_path / "zh-dict.json")
    json.dump(TOY_DICT, open(p, "w"), ensure_ascii=False)
    return p


def test_num2chn():
    assert num2chn(0) == "零"
    assert num2chn(15) == "十五"
    assert num2chn(105) == "一百零五"
    # 两-selection (reference num2chn alt_two): 二 -> 两 before 百/千/万/亿
    assert num2chn(1234) == "一千两百三十四"
    assert num2chn(1234, alt_two=False) == "一千二百三十四"
    assert num2chn(2000) == "两千"
    assert num2chn(22) == "二十二"
    assert num2chn(220000) == "二十二万"
    assert num2chn(10000) == "一万"
    assert num2chn(100000001) == "一亿零一"


def test_normalize_text_rules():
    assert normalize_text("我有3个苹果") == "我有三个苹果"
    assert normalize_text("占50%") == "占百分之五十"
    assert "点" in normalize_text("3.5元")
    assert normalize_text("电话13800138000") == "电话" + digits2chn("13800138000")
    assert normalize_text("2022年") == "二零二二年"
    assert normalize_text("3-5天") == "三到五天"


def test_g2p_separators(toy_dict_path):
    g2p = ZhG2P(toy_dict_path)
    phs, txt = g2p.process("你好")
    # jieba may keep 你好 as one word: phones with | between chars
    assert "n" in phs and "i3" in phs and "h" in phs and "ao3" in phs
    joined = " ".join(phs)
    assert "#" in joined or "|" in joined


def test_g2p_english_passthrough(toy_dict_path):
    g2p = ZhG2P(toy_dict_path)
    phs, _ = g2p.process("hello你好")
    assert "ENG" in phs


def test_sandhi_bu_yi(toy_dict_path):
    sp = SandhiProcessor(load_dict(toy_dict_path))
    # 不是: 是 is 4th tone -> bú (index 3 in TOY_DICT['不'])
    out = sp.process_sandhi("不是", None)
    assert out[0] == 3
    # 不好: 好 is 3rd tone -> bù stays (index 1)
    assert sp.process_sandhi("不好", None)[0] == 1
    # 一天: 天 1st tone -> yì (index 4)
    assert sp.process_sandhi("一天", None)[0] == 4
    # 一是: 是 4th tone -> yí (index 3)
    assert sp.process_sandhi("一是", None)[0] == 3
    # particle 的 -> toneless reading (index 1 is 'de' which IS toneless)
    assert sp.process_sandhi("好的", None)[1] == 1
    # reduplication 妈妈 -> second char neutral 'ma' (index 2)
    assert sp.process_sandhi("妈妈", ["妈妈"])[1] == 2


TG = """File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 1.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 4
        intervals [1]:
            xmin = 0
            xmax = 0.1
            text = ""
        intervals [2]:
            xmin = 0.1
            xmax = 0.5
            text = "n"
        intervals [3]:
            xmin = 0.5
            xmax = 0.9
            text = "i3"
        intervals [4]:
            xmin = 0.9
            xmax = 1.0
            text = "sil"
"""


def test_parse_textgrid():
    ivs = parse_textgrid(TG)
    assert len(ivs) == 4
    assert ivs[1] == (0.1, 0.5, "n")


def test_textgrid_to_mel2ph():
    ivs = parse_textgrid(TG)
    hop, sr = 256, 22050
    n_frames = int(1.0 * sr / hop) + 1
    ph_list = ["<BOS>", "n", "i3", "<EOS>"]
    mel2ph, durs = textgrid_to_mel2ph(ivs, ph_list, n_frames, hop, sr)
    assert len(mel2ph) == n_frames
    assert sum(durs) == n_frames
    # leading silence -> BOS, trailing -> EOS
    assert mel2ph[0] == 1
    assert mel2ph[-1] == 4
    # middle frames map to n then i3
    assert mel2ph[n_frames // 3] == 2
    assert mel2ph[2 * n_frames // 3] == 3


def test_edit_distance_and_wer():
    assert edit_distance(["a", "b"], ["a", "b"]) == 0
    assert edit_distance(["a", "b"], ["a", "c"]) == 1
    assert edit_distance(["a"], ["a", "b"]) == 1
    assert wer([["x", "y"]], [["x", "z"]]) == 0.5


def test_pron_error_rate():
    labels = {"u1": ["ni3", "hao3"], "u2": ["shi4"]}
    preds = {"u1": ["ni3", "hao4"], "u2": ["shi4"], "u3": ["ignored"]}
    per = pron_error_rate(preds, labels)
    assert abs(per - 1 / 3) < 1e-9


def test_dtw():
    assert dtw_distance([1, 2, 3], [1, 2, 3]) == 0
    assert dtw_distance([1, 2, 3], [1, 2, 2, 3]) == 0  # warping absorbs repeats
    assert f0_dtw(np.array([100.0, 0.0, 200.0]), np.array([100.0, 200.0])) == 0


def test_duration_errors():
    out = duration_errors(np.array([2.0, 3.0]), np.array([2.0, 5.0]), np.array([1, 1]))
    assert out["wdur_abs"] == 1.0 and out["sdur_abs"] == 2.0
