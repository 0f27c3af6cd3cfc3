"""Mandarin tone-sandhi rule engine -> hard pronunciation overrides.

Capability parity with the reference SandhiProcessor
(/root/reference/data_gen/tts/sandhi_processor.py): `process_sandhi`
produces, per input character, a 1-based index into that character's
pronunciation list in the online dictionary (0 = no override). Those
indices feed S2PA's straight-through rule override at attention time
(models/dict_encoder.apply_pron_rule).

Rules implemented (the reference's active set):
- 不 bu sandhi: bú before a 4th-tone syllable; neutral in V-不-V;
- 一 yi sandhi: yí before 4th tone, yì before 1st/2nd/3rd, yī as ordinal
  (in numerals / at phrase end);
- reduplication: the second char of an XX word takes its toneless reading
  when the dictionary lists one;
- neutral-tone particles (的地得着了过呢吧吗啊呀们): toneless reading when
  listed.
"""

from __future__ import annotations

from dicttts_tpu.text.pinyin import ZhDict, strip_tone

NEUTRAL_PARTICLES = set("的地得着了过呢吧吗啊呀们么哦嘛哪")
DIGITS = set("零一二三四五六七八九十百千万亿两第")

# common obligatory neutral-tone words (second syllable toneless) — the
# linguistic data behind the reference's must_neural_tone_words list
NEUTRAL_TONE_WORDS = {
    "爸爸", "妈妈", "哥哥", "姐姐", "弟弟", "妹妹", "爷爷", "奶奶", "叔叔",
    "姑姑", "舅舅", "婶婶", "太太", "先生", "东西", "衣服", "钥匙", "豆腐",
    "头发", "月亮", "石头", "木头", "枕头", "馒头", "骨头", "拳头", "舌头",
    "指头", "苍蝇", "蘑菇", "葡萄", "玻璃", "萝卜", "喇叭", "蛤蟆", "知了",
    "喜欢", "明白", "清楚", "告诉", "打听", "商量", "打扮", "招呼", "收拾",
    "暖和", "热闹", "客气", "大方", "便宜", "舒服", "糊涂", "漂亮", "干净",
    "意思", "事情", "时候", "地方", "朋友", "丈夫", "学生", "先生", "姑娘",
    "规矩", "力气", "脾气", "福气", "运气", "名字", "麻烦", "功夫", "买卖",
}
# noun suffixes read neutral when word length >= 2
NEUTRAL_SUFFIXES = set("子头们")


def _tone_of_first_reading(zh_dict: ZhDict, char: str) -> int:
    prons = zh_dict.prons(char)
    if not prons:
        return 0
    return strip_tone(prons[0])[1]


def _find_pron_index(zh_dict: ZhDict, char: str, plain: str, tone: int | None) -> int:
    """1-based index of the reading matching (plain syllable, tone);
    tone=None matches the first toneless reading. 0 if absent."""
    for i, p in enumerate(zh_dict.prons(char)):
        p_plain, p_tone = strip_tone(p)
        if p_plain == plain and (tone is None and p_tone == 0 or p_tone == tone):
            return i + 1
    return 0


class SandhiProcessor:
    def __init__(self, zh_dict: ZhDict):
        self.zh_dict = zh_dict

    def process_sandhi(self, text: str, words: list[str] | None = None) -> list[int]:
        """text: the character sequence (no BOS/EOS). words: jieba
        segmentation for reduplication context. Returns pron_modified,
        len(text) entries."""
        out = [0] * len(text)
        for i, ch in enumerate(text):
            nxt = text[i + 1] if i + 1 < len(text) else ""
            prv = text[i - 1] if i > 0 else ""
            if ch == "不":
                if prv and nxt and prv == nxt:  # V-不-V: neutral bu
                    out[i] = _find_pron_index(self.zh_dict, ch, "bu", None)
                elif nxt and _tone_of_first_reading(self.zh_dict, nxt) == 4:
                    out[i] = _find_pron_index(self.zh_dict, ch, "bu", 2)
                else:
                    out[i] = _find_pron_index(self.zh_dict, ch, "bu", 4)
            elif ch == "一":
                in_numeral = (nxt in DIGITS) or (prv in DIGITS) or nxt == ""
                if in_numeral or nxt in "0123456789":
                    out[i] = _find_pron_index(self.zh_dict, ch, "i", 1) or _find_pron_index(
                        self.zh_dict, ch, "yi", 1
                    )
                elif _tone_of_first_reading(self.zh_dict, nxt) == 4:
                    out[i] = _find_pron_index(self.zh_dict, ch, "i", 2) or _find_pron_index(
                        self.zh_dict, ch, "yi", 2
                    )
                else:
                    out[i] = _find_pron_index(self.zh_dict, ch, "i", 4) or _find_pron_index(
                        self.zh_dict, ch, "yi", 4
                    )
            elif ch in NEUTRAL_PARTICLES:
                plain = strip_tone(self.zh_dict.prons(ch)[0])[0] if ch in self.zh_dict else ""
                idx = _find_pron_index(self.zh_dict, ch, plain, None)
                if idx:
                    out[i] = idx
        # word-level rules need the segmentation
        if words is None:
            try:
                import jieba

                words = list(jieba.cut(text))
            except Exception:
                words = []
        pos = 0
        for w in words:
            last = pos + len(w) - 1
            if last >= len(text):
                break
            if len(w) == 2 and w[0] == w[1]:
                # reduplication: second char toneless
                idx = self._toneless_index(w[1])
                if idx:
                    out[pos + 1] = idx
            elif w in NEUTRAL_TONE_WORDS:
                idx = self._toneless_index(w[-1])
                if idx:
                    out[last] = idx
            elif len(w) >= 2 and w[-1] in NEUTRAL_SUFFIXES:
                idx = self._toneless_index(w[-1])
                if idx:
                    out[last] = idx
            pos += len(w)
        return out

    def _toneless_index(self, ch: str) -> int:
        """1-based index of the character's toneless (neutral) reading."""
        if ch not in self.zh_dict:
            return 0
        plain = strip_tone(self.zh_dict.prons(ch)[0])[0]
        return _find_pron_index(self.zh_dict, ch, plain, None)
