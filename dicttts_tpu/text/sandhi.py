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
        # reduplication within segmented words: second char toneless
        if words:
            pos = 0
            for w in words:
                if len(w) == 2 and w[0] == w[1] and pos + 1 < len(text):
                    ch = w[1]
                    plain = strip_tone(self.zh_dict.prons(ch)[0])[0] if ch in self.zh_dict else ""
                    idx = _find_pron_index(self.zh_dict, ch, plain, None)
                    if idx:
                        out[pos + 1] = idx
                pos += len(w)
        return out
