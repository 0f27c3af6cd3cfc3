"""Chinese non-standard-word (NSW) text normalization.

Capability parity with the reference normalizer
(/root/reference/utils/text_norm.py, NSWNormalizer.normalize :603-718):
verbalizes, in the reference's cascade order, dates (2- and 4-digit years
read digit-wise), money (块/角/毛/分 + magnitude-suffixed 元/万/亿...),
mobile/fixed phone numbers, fractions, percentages, quantifier-attached
cardinals, decimals, long digit codes (digit-by-digit), remaining numbers,
and the letters-2-letters restore (O2O/B2C, :608-616). Implemented fresh as
a compact rule cascade rather than the reference's class hierarchy.

Number reading implements the reference's 两-selection (num2chn alt_two,
:383-394): 二 reads 两 before 百/千/万/亿 unless preceded by 十.
`chn2num` parses Chinese numerals back to integers (:233-317 capability).

Documented divergence: we read 15 as 十五 (idiomatic) where the reference
emits 一十五, and `digits2chn` offers the TTS-conventional 幺 for 1
(default off — the reference reads phone digits with 一).
"""

from __future__ import annotations

import re
import string

DIGITS = "零一二三四五六七八九"
UNITS_SMALL = ["", "十", "百", "千"]
UNITS_BIG = ["", "万", "亿", "万亿"]

CHINESE_PUNCS = "！？｡。＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠｢｣､、〃《》「」『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—‘'‛“”„‟…‧﹏"

# quantifiers that attach a cardinal reading to the preceding number
# (reference COM_QUANTIFIERS, text_norm.py:41-47 — data list)
COM_QUANTIFIERS = (
    "(匹|张|座|回|场|尾|条|个|首|阙|阵|网|炮|顶|丘|棵|只|支|袭|辆|挑|担|颗|壳|窠|曲|墙|群|腔|"
    "砣|座|客|贯|扎|捆|刀|令|打|手|罗|坡|山|岭|江|溪|钟|队|单|双|对|出|口|头|脚|板|跳|枝|件|贴|"
    "针|线|管|名|位|身|堂|课|本|页|家|户|层|丝|毫|厘|分|钱|两|斤|担|铢|石|钧|锱|忽|(千|毫|微)克|"
    "毫|厘|分|寸|尺|丈|里|寻|常|铺|程|(千|分|厘|毫|微)米|撮|勺|合|升|斗|石|盘|碗|碟|叠|桶|笼|盆|"
    "盒|杯|钟|斛|锅|簋|篮|盘|桶|罐|瓶|壶|卮|盏|箩|箱|煲|啖|袋|钵|年|月|日|季|刻|时|周|天|秒|分|旬|"
    "纪|岁|世|更|夜|春|夏|秋|冬|代|伏|辈|丸|泡|粒|颗|幢|堆|条|根|支|道|面|片|张|颗|块|元)"
)
CURRENCY_UNITS = "((亿|千万|百万|万|千|百)|(亿|千万|百万|万|千|百|)元|(亿|千万|百万|万|千|百|)块|角|毛|分)"


def num2chn(num: int, alt_two: bool = True) -> str:
    """Integer -> Chinese reading (0 <= num < 1e16); 两-selection when
    alt_two (reference num2chn alt_two semantics)."""
    if num == 0:
        return DIGITS[0]
    parts = []
    group_idx = 0
    while num > 0:
        group = num % 10000
        if group:
            parts.append(_group2chn(group) + UNITS_BIG[group_idx])
        elif parts and not parts[-1].startswith(DIGITS[0]):
            parts.append(DIGITS[0])
        num //= 10000
        group_idx += 1
    out = "".join(reversed(parts))
    out = re.sub(f"{DIGITS[0]}+", DIGITS[0], out).rstrip(DIGITS[0]) or DIGITS[0]
    # idiomatic 一十X -> 十X at the very front
    if out.startswith("一十"):
        out = out[1:]
    if alt_two:
        # 二 -> 两 before 百/千/万/亿 unless right after 十
        out = re.sub(r"(?<!十)二(?=[百千万亿])", "两", out)
    return out


def _group2chn(group: int) -> str:
    s = ""
    zero_pending = False
    for pos in range(3, -1, -1):
        d = (group // 10**pos) % 10
        if d == 0:
            if s:
                zero_pending = True
            continue
        if zero_pending:
            s += DIGITS[0]
            zero_pending = False
        s += DIGITS[d] + UNITS_SMALL[pos]
    return s


def chn2num(text: str) -> int:
    """Chinese numerals -> integer (reference chn2num capability,
    text_norm.py:233-317). Handles 两, mixed units, and digit strings."""
    table = {c: i for i, c in enumerate(DIGITS)}
    table["两"] = 2
    small = {"十": 10, "百": 100, "千": 1000}
    big = {"万": 10**4, "亿": 10**8}
    if text and all(c in table for c in text):  # digit-by-digit string
        return int("".join(str(table[c]) for c in text))
    total, section, current = 0, 0, 0
    for ch in text:
        if ch in table:
            current = table[ch]
        elif ch in small:
            section += (current or 1) * small[ch]
            current = 0
        elif ch in big:
            total = (total + section + current) * big[ch]
            section, current = 0, 0
    return total + section + current


def digits2chn(s: str, use_yao: bool = False) -> str:
    """Digit-by-digit reading (phone numbers, codes). The reference reads
    1 as 一 (num2chn alt_one=False); use_yao=True gives the common TTS 幺."""
    one = "幺" if use_yao else "一"
    table = {"0": "零", "1": one, "2": "二", "3": "三", "4": "四",
             "5": "五", "6": "六", "7": "七", "8": "八", "9": "九"}
    return "".join(table.get(c, c) for c in s)


def number2chn(s: str) -> str:
    """Decimal string -> Chinese reading."""
    neg = s.startswith("-")
    s = s.lstrip("+-")
    if "." in s:
        int_part, frac = s.split(".", 1)
        out = num2chn(int(int_part or "0")) + "点" + "".join(DIGITS[int(c)] for c in frac if c.isdigit())
    else:
        out = num2chn(int(s))
    return ("负" if neg else "") + out


class NSWNormalizer:
    """Rule cascade in the reference's order; call `.normalize()`."""

    def __init__(self, text: str):
        self.text = text

    def normalize(self, remove_punc: bool = False) -> str:
        t = self.text
        # dates: 4-digit (19xx/20xx) or 2-digit ([089]x) years digit-wise
        t = re.sub(
            r"((?:19|20)\d{2}|[089]\d)年",
            lambda m: digits2chn(m.group(1)) + "年",
            t,
        )
        t = re.sub(r"(\d{1,2})月", lambda m: num2chn(int(m.group(1))) + "月", t)
        t = re.sub(r"(\d{1,2})([日号])", lambda m: num2chn(int(m.group(1))) + m.group(2), t)
        # times
        t = re.sub(
            r"(\d{1,2}):(\d{2})(?::(\d{2}))?",
            lambda m: num2chn(int(m.group(1))) + "点"
            + (num2chn(int(m.group(2))) + "分" if m.group(2) != "00" else "")
            + (num2chn(int(m.group(3))) + "秒" if m.group(3) else ""),
            t,
        )
        # money: 12块5 / 34.5元 / 20.1万元 / 40多块钱 / ¥5 (reference :630-636)
        t = re.sub(r"[¥￥](\d+(?:\.\d+)?)", lambda m: number2chn(m.group(1)) + "元", t)
        t = re.sub(
            r"(\d+(?:\.\d+)?)([多余几]?)" + CURRENCY_UNITS + r"(\d)?",
            lambda m: number2chn(m.group(1)) + m.group(2) + m.group(3)
            + (num2chn(int(m.group(7))) if m.group(7) else ""),
            t,
        )
        # phones: mobile (+86 1xx...) and fixed (area-code dash); digit
        # boundaries keep them from firing inside longer codes (the
        # reference anchors with \D, :644-657)
        t = re.sub(
            r"(?<!\d)(?:\+?86 ?)?(1[3-9]\d{9})(?!\d)",
            lambda m: digits2chn(m.group(1)),
            t,
        )
        t = re.sub(
            r"(?<!\d)(0(?:10|2\d|[3-9]\d{2}))-?([1-9]\d{6,7})(?!\d)",
            lambda m: digits2chn(m.group(1)) + digits2chn(m.group(2)),
            t,
        )
        # fractions and percentages
        t = re.sub(r"(\d+)/(\d+)", lambda m: num2chn(int(m.group(2))) + "分之" + num2chn(int(m.group(1))), t)
        t = t.replace("％", "%")
        t = re.sub(r"(\d+(?:\.\d+)?)%", lambda m: "百分之" + number2chn(m.group(1)), t)
        # ranges 3-5 -> 三到五
        t = re.sub(r"(\d+)[-~](\d+)", lambda m: num2chn(int(m.group(1))) + "到" + num2chn(int(m.group(2))), t)
        # cardinal + quantifier (量词) context (reference :675-681)
        t = re.sub(
            r"(\d+(?:\.\d+)?)([多余几]?)" + COM_QUANTIFIERS,
            lambda m: number2chn(m.group(1)) + m.group(2) + m.group(3),
            t,
        )
        # long digit codes: digit-by-digit (reference Digit, 4-32 digits —
        # we keep 7+ so years/quantities fall through to cardinal reading)
        t = re.sub(r"\d{7,}", lambda m: digits2chn(m.group(0)), t)
        # remaining numbers: quantity reading
        t = re.sub(r"\d+(?:\.\d+)?", lambda m: number2chn(m.group(0)), t)
        # O2O/B2C: restore the digit between ASCII letters (reference
        # _particular, :608-616 — the '2' is later read as English)
        t = re.sub(r"([a-zA-Z]+)二([a-zA-Z]+)", r"\g<1>2\g<2>", t)
        if remove_punc:
            old = CHINESE_PUNCS + string.punctuation
            t = t.translate(str.maketrans(old, " " * len(old)))
        return t


def normalize_text(text: str) -> str:
    return NSWNormalizer(text).normalize()
