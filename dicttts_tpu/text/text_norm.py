"""Chinese non-standard-word (NSW) text normalization.

Capability parity with the reference normalizer
(/root/reference/utils/text_norm.py, NSWNormalizer): verbalizes numbers,
dates, times, percentages, fractions, money, phone numbers and digit
strings into Chinese characters before g2p. Implemented fresh as a compact
rule cascade (regex -> verbalizer) rather than the reference's class
hierarchy.
"""

from __future__ import annotations

import re

DIGITS = "零一二三四五六七八九"
UNITS_SMALL = ["", "十", "百", "千"]
UNITS_BIG = ["", "万", "亿", "万亿"]


def num2chn(num: int) -> str:
    """Integer -> Chinese reading (0 <= num < 1e16)."""
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


def digits2chn(s: str) -> str:
    """Digit-by-digit reading (phone numbers, codes); 1 reads 幺."""
    table = {"0": "零", "1": "幺", "2": "二", "3": "三", "4": "四",
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
    """Rule cascade; call `.normalize()`."""

    def __init__(self, text: str):
        self.text = text

    def normalize(self) -> str:
        t = self.text
        t = re.sub(r"(\d{4})年", lambda m: digits2chn(m.group(1)).replace("幺", "一") + "年", t)
        t = re.sub(r"(\d{1,2})月", lambda m: num2chn(int(m.group(1))) + "月", t)
        t = re.sub(r"(\d{1,2})[日号]", lambda m: num2chn(int(m.group(1))) + ("日" if "日" in m.group(0) else "号"), t)
        t = re.sub(
            r"(\d{1,2}):(\d{2})(?::(\d{2}))?",
            lambda m: num2chn(int(m.group(1))) + "点"
            + (num2chn(int(m.group(2))) + "分" if m.group(2) != "00" else "")
            + (num2chn(int(m.group(3))) + "秒" if m.group(3) else ""),
            t,
        )
        t = re.sub(r"(\d+(?:\.\d+)?)%", lambda m: "百分之" + number2chn(m.group(1)), t)
        t = re.sub(r"(\d+)/(\d+)", lambda m: num2chn(int(m.group(2))) + "分之" + num2chn(int(m.group(1))), t)
        t = re.sub(r"[¥￥](\d+(?:\.\d+)?)", lambda m: number2chn(m.group(1)) + "元", t)
        t = re.sub(r"(\d+(?:\.\d+)?)元", lambda m: number2chn(m.group(1)) + "元", t)
        # phone-like long digit strings: digit-by-digit
        t = re.sub(r"\d{7,}", lambda m: digits2chn(m.group(0)), t)
        # ranges 3-5 -> 三到五
        t = re.sub(r"(\d+)[-~](\d+)", lambda m: num2chn(int(m.group(1))) + "到" + num2chn(int(m.group(2))), t)
        # remaining numbers: quantity reading
        t = re.sub(r"\d+(?:\.\d+)?", lambda m: number2chn(m.group(0)), t)
        return t


def normalize_text(text: str) -> str:
    return NSWNormalizer(text).normalize()
