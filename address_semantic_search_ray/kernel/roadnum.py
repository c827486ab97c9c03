"""Road-number text -> int.

Port of ``SimilarityComputer.translateRoadNum`` (``SimilarityComputer.java:262-323``):
ASCII + full-width digits win if present; otherwise CJK numerals with the
十-composition rules (十→10, 十五→15, 四十七→47); prefix chars like 甲 ignored.
Golden cases: ``test/SimilarityServiceTest.java:20-54``.
"""

from __future__ import annotations

_FULLWIDTH = {"０": "0", "１": "1", "２": "2", "３": "3", "４": "4",
              "５": "5", "６": "6", "７": "7", "８": "8", "９": "9"}
_CJK_DIGIT = {"一": "1", "二": "2", "三": "3", "四": "4", "五": "5",
              "六": "6", "七": "7", "八": "8", "九": "9"}


def translate_road_num(text: str) -> int:
    if not text:
        return 0
    digits = []
    for c in text:
        if "0" <= c <= "9":
            digits.append(c)
        elif c in _FULLWIDTH:
            digits.append(_FULLWIDTH[c])
    if digits:
        return int("".join(digits))

    sb: list[str] = []
    is_ten = False
    for c in text:
        if is_ten:
            pre = len(sb) > 0
            post = c in _CJK_DIGIT
            if pre:
                if not post:
                    sb.append("0")
            else:
                if post:
                    sb.append("1")
                else:
                    sb.append("10")
            is_ten = False
        if c in _CJK_DIGIT:
            sb.append(_CJK_DIGIT[c])
            continue
        if c == "十":
            is_ten = True
            continue
        if sb:
            break
    if is_ten:
        if sb:
            sb.append("0")
        else:
            sb.append("10")
    if sb:
        return int("".join(sb))
    return 0
