"""Java-parity string helpers.

The reference's ``utils/StringUtil.java`` substring helpers use *inclusive*
end indices and return the input unchanged for ``begin<=0`` — a recurring
off-by-one trap (``StringUtil.java:92-112``). These helpers replicate that
exactly so the interpreter-chain ports stay line-for-line comparable.
"""

from __future__ import annotations


def sub_from(text: str, begin: int) -> str:
    # StringUtil.substring(text, beginIndex) — begin<=0 returns text unchanged
    if not text or begin <= 0:
        return text
    if begin > len(text) - 1:
        return ""
    return text[begin:]


def sub_incl(text: str, begin: int, end: int) -> str:
    # StringUtil.substring(text, beginIndex, endIndex) — endIndex INCLUSIVE
    if not text:
        return text
    s = 0 if begin <= 0 else begin
    e = len(text) - 1 if end >= len(text) - 1 else end
    if s > e:
        return ""
    return text[s : e + 1]


def head(text: str, length: int) -> str:
    if text is None or len(text) <= length:
        return text
    if length <= 0:
        return ""
    return text[:length]


def tail(text: str, length: int) -> str:
    if text is None or len(text) <= length:
        return text
    if length <= 0:
        return ""
    return text[len(text) - length :]


def java_trim(text: str) -> str:
    """Java String.trim(): strips chars <= U+0020 only."""
    if not text:
        return text
    i, j = 0, len(text)
    while i < j and text[i] <= " ":
        i += 1
    while j > i and text[j - 1] <= " ":
        j -= 1
    return text[i:j]


def is_numeric_chars(text: str) -> bool:
    # StringUtil.java:202-209
    return bool(text) and all("0" <= c <= "9" for c in text)


def is_ansi_chars(text: str) -> bool:
    # StringUtil.java:216-223
    return bool(text) and all(("a" <= c <= "z") or ("A" <= c <= "Z") for c in text)
