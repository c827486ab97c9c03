"""Tokenizers.

``simple_segment`` ports ``similarity/segment/SimpleSegmenter.java:14-48`` —
1 CJK char = 1 token; maximal runs of ASCII digits or ASCII letters = 1 token.
The segmenter is pluggable (``similarity/Segmenter.java:11-18``): pipeline
stages take any ``Callable[[str], list[str]]``.
"""

from __future__ import annotations

import re

# one token = a digit run | a letter run | any single other char
_TOKEN_RE = re.compile(r"[0-9]+|[A-Za-z]+|.", re.DOTALL)


def simple_segment(text: str) -> list[str]:
    if not text:
        return []
    return _TOKEN_RE.findall(text)
