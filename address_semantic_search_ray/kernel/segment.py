"""Tokenizers.

``simple_segment`` ports ``similarity/segment/SimpleSegmenter.java:14-48`` —
1 CJK char = 1 token; maximal runs of ASCII digits or ASCII letters = 1 token.
The segmenter is pluggable (``similarity/Segmenter.java:11-18``): pipeline
stages take any ``Callable[[str], list[str]]``.

``DictSegmenter`` / ``BigramSegmenter`` are the public-knowledge analogs of
the reference's two alternative segmenters, which wrap external analyzers
(``IKAnalyzerSegmenter.java:24-40`` — dictionary-driven IK;
``SmartCNSegmenter.java:25-41`` — statistical SmartCN). The reference's own
spring config never wires them (SimpleSegmenter is the default); they exist
as the extension surface, re-expressed here without the library
dependencies:
- DictSegmenter: forward maximum matching against a caller-provided term
  dictionary (the natural dictionary is the region.dic export, S9), falling
  back to simple_segment rules for unmatched spans — the dictionary-lookup
  tokenization model IK implements;
- BigramSegmenter: overlapping CJK bigrams + ASCII digit/letter runs — the
  classic statistical stand-in (CJKAnalyzer-style) for an HMM segmenter.
"""

from __future__ import annotations

import re

# one token = a digit run | a letter run | any single other char
_TOKEN_RE = re.compile(r"[0-9]+|[A-Za-z]+|.", re.DOTALL)


def simple_segment(text: str) -> list[str]:
    if not text:
        return []
    return _TOKEN_RE.findall(text)


_ASCII_RUN = re.compile(r"[0-9]+|[A-Za-z]+")


class DictSegmenter:
    """Forward-maximum-matching dictionary segmenter (IK analog).

    Builds a char-prefix map from the dictionary; at each position takes the
    LONGEST dictionary term starting there, else falls back to one
    simple_segment token (single CJK char / ASCII run)."""

    def __init__(self, terms):
        self.max_len = 1
        self.by_first: dict[str, set[str]] = {}
        for t in terms:
            if not t:
                continue
            self.by_first.setdefault(t[0], set()).add(t)
            if len(t) > self.max_len:
                self.max_len = len(t)

    def __call__(self, text: str) -> list[str]:
        if not text:
            return []
        out: list[str] = []
        i, n = 0, len(text)
        while i < n:
            cands = self.by_first.get(text[i])
            if cands:
                # down to length 1: single-char dictionary terms match too
                for ln in range(min(self.max_len, n - i), 0, -1):
                    w = text[i:i + ln]
                    if w in cands:
                        out.append(w)
                        i += ln
                        break
                else:
                    cands = None
            if not cands:
                m = _ASCII_RUN.match(text, i)
                if m:
                    out.append(m.group())
                    i = m.end()
                else:
                    out.append(text[i])
                    i += 1
        return out


class BigramSegmenter:
    """Overlapping CJK bigrams + ASCII runs (SmartCN statistical stand-in)."""

    def __call__(self, text: str) -> list[str]:
        if not text:
            return []
        out: list[str] = []
        i, n = 0, len(text)
        run_start = -1
        while i <= n:
            ch = text[i] if i < n else ""
            is_cjk = bool(ch) and not ch.isascii()
            if is_cjk:
                if run_start < 0:
                    run_start = i
                i += 1
                continue
            if run_start >= 0:  # flush the CJK run as bigrams
                run = text[run_start:i]
                if len(run) == 1:
                    out.append(run)
                else:
                    out.extend(run[j:j + 2] for j in range(len(run) - 1))
                run_start = -1
            if not ch:
                break
            m = _ASCII_RUN.match(text, i)
            if m:
                out.append(m.group())
                i = m.end()
            else:
                i += 1  # other ASCII (punctuation): skipped, like analyzers do
        return out
