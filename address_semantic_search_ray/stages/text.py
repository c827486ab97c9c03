"""Text-analysis operators over the ``documents`` table.

All vectorized where the kernel allows; the per-row set operations (distinct
tokens) stay cheap relative to I/O. Tokenization contract is ``split(' ')``
(single-space), matching the SQL oracle's ``string_split(text, ' ')``.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

# minimal per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "du", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "del", "para"},
    "zh": {"的", "了", "是", "在", "和", "有", "我", "不"},
}

_BPEISH = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_tokens (split ' '), n_chars, n_bpeish (BPE-ish regex tokens)."""
    text = batch["text"]
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_tokens": (text.str.count(" ") + 1).astype("int64"),
        "n_chars": text.str.len().astype("int64"),
        "n_bpeish": text.map(lambda t: len(_BPEISH.findall(t))).astype("int64"),
    })


def quality_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, distinct_ratio, mean_token_len (both round 6)."""
    toks = batch["text"].map(lambda t: t.split(" "))
    n = toks.map(len).astype("int64")
    n_distinct = toks.map(lambda ws: len(set(ws))).astype("int64")
    total_chars = batch["text"].str.len().astype("int64")
    mean_len = ((total_chars - (n - 1)) / n).round(6)
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "distinct_ratio": (n_distinct / n).round(6),
        "mean_token_len": mean_len,
    })


def repetition_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, rep_bigram: Gopher-style within-doc repetition — the fraction
    of word bigrams that are repeats (1 - distinct/total; 0 for <2 tokens).
    High values flag boilerplate/spam the quality filter drops."""
    def rep(t: str) -> float:
        ws = t.split(" ")
        n = len(ws) - 1
        if n <= 0:
            return 0.0
        return round(1.0 - len(set(zip(ws, ws[1:]))) / n, 6)

    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "rep_bigram": batch["text"].map(rep).astype("float64"),
    })


def lang_id_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Stopword-profile language ID (heuristic; deterministic)."""
    langs = sorted(LANG_PROFILES)
    preds = []
    for t in batch["text"]:
        words = set(t.split(" "))
        best, best_score = "unk", 0
        for lang in langs:
            score = len(words & LANG_PROFILES[lang])
            if score > best_score:
                best, best_score = lang, score
        preds.append(best)
    return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": preds})


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Rolling-hash document fingerprint (crc32 over word 4-gram window mins).

    Winnowing-flavored: min crc32 within each sliding window of 4 word-grams,
    xor-folded — stable under small edits away from the min."""
    fps = []
    for t in batch["text"]:
        words = t.split(" ")
        grams = [zlib.crc32(" ".join(words[i:i + 3]).encode()) for i in range(max(len(words) - 2, 1))]
        if len(grams) < 4:
            fp = min(grams)
        else:
            fp = 0
            for i in range(len(grams) - 3):
                fp ^= min(grams[i:i + 4])
        fps.append(fp)
    return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": np.asarray(fps, dtype=np.int64)})
