"""Weighted-cosine similarity kernel (the reference's "model scoring" operator).

Ported semantics from ``SimilarityComputer.java``:
- boost table ``getBoostValue`` (``:198-255``), constants ``:71-75``;
- text-term coord/density (``:461-498``, the sqrt·0.5+0.5 formulas — the prose
  comment at ``:488`` describes an older formula; the code wins);
- asymmetric cosine (``:507-549``): iterate QUERY terms only; ``sumDD`` sums
  over matched doc terms only (Lucene-flavored, NOT textbook cosine —
  replicated exactly for parity);
- IDF finalize (``:580-599``): pure-digit/ASCII term -> 2, else
  ln(N/(df+1)) clamped >= 0;
- top-N keep with min-evict: ``Query.java:61-96``. We implement the
  explain-path semantics (true top-N); the reference's non-explain path for
  topN>1 only maintains slot 0 (``Query.java:80-96``) — a quirk we do not copy.
"""

from __future__ import annotations

import math

from .document import Doc
from .stringutil import is_ansi_chars, is_numeric_chars
from .types import TermType

BOOST_M = 1.0
BOOST_L = 2.0
BOOST_XL = 4.0
BOOST_S = 0.5
BOOST_XS = 0.25


def compute_idf(doc_count: int, df_by_key: dict) -> dict:
    """Per-partition IDF finalize (SimilarityComputer.java:580-599)."""
    out = {}
    for key, df in df_by_key.items():
        if is_numeric_chars(key) or is_ansi_chars(key):
            idf = 2.0
        else:
            idf = math.log(doc_count * 1.0 / (df + 1))
            if idf < 0:
                idf = 0.0
        out[key] = idf
    return out


def stat_inverse_doc_refers(docs) -> dict:
    """Document frequency per term key (SimilarityComputer.java:166-179)."""
    from .document import term_idf_key

    idrc: dict = {}
    for doc in docs:
        for term in doc.terms:
            key = term_idf_key(term)
            idrc[key] = idrc.get(key, 0) + 1
    return idrc


def get_boost_value(for_doc: bool, qdoc: Doc, qterm, ddoc: Doc, dterm) -> float:
    # SimilarityComputer.java:198-255
    t = dterm.type if for_doc else qterm.type
    if t in (TermType.PROVINCE, TermType.CITY, TermType.DISTRICT):
        return BOOST_XL
    if t == TermType.STREET:
        return BOOST_XS
    if t == TermType.TEXT:
        return BOOST_M
    if t == TermType.TOWN:
        if qdoc.town is not None and ddoc.town is not None:
            return BOOST_L
        return BOOST_XS
    if t == TermType.VILLAGE:
        value = BOOST_XS
        if qdoc.village is not None and ddoc.village is not None and qdoc.town is not None:
            if ddoc.town is not None and qdoc.town.text == ddoc.town.text:
                value = BOOST_XL if qdoc.village.text == ddoc.village.text else BOOST_L
            elif ddoc.town is not None:
                value = BOOST_L if not for_doc else BOOST_S
        return value
    if t in (TermType.ROAD, TermType.ROAD_NUM):
        if qdoc.town is None or qdoc.village is None:
            if t == TermType.ROAD:
                if qdoc.road is not None and ddoc.road is not None:
                    return BOOST_L
            else:
                if (
                    qdoc.road_num_value > 0
                    and ddoc.road_num_value > 0
                    and qdoc.road is not None
                    and ddoc.road is not None
                    and qdoc.road.text == ddoc.road.text
                ):
                    if qdoc.road_num_value == ddoc.road_num_value:
                        return 3.0
                    if for_doc:
                        return (
                            1.0 / math.sqrt(math.sqrt(abs(qdoc.road_num_value - ddoc.road_num_value) + 1))
                        ) * BOOST_L
                    return 3.0
        return BOOST_M
    return BOOST_M


def compute_doc_similarity(qdoc: Doc, doc: Doc) -> float:
    # SimilarityComputer.java:456-550
    # 1. text-term coord/density — first-matching-index lookup precomputed
    # per doc (identical to the reference's break-at-first-match linear scan)
    q_text_count = 0
    match_count = 0
    match_start = match_end = -1
    text_index = doc.text_term_index()
    for qterm in qdoc.terms:
        if qterm.type != TermType.TEXT:
            continue
        q_text_count += 1
        i = text_index.get(qterm.text)
        if i is not None:
            match_count += 1
            if match_start == -1:
                match_start = match_end = i
            elif i > match_end:
                match_end = i
            elif i < match_start:
                match_start = i

    coord_text = 1.0
    density_text = 1.0
    if q_text_count > 0:
        coord_text = math.sqrt(match_count * 1.0 / q_text_count) * 0.5 + 0.5
    if q_text_count >= 2 and match_count >= 2:
        density_text = math.sqrt(match_count * 1.0 / (match_end - match_start + 1)) * 0.5 + 0.5

    # 2. asymmetric cosine over query terms.
    # Fast paths: Text terms (the bulk) boost to BOOST_M unconditionally
    # (java:213-214) and analyse() never emits Province/City/District/Street
    # terms, so t.idf needs no type-override call (Term.java:51-67 is an
    # identity for Town/Village/Road/RoadNum/Text) — behavior identical.
    sum_qd = sum_qq = sum_dd = 0.0
    dmap = doc._map
    if dmap is None:
        dmap = doc._map = {t.text: t for t in doc.terms}
    TEXT = TermType.TEXT
    for qterm in qdoc.terms:
        qtype = qterm.type
        qboost = 1.0 if qtype == TEXT else get_boost_value(False, qdoc, qterm, doc, None)
        qtfidf = qterm.idf * qboost
        dterm = dmap.get(qterm.text)
        if dterm is None:
            if qtype == TermType.ROAD_NUM:
                # RoadNum fallback: match the doc's road number when roads
                # agree (SimilarityComputer.java:513-517)
                if (
                    doc.road_num is not None
                    and doc.road is not None
                    and qterm.ref is not None
                    and doc.road.text == qterm.ref.text
                ):
                    dterm = doc.road_num
            if dterm is None:
                sum_qq += qtfidf * qtfidf
                continue
        if dterm.type == TEXT:
            dtfidf = dterm.idf * coord_text * density_text
        else:
            dboost = get_boost_value(True, qdoc, qterm, doc, dterm)
            dtfidf = dterm.idf * dboost
        sum_qq += qtfidf * qtfidf
        sum_qd += qtfidf * dtfidf
        sum_dd += dtfidf * dtfidf

    if sum_dd == 0.0 or sum_qq == 0.0:
        return 0.0
    return sum_qd / math.sqrt(sum_qq * sum_dd)


class TopN:
    """Top-N keeper with the reference's min-evict semantics (Query.java:61-96)."""

    __slots__ = ("n", "docs")

    def __init__(self, n: int):
        self.n = max(n, 1)
        self.docs: list[tuple] = []  # (doc_id, similarity)

    def add(self, doc_id, similarity: float) -> bool:
        if similarity <= 0:
            return False
        if len(self.docs) < self.n:
            self.docs.append((doc_id, similarity))
            return True
        min_idx = 0
        for i in range(1, self.n):
            if self.docs[i][1] < self.docs[min_idx][1]:
                min_idx = i
        if self.docs[min_idx][1] < similarity:
            self.docs[min_idx] = (doc_id, similarity)
            return True
        return False

    def sorted_desc(self) -> list[tuple]:
        # stable sort desc == the reference bubble sort (Query.java:37-53)
        return sorted(self.docs, key=lambda p: -p[1])


def find_similar(qdoc: Doc, docs, top_n: int = 5) -> list[tuple]:
    """Scan a partition's docs, keep top-N; early exit on perfect match when
    top_n==1 (SimilarityComputer.java:425-433)."""
    keeper = TopN(top_n)
    for doc in docs:
        sim = compute_doc_similarity(qdoc, doc)
        keeper.add(doc.id, sim)
        if top_n == 1 and sim == 1.0:
            break
    return keeper.sorted_desc()


def compute_doc_similarity_explain(qdoc: Doc, doc: Doc):
    """Explain variant: returns (similarity, matched_terms) where each match is
    a dict (text, type, boost, tfidf, density, coord) — the ``MatchedTerm``
    record of the reference's explain path (``MatchedTerm.java:3-45``,
    ``SimilarityComputer.java:523-536``; density/coord are -1 for non-Text
    terms, as there)."""
    q_text_count = 0
    match_count = 0
    match_start = match_end = -1
    text_index = doc.text_term_index()
    for qterm in qdoc.terms:
        if qterm.type != TermType.TEXT:
            continue
        q_text_count += 1
        i = text_index.get(qterm.text)
        if i is not None:
            match_count += 1
            if match_start == -1:
                match_start = match_end = i
            elif i > match_end:
                match_end = i
            elif i < match_start:
                match_start = i
    coord_text = 1.0
    density_text = 1.0
    if q_text_count > 0:
        coord_text = math.sqrt(match_count * 1.0 / q_text_count) * 0.5 + 0.5
    if q_text_count >= 2 and match_count >= 2:
        density_text = math.sqrt(match_count * 1.0 / (match_end - match_start + 1)) * 0.5 + 0.5

    sum_qd = sum_qq = sum_dd = 0.0
    matched = []
    for qterm in qdoc.terms:
        qboost = get_boost_value(False, qdoc, qterm, doc, None)
        qtfidf = qterm.get_idf() * qboost
        dterm = doc.get_term(qterm.text)
        if dterm is None and qterm.type == TermType.ROAD_NUM:
            if (doc.road_num is not None and doc.road is not None
                    and qterm.ref is not None and doc.road.text == qterm.ref.text):
                dterm = doc.road_num
        dboost = 0.0 if dterm is None else get_boost_value(True, qdoc, qterm, doc, dterm)
        is_text = dterm is not None and dterm.type == TermType.TEXT
        coord = coord_text if is_text else 1.0
        density = density_text if is_text else 1.0
        dtfidf = (dterm.get_idf() if dterm is not None else qterm.get_idf()) * dboost * coord * density
        if dterm is not None:
            matched.append({
                "text": dterm.text, "type": dterm.type, "boost": dboost,
                "tfidf": dtfidf,
                "density": density if is_text else -1.0,
                "coord": coord if is_text else -1.0,
            })
        sum_qq += qtfidf * qtfidf
        sum_qd += qtfidf * dtfidf
        sum_dd += dtfidf * dtfidf
    if sum_dd == 0.0 or sum_qq == 0.0:
        return 0.0, matched
    return sum_qd / math.sqrt(sum_qq * sum_dd), matched


def find_similar_explain(qdoc: Doc, docs, top_n: int = 5):
    """Top-N with per-doc matched-term explain records (the reference's
    ``explain && topN>1`` path, SimilarityComputer.java:500-536)."""
    scored = []
    for doc in docs:
        sim, matched = compute_doc_similarity_explain(qdoc, doc)
        if sim > 0:
            scored.append((doc.id, sim, matched))
    scored.sort(key=lambda r: -r[1])
    return scored[:top_n]
