"""Single-process reference oracle: identical analysis + BM25, pure Python.

Generates the BM25 top-k goldens the Spark engine must match
rank-identically (SURVEY.md §5 rebuild strategy (c)). Implements the exact
same semantics as the distributed engine but over plain dicts — small
corpora only.
"""

from __future__ import annotations

from collections import defaultdict

from montezuma_spark.analysis import get_analyzer
from montezuma_spark.search.ast import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    MultiPhraseQuery,
    PhraseQuery,
    ConstantScoreQuery,
    DocIdSetQuery,
    Query,
    RangeQuery,
    RegexpQuery,
    SpanNearQuery,
    TermQuery,
    WildcardQuery,
    rewrite,
)


def _lev(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a or not b:
        return len(a) + len(b)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _fuzzy_matches(postings, q: FuzzyQuery):
    """(term, sim, scale) for dictionary terms within the threshold —
    independent re-derivation of the engine's expansion semantics."""
    ms = q.min_similarity
    out = []
    for (f, t) in postings:
        if f != q.field:
            continue
        if q.prefix_length and not t.startswith(q.term[: q.prefix_length]):
            continue
        m = min(len(q.term), len(t))
        if m == 0:
            continue
        sim = 1.0 - _lev(q.term, t) / m
        if sim >= ms:
            scale = 1.0 if ms >= 1.0 else (sim - ms) / (1.0 - ms)
            out.append((t, sim, scale))
    return out


class OracleIndex:
    def __init__(self, k1: float = 1.2, b: float = 0.75,
                 similarity: str = "bm25"):
        from montezuma_spark.search.similarity import get_similarity

        self.k1 = k1
        self.b = b
        self.sim = get_similarity(similarity, k1, b)
        # (field, term) -> {docid: [positions]}
        self.postings: dict = defaultdict(dict)
        self.dl: dict = defaultdict(dict)  # field -> {docid: dl}
        self.docids: set = set()
        self.boosts: dict = {}  # docid -> quantized index-time boost

    def add(self, docid: int, fields: dict[str, tuple[str, str | None]],
            boost: float = 1.0):
        """fields: name → (text, analyzer_name | None for untokenized);
        ``boost`` = index-time per-doc boost (quantized to 1/1024 like the
        engine's marker cells)."""
        self.docids.add(docid)
        self.boosts[docid] = max(1, round(boost * 1024)) / 1024
        for fname, (text, an) in fields.items():
            toks = (
                [text] if an is None else get_analyzer(an).tokens(text or "")
            )
            self.dl[fname][docid] = len(toks)
            for pos, t in enumerate(toks):
                self.postings[(fname, t)].setdefault(docid, []).append(pos)

    # ------------------------------------------------------------------ stats
    def n_docs(self, field: str) -> int:
        return len(self.dl[field])

    def avgdl(self, field: str) -> float:
        d = self.dl[field]
        return sum(d.values()) / len(d) if d else 0.0

    def idf(self, field: str, term: str) -> float:
        df = len(self.postings.get((field, term), {}))
        n = self.n_docs(field)
        return self.sim.idf(df, n) if n else 0.0

    def _bm25(self, field, docid, tf, idf, boost) -> float:
        import numpy as np

        if getattr(self.sim, "normalize_query", False):
            # reference weight chain: value = query_weight·idf = idf²·boost
            # (×query_norm applied once in scores()) — term-query.lisp:29-36
            idf = idf * idf
        dl = self.dl[field].get(docid, 1)
        avgdl = max(self.avgdl(field), 1e-9)
        tf_norm = float(
            self.sim.tf_norm(
                np.asarray([tf], dtype=np.float64),
                np.asarray([dl], dtype=np.float64),
                avgdl,
            )[0]
        )
        return idf * boost * self.boosts.get(docid, 1.0) * tf_norm

    # ------------------------------------------------------------------- eval
    def eval(self, q: Query) -> dict[int, float]:
        q = rewrite(q)
        if isinstance(q, TermQuery):
            idf = self.idf(q.field, q.term)
            return {
                d: self._bm25(q.field, d, len(ps), idf, q.boost)
                for d, ps in self.postings.get((q.field, q.term), {}).items()
            }
        if isinstance(q, MatchAllQuery):
            return {d: q.boost for d in self.docids}
        if isinstance(q, RangeQuery):
            out: dict[int, float] = defaultdict(float)
            for (f, t), plist in self.postings.items():
                if f != q.field:
                    continue
                if q.lower is not None and (
                    t < q.lower or (not q.include_lower and t == q.lower)
                ):
                    continue
                if q.upper is not None and (
                    t > q.upper or (not q.include_upper and t == q.upper)
                ):
                    continue
                idf = self.idf(f, t)
                for d, ps in plist.items():
                    out[d] += self._bm25(f, d, len(ps), idf, q.boost)
            return dict(out)
        if isinstance(q, WildcardQuery):
            import re

            rx = re.compile(q.to_regex())
            out = defaultdict(float)
            for (f, t), plist in self.postings.items():
                if f != q.field or not rx.match(t):
                    continue
                idf = self.idf(f, t)
                for d, ps in plist.items():
                    out[d] += self._bm25(f, d, len(ps), idf, q.boost)
            return dict(out)
        if isinstance(q, ConstantScoreQuery):
            return {d: float(q.boost) for d in self.eval(q.query)}
        if isinstance(q, DocIdSetQuery):
            return {
                int(d): float(q.boost)
                for d in q.docids
                if d in self.docids
            }
        if isinstance(q, RegexpQuery):
            import re

            rx = re.compile(q.pattern)
            out = defaultdict(float)
            for (f, t), plist in self.postings.items():
                if f != q.field or not rx.fullmatch(t):
                    continue
                idf = self.idf(f, t)
                for d, ps in plist.items():
                    out[d] += self._bm25(f, d, len(ps), idf, q.boost)
            return dict(out)
        if isinstance(q, FuzzyQuery):
            out = defaultdict(float)
            for t, _sim, scale in _fuzzy_matches(self.postings, q):
                idf = self.idf(q.field, t)
                for d, ps in self.postings[(q.field, t)].items():
                    out[d] += self._bm25(
                        q.field, d, len(ps), idf, q.boost * scale
                    )
            return dict(out)
        if isinstance(q, (PhraseQuery, MultiPhraseQuery)):
            return self._eval_phrase(q)
        if isinstance(q, SpanNearQuery):
            return self._eval_span_near(q)
        if isinstance(q, BooleanQuery):
            return self._eval_bool(q)
        raise TypeError(type(q))

    def _eval_span_near(self, q) -> dict[int, float]:
        """Brute-force span-near: enumerate every distinct-position
        selection (one per listed term instance) — deliberately a
        DIFFERENT algorithm from the engine's anchored-window /
        greedy-chain kernels so the tests compare independent
        derivations. Constant score = boost."""
        from itertools import product

        cand: set | None = None
        for t in set(q.terms):
            docs = set(self.postings.get((q.field, t), {}))
            cand = docs if cand is None else (cand & docs)
        n = len(q.terms)
        out: dict[int, float] = {}
        for d in sorted(cand or ()):
            plists = [
                self.postings.get((q.field, t), {}).get(d, [])
                for t in q.terms
            ]
            if q.first is not None:
                plists = [[p for p in ps if p < q.first] for ps in plists]
            for sel in product(*plists):
                if len(set(sel)) != n:
                    continue  # duplicate terms need distinct tokens
                if q.in_order and any(
                    sel[i + 1] <= sel[i] for i in range(n - 1)
                ):
                    continue
                if (max(sel) - min(sel)) - (n - 1) <= q.slop:
                    out[d] = q.boost
                    break
        return out

    def _eval_phrase(self, q) -> dict[int, float]:
        alts = (
            q.alternatives
            if isinstance(q, MultiPhraseQuery)
            else tuple((t,) for t in q.terms)
        )
        cand: set | None = None
        for slot in alts:
            docs: set = set()
            for t in slot:
                docs |= set(self.postings.get((q.field, t), {}))
            cand = docs if cand is None else (cand & docs)
        out = {}
        idf = sum(
            self.idf(q.field, t) for t in {t for slot in alts for t in slot}
        )
        for d in cand or ():
            shifted = [
                sorted(
                    {
                        p - off
                        for t in slot
                        for p in self.postings.get((q.field, t), {}).get(d, [])
                    }
                )
                for slot, off in zip(alts, q.offsets)
            ]
            if q.slop == 0:
                common = set(shifted[0])
                for s in shifted[1:]:
                    common &= set(s)
                freq = float(len(common))
            else:
                freq = _sloppy_freq_py(
                    shifted, q.slop, getattr(q, "weight", "count")
                )
            if freq > 0:
                out[d] = self._bm25(q.field, d, freq, idf, q.boost)
        return out

    def _eval_bool(self, q: BooleanQuery) -> dict[int, float]:
        from montezuma_spark.search.ast import FILTER

        musts = [c.query for c in q.clauses if c.occur == MUST]
        filters = [c.query for c in q.clauses if c.occur == FILTER]
        shoulds = [c.query for c in q.clauses if c.occur == SHOULD]
        nots = [c.query for c in q.clauses if c.occur == MUST_NOT]
        if not musts and not shoulds and not filters:
            return {}
        if getattr(q, "min_should_match", 0) > len(shoulds):
            return {}  # unsatisfiable — BEFORE the filters-only path
        filter_docs: set | None = None
        for fq in filters:
            fd = set(self.eval(fq))
            filter_docs = fd if filter_docs is None else (filter_docs & fd)
        if not musts and not shoulds:
            out = {d: 0.0 for d in filter_docs or ()}
            for nq in nots:
                for d in self.eval(nq):
                    out.pop(d, None)
            return (
                {d: s * q.boost for d, s in out.items()}
                if q.boost != 1.0
                else out
            )
        msm = getattr(q, "min_should_match", 0) or 0
        scores: dict[int, float] = defaultdict(float)
        matchers: dict[int, int] = defaultdict(int)
        smatch: dict[int, int] = defaultdict(int)
        if musts:
            sets = []
            for m in musts:
                r = self.eval(m)
                sets.append(r)
            docs = set(sets[0])
            for r in sets[1:]:
                docs &= set(r)
            for r in sets:
                for d in docs:
                    scores[d] += r[d]
                    matchers[d] += 1
            for sq in shoulds:
                r = self.eval(sq)
                for d in docs & set(r):
                    scores[d] += r[d]
                    matchers[d] += 1
                    smatch[d] += 1
            scores = {d: s for d, s in scores.items() if d in docs}
        else:
            for sq in shoulds:
                for d, s in self.eval(sq).items():
                    scores[d] += s
                    matchers[d] += 1
                    smatch[d] += 1
            scores = dict(scores)
        if msm > 0 and shoulds:
            scores = {d: s for d, s in scores.items() if smatch[d] >= msm}
        if not q.coord_disabled:
            # per-doc coord factor (boolean-scorer.lisp:262-266); max-coord
            # counts scoring clauses only (add-scorer :52-54)
            mx = len(musts) + len(shoulds)
            scores = {
                d: s * self.sim.coord(matchers[d], mx)
                for d, s in scores.items()
            }
        if filter_docs is not None:
            scores = {d: s for d, s in scores.items() if d in filter_docs}
        for nq in nots:
            for d in self.eval(nq):
                scores.pop(d, None)
        if q.boost != 1.0:
            scores = {d: s * q.boost for d, s in scores.items()}
        return scores

    def _ssw(self, q: Query) -> float:
        """sum-of-squared-weights, reference-style (query.lisp:9-15;
        prohibited clauses included per boolean-query.lisp:150-156)."""
        if isinstance(q, TermQuery):
            return (self.idf(q.field, q.term) * q.boost) ** 2
        if isinstance(q, (RangeQuery, WildcardQuery, RegexpQuery)):
            import re

            terms = []
            for (f, t) in self.postings:
                if f != q.field:
                    continue
                if isinstance(q, WildcardQuery):
                    if re.compile(q.to_regex()).match(t):
                        terms.append(t)
                elif isinstance(q, RegexpQuery):
                    if re.compile(q.pattern).fullmatch(t):
                        terms.append(t)
                else:
                    if q.lower is not None and (
                        t < q.lower or (not q.include_lower and t == q.lower)
                    ):
                        continue
                    if q.upper is not None and (
                        t > q.upper or (not q.include_upper and t == q.upper)
                    ):
                        continue
                    terms.append(t)
            return sum((self.idf(q.field, t) * q.boost) ** 2 for t in terms)
        if isinstance(q, PhraseQuery):
            pidf = sum(self.idf(q.field, t) for t in set(q.terms))
            return (pidf * q.boost) ** 2
        if isinstance(q, MultiPhraseQuery):
            pidf = sum(
                self.idf(q.field, t)
                for t in {t for slot in q.alternatives for t in slot}
            )
            return (pidf * q.boost) ** 2
        if isinstance(q, FuzzyQuery):
            return sum(
                (self.idf(q.field, t) * q.boost * scale) ** 2
                for t, _sim, scale in _fuzzy_matches(self.postings, q)
            )
        if isinstance(q, MatchAllQuery):
            return 1.0  # match-all-query.lisp:50-51
        if isinstance(q, ConstantScoreQuery):
            return q.boost ** 2  # Lucene constant-score weight
        if isinstance(q, DocIdSetQuery):
            return 0.0  # scoreless/constant leaf (SpanNear precedent)
        if isinstance(q, BooleanQuery):
            return q.boost ** 2 * sum(self._ssw(c.query) for c in q.clauses)
        return 0.0

    def scores(self, q: Query) -> dict[int, float]:
        import math

        q = rewrite(q)
        out = self.eval(q)
        if getattr(self.sim, "normalize_query", False):
            ssw = self._ssw(q)
            if ssw > 0:
                qn = 1.0 / math.sqrt(ssw)
                out = {d: s * qn for d, s in out.items()}
        return out

    def top_k(self, q: Query, k: int = 10) -> list[tuple[int, float]]:
        scores = self.scores(q)
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def matching(self, q: Query) -> list[int]:
        return sorted(self.eval(q))


def _sloppy_freq_py(shifted: list[list[int]], slop: int,
                    weight: str = "count") -> float:
    if any(len(s) == 0 for s in shifted):
        return 0.0
    ptr = [0] * len(shifted)
    freq = 0.0
    while True:
        cur = [s[p] for s, p in zip(shifted, ptr)]
        span = max(cur) - min(cur)
        if span <= slop:
            freq += 1.0 if weight == "count" else 1.0 / (1.0 + span)
        mi = cur.index(min(cur))
        ptr[mi] += 1
        if ptr[mi] >= len(shifted[mi]):
            return freq
