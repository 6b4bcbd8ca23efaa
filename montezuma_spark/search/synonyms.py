"""Query-time synonym expansion — a tree rewrite, never an index
change.

Beyond-reference, labeled (the reference has no synonym surface; the
Lucene lineage puts synonyms in the analysis chain or a query-time
SynonymQuery). Index-time expansion bloats postings and freezes the
synonym set at build time; at web scale the synonym map changes far
more often than a 100-TB index can be rebuilt, so the query-time
rewrite is the scale-correct form: the expanded tree rides the
existing kernels (dictionary pushdown, WAND, phrase positions)
unchanged.

Semantics: a ``TermQuery`` whose term has synonyms becomes a SHOULD
disjunction over the equivalence set (score = Σ BM25 over the matching
variants — the disjunction form, documented as distinct from Lucene's
blended-df SynonymQuery); a ``PhraseQuery`` slot with synonyms becomes
a ``MultiPhraseQuery`` alternative slot (any variant may occupy the
position). The mapping is directional — pass a symmetric closure for
bidirectional synonyms (``symmetric_closure`` builds one).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from montezuma_spark.search.ast import (
    SHOULD,
    BooleanClause,
    BooleanQuery,
    ConstantScoreQuery,
    MultiPhraseQuery,
    PhraseQuery,
    Query,
    TermQuery,
)

__all__ = ["expand_synonyms", "symmetric_closure"]


def symmetric_closure(groups: Sequence[Sequence[str]]) -> dict[str, tuple[str, ...]]:
    """Equivalence groups → directional map: every member maps to the
    OTHER members of its group (first group wins if a term repeats)."""
    out: dict[str, tuple[str, ...]] = {}
    for g in groups:
        gs = list(dict.fromkeys(g))
        for t in gs:
            out.setdefault(t, tuple(s for s in gs if s != t))
    return out


def _variants(term: str, synonyms: Mapping[str, Sequence[str]]) -> tuple[str, ...]:
    extra = synonyms.get(term)
    if not extra:
        return (term,)
    seen = dict.fromkeys((term, *extra))
    return tuple(seen)


def expand_synonyms(q: Query,
                    synonyms: Mapping[str, Sequence[str]],
                    fields: set[str] | None = None) -> Query:
    """Rewrite ``q`` with every synonym-bearing term expanded.
    ``fields`` restricts expansion to the named fields (None = all)."""

    def applies(field: str) -> bool:
        return fields is None or field in fields

    if isinstance(q, TermQuery) and applies(q.field):
        vs = _variants(q.term, synonyms)
        if len(vs) == 1:
            return q
        return BooleanQuery(
            tuple(
                BooleanClause(TermQuery(q.field, v, q.boost), SHOULD)
                for v in vs
            )
        )
    if isinstance(q, PhraseQuery) and applies(q.field):
        alts = tuple(_variants(t, synonyms) for t in q.terms)
        if all(len(a) == 1 for a in alts):
            return q
        return MultiPhraseQuery(
            q.field, alts, tuple(q.offsets), q.slop, q.boost, q.weight
        )
    if isinstance(q, MultiPhraseQuery) and applies(q.field):
        alts = tuple(
            tuple(dict.fromkeys(
                v for t in slot for v in _variants(t, synonyms)
            ))
            for slot in q.alternatives
        )
        if alts == q.alternatives:
            return q
        return MultiPhraseQuery(
            q.field, alts, tuple(q.offsets), q.slop, q.boost, q.weight
        )
    if isinstance(q, BooleanQuery):
        clauses = tuple(
            BooleanClause(expand_synonyms(c.query, synonyms, fields), c.occur)
            for c in q.clauses
        )
        if all(a.query is b.query for a, b in zip(clauses, q.clauses)):
            return q
        return BooleanQuery(
            clauses, q.boost, q.coord_disabled, q.min_should_match
        )
    if isinstance(q, ConstantScoreQuery):
        inner = expand_synonyms(q.query, synonyms, fields)
        if inner is q.query:
            return q
        return ConstantScoreQuery(inner, q.boost)
    return q
