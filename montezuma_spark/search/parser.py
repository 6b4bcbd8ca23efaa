"""Query-string parser → AST.

Faithful re-expression of the reference grammar
(src/query-parser/query-parser.lisp:160-264):

    top     := clause (ws+ clause)*          -- strict: no leading/trailing ws
    clause  := ['+' | '!'] query ['^' int]
    query   := phrase | field ':' query | wild | word
    phrase  := '"' word (ws+ word)* '"'
    word    := chars excluding ws and  " * ? : ^
    wild    := like word but containing * or ?

Semantics:
* '+' → MUST, '!' → MUST_NOT, bare → default_occur (SHOULD)
  (boolean-clause occurs, query-parser.lisp:172-180)
* term words are run through the analyzer: 0 tokens → empty term query,
  1 → TermQuery, >1 → PhraseQuery (query-parser.lisp:75-88)
* ``field:`` sets the active field for exactly the next query
  (use-active-field consumes it, query-parser.lisp:133-137)
* default field "*" expands over the known fields as a SHOULD boolean
  (combine-multiple-fields, query-parser.lisp:139-154)
* unparseable input falls back to OR-of-analyzed-tokens
  (get-bad-parse, query-parser.lisp:248-264)

Parse-tree goldens: tests/unit/query-parser/tc-query-parser.lisp:95-183.
"""

from __future__ import annotations

from montezuma_spark.analysis import get_analyzer
from montezuma_spark.search.ast import (
    SHOULD,
    MUST,
    MUST_NOT,
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    PhraseQuery,
    Query,
    TermQuery,
    WildcardQuery,
)

_WS = set(" \t\f\n")
_DISALLOWED = set('"*?:^')
_WILD = set("*?")


class ParseError(Exception):
    pass


class QueryParser:
    def __init__(
        self,
        default_field: str = "*",
        fields: tuple[str, ...] = (),
        analyzer="standard",
        default_occur: str = SHOULD,
        default_slop: int = 0,
        extensions: bool = False,
    ):
        """``extensions=True`` enables the Lucene-lineage ``~`` syntax the
        reference grammar lacks: ``word~`` / ``word~0.7`` → FuzzyQuery
        (min_similarity default 0.5), ``"a b"~2`` → phrase slop. OFF by
        default so the grammar stays a faithful reference port (``~`` is
        an ordinary word character there, query-parser.lisp:181-191)."""
        self.default_field = default_field
        self.fields = tuple(fields)
        self.analyzer = get_analyzer(analyzer)
        self.default_occur = default_occur
        self.default_slop = default_slop
        self.extensions = extensions
        self._active_field: str | None = None

    # ------------------------------------------------------------------ parse
    def parse(self, s: str) -> Query:
        try:
            return self._parse_strict(s)
        except ParseError:
            return self._bad_parse(s)

    def _parse_strict(self, s: str) -> Query:
        self._s = s
        self._pos = 0
        clauses = [self._clause()]
        while self._pos < len(s):
            if not self._skip_ws():
                raise ParseError("expected whitespace between clauses")
            if self._pos >= len(s):
                raise ParseError("trailing whitespace")
            clauses.append(self._clause())
        return BooleanQuery(tuple(clauses))

    def _peek(self) -> str:
        return self._s[self._pos] if self._pos < len(self._s) else ""

    def _skip_ws(self) -> bool:
        n = 0
        while self._peek() in _WS and self._peek():
            self._pos += 1
            n += 1
        return n > 0

    def _clause(self) -> BooleanClause:
        occur = self.default_occur
        c = self._peek()
        if c == "+":
            occur = MUST
            self._pos += 1
        elif c == "!":
            occur = MUST_NOT
            self._pos += 1
        q = self._unboosted()
        if self._peek() == "^":
            self._pos += 1
            w = self._word_chars(allow_wild=False)
            try:
                boost = int(w)
            except ValueError as e:
                raise ParseError("bad boost") from e
            q = _apply_boost(q, float(boost))
        return BooleanClause(q, occur)

    def _word_chars(self, allow_wild: bool) -> str:
        start = self._pos
        s = self._s
        while self._pos < len(s):
            ch = s[self._pos]
            if ch in _WS:
                break
            if ch in _DISALLOWED and not (allow_wild and ch in _WILD):
                break
            if ch == "~" and self.extensions:
                break
            self._pos += 1
        if self._pos == start:
            raise ParseError("expected word")
        return s[start : self._pos]

    def _maybe_number(self) -> str | None:
        start = self._pos
        s = self._s
        while self._pos < len(s) and (
            s[self._pos].isdigit() or s[self._pos] == "."
        ):
            self._pos += 1
        return s[start : self._pos] if self._pos > start else None

    def _unboosted(self) -> Query:
        if self._peek() == '"':
            return self._phrase()
        tok = self._word_chars(allow_wild=True)
        is_wild = any(ch in _WILD for ch in tok)
        if self._peek() == ":":
            if is_wild:
                raise ParseError("wildcard field name")
            self._pos += 1
            self._active_field = tok  # $set-query-field
            return self._unboosted()
        if is_wild:
            field = self._use_active_field()
            return self._multi_field(
                field, lambda f: WildcardQuery(f, tok)
            )
        return self._term_or_phrase_from_word(tok)

    def _phrase(self) -> Query:
        assert self._peek() == '"'
        self._pos += 1
        words = [self._word_chars(allow_wild=False)]
        while True:
            had_ws = self._skip_ws()
            if self._peek() == '"':
                self._pos += 1
                break
            if not had_ws:
                raise ParseError("unterminated phrase")
            words.append(self._word_chars(allow_wild=False))
        slop = self.default_slop
        if self.extensions and self._peek() == "~":
            self._pos += 1
            num = self._maybe_number()
            if num is None:
                raise ParseError("expected slop after ~")
            try:
                slop = int(float(num))
            except ValueError as e:
                raise ParseError("bad slop") from e
        field = self._use_active_field()
        if len(words) == 1 and slop == self.default_slop:
            return self._analyzed_word_query(field, words[0])
        return self._multi_field(
            field, lambda f: self._normal_phrase(f, words, slop)
        )

    def _normal_phrase(self, field: str, words: list[str],
                       slop: int | None = None) -> Query:
        terms: list[str] = []
        offsets: list[int] = []
        pos = -1  # first token increment (1) lands at offset 0
        for w in words:
            toks = self.analyzer.tokens(w)
            for t in toks:
                pos += 1
                terms.append(t)
                offsets.append(pos)
        if not terms:
            return TermQuery(field, "")
        if len(terms) == 1:
            return TermQuery(field, terms[0])
        base = offsets[0]
        return PhraseQuery(
            field,
            tuple(terms),
            tuple(o - base for o in offsets),
            slop=self.default_slop if slop is None else slop,
        )

    def _term_or_phrase_from_word(self, word: str) -> Query:
        field = self._use_active_field()
        if self.extensions and self._peek() == "~":
            self._pos += 1
            num = self._maybe_number()
            ms = 0.5
            if num is not None:
                try:
                    ms = float(num)
                except ValueError as e:
                    raise ParseError("bad fuzziness") from e
                if not (0.0 <= ms < 1.0):
                    raise ParseError("fuzziness must be in [0, 1)")
            toks = self.analyzer.tokens(word)
            if len(toks) == 1:
                return self._multi_field(
                    field, lambda f: FuzzyQuery(f, toks[0], ms)
                )
            # multi-token word under ~: fuzziness has no single term to
            # apply to — fall through to the normal analyzed query
        return self._multi_field(
            field, lambda f: self._analyzed_word_query(f, word)
        )

    def _analyzed_word_query(self, field: str, word: str) -> Query:
        toks = self.analyzer.tokens(word)
        if len(toks) == 0:
            return TermQuery(field, "")
        if len(toks) == 1:
            return TermQuery(field, toks[0])
        return PhraseQuery.of(field, toks, slop=self.default_slop)

    def _use_active_field(self) -> str:
        if self._active_field is not None:
            f = self._active_field
            self._active_field = None
            return f
        return self.default_field

    def _multi_field(self, field: str, make) -> Query:
        if field == "*" and self.fields:
            qs = [make(f) for f in self.fields]
            if len(qs) == 1:
                return qs[0]
            return BooleanQuery(tuple(BooleanClause(q, SHOULD) for q in qs))
        return make(field)

    # -------------------------------------------------------------- bad parse
    def _bad_parse(self, s: str) -> Query:
        self._active_field = None
        field = self.default_field

        def make(f: str) -> Query:
            toks = self.analyzer.tokens(s)
            if len(toks) == 0:
                return TermQuery(f, "")
            if len(toks) == 1:
                return TermQuery(f, toks[0])
            return BooleanQuery(
                tuple(BooleanClause(TermQuery(f, t), SHOULD) for t in toks)
            )

        return self._multi_field(field, make)


def _apply_boost(q: Query, boost: float) -> Query:
    from dataclasses import replace

    return replace(q, boost=q.boost * boost)
