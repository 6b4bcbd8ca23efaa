"""Analyzers: tokenizer + filter pipelines, vectorized.

Mirrors the reference presets (src/analysis/analyzers.lisp):

* ``default``     = lowercase-tokenizer                     (analyzers.lisp:3-10)
* ``whitespace``  = whitespace-tokenizer                    (analyzers.lisp:27-32)
* ``stop``        = lowercase-tokenizer → stop-filter       (analyzers.lisp:42-52)
* ``standard``    = standard-tokenizer → lowercase → stop   (analyzers.lisp:55-65)
* ``porter``      = standard pipeline → porter-stem         (token-filters.lisp:45-53)

Filter semantics match the reference exactly:
* lowercase-filter downcases images (token-filters.lisp:10-18)
* stop-filter drops stopword tokens with NO position-increment adjustment —
  positions of surviving tokens are their index in the *filtered* stream
  (next-token recursion, token-filters.lisp:36-42; position counting in
  src/index/document-writer.lisp:121-142 advances only on emitted tokens).

The 35-word English stop list is verbatim from analyzers.lisp:35-39.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field

import pandas as pd

from montezuma_spark.analysis.porter import stem
from montezuma_spark.analysis.tokenizers import (
    LOWERCASE_TOKENIZER,
    STANDARD_TOKENIZER,
    UNICODE_LETTER_TOKENIZER,
    WHITESPACE_TOKENIZER,
    Tokenizer,
)

ENGLISH_STOP_WORDS = frozenset(
    (
        "a an and are as at be but by for if in into is it no not of on or s such "
        "t that the their then there these they this to was will with"
    ).split()
)


def fold_ascii(token: str) -> str:
    """Accent folding — the Lucene-family ASCIIFolding idea as a
    beyond-reference EXTENSION (the reference's filters are lowercase/
    stop/porter only, token-filters.lisp): NFKD-decompose and drop
    combining marks, so café→cafe, naïve→naive, Łódź→"odz" minus the
    unmapped stroke (chars that don't decompose to ASCII pass through
    unchanged rather than being dropped)."""
    out = []
    for ch in unicodedata.normalize("NFKD", token):
        if unicodedata.combining(ch):
            continue
        out.append(ch)
    return "".join(out)


@dataclass(frozen=True)
class Analyzer:
    """A tokenizer followed by optional lowercase/stop/stem/fold filters."""

    name: str
    tokenizer: Tokenizer
    lowercase: bool = False
    stop_words: frozenset | None = None
    stemmer: bool = False
    fold: bool = False   # accent folding AFTER lowercase, BEFORE stop/stem

    # -- single-string path (goldens, query-side analysis) -------------------
    def tokens_with_offsets(self, text: str) -> list[tuple[str, int, int]]:
        out = []
        for img, s, e in self.tokenizer.scan(text):
            if self.lowercase:
                img = img.lower()
            if self.fold:
                img = fold_ascii(img)
            if self.stop_words is not None and img in self.stop_words:
                continue
            if self.stemmer:
                img = stem(img)
            out.append((img, s, e))
        return out

    def tokens(self, text: str) -> list[str]:
        return [t[0] for t in self.tokens_with_offsets(text)]

    # -- vectorized path -----------------------------------------------------
    def tokens_series(self, s: pd.Series) -> pd.Series:
        """Series[str] → Series[list[str]] applying the full pipeline.

        Filters are applied through per-unique-token tables (O(|vocab|)
        Python), keeping the per-row work a C-level list comprehension.
        """
        toks = self.tokenizer.tokens_series(s)
        needs_table = (
            self.lowercase or self.stop_words is not None or self.stemmer
            or self.fold
        )
        if not needs_table:
            return toks
        vocab = set()
        for lst in toks:
            vocab.update(lst)
        table: dict[str, str | None] = {}
        for t in vocab:
            img = t.lower() if self.lowercase else t
            if self.fold:
                img = fold_ascii(img)
            if self.stop_words is not None and img in self.stop_words:
                table[t] = None
                continue
            table[t] = stem(img) if self.stemmer else img
        return toks.map(
            lambda lst: [v for v in (table[t] for t in lst) if v is not None]
        )


DEFAULT_ANALYZER = Analyzer("default", LOWERCASE_TOKENIZER)
WHITESPACE_ANALYZER = Analyzer("whitespace", WHITESPACE_TOKENIZER)
STOP_ANALYZER = Analyzer(
    "stop", LOWERCASE_TOKENIZER, stop_words=ENGLISH_STOP_WORDS
)
STANDARD_ANALYZER = Analyzer(
    "standard", STANDARD_TOKENIZER, lowercase=True, stop_words=ENGLISH_STOP_WORDS
)
# The stop-less variant the reference's *tests* assume (tc-standard-analyzer,
# tc-query-parser expect stop words to survive — stale vs shipped
# analyzers.lisp:55-65; see SURVEY.md §2.2). Kept for golden parity checks.
STANDARD_NOSTOP_ANALYZER = Analyzer(
    "standard-nostop", STANDARD_TOKENIZER, lowercase=True
)
PORTER_ANALYZER = Analyzer(
    "porter",
    STANDARD_TOKENIZER,
    lowercase=True,
    stop_words=ENGLISH_STOP_WORDS,
    stemmer=True,
)
# lowercase letter tokens, no stop/stem — SQL-oracle-friendly pipeline
# (expressible in DuckDB as lower(regexp_extract_all(text,'[a-zA-Z]+')))
SIMPLE_ANALYZER = Analyzer("simple", LOWERCASE_TOKENIZER)
# standard pipeline + accent folding (beyond-reference extension for
# multilingual web text: café/cafe unify at index AND query time)
FOLDING_ANALYZER = Analyzer(
    "folding", UNICODE_LETTER_TOKENIZER, lowercase=True,
    stop_words=ENGLISH_STOP_WORDS, fold=True,
)

ANALYZERS: dict[str, Analyzer] = {
    a.name: a
    for a in (
        DEFAULT_ANALYZER,
        WHITESPACE_ANALYZER,
        STOP_ANALYZER,
        STANDARD_ANALYZER,
        STANDARD_NOSTOP_ANALYZER,
        PORTER_ANALYZER,
        SIMPLE_ANALYZER,
        FOLDING_ANALYZER,
    )
}


def get_analyzer(name_or_analyzer) -> Analyzer:
    if isinstance(name_or_analyzer, Analyzer):
        return name_or_analyzer
    return ANALYZERS[name_or_analyzer]


@dataclass(frozen=True)
class PerFieldAnalyzer:
    """Per-field analyzer dispatch (ref: analyzers.lisp:68-75)."""

    default: Analyzer
    per_field: dict = field(default_factory=dict)

    def for_field(self, fieldname: str) -> Analyzer:
        return self.per_field.get(fieldname, self.default)
