"""Tokenizers: regex scanners over whole strings, applied vectorized.

Each tokenizer is (pattern, normalize) where normalize maps a raw match to
the token image. Patterns are literal translations of the reference's
cl-ppcre scanners (ASCII semantics — cl-ppcre's \\w == [a-zA-Z0-9_]):

* word        — ``\\w+``            (src/analysis/tokenizers.lisp:45-46)
* letter      — ``[a-zA-Z]+``       (tokenizers.lisp:56-58)
* lowercase   — letter + downcase   (tokenizers.lisp:60-64)
* whitespace  — ``\\S+``            (tokenizers.lisp:67-71)
* standard    — Lucene-ish compound pattern + acronym/apostrophe normalize
                (src/analysis/standard-tokenizer.lisp:28-72); goldens in
                tests/unit/analysis/tc-standard-analyzer.lisp:4-18

Vectorized application: ``pandas.Series.str.findall`` for the token stream
(one C-driven pass per column batch); normalization is applied per *unique*
token via a cached dict, never per row.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

import pandas as pd

_ALPHA = r"[a-zA-Z]"
_PUNCT = r"[_\/.,-]"
_HASDIGIT = r"\w*\d\w*"

# Literal translation of standard-tokenizer.lisp:33-54 (alternation order
# preserved — leftmost-first semantics match cl-ppcre/PCRE).
STANDARD_PATTERN = (
    _ALPHA + "+"
    "(?:"
    "(?:'" + _ALPHA + "+)+"
    r"|\.(?:" + _ALPHA + r"\.)+"
    r"|(?:@|\&)\w+(?:[-.]\w+)*"
    ")"
    r"|\w+"
    "(?:"
    r"(?:[\-._][\-._\w]+)?\@\w+(?:[-.]\w+)+"
    "|" + _PUNCT + _HASDIGIT + "(?:" + _PUNCT + r"\w+" + _PUNCT + _HASDIGIT + ")*"
    "(?:" + _PUNCT + r"\w+)?"
    r"|(?:\.\w+)+"
    "|"
    ")"
)

# normalize() of standard-tokenizer.lisp:60-72:
#   acronym-word  = ^alpha \. (alpha \.)+ $   → strip all dots   (I.B.M. → IBM)
#   apostrophe-word = ^alpha+ ' alpha $       → strip 's / 'S    (she's → she)
_ACRONYM_WORD = re.compile(r"^[a-zA-Z]\.(?:[a-zA-Z]\.)+$")
_APOSTROPHE_WORD = re.compile(r"^[a-zA-Z]+'[a-zA-Z]$")
_APOSTROPHE_S = re.compile(r"'[sS]")


def standard_normalize(tok: str) -> str:
    if _ACRONYM_WORD.match(tok):
        return tok.replace(".", "")
    if _APOSTROPHE_WORD.match(tok):
        return _APOSTROPHE_S.sub("", tok)
    return tok


@dataclass(frozen=True)
class Tokenizer:
    name: str
    pattern: str
    normalize: Callable[[str], str] | None = None
    lowercase_input: bool = False  # lowercase-tokenizer downcases images
    unicode_letters: bool = False  # compile WITHOUT re.ASCII (extension
                                   # tokenizers; reference ones are ASCII)

    def regex(self) -> re.Pattern:
        return re.compile(
            self.pattern, 0 if self.unicode_letters else re.ASCII
        )

    # -- single-string path (golden tests / query analysis; driver-side) -----
    def scan(self, text: str) -> list[tuple[str, int, int]]:
        """Return [(image, start, end)] like the reference's token stream."""
        out = []
        for m in self.regex().finditer(text):
            img = m.group(0)
            if self.normalize is not None:
                img = self.normalize(img)
            if self.lowercase_input:
                img = img.lower()
            out.append((img, m.start(), m.end()))
        return out

    # -- vectorized path (inside pandas UDFs) --------------------------------
    def tokens_series(self, s: pd.Series) -> pd.Series:
        """Series[str] → Series[list[str]] of token images (vectorized)."""
        toks = s.fillna("").str.findall(self.regex())
        if self.normalize is not None:
            # normalize per unique token, then map — O(|vocab|) Python
            vocab = set()
            for lst in toks:
                vocab.update(lst)
            table = {t: self.normalize(t) for t in vocab}
            toks = toks.map(lambda lst: [table[t] for t in lst])
        if self.lowercase_input:
            toks = toks.map(lambda lst: [t.lower() for t in lst])
        return toks


WORD_TOKENIZER = Tokenizer("word", r"\w+")
LETTER_TOKENIZER = Tokenizer("letter", r"[a-zA-Z]+")
LOWERCASE_TOKENIZER = Tokenizer("lowercase", r"[a-zA-Z]+", lowercase_input=True)
WHITESPACE_TOKENIZER = Tokenizer("whitespace", r"\S+")
STANDARD_TOKENIZER = Tokenizer("standard", STANDARD_PATTERN, normalize=standard_normalize)
# Unicode-letter runs — for the accent-folding extension pipeline (the
# ASCII tokenizers above split on accented characters)
UNICODE_LETTER_TOKENIZER = Tokenizer(
    "uletter", r"[^\W\d_]+", unicode_letters=True
)

TOKENIZERS = {
    t.name: t
    for t in (
        WORD_TOKENIZER,
        LETTER_TOKENIZER,
        LOWERCASE_TOKENIZER,
        WHITESPACE_TOKENIZER,
        STANDARD_TOKENIZER,
    )
}
