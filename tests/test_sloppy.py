"""Sloppy-phrase frequency semantics: the vectorized batch sweep
(`_sloppy_freqs_batch`, the production path) must equal the per-doc
k-pointer reference loop (`_sloppy_freq`, sloppy-phrase-scorer.lisp:6-34)
in BOTH weight modes — "count" (windows as integer tf) and "reciprocal"
(the reference's Σ 1/(1+span), similarity.lisp:158-159)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from montezuma_spark.search.kernel import _sloppy_freq, _sloppy_freqs_batch


def _random_doc(rng, k):
    """k shifted position lists (sorted unique, possibly empty/overlapping)."""
    return [
        np.sort(
            rng.choice(
                np.arange(-3, 40), size=rng.integers(0, 7), replace=False
            )
        ).astype(np.int64)
        for _ in range(k)
    ]


@given(
    st.integers(min_value=0, max_value=2**31),  # rng seed
    st.integers(min_value=2, max_value=4),      # phrase terms
    st.integers(min_value=0, max_value=8),      # slop
    st.sampled_from(["count", "reciprocal"]),
)
@settings(max_examples=150, deadline=None)
def test_batch_sweep_matches_loop(seed, k, slop, weight):
    rng = np.random.default_rng(seed)
    ndocs = int(rng.integers(1, 12))
    docs = [_random_doc(rng, k) for _ in range(ndocs)]
    shifted_lists = [[docs[d][t] for d in range(ndocs)] for t in range(k)]
    got = _sloppy_freqs_batch(shifted_lists, slop, weight)
    want = np.array(
        [_sloppy_freq(docs[d], slop, weight) for d in range(ndocs)]
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_known_values():
    # "a b" with slop 2: a at [0, 10], b at [1, 12] (shifted by offset 1 →
    # b' = [0, 11]); windows: step(0,a) span 0 → hit; step(0,b') span
    # |10-0|=10 → miss... enumerate via the loop and pin both modes.
    a = np.asarray([0, 10], dtype=np.int64)
    b = np.asarray([0, 11], dtype=np.int64)
    assert _sloppy_freq([a, b], 2, "count") == 2.0
    assert _sloppy_freq([a, b], 2, "reciprocal") == pytest.approx(1.0 + 0.5)
    got_c = _sloppy_freqs_batch([[a], [b]], 2, "count")
    got_r = _sloppy_freqs_batch([[a], [b]], 2, "reciprocal")
    assert got_c[0] == 2.0
    assert got_r[0] == pytest.approx(1.5)


def test_reciprocal_mode_end_to_end(spark):
    """PhraseQuery(weight='reciprocal') through the full engine: score uses
    tf = Σ 1/(1+span) (reference sloppy-freq) — checked against a direct
    numpy BM25 computation from the corpus."""
    import math

    import pandas as pd

    from montezuma_spark.index import FieldConfig, IndexConfig, build_index
    from montezuma_spark.search import PhraseQuery, Searcher

    texts = [
        "spark merge now",             # adjacent (span 0 after shift)
        "spark x merge",               # span 1
        "spark x y z merge",           # span 3 > slop
        "merge spark",                 # reversed: shifted span 2
        "spark merge spark q merge",   # multiple windows
        "nothing here",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"url": [f"u://{i}" for i in range(len(texts))], "text": texts}
        )
    )
    cfg = IndexConfig(
        fields=[FieldConfig("text", "text", "whitespace")], key_col="url",
        shard_bits=3,
    )
    idx = build_index(spark, docs, cfg)
    q = PhraseQuery.of("text", ["spark", "merge"], slop=2,
                       weight="reciprocal")
    got = dict(Searcher(idx).top_docs(q, k=None))
    # direct computation
    toks = [t.split() for t in texts]
    n = len(texts)
    dfs = {
        w: sum(1 for t in toks if w in t) for w in ("spark", "merge")
    }
    idf = sum(
        math.log(1 + (n - dfs[w] + 0.5) / (dfs[w] + 0.5))
        for w in ("spark", "merge")
    )
    avgdl = sum(len(t) for t in toks) / n
    want = {}
    for d, t in enumerate(toks):
        sp = np.asarray([i for i, w in enumerate(t) if w == "spark"])
        me = np.asarray([i - 1 for i, w in enumerate(t) if w == "merge"])
        if len(sp) == 0 or len(me) == 0:
            continue
        tf = _sloppy_freq([sp, me], 2, "reciprocal")
        if tf <= 0:
            continue
        dl = len(t)
        want[d] = (
            idf * tf * (1.2 + 1)
            / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        )
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)
    # count mode ranks can differ; sanity: doc 0 (adjacent) beats doc 1
    assert got[0] > got[1]
