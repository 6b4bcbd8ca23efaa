"""Block-max pruned disjunction (eval_top) must be rank- AND score-identical
to the exhaustive path — the correctness contract of block-max WAND
(DESIGN.md; the reference has only skip lists, segment-merger.lisp:248-278,
so these goldens are self-referential: pruned vs exhaustive)."""

import numpy as np
import pandas as pd
import pytest

from montezuma_spark.codec.postings import encode_cell
from montezuma_spark.search.ast import (
    SHOULD,
    TermQuery,
    bool_query,
)
from montezuma_spark.search.kernel import CompiledPlan, ShardEval, _finish

K1, B = 1.2, 0.75


@pytest.fixture(autouse=True)
def _always_prune(monkeypatch):
    """These tests pin the pruning MACHINERY on small synthetic corpora;
    the production threshold (PRUNE_MIN_POSTINGS: full decode beats the
    round machinery below ~64k postings) would bail them all to the
    exhaustive path. test_small_df_takes_exhaustive_path covers the
    threshold itself."""
    import montezuma_spark.search.kernel as kmod

    monkeypatch.setattr(kmod, "PRUNE_MIN_POSTINGS", 0)


def _build_shard(rng, n_docs, terms_df):
    """terms_df: {term: df}. Returns (postings_pdf, idf, df_est, stats)."""
    import math

    dls = rng.integers(20, 400, size=n_docs).astype(np.int64)
    avgdl = float(dls.mean())
    rows = []
    idf, df_est = {}, {}
    for term, df in terms_df.items():
        docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(
            np.int64
        )
        tfs = rng.integers(1, 12, size=df).astype(np.int64)
        cell, meta = encode_cell(docs, tfs, dls=dls[docs], block_size=16)
        rows.append(
            {
                "field": "text",
                "term": term,
                "shard": 0,
                "df": df,
                "cf": int(tfs.sum()),
                "postings": cell,
                "positions": b"",
                "pos_off": [],
                "blk_first": meta["first"],
                "blk_last": meta["last"],
                "blk_n": meta["n"],
                "blk_off": meta["off"],
                "blk_codes_len": meta["codes_len"],
                "blk_ext_len": meta["ext_len"],
                "blk_maxtf": meta["maxtf"],
                "blk_mindl": meta["mindl"],
                "blk_imp_n": meta["imp_n"],
                "blk_imp_tf": meta["imp_tf"],
                "blk_imp_dl": meta["imp_dl"],
            }
        )
        idf[("text", term)] = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        df_est[("text", term)] = df
    stats = {"text": {"num_docs": n_docs, "avgdl": avgdl}}
    return pd.DataFrame(rows), idf, df_est, stats


@pytest.mark.parametrize("seed", [0, 1, 7])
@pytest.mark.parametrize("k", [1, 10, 100])
def test_pruned_disjunction_identical(seed, k):
    rng = np.random.default_rng(seed)
    n_docs = 5000
    # zipf-ish: two hot terms, a mid term, two rare terms
    terms = {"hot1": 3000, "hot2": 2500, "mid": 400, "rare1": 25, "rare2": 7}
    pdf, idf, df_est, stats = _build_shard(rng, n_docs, terms)
    q = bool_query(*[(TermQuery("text", t), SHOULD) for t in terms])
    plan = CompiledPlan(
        query=q, idf=idf, df_est=df_est, stats=stats,
        k1=K1, b=B, k=k, need_positions=False,
    )
    ev = ShardEval(plan, pdf)
    pruned = _finish(plan, *ev.eval_top(q))
    exact = _finish(plan, *ev.eval(q))
    assert list(pruned["docid"]) == list(exact["docid"])
    np.testing.assert_allclose(
        pruned["score"].to_numpy(), exact["score"].to_numpy(), rtol=0, atol=1e-12
    )


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("k", [1, 10, 100])
def test_pruned_single_term_identical(seed, k):
    """The degenerate one-term block-max path (impact-front bounds) must
    be rank- and score-identical to the exhaustive term eval."""
    rng = np.random.default_rng(seed)
    n_docs = 5000
    terms = {"hot1": 3000, "mid": 400, "rare1": 25}
    pdf, idf, df_est, stats = _build_shard(rng, n_docs, terms)
    for t in terms:
        q = TermQuery("text", t)
        plan = CompiledPlan(
            query=q, idf=idf, df_est=df_est, stats=stats,
            k1=K1, b=B, k=k, need_positions=False,
        )
        ev = ShardEval(plan, pdf)
        pruned = _finish(plan, *ev.eval_top(q))
        exact = _finish(plan, *ev.eval(q))
        assert list(pruned["docid"]) == list(exact["docid"]), t
        np.testing.assert_allclose(
            pruned["score"].to_numpy(), exact["score"].to_numpy(),
            rtol=0, atol=1e-12,
        )


def test_pruned_single_term_tie_heavy():
    """Tie-heavy corpus (every top score identical — the web-hot-term
    shape that defeats the loose (maxtf, mindl) bound): the pruned path
    must keep the docid-asc tie-break exactly AND actually skip blocks."""
    rng = np.random.default_rng(5)
    n_docs = 20000
    df = 15000
    docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(
        np.int64
    )
    # 99% of postings share (tf=1, dl=100); a few high-tf/low-dl outliers
    tfs = np.ones(df, dtype=np.int64)
    dls = np.full(df, 100, dtype=np.int64)
    hot = rng.choice(df, size=50, replace=False)
    tfs[hot] = rng.integers(2, 6, size=50)
    dls[hot] = rng.integers(20, 60, size=50)
    import math

    cell, meta = encode_cell(docs, tfs, dls=dls, block_size=16)
    pdf = pd.DataFrame(
        [
            {
                "field": "text", "term": "w", "shard": 0, "df": df,
                "cf": int(tfs.sum()), "postings": cell, "positions": b"",
                "pos_off": [],
                **{f"blk_{kk}": meta[kk] for kk in (
                    "first", "last", "n", "off", "codes_len", "ext_len",
                    "maxtf", "mindl", "imp_n", "imp_tf", "imp_dl",
                )},
            }
        ]
    )
    idf = {("text", "w"): math.log(1 + (n_docs - df + 0.5) / (df + 0.5))}
    stats = {"text": {"num_docs": n_docs, "avgdl": 100.0}}
    q = TermQuery("text", "w")
    plan = CompiledPlan(
        query=q, idf=idf, df_est={("text", "w"): df}, stats=stats,
        k1=K1, b=B, k=10, need_positions=False,
    )
    ev = ShardEval(plan, pdf)
    got = ev._try_pruned_term("text", "w", 1.0)
    assert got is not None
    pruned = _finish(plan, *got)
    exact = _finish(plan, *ev.eval(q))
    assert list(pruned["docid"]) == list(exact["docid"])
    np.testing.assert_allclose(
        pruned["score"].to_numpy(), exact["score"].to_numpy(), atol=1e-12
    )
    # tight impact bounds must let the one-term path skip most postings
    assert len(got[0]) < df * 0.2


def test_pruned_skips_blocks(monkeypatch):
    """With k=1 and a dominant rare term, the hot terms must NOT be decoded
    in full — count decoded blocks to prove pruning engages."""
    rng = np.random.default_rng(42)
    n_docs = 20000
    terms = {"hot": 15000, "rare": 5}
    pdf, idf, df_est, stats = _build_shard(rng, n_docs, terms)
    q = bool_query(
        (TermQuery("text", "rare"), SHOULD), (TermQuery("text", "hot"), SHOULD)
    )
    plan = CompiledPlan(
        query=q, idf=idf, df_est=df_est, stats=stats,
        k1=K1, b=B, k=1, need_positions=False,
    )
    ev = ShardEval(plan, pdf)

    decoded_blocks = {"n": 0}
    orig = ShardEval._decode_row

    def counting(self, row, candidates=None, with_block_info=False):
        meta = self._meta(row)
        sel = self._blocks_for(meta, candidates)
        decoded_blocks["n"] += len(sel) if sel is not None else len(meta["n"])
        return orig(self, row, candidates, with_block_info)

    monkeypatch.setattr(ShardEval, "_decode_row", counting)
    pruned = _finish(plan, *ev.eval_top(q))
    total_blocks = sum(len(r["blk_n"]) for _, r in pdf.iterrows())
    # rare term (1 block) fully + hot term restricted to candidate blocks.
    # idf of 'rare' dwarfs 'hot', so theta locks after term 1 and the hot
    # term decodes only blocks containing the <=5 candidates.
    assert decoded_blocks["n"] < total_blocks * 0.2
    ev2 = ShardEval(plan, pdf)
    monkeypatch.undo()
    exact = _finish(plan, *ev2.eval(q))
    assert list(pruned["docid"]) == list(exact["docid"])
    np.testing.assert_allclose(
        pruned["score"].to_numpy(), exact["score"].to_numpy(), atol=1e-12
    )


def test_small_df_takes_exhaustive_path(monkeypatch):
    """Below PRUNE_MIN_POSTINGS (or with full-decode memos on every row)
    _try_pruned_term bails to the exhaustive path — which is exact, so
    only the routing is asserted."""
    import math

    import montezuma_spark.search.kernel as kmod

    monkeypatch.undo()  # restore the real threshold
    rng = np.random.default_rng(11)
    n_docs = 5000
    pdf, idf, df_est, stats = _build_shard(rng, n_docs, {"w": 400})
    q = TermQuery("text", "w")
    plan = CompiledPlan(
        query=q, idf=idf, df_est=df_est, stats=stats,
        k1=K1, b=B, k=10, need_positions=False,
    )
    ev = ShardEval(plan, pdf)
    assert df_est[("text", "w")] < kmod.PRUNE_MIN_POSTINGS
    assert ev._try_pruned_term("text", "w", 1.0) is None
    # memoized rows bail too, even above the threshold
    plan2 = CompiledPlan(
        query=q, idf=idf,
        df_est={("text", "w"): kmod.PRUNE_MIN_POSTINGS + 1}, stats=stats,
        k1=K1, b=B, k=10, need_positions=False,
    )
    ev2 = ShardEval(plan2, pdf)
    assert ev2._try_pruned_term("text", "w", 1.0) is not None
    ev2._decode("text", "w")  # memoizes row.full on every row
    assert ev2._try_pruned_term("text", "w", 1.0) is None
