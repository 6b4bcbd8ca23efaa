"""Round-trip + property tests for the varint / postings-cell codec."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from montezuma_spark.codec import (
    decode_cell,
    decode_positions,
    decode_varints,
    encode_cell,
    encode_positions,
    encode_varints,
    grouped_delta_decode,
)


def test_varint_known_values():
    # LEB128: 0→00, 127→7f, 128→80 01, 300→ac 02
    assert encode_varints(np.array([0], dtype=np.uint64)) == b"\x00"
    assert encode_varints(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode_varints(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert encode_varints(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert list(decode_varints(b"\x00\x7f\x80\x01\xac\x02")) == [0, 127, 128, 300]


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(decode_varints(encode_varints(arr))) == vals


def test_grouped_delta_decode():
    # groups [5, 2, 7] / [3] / [10, 1]  (first absolute, rest deltas)
    deltas = np.array([5, 2, 7, 3, 10, 1])
    lens = np.array([3, 1, 2])
    out = grouped_delta_decode(deltas, lens)
    assert list(out) == [5, 7, 14, 3, 10, 11]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),  # docid gap seed
            st.integers(min_value=1, max_value=50),  # tf
        ),
        min_size=0,
        max_size=500,
    ),
    st.integers(min_value=4, max_value=128),
)
@settings(max_examples=100, deadline=None)
def test_cell_roundtrip(entries, block):
    if entries:
        gaps = np.array([e[0] for e in entries], dtype=np.int64)
        docids = np.cumsum(gaps + 1) - 1
        tfs = np.array([e[1] for e in entries], dtype=np.int64)
    else:
        docids = np.empty(0, dtype=np.int64)
        tfs = np.empty(0, dtype=np.int64)
    cell, meta = encode_cell(docids, tfs, block_size=block)
    d, t, dl = decode_cell(cell, meta)
    np.testing.assert_array_equal(d, docids)
    np.testing.assert_array_equal(t, tfs)
    assert len(dl) == len(docids)


def test_cell_partial_block_decode():
    docids = np.arange(0, 1000, 3, dtype=np.int64)
    tfs = (docids % 7 + 1).astype(np.int64)
    cell, meta = encode_cell(docids, tfs, block_size=64)
    nblocks = len(meta["n"])
    assert nblocks == int(np.ceil(len(docids) / 64))
    # decode only blocks 1 and 3
    d, t, _dl = decode_cell(cell, meta, blocks=[1, 3])
    expect_idx = np.r_[64:128, 192:256]
    np.testing.assert_array_equal(d, docids[expect_idx])
    np.testing.assert_array_equal(t, tfs[expect_idx])
    # block metadata is consistent
    assert meta["first"][1] == docids[64]
    assert meta["last"][1] == docids[127]


def test_blockmax_bound_is_upper_bound():
    rng = np.random.RandomState(7)
    docids = np.sort(rng.choice(10_000, size=500, replace=False)).astype(np.int64)
    tfs = rng.randint(1, 30, size=500).astype(np.int64)
    dls = rng.randint(10, 300, size=500).astype(np.int64)
    avgdl = 120.0
    cell, meta = encode_cell(docids, tfs, dls=dls, block_size=32)
    from montezuma_spark.codec import bm25_tf_norm
    from montezuma_spark.codec.postings import block_upper_bounds

    norms = bm25_tf_norm(tfs, dls, avgdl)
    ubs = block_upper_bounds(meta["maxtf"], meta["mindl"], avgdl)
    for j in range(len(meta["n"])):
        s, e = 32 * j, min(32 * (j + 1), 500)
        assert ubs[j] >= norms[s:e].max() - 1e-12
        assert meta["maxtf"][j] == tfs[s:e].max()
        assert meta["mindl"][j] == dls[s:e].min()


def test_impact_front_bound_is_tight_upper_bound():
    """The competitive-impact front per block (Pareto pairs of actual
    postings) yields a bound that (a) dominates every posting's tf_norm
    and (b) is EXACT — achieved by some real posting in the block
    (unlike the (maxtf, mindl) cross-doc pairing, which can exceed every
    actual score and defeat pruning on tie-heavy corpora)."""
    rng = np.random.RandomState(11)
    docids = np.sort(
        rng.choice(10_000, size=600, replace=False)
    ).astype(np.int64)
    tfs = rng.randint(1, 6, size=600).astype(np.int64)
    dls = rng.randint(10, 500, size=600).astype(np.int64)
    avgdl = 150.0
    _, meta = encode_cell(docids, tfs, dls=dls, block_size=64)
    from montezuma_spark.codec import bm25_tf_norm

    cuts = np.concatenate([[0], np.cumsum(meta["imp_n"])])
    for j in range(len(meta["n"])):
        s, e = 64 * j, min(64 * (j + 1), 600)
        ftf = np.asarray(meta["imp_tf"][cuts[j] : cuts[j + 1]])
        fdl = np.asarray(meta["imp_dl"][cuts[j] : cuts[j + 1]])
        # strictly decreasing tf, strictly decreasing dl (front ordering)
        assert (np.diff(ftf) < 0).all() and (np.diff(fdl) < 0).all()
        # every posting dominated by some front pair
        for tt, dd in zip(tfs[s:e], dls[s:e]):
            assert ((ftf >= tt) & (fdl <= dd)).any()
        # the bound equals the block's true max score (tight)
        ub = bm25_tf_norm(ftf, fdl, avgdl).max()
        true_max = bm25_tf_norm(tfs[s:e], dls[s:e], avgdl).max()
        assert abs(ub - true_max) < 1e-12
        # every front pair is an actual posting of the block
        pairs = set(zip(tfs[s:e].tolist(), dls[s:e].tolist()))
        for tt, dd in zip(ftf.tolist(), fdl.tolist()):
            assert (tt, dd) in pairs


def test_positions_roundtrip():
    rng = np.random.RandomState(3)
    ndocs = 300
    tfs = rng.randint(1, 8, size=ndocs).astype(np.int64)
    pos_lists = [np.sort(rng.choice(5000, size=tf, replace=False)) for tf in tfs]
    flat = np.concatenate(pos_lists).astype(np.int64)
    docids = np.arange(ndocs, dtype=np.int64) * 2
    cell, meta = encode_cell(docids, tfs, block_size=50)
    pos_cell, pos_off = encode_positions(tfs, flat, block_size=50)
    # decode positions of blocks 0 and 2
    _, t0, _dl0 = decode_cell(cell, meta, blocks=[0])
    _, t2, _dl2 = decode_cell(cell, meta, blocks=[2])
    out = decode_positions(pos_cell, pos_off, meta, {0: t0, 2: t2})
    b0 = np.concatenate(pos_lists[0:50])
    b2 = np.concatenate(pos_lists[100:150])
    np.testing.assert_array_equal(out[0], b0)
    np.testing.assert_array_equal(out[2], b2)


@given(
    st.lists(  # groups: list of (n_postings, docid_seed, tf_seed)
        st.tuples(
            st.integers(min_value=1, max_value=120),
            st.integers(min_value=0, max_value=2**31),
            st.integers(min_value=0, max_value=2**31),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=4, max_value=64),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_encode_cells_batch_matches_encode_cell(groups, block, with_pos):
    """CLAUDE.md invariant: the batch encoder must stay BYTE-identical to
    encode_cell/encode_positions per group (the build path uses the batch
    encoder; merge/rebase/expunge re-encode via encode_cell — a silent
    divergence would corrupt merged or expunged cells)."""
    from montezuma_spark.codec.postings import encode_cells_batch

    all_d, all_t, all_dl, all_pos = [], [], [], []
    bounds = [0]
    for n, dseed, tseed in groups:
        rng = np.random.RandomState((dseed ^ tseed) % (2**31))
        gaps = rng.randint(0, 1000, size=n).astype(np.int64)
        docids = np.cumsum(gaps + 1) - 1
        tfs = rng.randint(1, 9, size=n).astype(np.int64)
        dls = rng.randint(1, 400, size=n).astype(np.int64)
        all_d.append(docids)
        all_t.append(tfs)
        all_dl.append(dls)
        if with_pos:
            for tf in tfs:
                all_pos.append(
                    np.sort(rng.choice(10_000, size=tf, replace=False)).astype(
                        np.int64
                    )
                )
        bounds.append(bounds[-1] + n)
    gb = np.asarray(bounds, dtype=np.int64)
    docids = np.concatenate(all_d)
    tfs = np.concatenate(all_t)
    dls = np.concatenate(all_dl)
    flat_pos = np.concatenate(all_pos) if with_pos else None
    enc = encode_cells_batch(
        gb, docids, tfs, dls, block_size=block, flat_positions=flat_pos
    )
    pb = np.concatenate([[0], np.cumsum(tfs)])
    for g in range(len(gb) - 1):
        s, e = gb[g], gb[g + 1]
        cell, meta = encode_cell(
            docids[s:e], tfs[s:e], dls=dls[s:e], block_size=block
        )
        assert enc["postings"][g] == cell, f"postings bytes differ, group {g}"
        for f in ("first", "last", "n", "off", "codes_len", "ext_len",
                  "maxtf", "mindl", "imp_n", "imp_tf", "imp_dl"):
            np.testing.assert_array_equal(
                np.asarray(enc[f][g]), np.asarray(meta[f]),
                err_msg=f"meta[{f}] differs, group {g}",
            )
        assert int(enc["df"][g]) == e - s
        assert int(enc["cf"][g]) == int(tfs[s:e].sum())
        if with_pos:
            pos_cell, pos_off = encode_positions(
                tfs[s:e], flat_pos[pb[s] : pb[e]], block_size=block
            )
            assert enc["positions"][g] == pos_cell, f"pos bytes, group {g}"
            np.testing.assert_array_equal(
                np.asarray(enc["pos_off"][g]), np.asarray(pos_off),
                err_msg=f"pos_off differs, group {g}",
            )


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),  # docid gap seed
            st.integers(min_value=1, max_value=50),  # tf
        ),
        min_size=1,
        max_size=300,
    ),
    st.integers(min_value=4, max_value=128),
)
@settings(max_examples=80, deadline=None)
def test_packed_cell_roundtrip(entries, block):
    """The bit-packed (PForDelta-class) codec round-trips any posting
    list, including partial-block decode."""
    gaps = np.array([e[0] for e in entries], dtype=np.int64)
    docids = np.cumsum(gaps + 1) - 1
    tfs = np.array([e[1] for e in entries], dtype=np.int64)
    dls = (docids % 473 + 1).astype(np.int64)
    cell, meta = encode_cell(
        docids, tfs, dls=dls, block_size=block, codec="packed"
    )
    d, t, dl = decode_cell(cell, meta, codec="packed")
    np.testing.assert_array_equal(d, docids)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(dl, dls)
    nb = len(meta["n"])
    if nb > 1:
        d1, t1, _ = decode_cell(cell, meta, blocks=[nb - 1], codec="packed")
        s = (nb - 1) * block
        np.testing.assert_array_equal(d1, docids[s:])
        np.testing.assert_array_equal(t1, tfs[s:])


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=150),
            st.integers(min_value=0, max_value=2**31),
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=4, max_value=64),
)
@settings(max_examples=40, deadline=None)
def test_packed_batch_matches_scalar(groups, block):
    """pack_blocks-based batch encoding is byte-identical per group to the
    scalar packed encoder (same invariant as the varint pair)."""
    from montezuma_spark.codec.postings import encode_cells_batch

    all_d, all_t, all_dl = [], [], []
    bounds = [0]
    for n, seed in groups:
        rng = np.random.RandomState(seed % (2**31))
        gaps = rng.randint(0, 100000, size=n).astype(np.int64)
        all_d.append(np.cumsum(gaps + 1) - 1)
        all_t.append(rng.randint(1, 9, size=n).astype(np.int64))
        all_dl.append(rng.randint(1, 1000, size=n).astype(np.int64))
        bounds.append(bounds[-1] + n)
    gb = np.asarray(bounds, dtype=np.int64)
    docids, tfs, dls = map(np.concatenate, (all_d, all_t, all_dl))
    enc = encode_cells_batch(
        gb, docids, tfs, dls, block_size=block, codec="packed"
    )
    for g in range(len(gb) - 1):
        s, e = gb[g], gb[g + 1]
        cell, meta = encode_cell(
            docids[s:e], tfs[s:e], dls=dls[s:e], block_size=block,
            codec="packed",
        )
        assert enc["postings"][g] == cell, g
        for f in ("first", "last", "n", "off", "codes_len", "ext_len",
                  "maxtf", "mindl", "imp_n", "imp_tf", "imp_dl"):
            np.testing.assert_array_equal(
                np.asarray(enc[f][g]), np.asarray(meta[f]), err_msg=f
            )


def test_packed_is_smaller_on_typical_postings():
    """On dense postings with small dls the packed codec beats varint
    (the reason it exists); both decode to the same arrays."""
    rng = np.random.RandomState(1)
    n = 5000
    docids = np.cumsum(rng.randint(1, 60, size=n)).astype(np.int64)
    tfs = rng.randint(1, 4, size=n).astype(np.int64)
    dls = rng.randint(20, 120, size=n).astype(np.int64)
    cv, mv = encode_cell(docids, tfs, dls=dls, block_size=128)
    cp, mp = encode_cell(docids, tfs, dls=dls, block_size=128, codec="packed")
    assert len(cp) < len(cv) * 0.8, (len(cp), len(cv))
    for cell, meta, codec in ((cv, mv, "varint"), (cp, mp, "packed")):
        d, t, dl = decode_cell(cell, meta, codec=codec)
        np.testing.assert_array_equal(d, docids)
        np.testing.assert_array_equal(t, tfs)
        np.testing.assert_array_equal(dl, dls)


def test_empty_cell():
    cell, meta = encode_cell(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    assert cell == b""
    d, t, dl = decode_cell(cell, meta)
    assert len(d) == 0 and len(t) == 0 and len(dl) == 0


@given(
    st.lists(  # rows: (n_postings, seed, block_mode)
        st.tuples(
            st.integers(min_value=0, max_value=300),
            st.integers(min_value=0, max_value=2**31),
            st.integers(min_value=0, max_value=2),  # 0=all, 1=subset, 2=empty
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=4, max_value=64),
    st.sampled_from(["varint", "packed"]),
)
@settings(max_examples=60, deadline=None)
def test_decode_cell_rows_matches_scalar(rows_spec, block, codec):
    """Batch-reader invariant (the read-path sibling of the
    encode_cells_batch byte-identity rule): decode_cell_rows must be
    VALUE-identical to concatenating per-row decode_cell results, for
    both codecs, under any per-row block selection (None / subset /
    empty). The serving kernel decodes a hot term's hundreds of shard
    cells through this path."""
    from montezuma_spark.codec.postings import (
        decode_cell_rows,
        decode_positions_rows,
    )

    base = 0
    rows, expect_d, expect_t, expect_dl, expect_n = [], [], [], [], []
    pos_rows, expect_pos = [], []
    for n, seed, mode in rows_spec:
        rng = np.random.RandomState(seed % (2**31))
        docids = base + np.cumsum(rng.randint(1, 9, size=n)).astype(np.int64)
        base = int(docids[-1]) + 1 if n else base
        tfs = rng.randint(1, 5, size=n).astype(np.int64)
        dls = rng.randint(5, 200, size=n).astype(np.int64)
        flat_pos = np.sort(
            rng.randint(0, 10_000, size=int(tfs.sum()))
        ).astype(np.int64)
        cell, meta = encode_cell(
            docids, tfs, dls=dls, block_size=block, codec=codec
        )
        pos_cell, pos_off = encode_positions(
            tfs, flat_pos, block_size=block, codec=codec
        )
        nb = len(meta["n"])
        if mode == 0 or nb == 0:
            blocks = None
        elif mode == 1:
            blocks = np.arange(0, nb, 2, dtype=np.int64)
        else:
            blocks = np.empty(0, dtype=np.int64)
        rows.append((cell, meta, blocks))
        d, t, dl = decode_cell(cell, meta, blocks=blocks, codec=codec)
        expect_d.append(d)
        expect_t.append(t)
        expect_dl.append(dl)
        expect_n.append(len(d))
        if len(t):
            sel = (
                blocks
                if blocks is not None
                else np.arange(nb, dtype=np.int64)
            )
            ns_sel = np.asarray(meta["n"], dtype=np.int64)[sel]
            pos_rows.append((pos_cell, pos_off, blocks, t, ns_sel))
            pos = decode_positions(
                pos_cell, pos_off, meta,
                {int(j): t_ for j, t_ in zip(
                    sel, np.split(t, np.cumsum(ns_sel))[:-1]
                )},
                codec=codec,
            )
            expect_pos.append(
                np.concatenate([pos[int(j)] for j in sel])
                if len(sel)
                else np.empty(0, dtype=np.int64)
            )
    got_d, got_t, got_dl, row_n = decode_cell_rows(rows, codec=codec)
    np.testing.assert_array_equal(got_d, np.concatenate(expect_d) if expect_d else [])
    np.testing.assert_array_equal(got_t, np.concatenate(expect_t) if expect_t else [])
    np.testing.assert_array_equal(got_dl, np.concatenate(expect_dl) if expect_dl else [])
    np.testing.assert_array_equal(row_n, np.asarray(expect_n, dtype=np.int64))
    got_pos = decode_positions_rows(pos_rows, codec=codec)
    np.testing.assert_array_equal(
        got_pos,
        np.concatenate(expect_pos) if expect_pos else np.empty(0, np.int64),
    )


def test_unpack_blocks_any_segment_order():
    """The byte-window gather path must pad against the MAX bit offset,
    not the last segment's — unsorted/descending block selections are
    legal (decode_cell's ``blocks`` accepts arbitrary order) and used to
    IndexError when the window path triggered (mixed widths, N >= 256)."""
    from montezuma_spark.codec.postings import pack_blocks, unpack_blocks

    rng = np.random.default_rng(7)
    vals, widths = [], []
    for w in (3, 11, 7, 1, 19):  # mixed widths -> window-gather strategy
        n = int(rng.integers(80, 160))
        vals.append(
            rng.integers(0, 1 << w, size=n, dtype=np.uint64) | np.uint64(1)
        )
        widths.append(int(vals[-1].max()).bit_length())
    ns = np.array([len(v) for v in vals], dtype=np.int64)
    bounds = np.concatenate([[0], np.cumsum(ns)])
    stream, seg_len = pack_blocks(
        np.concatenate(vals), bounds, np.array(widths, dtype=np.int64)
    )
    starts = np.cumsum(seg_len) - seg_len
    for order in (np.arange(5)[::-1], np.array([2, 4, 0, 3, 1])):
        got = unpack_blocks(stream, starts[order], ns[order])
        want = np.concatenate([vals[i] for i in order])
        np.testing.assert_array_equal(got, want)
