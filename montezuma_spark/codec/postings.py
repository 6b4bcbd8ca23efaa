"""Block-structured posting-list cells: docID-delta varints + block-max metadata.

One cell holds the postings of one (field, term) within one docid-range shard.
Layout (per block of ``block_size`` docs):

    [doc_code varints][extra-tf varints][dl varints]

The dl (doc length) stream makes a cell self-contained for BM25 scoring —
no doc-length join at query time. It duplicates dl across terms (~1 byte
per posting) in exchange for removing the only query-time co-partitioned
join; the doc_lens table remains the source of truth for stats/match-all.

``doc_code = (delta_docid << 1) | (tf == 1)`` — the reference's .frq wire
format (src/index/segment-merger.lisp:233-245, decode
src/index/term-doc-enum.lisp:90-94): tf is written only when > 1. Deltas are
block-local (first docid delta'd against the block's ``first`` metadata), so
any block decodes independently — that upgrades the reference's skip list
(every 16 docs, segment-merger.lisp:248-278) to random-access blocks with
**block-max** scoring metadata for WAND pruning:

    meta = {first[], last[], n[], off[], codes_len[], maxw[]}

``maxtf`` / ``mindl`` = per-block max term frequency and min doc length.
The BM25 block upper bound is computed AT QUERY TIME as
``maxtf / (maxtf + k1*(1 - b + b*mindl/avgdl))`` (monotone ↑ in tf, ↓ in dl,
so pairing the block's max tf with its min dl is a valid bound) times
``idf * (k1+1)``. Keeping the bound avgdl-free makes cells encodable
BEFORE corpus stats exist (partition-local segment build) and mergeable /
re-encodable without ever loosening WAND bounds.

The positions sidecar (.prx analog, src/index/document-writer.lisp:163-213)
is a parallel cell: per block, concatenated per-doc delta-encoded position
varints, with a per-block byte offset table.
"""

from __future__ import annotations

import numpy as np

from montezuma_spark.codec.varint import (
    decode_varints,
    encode_varints,
    encode_varints_arr,
    grouped_delta_decode,
)

DEFAULT_BLOCK = 128
BM25_K1 = 1.2
BM25_B = 0.75

# index-time per-doc boost marker cells (see builder.py): defined here so
# the query kernel (pyspark-free, imported by every worker) can recognize
# them without pulling the builder module into query workers.
BOOST_TERM = "\x00boost"
BOOST_FIELD = "\x00doc"
BOOST_SCALE = 1024

# reserved Index.stats key carrying CORPUS-level counts: "num_docs" (doc
# count, per-field semantics: stale until expunge) and "max_doc" (docid
# universe bound — stays at the original size after expunge, which keeps
# docids stable with holes). Per-field num_docs can undercount both when
# add_indexes merges indexes with disjoint field sets; consumers fall
# back to max-over-fields for layouts saved before this key existed.
CORPUS_STATS_KEY = "\x00corpus"


def corpus_num_docs(stats: dict) -> int:
    """Corpus doc count (pre-tombstone) from an Index.stats dict."""
    c = stats.get(CORPUS_STATS_KEY)
    if c and c.get("num_docs"):
        return int(c["num_docs"])
    return max(
        (
            int(s.get("num_docs", 0))
            for f, s in stats.items()
            if f != CORPUS_STATS_KEY
        ),
        default=0,
    )


def corpus_max_doc(stats: dict) -> int:
    """Docid universe size [0, max_doc) from an Index.stats dict."""
    c = stats.get(CORPUS_STATS_KEY)
    if c and c.get("max_doc"):
        return int(c["max_doc"])
    return corpus_num_docs(stats)

META_FIELDS = ("first", "last", "n", "off", "codes_len", "ext_len",
               "maxtf", "mindl", "imp_n", "imp_tf", "imp_dl")


def impact_front(tfs: np.ndarray, dls: np.ndarray):
    """Pareto front of one block's (tf, dl) pairs — competitive impacts
    (the Lucene-8 impacts idea): pair A dominates B iff tf_A >= tf_B and
    dl_A <= dl_B. The block score bound is then max over FRONT pairs of
    tf_norm(tf, dl) — tight, because every front pair is an actual
    posting, where the classic (maxtf, mindl) bound pairs the max tf of
    one doc with the min dl of another and can overestimate by enough to
    defeat pruning entirely on tie-heavy corpora. Valid for ANY similarity
    honoring the monotone tf_norm contract (similarity.py).

    Returns (front_tfs desc, front_dls asc-of-min), both np.int64."""
    order = np.lexsort((dls, -tfs))
    t = tfs[order]
    d = dls[order]
    keep = np.empty(len(t), dtype=bool)
    if len(t):
        m = np.minimum.accumulate(d)
        keep[0] = True
        keep[1:] = d[1:] < m[:-1]
    return t[keep], d[keep]


def bm25_tf_norm(tfs: np.ndarray, dls: np.ndarray, avgdl: float,
                 k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    tfs = tfs.astype(np.float64)
    return tfs / (tfs + k1 * (1.0 - b + b * dls.astype(np.float64) / max(avgdl, 1e-9)))


def block_upper_bounds(maxtf: np.ndarray, mindl: np.ndarray, avgdl: float,
                       k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    """Per-block BM25 tf-norm upper bounds from (maxtf, mindl) metadata."""
    return bm25_tf_norm(
        np.asarray(maxtf, dtype=np.int64),
        np.asarray(mindl, dtype=np.int64),
        avgdl, k1, b,
    )


# ---------------------------------------------------------------------------
# bit-packed block streams (the PForDelta-class codec; selectable per index
# via IndexConfig.block_codec). Layout per stream segment:
#   [width: 1 byte][ceil(n·width/8) packed bytes, little-endian bit order]
# width = max bit length in the block (frame-of-reference binary packing —
# the PFOR family without exception patching; docid deltas are block-local
# so one oversized delta can only be the block's first gap).
# ---------------------------------------------------------------------------

def pack_width(vals: np.ndarray) -> int:
    """Bits needed for the largest value (0 for an all-zero/empty block)."""
    if len(vals) == 0:
        return 0
    mx = int(vals.max())
    return mx.bit_length()


def pack_values(vals: np.ndarray, width: int) -> np.ndarray:
    """uint64 values → packed uint8 stream at ``width`` bits/value."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    n = len(v)
    if n == 0 or width == 0:
        return np.empty(0, dtype=np.uint8)
    bits = np.empty((n, width), dtype=np.uint8)
    for j in range(width):
        bits[:, j] = (v >> np.uint64(j)) & np.uint64(1)
    return np.packbits(bits.ravel(), bitorder="little")


def unpack_values(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    """Packed uint8 stream → n uint64 values at ``width`` bits/value."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(
        np.ascontiguousarray(buf, dtype=np.uint8),
        count=n * width, bitorder="little",
    ).reshape(n, width)
    out = np.zeros(n, dtype=np.uint64)
    for j in range(width):
        out |= bits[:, j].astype(np.uint64) << np.uint64(j)
    return out


def _packed_segment(vals: np.ndarray) -> bytes:
    w = pack_width(vals)
    return bytes([w]) + pack_values(vals, w).tobytes()


def _block_widths(flat: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Per-block max bit length (0 for empty blocks) — exact integer math,
    no float log2 (wrong near 2^53+)."""
    B = len(bounds) - 1
    widths = np.zeros(B, dtype=np.int64)
    if len(flat) == 0:
        return widths
    nonempty = np.flatnonzero(np.diff(bounds) > 0)
    mx = np.zeros(B, dtype=np.uint64)
    mx[nonempty] = np.maximum.reduceat(
        np.ascontiguousarray(flat, dtype=np.uint64), bounds[nonempty]
    )
    for j in range(64):
        widths = np.where(mx >> np.uint64(j) > 0, j + 1, widths)
    return widths


def pack_blocks(
    flat: np.ndarray, bounds: np.ndarray, widths: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized packing of B variable-width segments: values of block i
    are ``flat[bounds[i]:bounds[i+1]]`` at ``widths[i]`` bits each,
    byte-padded per block, prefixed with the 1-byte width. Returns
    (uint8 stream, per-block byte lengths incl. the width byte) —
    byte-identical per block to ``_packed_segment``. O(max_width) numpy
    passes over all values; no per-block Python work."""
    bounds = np.ascontiguousarray(bounds, dtype=np.int64)
    widths = np.ascontiguousarray(widths, dtype=np.int64)
    B = len(widths)
    n_i = np.diff(bounds)
    payload = (n_i * widths + 7) // 8
    seg_len = payload + 1
    out = np.zeros(int(seg_len.sum()), dtype=np.uint8)
    seg_starts = np.cumsum(seg_len) - seg_len
    out[seg_starts] = widths.astype(np.uint8)
    total_pay = int(payload.sum())
    if total_pay:
        bits = np.zeros(total_pay * 8, dtype=np.uint8)
        pay_bit_starts = (np.cumsum(payload) - payload) * 8
        v = np.ascontiguousarray(flat, dtype=np.uint64)
        wrep = np.repeat(widths, n_i)
        base = (
            np.repeat(pay_bit_starts, n_i)
            + (np.arange(len(v)) - np.repeat(bounds[:-1], n_i)) * wrep
        )
        for j in range(int(widths.max()) if B else 0):
            m = wrep > j
            bits[base[m] + j] = (
                (v[m] >> np.uint64(j)) & np.uint64(1)
            ).astype(np.uint8)
        packed = np.packbits(bits, bitorder="little")
        pay_byte_starts = np.cumsum(payload) - payload
        idx = np.repeat(seg_starts + 1, payload) + (
            np.arange(total_pay) - np.repeat(pay_byte_starts, payload)
        )
        out[idx] = packed
    return out, seg_len


def _unpack_segment(buf: np.ndarray, n: int) -> np.ndarray:
    w = int(buf[0])
    return unpack_values(buf[1:], n, w)


def _gather_segments(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Concatenate byte segments at (starts, lens) with one fancy-index
    gather — no per-segment python slicing."""
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint8)
    idx = np.repeat(np.ascontiguousarray(starts, dtype=np.int64), lens) + (
        np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    )
    return buf[idx]


_PAD8 = np.zeros(8, dtype=np.uint8)


def _select_segments(
    buf: np.ndarray, off: np.ndarray, ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compact ``buf`` to just the [off, end) segments →
    (new_buf, new_off, new_ends). Only compacts when the selection is
    actually narrow (< half the buffer) — a wide selection is cheaper to
    leave in place than to re-gather byte-by-byte (index math costs ~8×
    the memcpy per byte). Few segments go through slice-concat (memcpy
    speed); many through the fancy gather."""
    seg_len = ends - off
    if int(seg_len.sum()) * 2 >= len(buf):
        return buf, off, ends
    if len(off) <= 64:
        new = np.concatenate(
            [buf[a:b] for a, b in zip(off.tolist(), ends.tolist())]
            or [np.empty(0, dtype=np.uint8)]
        )
    else:
        new = _gather_segments(buf, off, seg_len)
    new_off = np.cumsum(seg_len) - seg_len
    return new, new_off, new_off + seg_len


def unpack_blocks(
    stream: np.ndarray, seg_starts: np.ndarray, n_i: np.ndarray
) -> np.ndarray:
    """Vectorized inverse of ``pack_blocks``: decode B width-prefixed
    segments living at ``seg_starts`` byte offsets inside ``stream``
    (``n_i`` values each) into one flat uint64 array, concatenated in
    segment order. O(max_width) numpy passes over all values total —
    replaces the per-block ``_unpack_segment`` python loop that made the
    packed codec 2-7x slower than varint on the serving path (round-2
    verdict item #1).

    Three strategies by batch shape (value-identical; the codec property
    tests pin them against each other):
    - byte-window gather (the serving default for multi-cell batches,
      widths ≤ 56): read each value's 8-byte window straight out of
      ``stream`` via one (N, 8) fancy gather on a sliding view, view as
      little-endian uint64, shift by the in-byte bit offset and mask —
      ~2.5x the per-bit loop at mixed widths, and no payload gather at
      all.
    - dense reshape + shift-sum for small uniform-width batches
      (beats the window gather below ~64k values when every segment
      shares one width with no intra-stream padding).
    - O(max_width) masked bit loop as the general fallback (tiny
      batches, widths > 56)."""
    seg_starts = np.ascontiguousarray(seg_starts, dtype=np.int64)
    n_i = np.ascontiguousarray(n_i, dtype=np.int64)
    N = int(n_i.sum())
    if N == 0:
        return np.empty(0, dtype=np.uint64)
    widths = stream[seg_starts].astype(np.int64)
    payload = (n_i * widths + 7) // 8
    total_pay = int(payload.sum())
    out = np.zeros(N, dtype=np.uint64)
    if total_pay == 0:
        return out  # every segment width 0 → all zeros
    w0 = int(widths[0])
    uniform_dense = (
        w0 > 0
        and bool((widths == w0).all())
        and (len(n_i) == 1 or not (((n_i[:-1] * w0) % 8).any()))
    )
    wmax = int(widths.max())
    if wmax <= 56 and (
        (N >= 256 and not uniform_dense) or (N >= 65536 and uniform_dense)
    ):
        wrep = np.repeat(widths, n_i)
        val_starts = np.cumsum(n_i) - n_i
        # absolute bit offset of each value inside ``stream`` (payload
        # begins one width byte after each segment start)
        base = np.repeat((seg_starts + 1) * 8, n_i) + (
            np.arange(N) - np.repeat(val_starts, n_i)
        ) * wrep
        # pad bound from the per-SEGMENT last-value offsets (O(B), and
        # order-independent — selections may come in any block order);
        # batched callers pre-pad their streams so this copy is rare
        max_bit = int(((seg_starts + 1) * 8 + (n_i - 1) * widths).max())
        if len(stream) < (max_bit >> 3) + 9:
            stream = np.concatenate([stream, _PAD8])
        win = np.lib.stride_tricks.sliding_window_view(stream, 8)
        words = np.ascontiguousarray(win[base >> 3]).view(np.uint64).ravel()
        return (words >> (base & 7).astype(np.uint64)) & (
            (np.uint64(1) << wrep.astype(np.uint64)) - np.uint64(1)
        )
    pay_out_starts = np.cumsum(payload) - payload
    if len(seg_starts) == 1:
        pay = stream[seg_starts[0] + 1 : seg_starts[0] + 1 + total_pay]
    else:
        idx = np.repeat(seg_starts + 1, payload) + (
            np.arange(total_pay) - np.repeat(pay_out_starts, payload)
        )
        pay = stream[idx]
    bits = np.unpackbits(
        np.ascontiguousarray(pay, dtype=np.uint8), bitorder="little"
    )
    if uniform_dense:
        # all segments share one width and pack without intra-stream padding
        # gaps → the whole bit stream is a dense (N, w) matrix: decode with
        # one shift-and-sum instead of an O(width) masked loop
        mat = bits[: N * w0].reshape(N, w0).astype(np.uint64)
        return mat @ (np.uint64(1) << np.arange(w0, dtype=np.uint64))
    wrep = np.repeat(widths, n_i)
    val_starts = np.cumsum(n_i) - n_i
    base = np.repeat(pay_out_starts * 8, n_i) + (
        np.arange(N) - np.repeat(val_starts, n_i)
    ) * wrep
    # mixed widths: unmasked passes up to the common minimum width, then
    # masked passes for the few segments that are wider
    wmin = int(widths.min())
    for j in range(wmin):
        out |= (bits[base + j]).astype(np.uint64) << np.uint64(j)
    for j in range(wmin, wmax):
        m = wrep > j
        out[m] |= (bits[base[m] + j]).astype(np.uint64) << np.uint64(j)
    return out


def encode_cell(
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray | None = None,
    block_size: int = DEFAULT_BLOCK,
    codec: str = "varint",
) -> tuple[bytes, dict]:
    """Encode one posting list (sorted unique docids + parallel tfs).

    Returns (cell_bytes, meta) where meta maps META_FIELDS → python lists.
    ``dls`` (per-posting doc lengths) feed the in-cell dl stream and the
    block-max metadata; if None, dl=1 is stored. ``codec`` picks the block
    stream encoding: "varint" (LEB128, the reference's wire idea) or
    "packed" (frame-of-reference bit packing, PForDelta-class).
    """
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = len(docids)
    meta = {f: [] for f in META_FIELDS}
    if n == 0:
        return b"", meta
    if dls is None:
        dls = np.ones(n, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    enc = encode_varints if codec == "varint" else _packed_segment
    chunks: list[bytes] = []
    off = 0
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        d = docids[s:e]
        t = tfs[s:e]
        deltas = np.empty(e - s, dtype=np.uint64)
        deltas[0] = 0  # first docid delta'd against meta first
        deltas[1:] = (d[1:] - d[:-1]).astype(np.uint64)
        codes = (deltas << np.uint64(1)) | (t == 1).astype(np.uint64)
        code_bytes = enc(codes)
        extra = t[t > 1].astype(np.uint64)
        extra_bytes = enc(extra)
        dl_bytes = enc(dls[s:e].astype(np.uint64))
        meta["first"].append(int(d[0]))
        meta["last"].append(int(d[-1]))
        meta["n"].append(int(e - s))
        meta["off"].append(off)
        meta["codes_len"].append(len(code_bytes))
        meta["ext_len"].append(len(extra_bytes))
        meta["maxtf"].append(int(t.max()))
        meta["mindl"].append(int(dls[s:e].min()))
        ftf, fdl = impact_front(t, dls[s:e])
        meta["imp_n"].append(len(ftf))
        meta["imp_tf"].extend(int(x) for x in ftf)
        meta["imp_dl"].extend(int(x) for x in fdl)
        chunks.append(code_bytes)
        chunks.append(extra_bytes)
        chunks.append(dl_bytes)
        off += len(code_bytes) + len(extra_bytes) + len(dl_bytes)
    return b"".join(chunks), meta


_EMPTY3 = (
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
)


def decode_cell(
    cell: bytes | memoryview,
    meta: dict,
    blocks: np.ndarray | list | None = None,
    codec: str = "varint",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode selected blocks (default all) → (docids, tfs, dls)."""
    nblocks = len(meta["n"])
    if nblocks == 0:
        return _EMPTY3
    buf = np.frombuffer(cell, dtype=np.uint8)
    if blocks is None:
        blocks = range(nblocks)
    blks = np.asarray(list(blocks), dtype=np.int64)
    if len(blks) == 0:
        return _EMPTY3
    off = np.asarray(meta["off"], dtype=np.int64)
    clen = np.asarray(meta["codes_len"], dtype=np.int64)
    elen = np.asarray(meta["ext_len"], dtype=np.int64)
    ns_arr = np.asarray(meta["n"], dtype=np.int64)[blks]
    firsts = np.asarray(meta["first"], dtype=np.int64)[blks]
    if codec == "packed":
        # width-prefixed fixed-width segments; counts come from block
        # metadata (extras count = codes with the tf>1 low bit cleared).
        # One vectorized unpack_blocks pass per stream — never per block.
        codes = unpack_blocks(buf, off[blks], ns_arr)
        vb = np.cumsum(ns_arr) - ns_arr
        n_extra = np.add.reduceat(
            ((codes & np.uint64(1)) == 0).astype(np.int64), vb
        )
        extras = unpack_blocks(buf, off[blks] + clen[blks], n_extra)
        dls = unpack_blocks(
            buf, off[blks] + clen[blks] + elen[blks], ns_arr
        ).astype(np.int64)
    else:
        total = len(buf)
        ends = np.append(off[1:], total)
        code_parts = [buf[off[j] : off[j] + clen[j]] for j in blks]
        extra_parts = [
            buf[off[j] + clen[j] : off[j] + clen[j] + elen[j]] for j in blks
        ]
        dl_parts = [buf[off[j] + clen[j] + elen[j] : ends[j]] for j in blks]
        codes = decode_varints(np.concatenate(code_parts))
        extras = decode_varints(np.concatenate(extra_parts)) if any(
            len(p) for p in extra_parts
        ) else np.empty(0, dtype=np.uint64)
        dls = decode_varints(np.concatenate(dl_parts)).astype(np.int64)
    deltas = (codes >> np.uint64(1)).astype(np.int64)
    docids = grouped_delta_decode(deltas, ns_arr) + np.repeat(
        np.asarray(firsts, dtype=np.int64), ns_arr
    )
    tfs = np.ones(len(codes), dtype=np.int64)
    multi = (codes & np.uint64(1)) == 0
    tfs[multi] = extras.astype(np.int64)
    return docids, tfs, dls


# ---------------------------------------------------------------------------
# positions sidecar
# ---------------------------------------------------------------------------

def encode_positions(
    tfs: np.ndarray,
    flat_positions: np.ndarray,
    block_size: int = DEFAULT_BLOCK,
    codec: str = "varint",
) -> tuple[bytes, list[int]]:
    """Encode concatenated per-doc position lists (lens given by tfs).

    Per doc: first position absolute, rest delta-encoded; docs grouped into
    the same blocks as the postings cell. Returns (bytes, per-block
    offsets). Same two codecs as the postings streams.
    """
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    pos = np.ascontiguousarray(flat_positions, dtype=np.int64)
    n = len(tfs)
    deltas = pos.copy()
    if len(pos):
        deltas[1:] = pos[1:] - pos[:-1]
        starts = np.cumsum(tfs)[:-1]  # first-position index of docs 1..
        deltas[starts] = pos[starts]
        deltas[0] = pos[0]
    enc = encode_varints if codec == "varint" else _packed_segment
    chunks: list[bytes] = []
    offsets: list[int] = []
    off = 0
    pos_bounds = np.concatenate([[0], np.cumsum(tfs)])
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        seg = deltas[pos_bounds[s] : pos_bounds[e]]
        bts = enc(seg.astype(np.uint64))
        offsets.append(off)
        chunks.append(bts)
        off += len(bts)
    return b"".join(chunks), offsets


def decode_positions(
    pos_cell: bytes | memoryview,
    pos_off: list[int],
    meta: dict,
    block_tfs: dict[int, np.ndarray],
    codec: str = "varint",
) -> dict[int, np.ndarray]:
    """Decode positions for the given blocks → {block: flat positions}.

    ``block_tfs`` maps block index → tf array (from decode_cell on the same
    blocks); the caller splits flat positions by cumsum(tf).
    """
    buf = np.frombuffer(pos_cell, dtype=np.uint8)
    total = len(buf)
    out: dict[int, np.ndarray] = {}
    nblocks = len(pos_off)
    if len(block_tfs) > 1:
        # one vectorized pass across all requested blocks: unpack/gather the
        # selected byte segments, ONE grouped delta decode over the whole
        # stream (cumsum restarts at every doc boundary regardless of which
        # block the doc lives in), then hand back per-block views. The
        # per-block grouped_delta_decode loop this replaces was ~22 numpy
        # round-trips per cell on 128-block hot terms.
        js = sorted(block_tfs)
        tf_parts = [
            np.ascontiguousarray(block_tfs[j], dtype=np.int64) for j in js
        ]
        starts = np.asarray([pos_off[j] for j in js], dtype=np.int64)
        counts = np.asarray(
            [int(t.sum()) for t in tf_parts], dtype=np.int64
        )
        if codec == "packed":
            flat = unpack_blocks(buf, starts, counts).astype(np.int64)
        else:
            ends = np.asarray(
                [
                    pos_off[j + 1] if j + 1 < nblocks else total
                    for j in js
                ],
                dtype=np.int64,
            )
            flat = decode_varints(
                _gather_segments(buf, starts, ends - starts)
            ).astype(np.int64)
        dec = grouped_delta_decode(flat, np.concatenate(tf_parts))
        bounds = np.cumsum(counts)
        for i, j in enumerate(js):
            out[j] = dec[bounds[i] - counts[i] : bounds[i]]
        return out
    for j, tfs in block_tfs.items():
        s = pos_off[j]
        e = pos_off[j + 1] if j + 1 < nblocks else total
        tfs_arr = np.asarray(tfs, dtype=np.int64)
        if codec == "packed":
            deltas = _unpack_segment(
                buf[s:e], int(tfs_arr.sum())
            ).astype(np.int64)
        else:
            deltas = decode_varints(buf[s:e]).astype(np.int64)
        out[j] = grouped_delta_decode(deltas, tfs_arr)
    return out


# ---------------------------------------------------------------------------
# batched reader: many cells in one vectorized pass per stream
# ---------------------------------------------------------------------------

_EMPTY_I64 = np.empty(0, dtype=np.int64)


def decode_cell_rows(
    rows: list, codec: str = "varint"
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batched ``decode_cell`` across many cells: value-identical to
    concatenating per-row ``decode_cell(cell, meta, blocks)`` results in
    list order, but with ONE vectorized pass per stream over the whole
    batch. The read-path sibling of ``encode_cells_batch``: a hot web
    term is split across ~hundreds of docid-range shard cells, and the
    per-cell python overhead (numpy dispatch on tiny arrays, ~8 calls per
    stream per cell) dominated the serving decode long before memory
    bandwidth did.

    ``rows``: list of (cell_bytes, meta, blocks) — meta as in
    ``decode_cell`` (array-likes fine), blocks None = all blocks.

    Returns (docids, tfs, dls, row_n) with row_n[i] = postings decoded
    for row i (zero for rows whose block selection was empty) — callers
    split the flat streams with cumsum(row_n).
    """
    R = len(rows)
    row_n = np.zeros(R, dtype=np.int64)
    bufs: list[np.ndarray] = []
    starts_l, clen_l, elen_l, dlen_l, ns_l, firsts_l = [], [], [], [], [], []
    base = 0
    for i, (cell, meta, blocks) in enumerate(rows):
        off = np.asarray(meta["off"], dtype=np.int64)
        if len(off) == 0:
            continue
        buf = np.frombuffer(cell, dtype=np.uint8)
        clen = np.asarray(meta["codes_len"], dtype=np.int64)
        elen = np.asarray(meta["ext_len"], dtype=np.int64)
        ns = np.asarray(meta["n"], dtype=np.int64)
        firsts = np.asarray(meta["first"], dtype=np.int64)
        ends = np.append(off[1:], len(buf))
        if blocks is not None:
            blks = np.asarray(blocks, dtype=np.int64)
            if len(blks) == 0:
                continue
            off, clen, elen, ns, firsts, ends = (
                off[blks], clen[blks], elen[blks], ns[blks],
                firsts[blks], ends[blks],
            )
            # compact to ONLY the selected blocks' byte ranges ([off, end)
            # holds all three streams of a block contiguously) when the
            # selection is narrow: a candidate-narrowed decode of a huge
            # term must not memcpy the whole cell payload for a few blocks
            buf, off, ends = _select_segments(buf, off, ends)
        bufs.append(buf)
        starts_l.append(off + base)
        clen_l.append(clen)
        elen_l.append(elen)
        dlen_l.append(ends - off - clen - elen)
        ns_l.append(ns)
        firsts_l.append(firsts)
        row_n[i] = int(ns.sum())
        base += len(buf)
    if not bufs:
        return _EMPTY_I64, _EMPTY_I64, _EMPTY_I64, row_n
    # 8-byte zero tail: the packed byte-window decoder reads one 8-byte
    # window per value; pre-padding here keeps it from re-copying the
    # whole batched stream once per stream decode
    bufs.append(_PAD8)
    big = np.concatenate(bufs)
    starts = np.concatenate(starts_l)
    clen = np.concatenate(clen_l)
    elen = np.concatenate(elen_l)
    ns = np.concatenate(ns_l)
    firsts = np.concatenate(firsts_l)
    if codec == "packed":
        codes = unpack_blocks(big, starts, ns)
        vb = np.cumsum(ns) - ns
        n_extra = np.add.reduceat(
            ((codes & np.uint64(1)) == 0).astype(np.int64), vb
        )
        extras = unpack_blocks(big, starts + clen, n_extra)
        dls = unpack_blocks(big, starts + clen + elen, ns).astype(np.int64)
    else:
        dlen = np.concatenate(dlen_l)
        codes = decode_varints(_gather_segments(big, starts, clen))
        ext_bytes = _gather_segments(big, starts + clen, elen)
        extras = (
            decode_varints(ext_bytes)
            if len(ext_bytes)
            else np.empty(0, dtype=np.uint64)
        )
        dls = decode_varints(
            _gather_segments(big, starts + clen + elen, dlen)
        ).astype(np.int64)
    deltas = (codes >> np.uint64(1)).astype(np.int64)
    docids = grouped_delta_decode(deltas, ns) + np.repeat(firsts, ns)
    tfs = np.ones(len(codes), dtype=np.int64)
    multi = (codes & np.uint64(1)) == 0
    tfs[multi] = extras.astype(np.int64)
    return docids, tfs, dls, row_n


def decode_positions_rows(rows: list, codec: str = "varint") -> np.ndarray:
    """Batched positions decode across many cells → ONE flat position
    stream aligned with the concatenation of each row's tf runs.
    Value-identical to per-row ``decode_positions`` + per-block
    concatenation in (row, block, doc) order.

    ``rows``: list of (pos_cell, pos_off, blocks, tfs_flat, ns) — blocks
    None = all blocks; ``tfs_flat`` = the row's decoded tf stream for
    exactly those blocks (from ``decode_cell_rows`` on the same
    selection), whose per-doc runs delimit the delta groups; ``ns`` =
    the per-SELECTED-block posting counts (meta n at the same selection),
    so per-block position counts fall out of one reduceat.
    """
    bufs: list[np.ndarray] = []
    starts_l, lens_l, cnt_l, tf_l = [], [], [], []
    base = 0
    for (cell, pos_off, blocks, tfs_flat, ns) in rows:
        po = np.asarray(pos_off, dtype=np.int64)
        tfs_flat = np.ascontiguousarray(tfs_flat, dtype=np.int64)
        if len(po) == 0 or len(tfs_flat) == 0:
            continue
        buf = np.frombuffer(cell, dtype=np.uint8)
        ends = np.append(po[1:], len(buf))
        ns_arr = np.asarray(ns, dtype=np.int64)
        vb = np.cumsum(ns_arr) - ns_arr
        cnts = np.add.reduceat(tfs_flat, vb)
        if blocks is not None:
            blks = np.asarray(blocks, dtype=np.int64)
            po, ends = po[blks], ends[blks]
            # compact narrow selections — never memcpy the whole positions
            # sidecar (the largest stream) for a few selected blocks
            buf, po, ends = _select_segments(buf, po, ends)
        bufs.append(buf)
        starts_l.append(po + base)
        lens_l.append(ends - po)
        cnt_l.append(cnts)
        tf_l.append(tfs_flat)
        base += len(buf)
    if not bufs:
        return _EMPTY_I64
    bufs.append(_PAD8)  # see decode_cell_rows — pre-pad for the window decoder
    big = np.concatenate(bufs)
    starts = np.concatenate(starts_l)
    cnts = np.concatenate(cnt_l)
    if codec == "packed":
        deltas = unpack_blocks(big, starts, cnts).astype(np.int64)
    else:
        lens = np.concatenate(lens_l)
        deltas = decode_varints(_gather_segments(big, starts, lens)).astype(
            np.int64
        )
    return grouped_delta_decode(deltas, np.concatenate(tf_l))


# ---------------------------------------------------------------------------
# batched encoder: many posting lists in one vectorized pass
# ---------------------------------------------------------------------------

def encode_cells_batch(
    group_bounds: np.ndarray,
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = DEFAULT_BLOCK,
    flat_positions: np.ndarray | None = None,
    codec: str = "varint",
) -> dict:
    """Encode G posting lists at once (inputs sorted by (group, docid),
    ``group_bounds`` = G+1 boundary indices). Byte-identical per cell to
    ``encode_cell`` / ``encode_positions`` but with ~O(1) numpy passes over
    the whole batch instead of per-term python — the difference between a
    web-scale vocabulary (Heaps' law: most terms are rare, most cells tiny)
    costing per-TERM overhead vs per-TOKEN throughput.

    Returns a columnar dict:
      postings: list[bytes], df/cf: int64 arrays,
      first/last/n/off/codes_len/ext_len/maxtf/mindl: list[np.ndarray],
      positions: list[bytes], pos_off: list[np.ndarray]  (empty if no
      ``flat_positions``).
    """
    gb = np.ascontiguousarray(group_bounds, dtype=np.int64)
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    G = len(gb) - 1
    N = len(docids)
    empty_meta = [np.empty(0, dtype=np.int64)] * 0
    out = {
        "postings": [], "positions": [], "pos_off": [],
        "df": np.diff(gb), "cf": np.add.reduceat(tfs, gb[:-1]) if N else
        np.zeros(G, dtype=np.int64),
        "first": [], "last": [], "n": [], "off": [],
        "codes_len": [], "ext_len": [], "maxtf": [], "mindl": [],
        "imp_n": [], "imp_tf": [], "imp_dl": [],
    }
    if N == 0:
        return out
    bs = block_size
    glens = np.diff(gb)
    nblk = -(-glens // bs)  # ceil
    total_blocks = int(nblk.sum())
    grp_of_blk = np.repeat(np.arange(G), nblk)
    blk_local = np.arange(total_blocks) - np.repeat(
        np.cumsum(nblk) - nblk, nblk
    )
    blk_start = gb[:-1][grp_of_blk] + blk_local * bs
    blk_end = np.minimum(blk_start + bs, gb[1:][grp_of_blk])
    blk_n = blk_end - blk_start

    deltas = np.empty(N, dtype=np.int64)
    deltas[0] = 0
    deltas[1:] = docids[1:] - docids[:-1]
    deltas[blk_start] = 0  # block-local deltas; first docid in metadata
    codes = (deltas.astype(np.uint64) << np.uint64(1)) | (
        tfs == 1
    ).astype(np.uint64)
    ext_mask = tfs > 1

    if codec == "packed":
        blk_bounds = np.append(blk_start, N)
        ext_vals = tfs[ext_mask].astype(np.uint64)
        ext_counts = np.add.reduceat(
            ext_mask.astype(np.int64), blk_start
        )
        ext_bounds = np.concatenate([[0], np.cumsum(ext_counts)])
        code_stream, blk_code_len = pack_blocks(
            codes, blk_bounds, _block_widths(codes, blk_bounds)
        )
        ext_stream, blk_ext_len = pack_blocks(
            ext_vals, ext_bounds, _block_widths(ext_vals, ext_bounds)
        )
        dl_u = dls.astype(np.uint64)
        dl_stream, blk_dl_len = pack_blocks(
            dl_u, blk_bounds, _block_widths(dl_u, blk_bounds)
        )
    else:
        code_stream, code_vlens = encode_varints_arr(codes)
        ext_stream, ext_vlens_packed = encode_varints_arr(
            tfs[ext_mask].astype(np.uint64)
        )
        dl_stream, dl_vlens = encode_varints_arr(dls.astype(np.uint64))
        ext_vlens = np.zeros(N, dtype=np.int64)
        ext_vlens[ext_mask] = ext_vlens_packed

        blk_code_len = np.add.reduceat(code_vlens, blk_start)
        blk_ext_len = np.add.reduceat(ext_vlens, blk_start)
        blk_dl_len = np.add.reduceat(dl_vlens, blk_start)
    blk_first = docids[blk_start]
    blk_last = docids[blk_end - 1]
    blk_maxtf = np.maximum.reduceat(tfs, blk_start)
    blk_mindl = np.minimum.reduceat(dls, blk_start)

    # competitive-impact fronts, ONE vectorized pass over all blocks (the
    # scalar impact_front per (block, sort, walk) — see impact_front):
    # sort (block, tf desc, dl asc); a segmented strict running-min of dl
    # marks the front. Segments reset for free via the descending-offset
    # trick: later blocks get strictly smaller offsets, so every value of
    # a new block undercuts the previous blocks' running min.
    blk_of = np.repeat(np.arange(total_blocks), blk_n)
    ord2 = np.lexsort((dls, -tfs, blk_of))
    big_off = np.int64(int(dls.max()) + 1)
    v = dls[ord2] + (total_blocks - blk_of[ord2]) * big_off
    m = np.minimum.accumulate(v)
    keep = np.empty(N, dtype=bool)
    keep[0] = True
    keep[1:] = v[1:] < m[:-1]
    imp_tf_flat = tfs[ord2][keep]
    imp_dl_flat = dls[ord2][keep]
    blk_vb = np.cumsum(blk_n) - blk_n  # block starts in ord2 order
    blk_imp_n = np.add.reduceat(keep.astype(np.int64), blk_vb)
    imp_cuts = np.concatenate([[0], np.cumsum(blk_imp_n)])

    cs = np.concatenate([[0], np.cumsum(blk_code_len)])
    # ext stream offsets per block: cumsum over packed ext lens at block grain
    es = np.concatenate([[0], np.cumsum(blk_ext_len)])
    ds = np.concatenate([[0], np.cumsum(blk_dl_len)])
    # assemble interleaved per-block [codes][extras][dls] layout
    segs = []
    for j in range(total_blocks):
        segs.append(code_stream[cs[j] : cs[j + 1]])
        segs.append(ext_stream[es[j] : es[j + 1]])
        segs.append(dl_stream[ds[j] : ds[j + 1]])
    big = np.concatenate(segs) if segs else np.empty(0, dtype=np.uint8)
    blk_total = blk_code_len + blk_ext_len + blk_dl_len
    blk_byte = np.concatenate([[0], np.cumsum(blk_total)])
    gb_blk = np.concatenate([[0], np.cumsum(nblk)])

    # positions sidecar (contiguous per block in posting order — no
    # interleaving, so per-cell bytes are a single slice)
    with_pos = flat_positions is not None
    if with_pos:
        pos = np.ascontiguousarray(flat_positions, dtype=np.int64)
        pb = np.concatenate([[0], np.cumsum(tfs)])  # per-posting bounds
        pdeltas = pos.copy()
        if len(pos):
            pdeltas[1:] = pos[1:] - pos[:-1]
            starts = pb[:-1]
            pdeltas[starts[starts < len(pos)]] = pos[
                starts[starts < len(pos)]
            ]
        if codec == "packed":
            pu = pdeltas.astype(np.uint64)
            # per-block value bounds: positions of block j are
            # pb[blk_start[j]] .. pb[blk_end[j]] in the flat stream
            blk_val_bounds = pb[np.append(blk_start, N)]
            pos_arr, blk_pos_len = pack_blocks(
                pu, blk_val_bounds, _block_widths(pu, blk_val_bounds)
            )
        else:
            pos_stream, pos_vlens = encode_varints_arr(
                pdeltas.astype(np.uint64)
            )
            # byte length of each posting's position run, summed per block
            post_pos_len = np.add.reduceat(pos_vlens, pb[:-1]) if len(pos) \
                else np.zeros(N, dtype=np.int64)
            if len(pos):
                # reduceat with duplicate starts can't occur (tf >= 1)
                blk_pos_len = np.add.reduceat(post_pos_len, blk_start)
            else:
                blk_pos_len = np.zeros(total_blocks, dtype=np.int64)
            pos_arr = pos_stream
        ps = np.concatenate([[0], np.cumsum(blk_pos_len)])

    for g in range(G):
        b0, b1 = gb_blk[g], gb_blk[g + 1]
        out["postings"].append(
            big[blk_byte[b0] : blk_byte[b1]].tobytes()
        )
        out["first"].append(blk_first[b0:b1])
        out["last"].append(blk_last[b0:b1])
        out["n"].append(blk_n[b0:b1])
        out["off"].append(blk_byte[b0:b1] - blk_byte[b0])
        out["codes_len"].append(blk_code_len[b0:b1])
        out["ext_len"].append(blk_ext_len[b0:b1])
        out["maxtf"].append(blk_maxtf[b0:b1])
        out["mindl"].append(blk_mindl[b0:b1])
        out["imp_n"].append(blk_imp_n[b0:b1])
        out["imp_tf"].append(imp_tf_flat[imp_cuts[b0] : imp_cuts[b1]])
        out["imp_dl"].append(imp_dl_flat[imp_cuts[b0] : imp_cuts[b1]])
        if with_pos:
            out["positions"].append(
                pos_arr[ps[b0] : ps[b1]].tobytes()
            )
            out["pos_off"].append(ps[b0:b1] - ps[b0])
        else:
            out["positions"].append(b"")
            out["pos_off"].append(np.empty(0, dtype=np.int64))
    return out
