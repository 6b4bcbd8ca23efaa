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

``maxw`` = max over the block of the BM25 tf-normalization
``tf / (tf + k1*(1 - b + b*dl/avgdl))`` — multiply by ``idf * (k1+1)`` for a
per-(term, block) score upper bound.

The positions sidecar (.prx analog, src/index/document-writer.lisp:163-213)
is a parallel cell: per block, concatenated per-doc delta-encoded position
varints, with a per-block byte offset table.
"""

from __future__ import annotations

import numpy as np

from montezuma_spark.codec.varint import (
    decode_varints,
    encode_varints,
    grouped_delta_decode,
)

DEFAULT_BLOCK = 128
BM25_K1 = 1.2
BM25_B = 0.75

META_FIELDS = ("first", "last", "n", "off", "codes_len", "ext_len", "maxw")


def bm25_tf_norm(tfs: np.ndarray, dls: np.ndarray, avgdl: float,
                 k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    tfs = tfs.astype(np.float64)
    return tfs / (tfs + k1 * (1.0 - b + b * dls.astype(np.float64) / max(avgdl, 1e-9)))


def encode_cell(
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray | None = None,
    avgdl: float = 1.0,
    block_size: int = DEFAULT_BLOCK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> tuple[bytes, dict]:
    """Encode one posting list (sorted unique docids + parallel tfs).

    Returns (cell_bytes, meta) where meta maps META_FIELDS → python lists.
    ``dls`` (per-posting doc lengths) feed the block-max bound; if None the
    bound degrades to the tf-only bound with dl=avgdl.
    """
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = len(docids)
    meta = {f: [] for f in META_FIELDS}
    if n == 0:
        return b"", meta
    if dls is None:
        dls = np.full(n, int(round(avgdl)) or 1, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    norm = bm25_tf_norm(tfs, dls, avgdl, k1, b)
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
        code_bytes = encode_varints(codes)
        extra = t[t > 1].astype(np.uint64)
        extra_bytes = encode_varints(extra)
        dl_bytes = encode_varints(dls[s:e].astype(np.uint64))
        meta["first"].append(int(d[0]))
        meta["last"].append(int(d[-1]))
        meta["n"].append(int(e - s))
        meta["off"].append(off)
        meta["codes_len"].append(len(code_bytes))
        meta["ext_len"].append(len(extra_bytes))
        meta["maxw"].append(float(norm[s:e].max()))
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
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode selected blocks (default all) → (docids, tfs, dls)."""
    nblocks = len(meta["n"])
    if nblocks == 0:
        return _EMPTY3
    buf = np.frombuffer(cell, dtype=np.uint8)
    if blocks is None:
        blocks = range(nblocks)
    off = meta["off"]
    clen = meta["codes_len"]
    elen = meta["ext_len"]
    firsts, ns = [], []
    code_parts, extra_parts, dl_parts = [], [], []
    total = len(buf)
    for j in blocks:
        s = off[j]
        ce = s + clen[j]
        ee = ce + elen[j]
        be = off[j + 1] if j + 1 < nblocks else total
        code_parts.append(buf[s:ce])
        extra_parts.append(buf[ce:ee])
        dl_parts.append(buf[ee:be])
        firsts.append(meta["first"][j])
        ns.append(meta["n"][j])
    if not ns:
        return _EMPTY3
    codes = decode_varints(np.concatenate(code_parts))
    extras = decode_varints(np.concatenate(extra_parts)) if any(
        len(p) for p in extra_parts
    ) else np.empty(0, dtype=np.uint64)
    dls = decode_varints(np.concatenate(dl_parts)).astype(np.int64)
    ns_arr = np.asarray(ns, dtype=np.int64)
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
) -> tuple[bytes, list[int]]:
    """Encode concatenated per-doc position lists (lens given by tfs).

    Per doc: first position absolute, rest delta-encoded; docs grouped into
    the same blocks as the postings cell. Returns (bytes, per-block offsets).
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
    chunks: list[bytes] = []
    offsets: list[int] = []
    off = 0
    pos_bounds = np.concatenate([[0], np.cumsum(tfs)])
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        seg = deltas[pos_bounds[s] : pos_bounds[e]]
        bts = encode_varints(seg.astype(np.uint64))
        offsets.append(off)
        chunks.append(bts)
        off += len(bts)
    return b"".join(chunks), offsets


def decode_positions(
    pos_cell: bytes | memoryview,
    pos_off: list[int],
    meta: dict,
    block_tfs: dict[int, np.ndarray],
) -> dict[int, np.ndarray]:
    """Decode positions for the given blocks → {block: flat positions}.

    ``block_tfs`` maps block index → tf array (from decode_cell on the same
    blocks); the caller splits flat positions by cumsum(tf).
    """
    buf = np.frombuffer(pos_cell, dtype=np.uint8)
    total = len(buf)
    out: dict[int, np.ndarray] = {}
    nblocks = len(pos_off)
    for j, tfs in block_tfs.items():
        s = pos_off[j]
        e = pos_off[j + 1] if j + 1 < nblocks else total
        deltas = decode_varints(buf[s:e]).astype(np.int64)
        out[j] = grouped_delta_decode(deltas, np.asarray(tfs, dtype=np.int64))
    return out
