"""Vectorized LEB128 varint codec (numpy), no per-value Python loops.

Wire format parity with the reference (src/store/index-io.lisp:29-41,69-79):
little-endian base-128, low 7 bits per byte, high bit = continuation.

Both encode and decode run O(max_varint_len) numpy passes over the whole
buffer — i.e. ~1-10 vector ops regardless of element count — which is the
Arrow-friendly replacement for the reference's byte-at-a-time stream reader
(src/index/term-doc-enum.lisp:85-98).
"""

from __future__ import annotations

import numpy as np

_U7 = np.uint64(7)
_U0x7F = np.uint64(0x7F)


def encode_varints_arr(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a uint64 array as a varint stream; returns
    (uint8 stream array, per-value byte counts) for batched cell layout."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nbytes += tmp > 0
        tmp = tmp >> _U7
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        idx = starts[mask] + j
        byte = (v[mask] >> np.uint64(7 * j)) & _U0x7F
        cont = (nbytes[mask] - 1) > j
        out[idx] = byte.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out, nbytes


def encode_varints(values: np.ndarray) -> bytes:
    """Encode a uint64 array as a concatenated varint stream."""
    return encode_varints_arr(values)[0].tobytes()


def decode_varints(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a concatenated varint stream → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    n = len(ends)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        byte = b[starts[mask] + j].astype(np.uint64)
        vals[mask] |= (byte & _U0x7F) << np.uint64(7 * j)
    return vals


def delta_encode(sorted_vals: np.ndarray, base: int = 0) -> np.ndarray:
    """Strictly-increasing int array → deltas (first relative to ``base``)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.int64)
    out = np.empty_like(v)
    if len(v):
        out[0] = v[0] - base
        np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray, base: int = 0) -> np.ndarray:
    v = np.ascontiguousarray(deltas, dtype=np.int64)
    out = np.cumsum(v)
    if base:
        out += base
    return out


def grouped_delta_decode(deltas: np.ndarray, group_lens: np.ndarray) -> np.ndarray:
    """Delta-decode a flat stream where cumsum restarts at each group.

    Used for the positions stream (.prx analog): each doc's positions are
    delta-encoded independently but stored concatenated.
    """
    v = np.ascontiguousarray(deltas, dtype=np.int64)
    if len(v) == 0:
        return v
    glens = np.ascontiguousarray(group_lens, dtype=np.int64)
    glens = glens[glens > 0]
    cs = np.cumsum(v)
    starts = np.cumsum(glens)[:-1]  # index of first element of groups 1..
    out = cs.copy()
    if len(starts):
        # subtract the running total at each group boundary
        carry = np.zeros(len(v), dtype=np.int64)
        carry[starts] = cs[starts - 1]
        # positions deltas are non-negative → cs is non-decreasing → the
        # boundary totals are non-decreasing → max-accumulate propagates them
        carry = np.maximum.accumulate(carry)
        out -= carry
    return out
