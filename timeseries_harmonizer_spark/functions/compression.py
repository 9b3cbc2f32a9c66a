"""Tier-payload compression: Gorilla-style XOR float encoding and
delta-of-delta timestamp encoding, as vectorized numpy kernels inside
Arrow-batched UDFs.

Public algorithms (Facebook Gorilla, VLDB'15: "Gorilla: A Fast, Scalable,
In-Memory Time Series Database"). This implementation uses the XOR-of-
consecutive-doubles idea with a *byte-aligned, columnar* container instead
of the paper's bit-granular stream, trading a few % compression for fully
vectorized encode AND decode (no per-point Python):

float blob   := [n:uint32le][ctrl:uint8*n][payload bytes]
  ctrl[i]    := (trailing_zero_bytes << 4) | meaningful_bytes
  xors       := v[i] ^ v[i-1] as uint64 (v[-1] := 0), so decode is a single
                np.bitwise_xor prefix scan — NaN / ±0 / denormals round-trip
                bit-exactly because everything is pure bit ops.
  payload    := the meaningful_bytes of each xor (little-endian order,
                trailing zero bytes stripped).

ts blob      := [n:uint32le][nbytes:uint8*n][payload bytes]
  dods       := zigzag(delta-of-delta of int64 epoch values); first two
                entries store the raw first value and the first delta.
  decode     := two np.cumsum passes.

Vectorization strategy: offsets come from cumsum of per-point byte counts;
bytes are gathered/scattered per *length class* (<= 9 classes), never per
point.
"""

from __future__ import annotations

import numpy as np

_MAGIC_F = b"GX1"
_MAGIC_T = b"DD1"


def _meaningful_bytes(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per uint64: (trailing_zero_bytes, meaningful_bytes). x==0 -> (0,0)."""
    b = x.view(np.uint64).reshape(-1, 1).view(np.uint8).reshape(-1, 8)  # LE bytes
    nz = b != 0
    any_nz = nz.any(axis=1)
    first = np.where(any_nz, nz.argmax(axis=1), 0).astype(np.uint8)  # trailing zero bytes (LE)
    last = np.where(any_nz, 7 - nz[:, ::-1].argmax(axis=1), 0)
    mb = np.where(any_nz, last - first + 1, 0).astype(np.uint8)
    return first, mb


def encode_floats(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = len(v)
    if n == 0:
        return _MAGIC_F + np.uint32(0).tobytes()
    u = v.view(np.uint64)
    xors = np.empty(n, dtype=np.uint64)
    xors[0] = u[0]
    np.bitwise_xor(u[1:], u[:-1], out=xors[1:])
    tzb, mb = _meaningful_bytes(xors)
    ctrl = ((tzb << 4) | mb).astype(np.uint8)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(mb, out=offs[1:])
    payload = np.zeros(int(offs[-1]), dtype=np.uint8)
    lebytes = xors.reshape(-1, 1).view(np.uint8).reshape(-1, 8)
    for L in range(1, 9):
        sel = np.nonzero(mb == L)[0]
        if len(sel) == 0:
            continue
        starts = offs[sel]
        rows = lebytes[sel]
        src_col = tzb[sel].astype(np.int64)
        idx = starts[:, None] + np.arange(L)
        payload[idx] = rows[np.arange(len(sel))[:, None], src_col[:, None] + np.arange(L)]
    return _MAGIC_F + np.uint32(n).tobytes() + ctrl.tobytes() + payload.tobytes()


def decode_floats(blob: bytes) -> np.ndarray:
    assert blob[:3] == _MAGIC_F, "not a GX1 float blob"
    n = int(np.frombuffer(blob, dtype=np.uint32, count=1, offset=3)[0])
    if n == 0:
        return np.empty(0, dtype=np.float64)
    ctrl = np.frombuffer(blob, dtype=np.uint8, count=n, offset=7)
    tzb = (ctrl >> 4).astype(np.int64)
    mb = (ctrl & 0x0F).astype(np.int64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(mb, out=offs[1:])
    payload = np.frombuffer(blob, dtype=np.uint8, offset=7 + n)
    lebytes = np.zeros((n, 8), dtype=np.uint8)
    for L in range(1, 9):
        sel = np.nonzero(mb == L)[0]
        if len(sel) == 0:
            continue
        idx = offs[sel][:, None] + np.arange(L)
        cols = tzb[sel][:, None] + np.arange(L)
        lebytes[sel[:, None], cols] = payload[idx]
    xors = lebytes.reshape(-1).view(np.uint64)
    u = np.bitwise_xor.accumulate(xors)
    return u.view(np.float64).copy()


def _zigzag(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ((x.astype(np.uint64) << np.uint64(1)) ^ (x >> 63).view(np.uint64))


def _unzigzag(u: np.ndarray) -> np.ndarray:
    x = u.view(np.uint64)
    return ((x >> 1).astype(np.int64)) ^ -(x & 1).astype(np.int64)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """ts: int64 epoch values (any unit). Delta-of-delta + zigzag, byte-
    aligned columnar container."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    if n == 0:
        return _MAGIC_T + np.uint32(0).tobytes()
    dod = np.empty(n, dtype=np.int64)
    dod[0] = t[0]
    if n > 1:
        d = np.diff(t)
        dod[1] = d[0]
        if n > 2:
            dod[2:] = np.diff(d)
    z = _zigzag(dod)
    tzb, mb = _meaningful_bytes(z)
    # timestamps: no trailing-zero-byte trick (values are small already);
    # store total significant bytes from byte 0
    nbytes = (tzb + mb).astype(np.uint8)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offs[1:])
    payload = np.zeros(int(offs[-1]), dtype=np.uint8)
    lebytes = z.reshape(-1, 1).view(np.uint8).reshape(-1, 8)
    for L in range(1, 9):
        sel = np.nonzero(nbytes == L)[0]
        if len(sel) == 0:
            continue
        idx = offs[sel][:, None] + np.arange(L)
        payload[idx] = lebytes[sel][:, :L]
    return _MAGIC_T + np.uint32(n).tobytes() + nbytes.tobytes() + payload.tobytes()


def encode_floats_grouped(
    values: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> list[bytes]:
    """Encode MANY contiguous groups of one value array in a single
    vectorized pass; returns one blob per group, byte-identical to
    ``encode_floats(values[a:b])``. The XOR chain restarts at each group
    start (first value raw), so the whole-batch bit stream is computed once
    and each group's blob is a pure slice — this is what keeps the payload
    stage at ~2 numpy passes per Arrow batch instead of ~2 encoder calls
    per (series, day) group."""
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = len(v)
    if n == 0:
        return []
    u = v.view(np.uint64)
    xors = np.empty(n, dtype=np.uint64)
    xors[0] = u[0]
    np.bitwise_xor(u[1:], u[:-1], out=xors[1:])
    xors[starts] = u[starts]  # each group's first value is stored raw
    tzb, mb = _meaningful_bytes(xors)
    ctrl = ((tzb << 4) | mb).astype(np.uint8)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(mb, out=offs[1:])
    payload = np.zeros(int(offs[-1]), dtype=np.uint8)
    lebytes = xors.reshape(-1, 1).view(np.uint8).reshape(-1, 8)
    for L in range(1, 9):
        sel = np.nonzero(mb == L)[0]
        if len(sel) == 0:
            continue
        sts = offs[sel]
        rows = lebytes[sel]
        src_col = tzb[sel].astype(np.int64)
        idx = sts[:, None] + np.arange(L)
        payload[idx] = rows[np.arange(len(sel))[:, None], src_col[:, None] + np.arange(L)]
    ctrl_b, payload_b = ctrl.tobytes(), payload.tobytes()
    return [
        _MAGIC_F
        + np.uint32(b - a).tobytes()
        + ctrl_b[a:b]
        + payload_b[offs[a]:offs[b]]
        for a, b in zip(starts, ends)
    ]


def encode_timestamps_grouped(
    ts: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> list[bytes]:
    """Grouped twin of ``encode_timestamps``: the delta-of-delta chain
    restarts at each group boundary (first value raw, then the first delta),
    computed for the whole batch at once; per-group blobs are byte-identical
    to the scalar encoder's."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    if n == 0:
        return []
    dod = np.empty(n, dtype=np.int64)
    dod[0] = t[0]
    if n > 1:
        dod[1] = t[1] - t[0]
    if n > 2:
        dod[2:] = t[2:] - 2 * t[1:-1] + t[:-2]
    dod[starts] = t[starts]
    s2 = starts + 1
    s2 = s2[s2 < ends]  # each group's second element stores the raw delta
    dod[s2] = t[s2] - t[s2 - 1]
    z = _zigzag(dod)
    tzb, mb = _meaningful_bytes(z)
    nbytes = (tzb + mb).astype(np.uint8)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offs[1:])
    payload = np.zeros(int(offs[-1]), dtype=np.uint8)
    lebytes = z.reshape(-1, 1).view(np.uint8).reshape(-1, 8)
    for L in range(1, 9):
        sel = np.nonzero(nbytes == L)[0]
        if len(sel) == 0:
            continue
        idx = offs[sel][:, None] + np.arange(L)
        payload[idx] = lebytes[sel][:, :L]
    nbytes_b, payload_b = nbytes.tobytes(), payload.tobytes()
    return [
        _MAGIC_T
        + np.uint32(b - a).tobytes()
        + nbytes_b[a:b]
        + payload_b[offs[a]:offs[b]]
        for a, b in zip(starts, ends)
    ]


def decode_timestamps(blob: bytes) -> np.ndarray:
    assert blob[:3] == _MAGIC_T, "not a DD1 ts blob"
    n = int(np.frombuffer(blob, dtype=np.uint32, count=1, offset=3)[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    nbytes = np.frombuffer(blob, dtype=np.uint8, count=n, offset=7).astype(np.int64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offs[1:])
    payload = np.frombuffer(blob, dtype=np.uint8, offset=7 + n)
    lebytes = np.zeros((n, 8), dtype=np.uint8)
    for L in range(1, 9):
        sel = np.nonzero(nbytes == L)[0]
        if len(sel) == 0:
            continue
        idx = offs[sel][:, None] + np.arange(L)
        lebytes[sel[:, None], np.arange(L)[None, :]] = payload[idx]
    z = lebytes.reshape(-1).view(np.uint64)
    dod = _unzigzag(z)
    if n == 1:
        return dod.copy()
    d = dod.copy()
    d[1:] = np.cumsum(dod[1:])  # deltas
    out = d.copy()
    out[0] = dod[0]
    out[1:] = dod[0] + np.cumsum(d[1:])
    return out
