"""Gorilla-style chunk codec: delta-of-delta timestamps + XOR float
values (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time
Series Database", VLDB 2015 — required by BASELINE.json:6,14).

This is our own on-disk format, defined from scratch for vectorized
encoding (the mandate is the compression *family*, not a wire format):

- header: magic ``b"TG1"`` + uint8 flags + uint32 n (little-endian)
- bitstream (big-endian bit order), timestamps section then values
  section:

  timestamps (µs): t0 as raw 64 bits, then per point the
  delta-of-delta bucketed as
    ``0``                      dod == 0
    ``10``   +  7 bits         dod + 63      ∈ [0, 2^7)
    ``110``  +  9 bits         dod + 255     ∈ [0, 2^9)
    ``1110`` + 12 bits         dod + 2047    ∈ [0, 2^12)
    ``11110`` + 32 bits        dod + 2^31    ∈ [0, 2^32)
    ``11111`` + 64 bits        dod two's complement
  (the first point's "dod" is its delta from t0)

  values (IEEE-754 bits, NaN-safe): v0 as raw 64 bits, then per point
  xor = bits(v[i]) ^ bits(v[i-1]):
    ``0``                                     xor == 0
    ``1`` + 6 bits lead + 6 bits (nbits-1) + nbits meaningful bits

Unlike classic Gorilla the value control does not depend on the
previous point's window — every point's code is independent given the
xor array, which makes encoding fully numpy-vectorized (no per-row
Python, BASELINE.json:15).  Decoding is inherently sequential and runs
as a tight Python-int loop (used on the read path / round-trip tests).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"TG1"
_U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def pack_bits(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """Pack right-aligned codes ``vals`` of bit-lengths ``lens`` (1..64)
    into a big-endian bitstream.  Fully vectorized (bitwise_or.at)."""
    vals = vals.astype(np.uint64, copy=False)
    lens = lens.astype(np.int64, copy=False)
    keep = lens > 0
    vals, lens = vals[keep], lens[keep]
    if len(vals) == 0:
        return b""
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    total = int(offs[-1])
    nwords = total // 64 + 2
    words = np.zeros(nwords, dtype=np.uint64)

    o = offs[:-1]
    w = o >> 6
    b = o & 63
    end = b + lens
    mask = np.where(
        lens >= 64, _MASK64, (_U64(1) << lens.astype(np.uint64)) - _U64(1)
    ).astype(np.uint64)
    v = vals & mask

    fits = end <= 64
    sh1 = np.where(fits, 64 - end, 0).astype(np.uint64)
    sh2 = np.where(fits, 0, end - 64).astype(np.uint64)
    part1 = np.where(fits, v << sh1, v >> sh2)
    np.bitwise_or.at(words, w, part1)
    spill = ~fits
    if spill.any():
        sh3 = (128 - end[spill]).astype(np.uint64)
        np.bitwise_or.at(words, w[spill] + 1, (v[spill] << sh3) & _MASK64)

    raw = words.byteswap().tobytes() if words.dtype.byteorder != ">" else words.tobytes()
    # words are little-endian uint64 on this platform; byteswap → big-endian
    return raw[: (total + 7) // 8]


class _BitReader:
    __slots__ = ("words", "pos", "total")

    def __init__(self, data: bytes, offset_bits: int = 0):
        pad = (-len(data)) % 8
        buf = data + b"\x00" * pad
        self.words = np.frombuffer(buf, dtype=">u8").astype(np.uint64).tolist()
        self.pos = offset_bits
        self.total = len(data) * 8

    def read(self, n: int) -> int:
        pos = self.pos
        w, b = pos >> 6, pos & 63
        end = b + n
        if end <= 64:
            out = (self.words[w] >> (64 - end)) & ((1 << n) - 1)
        else:
            hi = self.words[w] & ((1 << (64 - b)) - 1)
            rem = end - 64
            out = (int(hi) << rem) | (self.words[w + 1] >> (128 - end))
        self.pos = pos + n
        return int(out)


def _dod_codes(dod: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Return (prefix_val, prefix_len, payload_val, payload_len) arrays."""
    d = dod.astype(np.int64)
    z = d == 0
    b7 = (~z) & (d >= -63) & (d <= 64)
    b9 = (~z) & ~b7 & (d >= -255) & (d <= 256)
    b12 = (~z) & ~b7 & ~b9 & (d >= -2047) & (d <= 2048)
    b32 = (~z) & ~b7 & ~b9 & ~b12 & (d >= -(1 << 31)) & (d < (1 << 31))
    b64 = (~z) & ~b7 & ~b9 & ~b12 & ~b32

    pv = np.select(
        [z, b7, b9, b12, b32, b64],
        [0b0, 0b10, 0b110, 0b1110, 0b11110, 0b11111],
    ).astype(np.uint64)
    pl = np.select([z, b7, b9, b12, b32, b64], [1, 2, 3, 4, 5, 5]).astype(np.int64)
    # payload: offset-encoded for the small buckets, two's complement for
    # the 64-bit bucket (int64 → uint64 cast wraps mod 2^64, which IS the
    # two's-complement pattern); unused lanes may wrap silently.
    with np.errstate(over="ignore"):
        dv_i = np.select(
            [z, b7, b9, b12, b32, b64],
            [np.int64(0), d + 63, d + 255, d + 2047, d + np.int64(1 << 31), d],
        ).astype(np.int64)
    dv = dv_i.view(np.uint64)
    dl = np.select([z, b7, b9, b12, b32, b64], [0, 7, 9, 12, 32, 64]).astype(np.int64)
    return pv, pl, dv, dl


def encode_chunk(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel arrays (int64 µs timestamps, float64 values,
    already sorted by ts) into one blob."""
    ts = np.asarray(ts_us, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    assert len(vals) == n
    header = _MAGIC + struct.pack("<BI", 1, n)
    if n == 0:
        return header

    segs_v: list[np.ndarray] = []
    segs_l: list[np.ndarray] = []

    # --- timestamps: t0 raw, then dod codes
    segs_v.append(np.array([np.int64(ts[0])], dtype=np.int64).view(np.uint64))
    segs_l.append(np.array([64], dtype=np.int64))
    if n > 1:
        delta = np.diff(ts)
        dod = np.empty(n - 1, dtype=np.int64)
        dod[0] = delta[0]
        dod[1:] = delta[1:] - delta[:-1]
        pv, pl, dv, dl = _dod_codes(dod)
        # interleave prefix/payload per element: stack columns then ravel
        segs_v.append(np.column_stack([pv, dv]).ravel())
        segs_l.append(np.column_stack([pl, dl]).ravel())

    # --- values: v0 raw, then xor codes
    bits = vals.view(np.uint64)
    segs_v.append(bits[:1].copy())
    segs_l.append(np.array([64], dtype=np.int64))
    if n > 1:
        xor = bits[1:] ^ bits[:-1]
        zero = xor == 0
        # leading / trailing zero counts (numpy >= 2.0 would have bit ops;
        # emulate via float64 log2-free trick: use np.frexp on hi/lo? use
        # np.left: compute via string-free loop-free method)
        lead = _clz64(xor)
        nbits = 64 - lead - _ctz64(xor)
        nbits = np.where(zero, 1, np.maximum(nbits, 1)).astype(np.int64)
        lead = np.where(zero, 0, lead).astype(np.int64)
        trail = np.where(zero, 0, 64 - lead - nbits).astype(np.int64)

        ctrl_v = np.where(
            zero,
            _U64(0),
            (_U64(1) << _U64(12))
            | (lead.astype(np.uint64) << _U64(6))
            | (nbits - 1).astype(np.uint64),
        )
        ctrl_l = np.where(zero, 1, 13).astype(np.int64)
        pay_v = np.where(zero, _U64(0), xor >> trail.astype(np.uint64))
        pay_l = np.where(zero, 0, nbits).astype(np.int64)
        segs_v.append(np.column_stack([ctrl_v, pay_v]).ravel())
        segs_l.append(np.column_stack([ctrl_l, pay_l]).ravel())

    stream = pack_bits(
        np.concatenate([s.astype(np.uint64) for s in segs_v]),
        np.concatenate(segs_l),
    )
    return header + stream


def _clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 array (0 → 64)."""
    out = np.full(len(x), 64, dtype=np.int64)
    nz = x != 0
    # float conversion is exact for the position of the highest set bit
    hi = np.zeros(len(x), dtype=np.float64)
    hi[nz] = x[nz].astype(np.float64)
    # log2 via frexp exponent (frexp: x = m * 2**e, 0.5<=m<1)
    _, e = np.frexp(hi)
    pos = e - 1  # index of highest set bit
    # float64 rounding can overshoot by one for values near 2^53+ — fix up
    pos = pos.astype(np.int64)
    over = nz & (pos >= 64)
    pos[over] = 63
    # verify and correct: highest bit h satisfies (x >> h) == 1
    sh = np.clip(pos, 0, 63).astype(np.uint64)
    wrong = nz & ((x >> sh) == 0)
    pos[wrong] -= 1
    out[nz] = 63 - pos[nz]
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Count trailing zeros of uint64 array (0 → 64)."""
    lowbit = x & (~x + _U64(1))
    return np.where(x == 0, 64, 64 - _clz64(lowbit) - 1).astype(np.int64)


def decode_chunk(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode a blob back to (ts_us int64, values float64)."""
    assert blob[:3] == _MAGIC, "bad magic"
    _flags, n = struct.unpack("<BI", blob[3:8])
    ts = np.empty(n, dtype=np.int64)
    vals_bits = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, vals_bits.view(np.float64)

    r = _BitReader(blob[8:])
    t0 = r.read(64)
    ts[0] = np.uint64(t0).astype(np.int64)
    delta = 0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        elif r.read(1) == 0:
            dod = r.read(32) - (1 << 31)
        else:
            raw = r.read(64)
            dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        delta += dod
        ts[i] = ts[i - 1] + delta

    prev = r.read(64)
    vals_bits[0] = prev
    for i in range(1, n):
        if r.read(1) == 0:
            vals_bits[i] = prev
            continue
        lead = r.read(6)
        nbits = r.read(6) + 1
        bits = r.read(nbits)
        xor = bits << (64 - lead - nbits)
        prev = prev ^ xor  # plain Python ints (xor may exceed int64 range)
        vals_bits[i] = prev
    return ts, vals_bits.view(np.float64)
