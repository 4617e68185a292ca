"""Gorilla-style chunk codec: delta-of-delta timestamps + XOR float
values (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time
Series Database", VLDB 2015 — required by BASELINE.json:6,14).

This is our own on-disk format, defined from scratch so that BOTH
directions are numpy-vectorized (the mandate is the compression
*family*, not a wire format).  v2 ("TG2") is column-oriented: instead
of interleaving per-point variable-length codes (which forces a
sequential bit-cursor on decode — v1 decoded ~0.3M pts/s/core in a
Python loop), every fixed-width stream is stored contiguously and the
variable-length payloads follow, so decode is: unpack the fixed-width
flag/class streams, derive every payload's bit offset with one
cumsum, gather all payloads with one vectorized two-word bitfield
extract, and rebuild values with ``np.bitwise_xor.accumulate`` /
timestamps with two ``np.cumsum``.  No per-point Python anywhere.

Layout (header ``b"TG2"`` + uint8 flags + uint32 n, little-endian,
then one big-endian bitstream):

  1. t0 — 64 raw bits (int64 µs)
  2. ts zero-flags — (n−1) × 1 bit (1 ⇔ dod == 0); first point's
     "dod" is its delta from t0
  3. ts classes — 2 bits per NONZERO dod:
       ``00`` +  7-bit payload   dod + 63    ∈ [0, 2^7)
       ``01`` + 12-bit payload   dod + 2047  ∈ [0, 2^12)
       ``10`` + 32-bit payload   dod + 2^31  ∈ [0, 2^32)
       ``11`` + 64-bit payload   dod two's complement
  4. ts payloads — concatenated, lengths implied by the classes
  5. v0 — 64 raw bits (IEEE-754, NaN-safe)
  6. val zero-flags — (n−1) × 1 bit (1 ⇔ xor ≠ 0)
  7. val controls — 12 bits per nonzero xor: lead(6) | nbits-1(6)
  8. val payloads — nbits meaningful bits per nonzero xor

Constant regular series still cost 2 bits/point (two zero-flags), the
same as the v1 prefix coding; mid-size dods pay ≤ 3 bits more than
v1's Huffman-ish buckets — the price of random-access decode.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"TG2"
_U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# payload bit-length per 2-bit ts class
_CLS_BITS = np.array([7, 12, 32, 64], dtype=np.int64)


def _scatter_or(words: np.ndarray, tgt: np.ndarray,
                contrib: np.ndarray) -> None:
    """OR bit-disjoint ``contrib`` values into ``words[tgt]`` where
    ``tgt`` is NONDECREASING.  Replaces ``np.bitwise_or.at`` (an
    unbuffered ufunc, measured ~6× slower): contributions hitting the
    same word occupy disjoint bit ranges, so OR == ADD and a
    run-boundary ``np.add.reduceat`` + one fancy assignment suffices."""
    if len(tgt) == 0:
        return
    starts = np.concatenate(
        [[0], np.flatnonzero(np.diff(tgt)) + 1]
    )
    sums = np.add.reduceat(contrib, starts)
    words[tgt[starts]] |= sums


def pack_bits(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """Pack right-aligned codes ``vals`` of bit-lengths ``lens`` (1..64)
    into a big-endian bitstream.  Fully vectorized (run-boundary
    reduceat scatter — no ufunc.at)."""
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
    _scatter_or(words, w, part1)
    spill = ~fits
    if spill.any():
        sh3 = (128 - end[spill]).astype(np.uint64)
        _scatter_or(words, w[spill] + 1, (v[spill] << sh3) & _MASK64)

    raw = words.byteswap().tobytes() if words.dtype.byteorder != ">" else words.tobytes()
    # words are little-endian uint64 on this platform; byteswap → big-endian
    return raw[: (total + 7) // 8]


def unpack_bits(words: np.ndarray, offs: np.ndarray,
                lens: np.ndarray) -> np.ndarray:
    """Vectorized inverse of :func:`pack_bits`: extract codes of
    bit-length ``lens`` (0..64) at absolute bit offsets ``offs`` from a
    big-endian word array (must have ≥ 1 spare word past the last
    read).  len-0 entries return 0."""
    offs = offs.astype(np.int64, copy=False)
    lens = lens.astype(np.int64, copy=False)
    w = offs >> 6
    b = offs & 63
    end = b + lens
    mask = np.where(
        lens >= 64, _MASK64, (_U64(1) << lens.astype(np.uint64)) - _U64(1)
    ).astype(np.uint64)
    cur = words[w]
    nxt = words[np.minimum(w + 1, len(words) - 1)]
    fits = end <= 64
    # unused lanes of each branch may shift by ≥64 (platform-defined
    # garbage) — they are discarded by the np.where selects
    out_f = (cur >> np.where(fits, 64 - end, 0).astype(np.uint64)) & mask
    keep_lo = np.where(fits, 0, 64 - b).astype(np.uint64)
    m2 = np.where(
        keep_lo >= 64, _MASK64, (_U64(1) << keep_lo) - _U64(1)
    ).astype(np.uint64)
    out_s = ((cur & m2) << np.where(fits, 0, end - 64).astype(np.uint64)) | (
        nxt >> np.where(fits, 1, 128 - end).astype(np.uint64)
    )
    out = np.where(fits, out_f, out_s & mask)
    return np.where(lens == 0, _U64(0), out)


def _unpack_fixed(words: np.ndarray, off: int, count: int,
                  width: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    offs = off + np.arange(count, dtype=np.int64) * width
    return unpack_bits(words, offs, np.full(count, width, dtype=np.int64))


def _dod_classes(dod: np.ndarray):
    """Nonzero dods → (cls 0..3, payload uint64, paylen)."""
    d = dod.astype(np.int64)
    c0 = (d >= -63) & (d <= 64)
    c1 = ~c0 & (d >= -2047) & (d <= 2048)
    c2 = ~c0 & ~c1 & (d >= -(1 << 31)) & (d < (1 << 31))
    cls = np.select([c0, c1, c2], [0, 1, 2], default=3).astype(np.uint64)
    with np.errstate(over="ignore"):
        pay_i = np.select(
            [c0, c1, c2],
            [d + 63, d + 2047, d + np.int64(1 << 31)],
            default=d,  # two's complement via the int64→uint64 view
        ).astype(np.int64)
    pay = pay_i.view(np.uint64)
    paylen = _CLS_BITS[cls.astype(np.int64)]
    return cls, pay, paylen


def encode_chunk(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel arrays (int64 µs timestamps, float64 values,
    already sorted by ts) into one blob.  Fully vectorized."""
    ts = np.asarray(ts_us, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    assert len(vals) == n
    header = _MAGIC + struct.pack("<BI", 1, n)
    if n == 0:
        return header

    segs_v: list[np.ndarray] = [ts[:1].view(np.uint64)]
    segs_l: list[np.ndarray] = [np.array([64], dtype=np.int64)]

    if n > 1:
        delta = np.diff(ts)
        dod = np.empty(n - 1, dtype=np.int64)
        dod[0] = delta[0]
        dod[1:] = delta[1:] - delta[:-1]
        nz = dod != 0
        segs_v.append((nz).astype(np.uint64))          # 2. zero-flags
        segs_l.append(np.ones(n - 1, dtype=np.int64))
        cls, pay, paylen = _dod_classes(dod[nz])
        segs_v.append(cls)                              # 3. classes
        segs_l.append(np.full(len(cls), 2, dtype=np.int64))
        segs_v.append(pay)                              # 4. payloads
        segs_l.append(paylen)

    bits = vals.view(np.uint64)
    segs_v.append(bits[:1].copy())                      # 5. v0
    segs_l.append(np.array([64], dtype=np.int64))
    if n > 1:
        xor = bits[1:] ^ bits[:-1]
        nzv = xor != 0
        segs_v.append(nzv.astype(np.uint64))            # 6. zero-flags
        segs_l.append(np.ones(n - 1, dtype=np.int64))
        x = xor[nzv]
        lead = _clz64(x)
        nbits = np.maximum(64 - lead - _ctz64(x), 1).astype(np.int64)
        trail = (64 - lead - nbits).astype(np.int64)
        ctrl = (lead.astype(np.uint64) << _U64(6)) | (
            nbits - 1
        ).astype(np.uint64)
        segs_v.append(ctrl)                             # 7. controls
        segs_l.append(np.full(len(x), 12, dtype=np.int64))
        segs_v.append(x >> trail.astype(np.uint64))     # 8. payloads
        segs_l.append(nbits)

    stream = pack_bits(
        np.concatenate([s.astype(np.uint64) for s in segs_v]),
        np.concatenate(segs_l),
    )
    return header + stream


def _cumsum0(x: np.ndarray) -> np.ndarray:
    out = np.zeros(len(x) + 1, dtype=np.int64)
    np.cumsum(x, out=out[1:])
    return out


def encode_chunks_batch(ts_us: np.ndarray, values: np.ndarray,
                        starts: np.ndarray) -> list:
    """Encode MANY chunks in one vectorized pass: ``starts`` (int64,
    len G+1) delimits G groups inside the concatenated, per-group
    ts-sorted arrays; returns G blobs, each BYTE-IDENTICAL to
    ``encode_chunk`` on that group's slice (asserted by
    tests/test_gorilla.py::test_batch_encode_matches_per_chunk).

    Why: per-chunk ``encode_chunk`` costs ~30 small numpy calls per
    chunk; at sf0.1's ~55-point day-chunks that fixed cost caps encode
    at 0.18 Mpts/s/core while decode runs 2.2 — the round-3 verdict's
    one sub-0.8 scaling job (chunks_fused, 0.65).  Here every derived
    stream (delta, dod, class, XOR, clz/ctz, control) is computed over
    ALL points at once with group-boundary resets, the destinations of
    every code in the single global (vals, lens) sequence are computed
    by cumsum arithmetic, and ONE pack_bits emits one bitstream in
    which each group is byte-aligned (zero-pad to the next byte after
    each group — exactly the padding a standalone stream carries), so
    per-group blobs are plain byte slices.  Per-group Python work is
    one bytes-concat in a list comprehension; everything else is O(N)
    vector ops.
    """
    ts = np.asarray(ts_us, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    starts = np.asarray(starts, dtype=np.int64)
    G = len(starts) - 1
    if G == 0:
        return []
    n = np.diff(starts)
    assert (n > 0).all(), "empty group"
    N = int(starts[-1])
    first = starts[:-1]
    gid = np.repeat(np.arange(G, dtype=np.int64), n)

    # ---- timestamp streams (per-group reset) -------------------------
    is_first = np.zeros(N, dtype=bool)
    is_first[first] = True
    dpos = np.flatnonzero(~is_first)        # the (n-1)-per-group slots
    delta = np.zeros(N, dtype=np.int64)
    if N > 1:
        delta[1:] = ts[1:] - ts[:-1]
    dod = np.zeros(N, dtype=np.int64)
    if N > 2:
        dod[2:] = delta[2:] - delta[1:-1]
    fm = first[n > 1] + 1                   # first dod slot per group
    dod[fm] = delta[fm]                     # first "dod" = delta from t0
    dod_seq = dod[dpos]
    gid_d = gid[dpos]
    nzt = dod_seq != 0
    cls, pay, paylen = _dod_classes(dod_seq[nzt])

    # ---- value streams ----------------------------------------------
    bits = vals.view(np.uint64)
    xor = np.zeros(N, dtype=np.uint64)
    if N > 1:
        xor[1:] = bits[1:] ^ bits[:-1]
    xor_seq = xor[dpos]
    nzv = xor_seq != 0
    x = xor_seq[nzv]
    lead = _clz64(x)
    nbits = np.maximum(64 - lead - _ctz64(x), 1).astype(np.int64)
    trail = (64 - lead - nbits).astype(np.int64)
    ctrl = (lead.astype(np.uint64) << _U64(6)) | (
        nbits - 1
    ).astype(np.uint64)
    vpay = x >> trail.astype(np.uint64)

    # ---- per-group segment geometry ---------------------------------
    m = n - 1
    nzt_g = np.bincount(gid_d[nzt], minlength=G).astype(np.int64)
    nzv_g = np.bincount(gid_d[nzv], minlength=G).astype(np.int64)
    ts_paybits = np.bincount(
        gid_d[nzt], weights=paylen.astype(np.float64), minlength=G
    ).astype(np.int64)
    val_paybits = np.bincount(
        gid_d[nzv], weights=nbits.astype(np.float64), minlength=G
    ).astype(np.int64)
    bits_g = (64 + m + 2 * nzt_g + ts_paybits
              + 64 + m + 12 * nzv_g + val_paybits)
    pad_g = (-bits_g) % 8
    codes_g = 3 + 2 * m + 2 * nzt_g + 2 * nzv_g
    base = _cumsum0(codes_g)[:-1]
    off_tflag = base + 1
    off_tcls = off_tflag + m
    off_tpay = off_tcls + nzt_g
    off_v0 = off_tpay + nzt_g
    off_vflag = off_v0 + 1
    off_vctrl = off_vflag + m
    off_vpay = off_vctrl + nzv_g
    off_pad = off_vpay + nzv_g
    C = int(codes_g.sum())
    cv = np.zeros(C, dtype=np.uint64)
    cl = np.zeros(C, dtype=np.int64)

    # headers of each stream
    cv[base] = ts[first].view(np.uint64)
    cl[base] = 64
    cv[off_v0] = bits[first]
    cl[off_v0] = 64
    cl[off_pad] = pad_g                     # value 0, len may be 0

    # flags: rank within group = slot index − group start − 1
    rank = dpos - starts[gid_d] - 1
    d_t = off_tflag[gid_d] + rank
    cv[d_t] = nzt.astype(np.uint64)
    cl[d_t] = 1
    d_v = off_vflag[gid_d] + rank
    cv[d_v] = nzv.astype(np.uint64)
    cl[d_v] = 1

    # nonzero-dod codes: within-group rank among nonzeros
    g_t = gid_d[nzt]
    r_t = np.arange(len(g_t), dtype=np.int64) - np.repeat(
        _cumsum0(nzt_g)[:-1], nzt_g
    )
    cv[off_tcls[g_t] + r_t] = cls
    cl[off_tcls[g_t] + r_t] = 2
    cv[off_tpay[g_t] + r_t] = pay
    cl[off_tpay[g_t] + r_t] = paylen

    g_v = gid_d[nzv]
    r_v = np.arange(len(g_v), dtype=np.int64) - np.repeat(
        _cumsum0(nzv_g)[:-1], nzv_g
    )
    cv[off_vctrl[g_v] + r_v] = ctrl
    cl[off_vctrl[g_v] + r_v] = 12
    cv[off_vpay[g_v] + r_v] = vpay
    cl[off_vpay[g_v] + r_v] = nbits

    stream = pack_bits(cv, cl)

    # ---- slice per group --------------------------------------------
    byte_off = _cumsum0((bits_g + pad_g) >> 3)
    hdr = np.empty((G, 8), dtype=np.uint8)
    hdr[:, 0:3] = np.frombuffer(_MAGIC, dtype=np.uint8)
    hdr[:, 3] = 1
    hdr[:, 4:8] = n.astype("<u4").view(np.uint8).reshape(G, 4)
    hb = hdr.tobytes()
    return [
        hb[8 * g: 8 * g + 8] + stream[byte_off[g]: byte_off[g + 1]]
        for g in range(G)
    ]


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
    """Decode a blob back to (ts_us int64, values float64).

    Fully vectorized: fixed-width streams unpack in one gather each,
    payload offsets come from one cumsum, timestamps from two cumsums
    (dod → delta → position), values from one prefix-xor."""
    assert blob[:3] == _MAGIC, "bad magic"
    _flags, n = struct.unpack("<BI", blob[3:8])
    if n == 0:
        return (np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64))

    data = blob[8:]
    pad = (-len(data)) % 8
    words = np.frombuffer(
        data + b"\x00" * (pad + 8), dtype=">u8"
    ).astype(np.uint64)

    t0 = int(unpack_bits(words, np.array([0]), np.array([64]))[0])
    off = 64
    ts = np.empty(n, dtype=np.int64)
    ts[0] = np.uint64(t0).astype(np.int64)

    if n > 1:
        flags_t = _unpack_fixed(words, off, n - 1, 1).astype(bool)
        off += (n - 1)
        nnz = int(flags_t.sum())
        cls = _unpack_fixed(words, off, nnz, 2).astype(np.int64)
        off += 2 * nnz
        paylen = _CLS_BITS[cls]
        p_offs = off + np.concatenate(
            [[0], np.cumsum(paylen)[:-1]]
        ).astype(np.int64)
        pay = unpack_bits(words, p_offs, paylen)
        off += int(paylen.sum())
        payi = pay.view(np.int64)
        dnz = np.select(
            [cls == 0, cls == 1, cls == 2],
            [payi - 63, payi - 2047, payi - np.int64(1 << 31)],
            default=payi,
        )
        dod = np.zeros(n - 1, dtype=np.int64)
        dod[flags_t] = dnz
        delta = np.cumsum(dod)
        ts[1:] = ts[0] + np.cumsum(delta)

    v0 = unpack_bits(words, np.array([off]), np.array([64]))[0]
    off += 64
    if n == 1:
        return ts, np.array([v0], dtype=np.uint64).view(np.float64)

    flags_v = _unpack_fixed(words, off, n - 1, 1).astype(bool)
    off += (n - 1)
    nnzv = int(flags_v.sum())
    ctrl = _unpack_fixed(words, off, nnzv, 12).astype(np.int64)
    off += 12 * nnzv
    lead = ctrl >> 6
    nbits = (ctrl & 63) + 1
    p_offs = off + np.concatenate(
        [[0], np.cumsum(nbits)[:-1]]
    ).astype(np.int64)
    payv = unpack_bits(words, p_offs, nbits.astype(np.int64))
    xor = payv << (64 - lead - nbits).astype(np.uint64)
    xor_all = np.zeros(n - 1, dtype=np.uint64)
    xor_all[flags_v] = xor
    bits = np.empty(n, dtype=np.uint64)
    bits[0] = v0
    bits[1:] = xor_all
    np.bitwise_xor.accumulate(bits, out=bits)
    return ts, bits.view(np.float64)
