"""Delta + varbyte posting-list codec, numpy-vectorized (SURVEY §2.6).

The reference's gamma/delta bit codes are broken (quirk Q6: Java
Utils.java:96-97 never sets bits; Python packs "variable-length" codes
into fixed 2-byte shorts, compressed_index.py:32,74).  Decision D6:
implement the documented *intent* — delta-encoded doc-id gaps +
varbyte bytes (north star wording) — with round-trip tests.

Varbyte layout: little-endian 7-bit groups, continuation bit 0x80 set
on every byte except the last of a value.  Encode/decode are fully
vectorized (no per-value Python loop): encode loops over the <=10
byte *positions*, decode uses reduceat over flag-delimited groups.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # ceil(64 / 7)


def varbyte_encode(values: np.ndarray | list[int]) -> bytes:
    """Encode non-negative ints (< 2^63) to a varbyte stream.

    One-run delegate to :func:`varbyte_encode_batch` — a single shared
    kernel keeps the scalar and batch paths byte-identical by
    construction."""
    v = np.asarray(values, dtype=np.uint64)
    return varbyte_encode_batch(v, np.array([v.size], dtype=np.int64))[0]


def varbyte_encode_batch(values: np.ndarray,
                         row_splits: np.ndarray) -> list[bytes]:
    """Encode MANY concatenated value runs in one vectorized pass and
    slice the result back into per-run streams — byte-identical to
    calling :func:`varbyte_encode` per run.

    Motivation: the segment encoder sees tens of thousands of SMALL
    (term, run) groups per Arrow batch; per-group numpy calls pay
    ~10 array allocations for a handful of values each (profiled at
    >80% of encode wall).  One batch pass amortizes that across the
    whole Arrow batch.

    ``row_splits`` = cumulative row lengths (``np.cumsum(sizes)``);
    run i = ``values[row_splits[i-1]:row_splits[i]]``."""
    v = np.asarray(values, dtype=np.uint64)
    splits = np.asarray(row_splits, dtype=np.int64)
    if v.size == 0:
        return [b""] * splits.size
    nb = np.ones(v.size, dtype=np.int64)
    rest = v >> np.uint64(7)
    while rest.any():
        nb += (rest > 0)
        rest >>= np.uint64(7)
    offsets = np.empty(v.size + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(nb, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    for k in range(_MAX_BYTES):
        mask = nb > k
        if not mask.any():
            break
        idx = offsets[:-1][mask] + k
        byte = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[mask] - 1 > k).astype(np.uint8) << 7
        out[idx] = byte | cont
    raw = out.tobytes()
    byte_ends = offsets[splits]
    byte_starts = np.concatenate(([np.int64(0)], byte_ends[:-1]))
    return [raw[s:e] for s, e in zip(byte_starts, byte_ends)]


def delta_encode_batch(doc_ids: np.ndarray,
                       row_splits: np.ndarray) -> list[bytes]:
    """Batched :func:`delta_encode`: gap-encode many concatenated
    ascending doc-id runs (first id of each run absolute) in one pass.
    Byte-identical to per-run delta_encode."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    splits = np.asarray(row_splits, dtype=np.int64)
    if ids.size == 0:
        return [b""] * splits.size
    starts = np.concatenate(([np.int64(0)], splits[:-1]))
    # EMPTY runs make start positions repeat (mid-array) or point one
    # past the data (trailing) — only in-range starts index the arrays;
    # the repeated-assignment case is idempotent and lands on the run
    # that actually owns the position
    starts = starts[starts < ids.size]
    gaps = np.empty(ids.size, dtype=np.uint64)
    if ids.size > 1:
        d = np.diff(ids)
        intra = np.ones(ids.size, dtype=bool)
        intra[starts] = False  # run-start positions have no predecessor
        if (d[intra[1:]] <= 0).any():
            raise ValueError("doc_ids must be strictly increasing per run")
        gaps[1:] = d.astype(np.uint64)
    gaps[starts] = ids[starts].astype(np.uint64)
    return varbyte_encode_batch(gaps, splits)


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Decode a varbyte stream to uint64 values."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # position of each byte within its value
    group_len = np.diff(np.concatenate(([np.int64(-1)], ends)))
    group = np.repeat(np.arange(ends.size), group_len)
    pos = np.arange(b.size) - starts[group]
    contrib = (b & 0x7F).astype(np.uint64) << (7 * pos).astype(np.uint64)
    return np.add.reduceat(contrib, starts)


def delta_encode(doc_ids: np.ndarray | list[int]) -> bytes:
    """Gap-encode an ascending doc-id list (first id absolute, then
    gaps — reference intent, Utils.java:117-138) and varbyte it.
    One-run delegate to :func:`delta_encode_batch` (shared kernel)."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    return delta_encode_batch(ids, np.array([ids.size], dtype=np.int64))[0]


def delta_decode(buf: bytes) -> np.ndarray:
    """Inverse of delta_encode -> int64 ascending doc ids."""
    gaps = varbyte_decode(buf)
    if gaps.size == 0:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(gaps.astype(np.int64))


BLOCK = 128  # postings per skip block (block-max WAND granularity)


def block_stats(doc_ids: np.ndarray, tfs: np.ndarray,
                doc_lens: np.ndarray, block: int = BLOCK):
    """Per-block skip metadata: last doc id, max tf, min doc_len.

    max tf + min doc_len give a cheap upper bound for any of W1/W2/BM25
    doc-term weights (all increase in tf and decrease in doc_len), used
    by block-max WAND (SURVEY §4.2).
    """
    n = doc_ids.size
    starts = np.arange(0, n, block)
    ends = np.minimum(starts + block, n) - 1
    last = doc_ids[ends]
    max_tf = np.maximum.reduceat(tfs, starts)
    min_dl = np.minimum.reduceat(doc_lens, starts)
    return last.astype(np.int64), max_tf.astype(np.int32), min_dl.astype(np.int64)


def block_skyline(tfs: np.ndarray, doc_lens: np.ndarray, block: int = BLOCK):
    """Per-block Pareto skyline of (tf, doc_len) pairs, flattened.

    All weight modes (W1/W2/BM25) increase in tf and decrease in
    doc_len, so max over a block's docs of w(tf_d, dl_d) equals the max
    over its skyline (points not dominated by tf>= & dl<=).  Unlike the
    (max_tf, min_doc_len) cross-combination — which pairs one doc's tf
    with ANOTHER doc's length and can exceed every real score by far —
    the skyline bound is attained by an actual posting, making
    block-max pruning tight for every (k1, b) without storing
    parameter-specific impact scores.

    Returns (sky_block: int32[], sky_tf: int32[], sky_dl: int64[]) —
    parallel arrays, typically 1-10 pairs per 128-posting block.
    """
    n = tfs.size
    sky_block: list[int] = []
    sky_tf: list[int] = []
    sky_dl: list[int] = []
    for bno, start in enumerate(range(0, n, block)):
        tf_b = tfs[start:start + block]
        dl_b = doc_lens[start:start + block]
        order = np.lexsort((dl_b, -tf_b))  # tf desc, dl asc
        best_dl = None
        for i in order:
            if best_dl is None or dl_b[i] < best_dl:
                best_dl = dl_b[i]
                sky_block.append(bno)
                sky_tf.append(int(tf_b[i]))
                sky_dl.append(int(dl_b[i]))
    return (np.asarray(sky_block, dtype=np.int32),
            np.asarray(sky_tf, dtype=np.int32),
            np.asarray(sky_dl, dtype=np.int64))


def _batch_blocks(sizes: np.ndarray, block: int):
    """Global block layout for many concatenated runs: returns
    (blocks_per_row, block_starts, block_ends_incl, row_of_block,
    blk_in_row) over the concatenated index space."""
    sizes = np.asarray(sizes, dtype=np.int64)
    splits = np.cumsum(sizes)
    starts = splits - sizes
    nb = (sizes + block - 1) // block
    row_of_block = np.repeat(np.arange(sizes.size), nb)
    first_blk = np.cumsum(nb) - nb
    blk_in_row = np.arange(int(nb.sum())) - first_blk[row_of_block]
    block_starts = starts[row_of_block] + blk_in_row * block
    block_ends = np.minimum(block_starts + block, splits[row_of_block]) - 1
    return nb, block_starts, block_ends, row_of_block, blk_in_row


def block_stats_batch(doc_ids: np.ndarray, tfs: np.ndarray,
                      doc_lens: np.ndarray, sizes: np.ndarray,
                      block: int = BLOCK):
    """Batched :func:`block_stats` over many concatenated runs — one
    reduceat per statistic for the whole Arrow batch.  Returns
    (blocks_per_row, last, max_tf, min_dl) with the stat arrays
    concatenated in row order; split with ``np.cumsum(blocks_per_row)``."""
    nb, bstarts, bends, _row, _blk = _batch_blocks(sizes, block)
    if bstarts.size == 0:
        return nb, (np.empty(0, np.int64), np.empty(0, np.int32),
                    np.empty(0, np.int64))
    last = doc_ids[bends].astype(np.int64)
    max_tf = np.maximum.reduceat(tfs, bstarts).astype(np.int32)
    min_dl = np.minimum.reduceat(doc_lens, bstarts).astype(np.int64)
    return nb, (last, max_tf, min_dl)


def block_skyline_batch(tfs: np.ndarray, doc_lens: np.ndarray,
                        sizes: np.ndarray, block: int = BLOCK):
    """Batched :func:`block_skyline`: Pareto skylines for every block
    of every run in ~log2(block) vectorized passes (Hillis-Steele
    grouped running-min instead of the per-point Python loop).

    Order within each block matches block_skyline exactly (tf desc,
    dl asc).  Returns (points_per_row, sky_blk, sky_tf, sky_dl) with
    the point arrays concatenated in row order."""
    sizes = np.asarray(sizes, dtype=np.int64)
    n = int(sizes.sum())
    n_rows = sizes.size
    if n == 0:
        return (np.zeros(n_rows, np.int64),
                np.empty(0, np.int32), np.empty(0, np.int32),
                np.empty(0, np.int64))
    _nb, bstarts, _bends, row_of_block, blk_in_row = _batch_blocks(
        sizes, block)
    n_blocks = bstarts.size
    blk_len = np.empty(n_blocks, dtype=np.int64)
    blk_len[:-1] = np.diff(bstarts)
    blk_len[-1] = n - bstarts[-1]
    # fix cross-row boundaries (diff spans rows correctly because
    # block starts are strictly increasing across the concatenation)
    block_of_pos = np.repeat(np.arange(n_blocks), blk_len)
    # order: block, then tf desc, then dl asc — same per-block order
    # the scalar implementation visits
    order = np.lexsort((doc_lens, -tfs, block_of_pos))
    dl_s = doc_lens[order]
    tf_s = tfs[order]
    pos_in_block = np.arange(n) - bstarts[block_of_pos]
    # grouped running min over strict predecessors (log passes)
    huge = np.int64(np.iinfo(np.int64).max)
    # run_min[i] = min dl over i's strict predecessors within its
    # block; init covers 1 predecessor, each doubling step c combines
    # with run_min[i-c] (itself covering c predecessors) -> 2c covered
    run_min = np.full(n, huge, dtype=np.int64)
    run_min[1:] = dl_s[:-1]
    run_min[pos_in_block == 0] = huge
    shift = 1
    while shift < block:
        cand = np.full(n, huge, dtype=np.int64)
        cand[shift:] = run_min[:-shift]
        # a candidate shifted across a block boundary must not leak in
        valid = pos_in_block >= shift
        np.minimum(run_min, np.where(valid, cand, huge), out=run_min)
        shift <<= 1
    mask = dl_s < run_min
    sel = np.flatnonzero(mask)
    blk_sel = block_of_pos[sel]
    pts_per_block = np.bincount(blk_sel, minlength=n_blocks)
    pts_per_row = np.zeros(n_rows, dtype=np.int64)
    np.add.at(pts_per_row, row_of_block, pts_per_block)
    return (pts_per_row,
            blk_in_row[blk_sel].astype(np.int32),
            tf_s[sel].astype(np.int32),
            dl_s[sel].astype(np.int64))


# --- Elias gamma / delta (C2/C3 parity codecs) ------------------------------
#
# The production store stays delta+varbyte (D6: byte-aligned, fully
# vectorized decode).  These bit-level codes exist for parity with the
# reference's published compression comparison (stats.md:16-24 quotes
# gamma and delta ratios) and for the analytic size report bench.py
# emits; round-trip correctness is property-tested.  Streams are
# prefixed with a uint32 value count so trailing pad bits are inert.

def _bit_lengths(v: np.ndarray) -> np.ndarray:
    """Exact bit length per value (no float log2), vectorized."""
    w = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= np.uint64(1 << shift)
        w[mask] += shift
        tmp[mask] >>= np.uint64(shift)
    return w + 1


def _pack_codes(lengths: np.ndarray, emit) -> bytes:
    """Shared bit packer: ``lengths`` are per-value code lengths,
    ``emit(j, starts)`` returns (positions, bits) for bit slot j."""
    total = int(lengths.sum())
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    bits = np.zeros(total, dtype=np.uint8)
    for j in range(int(lengths.max())):
        pos, val = emit(j, starts)
        bits[pos] = val
    return np.packbits(bits).tobytes()


def elias_gamma_encode(values: np.ndarray | list[int]) -> bytes:
    """Elias gamma: (L-1) zeros then the L-bit value, MSB first
    (v >= 1).  Vectorized over bit SLOTS (<= 2*64-1 iterations)."""
    v = np.asarray(values, dtype=np.uint64)
    header = np.uint32(v.size).tobytes()
    if v.size == 0:
        return header
    if (v == 0).any():
        raise ValueError("Elias gamma requires positive integers")
    bl = _bit_lengths(v)
    lengths = 2 * bl - 1

    def emit(j, starts):
        sel = np.flatnonzero(lengths > j)
        insel = sel[j >= (bl[sel] - 1)]  # value-bit region
        shift = (2 * bl[insel] - 2 - j).astype(np.uint64)
        return starts[insel] + j, ((v[insel] >> shift) & np.uint64(1))

    return header + _pack_codes(lengths, emit)


def elias_gamma_decode(buf: bytes) -> np.ndarray:
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    out = np.empty(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf[4:], dtype=np.uint8))
    pos = 0
    for i in range(n):
        z = pos
        while bits[z] == 0:
            z += 1
        width = z - pos + 1  # L
        val = 0
        for b in bits[z:z + width]:
            val = (val << 1) | int(b)
        out[i] = val
        pos = z + width
    return out


def elias_delta_encode(values: np.ndarray | list[int]) -> bytes:
    """Elias delta: gamma(L) then the value's L-1 low bits (MSB
    dropped)."""
    v = np.asarray(values, dtype=np.uint64)
    header = np.uint32(v.size).tobytes()
    if v.size == 0:
        return header
    if (v == 0).any():
        raise ValueError("Elias delta requires positive integers")
    bl = _bit_lengths(v)                 # L
    bll = _bit_lengths(bl.astype(np.uint64))  # bitlen(L)
    glen = 2 * bll - 1                   # gamma(L) bits
    lengths = glen + bl - 1

    def emit(j, starts):
        sel = np.flatnonzero(lengths > j)
        # gamma(L) value-bit region: slots [bll-1, 2*bll-2]
        g = sel[(j >= bll[sel] - 1) & (j < glen[sel])]
        gshift = (2 * bll[g] - 2 - j).astype(np.uint64)
        gpos = starts[g] + j
        gbits = (bl[g].astype(np.uint64) >> gshift) & np.uint64(1)
        # payload region: slots [glen, glen + L - 2] -> v bits L-2..0
        p = sel[j >= glen[sel]]
        pshift = (bl[p] - 2 - (j - glen[p])).astype(np.uint64)
        ppos = starts[p] + j
        pbits = (v[p] >> pshift) & np.uint64(1)
        return np.concatenate((gpos, ppos)), np.concatenate((gbits, pbits))

    return header + _pack_codes(lengths, emit)


def elias_delta_decode(buf: bytes) -> np.ndarray:
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    out = np.empty(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf[4:], dtype=np.uint8))
    pos = 0
    for i in range(n):
        z = pos
        while bits[z] == 0:
            z += 1
        wl = z - pos + 1                 # bitlen(L)
        width = 0
        for b in bits[z:z + wl]:         # decode L (gamma payload)
            width = (width << 1) | int(b)
        pos = z + wl
        val = 1                          # implicit MSB
        for b in bits[pos:pos + width - 1]:
            val = (val << 1) | int(b)
        out[i] = val
        pos += width - 1
    return out


def elias_size_bits(values: np.ndarray | list[int]) -> tuple[int, int]:
    """Analytic (gamma_bits, delta_bits) for a positive-int stream —
    the codec comparison without materializing the encodings."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return 0, 0
    bl = _bit_lengths(v)
    bll = _bit_lengths(bl.astype(np.uint64))
    return int((2 * bl - 1).sum()), int((2 * bll - 1 + bl - 1).sum())


# --- binary interpolative coding (Moffat & Stuehler 2000) -------------------
#
# The classic best-compressing posting-list code: encode the MIDDLE
# doc id of a sorted run with a minimal binary code whose range is
# narrowed by both neighbors' bounds, recurse on the halves.  Clustered
# lists (the Zipf head terms that dominate index bytes) approach 0 bits
# per posting because dense sub-ranges need NO bits at all (range size
# == element count).  Like gamma/delta above this is an evidence codec
# for the size comparison bench.py emits — the production store stays
# delta+varbyte (D6) for vectorized decode — but encode/decode are
# complete and property-tested.  Layout: uint32 n | uint64 hi | bits.

def _min_binary_write(bits: list[int], v: int, r: int) -> None:
    """Minimal binary code for v in [0, r): the first 2^b - r values
    get b-1 bits, the rest b bits (b = ceil(log2 r))."""
    if r <= 1:
        return
    b = (r - 1).bit_length()
    t = (1 << b) - r
    if v < t:
        w = b - 1
    else:
        v, w = v + t, b
    for i in range(w - 1, -1, -1):
        bits.append((v >> i) & 1)


def _min_binary_read(bits, pos: int, r: int) -> tuple[int, int]:
    if r <= 1:
        return 0, pos
    b = (r - 1).bit_length()
    t = (1 << b) - r
    v = 0
    for i in range(b - 1):
        v = (v << 1) | int(bits[pos])
        pos += 1
    if v >= t:
        v = ((v << 1) | int(bits[pos])) - t
        pos += 1
    return v, pos


def interpolative_encode(doc_ids: np.ndarray | list[int]) -> bytes:
    """Encode a strictly-increasing non-negative id list."""
    s = [int(x) for x in doc_ids]
    header = np.uint32(len(s)).tobytes()
    if not s:
        return header
    if any(b <= a for a, b in zip(s, s[1:])) or s[0] < 0:
        raise ValueError("interpolative code requires a strictly "
                         "increasing non-negative sequence")
    hi_all = s[-1]
    header += np.uint64(hi_all).tobytes()
    bits: list[int] = []
    stack = [(0, len(s), 0, hi_all)]  # encode s[a:b] within [lo, hi]
    while stack:
        a, b, lo, hi = stack.pop()
        n = b - a
        if n == 0 or hi - lo + 1 == n:
            continue  # empty, or fully dense: zero bits
        m = a + n // 2
        x = s[m]
        lo_m = lo + (m - a)          # x >= lo + left count
        hi_m = hi - (b - 1 - m)      # x <= hi - right count
        _min_binary_write(bits, x - lo_m, hi_m - lo_m + 1)
        # push right first so the left half is encoded first (LIFO)
        stack.append((m + 1, b, x + 1, hi))
        stack.append((a, m, lo, x - 1))
    return header + np.packbits(
        np.asarray(bits, dtype=np.uint8)).tobytes()


def interpolative_decode(buf: bytes) -> np.ndarray:
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    hi_all = int(np.frombuffer(buf[4:12], dtype=np.uint64)[0])
    bits = np.unpackbits(np.frombuffer(buf[12:], dtype=np.uint8))
    out = [0] * n
    pos = 0
    stack = [(0, n, 0, hi_all)]
    while stack:
        a, b, lo, hi = stack.pop()
        cnt = b - a
        if cnt == 0:
            continue
        if hi - lo + 1 == cnt:       # dense: values are forced
            for i in range(cnt):
                out[a + i] = lo + i
            continue
        m = a + cnt // 2
        lo_m = lo + (m - a)
        hi_m = hi - (b - 1 - m)
        v, pos = _min_binary_read(bits, pos, hi_m - lo_m + 1)
        x = lo_m + v
        out[m] = x
        stack.append((m + 1, b, x + 1, hi))
        stack.append((a, m, lo, x - 1))
    return np.asarray(out, dtype=np.int64)


# --- dictionary blocking + front coding (SURVEY C4/C5/C6) -------------------

DICT_BLOCK = 8  # terms per dictionary block (reference blocking k=8)


def frontcode_encode(terms: list[str], k: int = DICT_BLOCK) -> bytes:
    """Blocked front-coding of a SORTED term list (reference intent,
    Compression.java:151-174 + Utils.java:152-176, with quirk Q7's
    dropped-kth-term and unflushed-final-block bugs fixed).

    Per block of up to ``k`` terms: varbyte(n_terms),
    varbyte(len(common prefix of the block)), prefix bytes, then per
    term varbyte(len(suffix)) + suffix bytes.  Sorted input keeps
    block LCPs long; utf-8 throughout.
    """
    out = bytearray()
    for i in range(0, len(terms), k):
        block = [t.encode("utf-8") for t in terms[i:i + k]]
        lcp = block[0]
        for t in block[1:]:
            j = 0
            m = min(len(lcp), len(t))
            while j < m and lcp[j] == t[j]:
                j += 1
            lcp = lcp[:j]
            if not lcp:
                break
        out += varbyte_encode([len(block), len(lcp)])
        out += lcp
        for t in block:
            suf = t[len(lcp):]
            out += varbyte_encode([len(suf)])
            out += suf
    return bytes(out)


def frontcode_decode(blob: bytes) -> list[str]:
    """Inverse of ``frontcode_encode`` (streaming scan, no term count
    needed — blocks are self-delimiting)."""
    terms: list[str] = []
    pos, n = 0, len(blob)

    def take_varint() -> int:
        nonlocal pos
        v, shift = 0, 0
        while True:
            b = blob[pos]
            pos += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    while pos < n:
        n_terms = take_varint()
        lcp_len = take_varint()
        lcp = blob[pos:pos + lcp_len]
        pos += lcp_len
        for _ in range(n_terms):
            slen = take_varint()
            terms.append((lcp + blob[pos:pos + slen]).decode("utf-8"))
            pos += slen
    return terms


def dict_size_bytes(terms: list[str], k: int = DICT_BLOCK) -> dict:
    """C6-vs-C4/C5 size evidence on a real vocabulary: fixed-width
    (every term padded to the longest — the reference's uncompressed
    dictionary, Compression.java:71-77), length-prefixed (varbyte len
    + bytes), and blocked front-coded."""
    enc = [t.encode("utf-8") for t in terms]
    width = max((len(t) for t in enc), default=0)
    lp = sum(len(varbyte_encode([len(t)])) + len(t) for t in enc)
    return {
        "n_terms": len(terms),
        "fixed_width_bytes": width * len(enc),
        "length_prefixed_bytes": lp,
        "frontcoded_bytes": len(frontcode_encode(terms, k)),
    }


# --- Simple-9 word-aligned codec (Anh & Moffat 2005) -------------------------
#
# The third classic codec family next to the bit-level Elias codes and
# the byte-level varbyte store: pack as many gaps as possible into each
# 32-bit word under a 4-bit selector + 28 payload bits.  Its virtue is
# DECODE speed — one selector branch per word, then fixed shift/mask —
# which is why Lucene-era engines shipped it; the decode below is fully
# vectorized per selector class (numpy shift/mask over all words of a
# class at once, no per-value loop).  Like gamma/delta/interpolative
# this is an evidence codec for the size/speed comparison bench.py
# emits; the production store stays delta+varbyte (D6).  Values must
# fit in 28 bits (posting GAPS at any corpus size in a doc-range run:
# run width is 2^param bits; tf values likewise).

# selector -> (count, bits): the 9 ways to fill 28 payload bits.
SIMPLE9_MODES: tuple[tuple[int, int], ...] = (
    (28, 1), (14, 2), (9, 3), (7, 4), (5, 5), (4, 7), (3, 9), (2, 14),
    (1, 28),
)
_S9_MAX = (1 << 28) - 1


def simple9_encode(values: np.ndarray | list[int]) -> bytes:
    """Greedy Simple-9: for each word pick the densest mode whose next
    ``count`` values all fit in ``bits``.  uint32-count header like the
    Elias codecs (the last word may be partially filled)."""
    v = np.asarray(values, dtype=np.uint64)
    header = np.uint32(v.size).tobytes()
    if v.size == 0:
        return header
    if int(v.max()) > _S9_MAX:
        raise ValueError("Simple-9 payload is 28 bits")
    bl = _bit_lengths(v)  # bitlen(0) == 1 there: 0 packs fine
    n = v.size
    words = np.empty(n, dtype=np.uint32)  # upper bound: 1 value/word
    w = 0
    pos = 0
    while pos < n:
        for sel, (count, bits) in enumerate(SIMPLE9_MODES):
            take = min(count, n - pos)
            if take < count and sel < len(SIMPLE9_MODES) - 1:
                # a partial word only at the densest mode that fits all
                # REMAINING values in wider slots; otherwise keep trying
                # narrower modes
                if int(bl[pos:pos + take].max()) <= bits:
                    pass  # candidate: remaining values fit this mode
                else:
                    continue
            elif int(bl[pos:pos + take].max()) > bits:
                continue
            word = np.uint32(sel) << np.uint32(28)
            shift = 0
            for x in v[pos:pos + take]:
                word |= np.uint32(x) << np.uint32(shift)
                shift += bits
            words[w] = word
            w += 1
            pos += take
            break
    return header + words[:w].tobytes()


def simple9_decode(buf: bytes) -> np.ndarray:
    """Vectorized per selector class: one shift/mask pass per (sel,
    slot) pair — at most sum(count per mode) = 70 numpy ops total,
    independent of stream length."""
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    words = np.frombuffer(buf[4:], dtype=np.uint32)
    sels = (words >> np.uint32(28)).astype(np.int64)
    counts = np.array([c for c, _ in SIMPLE9_MODES], dtype=np.int64)[sels]
    # output offset of each word's first value; the LAST word may hold
    # fewer than its mode's count — clamp to n
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    for sel, (count, bits) in enumerate(SIMPLE9_MODES):
        idx = np.flatnonzero(sels == sel)
        if idx.size == 0:
            continue
        mask = np.uint32((1 << bits) - 1)
        wsel = words[idx]
        base = starts[idx]
        for slot in range(count):
            pos = base + slot
            ok = pos < n
            out[pos[ok]] = (wsel[ok] >> np.uint32(slot * bits)) & mask
    return out


# --- Elias-Fano (quasi-succinct, Vigna 2013) --------------------------------
#
# THE modern posting-list layout (Lucene 8+ doc-id blocks, PISA, the
# quasi-succinct successor to PForDelta): a monotone id sequence of n
# values over universe u splits each value into l = floor(log2(u/n))
# fixed-width low bits plus a unary-coded high part laid out as a
# bitmap of n ones among n + (u >> l) bits.  Total n*(l + 2) bits —
# within 2 bits/posting of the information-theoretic minimum — while
# supporting O(1) random access (select on the high bitmap) and
# skipping WITHOUT per-block metadata, which is why it displaced
# gap+varbyte in engines that intersect lists aggressively.  Like
# gamma/delta/interpolative/Simple-9 above this is an evidence codec
# for bench.py's size comparison (the production store stays
# delta+varbyte per D6 for byte-aligned vectorized decode); both
# directions here are fully vectorized numpy (no per-value Python in
# decode, unlike the gamma/delta readers).
# Layout: uint32 n | uint64 last | uint8 l | high bitmap bytes | low bits.

def _ef_low_bits(u: int, n: int) -> int:
    """floor(log2(u / n)) for u >= n >= 1 without float log2 (exact:
    floor(log2(x)) == floor(log2(floor(x))) for x >= 1 because powers
    of two are integers)."""
    q = u // n
    return q.bit_length() - 1 if q >= 1 else 0


def elias_fano_encode(doc_ids: np.ndarray | list[int]) -> bytes:
    """Encode a sorted NON-DECREASING sequence of ids >= 0."""
    v = np.asarray(doc_ids, dtype=np.uint64)
    n = v.size
    if n == 0:
        return np.uint32(0).tobytes() + np.uint64(0).tobytes() + b"\x00"
    if (np.diff(v.astype(np.int64)) < 0).any():
        raise ValueError("Elias-Fano requires a non-decreasing sequence")
    last = int(v[-1])
    l = _ef_low_bits(last + 1, n)
    header = (np.uint32(n).tobytes() + np.uint64(last).tobytes()
              + bytes([l]))
    # high part: unary bitmap — bit ((v[i] >> l) + i) is the i-th one
    high = (v >> np.uint64(l)).astype(np.int64)
    hbits = np.zeros(n + high[-1] + 1, dtype=np.uint8)
    hbits[high + np.arange(n, dtype=np.int64)] = 1
    out = [header, np.packbits(hbits).tobytes()]
    # low part: n fixed l-bit slots, MSB first
    if l > 0:
        shifts = np.arange(l - 1, -1, -1, dtype=np.uint64)
        lbits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
            np.uint8).ravel()
        out.append(np.packbits(lbits).tobytes())
    return b"".join(out)


def elias_fano_decode(buf: bytes) -> np.ndarray:
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    last = int(np.frombuffer(buf[4:12], dtype=np.uint64)[0])
    l = buf[12]
    h_len = n + (last >> l) + 1
    h_bytes = (h_len + 7) // 8
    hbits = np.unpackbits(
        np.frombuffer(buf[13:13 + h_bytes], dtype=np.uint8))[:h_len]
    high = np.flatnonzero(hbits) - np.arange(n, dtype=np.int64)
    if l == 0:
        return high
    lbits = np.unpackbits(
        np.frombuffer(buf[13 + h_bytes:], dtype=np.uint8))[:n * l]
    weights = (np.uint64(1) << np.arange(l - 1, -1, -1,
                                         dtype=np.uint64))
    low = lbits.reshape(n, l).astype(np.uint64) @ weights
    return ((high.astype(np.uint64) << np.uint64(l)) | low).astype(
        np.int64)


def elias_fano_size_bits(n: int, last: int) -> int:
    """Analytic payload size in bits (header excluded) — EF size
    depends only on (n, universe), never on the id distribution."""
    if n == 0:
        return 0
    l = _ef_low_bits(last + 1, n)
    return n * l + n + (last >> l) + 1


# --- NewPFD / patched frame-of-reference (Yan, Ding & Suel, WWW 2009) --------
#
# The codec that made bit-packing practical for web indexes: each
# 128-value block packs every value's LOW b bits at a fixed width
# chosen so outliers stay rare, and the outliers ("exceptions") store
# their overflow high bits out-of-band — so one huge gap no longer
# drags the whole block to 32-bit width, the classic frame-of-
# reference failure.  b is chosen PER BLOCK by exact cost minimization
# (packed bytes + exception bytes), not a fixed outlier quota, which
# dominates the 90%-quantile heuristic of the original paper on short
# runs.  Like gamma/delta/interpolative/Simple-9/Elias-Fano this is an
# evidence codec for bench.py's size table (the production store stays
# delta+varbyte per D6); encode and decode are vectorized numpy —
# pack/unpack are np.packbits/np.unpackbits over (n, b) bit matrices,
# exceptions ride the existing varbyte kernels.
#
# Layout: uint32 n | per block: u8 b | u8 n_exc | ceil(len*b/8) packed
# low-bit bytes (MSB-first per value) | n_exc u8 slot positions |
# varbyte(high parts, in slot order).

PFOR_BLOCK = 128


def pfor_encode(values: np.ndarray | list[int]) -> bytes:
    v = np.asarray(values, dtype=np.uint64)
    out = [np.uint32(v.size).tobytes()]
    if v.size == 0:
        return b"".join(out)
    if int(v.max()) >= (1 << 32):
        raise ValueError("NewPFD payload is 32 bits")
    for pos in range(0, v.size, PFOR_BLOCK):
        blk = v[pos:pos + PFOR_BLOCK]
        bl = _bit_lengths(blk)          # bitlen with bitlen(0) == 1
        maxb = int(bl.max())
        best_b, best_cost = maxb, None
        for b in range(1, maxb + 1):
            over = bl[bl > b]
            # each exception: 1 position byte + varbyte(high) where
            # high has (bitlen - b) bits -> ceil(bits / 7) bytes
            exc_cost = over.size + int(np.ceil((over - b) / 7.0).sum())
            cost = (blk.size * b + 7) // 8 + exc_cost
            if best_cost is None or cost < best_cost:
                best_b, best_cost = b, cost
        b = best_b
        mask = np.uint64((1 << b) - 1)
        low = blk & mask
        shifts = np.arange(b - 1, -1, -1, dtype=np.uint64)
        bits = ((low[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
            np.uint8)
        packed = np.packbits(bits.ravel()).tobytes()
        exc_idx = np.flatnonzero(bl > b)
        highs = (blk[exc_idx] >> np.uint64(b))
        out.append(np.uint8(b).tobytes() + np.uint8(exc_idx.size).tobytes()
                   + packed + exc_idx.astype(np.uint8).tobytes()
                   + varbyte_encode(highs))
    return b"".join(out)


def pfor_decode(buf: bytes) -> np.ndarray:
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    out = np.empty(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    p = 4
    done = 0
    while done < n:
        blen = min(PFOR_BLOCK, n - done)
        b = int(raw[p]); n_exc = int(raw[p + 1]); p += 2
        nbytes = (blen * b + 7) // 8
        bits = np.unpackbits(raw[p:p + nbytes], count=blen * b)
        p += nbytes
        weights = (np.uint64(1) << np.arange(b - 1, -1, -1,
                                             dtype=np.uint64))
        vals = (bits.reshape(blen, b).astype(np.uint64) * weights).sum(
            axis=1, dtype=np.uint64)
        if n_exc:
            idx = raw[p:p + n_exc].astype(np.int64); p += n_exc
            # the highs varbyte stream ends at its n_exc-th terminator;
            # highs are < 2^32 so each takes <= 5 bytes — scan only
            # that window, not the whole remaining buffer
            win = raw[p:p + 5 * n_exc]
            term = np.flatnonzero((win & 0x80) == 0)
            end = p + int(term[n_exc - 1]) + 1
            highs = varbyte_decode(raw[p:end].tobytes()); p = end
            vals[idx] |= highs << np.uint64(b)
        out[done:done + blen] = vals
        done += blen
    return out


# --- Roaring bitmaps (Chambi, Lemire, Kaser & Godin, 2016) -------------------
#
# The doc-id SET structure every production web index converged on
# (Lucene liveDocs/postings filters, Druid, ClickHouse, Pilosa):
# partition the u32 id space into 64Ki chunks by the high 16 bits and
# store each chunk in whichever container is smallest —
#
#   array  : sorted u16 list           (2·card bytes — sparse chunks)
#   bitmap : fixed 65536-bit bitset    (8192 bytes — dense chunks)
#   run    : RLE (start, len-1) pairs  (2 + 4·runs bytes — clustered)
#
# Unlike the gap codecs above, Roaring needs no sequential decode to
# answer membership / intersection / rank — the natural store for
# delete tombstone sets and boolean filter results, and the evidence
# codec for doc-id SETS in bench.py's size table (Elias-Fano is its
# succinct-but-sequential counterpart).  Encode/decode are vectorized
# numpy: one np.unique split by high bits, then per-container
# packbits / searchsorted-free maths; the per-container Python loop is
# bounded by 65536 containers, never by ids.
#
# Layout: u32 n_containers | per container: u16 key | u8 ctype |
# u16 card-1 | payload.

ROARING_ARRAY, ROARING_BITMAP, ROARING_RUN = 0, 1, 2


def _roaring_runs(lows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, lengths-1) of maximal consecutive runs in sorted u16s."""
    brk = np.flatnonzero(np.diff(lows.astype(np.int64)) != 1)
    starts_idx = np.concatenate(([0], brk + 1))
    ends_idx = np.concatenate((brk, [lows.size - 1]))
    return lows[starts_idx], (lows[ends_idx] - lows[starts_idx])


def roaring_encode(ids: np.ndarray | list[int]) -> bytes:
    v = np.asarray(ids, dtype=np.uint64)
    out = [np.uint32(0).tobytes()]  # patched with n_containers below
    if v.size == 0:
        return out[0]
    if int(v.max()) >= (1 << 32):
        raise ValueError("roaring ids are 32 bits")
    v32 = v.astype(np.uint32)
    if v32.size > 1 and not (v32[1:] > v32[:-1]).all():
        raise ValueError("roaring input must be strictly increasing")
    keys = (v32 >> 16).astype(np.uint16)
    lows = (v32 & 0xFFFF).astype(np.uint16)
    uk, first = np.unique(keys, return_index=True)
    bounds = np.append(first, v32.size)
    for i, key in enumerate(uk):
        lo = lows[bounds[i]:bounds[i + 1]]
        card = lo.size
        starts, lens = _roaring_runs(lo)
        sz_array, sz_run = 2 * card, 2 + 4 * starts.size
        sz_bitmap = 8192
        best = min(sz_array, sz_bitmap, sz_run)
        if best == sz_run:
            payload = (np.uint16(starts.size).tobytes()
                       + np.column_stack((starts, lens))
                       .astype(np.uint16).tobytes())
            ctype = ROARING_RUN
        elif best == sz_array:
            payload = lo.tobytes()
            ctype = ROARING_ARRAY
        else:
            bits = np.zeros(65536, dtype=np.uint8)
            bits[lo] = 1
            payload = np.packbits(bits, bitorder="little").tobytes()
            ctype = ROARING_BITMAP
        out.append(np.uint16(key).tobytes() + np.uint8(ctype).tobytes()
                   + np.uint16(card - 1).tobytes() + payload)
    out[0] = np.uint32(len(uk)).tobytes()
    return b"".join(out)


def roaring_decode(buf: bytes) -> np.ndarray:
    raw = np.frombuffer(buf, dtype=np.uint8)
    n_cont = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    p = 4
    parts = []
    for _ in range(n_cont):
        key = int(np.frombuffer(raw[p:p + 2].tobytes(), dtype=np.uint16)[0])
        ctype = int(raw[p + 2])
        card = int(np.frombuffer(raw[p + 3:p + 5].tobytes(),
                                 dtype=np.uint16)[0]) + 1
        p += 5
        if ctype == ROARING_ARRAY:
            lo = np.frombuffer(raw[p:p + 2 * card].tobytes(), dtype=np.uint16)
            p += 2 * card
        elif ctype == ROARING_BITMAP:
            bits = np.unpackbits(raw[p:p + 8192], bitorder="little")
            lo = np.flatnonzero(bits).astype(np.uint16)
            p += 8192
        elif ctype == ROARING_RUN:
            n_runs = int(np.frombuffer(raw[p:p + 2].tobytes(),
                                       dtype=np.uint16)[0])
            pairs = np.frombuffer(raw[p + 2:p + 2 + 4 * n_runs].tobytes(),
                                  dtype=np.uint16).reshape(n_runs, 2)
            # int() the u16 pair first: under NumPy 2 (NEP 50)
            # uint16(65535) + 1 would WRAP, silently dropping a run
            # ending at the chunk ceiling
            lo = np.concatenate([
                np.arange(int(s), int(s) + int(l) + 1, dtype=np.uint32)
                for s, l in pairs]).astype(np.uint16)
            p += 2 + 4 * n_runs
        else:
            raise ValueError(f"bad roaring container type {ctype}")
        parts.append((np.uint32(key) << np.uint32(16))
                     | lo.astype(np.uint32))
    if not parts:
        return np.empty(0, dtype=np.uint32)
    return np.concatenate(parts)


def roaring_contains(buf: bytes, ids: np.ndarray | list[int]) -> np.ndarray:
    """Vectorized membership over the ENCODED form — the operation
    Roaring exists for: each probed id touches only ITS container
    (bitmap containers answer with O(1) bit tests, run containers with
    a binary search over run starts), and containers whose key matches
    no probe are skipped without touching their payload."""
    probes = np.asarray(ids, dtype=np.uint32)
    result = np.zeros(probes.size, dtype=bool)
    pk = (probes >> np.uint32(16)).astype(np.uint16)
    pl = (probes & np.uint32(0xFFFF)).astype(np.uint16)
    raw = np.frombuffer(buf, dtype=np.uint8)
    n_cont = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    p = 4
    for _ in range(n_cont):
        key = int(np.frombuffer(raw[p:p + 2].tobytes(), dtype=np.uint16)[0])
        ctype = int(raw[p + 2])
        card = int(np.frombuffer(raw[p + 3:p + 5].tobytes(),
                                 dtype=np.uint16)[0]) + 1
        p += 5
        if ctype == ROARING_ARRAY:
            plen = 2 * card
        elif ctype == ROARING_BITMAP:
            plen = 8192
        elif ctype == ROARING_RUN:
            n_runs = int(np.frombuffer(raw[p:p + 2].tobytes(),
                                       dtype=np.uint16)[0])
            plen = 2 + 4 * n_runs
        else:
            raise ValueError(f"bad roaring container type {ctype}")
        sel = np.flatnonzero(pk == key)
        if sel.size:
            lo = pl[sel]
            if ctype == ROARING_ARRAY:
                arr = np.frombuffer(raw[p:p + plen].tobytes(),
                                    dtype=np.uint16)
                pos = np.searchsorted(arr, lo)
                hit = (pos < arr.size) & (arr[np.minimum(pos, arr.size - 1)]
                                          == lo)
            elif ctype == ROARING_BITMAP:
                payload = raw[p:p + plen]
                hit = (payload[lo >> 3] >> (lo & 7).astype(np.uint8)) & 1 > 0
            else:
                pairs = np.frombuffer(raw[p + 2:p + plen].tobytes(),
                                      dtype=np.uint16).reshape(-1, 2)
                j = np.searchsorted(pairs[:, 0], lo, side="right") - 1
                jn = np.maximum(j, 0)
                hit = (j >= 0) & (lo.astype(np.int64)
                                  <= pairs[jn, 0].astype(np.int64)
                                  + pairs[jn, 1])
            result[sel] = hit
        p += plen
    return result
