"""Round-trip property tests for the varbyte/delta codec (SURVEY §5.2.1)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ir_spark.codec import (
    block_stats,
    delta_decode,
    delta_encode,
    varbyte_decode,
    varbyte_encode,
)


class TestVarbyte:
    def test_empty(self):
        assert varbyte_encode([]) == b""
        assert varbyte_decode(b"").size == 0

    def test_known_bytes(self):
        # 0 -> 00; 127 -> 7f; 128 -> 0x80|0x00, 0x01
        assert varbyte_encode([0]) == b"\x00"
        assert varbyte_encode([127]) == b"\x7f"
        assert varbyte_encode([128]) == b"\x80\x01"
        assert varbyte_encode([300]) == b"\xac\x02"

    @given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip(self, values):
        out = varbyte_decode(varbyte_encode(values))
        assert out.tolist() == values

    def test_large_array(self):
        rng = np.random.default_rng(42)
        vals = rng.integers(0, 2**40, size=100_000, dtype=np.uint64)
        assert (varbyte_decode(varbyte_encode(vals)) == vals).all()


class TestDelta:
    @given(
        st.lists(st.integers(min_value=1, max_value=2**40), min_size=0,
                 max_size=300, unique=True)
    )
    @settings(max_examples=200, deadline=None)
    def test_roundtrip(self, ids):
        ids = sorted(ids)
        out = delta_decode(delta_encode(ids))
        assert out.tolist() == ids

    def test_rejects_non_increasing(self):
        with pytest.raises(ValueError):
            delta_encode([5, 5])
        with pytest.raises(ValueError):
            delta_encode([5, 3])

    def test_compression_wins_on_dense_lists(self):
        # dense ascending ids -> gaps of 1 -> 1 byte each
        ids = np.arange(1, 100_001)
        assert len(delta_encode(ids)) < ids.size * 1.01


class TestBlockStats:
    def test_blocks(self):
        ids = np.arange(1, 301)
        tfs = np.concatenate([np.full(128, 2), np.full(128, 7), np.full(44, 3)])
        dls = np.concatenate([np.full(128, 50), np.full(128, 10), np.full(44, 99)])
        last, max_tf, min_dl = block_stats(ids, tfs, dls, block=128)
        assert last.tolist() == [128, 256, 300]
        assert max_tf.tolist() == [2, 7, 3]
        assert min_dl.tolist() == [50, 10, 99]

    def test_upper_bound_property(self):
        # any member weight <= bound computed from (max_tf, min_dl)
        rng = np.random.default_rng(7)
        ids = np.cumsum(rng.integers(1, 10, 500))
        tfs = rng.integers(1, 30, 500)
        dls = rng.integers(20, 900, 500)
        last, max_tf, min_dl = block_stats(ids, tfs, dls, block=128)
        for bi in range(len(last)):
            lo, hi = bi * 128, min((bi + 1) * 128, 500)
            assert tfs[lo:hi].max() == max_tf[bi]
            assert dls[lo:hi].min() == min_dl[bi]


class TestBlockSkyline:
    @given(st.lists(st.tuples(st.integers(1, 50), st.integers(1, 500)),
                    min_size=1, max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_skyline_bound_tight_and_valid(self, pairs):
        from ir_spark.codec import block_skyline

        tfs = np.array([p[0] for p in pairs], dtype=np.int64)
        dls = np.array([p[1] for p in pairs], dtype=np.int64)
        sky_idx, sky_tf, sky_dl = block_skyline(tfs, dls, block=128)
        # every skyline pair is a real posting of its block
        for bi, t, d in zip(sky_idx, sky_tf, sky_dl):
            blk = slice(bi * 128, (bi + 1) * 128)
            assert ((tfs[blk] == t) & (dls[blk] == d)).any()
        # dominance: every posting is covered by a same-block skyline
        # pair with tf >= and dl <= (so any monotone weight is bounded)
        for i, (t, d) in enumerate(zip(tfs, dls)):
            bi = i // 128
            covered = any(st_ >= t and sd <= d
                          for sb, st_, sd in zip(sky_idx, sky_tf, sky_dl)
                          if sb == bi)
            assert covered, (i, t, d)


class TestEliasCodes:
    """C2/C3 parity codecs (gamma/delta, codec.py) — round-trip +
    known bit patterns + analytic size identity."""

    def test_known_bits(self):
        from ir_spark.codec import elias_delta_encode, elias_gamma_encode

        assert elias_gamma_encode([1])[4:] == bytes([0b10000000])
        assert elias_gamma_encode([4])[4:] == bytes([0b00100000])
        # delta(4): gamma(L=3)='011' + payload '00'
        assert elias_delta_encode([4])[4:] == bytes([0b01100000])

    def test_empty(self):
        from ir_spark.codec import (
            elias_delta_decode,
            elias_delta_encode,
            elias_gamma_decode,
            elias_gamma_encode,
        )

        assert elias_gamma_decode(elias_gamma_encode([])).size == 0
        assert elias_delta_decode(elias_delta_encode([])).size == 0

    def test_rejects_zero(self):
        from ir_spark.codec import elias_delta_encode, elias_gamma_encode

        with pytest.raises(ValueError):
            elias_gamma_encode([0])
        with pytest.raises(ValueError):
            elias_delta_encode([3, 0])

    @given(st.lists(st.integers(min_value=1, max_value=2**50), max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_roundtrip(self, values):
        from ir_spark.codec import (
            elias_delta_decode,
            elias_delta_encode,
            elias_gamma_decode,
            elias_gamma_encode,
        )

        assert elias_gamma_decode(
            elias_gamma_encode(values)).tolist() == values
        assert elias_delta_decode(
            elias_delta_encode(values)).tolist() == values

    @given(st.lists(st.integers(min_value=1, max_value=2**50), min_size=1,
                    max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_size_identity(self, values):
        from ir_spark.codec import (
            elias_delta_encode,
            elias_gamma_encode,
            elias_size_bits,
        )

        gb, db = elias_size_bits(values)
        assert gb == sum(2 * v.bit_length() - 1 for v in values)
        assert db == sum(2 * v.bit_length().bit_length() - 1
                         + v.bit_length() - 1 for v in values)
        assert len(elias_gamma_encode(values)) == 4 + (gb + 7) // 8
        assert len(elias_delta_encode(values)) == 4 + (db + 7) // 8


def test_frontcode_roundtrip_property():
    """Blocked front-coding round-trips arbitrary sorted vocabularies
    at several block sizes, including unicode terms, empty strings,
    shared-prefix runs, and a final partial block (quirk Q7's bugs)."""
    import random

    from ir_spark.codec import dict_size_bytes, frontcode_decode, frontcode_encode

    rng = random.Random(7)
    vocab = set()
    for _ in range(500):
        base = "".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 6)))
        vocab.add(base)
        vocab.add(base + "ing")
        vocab.add(base + "ed")
    vocab.add("")
    vocab.add("naïve-zürich")  # multi-byte utf-8
    terms = sorted(vocab)
    for k in (1, 2, 8, 64):
        blob = frontcode_encode(terms, k)
        assert frontcode_decode(blob) == terms, k
    sizes = dict_size_bytes(terms)
    # shared-prefix vocabularies must actually compress
    assert sizes["frontcoded_bytes"] < sizes["length_prefixed_bytes"]
    assert sizes["length_prefixed_bytes"] < sizes["fixed_width_bytes"]


def test_frontcode_empty():
    from ir_spark.codec import frontcode_decode, frontcode_encode

    assert frontcode_decode(frontcode_encode([])) == []


def test_batch_codecs_equal_per_row():
    """varbyte_encode_batch / delta_encode_batch must be byte-identical
    to the per-run codecs for adversarial shapes (tiny runs, huge
    values, single-value runs)."""
    import numpy as np

    from ir_spark import codec

    rng = np.random.default_rng(7)
    sizes = np.array([1, 1, 3, 128, 129, 2, 1000, 1])
    rows = []
    base = 0
    for n in sizes:
        ids = base + np.sort(rng.choice(10**6, n, replace=False))
        base = 0  # runs restart their id space (absolute first id)
        rows.append((ids.astype(np.int64),
                     rng.integers(0, 2**40, n).astype(np.int64)))
    splits = np.cumsum(sizes)
    ids_all = np.concatenate([r[0] for r in rows])
    v_all = np.concatenate([r[1] for r in rows])
    b_gaps = codec.delta_encode_batch(ids_all, splits)
    b_vals = codec.varbyte_encode_batch(v_all, splits)
    for i, (ids, v) in enumerate(rows):
        assert b_gaps[i] == codec.delta_encode(ids)
        assert b_vals[i] == codec.varbyte_encode(v)
        assert (codec.delta_decode(b_gaps[i]) == ids).all()
        assert (codec.varbyte_decode(b_vals[i])
                == v.astype(np.uint64)).all()
    # non-ascending WITHIN a run raises; ascending-across-boundary not required
    bad = np.array([5, 4], dtype=np.int64)
    try:
        codec.delta_encode_batch(bad, np.array([2]))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    # empty batch
    assert codec.varbyte_encode_batch(
        np.array([], dtype=np.uint64), np.array([0, 0])) == [b"", b""]


def test_batch_block_stats_and_skyline_equal_scalar():
    import numpy as np

    from ir_spark import codec

    rng = np.random.default_rng(19)
    sizes = np.concatenate([
        [1, 1, 2, 127, 128, 129, 255, 256, 300, 2048],
        np.clip((rng.pareto(1.2, 500) * 8).astype(int) + 1, 1, 2048)])
    rows = []
    for n in sizes:
        ids = np.sort(rng.choice(10**6, int(n), replace=False)).astype(np.int64)
        rows.append((ids, rng.integers(1, 50, int(n)).astype(np.int64),
                     rng.integers(20, 400, int(n)).astype(np.int64)))
    ids_all = np.concatenate([r[0] for r in rows])
    tf_all = np.concatenate([r[1] for r in rows])
    dl_all = np.concatenate([r[2] for r in rows])
    nb, (last, mtf, mdl) = codec.block_stats_batch(
        ids_all, tf_all, dl_all, sizes)
    pts, sblk, stf, sdl = codec.block_skyline_batch(tf_all, dl_all, sizes)
    b_off = np.cumsum(nb)
    p_off = np.cumsum(pts)
    for i, (ids, tf, dl) in enumerate(rows):
        l0, m0, d0 = codec.block_stats(ids, tf, dl)
        s0, t0, dl0 = codec.block_skyline(tf, dl)
        bs, be = (b_off[i - 1] if i else 0), b_off[i]
        ps, pe = (p_off[i - 1] if i else 0), p_off[i]
        assert (last[bs:be] == l0).all() and (mtf[bs:be] == m0).all() \
            and (mdl[bs:be] == d0).all(), i
        assert (sblk[ps:pe] == s0).all() and (stf[ps:pe] == t0).all() \
            and (sdl[ps:pe] == dl0).all(), i


class TestInterpolative:
    """Binary interpolative coding (Moffat & Stuehler 2000)."""

    def test_empty_and_singleton(self):
        from ir_spark.codec import interpolative_decode, interpolative_encode

        assert interpolative_decode(interpolative_encode([])).size == 0
        assert interpolative_decode(
            interpolative_encode([7])).tolist() == [7]

    def test_dense_range_needs_zero_payload_bits(self):
        from ir_spark.codec import interpolative_encode

        # [0..n-1] is fully dense: header only (n + hi), no code bits
        blob = interpolative_encode(list(range(100)))
        assert len(blob) == 4 + 8

    def test_rejects_non_increasing(self):
        from ir_spark.codec import interpolative_encode

        with pytest.raises(ValueError):
            interpolative_encode([3, 3])
        with pytest.raises(ValueError):
            interpolative_encode([5, 2])
        with pytest.raises(ValueError):
            interpolative_encode([-1, 2])

    @given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=400))
    @settings(max_examples=100, deadline=None)
    def test_roundtrip(self, ids):
        from ir_spark.codec import interpolative_decode, interpolative_encode

        s = sorted(ids)
        assert interpolative_decode(interpolative_encode(s)).tolist() == s

    def test_beats_gamma_on_clustered_ids(self):
        """The reason BIC exists: clustered doc ids (the web's head
        terms) cost near-zero bits."""
        import numpy as np

        from ir_spark.codec import elias_gamma_encode, interpolative_encode

        rng = np.random.default_rng(7)
        # 2000 ids clustered into a few dense runs across a 10^7 space
        starts = rng.integers(0, 10**7, size=10)
        ids = np.unique(np.concatenate(
            [np.arange(s, s + 200) for s in starts]))
        gaps = np.diff(np.concatenate(([-1], ids)))  # all >= 1
        interp = len(interpolative_encode(ids)) - 12
        gamma = len(elias_gamma_encode(gaps)) - 4
        # gamma codes a unit gap in 1 bit, so dense runs are cheap for
        # both; BIC still wins because aligned dense sub-ranges cost 0
        assert interp < gamma, (interp, gamma)


class TestSimple9:
    """Word-aligned Simple-9 (Anh & Moffat 2005)."""

    def test_empty_and_singleton(self):
        from ir_spark.codec import simple9_decode, simple9_encode

        assert simple9_decode(simple9_encode([])).size == 0
        assert simple9_decode(simple9_encode([0])).tolist() == [0]
        assert simple9_decode(simple9_encode([2**28 - 1])).tolist() == [2**28 - 1]

    def test_mode_table(self):
        from ir_spark.codec import SIMPLE9_MODES

        # the canonical 9 selectors, every mode fits the 28 payload bits
        assert len(SIMPLE9_MODES) == 9
        assert all(c * b <= 28 for c, b in SIMPLE9_MODES)
        assert (28, 1) in SIMPLE9_MODES and (1, 28) in SIMPLE9_MODES

    def test_dense_packing(self):
        from ir_spark.codec import simple9_encode

        # 28 one-bit values -> header + exactly ONE 32-bit word
        assert len(simple9_encode([1] * 28)) == 4 + 4
        # 29 -> two words (28 + partial 1)
        assert len(simple9_encode([1] * 29)) == 4 + 8

    def test_rejects_over_28_bits(self):
        from ir_spark.codec import simple9_encode

        with pytest.raises(ValueError):
            simple9_encode([1 << 28])

    @given(st.lists(st.integers(min_value=0, max_value=2**28 - 1),
                    max_size=300))
    @settings(max_examples=150, deadline=None)
    def test_roundtrip(self, values):
        from ir_spark.codec import simple9_decode, simple9_encode

        assert simple9_decode(simple9_encode(values)).tolist() == values

    def test_beats_varbyte_on_small_gaps(self):
        from ir_spark.codec import simple9_encode, varbyte_encode

        rng = np.random.default_rng(7)
        gaps = rng.integers(1, 8, size=10_000, dtype=np.uint64)
        s9 = len(simple9_encode(gaps)) - 4
        vb = len(varbyte_encode(gaps))
        assert s9 < vb  # ~3 bits vs 8 bits per gap

    def test_large_roundtrip_mixed_widths(self):
        from ir_spark.codec import simple9_decode, simple9_encode

        rng = np.random.default_rng(11)
        # mix widths so every selector class appears
        parts = [rng.integers(0, 2**b, size=5000, dtype=np.uint64)
                 for b in (1, 2, 3, 4, 5, 7, 9, 14, 28)]
        v = np.concatenate(parts)
        rng.shuffle(v)
        assert (simple9_decode(simple9_encode(v)) == v).all()


class TestEliasFano:
    """Quasi-succinct Elias-Fano (Vigna 2013)."""

    def test_empty_and_singleton(self):
        from ir_spark.codec import elias_fano_decode, elias_fano_encode

        assert elias_fano_decode(elias_fano_encode([])).size == 0
        assert elias_fano_decode(elias_fano_encode([0])).tolist() == [0]
        assert elias_fano_decode(elias_fano_encode([7])).tolist() == [7]

    def test_accepts_duplicates_rejects_decreasing(self):
        from ir_spark.codec import elias_fano_decode, elias_fano_encode

        # EF is defined on NON-DECREASING sequences (unlike BIC)
        assert elias_fano_decode(
            elias_fano_encode([3, 3, 3])).tolist() == [3, 3, 3]
        with pytest.raises(ValueError):
            elias_fano_encode([5, 2])

    @given(st.lists(st.integers(min_value=0, max_value=2**40),
                    max_size=400))
    @settings(max_examples=100, deadline=None)
    def test_roundtrip(self, ids):
        from ir_spark.codec import elias_fano_decode, elias_fano_encode

        s = sorted(ids)
        assert elias_fano_decode(elias_fano_encode(s)).tolist() == s

    def test_size_is_distribution_free_and_near_optimal(self):
        """EF's defining property: size depends only on (n, universe)
        — clustered and adversarially-spread ids of the same span cost
        IDENTICAL bytes, within n*(l+2) bits."""
        import numpy as np

        from ir_spark.codec import (elias_fano_encode,
                                    elias_fano_size_bits)

        rng = np.random.default_rng(11)
        n, hi = 2000, 10**7
        spread = np.sort(rng.choice(hi, size=n - 1, replace=False))
        spread = np.concatenate((spread, [hi]))  # pin the universe
        clustered = np.unique(np.concatenate(
            [np.arange(s, s + 250) for s in
             rng.integers(0, hi - 250, size=10)]))[:n - 1]
        assert clustered.size == n - 1
        clustered = np.concatenate((clustered, [hi]))
        b_spread = len(elias_fano_encode(spread))
        b_clustered = len(elias_fano_encode(clustered))
        assert b_spread == b_clustered, (b_spread, b_clustered)
        bits = elias_fano_size_bits(n, hi)
        l = max(0, ((hi + 1) // n).bit_length() - 1)
        # classic bound: <= 2 + ceil(log2(u/n)) bits/el, i.e. l+3 when
        # log2(u/n) is fractional
        assert bits <= n * (l + 3) + 1
        # analytic size matches the real blob (header + byte padding)
        hi_bytes = (n + (hi >> l) + 1 + 7) // 8
        lo_bytes = (n * l + 7) // 8
        assert b_spread == 13 + hi_bytes + lo_bytes

    def test_beats_varbyte_on_dense_lists(self):
        """Head-term lists (df ~ N) cost ~2 bits/posting in EF vs >= 8
        in any byte-aligned gap code."""
        from ir_spark.codec import elias_fano_encode, varbyte_encode

        ids = list(range(0, 60000, 2))  # every other doc
        ef = len(elias_fano_encode(ids)) - 13
        import numpy as np
        vb = len(varbyte_encode(np.diff(np.asarray(ids),
                                        prepend=-2).astype(np.int64)))
        assert ef * 2 < vb, (ef, vb)  # ~3 bits/el vs 8


class TestNewPFD:
    """NewPFD patched bit-packing (codec.py::pfor_encode/pfor_decode)."""

    def test_empty_and_singleton(self):
        from ir_spark.codec import pfor_decode, pfor_encode

        assert pfor_decode(pfor_encode([])).tolist() == []
        assert pfor_decode(pfor_encode([0])).tolist() == [0]
        assert pfor_decode(pfor_encode([2**32 - 1])).tolist() == [2**32 - 1]

    def test_rejects_over_32_bits(self):
        from ir_spark.codec import pfor_encode

        with pytest.raises(ValueError):
            pfor_encode([1 << 32])

    @given(st.lists(st.integers(min_value=0, max_value=2**32 - 1),
                    max_size=300))
    @settings(max_examples=150, deadline=None)
    def test_roundtrip(self, values):
        from ir_spark.codec import pfor_decode, pfor_encode

        assert pfor_decode(pfor_encode(values)).tolist() == values

    def test_outlier_does_not_widen_block(self):
        """The frame-of-reference failure NewPFD exists to fix: one
        2^30 gap among small gaps must not force 30-bit slots."""
        from ir_spark.codec import pfor_encode

        small = [5] * 127
        plain = len(pfor_encode(small + [5]))
        patched = len(pfor_encode(small + [2**30]))
        # exception adds a few bytes, NOT (30-3)*128/8 = 432 bytes
        assert patched - plain < 16

    def test_beats_varbyte_on_narrow_gaps(self):
        from ir_spark.codec import pfor_encode, varbyte_encode

        rng = np.random.default_rng(11)
        gaps = rng.integers(1, 64, size=10_000).astype(np.uint64)
        gaps[rng.integers(0, gaps.size, 50)] = 2**29  # 0.5% outliers
        assert len(pfor_encode(gaps)) < len(varbyte_encode(gaps))

    def test_multi_block_partial_tail(self):
        from ir_spark.codec import pfor_decode, pfor_encode

        v = list(range(128 * 3 + 17))
        assert pfor_decode(pfor_encode(v)).tolist() == v


class TestRoaring:
    """Roaring bitmaps (codec.py::roaring_encode/decode/contains)."""

    def test_empty_and_extremes(self):
        from ir_spark.codec import roaring_decode, roaring_encode

        assert roaring_decode(roaring_encode([])).tolist() == []
        assert roaring_decode(roaring_encode([0])).tolist() == [0]
        assert roaring_decode(
            roaring_encode([2**32 - 1])).tolist() == [2**32 - 1]

    def test_rejects_bad_input(self):
        from ir_spark.codec import roaring_encode

        with pytest.raises(ValueError):
            roaring_encode([1 << 32])
        with pytest.raises(ValueError):
            roaring_encode([5, 5])  # not strictly increasing
        with pytest.raises(ValueError):
            roaring_encode([9, 3])

    @given(st.sets(st.integers(min_value=0, max_value=2**18),
                   max_size=400))
    @settings(max_examples=100, deadline=None)
    def test_roundtrip(self, ids):
        from ir_spark.codec import roaring_decode, roaring_encode

        v = sorted(ids)
        assert roaring_decode(roaring_encode(v)).tolist() == v

    def test_container_selection(self):
        """Each chunk independently picks its cheapest container."""
        from ir_spark.codec import roaring_encode

        # consecutive run -> run container: 4-byte header + 5-byte
        # container head + 2 + 4 bytes, NOT 2*60000
        assert len(roaring_encode(np.arange(60000))) < 20
        # 50% random fill -> bitmap: 8192 + heads, NOT 2*32768
        rng = np.random.default_rng(5)
        dense = np.sort(rng.choice(65536, 32768, replace=False))
        assert len(roaring_encode(dense)) < 8210
        # sparse -> array: 2 bytes per id
        sparse = np.sort(rng.choice(65536, 64, replace=False))
        assert len(roaring_encode(sparse)) <= 4 + 5 + 2 * 64

    def test_multi_chunk_boundary(self):
        from ir_spark.codec import roaring_decode, roaring_encode

        v = [65534, 65535, 65536, 65537, 131072, 2**31, 2**31 + 1]
        assert roaring_decode(roaring_encode(v)).tolist() == v

    @given(st.sets(st.integers(min_value=0, max_value=200000),
                   min_size=1, max_size=300),
           st.sets(st.integers(min_value=0, max_value=200000),
                   max_size=100))
    @settings(max_examples=60, deadline=None)
    def test_contains_matches_set_semantics(self, members, probes):
        from ir_spark.codec import roaring_contains, roaring_encode

        buf = roaring_encode(sorted(members))
        got = roaring_contains(buf, sorted(probes))
        assert got.tolist() == [p in members for p in sorted(probes)]

    def test_contains_per_container_types(self):
        """Probe a buffer holding all three container types at once."""
        from ir_spark.codec import roaring_contains, roaring_encode

        rng = np.random.default_rng(9)
        run = np.arange(10, 5000)                           # chunk 0: run
        bmp = np.sort(rng.choice(65536, 30000,
                                 replace=False)) + 65536    # chunk 1: bitmap
        arr = np.sort(rng.choice(65536, 50,
                                 replace=False)) + 131072   # chunk 2: array
        all_ids = np.concatenate([run, bmp, arr]).astype(np.uint64)
        buf = roaring_encode(all_ids)
        assert roaring_contains(buf, all_ids).all()
        absent = np.array([0, 5001, 9, 400000], dtype=np.uint64)
        assert not roaring_contains(buf, absent).any()


def test_batch_codecs_empty_runs():
    """Empty runs anywhere in the batch (incl. trailing) must yield
    b'' — run-start positions of empty runs repeat or point one past
    the data and previously crashed the trailing case."""
    import numpy as np

    from ir_spark.codec import (delta_encode, delta_encode_batch,
                                varbyte_encode, varbyte_encode_batch)

    assert delta_encode_batch(np.array([5, 9]), np.array([2, 2])) == \
        [delta_encode([5, 9]), b""]
    assert delta_encode_batch(np.array([5, 9, 3, 4]),
                              np.array([2, 2, 4])) == \
        [delta_encode([5, 9]), b"", delta_encode([3, 4])]
    assert delta_encode_batch(np.array([], dtype=np.int64),
                              np.array([0, 0])) == [b"", b""]
    assert varbyte_encode_batch(np.array([7], dtype=np.uint64),
                                np.array([0, 1])) == \
        [b"", varbyte_encode([7])]
