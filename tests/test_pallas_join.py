"""Pallas tile-join: bit-exact parity vs the host oracle (interpreter).

The Mosaic-compiled path is exercised on real TPU hardware by
bench.py and the pipelines; here the same kernels run under the
Pallas interpreter on the CPU test mesh and must match the pure
Python/numpy oracle exactly.
"""

from collections import Counter

import numpy as np
import pytest

import jax.numpy as jnp

from kmer_denovo_filter_tpu import engine as eng
from kmer_denovo_filter_tpu.ops import device as dev
from kmer_denovo_filter_tpu.ops import pallas_join as pj


def _reads(n, length, k, with_n=True, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=(n, length), dtype=np.uint8)
    if with_n:
        codes[rng.random((n, length)) < 0.02] = 4
    lengths = rng.integers(k, length + 1, size=n).astype(np.int32)
    return codes, lengths


def _window_keys64(codes, lengths, k):
    """Oracle canonical window keys via the validated device op."""
    codes_p, lens_p = eng.pad_read_batch(codes, lengths)
    keys, valid = dev.extract_canonical_windows(
        jnp.asarray(codes_p), jnp.asarray(lens_p), k)
    keys = np.asarray(keys)
    valid = np.asarray(valid)
    k64 = (keys[:, :, 0].astype(np.uint64) << 32) | keys[:, :, 1]
    return codes_p, lens_p, k64, valid


def _table_from_reads(k, seed):
    codes, lengths = _reads(80, 64, k, with_n=False, seed=seed)
    _cp, _lp, k64, valid = _window_keys64(codes, lengths, k)
    return np.unique(k64[valid])


def _split_words(k64):
    return np.stack([(k64 >> np.uint64(32)).astype(np.uint32),
                     k64.astype(np.uint32)], axis=1)


@pytest.mark.parametrize("k", [17, 31])
def test_join_tally_matches_oracle(k):
    table64 = _table_from_reads(k, seed=3)
    table = _split_words(table64)
    t0, t1, perm, p = pj.build_tile_partitions(table)

    codes, lengths = _reads(96, 64, k, seed=4)
    # splice some table-origin reads in so real hits exist
    tc, tl = _reads(80, 64, k, with_n=False, seed=3)
    codes[:40] = tc[:40]
    lengths[:40] = tl[:40]
    codes_p, lens_p, k64, valid = _window_keys64(codes, lengths, k)

    acc0 = jnp.zeros(t0.shape, jnp.int32)
    acc, ovf = pj.join_tally_step(
        jnp.asarray(t0), jnp.asarray(t1), acc0,
        jnp.asarray(codes_p), jnp.asarray(lens_p), k, p,
        interpret=True)
    assert not bool(ovf)

    counts = Counter(k64[valid].tolist())
    expected = np.array([counts.get(int(v), 0) for v in table64],
                        dtype=np.int64)
    got = np.zeros(table.shape[0], dtype=np.int64)
    cells = np.asarray(acc)[:perm.shape[0]]
    ok = perm >= 0
    got[perm[ok]] = cells[ok]
    assert (expected > 0).sum() > 0  # the test has real overlap
    assert np.array_equal(got, expected)


@pytest.mark.parametrize("k", [31])
def test_join_member_matches_oracle(k):
    table64 = _table_from_reads(k, seed=5)
    table = _split_words(table64)
    t0, t1, _perm, p = pj.build_tile_partitions(table)

    codes, lengths = _reads(64, 64, k, seed=6)
    tc, tl = _reads(80, 64, k, with_n=False, seed=5)
    codes[:20] = tc[:20]
    lengths[:20] = tl[:20]
    codes_p, lens_p, k64, valid = _window_keys64(codes, lengths, k)

    found, ovf = pj.join_member_step(
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(codes_p),
        jnp.asarray(lens_p), k, p, interpret=True)
    assert not bool(ovf)
    found = np.asarray(found)

    tset = set(table64.tolist())
    expected = np.zeros_like(found)
    bb, ss = valid.shape
    for b in range(bb):
        for s in range(ss):
            if valid[b, s]:
                expected[b, s] = int(k64[b, s]) in tset
    assert expected.any()
    assert np.array_equal(found, expected)


def test_join_overflow_flag_on_tiny_window():
    """A 1-partition window cannot cover a many-partition batch."""
    k = 31
    table64 = _table_from_reads(k, seed=7)
    table = _split_words(table64)
    # force many partitions so chunks span > w_part
    t0, t1, _perm, p = pj.build_tile_partitions(table, p=4096)
    codes, lengths = _reads(64, 64, k, seed=8)
    codes_p, lens_p, _k64, _valid = _window_keys64(codes, lengths, k)
    acc0 = jnp.zeros(t0.shape, jnp.int32)
    _acc, ovf = pj.join_tally_step(
        jnp.asarray(t0), jnp.asarray(t1), acc0,
        jnp.asarray(codes_p), jnp.asarray(lens_p), k, p,
        w_part=16, interpret=True)
    assert bool(ovf)


def test_homopolymer_batch_single_partition():
    """All-identical k-mers land in one partition; spans stay tiny and
    the tally equals the total valid window count."""
    k = 17
    codes = np.zeros((8, 64), dtype=np.uint8)  # poly-A
    lengths = np.full(8, 64, dtype=np.int32)
    codes_p, lens_p, k64, valid = _window_keys64(codes, lengths, k)
    key = np.unique(k64[valid])
    assert key.shape[0] == 1
    table = _split_words(key)
    t0, t1, perm, p = pj.build_tile_partitions(table)
    acc0 = jnp.zeros(t0.shape, jnp.int32)
    acc, ovf = pj.join_tally_step(
        jnp.asarray(t0), jnp.asarray(t1), acc0,
        jnp.asarray(codes_p), jnp.asarray(lens_p), k, p,
        interpret=True)
    assert not bool(ovf)
    cells = np.asarray(acc)[:perm.shape[0]]
    assert cells[perm >= 0].sum() == int(valid.sum())


def test_build_tile_partitions_grows_on_hot_tile():
    """>1024 identical-hash keys force a partition-count doubling."""
    rng = np.random.default_rng(0)
    k64 = np.unique(rng.integers(0, 2**62, size=3000,
                                 dtype=np.uint64))
    table = _split_words(k64)
    t0, t1, perm, p = pj.build_tile_partitions(table, p=1)
    # p=1 puts all 3000 keys in one tile (>1024) → doubled until fit
    assert p >= 4
    assert (perm >= 0).sum() == table.shape[0]


# ── Mixed-key routing internals (round 2) ───────────────────────────


def test_mix_keys_bijective_roundtrip():
    """The Feistel mix must be exactly invertible (pair-equality ⟺
    raw-equality is what lets planes hold mixed words)."""
    rng = np.random.default_rng(11)
    w0 = rng.integers(0, 2**32, 4096, dtype=np.uint32)
    w1 = rng.integers(0, 2**32, 4096, dtype=np.uint32)
    h, low = pj.mix_keys_np(w0, w1)
    r0, r1 = pj._unmix_pair_np(h, low)
    assert np.array_equal(r0, w0)
    assert np.array_equal(r1, w1)
    # no fixed-point degeneracies: mixed words differ from raw ones
    assert (h != w0).mean() > 0.99


def test_device_mix_matches_host_mix():
    rng = np.random.default_rng(12)
    w0 = rng.integers(0, 2**32, 2048, dtype=np.uint32)
    w1 = rng.integers(0, 2**32, 2048, dtype=np.uint32)
    hh, ll = pj._mix_keys(jnp.asarray(w0), jnp.asarray(w1))
    h, low = pj.mix_keys_np(w0, w1)
    assert np.array_equal(np.asarray(hh), h)
    assert np.array_equal(np.asarray(ll), low)


def test_sentinel_preimage_outside_keyspace():
    """No valid left-aligned W==2 key (low w1 bits clear) can mix to
    the all-ones sentinel pair."""
    s = np.array([pj.SENTINEL])
    _h0, l0 = pj._unmix_pair_np(s, s)
    assert int(l0[0]) & 3 != 0


@pytest.mark.parametrize("p", [1, 3, 7, 777, 21851, 65535, 1 << 17])
def test_part_from_hi_matches_exact_scale(p):
    """Both host and device partition maps must equal the exact
    uint64 fixed-point scale floor(hi·p / 2^32) and be monotone."""
    rng = np.random.default_rng(13)
    hi = np.sort(np.concatenate([
        rng.integers(0, 2**32, 4096, dtype=np.uint32),
        np.array([0, 1, 2**31, 2**32 - 2, 2**32 - 1], dtype=np.uint32),
    ]))
    exact = ((hi.astype(np.uint64) * np.uint64(p))
             >> np.uint64(32)).astype(np.int64)
    got = pj._part_from_hi_np(hi, p)
    assert np.array_equal(got, exact)
    assert got.max() < p and got.min() >= 0
    assert (np.diff(got) >= 0).all()  # monotone in hi
    dev_got = np.asarray(pj._part_from_hi(jnp.asarray(hi), p))
    assert np.array_equal(dev_got, exact)


def test_part_from_hi_large_non_pow2_rejected():
    hi = np.zeros(4, dtype=np.uint32)
    with pytest.raises(ValueError):
        pj._part_from_hi_np(hi, (1 << 17) + 1)


def test_num_partitions_pow2_above_16bit():
    # small tables: exact ceil(m / MEAN_FILL)
    assert pj.num_partitions(pj.MEAN_FILL * 10) == 10
    # beyond the 16-bit fixed-point range: forced to a power of two
    m_big = pj.MEAN_FILL * 100_000
    p = pj.num_partitions(m_big)
    assert p > 0xFFFF and p & (p - 1) == 0
    assert p * pj.TILE_KEYS >= m_big  # still roomy enough to fit
    # growth helper keeps the pow2 invariant across the boundary
    g = pj._grow_p(0xFFFF)
    assert g > 0xFFFF and g & (g - 1) == 0


def test_build_tile_partitions_pow2_path():
    """The >2^16 power-of-two partition map places every key at the
    slot the device map would route it to, with mixed words stored."""
    k = 31
    table64 = _table_from_reads(k, seed=9)
    table = _split_words(table64)
    t0, t1, perm, p = pj.build_tile_partitions(table, p=1 << 17)
    assert p == 1 << 17
    h, low = pj.mix_keys_np(table[:, 0], table[:, 1])
    part = pj._part_from_hi_np(h, p)
    ok = perm >= 0
    rows = np.nonzero(ok)[0]
    # every key sits in its own partition row, holding mixed words
    orig = perm[ok]
    assert np.array_equal(part[orig], rows)
    assert np.array_equal(t0[:p][ok], h[orig])
    assert np.array_equal(t1[:p][ok], low[orig])
    # device map agrees with the host placement
    dev_part = np.asarray(pj._part_from_hi(jnp.asarray(h), p))
    assert np.array_equal(dev_part, part)


def test_member_unsort_with_duplicate_keys():
    """Duplicate window keys across reads must all unsort to their own
    rows (the packed-LSB unsort has no per-key collapsing)."""
    k = 17
    codes, lengths = _reads(12, 48, k, with_n=False, seed=14)
    codes[6:] = codes[:6]  # exact duplicate reads
    lengths[6:] = lengths[:6]
    codes_p, lens_p, k64, valid = _window_keys64(codes, lengths, k)
    tset64 = np.unique(k64[valid])[::3]  # every third key a member
    table = _split_words(tset64)
    t0, t1, _perm, p = pj.build_tile_partitions(table)
    found, ovf = pj.join_member_step(
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(codes_p),
        jnp.asarray(lens_p), k, p, interpret=True)
    assert not bool(ovf)
    found = np.asarray(found)
    tset = set(tset64.tolist())
    bb, ss = valid.shape
    expected = np.zeros_like(found)
    for b in range(bb):
        for s in range(ss):
            if valid[b, s]:
                expected[b, s] = int(k64[b, s]) in tset
    assert expected.any()
    assert np.array_equal(found, expected)
    # duplicate halves agree row-for-row (batch is padded past row 12)
    assert np.array_equal(found[0:6], found[6:12])
    assert found[0:6].any()


# ── Generic-W tile-join (k > 31) ────────────────────────────────────

class TestWideTileJoin:
    def _setup(self, k, monkeypatch):
        from tests.test_engine import (oracle_counts, pack_reads,
                                       random_reads)
        monkeypatch.setenv("KDF_PALLAS_INTERPRET", "1")
        monkeypatch.setattr(eng, "_SMALL_TABLE_M", 0)
        table_reads = random_reads(40, 96, with_n=False, seed=k)
        kmers = sorted({km for s in table_reads
                        for km in oracle_counts([s], k)})
        from kmer_denovo_filter_tpu.ops import encode as enc
        keys = enc.kmers_to_keys(kmers, k)
        index = eng.KmerIndex(keys, k)
        index.small = False
        index.mid = True
        batch = (random_reads(30, 96, seed=k + 1)
                 + table_reads[:8])
        codes, lengths = pack_reads(batch)
        return index, keys, codes, lengths, batch

    @pytest.mark.parametrize("k", [33, 63])
    def test_wide_tally_matches_oracle(self, k, monkeypatch):
        from tests.test_engine import _expected_tally
        index, keys, codes, lengths, batch = self._setup(k, monkeypatch)
        fc = eng.FilteredCounter(index)
        assert fc.pallas_wide and not fc.pallas
        fc.feed(codes, lengths)
        fc.feed(codes, lengths)
        got = fc.result()
        expected = _expected_tally(batch, keys, k) * 2
        assert np.array_equal(got, expected)
        assert expected.sum() > 0

    @pytest.mark.parametrize("k", [33, 63])
    def test_wide_member_matches_xla(self, k, monkeypatch):
        index, _keys, codes, lengths, _batch = self._setup(
            k, monkeypatch)
        got = eng.scan_reads_for_hits(index, codes, lengths)
        monkeypatch.setenv("KDF_PALLAS_INTERPRET", "0")
        monkeypatch.setenv("KDF_NO_PALLAS", "1")
        expected = eng.scan_reads_for_hits(index, codes, lengths)
        assert np.array_equal(got, expected)
        assert expected.any()

    def test_wide_sparse_batch_host_fallback(self, monkeypatch):
        """Sparse wide-key batches take the exact host tally too."""
        from kmer_denovo_filter_tpu.ops import encode as enc
        from tests.test_engine import (_expected_tally, pack_reads,
                                       random_reads)
        k = 33
        index, keys, _c, _l, _b = self._setup(k, monkeypatch)
        planes, perm, p = pj.build_tile_partitions_wide(
            index.keys_np, p=2 * pj.MAX_W_PART_TALLY + 128)
        import jax.numpy as jnp
        index._tile_parts_wide = (
            tuple(jnp.asarray(planes[j])
                  for j in range(planes.shape[0])), perm, p)
        fc = eng.FilteredCounter(index)
        fc.w_part = pj.MAX_W_PART_TALLY
        sparse = random_reads(2, 40, with_n=False, seed=9) + [
            enc.keys_to_kmers(keys[:1], k)[0]]
        codes, lengths = pack_reads(sparse)
        fc.feed(codes, lengths)
        got = fc.result()
        assert fc._host_corr is not None
        assert np.array_equal(got, _expected_tally(sparse, keys, k))


# ── Dedup-first tally (round 4) ─────────────────────────────────────


class TestDedupTally:
    def test_dedup_compact_exact_runs(self):
        """Compacted (key, weight) rows must equal the per-chunk
        sorted run-length encoding, with zero weights past u_c."""
        rng = np.random.default_rng(13)
        n = 2 * pj.LCHUNK_DD
        # low-entropy valid keys (w1 low bits clear) so runs are long
        w0 = (rng.integers(0, 64, n, dtype=np.uint32)
              << np.uint32(20))
        w1 = (rng.integers(0, 4, n, dtype=np.uint32)
              << np.uint32(20))
        h, lo = pj.mix_keys_np(w0, w1)
        u_chunk = 1024
        hc, lc, wc, ovf = pj._dedup_compact(
            jnp.asarray(h), jnp.asarray(lo), u_chunk)
        assert not bool(ovf)
        hc = np.asarray(hc).reshape(2, u_chunk)
        lc = np.asarray(lc).reshape(2, u_chunk)
        wc = np.asarray(wc).reshape(2, u_chunk)
        for c in range(2):
            sh = h[c * pj.LCHUNK_DD:(c + 1) * pj.LCHUNK_DD]
            sl = lo[c * pj.LCHUNK_DD:(c + 1) * pj.LCHUNK_DD]
            order = np.lexsort((sl, sh))
            sh, sl = sh[order], sl[order]
            st = np.concatenate(
                [[True], (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1])])
            uniq_h, uniq_l = sh[st], sl[st]
            counts = np.diff(np.concatenate(
                [np.nonzero(st)[0], [pj.LCHUNK_DD]]))
            u = uniq_h.shape[0]
            assert np.array_equal(hc[c, :u], uniq_h)
            assert np.array_equal(lc[c, :u], uniq_l)
            assert np.array_equal(wc[c, :u], counts)
            assert (wc[c, u:] == 0).all()

    def test_dedup_compact_overflow_flag(self):
        """More local uniques than u_chunk must raise the flag."""
        rng = np.random.default_rng(14)
        h = rng.integers(0, 2 ** 32, pj.LCHUNK_DD, dtype=np.uint32)
        lo = rng.integers(0, 2 ** 32, pj.LCHUNK_DD, dtype=np.uint32)
        _hc, _lc, _wc, ovf = pj._dedup_compact(
            jnp.asarray(h), jnp.asarray(lo), 256)
        assert bool(ovf)

    @pytest.mark.parametrize("k", [17, 31])
    def test_dedup_tally_matches_oracle(self, k):
        """join_tally_step_dedup must be bit-exact vs the oracle on a
        coverage-duplicated batch (the path's target workload)."""
        table64 = _table_from_reads(k, seed=3)
        table = _split_words(table64)
        t0, t1, perm, p = pj.build_tile_partitions(table)

        codes, lengths = _reads(96, 64, k, seed=4)
        tc, tl = _reads(80, 64, k, with_n=False, seed=3)
        codes[:40] = tc[:40]
        lengths[:40] = tl[:40]
        # duplicate reads → long dedup runs, exercising weights > 1
        codes = np.concatenate([codes, codes[:32]], axis=0)
        lengths = np.concatenate([lengths, lengths[:32]])
        codes_p, lens_p, k64, valid = _window_keys64(
            codes, lengths, k)

        acc0 = jnp.zeros(t0.shape, jnp.int32)
        acc, ovf_s, ovf_u = pj.join_tally_step_dedup(
            jnp.asarray(t0), jnp.asarray(t1), acc0,
            jnp.asarray(codes_p), jnp.asarray(lens_p), k, p,
            interpret=True)
        assert not bool(ovf_s) and not bool(ovf_u)

        counts = Counter(k64[valid].tolist())
        expected = np.array(
            [counts.get(int(v), 0) for v in table64], dtype=np.int64)
        got = np.zeros(table.shape[0], dtype=np.int64)
        cells = np.asarray(acc)[:perm.shape[0]]
        ok = perm >= 0
        got[perm[ok]] = cells[ok]
        assert (expected > 1).sum() > 0  # weights actually exercised
        assert np.array_equal(got, expected)

    def test_scanned_steps_match_sequential(self):
        """join_tally_steps_dedup (one-dispatch scan over NB batches)
        must produce the same accumulator as NB sequential calls."""
        k = 31
        table64 = _table_from_reads(k, seed=3)
        table = _split_words(table64)
        t0, t1, _perm, p = pj.build_tile_partitions(table)
        t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)

        nb = 3
        stacks = []
        for i in range(nb):
            codes, lengths = _reads(96, 64, k, seed=10 + i)
            tc, tl = _reads(80, 64, k, with_n=False, seed=3)
            codes[:40] = tc[:40]
            lengths[:40] = tl[:40]
            codes_p, lens_p = eng.pad_read_batch(codes, lengths)
            stacks.append((codes_p, lens_p))
        codes_nb = jnp.asarray(np.stack([c for c, _ in stacks]))
        lens_nb = jnp.asarray(np.stack([l for _, l in stacks]))

        acc = jnp.zeros(t0.shape, jnp.int32)
        for i in range(nb):
            acc, ovf_s, ovf_u = pj.join_tally_step_dedup(
                t0j, t1j, acc, codes_nb[i], lens_nb[i], k, p,
                interpret=True)
            assert not bool(ovf_s) and not bool(ovf_u)

        acc2, ovf_s, ovf_u = pj.join_tally_steps_dedup(
            t0j, t1j, jnp.zeros(t0.shape, jnp.int32), codes_nb,
            lens_nb, k, p, interpret=True)
        assert not bool(ovf_s) and not bool(ovf_u)
        assert np.array_equal(np.asarray(acc), np.asarray(acc2))

        # the super-batch join (per-batch dedup, one concatenated
        # weighted join) must also match exactly
        acc3, ovf_s, ovf_u = pj.join_tally_superbatch_dedup(
            t0j, t1j, jnp.zeros(t0.shape, jnp.int32), codes_nb,
            lens_nb, k, p, interpret=True)
        assert not bool(ovf_s) and not bool(ovf_u)
        assert np.array_equal(np.asarray(acc), np.asarray(acc3))

        # member super-batch: per-batch found masks must match the
        # sequential dedup member steps bit-for-bit
        refs = []
        for i in range(nb):
            fnd, ovf_s, ovf_u = pj.join_member_step_dedup(
                t0j, t1j, codes_nb[i], lens_nb[i], k, p,
                interpret=True)
            assert not bool(ovf_s) and not bool(ovf_u)
            refs.append(np.asarray(fnd))
        found_nb, ovf_s, ovf_u = pj.join_member_superbatch_dedup(
            t0j, t1j, codes_nb, lens_nb, k, p, interpret=True)
        assert not bool(ovf_s) and not bool(ovf_u)
        got = np.asarray(found_nb)
        for i in range(nb):
            assert np.array_equal(got[i], refs[i]), i

    def test_dedup_tally_overflow_flags(self):
        """u_chunk and w_part overflows must be separately flagged."""
        k = 31
        table64 = _table_from_reads(k, seed=7)
        table = _split_words(table64)
        codes, lengths = _reads(64, 64, k, seed=8)
        codes_p, lens_p, _k64, _valid = _window_keys64(
            codes, lengths, k)
        t0, t1, _perm, p = pj.build_tile_partitions(table)
        acc0 = jnp.zeros(t0.shape, jnp.int32)
        _acc, _ovf_s, ovf_u = pj.join_tally_step_dedup(
            jnp.asarray(t0), jnp.asarray(t1), acc0,
            jnp.asarray(codes_p), jnp.asarray(lens_p), k, p,
            u_chunk=8, interpret=True)
        assert bool(ovf_u)
        t0b, t1b, _permb, pb = pj.build_tile_partitions(table, p=4096)
        acc0b = jnp.zeros(t0b.shape, jnp.int32)
        _acc, ovf_s, _ovf_u = pj.join_tally_step_dedup(
            jnp.asarray(t0b), jnp.asarray(t1b), acc0b,
            jnp.asarray(codes_p), jnp.asarray(lens_p), k, pb,
            w_part=16, interpret=True)
        assert bool(ovf_s)


class TestDedupMember:
    def test_expand_by_rank_inverts_compaction(self):
        """out[i] = vals[i - d_i] for Lipschitz-1 non-decreasing d."""
        rng = np.random.default_rng(21)
        nloc, lc = 4, pj.LCHUNK_DD
        st = rng.random((nloc, lc)) < 0.3
        st[:, 0] = True
        rank = np.cumsum(st, axis=1).astype(np.int32)
        col = np.arange(lc, dtype=np.int32)[None, :]
        d = col - rank + 1
        vals = rng.integers(0, 1 << 30, (nloc, lc), dtype=np.int32)
        got = np.asarray(pj._expand_by_rank(
            jnp.asarray(vals), jnp.asarray(d)))
        expected = np.take_along_axis(vals, col - d, axis=1)
        assert np.array_equal(got, expected)

    @pytest.mark.parametrize("k", [17, 31])
    def test_dedup_member_matches_plain(self, k):
        table64 = _table_from_reads(k, seed=5)
        table = _split_words(table64)
        t0, t1, _perm, p = pj.build_tile_partitions(table)

        codes, lengths = _reads(64, 64, k, seed=6)
        tc, tl = _reads(80, 64, k, with_n=False, seed=5)
        codes[:20] = tc[:20]
        lengths[:20] = tl[:20]
        # duplicated reads → multi-row runs exercised
        codes = np.concatenate([codes, codes[:24]], axis=0)
        lengths = np.concatenate([lengths, lengths[:24]])
        codes_p, lens_p, _k64, _valid = _window_keys64(
            codes, lengths, k)

        f1, ov1 = pj.join_member_step(
            jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(codes_p),
            jnp.asarray(lens_p), k, p, interpret=True)
        f5, ovs, ovu = pj.join_member_step_dedup(
            jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(codes_p),
            jnp.asarray(lens_p), k, p, interpret=True)
        assert not bool(ov1) and not bool(ovs) and not bool(ovu)
        f1 = np.asarray(f1)
        assert f1.any()
        assert np.array_equal(f1, np.asarray(f5))

    def test_dedup_member_overflow_flags(self):
        k = 31
        table64 = _table_from_reads(k, seed=7)
        table = _split_words(table64)
        codes, lengths = _reads(64, 64, k, seed=8)
        codes_p, lens_p, _k64, _valid = _window_keys64(
            codes, lengths, k)
        t0, t1, _perm, p = pj.build_tile_partitions(table)
        _f, _ovs, ovu = pj.join_member_step_dedup(
            jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(codes_p),
            jnp.asarray(lens_p), k, p, u_chunk=8, interpret=True)
        assert bool(ovu)
        t0b, t1b, _permb, pb = pj.build_tile_partitions(table, p=4096)
        _f, ovs, _ovu = pj.join_member_step_dedup(
            jnp.asarray(t0b), jnp.asarray(t1b), jnp.asarray(codes_p),
            jnp.asarray(lens_p), k, pb, w_part=8, interpret=True)
        assert bool(ovs)


class TestDedupWide:
    def _wide_setup(self, k, w, seed=9):
        rng = np.random.default_rng(seed)
        codes, lengths = _reads(96, 96, k, seed=seed)
        # duplicate reads so weights > 1 appear
        codes = np.concatenate([codes, codes[:48]], axis=0)
        lengths = np.concatenate([lengths, lengths[:48]])
        codes_p, lens_p = eng.pad_read_batch(codes, lengths)
        keys_j, valid = dev.extract_canonical_windows(
            jnp.asarray(codes_p), jnp.asarray(lens_p), k)
        flatv = np.asarray(keys_j)[np.asarray(valid)].reshape(-1, w)
        rk = rng.integers(0, 2 ** 32, (2000, w), dtype=np.uint32)
        rk[:, -1] &= np.uint32(0xFFFFFFFC)
        keys = np.unique(np.concatenate([flatv[::3], rk]), axis=0)
        planes_np, perm, p = pj.build_tile_partitions_wide(keys)
        planes = tuple(jnp.asarray(planes_np[j]) for j in range(w))
        acc0 = jnp.zeros(planes_np[0].shape, jnp.int32)
        flat = pj.extract_flat_keys(
            jnp.asarray(codes_p), jnp.asarray(lens_p), k)
        return planes, perm, p, acc0, flat

    @pytest.mark.parametrize("k,w", [(47, 3), (63, 4)])
    def test_wide_dedup_matches_plain(self, k, w):
        planes, perm, p, acc0, flat = self._wide_setup(k, w)
        a1, ov1 = pj.join_tally_flat_wide(planes, acc0, flat, p,
                                          interpret=True)
        u, wp = pj.U_CHUNK_DD, pj.W_PART_TALLY
        while True:
            a5, ovs, ovu = pj.join_tally_flat_wide_dedup(
                planes, acc0, flat, p, w_part=wp, u_chunk=u,
                interpret=True)
            if not bool(ovs) and not bool(ovu):
                break
            if bool(ovu):
                u *= 2
            if bool(ovs):
                wp *= 2
            assert u <= pj.LCHUNK_DD and wp <= 512
        assert not bool(ov1)
        real = perm >= 0
        r1 = np.asarray(a1)[:perm.shape[0]][real]
        r5 = np.asarray(a5)[:perm.shape[0]][real]
        assert (r1 > 1).any()  # weights actually exercised
        assert np.array_equal(r1, r5)

    def test_wide_dedup_engine_flush(self, monkeypatch):
        """FilteredCounter wide path with dedup default must match
        the oracle through feed/flush/result."""
        monkeypatch.setenv("KDF_PALLAS_INTERPRET", "1")
        monkeypatch.setattr(eng, "_SMALL_TABLE_M", 0)
        k = 47
        reads = [s for s in
                 (''.join(np.random.default_rng(41).choice(
                     list("ACGT"), 96)) for _ in range(40))]
        reads = reads + reads[:20]
        import tests.test_engine as te
        kmers = sorted({km for s in reads
                        for km in te.oracle_counts([s], k)})
        from kmer_denovo_filter_tpu.ops import encode as enc2
        keys = enc2.kmers_to_keys(kmers, k)
        index = eng.KmerIndex(keys, k)
        index.small = False
        index.mid = True
        codes, lengths = te.pack_reads(reads)
        fc = eng.FilteredCounter(index)
        assert fc._dedup
        fc.feed(codes, lengths)
        got = fc.result()
        expected = te._expected_tally(reads, keys, k)
        assert np.array_equal(got, expected)
