"""Device k-mer engine vs host oracle: bit-exact equivalence tests."""

import random
from collections import Counter

import numpy as np
import pytest

from kmer_denovo_filter_tpu import engine as eng
from kmer_denovo_filter_tpu import kmer as K
from kmer_denovo_filter_tpu.ops import encode as enc


def random_reads(n, k, with_n=True, seed=0):
    rng = random.Random(seed)
    alphabet = "ACGTACGTACGTACGTN" if with_n else "ACGT"
    reads = []
    for _ in range(n):
        length = rng.randint(k, k + 80)
        reads.append("".join(rng.choice(alphabet) for _ in range(length)))
    return reads


def pack_reads(reads):
    codes = [enc.ASCII_TO_CODE[np.frombuffer(s.encode(), dtype=np.uint8)]
             for s in reads]
    lmax = max(len(c) for c in codes)
    batch = np.full((len(codes), lmax), 4, np.uint8)
    for i, c in enumerate(codes):
        batch[i, :len(c)] = c
    lens = np.array([len(c) for c in codes], np.int32)
    return batch, lens


def oracle_counts(reads, k):
    oc = Counter()
    for s in reads:
        cap, _ = K.extract_read_kmers(s, k)
        for c in cap.values():
            oc[c] += 1
    return oc


@pytest.mark.parametrize("k", [5, 15, 31, 33, 63, 101])
def test_stream_counter_matches_oracle(k):
    reads = random_reads(40, k, seed=k)
    oc = oracle_counts(reads, k)
    sc = eng.StreamCounter(k)
    batch, lens = pack_reads(reads)
    # split across two feeds to exercise the chunk merge
    sc.feed(batch[:17], lens[:17])
    sc.feed(batch[17:], lens[17:])
    keys, counts = sc.result()
    got = dict(zip(enc.keys_to_kmers(keys, k), counts.tolist()))
    assert got == dict(oc)


def test_stream_counter_progressive_consolidation():
    """A tiny merge floor forces consolidation on every feed; totals
    must still be exact and feeding past result() keeps counting."""
    k = 31
    reads = random_reads(60, k, seed=7)
    oc = oracle_counts(reads, k)
    sc = eng.StreamCounter(k)
    sc._merge_floor = 1  # consolidate whenever pending ≥ merged rows
    batch, lens = pack_reads(reads)
    for i in range(0, 60, 12):
        sc.feed(batch[i:i + 12], lens[i:i + 12])
    assert sc._merged is not None  # consolidation actually ran
    assert sc._pending_rows <= sc._merged[0].shape[0]
    keys, counts = sc.result()
    got = dict(zip(enc.keys_to_kmers(keys, k), counts.tolist()))
    assert got == dict(oc)
    # feeding after result() still accumulates exactly
    sc.feed(batch[:12], lens[:12])
    keys2, counts2 = sc.result()
    oc2 = oracle_counts(reads + reads[:12], k)
    got2 = dict(zip(enc.keys_to_kmers(keys2, k), counts2.tolist()))
    assert got2 == dict(oc2)


def test_key_roundtrip():
    for k in (5, 31, 33, 63):
        kmers = sorted({K.canonicalize(s)
                        for s in random_reads(50, k, with_n=False, seed=k)
                        for s in [s[:k]]})
        keys = enc.kmers_to_keys(kmers, k)
        assert enc.keys_to_kmers(keys, k) == kmers


def test_key_order_matches_string_order():
    k = 31
    kmers = [K.canonicalize(s[:k])
             for s in random_reads(300, k, with_n=False, seed=3)]
    kmers = sorted(set(kmers))
    keys = enc.kmers_to_keys(kmers, k)
    order = enc.lexsort_keys(keys)
    assert list(order) == sorted(range(len(kmers)),
                                 key=lambda i: kmers[i])


def test_index_counts_and_membership():
    k = 31
    reads = random_reads(60, k, seed=11)
    oc = oracle_counts(reads, k)
    sc = eng.StreamCounter(k)
    batch, lens = pack_reads(reads)
    sc.feed(batch, lens)
    idx = sc.to_index()
    some = sorted(oc)[:200]
    qk = enc.kmers_to_keys(some, k)
    got = idx.counts_of(qk)
    assert [int(g) for g in got] == [oc[s] for s in some]
    member = idx.membership(qk)
    assert member.all()
    # absent canonical k-mer
    absent = K.canonicalize("ACGT" * 8)[:k]
    absent = K.canonicalize("A" * 15 + "CGTGCATGCATGCATG")
    if absent not in oc:
        assert not idx.membership(enc.kmers_to_keys([absent], k)).any()


def test_filtered_counter_matches_oracle():
    k = 31
    rng = random.Random(5)
    stream = random_reads(80, k, with_n=False, seed=21)
    filter_reads = stream[:10] + random_reads(20, k, with_n=False, seed=22)
    filter_set = set()
    for s in filter_reads:
        cap, _ = K.extract_read_kmers(s, k)
        filter_set.update(cap.values())
    fidx = eng.KmerIndex.from_strings(filter_set, k)
    fc = eng.FilteredCounter(fidx)
    batch, lens = pack_reads(stream)
    fc.feed(batch, lens)
    res = fc.result()
    oc = Counter()
    for s in stream:
        cap, _ = K.extract_read_kmers(s, k)
        for c in cap.values():
            if c in filter_set:
                oc[c] += 1
    got = {s: int(c) for s, c in zip(fidx.to_strings(), res) if c > 0}
    assert got == dict(oc)


def test_scan_reads_for_hits_positions():
    k = 15
    reads = random_reads(50, k, seed=31)
    target = set()
    for s in reads[:5]:
        cap, _ = K.extract_read_kmers(s, k)
        target.update(list(cap.values())[:3])
    idx = eng.KmerIndex.from_strings(target, k)
    batch, lens = pack_reads(reads)
    found = eng.scan_reads_for_hits(idx, batch, lens)
    for i, s in enumerate(reads):
        cap, _ = K.extract_read_kmers(s, k)
        expected = {p for p, c in cap.items() if c in target}
        assert set(np.nonzero(found[i])[0].tolist()) == expected


def test_empty_filter_index():
    k = 15
    idx = eng.KmerIndex.from_strings(set(), k)
    reads = random_reads(5, k, seed=41)
    batch, lens = pack_reads(reads)
    found = eng.scan_reads_for_hits(idx, batch, lens)
    assert not found.any()


def test_sequence_counting_chunks():
    # feed_sequence must produce identical counts to whole-sequence
    k = 31
    seq = "".join(random.Random(9).choice("ACGT") for _ in range(5000))
    sc = eng.StreamCounter(k)
    sc.feed_sequence(seq)
    keys, counts = sc.result()
    oc = Counter()
    cap, _ = K.extract_read_kmers(seq, k)
    for c in cap.values():
        oc[c] += 1
    got = dict(zip(enc.keys_to_kmers(keys, k), counts.tolist()))
    assert got == dict(oc)


def test_filtered_counter_large_table_bucketed_path():
    """Force the bucketed-probe path (table above the small threshold)."""
    k = 31
    stream = random_reads(60, k, with_n=False, seed=51)
    filter_reads = stream[:10] + random_reads(160, k, with_n=False,
                                              seed=52)
    filter_set = set()
    for s in filter_reads:
        cap, _ = K.extract_read_kmers(s, k)
        filter_set.update(cap.values())
    fidx = eng.KmerIndex.from_strings(filter_set, k)
    fidx.small = False  # force the bucketed path regardless of size
    fc = eng.FilteredCounter(fidx)
    batch, lens = pack_reads(stream)
    fc.feed(batch, lens)
    res = fc.result()
    oc = Counter()
    for s in stream:
        cap, _ = K.extract_read_kmers(s, k)
        for c in cap.values():
            if c in filter_set:
                oc[c] += 1
    got = {s: int(c) for s, c in zip(fidx.to_strings(), res) if c > 0}
    assert got == dict(oc)


def test_scan_hits_large_table_bucketed_path():
    k = 31
    reads = random_reads(40, k, seed=61)
    target = set()
    for s in random_reads(140, k, with_n=False, seed=62) + reads[:3]:
        cap, _ = K.extract_read_kmers(s, k)
        target.update(cap.values())
    idx = eng.KmerIndex.from_strings(target, k)
    idx.small = False  # force the bucketed path regardless of size
    batch, lens = pack_reads(reads)
    found = eng.scan_reads_for_hits(idx, batch, lens)
    for i, s in enumerate(reads):
        cap, _ = K.extract_read_kmers(s, k)
        expected = {p for p, c in cap.items() if c in target}
        assert set(np.nonzero(found[i])[0].tolist()) == expected, i


def test_small_and_bucketed_paths_agree():
    k = 15
    reads = random_reads(30, k, seed=71)
    kmers = sorted({c for s in reads
                    for c in K.extract_read_kmers(s, k)[0].values()})
    subset = kmers[:100]
    small_idx = eng.KmerIndex.from_strings(subset, k)
    assert small_idx.small
    batch, lens = pack_reads(reads)
    found_small = eng.scan_reads_for_hits(small_idx, batch, lens)
    # force the bucketed path on the identical table
    small_idx.small = False
    found_bucketed = eng.scan_reads_for_hits(small_idx, batch, lens)
    assert np.array_equal(found_small, found_bucketed)


def test_filtered_counter_mid_table_partitioned_path():
    """Force the hash-partitioned sweep (mid-size dispatch)."""
    k = 31
    stream = random_reads(60, k, with_n=False, seed=91)
    filter_reads = stream[:10] + random_reads(120, k, with_n=False,
                                              seed=92)
    filter_set = set()
    for s in filter_reads:
        cap, _ = K.extract_read_kmers(s, k)
        filter_set.update(cap.values())
    fidx = eng.KmerIndex.from_strings(filter_set, k)
    fidx.small = False
    fidx.mid = True
    fc = eng.FilteredCounter(fidx)
    batch, lens = pack_reads(stream)
    fc.feed(batch[:30], lens[:30])
    fc.feed(batch[30:], lens[30:])
    res = fc.result()
    oc = Counter()
    for s in stream:
        cap, _ = K.extract_read_kmers(s, k)
        for c in cap.values():
            if c in filter_set:
                oc[c] += 1
    got = {s: int(c) for s, c in zip(fidx.to_strings(), res) if c > 0}
    assert got == dict(oc)


def test_partitioned_path_cap_overflow_retry():
    """Tiny cap_q must trigger overflow retry and stay exact."""
    import jax.numpy as jnp

    from kmer_denovo_filter_tpu.ops import device as dev
    k = 31
    stream = random_reads(20, k, with_n=False, seed=95)
    filter_set = set()
    for s in stream[:5]:
        cap, _ = K.extract_read_kmers(s, k)
        filter_set.update(cap.values())
    keys = enc.kmers_to_keys(sorted(filter_set), k)
    blocks, counts, perm = dev.build_hash_partitions(keys, 4)
    batch, lens = pack_reads(stream)
    from kmer_denovo_filter_tpu.engine import pad_read_batch
    codes_p, lens_p = pad_read_batch(batch, lens)
    acc = jnp.zeros(blocks.shape[:2], jnp.int32)
    _acc, overflow = dev.partitioned_tally_step(
        jnp.asarray(blocks), acc, jnp.asarray(codes_p),
        jnp.asarray(lens_p), k, 2, 4, 16)
    assert bool(overflow)  # 16-slot cap can't hold ~2k windows / 16 parts


def test_scan_reads_for_hits_mid_partitioned_path():
    """Force the hash-partitioned member sweep on the read scan."""
    k = 31
    reads = random_reads(40, k, with_n=True, seed=97)
    target = set()
    for s in reads[:8]:
        cap, _ = K.extract_read_kmers(s, k)
        target.update(list(cap.values())[::3])
    idx = eng.KmerIndex.from_strings(target, k)
    idx.small = False
    idx.mid = True
    batch, lens = pack_reads(reads)
    found = eng.scan_reads_for_hits(idx, batch, lens)
    for i, s in enumerate(reads):
        cap, _ = K.extract_read_kmers(s, k)
        expected = {p for p, c in cap.items() if c in target}
        assert set(np.nonzero(found[i])[0].tolist()) == expected


def test_partitioned_scan_hits_cap_overflow_retry():
    """Tiny cap_q must flag overflow; engine retry stays exact."""
    import jax.numpy as jnp

    from kmer_denovo_filter_tpu.ops import device as dev
    k = 31
    reads = random_reads(16, k, with_n=False, seed=98)
    target = set()
    for s in reads[:4]:
        cap, _ = K.extract_read_kmers(s, k)
        target.update(cap.values())
    keys = enc.kmers_to_keys(sorted(target), k)
    blocks, _counts, _perm = dev.build_hash_partitions(keys, 4)
    batch, lens = pack_reads(reads)
    batch_p, lens_p = eng.pad_read_batch(batch, lens)
    _found, overflow = dev.partitioned_scan_hits_step(
        jnp.asarray(blocks), jnp.asarray(batch_p), jnp.asarray(lens_p),
        k, enc.words_per_kmer(k), 4, 16)
    assert bool(overflow)
    idx = eng.KmerIndex.from_strings(target, k)
    idx.small = False
    idx.mid = True
    found = eng.scan_reads_for_hits(idx, batch, lens)
    for i, s in enumerate(reads):
        cap, _ = K.extract_read_kmers(s, k)
        expected = {p for p, c in cap.items() if c in target}
        assert set(np.nonzero(found[i])[0].tolist()) == expected


class TestOverflowRetries:
    """Capacity-overflow retry paths across engine backends."""

    def _index_and_batch(self, k=31, n_table=60, seed=21):
        reads = random_reads(n_table, 64, with_n=False, seed=seed)
        kmers = sorted({km for s in reads
                        for km in oracle_counts([s], k)})
        keys = enc.kmers_to_keys(kmers, k)
        index = eng.KmerIndex(keys, k)
        batch = random_reads(40, 64, seed=seed + 1) + reads[:10]
        codes, lengths = pack_reads(batch)
        return index, keys, codes, lengths, batch

    def test_dedup_cap_defeat_retries_bucketed(self, monkeypatch):
        """A cap too small for the batch's unique keys must trigger
        the full-capacity retry and still produce exact tallies."""
        index, keys, codes, lengths, batch = self._index_and_batch()
        monkeypatch.setattr(eng, "_dedup_cap", lambda n: 4)
        monkeypatch.setattr(eng, "_SMALL_TABLE_M", 0)
        monkeypatch.setattr(eng, "_MID_TABLE_M", 0)  # force bucketed
        index.small = False
        index.mid = False
        fc = eng.FilteredCounter(index)
        fc.feed(codes, lengths)
        got = fc.result()
        expected = _expected_tally(batch, keys, index.k)
        assert np.array_equal(got, expected)

    def test_partitioned_cap_q_doubling(self, monkeypatch):
        """Homopolymer batches concentrate every window in one
        partition, defeating the initial cap_q."""
        k = 31
        reads = ["A" * 64] * 20
        kmers = sorted(oracle_counts(reads, k))
        keys = enc.kmers_to_keys(kmers, k)
        index = eng.KmerIndex(keys, k)
        monkeypatch.setattr(eng, "_SMALL_TABLE_M", 0)  # force mid
        monkeypatch.setenv("KDF_NO_PALLAS", "1")
        index.small = False
        index.mid = True
        codes, lengths = pack_reads(reads)
        fc = eng.FilteredCounter(index)
        fc.feed(codes, lengths)
        got = fc.result()
        expected = _expected_tally(reads, keys, k)
        assert np.array_equal(got, expected)

    def test_pallas_w_part_doubling(self, monkeypatch):
        """Tiny w_part must double until chunks fit (interpreter).

        Pins the PLAIN (non-dedup) path — the dedup path's knob
        ladder has its own test below."""
        from kmer_denovo_filter_tpu.ops import pallas_join as pj
        index, keys, codes, lengths, batch = self._index_and_batch(
            seed=23)
        monkeypatch.setenv("KDF_DEDUP_JOIN", "0")
        monkeypatch.setenv("KDF_PALLAS_INTERPRET", "1")
        monkeypatch.setattr(eng, "_SMALL_TABLE_M", 0)
        index.small = False
        index.mid = True
        # many partitions so chunks span far beyond the initial window
        t0, t1, perm, p = pj.build_tile_partitions(index.keys_np,
                                                   p=512)
        import jax.numpy as jnp
        index._tile_parts = (jnp.asarray(t0), jnp.asarray(t1), perm, p)
        fc = eng.FilteredCounter(index)
        fc.w_part = 4
        fc.feed(codes, lengths)
        # the overflow check is deferred one batch (the flag read is a
        # device sync; deferring lets host decode overlap the step) —
        # the pending batch resolves and replays at result()
        assert fc._pending is not None
        got = fc.result()
        assert fc.w_part > 4  # the retry loop actually widened it
        assert fc._pending is None
        expected = _expected_tally(batch, keys, index.k)
        assert np.array_equal(got, expected)
        # feeding the same batch again resolves the new pending entry
        # on the next feed, replaying from the *post-batch-1* acc
        fc.feed(codes, lengths)
        fc.feed(codes, lengths)
        got3 = fc.result()
        assert np.array_equal(got3, expected * 3)

    def test_pallas_sparse_batch_host_fallback(self, monkeypatch):
        """A sparse batch spanning more partitions than the largest
        tile window must fall back to the exact host tally, not raise
        (the near-empty final batch of a WGS file hits this)."""
        from kmer_denovo_filter_tpu.ops import pallas_join as pj
        index, keys, _codes, _lengths, _batch = self._index_and_batch(
            seed=29)
        monkeypatch.setenv("KDF_PALLAS_INTERPRET", "1")
        monkeypatch.setattr(eng, "_SMALL_TABLE_M", 0)
        index.small = False
        index.mid = True
        # enough partitions that a mixed real+sentinel sub-chunk spans
        # beyond 2 * MAX_W_PART_TALLY no matter how the window doubles
        p_forced = 4 * pj.MAX_W_PART_TALLY + 512
        t0, t1, perm, p = pj.build_tile_partitions(index.keys_np,
                                                   p=p_forced)
        import jax.numpy as jnp
        index._tile_parts = (jnp.asarray(t0), jnp.asarray(t1), perm, p)
        fc = eng.FilteredCounter(index)
        sparse = random_reads(2, 40, with_n=False, seed=30) + [
            enc.keys_to_kmers(keys[:1], index.k)[0]]
        codes, lengths = pack_reads(sparse)
        fc.feed(codes, lengths)
        got = fc.result()
        assert fc._host_corr is not None  # the fallback actually ran
        expected = _expected_tally(sparse, keys, index.k)
        assert np.array_equal(got, expected)
        # a second sparse batch accumulates on top, still exact
        fc.feed(codes, lengths)
        assert np.array_equal(fc.result(), expected * 2)

    def _pallas_counter(self, monkeypatch, seed=31):
        monkeypatch.setenv("KDF_PALLAS_INTERPRET", "1")
        monkeypatch.setattr(eng, "_SMALL_TABLE_M", 0)
        index, keys, codes, lengths, batch = self._index_and_batch(
            seed=seed)
        index.small = False
        index.mid = True
        return index, keys, codes, lengths, batch

    def test_pallas_dedup_default_matches_oracle(self, monkeypatch):
        """The default pallas tally path is dedup-first; duplicated
        batches (weights > 1) must stay bit-exact across feeds."""
        index, keys, codes, lengths, batch = self._pallas_counter(
            monkeypatch)
        fc = eng.FilteredCounter(index)
        assert fc._dedup
        fc.feed(codes, lengths)
        fc.feed(codes, lengths)
        got = fc.result()
        expected = _expected_tally(batch, keys, index.k)
        assert np.array_equal(got, expected * 2)
        assert fc._dedup  # nothing forced a fallback

    def test_pallas_dedup_u_chunk_doubling(self, monkeypatch):
        """A too-small unique capacity must double until the batch
        fits, replaying exactly from the saved accumulator."""
        index, keys, codes, lengths, batch = self._pallas_counter(
            monkeypatch, seed=33)
        fc = eng.FilteredCounter(index)
        fc._dd_u_chunk = 512
        fc.feed(codes, lengths)
        got = fc.result()
        assert fc._dd_u_chunk > 512
        assert fc._dedup
        expected = _expected_tally(batch, keys, index.k)
        assert np.array_equal(got, expected)

    def test_pallas_dedup_falls_back_on_undedupable_stream(
            self, monkeypatch):
        """A stream of distinct keys (no coverage locality) must trip
        the capacity ladder and drop to the plain join — exactly."""
        from kmer_denovo_filter_tpu.ops import pallas_join as pj
        monkeypatch.setenv("KDF_PALLAS_INTERPRET", "1")
        monkeypatch.setattr(eng, "_SMALL_TABLE_M", 0)
        k = 31
        # 152 bp keeps the post-extraction stream dense (122 real
        # windows per 128-column row), so one local chunk really
        # holds > LCHUNK_DD/2 distinct keys
        reads = random_reads(96, 152, with_n=False, seed=35)
        kmers = sorted(oracle_counts(reads, k))
        keys = enc.kmers_to_keys(kmers[: len(kmers) // 2], k)
        index = eng.KmerIndex(keys, k)
        index.small = False
        index.mid = True
        codes, lengths = pack_reads(reads)
        fc = eng.FilteredCounter(index)
        fc._dd_u_chunk = pj.LCHUNK_DD // 2
        fc.feed(codes, lengths)
        got = fc.result()
        assert not fc._dedup  # the ladder gave up on dedup
        expected = _expected_tally(reads, keys, k)
        assert np.array_equal(got, expected)


    def test_small_dedup_feeds_match_oracle(self, monkeypatch):
        """The small-table dedup-first sweep (mixed-space weighted
        all-pairs, pj.small_tally_step_dedup) must stay bit-exact
        through grouped, partial, and single-batch flushes."""
        monkeypatch.setenv("KDF_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("KDF_SB_JOIN", "2")
        index, keys, codes, lengths, batch = self._index_and_batch(
            seed=61)
        assert index.small
        fc = eng.FilteredCounter(index)
        fc.feed(codes, lengths)
        assert fc._small_dedup
        fc.feed(codes, lengths)     # flushes a 2-batch group
        fc.feed(codes, lengths)     # partial buffer at result()
        got = fc.result()
        expected = _expected_tally(batch, keys, index.k)
        assert np.array_equal(got, expected * 3)

    def test_small_dedup_overflow_replays_exactly(self, monkeypatch):
        """A too-small unique capacity must ladder (or drop to the
        plain sweep) and replay from the saved accumulator."""
        from kmer_denovo_filter_tpu.ops import pallas_join as pj
        monkeypatch.setenv("KDF_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("KDF_SB_JOIN", "1")
        index, keys, codes, lengths, batch = self._index_and_batch(
            seed=63)
        assert index.small
        fc = eng.FilteredCounter(index)
        fc.feed(codes, lengths)
        fc._sm_u_chunk = 128  # force the next feed to overflow
        fc.feed(codes, lengths)
        got = fc.result()
        assert fc._sm_u_chunk > 128 or not fc._small_dedup
        expected = _expected_tally(batch, keys, index.k)
        assert np.array_equal(got, expected * 2)

    def test_small_dedup_ladder_exhaustion_goes_plain(
            self, monkeypatch):
        """When u_chunk can no longer double, the counter drops to
        the plain sweep permanently — exactly."""
        from kmer_denovo_filter_tpu.ops import pallas_join as pj
        monkeypatch.setenv("KDF_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("KDF_SB_JOIN", "1")
        # dense distinct stream: long reads defeat chunk-local dedup
        reads = random_reads(96, 152, with_n=False, seed=65)
        kmers = sorted({km for s in reads
                        for km in oracle_counts([s], 31)})
        keys = enc.kmers_to_keys(kmers[: len(kmers) // 2], 31)
        index = eng.KmerIndex(keys, 31)
        assert index.small
        codes, lengths = pack_reads(reads)
        fc = eng.FilteredCounter(index)
        fc.feed(codes, lengths)
        fc._sm_u_chunk = pj.LCHUNK_DD // 2
        fc.feed(codes, lengths)
        got = fc.result()
        assert not fc._small_dedup  # the ladder gave up
        expected = _expected_tally(reads, keys, 31)
        assert np.array_equal(got, expected * 2)

    def test_superbatch_feeds_match_oracle(self, monkeypatch):
        """Buffered same-shape feeds join as ONE super-batch stream
        (pj.join_tally_superbatch_dedup) and must stay bit-exact,
        including a trailing partial buffer flushed at result()."""
        index, keys, codes, lengths, batch = self._pallas_counter(
            monkeypatch, seed=41)
        monkeypatch.setenv("KDF_SB_JOIN", "2")
        fc = eng.FilteredCounter(index)
        assert fc._sb_join == 2
        fc.feed(codes, lengths)
        assert fc._pending is None  # buffered, not yet dispatched
        fc.feed(codes, lengths)     # flushes a 2-batch super-batch
        assert fc._pending is not None
        fc.feed(codes, lengths)     # partial buffer at result()
        got = fc.result()
        expected = _expected_tally(batch, keys, index.k)
        assert np.array_equal(got, expected * 3)

    def test_superbatch_overflow_replay(self, monkeypatch):
        """A too-small unique capacity inside the super-batch must
        ladder up and replay the whole group exactly."""
        index, keys, codes, lengths, batch = self._pallas_counter(
            monkeypatch, seed=43)
        monkeypatch.setenv("KDF_SB_JOIN", "2")
        fc = eng.FilteredCounter(index)
        fc._dd_u_chunk = 512
        fc.feed(codes, lengths)
        fc.feed(codes, lengths)
        got = fc.result()
        assert fc._dd_u_chunk > 512  # the ladder actually ran
        expected = _expected_tally(batch, keys, index.k)
        assert np.array_equal(got, expected * 2)

    def test_superbatch_shape_change_flushes(self, monkeypatch):
        """A batch of a different shape must flush the buffer first
        (stacking stays rectangular) and remain exact."""
        index, keys, codes, lengths, batch = self._pallas_counter(
            monkeypatch, seed=45)
        monkeypatch.setenv("KDF_SB_JOIN", "4")
        short = random_reads(8, 48, with_n=False, seed=46)
        codes2, lengths2 = pack_reads(short)
        fc = eng.FilteredCounter(index)
        fc.feed(codes, lengths)
        fc.feed(codes2, lengths2)   # shape change → flush + rebuffer
        fc.feed(codes, lengths)
        got = fc.result()
        expected = (_expected_tally(batch, keys, index.k) * 2
                    + _expected_tally(short, keys, index.k))
        assert np.array_equal(got, expected)

    def test_scan_many_matches_per_batch(self, monkeypatch):
        """scan_reads_for_hits_many (member super-batch) must equal
        per-batch scan_reads_for_hits, including ragged lengths."""
        index, _keys, codes, lengths, _batch = self._pallas_counter(
            monkeypatch, seed=47)
        monkeypatch.setenv("KDF_SB_JOIN", "3")  # full group of 3
        # same row count as the first batch (50) so the group is
        # super-batch eligible; shorter reads exercise the L padding
        b2 = random_reads(50, 56, seed=48)
        codes2, lengths2 = pack_reads(b2)
        batches = [(codes, lengths), (codes2, lengths2),
                   (codes, lengths)]
        refs = [eng.scan_reads_for_hits(index, c, l)
                for c, l in batches]
        outs = eng.scan_reads_for_hits_many(index, batches)
        assert len(outs) == 3
        for got, ref in zip(outs, refs):
            assert np.array_equal(got, ref)


    def test_small_member_dedup_matches_plain(self, monkeypatch):
        """The dedup-first small member sweep (order-free all-pairs
        over the compacted stream + bit fan-out) must equal the plain
        small sweep, single and grouped."""
        monkeypatch.setenv("KDF_PALLAS_INTERPRET", "1")
        index, _keys, codes, lengths, _batch = self._index_and_batch(
            seed=67)
        assert index.small
        monkeypatch.setenv("KDF_SMALL_DEDUP", "0")
        ref = eng.scan_reads_for_hits(index, codes, lengths)
        monkeypatch.delenv("KDF_SMALL_DEDUP")
        got = eng.scan_reads_for_hits(index, codes, lengths)
        assert index._small_member_u  # the dedup path actually ran
        assert np.array_equal(got, ref)
        # grouped path with ragged lengths
        monkeypatch.setenv("KDF_SB_JOIN", "3")
        b2 = random_reads(40, 56, seed=68)
        codes2, lengths2 = pack_reads(b2)
        batches = [(codes, lengths), (codes2, lengths2),
                   (codes, lengths)]
        refs = [eng.scan_reads_for_hits(index, c, l)
                for c, l in batches]
        outs = eng.scan_reads_for_hits_many(index, batches)
        for g, r in zip(outs, refs):
            assert np.array_equal(g, r)

    def test_small_member_dedup_ladder_exhaustion(self, monkeypatch):
        """An undedupable stream must drop to the plain sweep and
        cache the give-up on the index."""
        from kmer_denovo_filter_tpu.ops import pallas_join as pj
        monkeypatch.setenv("KDF_PALLAS_INTERPRET", "1")
        reads = random_reads(96, 152, with_n=False, seed=69)
        kmers = sorted({km for s in reads
                        for km in oracle_counts([s], 31)})
        keys = enc.kmers_to_keys(kmers[: len(kmers) // 2], 31)
        index = eng.KmerIndex(keys, 31)
        assert index.small
        codes, lengths = pack_reads(reads)
        index._small_member_u = pj.LCHUNK_DD // 2
        got = eng.scan_reads_for_hits(index, codes, lengths)
        assert not index._small_member_dedup_ok
        monkeypatch.setenv("KDF_SMALL_DEDUP", "0")
        ref = eng.scan_reads_for_hits(index, codes, lengths)
        assert np.array_equal(got, ref)


def _expected_tally(reads, keys, k):
    from collections import Counter
    counts = Counter()
    for s in reads:
        counts.update(oracle_counts([s], k))
    kmers = enc.keys_to_kmers(keys, k)
    return np.array([counts.get(km, 0) for km in kmers],
                    dtype=np.int64)


class TestHostKmerIndex:
    def _keys(self, k=31, n_reads=50, seed=61):
        reads = random_reads(n_reads, 64, with_n=False, seed=seed)
        kmers = sorted({km for s in reads
                        for km in oracle_counts([s], k)})
        keys = enc.kmers_to_keys(kmers, k)
        counts = np.arange(1, keys.shape[0] + 1, dtype=np.int64)
        return keys, counts, kmers

    @pytest.mark.parametrize("k", [31, 63])
    def test_membership_and_counts_match_device_index(self, k):
        keys, counts, _ = self._keys(k=k)
        dev_idx = eng.KmerIndex(keys, k, counts)
        host_idx = eng.HostKmerIndex(keys, k, counts)
        other = enc.kmers_to_keys(
            sorted({km for s in random_reads(20, 64, with_n=False,
                                             seed=62)
                    for km in oracle_counts([s], k)}), k)
        queries = np.concatenate([keys[::3], other])
        assert np.array_equal(host_idx.membership(queries),
                              dev_idx.membership(queries))
        assert np.array_equal(host_idx.counts_of(queries),
                              dev_idx.counts_of(queries))

    def test_searchsorted_fallback_matches_hash(self, monkeypatch):
        from kmer_denovo_filter_tpu.htsio import native
        keys, counts, _ = self._keys()
        fast = eng.HostKmerIndex(keys, 31, counts)
        monkeypatch.setattr(native, "available", lambda: False)
        slow = eng.HostKmerIndex(keys, 31, counts)
        assert slow._ht is None
        queries = np.concatenate([keys[1::2], keys[:4]])
        assert np.array_equal(fast.membership(queries),
                              slow.membership(queries))
        assert np.array_equal(fast.counts_of(queries),
                              slow.counts_of(queries))

    def test_factory_gate(self, monkeypatch):
        keys, counts, _ = self._keys()
        monkeypatch.setattr(eng, "_DEVICE_TABLE_MAX_BYTES", 0)
        import jax as _jax
        if len(_jax.devices()) < 2:
            idx = eng.make_membership_index(keys, 31, counts)
            assert isinstance(idx, eng.HostKmerIndex)
        monkeypatch.setattr(eng, "_DEVICE_TABLE_MAX_BYTES", 8 << 30)
        idx2 = eng.make_membership_index(keys, 31, counts)
        assert isinstance(idx2, eng.KmerIndex)


class TestHostFilteredCounter:
    def test_matches_device_counter(self):
        from kmer_denovo_filter_tpu.htsio import native
        if not native.available():
            pytest.skip("native library unavailable")
        k = 31
        stream = random_reads(60, k, with_n=False, seed=71)
        filter_reads = stream[:10] + random_reads(
            20, k, with_n=False, seed=72)
        kmers = sorted({km for s in filter_reads
                        for km in oracle_counts([s], k)})
        keys = enc.kmers_to_keys(kmers, k)
        codes, lens = pack_reads(stream)
        dev_fc = eng.FilteredCounter(eng.KmerIndex(keys, k))
        dev_fc.feed(codes, lens)
        host_fc = eng.HostFilteredCounter(keys, k)
        host_fc.feed(codes, lens)
        assert np.array_equal(host_fc.result(), dev_fc.result())
        assert dev_fc.result().sum() > 0

    def test_factory_budget_gate(self, monkeypatch):
        from kmer_denovo_filter_tpu.htsio import native
        if not native.available():
            pytest.skip("native library unavailable")
        import jax as _jax
        keys = enc.kmers_to_keys(
            sorted({km for s in random_reads(30, 31, with_n=False,
                                             seed=73)
                    for km in oracle_counts([s], 31)}), 31)
        monkeypatch.setenv("KDF_SHARDED", "0")  # single-chip rule
        monkeypatch.setattr(eng, "_DEVICE_TABLE_MAX_BYTES", 0)
        fc = eng.make_parent_filter_counter(keys, 31)
        assert isinstance(fc, eng.HostFilteredCounter)
        monkeypatch.setattr(eng, "_DEVICE_TABLE_MAX_BYTES", 8 << 30)
        fc2 = eng.make_parent_filter_counter(keys, 31)
        assert isinstance(fc2, eng.FilteredCounter)


class TestWideKTileJoin:
    """k > 127 (W 9..13) rides the wide tile-join via cross-batch
    window accumulation instead of falling off the ~10x partitioned-
    sweep cliff; exact vs the host oracle (Pallas interpreter)."""

    def _setup(self, k, monkeypatch, n_filter=40, read_len=None):
        monkeypatch.setenv("KDF_PALLAS_INTERPRET", "1")
        monkeypatch.setattr(eng, "_SMALL_TABLE_M", 0)
        read_len = read_len or (k + 9)   # window-sparse reads
        stream = random_reads(120, read_len, with_n=False, seed=77)
        stream = [s for s in stream if len(s) >= k]
        filter_reads = stream[:n_filter]
        filter_set = set()
        for s in filter_reads:
            cap, _ = K.extract_read_kmers(s, k)
            filter_set.update(cap.values())
        fidx = eng.KmerIndex.from_strings(filter_set, k)
        fidx.small = False
        fidx.mid = False
        oc = Counter()
        for s in stream:
            cap, _ = K.extract_read_kmers(s, k)
            for c in cap.values():
                if c in filter_set:
                    oc[c] += 1
        return fidx, stream, filter_set, oc

    @pytest.mark.parametrize("k", [151, 201])
    def test_filtered_counter_accumulates_and_matches_oracle(
            self, k, monkeypatch):
        from kmer_denovo_filter_tpu.ops import pallas_join as pj
        assert enc.words_per_kmer(k) > 8  # genuinely past old cliff
        assert enc.words_per_kmer(k) <= pj.MAX_W_WIDE
        fidx, stream, _fs, oc = self._setup(k, monkeypatch)
        fc = eng.FilteredCounter(fidx)
        assert fc.pallas_wide
        # raise the density threshold so the sparse batches genuinely
        # buffer across feeds before the single dense join
        fc._wide_flush_rows = 10 ** 9
        for lo in range(0, len(stream), 30):
            batch, lens = pack_reads(stream[lo:lo + 30])
            fc.feed(batch, lens)
        assert fc._wide_buf_rows > 0  # accumulated, not yet joined
        assert fc._pending is None    # no join dispatched yet
        res = fc.result()
        assert fc._wide_buf_rows == 0
        got = {s: int(c) for s, c in zip(fidx.to_strings(), res)
               if c > 0}
        assert got == dict(oc)

    def test_mid_feed_flush_crossing_threshold(self, monkeypatch):
        """Crossing the dense-super-batch threshold mid-stream joins
        the buffered keys and keeps tallies exact."""
        k = 151
        fidx, stream, _fs, oc = self._setup(k, monkeypatch)
        fc = eng.FilteredCounter(fidx)
        fc._wide_flush_rows = 64  # force a flush on every feed
        for lo in range(0, len(stream), 30):
            batch, lens = pack_reads(stream[lo:lo + 30])
            fc.feed(batch, lens)
        res = fc.result()
        got = {s: int(c) for s, c in zip(fidx.to_strings(), res)
               if c > 0}
        assert got == dict(oc)

    def test_wide_vmem_window_caps(self):
        from kmer_denovo_filter_tpu.ops import pallas_join as pj
        # W <= 8 keeps the measured ceilings
        assert pj.max_wide_w_part_tally(4) == pj.MAX_W_PART_TALLY
        assert pj.max_wide_w_part_member(8) == pj.MAX_W_PART
        # W = 13 windows stay inside the VMEM budget
        w13 = pj.max_wide_w_part_tally(13)
        assert 8 <= w13 < pj.MAX_W_PART_TALLY
        assert 4 * pj.TILE_KEYS * (4 * 13 + 1) * w13 <= (12 << 20)

    def test_scan_hits_falls_back_exactly(self, monkeypatch):
        """Member scan at k=151: sparse batches overflow the wide
        windows and must fall through to an exact XLA path."""
        k = 151
        fidx, stream, filter_set, _oc = self._setup(k, monkeypatch)
        batch, lens = pack_reads(stream[:40])
        got = eng.scan_reads_for_hits(fidx, batch, lens)
        for i, s in enumerate(stream[:40]):
            per_pos, _ = K.extract_read_kmers(s, k)
            want = [per_pos.get(j) in filter_set
                    for j in range(len(s) - k + 1)]
            assert list(got[i][:len(want)]) == want
