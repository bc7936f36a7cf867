#!/usr/bin/env python3
"""Round-5 continuation experiments: super-batch NB sweep + kernel
fixed-cost variants, timed on the live chip.

Dev tool — results land in PERF.md; winners merge into
ops/pallas_join.py.

Usage: python scripts/x_sb5.py [nbsweep|profsb|all]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from kmer_denovo_filter_tpu.ops import device as dev
from kmer_denovo_filter_tpu.ops import pallas_join as pj

K = 31
READ_LEN = 152
BATCH_READS = 32768
N_REP = 4
COVERAGE = 40


def synth_reads(rng, genome, n_reads, read_len):
    span = max(n_reads * read_len // COVERAGE, read_len * 4)
    start0 = rng.integers(0, len(genome) - span - read_len)
    starts = np.sort(rng.integers(start0, start0 + span, n_reads))
    idx = starts[:, None] + np.arange(read_len)[None, :]
    reads = genome[idx]
    err = rng.random((n_reads, read_len)) < 0.003
    reads = np.where(err, (reads + rng.integers(
        1, 4, (n_reads, read_len))) % 4, reads).astype(np.uint8)
    return reads


def timeit(label, fn, *args, n_rep=N_REP, per=1):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[:1]), out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[:1]), out)
    dt = (time.perf_counter() - t0) / n_rep
    print(f"{label:46s} {dt * 1e3:8.2f} ms"
          f"  ({dt * 1e3 / per:6.2f} ms/batch, "
          f"{BATCH_READS * per / dt / 1e6:5.2f} M reads/s)",
          flush=True)
    return dt


def build_wgs(rng, genome):
    WGS_TABLE_M = 1 << 24
    gcodes = jnp.asarray(np.asarray(genome).reshape(-1, 256))
    glens = jnp.full(gcodes.shape[0], 256, dtype=np.int32)
    gkeys, gvalid = dev.extract_canonical_windows(gcodes, glens, K)
    gk = np.asarray(gkeys)[np.asarray(gvalid)]
    g64 = (gk[:, 0].astype(np.uint64) << 32) | gk[:, 1]
    k64 = np.unique(np.concatenate([
        rng.integers(0, 2 ** 62, size=WGS_TABLE_M, dtype=np.uint64),
        g64]))
    keys = np.stack([(k64 >> 32).astype(np.uint32),
                     k64.astype(np.uint32)], 1)
    t0, t1, perm, p = pj.build_tile_partitions(keys)
    return jnp.asarray(t0), jnp.asarray(t1), perm, p


def run_nbsweep(rng, genome):
    t0j, t1j, perm, p = build_wgs(rng, genome)
    acc = jnp.zeros(t0j.shape, jnp.int32)
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    print(f"p={p}", flush=True)
    real = perm >= 0

    def real_tally(a):
        return np.asarray(a)[:perm.shape[0]][real]

    NBMAX = 32
    batches = [jnp.asarray(synth_reads(rng, genome, BATCH_READS,
                                       READ_LEN))
               for _ in range(NBMAX)]
    codes_nb = jnp.stack(batches)
    lens_nb = jnp.broadcast_to(lengths, (NBMAX, BATCH_READS))

    # parity base: sequential dedup steps
    a_seq = acc
    for i in range(16):
        a_seq, os_, ou_ = pj.join_tally_step_dedup(
            t0j, t1j, a_seq, batches[i], lengths, K, p)
        assert not (bool(os_) or bool(ou_))
    base16 = real_tally(a_seq)

    # nb=32 fails to compile: the scalar-prefetch meta array
    # (nc × (2 + 2·nsub) int32) exceeds the 1 MB SMEM budget at
    # ~3400 chunks — nb=16 (~890 KB) is the ceiling for this design.
    for nb in (8, 16):
        cnb = codes_nb[:nb]
        lnb = lens_nb[:nb]
        a, os_, ou_ = pj.join_tally_superbatch_dedup(
            t0j, t1j, acc, cnb, lnb, K, p)
        ok = "n/a"
        if nb == 16:
            ok = bool(np.array_equal(base16, real_tally(a)))
        print(f"tally nb={nb}: ovf_s={bool(os_)} ovf_u={bool(ou_)} "
              f"parity={ok}", flush=True)
        if bool(os_) or bool(ou_):
            continue
        timeit(f"tally superbatch nb={nb}",
               lambda a, c, l, _n=nb: pj.join_tally_superbatch_dedup(
                   t0j, t1j, a, c, l, K, p)[0],
               acc, cnb, lnb, per=nb)

    for nb in (8, 16):
        cnb = codes_nb[:nb]
        lnb = lens_nb[:nb]
        f, os_, ou_ = pj.join_member_superbatch_dedup(
            t0j, t1j, cnb, lnb, K, p)
        print(f"member nb={nb}: ovf_s={bool(os_)} ovf_u={bool(ou_)}",
              flush=True)
        if bool(os_) or bool(ou_):
            continue
        timeit(f"member superbatch nb={nb}",
               lambda c, l, _n=nb: pj.join_member_superbatch_dedup(
                   t0j, t1j, c, l, K, p)[0],
               cnb, lnb, per=nb)


def run_profsb(rng, genome):
    """Cumulative prefixes inside the nb=16 superbatch jit."""
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed
    t0j, t1j, perm, p = build_wgs(rng, genome)
    acc = jnp.zeros(t0j.shape, jnp.int32)
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    NB = 16
    batches = [jnp.asarray(synth_reads(rng, genome, BATCH_READS,
                                       READ_LEN))
               for _ in range(NB)]
    codes_nb = jnp.stack(batches)
    lens_nb = jnp.broadcast_to(lengths, (NB, BATCH_READS))
    u_chunk = pj.U_CHUNK_DD
    LC = pj.LCHUNK_DD
    CHUNK_SB = pj.CHUNK_SB
    NSUB_SB = pj.NSUB_SB
    w_part = pj.W_PART_SB

    def front_scan(codes_nb, lens_nb):
        def front(_, xs):
            codes, lengths = xs
            hi2, lo2 = extract_mixed(codes, lengths, K)
            hi = hi2.reshape(-1)
            lo = lo2.reshape(-1)
            pad = (-hi.shape[0]) % LC
            if pad:
                hi = jnp.concatenate(
                    [hi, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
                lo = jnp.concatenate(
                    [lo, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
            hc, lc, wc, ovf_u = pj._dedup_compact(hi, lo, u_chunk)
            return 0, (hc, lc, wc, ovf_u)

        _, (hcs, lcs, wcs, _o) = jax.lax.scan(
            front, 0, (codes_nb, lens_nb))
        return hcs, lcs, wcs

    @jax.jit
    def p0(codes_nb, lens_nb):
        hcs, lcs, wcs = front_scan(codes_nb, lens_nb)
        return hcs.ravel()[:1]

    @jax.jit
    def p1(codes_nb, lens_nb):
        hcs, lcs, wcs = front_scan(codes_nb, lens_nb)
        s0, s1, sw = jax.lax.sort(
            (hcs.reshape(-1), lcs.reshape(-1), wcs.reshape(-1)),
            num_keys=1)
        return s0[:1]

    @jax.jit
    def p2(codes_nb, lens_nb):
        hcs, lcs, wcs = front_scan(codes_nb, lens_nb)
        s0, s1, sw = jax.lax.sort(
            (hcs.reshape(-1), lcs.reshape(-1), wcs.reshape(-1)),
            num_keys=1)
        n2 = s0.shape[0]
        pad2 = (-n2) % CHUNK_SB
        if pad2:
            s0 = jnp.concatenate(
                [s0, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
            s1 = jnp.concatenate(
                [s1, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
            sw = jnp.concatenate([sw, jnp.zeros(pad2, jnp.int32)])
        sent_s = (s0 == jnp.uint32(0xFFFFFFFF)) \
            & (s1 == jnp.uint32(0xFFFFFFFF))
        spart = jnp.where(sent_s, p, pj._part_from_hi(s0, p))
        meta = pj._masked_span_meta(spart, sent_s, p, CHUNK_SB,
                                    NSUB_SB, w_part, monotone=True)
        return meta[0].ravel()[:1], meta[1].ravel()[:1]

    timeit("p0 front scan (extract+dedup x16)", p0,
           codes_nb, lens_nb, per=16)
    timeit("p1 + global sort", p1, codes_nb, lens_nb, per=16)
    timeit("p2 + span meta", p2, codes_nb, lens_nb, per=16)
    timeit("p3 full superbatch", lambda c, l:
           pj.join_tally_superbatch_dedup(
               t0j, t1j, acc, c, l, K, p)[0],
           codes_nb, lens_nb, per=16)


def run_small(rng, genome):
    """Dedup-first small-table sweep vs the plain all-pairs sweep."""
    from kmer_denovo_filter_tpu.ops import encode as enc
    TABLE_M = 4096
    t = rng.integers(0, 2 ** 32, (TABLE_M, 2), dtype=np.uint32)
    t[:, 1] &= 0xFFFFFFFC
    t = t[enc.lexsort_keys(t)]
    table = jnp.asarray(t)
    th, tl = pj._mix_keys(table[:, 0], table[:, 1])
    acc = jnp.zeros(TABLE_M, dtype=jnp.int32)
    chunk = 16384
    NB = 16
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    batches = [jnp.asarray(synth_reads(rng, genome, BATCH_READS,
                                       READ_LEN))
               for _ in range(NB)]
    codes_nb = jnp.stack(batches)
    lens_nb = jnp.broadcast_to(lengths, (NB, BATCH_READS))

    from kmer_denovo_filter_tpu.ops import device as _d
    a_plain = _d.small_tally_steps(table, acc, codes_nb, lens_nb,
                                   K, 2, chunk)
    a_dd, ovf = pj.small_tally_steps_dedup(
        th, tl, acc, codes_nb, lens_nb, K, chunk=8192)
    print(f"small dedup: ovf={bool(ovf)} parity="
          f"{np.array_equal(np.asarray(a_plain), np.asarray(a_dd))}",
          flush=True)
    timeit("small plain steps x16",
           lambda a: _d.small_tally_steps(
               table, a, codes_nb, lens_nb, K, 2, chunk),
           acc, per=NB)
    for swp in (8192, 16384):
        timeit(f"small dedup steps x16 (sweep chunk {swp})",
               lambda a, _c=swp: pj.small_tally_steps_dedup(
                   th, tl, a, codes_nb, lens_nb, K,
                   chunk=_c)[0],
               acc, per=NB)


def run_meta2(rng, genome):
    """Counted span metadata: 2-key global sort makes junk strictly
    trailing, so per-sub min/max are two strided slices of spart and
    ONE dynamic scalar fixes the single real/junk boundary sub."""
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed
    t0j, t1j, perm, p = build_wgs(rng, genome)
    acc = jnp.zeros(t0j.shape, jnp.int32)
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    NB = 16
    batches = [jnp.asarray(synth_reads(rng, genome, BATCH_READS,
                                       READ_LEN))
               for _ in range(NB)]
    codes_nb = jnp.stack(batches)
    lens_nb = jnp.broadcast_to(lengths, (NB, BATCH_READS))
    u_chunk = pj.U_CHUNK_DD
    LC = pj.LCHUNK_DD
    CHUNK_SB = pj.CHUNK_SB
    NSUB_SB = pj.NSUB_SB
    w_part = pj.W_PART_SB
    SENT = jnp.uint32(0xFFFFFFFF)
    SUB_ROWS = pj.SUB_ROWS

    def front_scan(codes_nb, lens_nb):
        def front(_, xs):
            codes, lengths = xs
            hi2, lo2 = extract_mixed(codes, lengths, K)
            hi = hi2.reshape(-1)
            lo = lo2.reshape(-1)
            pad = (-hi.shape[0]) % LC
            if pad:
                hi = jnp.concatenate([hi, jnp.full(pad, SENT)])
                lo = jnp.concatenate([lo, jnp.full(pad, SENT)])
            hc, lc, wc, ovf_u = pj._dedup_compact(hi, lo, u_chunk)
            return 0, (hc, lc, wc, ovf_u)

        _, (hcs, lcs, wcs, _o) = jax.lax.scan(
            front, 0, (codes_nb, lens_nb))
        return hcs.reshape(-1), lcs.reshape(-1), wcs.reshape(-1)

    def counted_meta(spart, r_real, n2, p):
        """(spr, meta, ovf) from a strictly partition-monotone spart
        whose rows >= r_real are all junk."""
        nc = n2 // CHUNK_SB
        nsub = NSUB_SB
        sp2 = spart.reshape(nc * nsub, SUB_ROWS)
        mn = sp2[:, 0]
        mx = sp2[:, -1]
        sidx = jnp.arange(nc * nsub, dtype=jnp.int32)
        last_real_sub = (r_real - 1) // SUB_ROWS
        # the boundary sub's real max is spart[r_real - 1]
        bmax = spart[jnp.maximum(r_real - 1, 0)]
        mx = jnp.where(sidx == last_real_sub, bmax, mx)
        real_sub = (sidx <= last_real_sub) & (r_real > 0)
        sub_start = jnp.where(real_sub, mn, 0).astype(jnp.int32)
        sub_span = jnp.where(real_sub, mx - mn + 1, 0).astype(
            jnp.int32)
        cidx = jnp.arange(nc, dtype=jnp.int32)
        last_real_chunk = (r_real - 1) // CHUNK_SB
        active = ((cidx <= last_real_chunk) & (r_real > 0)).astype(
            jnp.int32)
        cfirst = jnp.where(active == 1, sp2[::nsub, 0], 0)
        cmx = jnp.max(sub_span.reshape(nc, nsub)
                      + sub_start.reshape(nc, nsub) - 1, axis=1)
        cmx = jnp.where(active == 1, cmx, -1)
        base8 = ((cfirst // 8) * 8).astype(jnp.int32)
        blk = (cfirst // w_part).astype(jnp.int32)
        last = jnp.maximum(cmx, cfirst)
        ovf = ((jnp.max(last - blk * w_part + 1) > 2 * w_part)
               | (jnp.max(last - base8 + 1) > w_part))
        spr = spart.reshape(n2 // 128, 128)
        meta = jnp.concatenate([blk, base8, sub_start, sub_span,
                                active])
        return spr, meta, ovf

    @jax.jit
    def full_counted(acc, codes_nb, lens_nb):
        hc, lc, wc = front_scan(codes_nb, lens_nb)
        sent = (hc == SENT) & (lc == SENT)
        r_real = jnp.sum(~sent).astype(jnp.int32)
        s0, s1, sw = jax.lax.sort((hc, lc, wc), num_keys=2)
        n2 = s0.shape[0]
        pad2 = (-n2) % CHUNK_SB
        if pad2:
            s0 = jnp.concatenate([s0, jnp.full(pad2, SENT)])
            s1 = jnp.concatenate([s1, jnp.full(pad2, SENT)])
            sw = jnp.concatenate([sw, jnp.zeros(pad2, jnp.int32)])
            n2 += pad2
        spart = pj._part_from_hi(s0, p)
        spr, meta, ovf = counted_meta(spart, r_real, n2, p)
        s0r = s0.reshape(n2 // 128, 128)
        s1r = s1.reshape(n2 // 128, 128)
        swr = sw.reshape(n2 // 128, 128)
        acc_out = pj._tally_call_w(meta, t0j, t1j, s0r, s1r, spr,
                                   swr, acc, w_part, False,
                                   nsub=NSUB_SB)
        return acc_out, ovf

    @jax.jit
    def p1b(codes_nb, lens_nb):
        hc, lc, wc = front_scan(codes_nb, lens_nb)
        sent = (hc == SENT) & (lc == SENT)
        r_real = jnp.sum(~sent).astype(jnp.int32)
        s0, s1, sw = jax.lax.sort((hc, lc, wc), num_keys=2)
        return s0[:1], r_real

    a_ref, os_, ou_ = pj.join_tally_superbatch_dedup(
        t0j, t1j, acc, codes_nb, lens_nb, K, p)
    a_new, ovf = full_counted(acc, codes_nb, lens_nb)
    real = perm >= 0

    def real_tally(a):
        return np.asarray(a)[:perm.shape[0]][real]

    print(f"counted meta: ovf={bool(ovf)} parity="
          f"{np.array_equal(real_tally(a_ref), real_tally(a_new))}",
          flush=True)
    timeit("p1b 2-key sort + count", p1b, codes_nb, lens_nb, per=16)
    timeit("p3b full counted-meta superbatch",
           lambda a, c, l: full_counted(a, c, l)[0],
           acc, codes_nb, lens_nb, per=16)
    timeit("p3 full superbatch (current)",
           lambda a, c, l: pj.join_tally_superbatch_dedup(
               t0j, t1j, a, c, l, K, p)[0],
           acc, codes_nb, lens_nb, per=16)


def run_smallmem(rng, genome):
    """Dedup-first small member sweep vs the plain all-pairs member."""
    from kmer_denovo_filter_tpu.ops import encode as enc
    from kmer_denovo_filter_tpu.ops import device as _d
    TABLE_M = 4096
    t = rng.integers(0, 2 ** 32, (TABLE_M, 2), dtype=np.uint32)
    t[:, 1] &= 0xFFFFFFFC
    t = t[enc.lexsort_keys(t)]
    table = jnp.asarray(t)
    th, tl = pj._mix_keys(table[:, 0], table[:, 1])
    chunk = 16384
    NB = 16
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    batches = [jnp.asarray(synth_reads(rng, genome, BATCH_READS,
                                       READ_LEN))
               for _ in range(NB)]
    codes_nb = jnp.stack(batches)
    lens_nb = jnp.broadcast_to(lengths, (NB, BATCH_READS))

    ref = _d.small_scan_hits_step(table, batches[0], lengths, K, 2,
                                  chunk)
    got, ovf = pj.small_member_step_dedup(
        th, tl, batches[0], lengths, K, chunk=8192)
    print(f"small member dedup: ovf={bool(ovf)} parity="
          f"{np.array_equal(np.asarray(ref), np.asarray(got))}",
          flush=True)

    @jax.jit
    def plain_many(codes_nb, lens_nb):
        def body(c, xs):
            codes, lengths = xs
            return c, _d.small_scan_hits_step(table, codes, lengths,
                                              K, 2, chunk)
        _, f = jax.lax.scan(body, 0, (codes_nb, lens_nb))
        return f

    timeit("small member plain steps x16",
           lambda: plain_many(codes_nb, lens_nb), per=NB)
    timeit("small member dedup steps x16",
           lambda: pj.small_member_steps_dedup(
               th, tl, codes_nb, lens_nb, K, chunk=8192)[0],
           per=NB)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 4 << 20, dtype=np.uint8)
    if which in ("small", "all"):
        run_small(rng, genome)
    if which in ("smallmem", "all"):
        run_smallmem(rng, genome)
    if which in ("meta2",):
        run_meta2(rng, genome)
    if which in ("nbsweep", "all"):
        run_nbsweep(rng, genome)
    if which in ("profsb", "all"):
        run_profsb(rng, genome)


if __name__ == "__main__":
    main()
