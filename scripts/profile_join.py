#!/usr/bin/env python3
"""Per-stage timing of the WGS tile-join step on the live chip.

Dev tool for PERF.md numbers: times extract / route-sort / join kernel
/ full step separately (each forced to sync via a tiny device→host
transfer, the only real sync through the axon relay).

Usage: python scripts/profile_join.py [tally|member|wide|all]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from kmer_denovo_filter_tpu.ops import device as dev
from kmer_denovo_filter_tpu.ops import pallas_join as pj

K = 31
READ_LEN = 152
BATCH_READS = 32768
WGS_TABLE_M = 1 << 24
N_REP = 8
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


def timeit(label, fn, *args):
    out = fn(*args)          # warm-up/compile
    jax.tree.map(lambda x: np.asarray(x.ravel()[:1]), out)
    t0 = time.perf_counter()
    for _ in range(N_REP):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[:1]), out)
    dt = (time.perf_counter() - t0) / N_REP
    print(f"{label:34s} {dt * 1e3:8.2f} ms"
          f"  ({BATCH_READS / dt / 1e6:.3f} M reads/s)", flush=True)
    return dt


@functools.partial(jax.jit, static_argnames=("k",))
def extract_only(codes, lengths, k):
    keys, valid = dev.extract_canonical_windows(codes, lengths, k)
    return keys[:1, :1], valid[:1, :1]


@functools.partial(jax.jit, static_argnames=("k", "p"))
def extract_route_tally(codes, lengths, k, p):
    """Everything in join_tally_step up to (not incl.) the kernel."""
    keys, _valid = dev.extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, 2)
    pad = (-flat.shape[0]) % pj.CHUNK_T
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad, 2), jnp.uint32(0xFFFFFFFF))], axis=0)
    n = flat.shape[0]
    w0, w1 = flat[:, 0], flat[:, 1]
    sent = (w0 == jnp.uint32(0xFFFFFFFF)) & (w1 == jnp.uint32(0xFFFFFFFF))
    h, low = pj._mix_keys(w0, w1)
    hi = jnp.where(sent, jnp.uint32(0xFFFFFFFF), h)
    lo = jnp.where(sent, jnp.uint32(0xFFFFFFFF), low)
    s0, s1 = jax.lax.sort((hi, lo), num_keys=1)
    spart = pj._part_from_hi(s0, p)
    nc = n // pj.CHUNK_T
    sp2 = spart.reshape(nc * pj.NSUB_T, pj.SUB_ROWS)
    sub_start = sp2[:, 0]
    sub_span = (sp2[:, -1] - sub_start + 1).astype(jnp.int32)
    return s0[:1], s1[:1], jnp.max(sub_span)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 4 << 20, dtype=np.uint8)

    gcodes = jnp.asarray(genome.reshape(-1, 256))
    glens = jnp.full(gcodes.shape[0], 256, dtype=np.int32)
    gkeys, gvalid = dev.extract_canonical_windows(gcodes, glens, K)
    gk = np.asarray(gkeys)[np.asarray(gvalid)]
    g64 = (gk[:, 0].astype(np.uint64) << 32) | gk[:, 1]
    k64 = np.unique(np.concatenate([
        rng.integers(0, 2 ** 62, size=WGS_TABLE_M, dtype=np.uint64),
        g64]))
    keys = np.stack([(k64 >> 32).astype(np.uint32),
                     k64.astype(np.uint32)], 1)

    reads = synth_reads(rng, genome, BATCH_READS, READ_LEN)
    codes = jnp.asarray(reads)
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)

    if which in ("tally", "all"):
        t0, t1, _perm, p = pj.build_tile_partitions(keys)
        print(f"p={p} planes={t0.shape}", flush=True)
        t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
        acc = jnp.zeros(t0.shape, jnp.int32)
        timeit("extract", extract_only, codes, lengths, K)
        timeit("extract+route(sort)",
               lambda c, l: extract_route_tally(c, l, K, p),
               codes, lengths)
        dt = timeit("tally full step",
                    lambda a, c, l: pj.join_tally_step(
                        t0j, t1j, a, c, l, K, p)[0],
                    acc, codes, lengths)
        del dt

    if which in ("member", "all"):
        t0, t1, _perm, p = pj.build_tile_partitions(keys)
        t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
        timeit("member full step",
               lambda c, l: pj.join_member_step(
                   t0j, t1j, c, l, K, p)[0],
               codes, lengths)

    if which in ("wide", "all"):
        k = 63
        w = 4
        wkeys = rng.integers(0, 2 ** 32, (WGS_TABLE_M, w),
                             dtype=np.uint32)
        wkeys[:, -1] &= np.uint32(0xFFFFFFFC)
        planes_np, _perm, p = pj.build_tile_partitions_wide(wkeys)
        planes = tuple(jnp.asarray(planes_np[j]) for j in range(w))
        acc = jnp.zeros(planes_np[0].shape, jnp.int32)
        timeit("wide tally full step",
               lambda a, c, l: pj.join_tally_step_wide(
                   planes, a, c, l, k, p)[0],
               acc, codes, lengths)
        timeit("wide member full step",
               lambda c, l: pj.join_member_step_wide(
                   planes, c, l, k, p)[0],
               codes, lengths)


if __name__ == "__main__":
    main()
