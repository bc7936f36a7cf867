#!/usr/bin/env python3
"""Round-4 perf experiments: extraction / route-sort / join-kernel
variants, timed on the live chip against the round-3 production code.

Dev tool — results land in PERF.md; winners get merged into
ops/device.py and ops/pallas_join.py.

Usage: python scripts/x_join_variants.py [extract|sort|all]
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
N_REP = 8
COVERAGE = 40
SENTINEL = jnp.uint32(0xFFFFFFFF)


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


def timeit(label, fn, *args, n_rep=N_REP):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[:1]), out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[:1]), out)
    dt = (time.perf_counter() - t0) / n_rep
    print(f"{label:40s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


# ── Extraction variants ─────────────────────────────────────────────

def extract_v2(codes, lengths, k):
    """Doubling-pack rewrite of extract_canonical_windows (W == 2).

    pack32 via 4 shift-OR doubling steps instead of 16; N-window OR
    via dyadic doubling instead of a cumsum; same outputs.
    """
    codes = codes.astype(jnp.int32)
    b, length = codes.shape
    s = length - k + 1
    w = 2

    is_bad = codes >= 4
    clean = jnp.where(is_bad, 0, codes)
    comp = 3 - clean

    # forward pack: p[t] = sum_i clean[t+i] << 2(15-i), i in 0..15
    p = jnp.pad(clean, ((0, 0), (0, 15)))
    span = 1
    while span < 16:
        p = (p[:, :-span] << (2 * span)) | p[:, span:]
        span *= 2
    pack32 = p.astype(jnp.uint32)  # (B, L)

    # reverse-complement pack: r[t] = sum_i comp[t+i-15] << 2i
    r = jnp.pad(comp, ((0, 0), (15, 0)))
    span = 1
    while span < 16:
        r = r[:, :-span] | (r[:, span:] << (2 * span))
        span *= 2
    rpack32 = r.astype(jnp.uint32)  # (B, L)

    rem = k % 16
    last_mask = jnp.uint32(((1 << (2 * rem)) - 1) << (32 - 2 * rem))
    f0 = pack32[:, :s]
    f1 = pack32[:, 16:16 + s] & last_mask
    r0 = rpack32[:, k - 1:k - 1 + s]
    r1 = rpack32[:, rem - 1:rem - 1 + s] & last_mask

    pick_fwd = (f0 < r0) | ((f0 == r0) & (f1 <= r1))

    # N in window: dyadic OR over k consecutive is_bad flags
    ib = jnp.pad(is_bad, ((0, 0), (0, k - 1)))
    o = ib
    span = 1
    while span * 2 <= k:
        o = o[:, :-span] | o[:, span:]
        span *= 2
    # o[t] covers t..t+span-1; extend to k with one overlapped OR
    if span < k:
        o = o[:, :o.shape[1] - (k - span)] | o[:, k - span:]
    bad_in_win = o[:, :s]
    starts = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    valid = ~bad_in_win & (starts + k <= lengths[:, None])

    w0 = jnp.where(valid, jnp.where(pick_fwd, f0, r0), SENTINEL)
    w1 = jnp.where(valid, jnp.where(pick_fwd, f1, r1), SENTINEL)
    keys = jnp.stack([w0, w1], axis=-1)
    return keys, valid


@functools.partial(jax.jit, static_argnames=("k",))
def extract_v1_j(codes, lengths, k):
    keys, valid = dev.extract_canonical_windows(codes, lengths, k)
    return keys[:1, :1], valid[:1, :1]


@functools.partial(jax.jit, static_argnames=("k",))
def extract_v2_j(codes, lengths, k):
    keys, valid = extract_v2(codes, lengths, k)
    return keys[:1, :1], valid[:1, :1]


def run_extract(rng, genome):
    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    # parity first
    k1, v1 = jax.jit(dev.extract_canonical_windows,
                     static_argnames=("k",))(codes, lengths, K)
    k2, v2 = jax.jit(extract_v2, static_argnames=("k",))(
        codes, lengths, K)
    assert np.array_equal(np.asarray(v1), np.asarray(v2)), "valid diff"
    assert np.array_equal(np.asarray(k1), np.asarray(k2)), "keys diff"
    print("extract v2 parity OK", flush=True)
    timeit("extract v1 (prod)", extract_v1_j, codes, lengths, K)
    timeit("extract v2 (doubling)", extract_v2_j, codes, lengths, K)


# ── Sort variants ───────────────────────────────────────────────────

def run_sort(rng, genome):
    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    keys, _ = jax.jit(dev.extract_canonical_windows,
                      static_argnames=("k",))(codes, lengths, K)
    flat = np.asarray(keys).reshape(-1, 2)
    pad = (-flat.shape[0]) % pj.CHUNK_T
    flat = np.concatenate(
        [flat, np.full((pad, 2), 0xFFFFFFFF, np.uint32)])
    h, lo = pj.mix_keys_np(flat[:, 0], flat[:, 1])
    hj = jnp.asarray(h)
    loj = jnp.asarray(lo)
    u64 = (h.astype(np.uint64) << 32) | lo
    u64j = jnp.asarray(u64)
    i32 = jnp.asarray((h ^ np.uint32(0x80000000)).view(np.int32))
    lo_i32 = jnp.asarray(lo.view(np.int32))
    idx = jnp.arange(h.shape[0], dtype=jnp.int32)

    s2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    s2k = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
    s1_64 = jax.jit(lambda a: jax.lax.sort(a))
    s3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1))
    timeit("sort (u32 hi, u32 lo) nk=1", s2, hj, loj)
    timeit("sort (u32 hi, u32 lo) nk=2", s2k, hj, loj)
    timeit("sort (i32 hi, i32 lo) nk=1", s2, i32, lo_i32)
    timeit("sort u64 packed", s1_64, u64j)
    timeit("sort (u32,u32,idx) nk=1 [member]", s3, hj, loj, idx)
    timeit("sort i32 single [unsort]", s1_64, lo_i32)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 4 << 20, dtype=np.uint8)
    if which in ("extract", "all"):
        run_extract(rng, genome)
    if which in ("sort", "all"):
        run_sort(rng, genome)


if __name__ == "__main__":
    main()
