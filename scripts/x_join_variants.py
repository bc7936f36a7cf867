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


# ── Tally kernel v3 ─────────────────────────────────────────────────
# Static 2-partition unroll per sub-chunk (masks make out-of-span
# partitions contribute zero automatically), ONE batched bf16 MXU dot
# per sub-chunk, dynamic fori tail only for the rare span > 2.

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK_T = pj.CHUNK_T
NSUB_T = pj.NSUB_T
SUB_ROWS = pj.SUB_ROWS
TILE_KEYS = pj.TILE_KEYS


def _tally_kernel_v3(meta_ref, t0lo, t0hi, t1lo, t1hi, s0_ref, s1_ref,
                     sp_ref, acc_in_hbm, acc_out_hbm, accw, sem_in,
                     sem_out, *, w_part):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    baseb = meta_ref[c] * w_part
    base8 = pl.multiple_of(meta_ref[nc + c], 8)
    din = pltpu.make_async_copy(
        acc_out_hbm.at[pl.ds(base8, w_part), :], accw, sem_in)
    din.start()
    din.wait()

    for s in range(NSUB_T):
        st = meta_ref[2 * nc + c * NSUB_T + s]
        span = meta_ref[2 * nc + nc * NSUB_T + c * NSUB_T + s]
        q0t = s0_ref[s, :].reshape(SUB_ROWS, 1)
        q1t = s1_ref[s, :].reshape(SUB_ROWS, 1)
        relt = sp_ref[s, :].reshape(SUB_ROWS, 1)
        relt = relt - st

        def tally1(eq2, t, arow, _relt=relt):
            maskv = (_relt == t).astype(jnp.float32).reshape(
                1, SUB_ROWS)
            cnt = jax.lax.dot_general(
                maskv, eq2.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            accw[pl.ds(arow, 1), :] += cnt.astype(jnp.int32)

        row0 = st - baseb

        @pl.when(row0 + span <= w_part)
        def _fast(q0t=q0t, q1t=q1t, relt=relt, st=st, span=span,
                  row0=row0):
            # rows row0 and row0+1 unconditionally (row0+1 clamps
            # in-bounds when span == 1; its mask row is then all-zero
            # so the junk compare contributes nothing)
            eq0 = ((q0t == t0lo[pl.ds(row0, 1), :])
                   & (q1t == t1lo[pl.ds(row0, 1), :]))
            r1 = jnp.minimum(row0 + 1, w_part - 1)
            eq1 = ((q0t == t0lo[pl.ds(r1, 1), :])
                   & (q1t == t1lo[pl.ds(r1, 1), :]))
            eq2 = jnp.concatenate(
                [eq0.astype(jnp.float32), eq1.astype(jnp.float32)],
                axis=1)                              # (128, 2048)
            m0 = (relt == 0).astype(jnp.float32)
            m1 = ((relt == 1) & (span > 1)).astype(jnp.float32)
            mask2 = jnp.concatenate(
                [m0.reshape(1, SUB_ROWS), m1.reshape(1, SUB_ROWS)],
                axis=0)                              # (2, 128)
            cnt = jax.lax.dot_general(
                mask2, eq2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (2, 2048)
            arow = st - base8
            accw[pl.ds(arow, 1), :] += cnt[0:1, :TILE_KEYS].astype(
                jnp.int32)
            a1 = jnp.minimum(arow + 1, w_part - 1)
            accw[pl.ds(a1, 1), :] += jnp.where(
                span > 1, cnt[1:2, TILE_KEYS:], 0.0).astype(jnp.int32)

            @pl.when(span > 2)
            def _tail():
                def body(t, _):
                    row = row0 + t
                    eqt = ((q0t == t0lo[pl.ds(row, 1), :])
                           & (q1t == t1lo[pl.ds(row, 1), :]))
                    tally1(eqt, t, st - base8 + t)
                    return 0
                jax.lax.fori_loop(2, span, body, 0)

        @pl.when(row0 + span > w_part)
        def _straddle(q0t=q0t, q1t=q1t, st=st, span=span, row0=row0):
            def body(t, _):
                row = row0 + t
                rlo = jnp.minimum(row, w_part - 1)
                rhi = jnp.maximum(row - w_part, 0)
                in_lo = row < w_part
                v0 = jnp.where(in_lo, t0lo[pl.ds(rlo, 1), :],
                               t0hi[pl.ds(rhi, 1), :])
                v1 = jnp.where(in_lo, t1lo[pl.ds(rlo, 1), :],
                               t1hi[pl.ds(rhi, 1), :])
                eq2 = (q0t == v0) & (q1t == v1)
                tally1(eq2, t, st - base8 + t)
                return 0
            jax.lax.fori_loop(0, span, body, 0)

    dout = pltpu.make_async_copy(
        accw, acc_out_hbm.at[pl.ds(base8, w_part), :], sem_out)
    dout.start()
    dout.wait()


def _tally_call_v3(meta, t0, t1, s0r, s1r, spr, acc, w_part,
                   interpret):
    nc = s0r.shape[0] // NSUB_T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((w_part, TILE_KEYS), lambda c, m: (m[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_part, TILE_KEYS),
                         lambda c, m: (m[c] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_part, TILE_KEYS), lambda c, m: (m[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_part, TILE_KEYS),
                         lambda c, m: (m[c] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB_T, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB_T, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB_T, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((w_part, TILE_KEYS), jnp.int32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_tally_kernel_v3, w_part=w_part),
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={8: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, t0, t0, t1, t1, s0r, s1r, spr, acc)


@functools.partial(
    jax.jit, static_argnames=("k", "p", "w_part", "interpret"))
def join_tally_step_v3(t0, t1, acc, codes, lengths, k, p,
                       w_part=pj.W_PART_TALLY, interpret=False):
    keys, _valid = dev.extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, 2)
    pad = (-flat.shape[0]) % CHUNK_T
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
    nc = n // CHUNK_T
    sp2 = spart.reshape(nc * NSUB_T, SUB_ROWS)
    sub_start = sp2[:, 0]
    sub_span = (sp2[:, -1] - sub_start + 1).astype(jnp.int32)
    first = sub_start.reshape(nc, NSUB_T)[:, 0]
    blk = first // w_part
    base8 = (first // 8) * 8
    last = sp2[:, -1].reshape(nc, NSUB_T)[:, -1]
    overflow = ((jnp.max(last - blk * w_part + 1) > 2 * w_part)
                | (jnp.max(last - base8 + 1) > w_part - 1))
    meta = jnp.concatenate([blk, base8, sub_start, sub_span])
    s0r = s0.reshape(n // 128, 128)
    s1r = s1.reshape(n // 128, 128)
    spr = spart.reshape(n // 128, 128)
    acc_out = _tally_call_v3(meta, t0, t1, s0r, s1r, spr, acc, w_part,
                             interpret)
    return acc_out, overflow


# ── Tally kernel v4: bulk per-chunk transposes ──────────────────────
# v3 measured only −1.1 ms: the dynamic-loop overhead is not the
# dominant per-sub cost.  Suspect: the 3 lane→sublane relayouts per
# sub-chunk (q0t/q1t/relt).  v4 transposes the whole (NSUB_T, 128)
# query block once per chunk and lane-slices (128, 1) columns per sub.


def _tally_kernel_v4(meta_ref, t0lo, t0hi, t1lo, t1hi, s0_ref, s1_ref,
                     sp_ref, acc_in_hbm, acc_out_hbm, accw, sem_in,
                     sem_out, *, w_part, no_dot=False):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    baseb = meta_ref[c] * w_part
    base8 = pl.multiple_of(meta_ref[nc + c], 8)
    din = pltpu.make_async_copy(
        acc_out_hbm.at[pl.ds(base8, w_part), :], accw, sem_in)
    din.start()
    din.wait()

    q0T = s0_ref[...].T          # (128, NSUB_T), one relayout/chunk
    q1T = s1_ref[...].T
    spT = sp_ref[...].T

    for s in range(NSUB_T):
        st = meta_ref[2 * nc + c * NSUB_T + s]
        span = meta_ref[2 * nc + nc * NSUB_T + c * NSUB_T + s]
        q0t = q0T[:, s:s + 1]    # (128, 1) lane slice, no relayout
        q1t = q1T[:, s:s + 1]
        relt = spT[:, s:s + 1] - st

        def tally1(eq2, t, arow, _relt=relt):
            maskv = (_relt == t).astype(jnp.float32).reshape(
                1, SUB_ROWS)
            cnt = jax.lax.dot_general(
                maskv, eq2.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            accw[pl.ds(arow, 1), :] += cnt.astype(jnp.int32)

        row0 = st - baseb

        @pl.when(row0 + span <= w_part)
        def _fast(q0t=q0t, q1t=q1t, relt=relt, st=st, span=span,
                  row0=row0):
            eq0 = ((q0t == t0lo[pl.ds(row0, 1), :])
                   & (q1t == t1lo[pl.ds(row0, 1), :]))
            r1 = jnp.minimum(row0 + 1, w_part - 1)
            eq1 = ((q0t == t0lo[pl.ds(r1, 1), :])
                   & (q1t == t1lo[pl.ds(r1, 1), :]))
            eq2 = jnp.concatenate(
                [eq0.astype(jnp.float32), eq1.astype(jnp.float32)],
                axis=1)                              # (128, 2048)
            arow = st - base8
            if no_dot:
                # diagnostic: skip the MXU reduction to expose the
                # compare + transpose + slice cost alone (NOT exact)
                accw[pl.ds(arow, 1), :] += eq2[0:1, :TILE_KEYS].astype(
                    jnp.int32)
                return
            m0 = (relt == 0).astype(jnp.float32)
            m1 = ((relt == 1) & (span > 1)).astype(jnp.float32)
            mask2 = jnp.concatenate(
                [m0.reshape(1, SUB_ROWS), m1.reshape(1, SUB_ROWS)],
                axis=0)                              # (2, 128)
            cnt = jax.lax.dot_general(
                mask2, eq2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (2, 2048)
            accw[pl.ds(arow, 1), :] += cnt[0:1, :TILE_KEYS].astype(
                jnp.int32)
            a1 = jnp.minimum(arow + 1, w_part - 1)
            accw[pl.ds(a1, 1), :] += jnp.where(
                span > 1, cnt[1:2, TILE_KEYS:], 0.0).astype(jnp.int32)

            @pl.when(span > 2)
            def _tail():
                def body(t, _):
                    row = row0 + t
                    eqt = ((q0t == t0lo[pl.ds(row, 1), :])
                           & (q1t == t1lo[pl.ds(row, 1), :]))
                    tally1(eqt, t, st - base8 + t)
                    return 0
                jax.lax.fori_loop(2, span, body, 0)

        @pl.when(row0 + span > w_part)
        def _straddle(q0t=q0t, q1t=q1t, st=st, span=span, row0=row0):
            def body(t, _):
                row = row0 + t
                rlo = jnp.minimum(row, w_part - 1)
                rhi = jnp.maximum(row - w_part, 0)
                in_lo = row < w_part
                v0 = jnp.where(in_lo, t0lo[pl.ds(rlo, 1), :],
                               t0hi[pl.ds(rhi, 1), :])
                v1 = jnp.where(in_lo, t1lo[pl.ds(rlo, 1), :],
                               t1hi[pl.ds(rhi, 1), :])
                eq2 = (q0t == v0) & (q1t == v1)
                tally1(eq2, t, st - base8 + t)
                return 0
            jax.lax.fori_loop(0, span, body, 0)

    dout = pltpu.make_async_copy(
        accw, acc_out_hbm.at[pl.ds(base8, w_part), :], sem_out)
    dout.start()
    dout.wait()


def _tally_call_v4(meta, t0, t1, s0r, s1r, spr, acc, w_part,
                   interpret, no_dot=False):
    nc = s0r.shape[0] // NSUB_T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((w_part, TILE_KEYS), lambda c, m: (m[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_part, TILE_KEYS),
                         lambda c, m: (m[c] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_part, TILE_KEYS), lambda c, m: (m[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_part, TILE_KEYS),
                         lambda c, m: (m[c] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB_T, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB_T, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB_T, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((w_part, TILE_KEYS), jnp.int32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_tally_kernel_v4, w_part=w_part,
                          no_dot=no_dot),
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={8: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, t0, t0, t1, t1, s0r, s1r, spr, acc)


@functools.partial(
    jax.jit,
    static_argnames=("k", "p", "w_part", "interpret", "no_dot",
                     "fused_extract"))
def join_tally_step_v4(t0, t1, acc, codes, lengths, k, p,
                       w_part=pj.W_PART_TALLY, interpret=False,
                       no_dot=False, fused_extract=False):
    if fused_extract:
        from kmer_denovo_filter_tpu.ops.pallas_extract import (
            extract_mixed,
        )
        hi2, lo2 = extract_mixed(codes, lengths, k,
                                 interpret=interpret)
        hi = hi2.reshape(-1)
        lo = lo2.reshape(-1)
        pad = (-hi.shape[0]) % CHUNK_T
        if pad:
            hi = jnp.concatenate(
                [hi, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
            lo = jnp.concatenate(
                [lo, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
    else:
        keys, _valid = dev.extract_canonical_windows(codes, lengths, k)
        flat = keys.reshape(-1, 2)
        pad = (-flat.shape[0]) % CHUNK_T
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.full((pad, 2), jnp.uint32(0xFFFFFFFF))],
                axis=0)
        w0, w1 = flat[:, 0], flat[:, 1]
        sent = ((w0 == jnp.uint32(0xFFFFFFFF))
                & (w1 == jnp.uint32(0xFFFFFFFF)))
        h, low = pj._mix_keys(w0, w1)
        hi = jnp.where(sent, jnp.uint32(0xFFFFFFFF), h)
        lo = jnp.where(sent, jnp.uint32(0xFFFFFFFF), low)
    n = hi.shape[0]
    s0, s1 = jax.lax.sort((hi, lo), num_keys=1)
    spart = pj._part_from_hi(s0, p)
    nc = n // CHUNK_T
    sp2 = spart.reshape(nc * NSUB_T, SUB_ROWS)
    sub_start = sp2[:, 0]
    sub_span = (sp2[:, -1] - sub_start + 1).astype(jnp.int32)
    first = sub_start.reshape(nc, NSUB_T)[:, 0]
    blk = first // w_part
    base8 = (first // 8) * 8
    last = sp2[:, -1].reshape(nc, NSUB_T)[:, -1]
    overflow = ((jnp.max(last - blk * w_part + 1) > 2 * w_part)
                | (jnp.max(last - base8 + 1) > w_part - 1))
    meta = jnp.concatenate([blk, base8, sub_start, sub_span])
    s0r = s0.reshape(n // 128, 128)
    s1r = s1.reshape(n // 128, 128)
    spr = spart.reshape(n // 128, 128)
    acc_out = _tally_call_v4(meta, t0, t1, s0r, s1r, spr, acc, w_part,
                             interpret, no_dot)
    return acc_out, overflow


def run_kernel(rng, genome):
    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
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
    t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
    acc = jnp.zeros(t0.shape, jnp.int32)
    real = perm >= 0
    pad_rows = t0.shape[0] - perm.shape[0]
    real_full = np.concatenate(
        [real, np.zeros((pad_rows, real.shape[1]), bool)])

    def real_tally(a):
        return np.asarray(a)[:perm.shape[0]][real]

    # parity on real (non-padding) slots
    a1, ov1 = pj.join_tally_step(t0j, t1j, acc, codes, lengths, K, p)
    a4, ov4 = join_tally_step_v4(t0j, t1j, acc, codes, lengths, K, p)
    af, ovf = join_tally_step_v4(t0j, t1j, acc, codes, lengths, K, p,
                                 fused_extract=True)
    assert not bool(ov1) and not bool(ov4) and not bool(ovf)
    same4 = np.array_equal(real_tally(a1), real_tally(a4))
    samef = np.array_equal(real_tally(a1), real_tally(af))
    print(f"tally v4 parity: {same4}  fused-extract parity: {samef}",
          flush=True)
    assert same4 and samef
    timeit("tally v1 full step",
           lambda a, c, l: pj.join_tally_step(
               t0j, t1j, a, c, l, K, p)[0], acc, codes, lengths)
    timeit("tally v3 full step",
           lambda a, c, l: join_tally_step_v3(
               t0j, t1j, a, c, l, K, p)[0], acc, codes, lengths)
    timeit("tally v4 full step",
           lambda a, c, l: join_tally_step_v4(
               t0j, t1j, a, c, l, K, p)[0], acc, codes, lengths)
    timeit("tally v4 no-dot (diagnostic)",
           lambda a, c, l: join_tally_step_v4(
               t0j, t1j, a, c, l, K, p, no_dot=True)[0],
           acc, codes, lengths)
    timeit("tally v4 + fused extract",
           lambda a, c, l: join_tally_step_v4(
               t0j, t1j, a, c, l, K, p, fused_extract=True)[0],
           acc, codes, lengths)

    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed
    timeit("extract_mixed alone",
           lambda c, l: extract_mixed(c, l, K)[0][:1, :1],
           codes, lengths)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 4 << 20, dtype=np.uint8)
    if which in ("extract", "all"):
        run_extract(rng, genome)
    if which in ("sort", "all"):
        run_sort(rng, genome)
    if which in ("kernel",):
        run_kernel(rng, genome)
    if which in ("pieces5",):
        run_pieces5(rng, genome)
    if which in ("v5",):
        run_v5(rng, genome)
    if which in ("prof5",):
        run_prof5(rng, genome)
    if which in ("xextract",):
        run_xextract(rng, genome)
    if which in ("xextract3",):
        run_xextract3(rng, genome)
    if which in ("s1",):
        run_s1(rng, genome)
    if which in ("xmicro",):
        run_xmicro(rng, genome)
    if which in ("xfloor",):
        run_xfloor(rng, genome)
    if which in ("v5m",):
        run_v5m(rng, genome)
    if which in ("v5w",):
        run_v5w(rng, genome)




# ── v5 pieces: primitive costs for the dedup-join pipeline ──────────
# Batch-local dedup before the join: segmented local sort → run-length
# weights → log-shift compaction (monotone-rank pull shifts, no
# scatter) → small global sort → weighted kernel.  These timings
# validate the stage budget before the pipeline is built.

def run_pieces5(rng, genome):
    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    keys, _ = jax.jit(dev.extract_canonical_windows,
                      static_argnames=("k",))(codes, lengths, K)
    flat = np.asarray(keys).reshape(-1, 2)
    pad = (-flat.shape[0]) % 8192
    flat = np.concatenate(
        [flat, np.full((pad, 2), 0xFFFFFFFF, np.uint32)])
    h, lo = pj.mix_keys_np(flat[:, 0], flat[:, 1])
    n = h.shape[0]
    print(f"n={n}")
    LC = 8192
    nloc = n // LC
    h2 = jnp.asarray(h.reshape(nloc, LC))
    l2 = jnp.asarray(lo.reshape(nloc, LC))

    seg_sort = jax.jit(lambda a, b: jax.lax.sort(
        (a, b), dimension=1, num_keys=1))
    timeit("seg sort (512,8192) 2op nk=1", seg_sort, h2, l2)
    seg_sort3 = jax.jit(lambda a, b, c: jax.lax.sort(
        (a, b, c), dimension=1, num_keys=1))
    i2 = jnp.tile(jnp.arange(LC, dtype=jnp.int32)[None, :], (nloc, 1))
    timeit("seg sort (512,8192) 3op nk=1", seg_sort3, h2, l2, i2)

    hs, ls = seg_sort(h2, l2)

    @jax.jit
    def flags_and_d(hs, ls):
        prev_h = jnp.pad(hs[:, :-1], ((0, 0), (1, 0)),
                         constant_values=0x12345678)
        prev_l = jnp.pad(ls[:, :-1], ((0, 0), (1, 0)))
        st = (hs != prev_h) | (ls != prev_l)
        rank = jnp.cumsum(st.astype(jnp.int32), axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, hs.shape, 1)
        d = col - rank + 1
        return st, rank, d

    timeit("flags + cumsum + d", lambda a, b: flags_and_d(a, b)[2][:1, :1],
           hs, ls)

    st, rank, d = flags_and_d(hs, ls)

    @functools.partial(jax.jit, static_argnames=("u_chunk",))
    def compact(hs, ls, st, rank, d, u_chunk=2048):
        col = jax.lax.broadcasted_iota(jnp.int32, hs.shape, 1)
        # payload: original column (13b) for weight-by-diff, d (13b),
        # live (1b)
        wd = (col << 14) | (d & 0x3FFF)
        live = st
        for j in range(13):
            s = 1 << j
            def shl(a, fill):
                return jnp.concatenate(
                    [a[:, s:], jnp.full((a.shape[0], s), fill,
                                        a.dtype)], axis=1)
            src_live = shl(live, False)
            src_wd = shl(wd, 0)
            flag = src_live & (((src_wd >> j) & 1) == 1)
            stays = live & (((wd >> j) & 1) == 0)
            hs = jnp.where(flag, shl(hs, 0), hs)
            ls = jnp.where(flag, shl(ls, 0), ls)
            wd = jnp.where(flag, src_wd, wd)
            live = flag | stays
        hs2, ls2, wd2 = hs, ls, wd
        u_c = rank[:, -1:]
        colu = jax.lax.broadcasted_iota(jnp.int32, hs.shape, 1)
        live_f = colu < u_c
        pos = (wd2 >> 14) & 0x3FFF
        nxt = jnp.concatenate(
            [pos[:, 1:], jnp.full((pos.shape[0], 1), LC, jnp.int32)],
            axis=1)
        nxt_live = jnp.concatenate(
            [live_f[:, 1:], jnp.zeros((pos.shape[0], 1), bool)],
            axis=1)
        nxt = jnp.where(nxt_live, nxt, LC)
        wgt = jnp.where(live_f, nxt - pos, 0)
        return (hs2[:, :u_chunk], ls2[:, :u_chunk],
                wgt[:, :u_chunk], jnp.max(u_c))

    timeit("compaction 13 pull steps",
           lambda a, b, c, e, f: compact(a, b, c, e, f)[3],
           hs, ls, st, rank, d)

    hc, lc, wc, umax = jax.jit(compact)(hs, ls, st, rank, d)
    print(f"max local uniques: {int(umax)} (cap 2048)")
    # host-side correctness of compaction: weights of real rows should
    # sum to LC per chunk
    wsum = np.asarray(jnp.sum(wc, axis=1))
    print("weight sums == LC:", bool((wsum == LC).all()))

    hcf = hc.reshape(-1)
    lcf = lc.reshape(-1)
    wcf = wc.reshape(-1)
    gsort = jax.jit(lambda a, b, c: jax.lax.sort(
        (a, b, c), num_keys=1))
    timeit(f"global sort {hcf.shape[0]} rows 3op", gsort, hcf, lcf,
           wcf)

    cum = jax.jit(lambda a: jnp.cumsum(a, axis=1))
    timeit("bare cumsum (512,8192)", cum,
           jnp.asarray(st.astype(jnp.int32)))




# ── v5: batch-local dedup join ──────────────────────────────────────
# Fused Pallas extract+mix → segmented local sort (8192-row chunks) →
# run-length dedup via monotone-rank log-shift compaction (no scatter)
# → small global 3-operand sort → WEIGHTED tile-join kernel.  At 40×
# coverage the compacted stream is ~4× smaller than the raw window
# stream, shrinking both the global sort and the join.

LCHUNK5 = 8192
CHUNK_T5 = 4096
NSUB_T5 = CHUNK_T5 // SUB_ROWS


def _tally_kernel_w(meta_ref, t0lo, t0hi, t1lo, t1hi, s0_ref, s1_ref,
                    sp_ref, w_ref, acc_in_hbm, acc_out_hbm, accw,
                    sem_in, sem_out, *, w_part):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    baseb = meta_ref[c] * w_part
    base8 = pl.multiple_of(meta_ref[nc + c], 8)
    din = pltpu.make_async_copy(
        acc_out_hbm.at[pl.ds(base8, w_part), :], accw, sem_in)
    din.start()
    din.wait()

    for s in range(NSUB_T5):
        st = meta_ref[2 * nc + c * NSUB_T5 + s]
        span = meta_ref[2 * nc + nc * NSUB_T5 + c * NSUB_T5 + s]
        q0t = s0_ref[s, :].reshape(SUB_ROWS, 1)
        q1t = s1_ref[s, :].reshape(SUB_ROWS, 1)
        relt = sp_ref[s, :].reshape(SUB_ROWS, 1) - st
        wt = w_ref[s, :].reshape(SUB_ROWS, 1).astype(jnp.float32)

        def tally(eq2, t, arow, _relt=relt, _wt=wt):
            maskv = jnp.where(_relt == t, _wt, 0.0).reshape(
                1, SUB_ROWS)
            cnt = jax.lax.dot_general(
                maskv, eq2.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            accw[pl.ds(arow, 1), :] += cnt.astype(jnp.int32)

        @pl.when(st - baseb + span <= w_part)
        def _fast(q0t=q0t, q1t=q1t, st=st, span=span):
            def body(t, _):
                row = st - baseb + t
                eq2 = ((q0t == t0lo[pl.ds(row, 1), :])
                       & (q1t == t1lo[pl.ds(row, 1), :]))
                tally(eq2, t, st - base8 + t)
                return 0
            jax.lax.fori_loop(0, span, body, 0)

        @pl.when(st - baseb + span > w_part)
        def _straddle(q0t=q0t, q1t=q1t, st=st, span=span):
            def body(t, _):
                row = st - baseb + t
                rlo = jnp.minimum(row, w_part - 1)
                rhi = jnp.maximum(row - w_part, 0)
                in_lo = row < w_part
                v0 = jnp.where(in_lo, t0lo[pl.ds(rlo, 1), :],
                               t0hi[pl.ds(rhi, 1), :])
                v1 = jnp.where(in_lo, t1lo[pl.ds(rlo, 1), :],
                               t1hi[pl.ds(rhi, 1), :])
                eq2 = (q0t == v0) & (q1t == v1)
                tally(eq2, t, st - base8 + t)
                return 0
            jax.lax.fori_loop(0, span, body, 0)

    dout = pltpu.make_async_copy(
        accw, acc_out_hbm.at[pl.ds(base8, w_part), :], sem_out)
    dout.start()
    dout.wait()


def _tally_call_w(meta, t0, t1, s0r, s1r, spr, wr, acc, w_part,
                  interpret):
    nc = s0r.shape[0] // NSUB_T5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((w_part, TILE_KEYS), lambda c, m: (m[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_part, TILE_KEYS),
                         lambda c, m: (m[c] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_part, TILE_KEYS), lambda c, m: (m[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_part, TILE_KEYS),
                         lambda c, m: (m[c] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB_T5, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB_T5, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB_T5, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB_T5, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((w_part, TILE_KEYS), jnp.int32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_tally_kernel_w, w_part=w_part),
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={9: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, t0, t0, t1, t1, s0r, s1r, spr, wr, acc)


def _dedup_compact(hi, lo, u_chunk):
    """Sorted-with-duplicates flat stream → compacted (keys, weights).

    Segmented 8192-row local sort, adjacent-pair run detection, and a
    13-step monotone-rank pull-shift compaction (collision-free for
    non-decreasing shift distances — no scatter anywhere).  Returns
    flat (hi, lo, wgt) of nloc*u_chunk rows plus an overflow flag
    (some chunk had more than u_chunk uniques).  Rows past a chunk's
    unique count keep stale in-chunk key values with weight 0 —
    harmless to the weighted join and still hash-local.
    """
    n = hi.shape[0]
    nloc = n // LCHUNK5
    h2 = hi.reshape(nloc, LCHUNK5)
    l2 = lo.reshape(nloc, LCHUNK5)
    hs, ls = jax.lax.sort((h2, l2), dimension=1, num_keys=1)
    prev_h = jnp.pad(hs[:, :-1], ((0, 0), (1, 0)),
                     constant_values=0x12345678)
    prev_l = jnp.pad(ls[:, :-1], ((0, 0), (1, 0)))
    st = (hs != prev_h) | (ls != prev_l)
    rank = jnp.cumsum(st.astype(jnp.int32), axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, hs.shape, 1)
    d = col - rank + 1
    wd = (col << 14) | (d & 0x3FFF)
    live = st
    for j in range(13):
        s = 1 << j

        def shl(a, fill, _s=s):
            return jnp.concatenate(
                [a[:, _s:],
                 jnp.full((a.shape[0], _s), fill, a.dtype)], axis=1)

        src_live = shl(live, False)
        src_wd = shl(wd, 0)
        flag = src_live & (((src_wd >> j) & 1) == 1)
        stays = live & (((wd >> j) & 1) == 0)
        hs = jnp.where(flag, shl(hs, jnp.uint32(0xFFFFFFFF)), hs)
        ls = jnp.where(flag, shl(ls, jnp.uint32(0xFFFFFFFF)), ls)
        wd = jnp.where(flag, src_wd, wd)
        live = flag | stays
    u_c = rank[:, -1:]
    live_f = col < u_c
    pos = (wd >> 14) & 0x3FFF
    nxt = jnp.concatenate(
        [pos[:, 1:],
         jnp.full((nloc, 1), LCHUNK5, jnp.int32)], axis=1)
    nxt_live = jnp.concatenate(
        [live_f[:, 1:], jnp.zeros((nloc, 1), bool)], axis=1)
    nxt = jnp.where(nxt_live, nxt, LCHUNK5)
    wgt = jnp.where(live_f, nxt - pos, 0)
    overflow = jnp.max(u_c) > u_chunk
    return (hs[:, :u_chunk].reshape(-1),
            ls[:, :u_chunk].reshape(-1),
            wgt[:, :u_chunk].reshape(-1), overflow)


@functools.partial(
    jax.jit,
    static_argnames=("k", "p", "w_part", "u_chunk", "interpret"))
def join_tally_step_v5(t0, t1, acc, codes, lengths, k, p,
                       w_part=256, u_chunk=2048,
                       interpret=False):
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed
    hi2, lo2 = extract_mixed(codes, lengths, k, interpret=interpret)
    hi = hi2.reshape(-1)
    lo = lo2.reshape(-1)
    pad = (-hi.shape[0]) % LCHUNK5
    if pad:
        hi = jnp.concatenate(
            [hi, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
        lo = jnp.concatenate(
            [lo, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
    hc, lc, wc, ovf_u = _dedup_compact(hi, lo, u_chunk)
    s0, s1, sw = jax.lax.sort((hc, lc, wc), num_keys=1)
    n2 = s0.shape[0]
    pad2 = (-n2) % CHUNK_T5
    if pad2:
        s0 = jnp.concatenate(
            [s0, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
        s1 = jnp.concatenate(
            [s1, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
        sw = jnp.concatenate([sw, jnp.zeros(pad2, jnp.int32)])
        n2 += pad2
    spart = pj._part_from_hi(s0, p)
    nc = n2 // CHUNK_T5
    sp2 = spart.reshape(nc * NSUB_T5, SUB_ROWS)
    sub_start = sp2[:, 0]
    sub_span = (sp2[:, -1] - sub_start + 1).astype(jnp.int32)
    first = sub_start.reshape(nc, NSUB_T5)[:, 0]
    blk = first // w_part
    base8 = (first // 8) * 8
    last = sp2[:, -1].reshape(nc, NSUB_T5)[:, -1]
    overflow = (ovf_u
                | (jnp.max(last - blk * w_part + 1) > 2 * w_part)
                | (jnp.max(last - base8 + 1) > w_part))
    meta = jnp.concatenate([blk, base8, sub_start, sub_span])
    s0r = s0.reshape(n2 // 128, 128)
    s1r = s1.reshape(n2 // 128, 128)
    spr = spart.reshape(n2 // 128, 128)
    swr = sw.reshape(n2 // 128, 128)
    acc_out = _tally_call_w(meta, t0, t1, s0r, s1r, spr, swr, acc,
                            w_part, interpret)
    return acc_out, overflow


def run_v5(rng, genome):
    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
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
    t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
    acc = jnp.zeros(t0.shape, jnp.int32)
    real = perm >= 0

    def real_tally(a):
        return np.asarray(a)[:perm.shape[0]][real]

    a1, ov1 = pj.join_tally_step(t0j, t1j, acc, codes, lengths, K, p)
    a5, ov5 = join_tally_step_v5(t0j, t1j, acc, codes, lengths, K, p)
    print(f"overflow v1={bool(ov1)} v5={bool(ov5)}", flush=True)
    same = np.array_equal(real_tally(a1), real_tally(a5))
    print(f"v5 parity: {same}", flush=True)
    assert not bool(ov5)
    assert same
    timeit("tally v1 full step",
           lambda a, c, l: pj.join_tally_step(
               t0j, t1j, a, c, l, K, p)[0], acc, codes, lengths)
    timeit("tally v5 full step (dedup)",
           lambda a, c, l: join_tally_step_v5(
               t0j, t1j, a, c, l, K, p)[0], acc, codes, lengths)



# ── v5 cumulative-prefix profile + knob sweep ───────────────────────

def run_prof5(rng, genome):
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed

    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
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
    t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
    acc = jnp.zeros(t0.shape, jnp.int32)
    print(f"p={p}", flush=True)

    LC = pj.LCHUNK_DD

    @functools.partial(jax.jit, static_argnames=("k",))
    def p0(codes, lengths, k):
        hi2, lo2 = extract_mixed(codes, lengths, k)
        return hi2[:1, :1], lo2[:1, :1]

    @functools.partial(jax.jit, static_argnames=("k", "u_chunk"))
    def p1(codes, lengths, k, u_chunk=2048):
        hi2, lo2 = extract_mixed(codes, lengths, k)
        hi = hi2.reshape(-1)
        lo = lo2.reshape(-1)
        hc, lc, wc, ovf = pj._dedup_compact(hi, lo, u_chunk)
        return hc[:1], lc[:1], wc[:1]

    @functools.partial(jax.jit, static_argnames=("k", "u_chunk"))
    def p2(codes, lengths, k, u_chunk=2048):
        hi2, lo2 = extract_mixed(codes, lengths, k)
        hi = hi2.reshape(-1)
        lo = lo2.reshape(-1)
        hc, lc, wc, ovf = pj._dedup_compact(hi, lo, u_chunk)
        s0, s1, sw = jax.lax.sort((hc, lc, wc), num_keys=1)
        return s0[:1], s1[:1], sw[:1]

    timeit("p0 extract_mixed", p0, codes, lengths, K)
    timeit("p1 + dedup_compact", p1, codes, lengths, K)
    timeit("p2 + global sort", p2, codes, lengths, K)
    timeit("p3 full (u=2048, w=256)",
           lambda a, c, l: pj.join_tally_step_dedup(
               t0j, t1j, a, c, l, K, p)[0], acc, codes, lengths)

    real = perm >= 0

    def real_tally(a):
        return np.asarray(a)[:perm.shape[0]][real]

    a1, _ = pj.join_tally_step(t0j, t1j, acc, codes, lengths, K, p)
    base = real_tally(a1)
    for u_c, w_p in ((1792, 256), (1792, 320), (2048, 320)):
        a5, os_, ou_ = pj.join_tally_step_dedup(
            t0j, t1j, acc, codes, lengths, K, p, w_part=w_p,
            u_chunk=u_c)
        okp = np.array_equal(base, real_tally(a5))
        print(f"  u={u_c} w={w_p}: ovf_s={bool(os_)} "
              f"ovf_u={bool(ou_)} parity={okp}", flush=True)
        if bool(os_) or bool(ou_):
            continue
        timeit(f"p3 full (u={u_c}, w={w_p})",
               lambda a, c, l, _u=u_c, _w=w_p: pj.join_tally_step_dedup(
                   t0j, t1j, a, c, l, K, p, w_part=_w,
                   u_chunk=_u)[0], acc, codes, lengths)



# ── extract_mixed variants: why is the fused extract 6.4 ms? ────────

def _make_extract_v2(pad_lanes):
    """extract_mixed with the code block padded to *pad_lanes* lanes
    (128-multiple) so every pltpu.roll acts on an aligned tile."""
    from kmer_denovo_filter_tpu.ops import pallas_extract as px

    def kernel(codes_ref, len_ref, hi_ref, lo_ref, *, k, length,
               s_pad):
        s = length - k + 1
        rem = k % 16
        codes = codes_ref[...].astype(jnp.int32)
        bad = codes >= 4
        clean = jnp.where(bad, 0, codes)
        comp = 3 - clean

        def shl(a, sh):
            rolled = pltpu.roll(a, shift=a.shape[1] - sh, axis=1)
            col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
            return jnp.where(col < a.shape[1] - sh, rolled, 0)

        p = clean
        span = 1
        while span < 16:
            p = (p << (2 * span)) | shl(p, span)
            span *= 2
        pack32 = p.astype(jnp.uint32)
        r = comp
        span = 1
        while span < 16:
            r = r | (shl(r, span) << (2 * span))
            span *= 2
        rpack32 = r.astype(jnp.uint32)
        last_mask = jnp.uint32(((1 << (2 * rem)) - 1) << (32 - 2 * rem))
        f0 = pack32
        f1 = shl(pack32, 16) & last_mask
        r0 = shl(rpack32, k - 16)
        r1 = (rpack32 << (2 * (16 - rem))) & last_mask
        pick_fwd = (f0 < r0) | ((f0 == r0) & (f1 <= r1))
        o = bad.astype(jnp.int32)
        span = 1
        while span * 2 <= k:
            o = o | shl(o, span)
            span *= 2
        if span < k:
            o = o | shl(o, k - span)
        col = jax.lax.broadcasted_iota(jnp.int32, codes.shape, 1)
        ln = len_ref[...].astype(jnp.int32)
        valid = (o == 0) & (col + k <= ln) & (col < s)
        w0 = jnp.where(pick_fwd, f0, r0)
        w1 = jnp.where(pick_fwd, f1, r1)
        h = w0 ^ px._fmix32(w1)
        low = w1 ^ px._fmix32(h)
        h = h ^ px._fmix32(low)
        sent = jnp.uint32(0xFFFFFFFF)
        h = jnp.where(valid, h, sent)
        low = jnp.where(valid, low, sent)
        hi_ref[...] = h[:, :s_pad]
        lo_ref[...] = low[:, :s_pad]

    @functools.partial(
        jax.jit, static_argnames=("k", "block_reads"))
    def extract_v2p(codes, lengths, k, block_reads=256):
        b, length = codes.shape
        s = length - k + 1
        s_pad = -(-s // 128) * 128
        lp = max(pad_lanes, -(-(length + 15) // 128) * 128)
        pad_b = (-b) % block_reads
        codes_p = jnp.pad(
            codes.astype(jnp.int32), ((0, pad_b), (0, lp - length)),
            constant_values=4)
        lens_p = jnp.pad(lengths.astype(jnp.int32), (0, pad_b))
        bp = b + pad_b
        grid = (bp // block_reads,)
        hi, lo = pl.pallas_call(
            functools.partial(kernel, k=k, length=length,
                              s_pad=s_pad),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_reads, lp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_reads, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_reads, s_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_reads, s_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bp, s_pad), jnp.uint32),
                jax.ShapeDtypeStruct((bp, s_pad), jnp.uint32),
            ],
        )(codes_p, lens_p.reshape(bp, 1))
        return hi[:b], lo[:b]

    return extract_v2p


def run_xextract(rng, genome):
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed

    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def p0(codes, lengths, k):
        hi2, lo2 = extract_mixed(codes, lengths, k)
        return hi2[:1, :1], lo2[:1, :1]

    timeit("extract_mixed (prod, L=167)", p0, codes, lengths, K)

    ref_h, ref_l = extract_mixed(codes, lengths, K)
    ref_h = np.asarray(ref_h)
    ref_l = np.asarray(ref_l)
    v2 = _make_extract_v2(256)
    for br in (256, 512, 1024):
        @functools.partial(jax.jit, static_argnames=("k",))
        def pv(codes, lengths, k, _br=br):
            hi2, lo2 = v2(codes, lengths, k, block_reads=_br)
            return hi2[:1, :1], lo2[:1, :1]
        h2, l2 = v2(codes, lengths, K, block_reads=br)
        ok = (np.array_equal(np.asarray(h2), ref_h)
              and np.array_equal(np.asarray(l2), ref_l))
        print(f"  lane-256 br={br} parity={ok}", flush=True)
        timeit(f"extract lane-256 br={br}", pv, codes, lengths, K)



# ── extract v3: swizzle-rc + mask-free rolls ────────────────────────
# rc word0[t] = comp-reversed bases t+k-1..t+k-16 = bitrev2(~pack32)
# shifted — the whole reverse-complement pack chain collapses to ONE
# elementwise 2-bit-group reversal of the forward pack.  With lanes
# padded to 256, roll wrap-around only contaminates lanes >= 225 >
# s=122, so every roll drops its iota/where mask.

def _bitrev2(x):
    """Reverse the sixteen 2-bit groups of each uint32 lane."""
    x = ((x & jnp.uint32(0x33333333)) << 2) | (
        (x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | (
        (x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | (
        (x >> 8) & jnp.uint32(0x00FF00FF))
    x = (x << 16) | (x >> 16)
    return x


def _make_extract_v3():
    from kmer_denovo_filter_tpu.ops import pallas_extract as px

    def kernel(codes_ref, len_ref, hi_ref, lo_ref, *, k, length,
               s_pad, lp):
        s = length - k + 1
        rem = k % 16
        codes = codes_ref[...].astype(jnp.int32)
        bad = codes >= 4
        clean = jnp.where(bad, 0, codes)

        def shl(a, sh):
            return pltpu.roll(a, shift=lp - sh, axis=1)

        p = clean
        span = 1
        while span < 16:
            p = (p << (2 * span)) | shl(p, span)
            span *= 2
        pack32 = p.astype(jnp.uint32)
        S = _bitrev2(~pack32)
        last_mask = jnp.uint32(((1 << (2 * rem)) - 1) << (32 - 2 * rem))
        f0 = pack32
        f1 = shl(pack32, 16).astype(jnp.uint32) & last_mask
        r0 = shl(S, k - 16).astype(jnp.uint32)
        r1 = (S << (2 * (16 - rem))) & last_mask
        pick_fwd = (f0 < r0) | ((f0 == r0) & (f1 <= r1))
        o = bad.astype(jnp.int32)
        span = 1
        while span * 2 <= k:
            o = o | shl(o, span)
            span *= 2
        if span < k:
            o = o | shl(o, k - span)
        col = jax.lax.broadcasted_iota(jnp.int32, codes.shape, 1)
        ln = len_ref[...].astype(jnp.int32)
        valid = (o == 0) & (col + k <= ln) & (col < s)
        w0 = jnp.where(pick_fwd, f0, r0)
        w1 = jnp.where(pick_fwd, f1, r1)
        h = w0 ^ px._fmix32(w1)
        low = w1 ^ px._fmix32(h)
        h = h ^ px._fmix32(low)
        sent = jnp.uint32(0xFFFFFFFF)
        h = jnp.where(valid, h, sent)
        low = jnp.where(valid, low, sent)
        hi_ref[...] = h[:, :s_pad]
        lo_ref[...] = low[:, :s_pad]

    @functools.partial(
        jax.jit, static_argnames=("k", "block_reads"))
    def extract_v3(codes, lengths, k, block_reads=256):
        b, length = codes.shape
        s = length - k + 1
        s_pad = -(-s // 128) * 128
        # wrap contamination from total roll distance ≤ 2k+16 must
        # stay past the valid window columns
        lp = -(-(max(length + 15, s + 2 * k + 16)) // 128) * 128
        pad_b = (-b) % block_reads
        codes_p = jnp.pad(
            codes.astype(jnp.int32), ((0, pad_b), (0, lp - length)),
            constant_values=4)
        lens_p = jnp.pad(lengths.astype(jnp.int32), (0, pad_b))
        bp = b + pad_b
        grid = (bp // block_reads,)
        hi, lo = pl.pallas_call(
            functools.partial(kernel, k=k, length=length, s_pad=s_pad,
                              lp=lp),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_reads, lp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_reads, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_reads, s_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_reads, s_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bp, s_pad), jnp.uint32),
                jax.ShapeDtypeStruct((bp, s_pad), jnp.uint32),
            ],
        )(codes_p, lens_p.reshape(bp, 1))
        return hi[:b], lo[:b]

    return extract_v3


def run_xextract3(rng, genome):
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed

    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths_full = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    # ragged lengths + N bases for parity coverage
    ln = np.full(BATCH_READS, READ_LEN, np.int32)
    ln[::7] = 100
    ln[::11] = 63
    lengths_rag = jnp.asarray(ln)
    cn = np.asarray(codes).copy()
    cn[np.random.default_rng(5).random(cn.shape) < 0.01] = 4
    codes_n = jnp.asarray(cn)

    v3 = _make_extract_v3()
    for cds, lns, tag in ((codes, lengths_full, "clean"),
                          (codes_n, lengths_rag, "ragged+N")):
        ref_h, ref_l = extract_mixed(cds, lns, K)
        h3, l3 = v3(cds, lns, K)
        ok = (np.array_equal(np.asarray(h3), np.asarray(ref_h))
              and np.array_equal(np.asarray(l3), np.asarray(ref_l)))
        print(f"  v3 parity [{tag}]: {ok}", flush=True)
        assert ok

    @functools.partial(jax.jit, static_argnames=("k",))
    def p0(codes, lengths, k):
        hi2, lo2 = extract_mixed(codes, lengths, k)
        return hi2[:1, :1], lo2[:1, :1]

    @functools.partial(jax.jit, static_argnames=("k",))
    def p3(codes, lengths, k):
        hi2, lo2 = v3(codes, lengths, k)
        return hi2[:1, :1], lo2[:1, :1]

    timeit("extract_mixed (prod)", p0, codes, lengths_full, K)
    timeit("extract v3 (swizzle-rc)", p3, codes, lengths_full, K)



# ── S=1 sharded overhead on the real chip (VERDICT item 8) ──────────

def run_s1(rng, genome):
    from kmer_denovo_filter_tpu.parallel import make_mesh
    from kmer_denovo_filter_tpu.parallel.tile_sharded import (
        ShardedTileCounter,
    )

    codes_np = synth_reads(rng, genome, BATCH_READS, READ_LEN)
    codes = jnp.asarray(codes_np)
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    WGS_TABLE_M = 1 << 24
    keys64 = np.unique(rng.integers(0, 2 ** 62, size=WGS_TABLE_M,
                                    dtype=np.uint64))
    keys = np.stack([(keys64 >> 32).astype(np.uint32),
                     keys64.astype(np.uint32)], 1)

    t0, t1, _perm, p = pj.build_tile_partitions(keys)
    t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
    acc = jnp.zeros(t0.shape, jnp.int32)
    dt1 = timeit("single-chip join_tally_step",
                 lambda a, c, l: pj.join_tally_step(
                     t0j, t1j, a, c, l, K, p)[0], acc, codes, lengths)
    dt5 = timeit("single-chip join_tally_step_dedup",
                 lambda a, c, l: pj.join_tally_step_dedup(
                     t0j, t1j, a, c, l, K, p)[0], acc, codes, lengths)

    mesh = make_mesh()
    print(f"mesh devices: {mesh.devices.size}", flush=True)
    stc = ShardedTileCounter(keys, K, mesh)
    stc.feed(codes_np, np.asarray(lengths))
    _ = stc.result()

    def sharded_step(c, l):
        stc.feed(np.asarray(c), np.asarray(l))
        return stc.acc

    dts = timeit("S=1 sharded tile-join feed", sharded_step, codes,
                 lengths)
    print(f"S=1 feed overhead vs plain: {dts / dt1:.3f}x "
          f"(+{(dts - dt1) * 1e3:.2f} ms — includes the per-feed "
          f"host→device upload, ~140 ms through the 35 MB/s relay, "
          f"~0.3 ms on PCIe)", flush=True)

    # compute-only: pre-stage the sharded batch once, time the fused
    # shard_map step alone (the honest S=1 sharding tax)
    codes_d, lens_d, n_loc = stc._shard_reads(codes_np,
                                              np.asarray(lengths))
    cap = stc._cap_for(n_loc)
    step = stc._step_fn(cap, stc.w_part)
    acc0 = stc.acc
    dtc = timeit("S=1 sharded step (pre-staged)",
                 lambda a: step(stc.planes, a, codes_d, lens_d)[0],
                 acc0)
    print(f"S=1 compute overhead vs plain join_tally_step: "
          f"{dtc / dt1:.3f}x ({(dtc - dt1) * 1e3:+.2f} ms); vs dedup "
          f"step: {dtc / dt5:.3f}x", flush=True)



# ── extract kernel stage isolation ──────────────────────────────────
# Cumulative-stage kernels pinpoint where the 6.5 ms goes: load/store
# only, +fwd pack, +rc pack, +N-OR, +canonical pick, +mix (= prod).

def _make_extract_stage(stage):
    from kmer_denovo_filter_tpu.ops import pallas_extract as px

    def kernel(codes_ref, len_ref, hi_ref, lo_ref, *, k, length,
               s_pad):
        s = length - k + 1
        rem = k % 16
        codes = codes_ref[...].astype(jnp.int32)
        bad = codes >= 4
        clean = jnp.where(bad, 0, codes)
        if stage == 0:  # load + trivial store
            h = clean.astype(jnp.uint32)
            low = (clean + 1).astype(jnp.uint32)
            hi_ref[...] = h[:, :s_pad]
            lo_ref[...] = low[:, :s_pad]
            return
        comp = 3 - clean
        p = clean
        span = 1
        while span < 16:
            p = (p << (2 * span)) | px._shift_left(p, span)
            span *= 2
        pack32 = p.astype(jnp.uint32)
        if stage == 1:  # + forward pack
            hi_ref[...] = pack32[:, :s_pad]
            lo_ref[...] = pack32[:, :s_pad]
            return
        r = comp
        span = 1
        while span < 16:
            r = r | (px._shift_left(r, span) << (2 * span))
            span *= 2
        rpack32 = r.astype(jnp.uint32)
        if stage == 2:  # + rc pack
            hi_ref[...] = pack32[:, :s_pad]
            lo_ref[...] = rpack32[:, :s_pad]
            return
        last_mask = jnp.uint32(((1 << (2 * rem)) - 1) << (32 - 2 * rem))
        f0 = pack32
        f1 = px._shift_left(pack32, 16) & last_mask
        r0 = px._shift_left(rpack32, k - 16)
        r1 = (rpack32 << (2 * (16 - rem))) & last_mask
        pick_fwd = (f0 < r0) | ((f0 == r0) & (f1 <= r1))
        w0 = jnp.where(pick_fwd, f0, r0)
        w1 = jnp.where(pick_fwd, f1, r1)
        if stage == 3:  # + canonical pick
            hi_ref[...] = w0[:, :s_pad]
            lo_ref[...] = w1[:, :s_pad]
            return
        o = bad.astype(jnp.int32)
        span = 1
        while span * 2 <= k:
            o = o | px._shift_left(o, span)
            span *= 2
        if span < k:
            o = o | px._shift_left(o, k - span)
        col = jax.lax.broadcasted_iota(jnp.int32, codes.shape, 1)
        ln = len_ref[...].astype(jnp.int32)
        valid = (o == 0) & (col + k <= ln) & (col < s)
        if stage == 4:  # + N-OR/valid
            sent = jnp.uint32(0xFFFFFFFF)
            h = jnp.where(valid, w0, sent)
            low = jnp.where(valid, w1, sent)
            hi_ref[...] = h[:, :s_pad]
            lo_ref[...] = low[:, :s_pad]
            return
        h = w0 ^ px._fmix32(w1)
        low = w1 ^ px._fmix32(h)
        h = h ^ px._fmix32(low)
        sent = jnp.uint32(0xFFFFFFFF)
        h = jnp.where(valid, h, sent)
        low = jnp.where(valid, low, sent)
        hi_ref[...] = h[:, :s_pad]
        lo_ref[...] = low[:, :s_pad]

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(codes, lengths, k, block_reads=256):
        b, length = codes.shape
        s = length - k + 1
        s_pad = -(-s // 128) * 128
        pad_b = (-b) % block_reads
        codes_p = jnp.pad(
            codes.astype(jnp.int32), ((0, pad_b), (0, 15)),
            constant_values=4)
        lens_p = jnp.pad(lengths.astype(jnp.int32), (0, pad_b))
        bp = b + pad_b
        hi, lo = pl.pallas_call(
            functools.partial(kernel, k=k, length=length,
                              s_pad=s_pad),
            grid=(bp // block_reads,),
            in_specs=[
                pl.BlockSpec((block_reads, length + 15),
                             lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_reads, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_reads, s_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_reads, s_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bp, s_pad), jnp.uint32),
                jax.ShapeDtypeStruct((bp, s_pad), jnp.uint32),
            ],
        )(codes_p, lens_p.reshape(bp, 1))
        return hi[:1, :1], lo[:1, :1]

    return run


def run_xmicro(rng, genome):
    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    names = ["load/store", "+fwd pack", "+rc pack", "+canonical",
             "+N-OR/valid", "+mix (=prod)"]
    for st in range(6):
        fn = _make_extract_stage(st)
        timeit(f"stage {st} {names[st]}", fn, codes, lengths, K)



# ── dispatch-floor measurement + batch-size scaling ─────────────────
# stage-0 (pure load/store) costing 7.1 ms exposed a per-call floor:
# measure it with a trivial jit, then amortize via 2×/4× batches.

def run_xfloor(rng, genome):
    tiny = jnp.zeros((8, 128), jnp.int32)

    @jax.jit
    def fid(x):
        return x[:1, :1] + 1

    timeit("trivial jit (dispatch floor)", fid, tiny)

    big = jnp.zeros((32768, 167), jnp.int32)

    @jax.jit
    def fcopy(x):
        return (x * 2)[:1, :1]

    timeit("one-pass 22MB elementwise", fcopy, big)

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
    t0, t1, _perm, p = pj.build_tile_partitions(keys)
    t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
    acc = jnp.zeros(t0.shape, jnp.int32)

    for mult in (1, 2, 4):
        n = BATCH_READS * mult
        codes = jnp.asarray(synth_reads(rng, genome, n, READ_LEN))
        lengths = jnp.full(n, READ_LEN, dtype=jnp.int32)
        a5, os_, ou_ = pj.join_tally_step_dedup(
            t0j, t1j, acc, codes, lengths, K, p)
        print(f"  mult={mult}: ovf_s={bool(os_)} ovf_u={bool(ou_)}",
              flush=True)
        if bool(os_) or bool(ou_):
            continue
        dt = timeit(f"dedup step {n} reads",
                    lambda a, c, l: pj.join_tally_step_dedup(
                        t0j, t1j, a, c, l, K, p)[0],
                    acc, codes, lengths)
        print(f"    = {n / dt / 1e6:.3f} M reads/s", flush=True)



# ── member dedup A/B on the chip ────────────────────────────────────

def run_v5m(rng, genome):
    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
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
    t0, t1, _perm, p = pj.build_tile_partitions(keys)
    t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)

    f1, ov1 = pj.join_member_step(t0j, t1j, codes, lengths, K, p)
    f5, os5, ou5 = pj.join_member_step_dedup(
        t0j, t1j, codes, lengths, K, p)
    print(f"plain ovf={bool(ov1)} dedup ovf_s={bool(os5)} "
          f"ovf_u={bool(ou5)}", flush=True)
    same = np.array_equal(np.asarray(f1), np.asarray(f5))
    print(f"member dedup parity: {same}", flush=True)
    assert same and not bool(os5) and not bool(ou5)
    timeit("member plain full step",
           lambda c, l: pj.join_member_step(
               t0j, t1j, c, l, K, p)[0], codes, lengths)
    timeit("member dedup full step",
           lambda c, l: pj.join_member_step_dedup(
               t0j, t1j, c, l, K, p)[0], codes, lengths)
    acc = jnp.zeros(t0.shape, jnp.int32)
    timeit("tally dedup full step (same session)",
           lambda a, c, l: pj.join_tally_step_dedup(
               t0j, t1j, a, c, l, K, p)[0], acc, codes, lengths)



# ── wide dedup A/B on the chip (k=63) ───────────────────────────────

def run_v5w(rng, genome):
    k, w = 63, 4
    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    WGS_TABLE_M = 1 << 24
    keys = rng.integers(0, 2 ** 32, (WGS_TABLE_M, w), dtype=np.uint32)
    keys[:, -1] &= np.uint32(0xFFFFFFFC)
    # mix in real read-derived keys so the join has hits
    kflat = np.asarray(pj.extract_flat_keys(codes, lengths, k))
    kreal = kflat[(kflat != 0xFFFFFFFF).any(axis=1)]
    keys = np.unique(np.concatenate([keys, kreal[::5]]), axis=0)
    planes_np, perm, p = pj.build_tile_partitions_wide(keys)
    planes = tuple(jnp.asarray(planes_np[j]) for j in range(w))
    acc = jnp.zeros(planes_np[0].shape, jnp.int32)

    flat = pj.extract_flat_keys(codes, lengths, k)
    a1, ov1 = pj.join_tally_flat_wide(planes, acc, flat, p)
    u, wp = pj.U_CHUNK_DD, pj.W_PART_TALLY
    while True:
        a5, os5, ou5 = pj.join_tally_flat_wide_dedup(
            planes, acc, flat, p, w_part=wp, u_chunk=u)
        print(f"  u={u} wp={wp}: ovf_s={bool(os5)} ovf_u={bool(ou5)}",
              flush=True)
        if not bool(os5) and not bool(ou5):
            break
        if bool(ou5):
            u *= 2
        if bool(os5):
            wp = min(wp * 2, pj.wide_dd_w_part_cap(w))
        assert u <= pj.LCHUNK_DD
    real = perm >= 0
    r1 = np.asarray(a1)[:perm.shape[0]][real]
    r5 = np.asarray(a5)[:perm.shape[0]][real]
    same = np.array_equal(r1, r5)
    print(f"wide dedup parity: {same} (hits {r1.sum()})", flush=True)
    assert same

    timeit("wide tally plain (full step incl extract)",
           lambda a, c, l: pj.join_tally_step_wide(
               planes, a, c, l, k, p)[0], acc, codes, lengths)

    # two separate jits (extract / dedup-join): fusing them into one
    # HLO exceeds the remote compile service's request size limit
    def dd_step(a, c, l):
        fl = pj.extract_flat_keys(c, l, k)
        return pj.join_tally_flat_wide_dedup(
            planes, a, fl, p, w_part=wp, u_chunk=u)[0]

    timeit("wide tally dedup (extract + join jits)", dd_step,
           acc, codes, lengths)

if __name__ == "__main__":
    main()
