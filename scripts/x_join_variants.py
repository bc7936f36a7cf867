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


if __name__ == "__main__":
    main()
