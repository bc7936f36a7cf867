#!/usr/bin/env python3
"""Round-5 experiments: fused extract -> segmented sort -> dedup.

The round-4 budget (PERF.md) puts the WGS dedup-tally step at ~15.2 ms
of real per-batch work: extract ~3.0 (after subtracting the ~3.4 ms
relay dispatch floor), local sort+flags+compaction 5.8, global sort
2.4, join kernel+meta 4.35.  The extract and local-dedup stages move
~130 MB through HBM between jit-visible ops; fusing them into one
Mosaic kernel (codes in, compacted uniques out) cuts that to ~17 MB.
The open question is the in-VMEM segmented sort: this script builds a
standalone 8192-element bitonic sorter (key = mixed hi word, payloads
ride along) and times it against the XLA segmented sort it would
replace.

Usage: python scripts/x_fused.py [sort|fused|...]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmer_denovo_filter_tpu.ops import pallas_join as pj

K = 31
READ_LEN = 152
BATCH_READS = 32768
N_REP = 8
COVERAGE = 40

LC = 8192          # segment length
ROWS = 64          # (ROWS, 128) VMEM layout of one segment
LANES = 128


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


# ── segmented bitonic sort kernel ───────────────────────────────────
# One grid step sorts one 8192-element segment held as a (64, 128)
# int32/uint32 tile set in VMEM, flat index i = row*128 + lane.
# Exchange partners i ^ j are reached with two pltpu.rolls (axis 1 for
# j < 128, axis 0 for j >= 128); direction bit (i & kk) comes from an
# iota plane.  Ties compare strictly so payloads never duplicate.


def _flat_roll(x, s, up):
    """roll the (ROWS, LANES) plane by s flat positions under the
    LANE-MAJOR index map i = lane*ROWS + row (s a power of two).
    up=True: value from i - s; else from i + s.

    Lane-major puts strides < ROWS on the cheap sublane axis; only 28
    of the 91 bitonic stages touch the expensive lane axis (vs 70 for
    the row-major map).
    """
    if s >= ROWS:
        js = s // ROWS
        return pltpu.roll(x, shift=(js if up else LANES - js), axis=1)
    return pltpu.roll(x, shift=(s if up else ROWS - s), axis=0)


def _bitonic_sort(h, payloads, row_iota, lane_iota):
    """In-register bitonic sort of 8192 elements by key h (uint32
    compare on the mixed word), payloads following.  Order is by the
    lane-major flat index (see _flat_roll) — an arbitrary but
    consistent bijection, which is all segment-local dedup needs."""
    kk = 2
    while kk <= LC:
        j = kk >> 1
        while j >= 1:
            if j >= ROWS:
                jb = j // ROWS
                is_low = (lane_iota & jb) == 0
            else:
                is_low = (row_iota & j) == 0
            if kk > LC // 2:
                dirb = None          # final merge: ascending everywhere
            elif kk >= ROWS:
                dirb = (lane_iota & (kk // ROWS)) != 0
            else:
                dirb = (row_iota & kk) != 0
            down_h = _flat_roll(h, j, up=False)
            up_h = _flat_roll(h, j, up=True)
            other_h = jnp.where(is_low, down_h, up_h)
            s_gt = h > other_h
            s_lt = h < other_h
            # boolean selects via logic (Mosaic rejects i1 `where`)
            swap_asc = (is_low & s_gt) | (~is_low & s_lt)
            if dirb is None:
                take = swap_asc
            else:
                swap_desc = (is_low & s_lt) | (~is_low & s_gt)
                take = (dirb & swap_desc) | (~dirb & swap_asc)
            h = jnp.where(take, other_h, h)
            new_p = []
            for pld in payloads:
                down_p = _flat_roll(pld, j, up=False)
                up_p = _flat_roll(pld, j, up=True)
                other_p = jnp.where(is_low, down_p, up_p)
                new_p.append(jnp.where(take, other_p, pld))
            payloads = new_p
            j >>= 1
        kk <<= 1
    return h, payloads


def _sort_kernel(h_ref, l_ref, ho_ref, lo_ref):
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    h = h_ref[0]
    l = l_ref[0]
    h, (l,) = _bitonic_sort(h, (l,), row_iota, lane_iota)
    ho_ref[0] = h
    lo_ref[0] = l


@jax.jit
def seg_sort_pallas(h2, l2):
    """Sort each 8192-row segment of (nloc, 8192) planes by h."""
    nloc = h2.shape[0]
    h3 = h2.reshape(nloc, ROWS, LANES)
    l3 = l2.reshape(nloc, ROWS, LANES)
    ho, lo = pl.pallas_call(
        _sort_kernel,
        grid=(nloc,),
        in_specs=[
            pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nloc, ROWS, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nloc, ROWS, LANES), jnp.uint32),
        ],
    )(h3, l3)
    return ho.reshape(nloc, LC), lo.reshape(nloc, LC)


def _mixed_planes(rng, genome):
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed
    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    hi2, lo2 = extract_mixed(codes, lengths, K)
    n = hi2.shape[0] * hi2.shape[1]
    nloc = n // LC
    return (jnp.asarray(np.asarray(hi2).reshape(nloc, LC)),
            jnp.asarray(np.asarray(lo2).reshape(nloc, LC)))


def run_sort(rng, genome):
    h2, l2 = _mixed_planes(rng, genome)
    print(f"segments: {h2.shape}", flush=True)

    seg_sort_x = jax.jit(lambda a, b: jax.lax.sort(
        (a, b), dimension=1, num_keys=1))
    timeit("XLA seg sort 2op nk=1", seg_sort_x, h2, l2)

    hp, lp = seg_sort_pallas(h2, l2)
    hx, lx = seg_sort_x(h2, l2)
    # pallas order is the lane-major flat index: rank(row, lane) =
    # lane*ROWS + row — transpose back for comparison
    def unmap(a):
        return (np.asarray(a).reshape(-1, ROWS, LANES)
                .transpose(0, 2, 1).reshape(-1, LC))
    hp_n, lp_n = unmap(hp), unmap(lp)
    hx_n = np.asarray(hx)
    print("  key parity:", np.array_equal(hp_n, hx_n), flush=True)
    # payload parity: equal multisets per (segment, key) run; cheap
    # check — sort (h, l) pairs on host and compare
    pn = np.sort(hp_n.astype(np.uint64) << 32 | lp_n, axis=1)
    xn = np.sort(hx_n.astype(np.uint64) << 32 | np.asarray(lx), axis=1)
    print("  pair parity:", np.array_equal(pn, xn), flush=True)
    timeit("pallas seg sort (key+1 payload)", seg_sort_pallas, h2, l2)


# ── cumulative-prefix profile of join_tally_step_dedup ──────────────
# Re-derives the in-step budget same-session (the per-call dispatch
# floor swings 1.7-3.5 ms across sessions; only prefix differences
# inside one session attribute cost correctly).

def _wgs_table(rng, genome):
    from kmer_denovo_filter_tpu.ops import device as dev
    gcodes = jnp.asarray(np.asarray(genome).reshape(-1, 256))
    glens = jnp.full(gcodes.shape[0], 256, dtype=np.int32)
    gkeys, gvalid = dev.extract_canonical_windows(gcodes, glens, K)
    gk = np.asarray(gkeys)[np.asarray(gvalid)]
    g64 = (gk[:, 0].astype(np.uint64) << 32) | gk[:, 1]
    k64 = np.unique(np.concatenate([
        rng.integers(0, 2 ** 62, size=1 << 24, dtype=np.uint64), g64]))
    keys = np.stack([(k64 >> 32).astype(np.uint32),
                     k64.astype(np.uint32)], 1)
    return pj.build_tile_partitions(keys)


def _prefix_fns(t0j, t1j, acc, p, u_chunk=pj.U_CHUNK_DD,
                w_part=pj.W_PART_DD):
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed

    def cut(stage):
        @functools.partial(jax.jit, static_argnames=())
        def fn(codes, lengths):
            hi2, lo2 = extract_mixed(codes, lengths, K)
            if stage == 0:
                return hi2[:1, :1]
            hi = hi2.reshape(-1)
            lo = lo2.reshape(-1)
            pad = (-hi.shape[0]) % pj.LCHUNK_DD
            if pad:
                hi = jnp.concatenate(
                    [hi, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
                lo = jnp.concatenate(
                    [lo, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
            n = hi.shape[0]
            nloc = n // pj.LCHUNK_DD
            h2 = hi.reshape(nloc, pj.LCHUNK_DD)
            l2 = lo.reshape(nloc, pj.LCHUNK_DD)
            hs, ls = jax.lax.sort((h2, l2), dimension=1, num_keys=1)
            if stage == 1:
                return hs[:1, :1]
            hc, lc, wc, ovf_u = pj._dedup_compact_sorted(hs, ls,
                                                         u_chunk)
            if stage == 2:
                return hc[:1]
            s0, s1, sw = jax.lax.sort((hc, lc, wc), num_keys=1)
            if stage == 3:
                return s0[:1]
            n2 = s0.shape[0]
            pad2 = (-n2) % pj.CHUNK_DD
            if pad2:
                s0 = jnp.concatenate(
                    [s0, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
                s1 = jnp.concatenate(
                    [s1, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
                sw = jnp.concatenate([sw, jnp.zeros(pad2, jnp.int32)])
                n2 += pad2
            spart = pj._part_from_hi(s0, p)
            nc = n2 // pj.CHUNK_DD
            sp2 = spart.reshape(nc * pj.NSUB_DD, pj.SUB_ROWS)
            sub_start = sp2[:, 0]
            sub_span = (sp2[:, -1] - sub_start + 1).astype(jnp.int32)
            first = sub_start.reshape(nc, pj.NSUB_DD)[:, 0]
            blk = first // w_part
            base8 = (first // 8) * 8
            meta = jnp.concatenate([blk, base8, sub_start, sub_span])
            if stage == 4:
                return meta[:1]
            s0r = s0.reshape(n2 // 128, 128)
            s1r = s1.reshape(n2 // 128, 128)
            spr = spart.reshape(n2 // 128, 128)
            swr = sw.reshape(n2 // 128, 128)
            acc_out = pj._tally_call_w(meta, t0j, t1j, s0r, s1r, spr,
                                       swr, acc, w_part, False)
            return acc_out[:1, :1]
        return fn
    return [cut(s) for s in range(6)]


def run_prof(rng, genome):
    t0, t1, _perm, p = _wgs_table(rng, genome)
    t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
    acc = jnp.zeros(t0.shape, jnp.int32)
    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)

    @jax.jit
    def nullf(codes, lengths):
        return codes[:1, :1]

    names = ["extract", "+seg sort", "+compact", "+global sort",
             "+meta", "+kernel (full)"]
    base = timeit("null (dispatch floor)", nullf, codes, lengths)
    prev = base
    for s, fn in enumerate(_prefix_fns(t0j, t1j, acc, p)):
        dt = timeit(f"prefix {s} {names[s]}", fn, codes, lengths)
        print(f"    marginal {dt - prev:+8.2f} ms".replace("+", " "),
              flush=True)
        prev = dt


# ── kernel anatomy: compute vs DMA vs launch overhead ───────────────
# Times _tally_call_w on prebuilt routed inputs with doctored meta:
#   full          — real meta
#   spans=0       — fori_loops never run: window/acc DMA + launch only
#   spans=0,blk=0 — all block indices 0: Pallas revisit-dedup fetches
#                   each block once: launch overhead only
def run_kernel_anatomy(rng, genome):
    t0, t1, _perm, p = _wgs_table(rng, genome)
    t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
    acc = jnp.zeros(t0.shape, jnp.int32)
    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed

    @jax.jit
    def route(codes, lengths):
        hi2, lo2 = extract_mixed(codes, lengths, K)
        hi = hi2.reshape(-1)
        lo = lo2.reshape(-1)
        hc, lc, wc, _ovf = pj._dedup_compact(hi, lo, pj.U_CHUNK_DD)
        s0, s1, sw = jax.lax.sort((hc, lc, wc), num_keys=1)
        n2 = s0.shape[0]
        pad2 = (-n2) % pj.CHUNK_DD
        if pad2:
            s0 = jnp.concatenate(
                [s0, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
            s1 = jnp.concatenate(
                [s1, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
            sw = jnp.concatenate([sw, jnp.zeros(pad2, jnp.int32)])
            n2 += pad2
        spart = pj._part_from_hi(s0, p)
        nc = n2 // pj.CHUNK_DD
        sp2 = spart.reshape(nc * pj.NSUB_DD, pj.SUB_ROWS)
        sub_start = sp2[:, 0]
        sub_span = (sp2[:, -1] - sub_start + 1).astype(jnp.int32)
        first = sub_start.reshape(nc, pj.NSUB_DD)[:, 0]
        w_part = pj.W_PART_DD
        blk = first // w_part
        base8 = (first // 8) * 8
        last = sp2[:, -1].reshape(nc, pj.NSUB_DD)[:, -1]
        return (blk, base8, sub_start, sub_span,
                s0.reshape(n2 // 128, 128), s1.reshape(n2 // 128, 128),
                spart.reshape(n2 // 128, 128),
                sw.reshape(n2 // 128, 128),
                jnp.max(last - blk * w_part + 1),
                jnp.max(sub_span), jnp.max(last - base8 + 1))

    (blk, base8, sub_start, sub_span, s0r, s1r, spr, swr, mspan,
     msub, macc) = route(codes, lengths)
    print(f"max chunk span {int(mspan)}  max sub span {int(msub)} "
          f"max acc span {int(macc)}  nc {s0r.shape[0] // pj.NSUB_DD}",
          flush=True)
    w_part = pj.W_PART_DD
    meta_full = jnp.concatenate([blk, base8, sub_start, sub_span])
    z = jnp.zeros_like(sub_span)
    meta_nocomp = jnp.concatenate([blk, base8, sub_start, z])
    meta_nothing = jnp.concatenate(
        [jnp.zeros_like(blk), jnp.zeros_like(base8),
         jnp.zeros_like(sub_start), z])

    def kfn(meta):
        f = jax.jit(lambda m, a: pj._tally_call_w(
            m, t0j, t1j, s0r, s1r, spr, swr, a, w_part, False))
        return functools.partial(f, meta)

    for name, meta in (("full", meta_full), ("spans=0", meta_nocomp),
                       ("spans=0,blk=0", meta_nothing)):
        timeit(f"kernel {name}", kfn(meta), acc)


# ── unroll-by-2 weighted tally kernel ───────────────────────────────
# Processes two window rows per fori_loop iteration: halves the
# per-iteration scalar/loop overhead if that (not VPU volume) is the
# kernel's bound.  Row t+1 past the span tallies into a clamped row
# with an all-false mask — exact either way.

def _tally_kernel_w2(meta_ref, t0lo, t0hi, t1lo, t1hi, s0_ref, s1_ref,
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

    nsub = pj.NSUB_DD
    for s in range(nsub):
        st = meta_ref[2 * nc + c * nsub + s]
        span = meta_ref[2 * nc + nc * nsub + c * nsub + s]
        q0t = s0_ref[s, :].reshape(pj.SUB_ROWS, 1)
        q1t = s1_ref[s, :].reshape(pj.SUB_ROWS, 1)
        relt = sp_ref[s, :].reshape(pj.SUB_ROWS, 1) - st
        wt = w_ref[s, :].reshape(pj.SUB_ROWS, 1).astype(jnp.float32)

        def tally(eq2, t, arow, _relt=relt, _wt=wt):
            maskv = jnp.where(_relt == t, _wt, 0.0).reshape(
                1, pj.SUB_ROWS)
            cnt = jax.lax.dot_general(
                maskv, eq2.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            accw[pl.ds(arow, 1), :] += cnt.astype(jnp.int32)

        @pl.when(st - baseb + span <= w_part)
        def _fast(q0t=q0t, q1t=q1t, st=st, span=span):
            def body(i, _):
                t = 2 * i
                row = st - baseb + t
                eq2 = ((q0t == t0lo[pl.ds(row, 1), :])
                       & (q1t == t1lo[pl.ds(row, 1), :]))
                tally(eq2, t, st - base8 + t)
                row2 = jnp.minimum(row + 1, w_part - 1)
                eq2b = ((q0t == t0lo[pl.ds(row2, 1), :])
                        & (q1t == t1lo[pl.ds(row2, 1), :]))
                # t+1 >= span ⇒ relt never equals it: zero tally into
                # a clamped (in-bounds) acc row
                tally(eq2b, t + 1, st - base8 + row2 - (st - baseb))
                return 0
            jax.lax.fori_loop(0, (span + 1) // 2, body, 0)

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


def run_unroll2(rng, genome):
    """A/B the unroll-by-2 kernel inside the full dedup step."""
    saved = pj._tally_kernel_w
    base, tb = _step_time(rng, genome, "baseline")
    try:
        pj._tally_kernel_w = _tally_kernel_w2
        pj.join_tally_step_dedup.clear_cache()
        dt, tot = _step_time(rng, genome, "unroll2")
        if dt is not None and tot != tb:
            print(f"    !! tally mismatch {tot} != {tb}", flush=True)
    finally:
        pj._tally_kernel_w = saved
        pj.join_tally_step_dedup.clear_cache()


# ── transposed-query weighted tally kernel ──────────────────────────
# The production kernel spends ~100 ns per sub-chunk per operand on
# the (1, 128) -> (128, 1) lane->sublane reshape of its query slices —
# span-independent fixed work (~4 relayouts x 7168 subs ~ 2.8 ms).
# Pre-transposing the routed query planes ONCE in XLA to
# (128, n2/128) makes each sub's column a natural (128, 1) slice.

def _tally_kernel_wT(meta_ref, t0lo, t0hi, t1lo, t1hi, s0t_ref,
                     s1t_ref, spt_ref, wt_ref, acc_in_hbm,
                     acc_out_hbm, accw, sem_in, sem_out, *, w_part):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    baseb = meta_ref[c] * w_part
    base8 = pl.multiple_of(meta_ref[nc + c], 8)
    din = pltpu.make_async_copy(
        acc_out_hbm.at[pl.ds(base8, w_part), :], accw, sem_in)
    din.start()
    din.wait()

    nsub = pj.NSUB_DD
    for s in range(nsub):
        st = meta_ref[2 * nc + c * nsub + s]
        span = meta_ref[2 * nc + nc * nsub + c * nsub + s]
        q0t = s0t_ref[:, s:s + 1]
        q1t = s1t_ref[:, s:s + 1]
        relt = spt_ref[:, s:s + 1] - st
        wt = wt_ref[:, s:s + 1].astype(jnp.float32)

        def tally(eq2, t, arow, _relt=relt, _wt=wt):
            maskv = jnp.where(_relt == t, _wt, 0.0).reshape(
                1, pj.SUB_ROWS)
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


def _tally_call_wT(meta, t0, t1, s0t, s1t, spt, wtt, acc, w_part,
                   interpret):
    nc = s0t.shape[1] // 128
    TK = pj.TILE_KEYS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((w_part, TK), lambda c, m: (m[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_part, TK), lambda c, m: (m[c] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_part, TK), lambda c, m: (m[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_part, TK), lambda c, m: (m[c] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pj.SUB_ROWS, 128), lambda c, m: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pj.SUB_ROWS, 128), lambda c, m: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pj.SUB_ROWS, 128), lambda c, m: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pj.SUB_ROWS, 128), lambda c, m: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((w_part, TK), jnp.int32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_tally_kernel_wT, w_part=w_part),
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={9: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, t0, t0, t1, t1, s0t, s1t, spt, wtt, acc)


@functools.partial(
    jax.jit,
    static_argnames=("k", "p", "w_part", "u_chunk", "interpret"))
def join_tally_step_dedup_T(t0, t1, acc, codes, lengths, k, p,
                            w_part=pj.W_PART_DD,
                            u_chunk=pj.U_CHUNK_DD, interpret=False):
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed
    hi2, lo2 = extract_mixed(codes, lengths, k, interpret=interpret)
    hi = hi2.reshape(-1)
    lo = lo2.reshape(-1)
    pad = (-hi.shape[0]) % pj.LCHUNK_DD
    if pad:
        hi = jnp.concatenate(
            [hi, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
        lo = jnp.concatenate(
            [lo, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
    hc, lc, wc, ovf_u = pj._dedup_compact(hi, lo, u_chunk)
    s0, s1, sw = jax.lax.sort((hc, lc, wc), num_keys=1)
    n2 = s0.shape[0]
    pad2 = (-n2) % pj.CHUNK_DD
    if pad2:
        s0 = jnp.concatenate(
            [s0, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
        s1 = jnp.concatenate(
            [s1, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
        sw = jnp.concatenate([sw, jnp.zeros(pad2, jnp.int32)])
        n2 += pad2
    spart = pj._part_from_hi(s0, p)
    nc = n2 // pj.CHUNK_DD
    sp2 = spart.reshape(nc * pj.NSUB_DD, pj.SUB_ROWS)
    sub_start = sp2[:, 0]
    sub_span = (sp2[:, -1] - sub_start + 1).astype(jnp.int32)
    first = sub_start.reshape(nc, pj.NSUB_DD)[:, 0]
    blk = first // w_part
    base8 = (first // 8) * 8
    last = sp2[:, -1].reshape(nc, pj.NSUB_DD)[:, -1]
    ovf_span = ((jnp.max(last - blk * w_part + 1) > 2 * w_part)
                | (jnp.max(last - base8 + 1) > w_part))
    meta = jnp.concatenate([blk, base8, sub_start, sub_span])
    def tq(x):
        """(n2,) -> (128, nc*128): sub s of chunk c at column
        c*128 + s (columns NSUB_DD..127 of each chunk are padding so
        the lane dim stays a 128-multiple)."""
        x3 = x.reshape(nc, pj.NSUB_DD, 128)
        x3 = jnp.transpose(x3, (2, 0, 1))
        x3 = jnp.pad(x3, ((0, 0), (0, 0), (0, 128 - pj.NSUB_DD)))
        return x3.reshape(128, nc * 128)

    s0t = tq(s0)
    s1t = tq(s1)
    spt = tq(spart)
    wtt = tq(sw)
    acc_out = _tally_call_wT(meta, t0, t1, s0t, s1t, spt, wtt, acc,
                             w_part, interpret)
    return acc_out, ovf_span, ovf_u


def run_transposed(rng, genome):
    t0, t1, _perm, p = _wgs_table(rng, genome)
    t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
    acc = jnp.zeros(t0.shape, jnp.int32)
    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)

    out_b, os_, ou_ = pj.join_tally_step_dedup(
        t0j, t1j, acc, codes, lengths, K, p)
    assert not bool(os_) and not bool(ou_)
    out_t, os_, ou_ = join_tally_step_dedup_T(
        t0j, t1j, acc, codes, lengths, K, p)
    assert not bool(os_) and not bool(ou_)
    same = np.array_equal(np.asarray(out_b), np.asarray(out_t))
    print(f"  parity: {same}", flush=True)
    assert same
    timeit("step baseline", lambda a, c, l: pj.join_tally_step_dedup(
        t0j, t1j, a, c, l, K, p)[0], acc, codes, lengths)
    timeit("step transposed-q", lambda a, c, l: join_tally_step_dedup_T(
        t0j, t1j, a, c, l, K, p)[0], acc, codes, lengths)


# ── full-step kernel variants (same-session A/B) ────────────────────
# The kernel's ~10 ms splits into per-sub fixed work + per-iteration
# (partition-row) cost.  Variants attack the iteration count and
# per-iteration overhead:
#   tile2048 — TILE_KEYS 2048 / MEAN_FILL 1536: half the partitions,
#              half the iterations, 2x the lanes per compare
#   chunk8k  — CHUNK_DD 8192: half the chunks (fixed work + acc DMA)
#   u1536    — tighter junk trim
def _step_time(rng, genome, label, tile_keys=1024, mean_fill=768,
               chunk_dd=None, u_chunk=None, w_part=None):
    saved = (pj.TILE_KEYS, pj.MEAN_FILL, pj.CHUNK_DD, pj.NSUB_DD)
    try:
        pj.TILE_KEYS = tile_keys
        pj.MEAN_FILL = mean_fill
        if chunk_dd:
            pj.CHUNK_DD = chunk_dd
            pj.NSUB_DD = chunk_dd // pj.SUB_ROWS
        t0, t1, _perm, p = _wgs_table(rng, genome)
        t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
        acc = jnp.zeros(t0.shape, jnp.int32)
        codes = jnp.asarray(
            synth_reads(rng, genome, BATCH_READS, READ_LEN))
        lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
        uc = u_chunk or pj.U_CHUNK_DD
        wp = w_part or pj.W_PART_DD
        out, ovf_s, ovf_u = pj.join_tally_step_dedup(
            t0j, t1j, acc, codes, lengths, K, p, wp, uc)
        print(f"  {label}: p={p} ovf_s={bool(ovf_s)} "
              f"ovf_u={bool(ovf_u)}", flush=True)
        if bool(ovf_s) or bool(ovf_u):
            return None, None
        dt = timeit(f"step {label}", lambda a, c, l:
                    pj.join_tally_step_dedup(
                        t0j, t1j, a, c, l, K, p, wp, uc)[0],
                    acc, codes, lengths)
        total = int(np.asarray(jnp.sum(out)))
        return dt, total
    finally:
        (pj.TILE_KEYS, pj.MEAN_FILL, pj.CHUNK_DD, pj.NSUB_DD) = saved


def run_variants(rng, genome):
    base, tb = _step_time(rng, genome, "baseline")
    # kernel iterations ≈ n_real/128 + p: fuller/wider partitions cut
    # the dominant p term.  Junk-sentinel masking (landed) shrank
    # spans, so tile2048 now fits w_part=128 within VMEM.
    cases = [
        ("fill896", dict(mean_fill=896)),
        ("tile2048 fill1536 wp128", dict(tile_keys=2048,
                                         mean_fill=1536, w_part=128)),
        ("tile2048 fill1792 wp128", dict(tile_keys=2048,
                                         mean_fill=1792, w_part=128)),
        ("tile2048 fill1792 wp192", dict(tile_keys=2048,
                                         mean_fill=1792, w_part=192)),
    ]
    for label, kw in cases:
        dt, tot = _step_time(rng, genome, label, **kw)
        if dt is not None and tot != tb:
            print(f"    !! tally mismatch {tot} != {tb}", flush=True)


def run_steps(rng, genome):
    """Time tally + member dedup steps across w_part (spans shrink
    once junk rows are sentinel-pinned and span-masked)."""
    t0, t1, _perm, p = _wgs_table(rng, genome)
    t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
    acc = jnp.zeros(t0.shape, jnp.int32)
    codes = jnp.asarray(synth_reads(rng, genome, BATCH_READS, READ_LEN))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    for wp in (256, 192, 128):
        out, os_, ou_ = pj.join_tally_step_dedup(
            t0j, t1j, acc, codes, lengths, K, p, wp)
        print(f"  tally w_part={wp}: ovf_s={bool(os_)} "
              f"ovf_u={bool(ou_)} sum={int(np.asarray(jnp.sum(out)))}",
              flush=True)
        if bool(os_) or bool(ou_):
            continue
        timeit(f"tally dedup w_part={wp}",
               lambda a, c, l, _wp=wp: pj.join_tally_step_dedup(
                   t0j, t1j, a, c, l, K, p, _wp)[0],
               acc, codes, lengths)
    for wp in (512, 384, 256):
        fnd, os_, ou_ = pj.join_member_step_dedup(
            t0j, t1j, codes, lengths, K, p, wp)
        print(f"  member w_part={wp}: ovf_s={bool(os_)} "
              f"ovf_u={bool(ou_)}", flush=True)
        if bool(os_) or bool(ou_):
            continue
        timeit(f"member dedup w_part={wp}",
               lambda c, l, _wp=wp: pj.join_member_step_dedup(
                   t0j, t1j, c, l, K, p, _wp)[0],
               codes, lengths)


def run_super(rng, genome):
    """Super-batch join vs scanned per-batch joins (same session)."""
    t0, t1, _perm, p = _wgs_table(rng, genome)
    t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
    acc0 = jnp.zeros(t0.shape, jnp.int32)
    nb_max = 16
    batches = np.stack([
        synth_reads(rng, genome, BATCH_READS, READ_LEN)
        for _ in range(nb_max)])
    lens = np.full((nb_max, BATCH_READS), READ_LEN, np.int32)

    codes_nb = jnp.asarray(batches)
    lens_nb = jnp.asarray(lens)
    out_ref, os_, ou_ = pj.join_tally_steps_dedup(
        t0j, t1j, acc0, codes_nb, lens_nb, K, p)
    print(f"  scan16: ovf_s={bool(os_)} ovf_u={bool(ou_)}", flush=True)
    ref = np.asarray(out_ref)
    dt = timeit("scan16 per-batch joins", lambda a: pj.join_tally_steps_dedup(
        t0j, t1j, a, codes_nb, lens_nb, K, p)[0], acc0, n_rep=2)
    print(f"    = {nb_max * BATCH_READS / dt / 1e6:.3f} M reads/s",
          flush=True)

    for nb in (4, 8, 16):
        cnb = jnp.asarray(batches[:nb])
        lnb = jnp.asarray(lens[:nb])
        out, os_, ou_ = pj.join_tally_superbatch_dedup(
            t0j, t1j, acc0, cnb, lnb, K, p)
        ok = not (bool(os_) or bool(ou_))
        print(f"  super nb={nb}: ovf_s={bool(os_)} ovf_u={bool(ou_)}",
              flush=True)
        if not ok:
            continue
        if nb == nb_max:
            same = np.array_equal(np.asarray(out), ref)
            print(f"    parity vs scan16: {same}", flush=True)
        dt = timeit(f"superbatch nb={nb}",
                    lambda a, _c=cnb, _l=lnb, _nb=nb:
                    pj.join_tally_superbatch_dedup(
                        t0j, t1j, a, _c, _l, K, p)[0],
                    acc0, n_rep=4)
        print(f"    = {nb * BATCH_READS / dt / 1e6:.3f} M reads/s",
              flush=True)

    # member super-batch vs sequential dedup member steps
    ref0, os_, ou_ = pj.join_member_step_dedup(
        t0j, t1j, jnp.asarray(batches[0]), jnp.asarray(lens[0]), K, p)
    assert not (bool(os_) or bool(ou_))
    ref0 = np.asarray(ref0)
    for nb in (8, 16):
        cnb = jnp.asarray(batches[:nb])
        lnb = jnp.asarray(lens[:nb])
        fnd, os_, ou_ = pj.join_member_superbatch_dedup(
            t0j, t1j, cnb, lnb, K, p)
        print(f"  member super nb={nb}: ovf_s={bool(os_)} "
              f"ovf_u={bool(ou_)}", flush=True)
        if bool(os_) or bool(ou_):
            continue
        if nb == 8:
            same = np.array_equal(np.asarray(fnd[0]), ref0)
            print(f"    parity vs single-batch member: {same}",
                  flush=True)
        dt = timeit(f"member superbatch nb={nb}",
                    lambda _c=cnb, _l=lnb:
                    pj.join_member_superbatch_dedup(
                        t0j, t1j, _c, _l, K, p)[0], n_rep=4)
        print(f"    = {nb * BATCH_READS / dt / 1e6:.3f} M reads/s",
              flush=True)


def run_sprof(rng, genome):
    """Cumulative-prefix profile inside the superbatch jit (nb=8)."""
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed
    t0, t1, _perm, p = _wgs_table(rng, genome)
    t0j, t1j = jnp.asarray(t0), jnp.asarray(t1)
    acc0 = jnp.zeros(t0.shape, jnp.int32)
    nb = 8
    codes_nb = jnp.asarray(np.stack([
        synth_reads(rng, genome, BATCH_READS, READ_LEN)
        for _ in range(nb)]))
    lens_nb = jnp.asarray(
        np.full((nb, BATCH_READS), READ_LEN, np.int32))

    def cut(stage):
        @jax.jit
        def fn(codes_nb, lens_nb):
            def front(_, xs):
                codes, lengths = xs
                hi2, lo2 = extract_mixed(codes, lengths, K)
                if stage == 0:
                    return 0, (hi2[:1, :1], hi2[:1, :1],
                               jnp.zeros((1,), jnp.int32), False)
                hi = hi2.reshape(-1)
                lo = lo2.reshape(-1)
                hc, lc, wc, ovf_u = pj._dedup_compact(
                    hi, lo, pj.U_CHUNK_DD)
                if stage == 1:
                    return 0, (hc[:1], lc[:1], wc[:1], ovf_u)
                return 0, (hc, lc, wc, ovf_u)
            _, (hcs, lcs, wcs, _o) = jax.lax.scan(
                front, 0, (codes_nb, lens_nb))
            if stage <= 1:
                return hcs[:1]
            s0, s1, sw = jax.lax.sort(
                (hcs.reshape(-1), lcs.reshape(-1), wcs.reshape(-1)),
                num_keys=1)
            if stage == 2:
                return s0[:1]
            n2 = s0.shape[0]
            pad2 = (-n2) % pj.CHUNK_DD
            if pad2:
                s0 = jnp.concatenate(
                    [s0, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
                s1 = jnp.concatenate(
                    [s1, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
                sw = jnp.concatenate([sw, jnp.zeros(pad2, jnp.int32)])
                n2 += pad2
            sent_s = (s0 == jnp.uint32(0xFFFFFFFF)) \
                & (s1 == jnp.uint32(0xFFFFFFFF))
            spart = jnp.where(sent_s, p, pj._part_from_hi(s0, p))
            (spr, blk, base8, sub_start, sub_span, _ovf,
             _need) = pj._masked_span_meta(
                 spart, sent_s, p, pj.CHUNK_DD, pj.NSUB_DD,
                 pj.W_PART_SB)
            meta = jnp.concatenate([blk, base8, sub_start, sub_span])
            if stage == 3:
                return meta[:1]
            acc_out = pj._tally_call_w(
                meta, t0j, t1j, s0.reshape(n2 // 128, 128),
                s1.reshape(n2 // 128, 128), spr,
                sw.reshape(n2 // 128, 128), acc0, pj.W_PART_SB,
                False)
            return acc_out[:1, :1]
        return fn

    names = ["extract scan", "+dedup scan", "+global sort", "+meta",
             "+kernel (full)"]
    prev = None
    for st in range(5):
        dt = timeit(f"sprefix {st} {names[st]}", cut(st), codes_nb,
                    lens_nb, n_rep=4)
        if prev is not None:
            print(f"    marginal {1e3 * (dt - prev):+.2f} ms "
                  f"({1e3 * (dt - prev) / nb:+.2f}/batch)",
                  flush=True)
        prev = dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sort"
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 4 << 20, dtype=np.uint8)
    if which in ("sort", "all"):
        run_sort(rng, genome)
    if which in ("prof",):
        run_prof(rng, genome)
    if which in ("anatomy",):
        run_kernel_anatomy(rng, genome)
    if which in ("variants",):
        run_variants(rng, genome)
    if which in ("unroll2",):
        run_unroll2(rng, genome)
    if which in ("transposed",):
        run_transposed(rng, genome)
    if which in ("steps",):
        run_steps(rng, genome)
    if which in ("super",):
        run_super(rng, genome)
    if which in ("sprof",):
        run_sprof(rng, genome)


if __name__ == "__main__":
    main()
