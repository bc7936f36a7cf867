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
    cases = [
        ("tile2048", dict(tile_keys=2048, mean_fill=1536,
                          w_part=256)),
        ("tile2048 fill1792", dict(tile_keys=2048, mean_fill=1792,
                                   w_part=256)),
        ("chunk8k", dict(chunk_dd=8192, w_part=512)),
        ("tile2048+chunk8k", dict(tile_keys=2048, mean_fill=1536,
                                  chunk_dd=8192, w_part=256)),
        ("u1536", dict(u_chunk=1536)),
    ]
    for label, kw in cases:
        dt, tot = _step_time(rng, genome, label, **kw)
        if dt is not None and tot != tb:
            print(f"    !! tally mismatch {tot} != {tb}", flush=True)


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


if __name__ == "__main__":
    main()
