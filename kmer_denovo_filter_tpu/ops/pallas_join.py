"""Pallas TPU tile-join: the WGS-scale replacement for jellyfish
count ``--if`` / query (reference core/jellyfish_wrappers.py:115–283,
kmer_utils.py:124–245) at large table sizes.

Round-1 measurement (PERF.md) showed every XLA mid/large-table path is
dominated by one pathological op: materialising hash-routed query
blocks — a 4M-row scatter (~425 ms/batch) or its dynamic-slice
equivalent (~3 µs per slice).  The sort itself is cheap (17.5 ms for
4.3M windows) and VPU broadcast-equality runs at ~550 G pairs/s.  This
module keeps the sort in XLA and replaces block-building AND compare
with one Pallas kernel exploiting the alignment between the sorted
sides:

* The table is hash-partitioned at build time into **(8, 128) tiles**:
  plane ``t0``/``t1`` row range [8p, 8p+8) holds partition *p*'s key
  words (≤1024 keys, sentinel padded).  Making the partition the
  hardware tile means every DMA and in-VMEM offset is a multiple of 8
  rows — the Mosaic HBM-slice divisibility constraint holds by
  construction.
* Each batch's window keys are sorted by (partition, key) in XLA, so
  any 4096-row chunk touches a short contiguous partition range.  The
  kernel DMAs that whole table window (and the matching tally window)
  into VMEM **once per chunk** — 4 DMAs total, ~100 ns each when
  batched — then walks the chunk's 32 sublane sub-chunks, comparing
  each sub-chunk's 128 queries against its partitions' tiles with
  3-D broadcast equality, looping partitions with a *dynamic-trip*
  ``fori_loop`` bounded by the sub-chunk's actual partition span (so
  degenerate batches cost time, never correctness, and there is no
  per-sub-chunk overflow case).
* ``--if`` tallies accumulate into the VMEM tally window and RMW back
  to HBM; the anchoring scan emits per-row membership flags instead.

The only static capacity is the per-chunk partition window ``w_part``;
chunks whose span exceeds it raise an overflow flag computed in XLA
and the engine retries with a doubled window (a cached recompile).

Key-width support: W == 2 words (k ≤ 31).  Wider keys fall back to the
XLA hash-partitioned sweep (ops/device.py).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmer_denovo_filter_tpu.ops import device as dev

SENTINEL = np.uint32(0xFFFFFFFF)

CHUNK_ROWS = 4096          # query rows per grid step ((32, 128) block)
SUB_ROWS = 128             # rows per sub-chunk (one sublane)
NSUB = CHUNK_ROWS // SUB_ROWS
TILE_KEYS = 1024           # keys per partition tile ((8, 128))
MEAN_FILL = 768            # target mean keys/partition at build time
W_PART = 64                # default partition window per chunk
MAX_W_PART = 1024          # give up (fall back to XLA path) beyond this


def num_partitions(m):
    """Partition count for an *m*-key table (any positive integer)."""
    return max(1, (m + MEAN_FILL - 1) // MEAN_FILL)


def tile_hash_np(w0, w1, p):
    h = (w0 ^ (w1 * np.uint32(0x85EBCA77))) * np.uint32(0x9E3779B1)
    h = h ^ (h >> np.uint32(16))
    return (h % np.uint32(p)).astype(np.int64)


def _tile_hash(w0, w1, p):
    h = dev._partition_hash(w0, w1)
    return (h % jnp.uint32(p)).astype(jnp.int32)


def build_tile_partitions(keys_np, p=None):
    """Host-side: hash-partition table keys into (8, 128) tiles.

    Returns ``(t0, t1, perm, p)``: planes of shape (8·(p + pad), 128)
    uint32 (sentinel padded; pad = MAX_W_PART partitions so any window
    DMA stays in bounds) and ``perm`` of shape (p, TILE_KEYS) mapping
    tile slots back to original table rows (-1 = padding).
    """
    m, w = keys_np.shape
    if w != 2:
        raise ValueError("tile partitions require W == 2")
    if p is None:
        p = num_partitions(m)
    w0 = keys_np[:, 0].astype(np.uint32)
    w1 = keys_np[:, 1].astype(np.uint32)
    part = tile_hash_np(w0, w1, p)
    counts = np.bincount(part, minlength=p)
    if int(counts.max()) > TILE_KEYS:
        # extremely skewed hash (shouldn't happen for unique keys) —
        # grow the partition count until every tile fits
        return build_tile_partitions(keys_np, p=p * 2)
    rows = p + 1 + MAX_W_PART
    t0 = np.full((8 * rows, 128), SENTINEL, dtype=np.uint32)
    t1 = np.full((8 * rows, 128), SENTINEL, dtype=np.uint32)
    perm = np.full((p, TILE_KEYS), -1, dtype=np.int64)
    order = np.argsort(part, kind="stable")
    sp = part[order]
    first = np.searchsorted(sp, np.arange(p))
    slot = np.arange(m) - first[sp]
    flat_idx = sp * TILE_KEYS + slot
    t0.reshape(-1)[flat_idx] = w0[order]
    t1.reshape(-1)[flat_idx] = w1[order]
    perm.reshape(-1)[flat_idx] = order
    return t0, t1, perm, p


def _route(flat, p, with_idx):
    """XLA routing: hash → sort by (partition, key) → chunk metadata.

    Returns (s0, s1, sp) as (n/128, 128) arrays plus per-chunk
    ``base`` (first partition), per-sub ``sub_start``/``sub_span``,
    the chunk window requirement ``need`` (max partitions any chunk
    touches), and the sort permutation when *with_idx*.
    """
    pad = (-flat.shape[0]) % CHUNK_ROWS
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad, 2), jnp.uint32(0xFFFFFFFF))], axis=0)
    n = flat.shape[0]
    w0, w1 = flat[:, 0], flat[:, 1]
    sent = (w0 == jnp.uint32(0xFFFFFFFF)) & (w1 == jnp.uint32(0xFFFFFFFF))
    part = jnp.where(sent, p, _tile_hash(w0, w1, p))
    if with_idx:
        idx0 = jnp.arange(n, dtype=jnp.int32)
        spart, s0, s1, sidx = jax.lax.sort(
            (part, w0, w1, idx0), num_keys=1)
    else:
        spart, s0, s1 = jax.lax.sort((part, w0, w1), num_keys=1)
        sidx = None
    nc = n // CHUNK_ROWS
    sp2 = spart.reshape(nc * NSUB, SUB_ROWS)
    sub_start = sp2[:, 0]
    # spans count only REAL partitions (< p): sentinel rows sort last,
    # their rel offsets exceed the span so the kernel never visits them
    real = sp2 < p
    mx = jnp.max(jnp.where(real, sp2, -1), axis=1)
    sub_span = jnp.where(real[:, 0],
                         mx - sub_start + 1,
                         0).astype(jnp.int32)
    base = sub_start.reshape(nc, NSUB)[:, 0]
    last = jnp.maximum(mx.reshape(nc, NSUB).max(axis=1),
                       base)  # ≥ base even for pure-sentinel chunks
    need = jnp.max(last - base + 1)
    s0r = s0.reshape(n // 128, 128)
    s1r = s1.reshape(n // 128, 128)
    spr = spart.reshape(n // 128, 128)
    return s0r, s1r, spr, base, sub_start, sub_span, need, sidx, n


def _join_kernel(meta_ref, t0_hbm, t1_hbm, s0_ref, s1_ref, sp_ref,
                 acc_in_hbm, acc_out_hbm, t0w, t1w, accw,
                 sem_t0, sem_t1, sem_in, sem_out,
                 *, w_part, member):
    """One chunk: DMA table/tally windows, join 32 sub-chunks.

    meta_ref layout (scalar prefetch, int32):
      [c]                  → window base partition of chunk c
      [nc + i]             → sub_start (global sub index i)
      [nc + nc·NSUB + i]   → sub_span
    When *member*, ``acc_*`` are absent and the per-row flags write to
    the blocked output instead.
    """
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    base = meta_ref[c]
    row0 = pl.multiple_of(base * 8, 8)
    d0 = pltpu.make_async_copy(
        t0_hbm.at[pl.ds(row0, 8 * w_part), :], t0w, sem_t0)
    d1 = pltpu.make_async_copy(
        t1_hbm.at[pl.ds(row0, 8 * w_part), :], t1w, sem_t1)
    d0.start()
    d1.start()
    if not member:
        din = pltpu.make_async_copy(
            acc_out_hbm.at[pl.ds(row0, 8 * w_part), :], accw, sem_in)
        din.start()
        din.wait()
    d0.wait()
    d1.wait()

    for s in range(NSUB):
        st = meta_ref[nc + c * NSUB + s]
        span = meta_ref[nc + nc * NSUB + c * NSUB + s]
        qs0 = s0_ref[s, :]
        qs1 = s1_ref[s, :]
        rel = sp_ref[s, :] - st

        if member:
            def body(t, fnd):
                off = pl.multiple_of((st - base + t) * 8, 8)
                tile0 = t0w[pl.ds(off, 8), :]
                tile1 = t1w[pl.ds(off, 8), :]
                eq = ((tile0[:, :, None] == qs0[None, None, :])
                      & (tile1[:, :, None] == qs1[None, None, :]))
                hit_q = jnp.any(eq, axis=(0, 1)) & (rel == t)
                return fnd | hit_q.astype(jnp.int32)

            fnd = jax.lax.fori_loop(
                0, span, body, jnp.zeros((SUB_ROWS,), jnp.int32))
            acc_out_hbm[s, :] = fnd  # blocked (NSUB,128) output ref
        else:
            def body(t, _):
                off = pl.multiple_of((st - base + t) * 8, 8)
                tile0 = t0w[pl.ds(off, 8), :]
                tile1 = t1w[pl.ds(off, 8), :]
                mask = rel == t
                eq = ((tile0[:, :, None] == qs0[None, None, :])
                      & (tile1[:, :, None] == qs1[None, None, :])
                      & mask[None, None, :])
                accw[pl.ds(off, 8), :] += eq.sum(axis=2,
                                                 dtype=jnp.int32)
                return 0

            jax.lax.fori_loop(0, span, body, 0)

    if not member:
        dout = pltpu.make_async_copy(
            accw, acc_out_hbm.at[pl.ds(row0, 8 * w_part), :], sem_out)
        dout.start()
        dout.wait()


def _pack_meta(base, sub_start, sub_span):
    return jnp.concatenate([base, sub_start, sub_span])


@functools.partial(
    jax.jit, static_argnames=("k", "p", "w_part", "interpret"))
def join_tally_step(t0, t1, acc, codes, lengths, k, p, w_part=W_PART,
                    interpret=False):
    """Fused parent-scan step: extract → route → Pallas tile-join tally.

    ``acc`` is int32 with the planes' shape; returns (acc', overflow)
    where overflow means a chunk spanned more than *w_part* partitions
    (retry with doubled w_part).
    """
    keys, _valid = dev.extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, 2)
    s0r, s1r, spr, base, sub_start, sub_span, need, _sidx, _n = _route(
        flat, p, with_idx=False)
    overflow = need > w_part
    nc = base.shape[0]
    meta = _pack_meta(base, sub_start, sub_span)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # t0 planes
            pl.BlockSpec(memory_space=pltpu.ANY),      # t1 planes
            pl.BlockSpec((NSUB, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),     # s0
            pl.BlockSpec((NSUB, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),     # s1
            pl.BlockSpec((NSUB, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),     # spart
            pl.BlockSpec(memory_space=pltpu.ANY),      # acc (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((8 * w_part, 128), jnp.uint32),
            pltpu.VMEM((8 * w_part, 128), jnp.uint32),
            pltpu.VMEM((8 * w_part, 128), jnp.int32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
    )
    acc_out = pl.pallas_call(
        functools.partial(_join_kernel, w_part=w_part, member=False),
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, t0, t1, s0r, s1r, spr, acc)
    return acc_out, overflow


def _member_kernel(meta_ref, t0_hbm, t1_hbm, s0_ref, s1_ref, sp_ref,
                   found_ref, t0w, t1w, sem_t0, sem_t1, *, w_part):
    _join_kernel(meta_ref, t0_hbm, t1_hbm, s0_ref, s1_ref, sp_ref,
                 None, found_ref, t0w, t1w, None, sem_t0, sem_t1,
                 None, None, w_part=w_part, member=True)


@functools.partial(
    jax.jit, static_argnames=("k", "p", "w_part", "interpret"))
def join_member_step(t0, t1, codes, lengths, k, p, w_part=W_PART,
                     interpret=False):
    """Fused anchoring step: per-window membership via the tile-join.

    Returns (found (B, S) bool, overflow).
    """
    b, length = codes.shape
    s = length - k + 1
    keys, valid = dev.extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, 2)
    n_orig = flat.shape[0]
    s0r, s1r, spr, base, sub_start, sub_span, need, sidx, n = _route(
        flat, p, with_idx=True)
    overflow = need > w_part
    nc = base.shape[0]
    meta = _pack_meta(base, sub_start, sub_span)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((NSUB, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NSUB, 128), lambda c, m: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8 * w_part, 128), jnp.uint32),
            pltpu.VMEM((8 * w_part, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
    )
    found_sorted = pl.pallas_call(
        functools.partial(_member_kernel, w_part=w_part),
        out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, t0, t1, s0r, s1r, spr)
    found_flat = jnp.zeros(n, dtype=bool).at[sidx].set(
        found_sorted.reshape(n) > 0)
    found = found_flat[:n_orig].reshape(b, s) & valid
    return found, overflow
