"""Pallas TPU aligned-join: the WGS-scale replacement for jellyfish
count ``--if`` / query (reference core/jellyfish_wrappers.py:115–283,
kmer_utils.py:124–245) at large table sizes.

Round-1 measurement (PERF.md) showed every XLA mid/large-table path is
dominated by one pathological op: materialising the hash-routed query
blocks — a 4M-row scatter (~425 ms/batch) or its gather/dynamic-slice
equivalents (~3 µs per slice).  The sort itself is cheap (17.5 ms for
4.3M windows) and the blocked compare is cheap (20–35 ms).  This
module keeps the sort in XLA and replaces the block-building AND the
compare with one Pallas kernel that exploits the *alignment* between
the two sorted sides:

* the table is hash-partitioned once at build into per-partition
  padded planes ``t0/t1`` of shape (P + pad, cap_t) — one plane per
  32-bit key word, partitions contiguous by hash prefix;
* each query batch is sorted by (partition, key) in XLA — so the rows
  of any C-row chunk span a *small, contiguous* range of partitions
  ``[p_lo, p_lo + span]``;
* the kernel walks chunks on a 1-D grid: per chunk it DMAs the T
  table-plane rows starting at the chunk's scalar-prefetched ``p_lo``
  into VMEM, compares all C query keys against all T×cap_t table keys
  with 3-D broadcast equality on the VPU (masked to each row's own
  partition), and either read-modify-writes a (T, cap_t) slab of the
  HBM tally (``--if`` counting) or emits per-row membership flags
  (anchoring scan).

No per-element random access anywhere: sorts, sequential DMAs and
vector compares only.  Chunks whose partition span exceeds T raise an
overflow flag computed in XLA and the engine retries with doubled T
(low-complexity batches shrink the span, sparse batches widen it, so
in practice one compile per (T, shape) pair serves steady state).

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

# Rows per grid chunk.  Work scales as C·M (independent of P because
# T·cap_t ≈ C·M/n), so smaller C is cheaper — bounded below by grid
# and DMA overheads.  256 rows = (2, 128) blocks.
CHUNK_ROWS = 256
# Table planes are padded by this many rows so a chunk starting in the
# last partition (or the sentinel pseudo-partition P) can always DMA
# T rows.  T is capped to this value; batches needing more fall back.
MAX_T = 64


def build_plane_partitions(keys_np, p_bits, lane=128):
    """Host-side: hash-partition sorted table keys into padded planes.

    Returns ``(t0, t1, perm, cap_t)`` where ``t0/t1`` are
    (P + MAX_T, cap_t) uint32 planes (word 0 / word 1 of each key,
    sentinel-padded) and ``perm[p, i]`` maps plane cell (p, i) back to
    the original table row (-1 for padding).  ``cap_t`` is the max
    bucket size rounded up to a multiple of *lane* for clean VPU
    layout.
    """
    m, w = keys_np.shape
    if w != 2:
        raise ValueError("plane partitions require W == 2")
    p = 1 << p_bits
    w0 = keys_np[:, 0].astype(np.uint32)
    w1 = keys_np[:, 1].astype(np.uint32)
    h = (w0 ^ (w1 * np.uint32(0x85EBCA77))) * np.uint32(0x9E3779B1)
    h = h ^ (h >> np.uint32(16))
    part = (h >> np.uint32(32 - p_bits)).astype(np.int64)
    counts = np.bincount(part, minlength=p)
    cap_t = max(lane, int(-(-int(counts.max()) // lane) * lane))
    t0 = np.full((p + MAX_T, cap_t), SENTINEL, dtype=np.uint32)
    t1 = np.full((p + MAX_T, cap_t), SENTINEL, dtype=np.uint32)
    perm = np.full((p, cap_t), -1, dtype=np.int64)
    order = np.argsort(part, kind="stable")
    sorted_parts = part[order]
    # within-partition slot = rank within its run
    first_of_run = np.searchsorted(sorted_parts, np.arange(p))
    slots = np.arange(m) - first_of_run[sorted_parts]
    t0[sorted_parts, slots] = w0[order]
    t1[sorted_parts, slots] = w1[order]
    perm[sorted_parts, slots] = order
    return t0, t1, perm, cap_t


def _route(flat, p_bits, chunk_rows, with_idx):
    """Shared XLA routing: hash → sort by (partition, key) → chunk
    metadata.  Returns (s0_2d, s1_2d, sp_2d, p_lo, span, sidx?)."""
    p = 1 << p_bits
    pad = (-flat.shape[0]) % chunk_rows
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad, 2), jnp.uint32(0xFFFFFFFF))], axis=0)
    n = flat.shape[0]
    w0, w1 = flat[:, 0], flat[:, 1]
    sent = (w0 == jnp.uint32(0xFFFFFFFF)) & (w1 == jnp.uint32(0xFFFFFFFF))
    h = dev._partition_hash(w0, w1)
    part = (h >> jnp.uint32(32 - p_bits)).astype(jnp.int32)
    part = jnp.where(sent, p, part)
    if with_idx:
        idx0 = jnp.arange(n, dtype=jnp.int32)
        spart, s0, s1, sidx = jax.lax.sort(
            (part, w0, w1, idx0), num_keys=1)
    else:
        spart, s0, s1 = jax.lax.sort((part, w0, w1), num_keys=1)
        sidx = None
    nc = n // chunk_rows
    sp2 = spart.reshape(nc, chunk_rows)
    p_lo = sp2[:, 0]
    # span check uses only REAL partitions (< P); sentinel rows never
    # need table coverage (their keys cannot match real table keys and
    # pad-region hits land in discarded cells)
    real = sp2 < p
    mx = jnp.max(jnp.where(real, sp2, -1), axis=1)
    span = jnp.where(real.any(axis=1), mx - jnp.minimum(p_lo, mx), 0)
    lanes = chunk_rows // 128
    s0r = s0.reshape(nc * lanes, 128)
    s1r = s1.reshape(nc * lanes, 128)
    spr = sp2.reshape(nc * lanes, 128)
    return s0r, s1r, spr, p_lo, span, sidx


def _tally_kernel(plo_ref, t0_hbm, t1_hbm, s0_ref, s1_ref, sp_ref,
                  acc_in_hbm, acc_out_hbm, t0s, t1s, accs,
                  sem_t0, sem_t1, sem_in, sem_out, *, t_rows, cap_t):
    c = pl.program_id(0)
    start = plo_ref[c]
    d0 = pltpu.make_async_copy(
        t0_hbm.at[pl.ds(start, t_rows), :], t0s, sem_t0)
    d1 = pltpu.make_async_copy(
        t1_hbm.at[pl.ds(start, t_rows), :], t1s, sem_t1)
    din = pltpu.make_async_copy(
        acc_out_hbm.at[pl.ds(start, t_rows), :], accs, sem_in)
    d0.start()
    d1.start()
    din.start()
    q0 = s0_ref[:]
    q1 = s1_ref[:]
    rel = sp_ref[:] - start
    d0.wait()
    d1.wait()
    din.wait()
    for t in range(t_rows):
        mask = rel == t
        eq = ((q0[:, :, None] == t0s[t][None, None, :])
              & (q1[:, :, None] == t1s[t][None, None, :])
              & mask[:, :, None])
        accs[t, :] = accs[t, :] + eq.sum(axis=(0, 1), dtype=jnp.int32)
    dout = pltpu.make_async_copy(
        accs, acc_out_hbm.at[pl.ds(start, t_rows), :], sem_out)
    dout.start()
    dout.wait()


@functools.partial(
    jax.jit,
    static_argnames=("k", "p_bits", "cap_t", "t_rows", "interpret"))
def join_tally_step(t0, t1, acc, codes, lengths, k, p_bits, cap_t,
                    t_rows, interpret=False):
    """Fused parent-scan step: extract → route → Pallas join tally.

    ``acc`` is the (P + MAX_T, cap_t) int32 plane-aligned tally;
    returns (acc', overflow).
    """
    keys, _valid = dev.extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, 2)
    s0r, s1r, spr, p_lo, span, _ = _route(flat, p_bits, CHUNK_ROWS,
                                          with_idx=False)
    overflow = jnp.any(span >= t_rows)
    nc = p_lo.shape[0]
    lanes = CHUNK_ROWS // 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # t0 planes
            pl.BlockSpec(memory_space=pltpu.ANY),      # t1 planes
            pl.BlockSpec((lanes, 128), lambda c, plo: (c, 0),
                         memory_space=pltpu.VMEM),     # s0 chunk
            pl.BlockSpec((lanes, 128), lambda c, plo: (c, 0),
                         memory_space=pltpu.VMEM),     # s1 chunk
            pl.BlockSpec((lanes, 128), lambda c, plo: (c, 0),
                         memory_space=pltpu.VMEM),     # spart chunk
            pl.BlockSpec(memory_space=pltpu.ANY),      # acc (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((t_rows, cap_t), jnp.uint32),
            pltpu.VMEM((t_rows, cap_t), jnp.uint32),
            pltpu.VMEM((t_rows, cap_t), jnp.int32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
    )
    acc_out = pl.pallas_call(
        functools.partial(_tally_kernel, t_rows=t_rows, cap_t=cap_t),
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(p_lo, t0, t1, s0r, s1r, spr, acc)
    return acc_out, overflow


def _member_kernel(plo_ref, t0_hbm, t1_hbm, s0_ref, s1_ref, sp_ref,
                   found_ref, t0s, t1s, sem_t0, sem_t1, *, t_rows,
                   cap_t):
    c = pl.program_id(0)
    start = plo_ref[c]
    d0 = pltpu.make_async_copy(
        t0_hbm.at[pl.ds(start, t_rows), :], t0s, sem_t0)
    d1 = pltpu.make_async_copy(
        t1_hbm.at[pl.ds(start, t_rows), :], t1s, sem_t1)
    d0.start()
    d1.start()
    q0 = s0_ref[:]
    q1 = s1_ref[:]
    rel = sp_ref[:] - start
    d0.wait()
    d1.wait()
    fnd = jnp.zeros(q0.shape, dtype=jnp.int32)
    for t in range(t_rows):
        mask = rel == t
        eq = ((q0[:, :, None] == t0s[t][None, None, :])
              & (q1[:, :, None] == t1s[t][None, None, :]))
        fnd = fnd | (jnp.any(eq, axis=2) & mask).astype(jnp.int32)
    found_ref[:] = fnd


@functools.partial(
    jax.jit,
    static_argnames=("k", "p_bits", "cap_t", "t_rows", "interpret"))
def join_member_step(t0, t1, codes, lengths, k, p_bits, cap_t, t_rows,
                     interpret=False):
    """Fused anchoring step: per-window membership via the Pallas join.

    Returns (found (B, S) bool, overflow).  Sentinel-row matches
    against plane padding are impossible here: a query row only tests
    table rows [p_lo, p_lo + T) under its own partition mask, and
    sentinel queries carry partition id P whose plane rows are all
    sentinel — those matches are masked out by ``valid`` below.
    """
    b, length = codes.shape
    s = length - k + 1
    keys, valid = dev.extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, 2)
    n = flat.shape[0]
    n_pad = n + ((-n) % CHUNK_ROWS)
    s0r, s1r, spr, p_lo, span, sidx = _route(flat, p_bits, CHUNK_ROWS,
                                             with_idx=True)
    overflow = jnp.any(span >= t_rows)
    nc = p_lo.shape[0]
    lanes = CHUNK_ROWS // 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((lanes, 128), lambda c, plo: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, 128), lambda c, plo: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, 128), lambda c, plo: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lanes, 128), lambda c, plo: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t_rows, cap_t), jnp.uint32),
            pltpu.VMEM((t_rows, cap_t), jnp.uint32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
    )
    found_sorted = pl.pallas_call(
        functools.partial(_member_kernel, t_rows=t_rows, cap_t=cap_t),
        out_shape=jax.ShapeDtypeStruct((nc * lanes, 128), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(p_lo, t0, t1, s0r, s1r, spr)
    # unsort through the carried original indices (unique → clean scatter)
    found_flat = jnp.zeros(n_pad, dtype=bool).at[sidx].set(
        found_sorted.reshape(n_pad) > 0)
    found = found_flat[:n].reshape(b, s) & valid
    return found, overflow


def pick_p_bits(m):
    """Partition count for a table of *m* keys: mean bucket ≈ 192 so
    cap_t lands at 256 with hash-uniform slack."""
    target = max(1, m // 192)
    return max(4, min(24, target.bit_length()))


def pick_t_rows(n_windows, p_bits):
    """Static T (plane rows per chunk): 2× the mean chunk span, ≥ 4."""
    mean_span = CHUNK_ROWS * (1 << p_bits) / max(n_windows, 1)
    t = max(4, int(2 * mean_span) + 2)
    t = 1 << (t - 1).bit_length()
    return min(t, MAX_T)
