"""Pallas TPU kernel: fused canonical-window extraction + table sweep.

The hot op of the VCF-mode parent scan
(ops/device.py:small_tally_step) as a single Pallas kernel: each grid
step loads one block of packed reads into VMEM, computes all canonical
k-mer window keys in-register (shift/or word packing, reverse-
complement select, N-validity via doubling window-ORs), and sweeps
them against the VMEM-resident child k-mer table with broadcast
equality — accumulating per-table-key hit counts across the grid.  No
HBM traffic beyond the one streaming pass over the reads, no gathers
anywhere.

Status: bit-exact against the XLA reference under the Pallas
interpreter (covered by tests/test_pallas_probe.py), kept as the
blueprint only — round-2 measurement closed the production question.
The XLA all-pairs sweep is compare-bound within ~15% of the v5e
VPU's multi-issue ceiling at M=4,096, so a Mosaic kernel running the
same algorithm has no meaningful headroom, and every cheaper
algorithm re-introduces a sort or gather that exceeds the sweep's
whole budget at this scale (PERF.md "Why there is no Pallas
small-table kernel in production").  Mosaic-compilability of the
fused extraction was established along the way: it compiles when the
output block is 128-lane aligned, lengths are (BR, 1)-shaped, packed
words are wide enough that no window slice clamps, and the N-window
doubling-OR runs in int32 — constraints recorded here for any future
revisit.  Large tables take the Pallas tile-join (ops/pallas_join.py)
instead, where partition routing actually pays.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_words(codes_blk, lengths_blk, k, s):
    """Forward/RC key words + validity for one read block (traced).

    codes_blk: (BR, L) int32 2-bit codes (4 = N/padding).
    Returns (fwd0, fwd1, rc0, rc1, valid) each (BR, S).
    """
    br, length = codes_blk.shape
    full_words = k // 16
    rem = k % 16

    is_bad = (codes_blk >= 4).astype(jnp.int32)
    clean = jnp.where(codes_blk >= 4, 0, codes_blk)
    comp = 3 - clean

    padded = jnp.concatenate(
        [clean, jnp.zeros((br, 15), jnp.int32)], axis=1)
    pack32 = jnp.zeros((br, length), dtype=jnp.uint32)
    for i in range(16):
        pack32 = pack32 | (padded[:, i:i + length].astype(jnp.uint32)
                           << jnp.uint32(2 * (15 - i)))
    comp_p = jnp.concatenate(
        [jnp.zeros((br, 15), jnp.int32), comp], axis=1)
    rpack32 = jnp.zeros((br, length), dtype=jnp.uint32)
    for i in range(16):
        rpack32 = rpack32 | (comp_p[:, i:i + length].astype(jnp.uint32)
                             << jnp.uint32(2 * i))

    last_mask = jnp.uint32(((1 << (2 * rem)) - 1) << (32 - 2 * rem))
    # static slices only: Mosaic's TPU lowering rejects dynamic_slice
    if full_words >= 1:
        fwd0 = pack32[:, 0:s]
        fwd1 = pack32[:, 16:16 + s] & last_mask
        rc0 = rpack32[:, k - 1:k - 1 + s]
        rc1 = rpack32[:, rem - 1:rem - 1 + s] & last_mask
    else:
        fwd0 = pack32[:, 0:s] & last_mask
        fwd1 = jnp.zeros((br, s), jnp.uint32)
        rc0 = rpack32[:, rem - 1:rem - 1 + s] & last_mask
        rc1 = jnp.zeros((br, s), jnp.uint32)

    pick_fwd = (fwd0 < rc0) | ((fwd0 == rc0) & (fwd1 <= rc1))
    key0 = jnp.where(pick_fwd, fwd0, rc0)
    key1 = jnp.where(pick_fwd, fwd1, rc1)

    # windowed any(N) via doubling ORs (Mosaic lacks cumsum)
    bad = is_bad > 0
    covered = 1
    while covered < k:
        step = min(covered, k - covered)
        shifted = jnp.concatenate(
            [bad[:, step:], jnp.zeros((br, step), bool)], axis=1)
        bad = bad | shifted
        covered += step
    starts = jax.lax.broadcasted_iota(jnp.int32, (br, s), 1)
    valid = (~bad[:, 0:s]) & (starts + k <= lengths_blk[:, None])
    sent = jnp.uint32(0xFFFFFFFF)
    key0 = jnp.where(valid, key0, sent)
    key1 = jnp.where(valid, key1, sent)
    return key0, key1


def _sweep_tally_kernel(codes_ref, lengths_ref, t0_ref, t1_ref, acc_ref,
                        *, k, s, m_tile):
    """One grid step: extract block windows, sweep vs table, tally."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes_blk = codes_ref[:].astype(jnp.int32)
    lengths_blk = lengths_ref[:]
    key0, key1 = _window_words(codes_blk, lengths_blk, k, s)

    m = t0_ref.shape[0]
    # sweep in table tiles; keys stay 2-D (Mosaic rejects the flatten
    # of a non-128-multiple minor dim), eq is (BR, S, m_tile) with a
    # 128-aligned last dim
    for t in range(m // m_tile):
        t0 = t0_ref[t * m_tile:(t + 1) * m_tile]
        t1 = t1_ref[t * m_tile:(t + 1) * m_tile]
        eq = ((key0[:, :, None] == t0[None, None, :])
              & (key1[:, :, None] == t1[None, None, :]))
        acc_ref[t * m_tile:(t + 1) * m_tile] += eq.sum(
            axis=(0, 1), dtype=jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_reads", "m_tile", "interpret"))
def pallas_small_tally(codes, lengths, t0, t1, k, block_reads=256,
                       m_tile=512, interpret=False):
    """Fused extract+sweep tally of a read batch against a small table.

    Args:
        codes: (B, L) uint8 2-bit codes, B divisible by *block_reads*.
        lengths: (B,) int32.
        t0, t1: (M,) uint32 table key words (sentinel padding allowed),
            M divisible by *m_tile*.
        k: k-mer length (3..31, odd).

    Returns (M,) int32 hit counts (sentinel rows count 0 because real
    window keys never equal the sentinel).
    """
    b, length = codes.shape
    s = length - k + 1
    m = t0.shape[0]
    m_tile = min(m_tile, m)  # m is a power of two ≥ 1
    grid = b // block_reads

    acc = pl.pallas_call(
        functools.partial(_sweep_tally_kernel, k=k, s=s, m_tile=m_tile),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_reads, length), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_reads,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m,), lambda i: (0,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m,), jnp.int32),
        interpret=interpret,
    )(codes, lengths, t0, t1)
    # sentinel table rows can only be hit by sentinel (invalid) windows
    sent = (t0 == jnp.uint32(0xFFFFFFFF)) & (t1 == jnp.uint32(0xFFFFFFFF))
    return jnp.where(sent, 0, acc)
