"""Fused Pallas canonical-window extraction + key mixing (W == 2).

The XLA extraction graph (ops/device.py:extract_canonical_windows)
measures ~6.3 ms per 32k-read batch on v5e — ~100× above its VPU op
cost.  This kernel runs the whole chain VMEM-resident per read block:
2-bit doubling packs (4 shift-OR steps instead of 16), canonical
min(fwd, rc), dyadic N-window OR, and the route mix (pallas_join
Feistel) — one HBM read of the codes, one write of the mixed key
planes.  Measured 6.44 ms in its first version — parity of cost with
the XLA graph, not yet a win (PERF.md round-4 section tracks the
per-block roll-chain suspects); its value today is the fused mixed
sort-ready output layout that the dedup tally consumes directly.

Output layout is sort-ready: (B, S_pad) uint32 ``hi``/``lo`` planes
with S_pad a 128-lane multiple; padding columns and invalid windows
hold the (0xFFFFFFFF, 0xFFFFFFFF) sentinel pair, which routes to the
last partition exactly like the XLA route's padded rows.  ``reshape(-1)`` of these planes is therefore a
valid pre-padded query stream with no concatenation pass.

Replaces the extract+mix+pad prefix of the reference's parent-scan
loop (reference core/jellyfish_wrappers.py:115–200 — jellyfish's
canonical k-mer hashing of streamed FASTA).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL32 = 0xFFFFFFFF

_M1 = 0x85EBCA6B
_M2 = 0xC2B2AE35


def _fmix32(x):
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(_M1)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(_M2)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _shift_left(a, s):
    """a[t] := a[t + s] along the lane axis (zeros shifted in)."""
    rolled = pltpu.roll(a, shift=a.shape[1] - s, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(col < a.shape[1] - s, rolled, 0)


def _extract_mix_kernel(codes_ref, len_ref, hi_ref, lo_ref, *, k,
                        length, s_pad):
    """One read block: codes (BR, LP) → mixed key planes (BR, s_pad).

    LP = length + 15 (XLA pre-pads with code 4 so the packers never
    read out of range); s = length - k + 1 real windows.
    """
    s = length - k + 1
    rem = k % 16
    # codes arrive as uint8 (4 bytes/lane saved on the HBM read; the
    # XLA-side pad+int32 materialisation this replaces cost a full
    # extra 22 MB round trip per 32k-read batch)
    codes = codes_ref[...].astype(jnp.int32)
    bad = codes >= 4
    clean = jnp.where(bad, 0, codes)
    comp = 3 - clean

    # forward pack: p[t] = sum_{i<16} clean[t+i] << 2(15-i)
    p = clean
    span = 1
    while span < 16:
        p = (p << (2 * span)) | _shift_left(p, span)
        span *= 2
    pack32 = p.astype(jnp.uint32)

    # reverse-complement pack: r[t] = sum_{i<16} comp[t+i] << 2i
    r = comp
    span = 1
    while span < 16:
        r = r | (_shift_left(r, span) << (2 * span))
        span *= 2
    rpack32 = r.astype(jnp.uint32)

    last_mask = jnp.uint32(((1 << (2 * rem)) - 1) << (32 - 2 * rem))
    f0 = pack32
    f1 = _shift_left(pack32, 16) & last_mask
    # rc word 0 starts at comp[t + k - 1] packed downward; in the
    # forward-indexed rpack32 that is position t + k - 1 - 15
    r0 = _shift_left(rpack32, k - 16)
    # rc word 1's surviving bits j >= 16-rem hold comp[t + j-(16-rem)]
    # — exactly rpack32[t]'s low terms shifted up by 2(16-rem) (the
    # overflowing high terms drop out in uint32)
    r1 = (rpack32 << (2 * (16 - rem))) & last_mask

    pick_fwd = (f0 < r0) | ((f0 == r0) & (f1 <= r1))

    # N anywhere in the k-window: dyadic OR
    o = bad.astype(jnp.int32)
    span = 1
    while span * 2 <= k:
        o = o | _shift_left(o, span)
        span *= 2
    if span < k:
        o = o | _shift_left(o, k - span)
    col = jax.lax.broadcasted_iota(jnp.int32, codes.shape, 1)
    ln = len_ref[...].astype(jnp.int32)  # (BR, 1)
    valid = (o == 0) & (col + k <= ln) & (col < s)

    w0 = jnp.where(pick_fwd, f0, r0)
    w1 = jnp.where(pick_fwd, f1, r1)

    # route mix (bijective pair Feistel, = pallas_join._mix_keys)
    h = w0 ^ _fmix32(w1)
    low = w1 ^ _fmix32(h)
    h = h ^ _fmix32(low)

    sent = jnp.uint32(SENTINEL32)
    h = jnp.where(valid, h, sent)
    low = jnp.where(valid, low, sent)
    hi_ref[...] = jax.lax.slice_in_dim(
        jnp.pad(h, ((0, 0), (0, s_pad - h.shape[1])),
                constant_values=sent)
        if h.shape[1] < s_pad else h, 0, s_pad, axis=1)
    lo_ref[...] = jax.lax.slice_in_dim(
        jnp.pad(low, ((0, 0), (0, s_pad - low.shape[1])),
                constant_values=sent)
        if low.shape[1] < s_pad else low, 0, s_pad, axis=1)


@functools.partial(
    jax.jit, static_argnames=("k", "block_reads", "interpret"))
def extract_mixed(codes, lengths, k, block_reads=256, interpret=False):
    """Mixed sort-ready key planes for a padded read batch (W == 2).

    Args:
        codes: (B, L) uint8/int32 2-bit base codes; 4 marks N/padding.
        lengths: (B,) int32 true read lengths.
        k: k-mer length (static, k <= 31 so W == 2).

    Returns:
        (hi, lo): (B, S_pad) uint32 mixed key planes, S_pad the
        128-multiple of S = L - k + 1; sentinel (F, F) marks padding
        and invalid windows.  ``valid`` is recoverable as
        ``~((hi == F) & (lo == F))`` on the first S columns.
    """
    b, length = codes.shape
    s = length - k + 1
    if s <= 0:
        raise ValueError(f"reads shorter than k={k}")
    if k > 31:
        raise ValueError("extract_mixed requires k <= 31 (W == 2)")
    s_pad = -(-s // 128) * 128
    pad_b = (-b) % block_reads
    codes_p = jnp.pad(
        codes.astype(jnp.uint8), ((0, pad_b), (0, 15)),
        constant_values=4)
    lens_p = jnp.pad(lengths.astype(jnp.int32), (0, pad_b))
    bp = b + pad_b
    grid = (bp // block_reads,)
    hi, lo = pl.pallas_call(
        functools.partial(_extract_mix_kernel, k=k, length=length,
                          s_pad=s_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_reads, length + 15),
                         lambda i: (i, 0), memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(codes_p, lens_p.reshape(bp, 1))
    return hi[:b], lo[:b]
