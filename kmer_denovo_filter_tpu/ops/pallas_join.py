"""Pallas TPU tile-join: the WGS-scale replacement for jellyfish
count ``--if`` / query (reference core/jellyfish_wrappers.py:115–283,
kmer_utils.py:124–245) at large table sizes.

Round-1 measurement (PERF.md) showed every XLA mid/large-table path is
dominated by one pathological op: materialising hash-routed query
blocks — a 4M-row scatter (~425 ms/batch) or its dynamic-slice
equivalent (~3 µs per slice).  The sort itself is cheap (~18 ms for
4.3M windows) and VPU broadcast-equality runs at ~550 G pairs/s when
no operand needs an in-loop relayout.  This module keeps the sort in
XLA and replaces block-building AND compare with one Pallas kernel
built around two layout decisions:

* **Lane-major partition tiles.**  The table is hash-partitioned at
  build time into planes of shape (P_pad, 1024): row *p* holds
  partition *p*'s ≤1024 key words along lanes (sentinel padded).  A
  partition is then a single dynamically-indexable row, and the whole
  window of partitions a chunk needs is two sequential row-slab DMAs.
  Planes hold bijectively *mixed* key words (Feistel over fmix32), so
  the partition index is a monotone function of the mixed high word
  and the route sort below orders by that single word alone
  (``num_keys=1`` — within-partition order is irrelevant to the
  join); no separate partition operand to carry.
* **Sublane-major queries.**  Each batch's window keys are sorted by
  their mixed words in XLA, so a 4096-row chunk touches a short
  contiguous partition range and each 128-query sub-chunk spans ~1–3
  partitions.  The kernel transposes a sub-chunk's queries to (128, 1)
  once, then loops its *actual* partition span with a dynamic-trip
  ``fori_loop``; the compare ``(128,1) == (1,1024)`` broadcasts with
  no relayout anywhere in the loop.

``--if`` tallies accumulate into a VMEM window slab and RMW back to
HBM once per chunk; the anchoring scan emits per-row membership flags
instead.  The only static capacity is the per-chunk partition window
``w_part``; chunks spanning more raise an overflow flag computed in
XLA and the engine retries with a doubled window (cached recompile).
Degenerate batches (huge spans from near-empty partitions) cost loop
iterations, never correctness.

Key-width support: W == 2 words (k ≤ 31) rides the bijective pair mix;
W in 3..8 (k ≤ 127) takes the generic-wide variant below (route hash +
raw-word payloads).  Wider keys fall back to the XLA hash-partitioned
sweep (ops/device.py).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmer_denovo_filter_tpu.ops import device as dev

SENTINEL = np.uint32(0xFFFFFFFF)

# ── Bijective key mixing ────────────────────────────────────────────
# Planes and query streams hold *mixed* key words, not raw ones: a
# 3-round Feistel of murmur3's fmix32 over the (w0, w1) pair.  The map
# is bijective, so mixed-pair equality ⟺ raw-pair equality and the
# kernel compares mixed words directly.  The payoff is in routing: the
# partition index becomes a monotone function of the mixed high word
# (fixed-point scale, `_part_from_hi`), so the route sort orders by
# (hi, lo) alone — two operands instead of carrying a separate
# partition operand (measured −2.1 ms/batch on the 4.2M-window sort).

_M1 = 0x85EBCA6B
_M2 = 0xC2B2AE35


def _fmix32_np(x):
    x = x.astype(np.uint32, copy=True)
    x ^= x >> np.uint32(16)
    x *= np.uint32(_M1)
    x ^= x >> np.uint32(13)
    x *= np.uint32(_M2)
    x ^= x >> np.uint32(16)
    return x


def mix_keys_np(w0, w1):
    h = w0.astype(np.uint32) ^ _fmix32_np(w1.astype(np.uint32))
    l = w1.astype(np.uint32) ^ _fmix32_np(h)
    h = h ^ _fmix32_np(l)
    return h, l


def _fmix32(x):
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(_M1)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(_M2)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _mix_keys(w0, w1):
    h = w0 ^ _fmix32(w1)
    l = w1 ^ _fmix32(h)
    h = h ^ _fmix32(l)
    return h, l


def _unmix_pair_np(h, l):
    h1 = h.astype(np.uint32) ^ _fmix32_np(l.astype(np.uint32))
    l0 = l.astype(np.uint32) ^ _fmix32_np(h1)
    h0 = h1 ^ _fmix32_np(l0)
    return h0, l0


# Sentinel safety: padded/invalid windows enter routing as the raw
# pair (SENTINEL, SENTINEL) and are re-pinned to that same pair
# *after* mixing, so they sort strictly last.  A real key could only
# collide if the mix's unique preimage of the all-ones pair were a
# valid key — valid W==2 keys are 2k bits left-aligned (k ≤ 31), so
# their w1 always has the low two bits clear.  Verified here once.
_s0, _s1 = _unmix_pair_np(np.array([SENTINEL]), np.array([SENTINEL]))
assert int(_s1[0]) & 3, "fmix sentinel preimage collides with key space"
del _s0, _s1


def _part_from_hi_np(hi, p):
    """floor(hi · p / 2^32) — monotone in ``hi``, uniform over [0, p)."""
    if p <= 0xFFFF:
        hi = hi.astype(np.uint32)
        pp = np.uint32(p)
        return ((((hi >> np.uint32(16)) * pp)
                 + (((hi & np.uint32(0xFFFF)) * pp) >> np.uint32(16)))
                >> np.uint32(16)).astype(np.int64)
    if p & (p - 1):
        raise ValueError("partition counts above 2^16 must be 2^n")
    return (hi.astype(np.uint32)
            >> np.uint32(32 - p.bit_length() + 1)).astype(np.int64)


def _part_from_hi(hi, p):
    if p <= 0xFFFF:
        pp = jnp.uint32(p)
        return ((((hi >> jnp.uint32(16)) * pp)
                 + (((hi & jnp.uint32(0xFFFF)) * pp) >> jnp.uint32(16)))
                >> jnp.uint32(16)).astype(jnp.int32)
    if p & (p - 1):
        raise ValueError("partition counts above 2^16 must be 2^n")
    return (hi >> jnp.uint32(32 - p.bit_length() + 1)).astype(jnp.int32)


def _grow_p(p):
    """Double the partition count, keeping the >2^16 range power-of-2."""
    np2 = p * 2
    if np2 > 0xFFFF and np2 & (np2 - 1):
        np2 = 1 << np2.bit_length()
    return np2

CHUNK_ROWS = 4096          # member-scan query rows per grid step
SUB_ROWS = 128             # rows per sub-chunk (one sublane)
NSUB = CHUNK_ROWS // SUB_ROWS
TILE_KEYS = 1024           # keys per partition row
# Target mean keys/partition at build time.  Join-kernel iterations
# scale as ~(n_real/128 + p): fuller partitions cut the dominant p
# term AND total compare volume (less tile padding).  832 leaves a
# >6 sigma Poisson margin to TILE_KEYS for mixed/hashed keys; the
# build loop still grows p if a tile ever overflows.
MEAN_FILL = 832
W_PART = 48                # member: partition-window rows per chunk
MAX_W_PART = 1024          # planes are padded by this many partitions

# Tally path (round 2): larger chunks amortise per-chunk costs, the
# partition window arrives as two auto-pipelined BlockSpec blocks
# (double-buffered by Pallas, hiding the window DMA behind compute),
# and the per-partition tally reduction runs on the MXU as
# dot((relt==t)·1f, eq·1f) instead of a cross-sublane vector sum.
CHUNK_T = 8192             # tally query rows per grid step
NSUB_T = CHUNK_T // SUB_ROWS
W_PART_TALLY = 96          # tally window block rows (covers 2 blocks)
MAX_W_PART_TALLY = 512     # retry ceiling: 2 blocks ≤ plane padding


def num_partitions(m):
    """Partition count for an *m*-key table (any positive integer)."""
    p = max(1, (m + MEAN_FILL - 1) // MEAN_FILL)
    if p > 0xFFFF and p & (p - 1):
        p = 1 << p.bit_length()
    return p


def build_tile_partitions(keys_np, p=None):
    """Host-side: hash-partition table keys into lane-major tiles.

    Returns ``(t0, t1, perm, p)``: planes of shape (p + pad, 1024)
    uint32 holding *mixed* key words (sentinel padded; pad = 1
    sentinel partition + MAX_W_PART so any window DMA stays in
    bounds) and ``perm`` of shape (p, TILE_KEYS) mapping tile slots
    back to original table rows (-1 = padding).
    """
    m, w = keys_np.shape
    if w != 2:
        raise ValueError("tile partitions require W == 2")
    if p is None:
        p = num_partitions(m)
    h, low = mix_keys_np(keys_np[:, 0].astype(np.uint32),
                         keys_np[:, 1].astype(np.uint32))
    part = _part_from_hi_np(h, p)
    counts = np.bincount(part, minlength=p)
    if int(counts.max()) > TILE_KEYS:
        # extremely skewed mix (unique keys make this vanishingly
        # rare) — grow the partition count until every tile fits
        return build_tile_partitions(keys_np, p=_grow_p(p))
    rows = p + 1 + MAX_W_PART
    t0 = np.full((rows, TILE_KEYS), SENTINEL, dtype=np.uint32)
    t1 = np.full((rows, TILE_KEYS), SENTINEL, dtype=np.uint32)
    perm = np.full((p, TILE_KEYS), -1, dtype=np.int64)
    order = np.argsort(part, kind="stable")
    sp = part[order]
    first = np.searchsorted(sp, np.arange(p))
    slot = np.arange(m) - first[sp]
    t0[sp, slot] = h[order]
    t1[sp, slot] = low[order]
    perm[sp, slot] = order
    return t0, t1, perm, p


def _join_kernel(meta_ref, t0_hbm, t1_hbm, s0_ref, s1_ref, sp_ref,
                 found_ref, t0w, t1w, sem_t0, sem_t1, *, w_part):
    """One member-scan chunk: DMA the partition window, join sub-chunks.

    meta_ref layout (scalar prefetch, int32):
      [c]                  → 8-aligned window base partition of chunk c
      [nc + i]             → sub_start (global sub index i)
      [nc + nc·NSUB + i]   → sub_span
    Per-row membership flags write to the blocked (NSUB, 128) output.
    """
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    base = pl.multiple_of(meta_ref[c], 8)
    d0 = pltpu.make_async_copy(
        t0_hbm.at[pl.ds(base, w_part), :], t0w, sem_t0)
    d1 = pltpu.make_async_copy(
        t1_hbm.at[pl.ds(base, w_part), :], t1w, sem_t1)
    d0.start()
    d1.start()
    d0.wait()
    d1.wait()

    for s in range(NSUB):
        st = meta_ref[nc + c * NSUB + s]
        span = meta_ref[nc + nc * NSUB + c * NSUB + s]
        # sublane-major copies, hoisted out of the partition loop so
        # the compare below needs no relayout per iteration
        q0t = s0_ref[s, :].reshape(SUB_ROWS, 1)
        q1t = s1_ref[s, :].reshape(SUB_ROWS, 1)
        relt = sp_ref[s, :].reshape(SUB_ROWS, 1) - st

        def body(t, fnd, q0t=q0t, q1t=q1t, relt=relt, st=st):
            # clamp: overflowing chunks (flag already set, results
            # replayed) must stay in-bounds rather than fault
            row = jnp.minimum(st - base + t, w_part - 1)
            eq = ((q0t == t0w[pl.ds(row, 1), :])
                  & (q1t == t1w[pl.ds(row, 1), :]))
            hit = (jnp.any(eq, axis=1, keepdims=True)
                   & (relt == t))
            return fnd | hit.astype(jnp.int32)

        fnd = jax.lax.fori_loop(
            0, span, body, jnp.zeros((SUB_ROWS, 1), jnp.int32))
        found_ref[s, :] = fnd.reshape(SUB_ROWS)


def _pack_meta(base, sub_start, sub_span):
    return jnp.concatenate([base, sub_start, sub_span])


def _tally_kernel(meta_ref, t0lo, t0hi, t1lo, t1hi, s0_ref, s1_ref,
                  sp_ref, acc_in_hbm, acc_out_hbm, accw, sem_in,
                  sem_out, *, w_part):
    """One tally chunk over auto-pipelined window blocks.

    meta layout (scalar prefetch, int32):
      [c]                    → window block index of chunk c
      [nc + c]               → 8-aligned acc slab base partition
      [2nc + i]              → sub_start (global sub index i)
      [2nc + nc·NSUB_T + i]  → sub_span
    The partition window is the two consecutive (w_part, TILE_KEYS)
    blocks starting at block meta[c]; sub-chunks whose span stays in
    the lo block take a single-ref fast path (the straddle case is
    rare: spans are ~2 partitions vs w_part ≥ 96).
    """
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
        relt = sp_ref[s, :].reshape(SUB_ROWS, 1) - st

        def tally(eq2, t, arow, _relt=relt):
            # MXU reduction: the partition mask rides the dot's LHS,
            # f32 accumulation is exact for counts ≤ 2^24.  arow is
            # clamped so overflowing chunks (flag set, results
            # replayed) never write out of the scratch slab.
            maskv = (_relt == t).astype(jnp.float32).reshape(
                1, SUB_ROWS)
            cnt = jax.lax.dot_general(
                maskv, eq2.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            arow = jnp.minimum(arow, w_part - 1)
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
                rhi = jnp.minimum(jnp.maximum(row - w_part, 0),
                                  w_part - 1)
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


def _tally_call(meta, t0, t1, s0r, s1r, spr, acc, w_part, interpret):
    """Invoke the tally kernel on routed queries + packed metadata."""
    nc = s0r.shape[0] // NSUB_T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((w_part, TILE_KEYS), lambda c, m: (m[c], 0),
                         memory_space=pltpu.VMEM),     # t0 window lo
            pl.BlockSpec((w_part, TILE_KEYS),
                         lambda c, m: (m[c] + 1, 0),
                         memory_space=pltpu.VMEM),     # t0 window hi
            pl.BlockSpec((w_part, TILE_KEYS), lambda c, m: (m[c], 0),
                         memory_space=pltpu.VMEM),     # t1 window lo
            pl.BlockSpec((w_part, TILE_KEYS),
                         lambda c, m: (m[c] + 1, 0),
                         memory_space=pltpu.VMEM),     # t1 window hi
            pl.BlockSpec((NSUB_T, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),     # s0
            pl.BlockSpec((NSUB_T, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),     # s1
            pl.BlockSpec((NSUB_T, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),     # spart
            pl.BlockSpec(memory_space=pltpu.ANY),      # acc (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((w_part, TILE_KEYS), jnp.int32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_tally_kernel, w_part=w_part),
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={8: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, t0, t0, t1, t1, s0r, s1r, spr, acc)


@functools.partial(
    jax.jit, static_argnames=("k", "p", "w_part", "interpret"))
def join_tally_step(t0, t1, acc, codes, lengths, k, p,
                    w_part=W_PART_TALLY, interpret=False):
    """Fused parent-scan step: extract → route → Pallas tile-join tally.

    ``acc`` is int32 with the planes' shape; returns (acc', overflow)
    where overflow means some chunk's partition span does not fit the
    two *w_part*-row window blocks (or the acc slab) — retry with
    doubled w_part, up to MAX_W_PART_TALLY.
    """
    keys, _valid = dev.extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, 2)
    pad = (-flat.shape[0]) % CHUNK_T
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad, 2), jnp.uint32(0xFFFFFFFF))], axis=0)
    n = flat.shape[0]
    w0, w1 = flat[:, 0], flat[:, 1]
    sent = (w0 == jnp.uint32(0xFFFFFFFF)) & (w1 == jnp.uint32(0xFFFFFFFF))
    h, low = _mix_keys(w0, w1)
    # single-key route sort + uniform sentinel handling:
    # re-pinned sentinels land in partition p-1 where they can only
    # match the table's (F, F) padding slots, whose tallies result()
    # drops via the perm (padding lanes carry perm -1)
    hi = jnp.where(sent, jnp.uint32(0xFFFFFFFF), h)
    lo = jnp.where(sent, jnp.uint32(0xFFFFFFFF), low)
    s0, s1 = jax.lax.sort((hi, lo), num_keys=1)
    spart = _part_from_hi(s0, p)
    nc = n // CHUNK_T
    sp2 = spart.reshape(nc * NSUB_T, SUB_ROWS)
    sub_start = sp2[:, 0]
    sub_span = (sp2[:, -1] - sub_start + 1).astype(jnp.int32)
    first = sub_start.reshape(nc, NSUB_T)[:, 0]
    blk = first // w_part
    base8 = (first // 8) * 8
    last = sp2[:, -1].reshape(nc, NSUB_T)[:, -1]
    overflow = ((jnp.max(last - blk * w_part + 1) > 2 * w_part)
                | (jnp.max(last - base8 + 1) > w_part))
    meta = jnp.concatenate([blk, base8, sub_start, sub_span])
    s0r = s0.reshape(n // 128, 128)
    s1r = s1.reshape(n // 128, 128)
    spr = spart.reshape(n // 128, 128)
    acc_out = _tally_call(meta, t0, t1, s0r, s1r, spr, acc, w_part,
                          interpret)
    return acc_out, overflow


_member_kernel = _join_kernel


def _member_call(meta, t0, t1, s0r, s1r, spr, w_part, interpret):
    """Invoke the member kernel on routed queries + packed metadata."""
    n = s0r.shape[0] * 128
    nc = s0r.shape[0] // NSUB
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
            pltpu.VMEM((w_part, TILE_KEYS), jnp.uint32),
            pltpu.VMEM((w_part, TILE_KEYS), jnp.uint32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_member_kernel, w_part=w_part),
        out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, t0, t1, s0r, s1r, spr)


@functools.partial(
    jax.jit, static_argnames=("k", "p", "w_part", "interpret"))
def join_member_step(t0, t1, codes, lengths, k, p, w_part=W_PART,
                     interpret=False):
    """Fused anchoring step: per-window membership via the tile-join.

    Returns (found (B, S) bool, overflow).  Extraction + mixing run
    as one Pallas kernel (pallas_extract.extract_mixed) whose
    sentinel-padded (B, S_pad) planes flatten straight into the
    route sort — no reshape/concat/mix graph between extraction and
    routing.
    """
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed
    b, length = codes.shape
    s = length - k + 1
    hi2, lo2 = extract_mixed(codes, lengths, k, interpret=interpret)
    s_pad = hi2.shape[1]
    sentinel = jnp.uint32(0xFFFFFFFF)
    valid = ~((hi2 == sentinel) & (lo2 == sentinel))
    hi = hi2.reshape(-1)
    lo = lo2.reshape(-1)
    n_orig = hi.shape[0]
    pad = (-n_orig) % CHUNK_ROWS
    if pad:
        hi = jnp.concatenate([hi, jnp.full(pad, sentinel)])
        lo = jnp.concatenate([lo, jnp.full(pad, sentinel)])
    n = hi.shape[0]
    idx0 = jnp.arange(n, dtype=jnp.int32)
    s0, s1, sidx = jax.lax.sort((hi, lo, idx0), num_keys=1)
    spart = _part_from_hi(s0, p)
    nc = n // CHUNK_ROWS
    sp2 = spart.reshape(nc * NSUB, SUB_ROWS)
    sub_start = sp2[:, 0]
    sub_span = (sp2[:, -1] - sub_start + 1).astype(jnp.int32)
    first = sub_start.reshape(nc, NSUB)[:, 0]
    base = (first // 8) * 8
    last = sp2[:, -1].reshape(nc, NSUB)[:, -1]
    need = jnp.max(last - base + 1)
    s0r = s0.reshape(n // 128, 128)
    s1r = s1.reshape(n // 128, 128)
    spr = spart.reshape(n // 128, 128)
    overflow = need > w_part
    meta = _pack_meta(base, sub_start, sub_span)
    found_sorted = _member_call(meta, t0, t1, s0r, s1r, spr, w_part,
                                interpret)
    # Unsort without a scatter: pack each row's found bit into the LSB
    # of its original index and sort the single packed operand — 9.8 ms
    # vs 27.5 ms for the permutation scatter at 4.2M rows (PERF.md).
    assert n < (1 << 30), "member batch too large for packed unsort"
    packed = (sidx << 1) | (found_sorted.reshape(n) > 0).astype(
        jnp.int32)
    ordered = jax.lax.sort(packed)
    found_flat = (ordered & 1) > 0
    found = (found_flat[:n_orig].reshape(b, s_pad)[:, :s]
             & valid[:, :s])
    return found, overflow


# ── Batch-local dedup tally (round 4) ───────────────────────────────
# Coverage-local read batches (a coordinate-sorted WGS BAM) repeat
# each genome k-mer ~coverage× — the window stream dedups ~4× even
# after sequencing-error singletons.  This path collapses duplicates
# BEFORE the expensive global route sort and join:
#
#   fused Pallas extract+mix (pallas_extract.extract_mixed)
#     → segmented 8192-row local sort (0.35× the global sort cost)
#     → adjacent-run detection + monotone-rank log-shift compaction
#       (13 pull steps, no scatter anywhere — collision-free because
#       dup-counts are non-decreasing, see _dedup_compact)
#     → small global 3-operand sort of the compacted stream
#     → WEIGHTED tile-join kernel (run multiplicities ride the MXU
#       tally dot's mask operand)
#
# Counts are exact: a run split across chunks (or by a rare mixed-hi
# collision interleaving) just yields two weighted rows whose tallies
# sum to the same total.  Replaces jellyfish's per-window counting
# loop (reference core/jellyfish_wrappers.py:189–200) with work
# proportional to the batch's distinct k-mers.

LCHUNK_DD = 8192           # local dedup chunk (rows)
CHUNK_DD = 4096            # join-kernel query rows per grid step
NSUB_DD = CHUNK_DD // SUB_ROWS
W_PART_DD = 256            # compacted streams are partition-sparser
# Per-chunk unique capacity (doubled on overflow).  Measured at 40×
# coverage / 0.3% error: max locals ~1570 of 8192; 1792 keeps a
# margin while cutting 12% of zero-weight junk rows from the global
# sort + join (18.99 → 18.26 ms/batch).
U_CHUNK_DD = 1792


def _dedup_flags(hs, ls):
    """Run-start flags, ranks and shift distances of locally-sorted
    (nloc, LCHUNK_DD) key planes.  ``d`` increments by at most 1 per
    column — the property both the compaction and the reverse
    expansion (:func:`_expand_by_rank`) rely on."""
    prev_h = jnp.pad(hs[:, :-1], ((0, 0), (1, 0)))
    prev_l = jnp.pad(ls[:, :-1], ((0, 0), (1, 0)))
    col = jax.lax.broadcasted_iota(jnp.int32, hs.shape, 1)
    st = (hs != prev_h) | (ls != prev_l) | (col == 0)
    rank = jnp.cumsum(st.astype(jnp.int32), axis=1)
    d = col - rank + 1
    return st, rank, d, col


def _expand_by_rank(vals, d):
    """``out[c, i] = vals[c, i − d[c, i]]`` for non-decreasing ``d``
    that grows by ≤ 1 per column — the inverse of the compaction's
    pull shift, as 13 reverse pull steps (high bit first).

    Correct because with ``d`` Lipschitz-1, for any position *t* with
    bit *j* of ``d[t]`` set, ``d[t − 2^j]`` shares ``d[t]``'s bits
    above *j* (it lies in ``[d[t] − 2^j, d[t]]`` which stays inside
    one ``2^(j+1)`` block), so per-target bit decisions compose.
    """
    nloc = vals.shape[0]
    x = vals
    for j in reversed(range(13)):
        s = 1 << j
        shr = jnp.concatenate(
            [jnp.zeros((nloc, s), x.dtype), x[:, :-s]], axis=1)
        x = jnp.where(((d >> j) & 1) == 1, shr, x)
    return x


def _dedup_compact(hi, lo, u_chunk):
    """Mixed flat stream → per-chunk (keys, weights), compacted.

    Rows past a chunk's unique count keep stale in-chunk key values
    with weight 0 — harmless to the weighted join; the subsequent
    GLOBAL sort of the compacted stream (not any chunk-local junk
    placement) is what keeps partition spans tight.  Returns flat
    ``(hi, lo, wgt, overflow)`` of ``(n / LCHUNK_DD) * u_chunk`` rows;
    *overflow* means some chunk had more than *u_chunk* uniques and
    the caller must retry with a doubled capacity.

    The compaction is the classic monotone-rank bit-serial shift: row
    *i*'s target slot is ``i − d_i`` with ``d_i`` its chunk-local
    duplicate count so far; ``d`` is non-decreasing, which makes the
    13 pull steps collision-free (for live rows *i < i′* at step
    mask *m*, ``(d_{i′}&m) − (d_i&m) ≤ d_{i′} − d_i < i′ − i``).
    """
    n = hi.shape[0]
    nloc = n // LCHUNK_DD
    h2 = hi.reshape(nloc, LCHUNK_DD)
    l2 = lo.reshape(nloc, LCHUNK_DD)
    hs, ls = jax.lax.sort((h2, l2), dimension=1, num_keys=1)
    return _dedup_compact_sorted(hs, ls, u_chunk)


def _dedup_compact_sorted(hs, ls, u_chunk, flags=None):
    """Compaction body of :func:`_dedup_compact` for pre-sorted
    (nloc, LCHUNK_DD) planes.  *flags* optionally carries a
    precomputed ``(st, rank, d, col)`` run-detection tuple from
    :func:`_dedup_flags` so callers that need those planes anyway
    (the member path) don't duplicate the graph."""
    nloc = hs.shape[0]
    if flags is None:
        flags = _dedup_flags(hs, ls)
    st, rank, d, col = flags
    # payload word: original column (14 bits, for run lengths by
    # position diff) | shift distance d (14 bits)
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
         jnp.full((nloc, 1), LCHUNK_DD, jnp.int32)], axis=1)
    nxt_live = jnp.concatenate(
        [live_f[:, 1:], jnp.zeros((nloc, 1), bool)], axis=1)
    nxt = jnp.where(nxt_live, nxt, LCHUNK_DD)
    wgt = jnp.where(live_f, nxt - pos, 0)
    # Pin junk rows (past each chunk's unique count) to the sentinel
    # pair: after the global sort they group at the stream's end,
    # where the masked span metadata excludes them — the join kernel
    # then iterates over REAL rows only (~40% fewer iterations at the
    # default capacity margin) instead of chasing stale keys.
    sent = jnp.uint32(0xFFFFFFFF)
    hs = jnp.where(live_f, hs, sent)
    ls = jnp.where(live_f, ls, sent)
    overflow = jnp.max(u_c) > u_chunk
    return (hs[:, :u_chunk].reshape(-1),
            ls[:, :u_chunk].reshape(-1),
            wgt[:, :u_chunk].reshape(-1), overflow)


def _tally_kernel_w(meta_ref, t0lo, t0hi, t1lo, t1hi, s0_ref, s1_ref,
                    sp_ref, w_ref, acc_in_hbm, acc_out_hbm, accw,
                    sem_in, sem_out, *, w_part, nsub=NSUB_DD):
    """Weighted tally chunk: like _tally_kernel, but each query row
    carries a run multiplicity that rides the MXU dot's mask.

    meta carries a trailing per-chunk ``active`` flag (all-sentinel
    chunks — the sorted junk tail — skip DMA and every sub) and
    zero-span subs skip their setup: with ~40% junk capacity margin
    the fixed per-chunk/per-sub costs would otherwise dominate the
    super-batch join.
    """
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    act = meta_ref[2 * nc + 2 * nc * nsub + c]

    @pl.when(act == 1)
    def _chunk():
        baseb = meta_ref[c] * w_part
        base8 = pl.multiple_of(meta_ref[nc + c], 8)
        din = pltpu.make_async_copy(
            acc_out_hbm.at[pl.ds(base8, w_part), :], accw, sem_in)
        din.start()
        din.wait()

        for s in range(nsub):
            st = meta_ref[2 * nc + c * nsub + s]
            span = meta_ref[2 * nc + nc * nsub + c * nsub + s]

            @pl.when(span > 0)
            def _sub(s=s, st=st, span=span):
                q0t = s0_ref[s, :].reshape(SUB_ROWS, 1)
                q1t = s1_ref[s, :].reshape(SUB_ROWS, 1)
                relt = sp_ref[s, :].reshape(SUB_ROWS, 1) - st
                wt = w_ref[s, :].reshape(SUB_ROWS, 1).astype(
                    jnp.float32)

                def tally(eq2, t, arow, _relt=relt, _wt=wt):
                    # per-sub weighted sums ≤ 128·8192 < 2^24: f32
                    # exact; arow clamped so overflowing chunks (flag
                    # set, results replayed) stay in-bounds
                    maskv = jnp.where(_relt == t, _wt, 0.0).reshape(
                        1, SUB_ROWS)
                    cnt = jax.lax.dot_general(
                        maskv, eq2.astype(jnp.float32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    arow = jnp.minimum(arow, w_part - 1)
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
                        rhi = jnp.minimum(
                            jnp.maximum(row - w_part, 0), w_part - 1)
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
                  interpret, nsub=NSUB_DD):
    nc = s0r.shape[0] // nsub
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
            pl.BlockSpec((nsub, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsub, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsub, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsub, 128), lambda c, m: (c, 0),
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
        functools.partial(_tally_kernel_w, w_part=w_part, nsub=nsub),
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={9: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, t0, t0, t1, t1, s0r, s1r, spr, wr, acc)


@functools.partial(
    jax.jit,
    static_argnames=("k", "p", "w_part", "u_chunk", "interpret"))
def join_tally_step_dedup(t0, t1, acc, codes, lengths, k, p,
                          w_part=W_PART_DD, u_chunk=U_CHUNK_DD,
                          interpret=False):
    """Dedup-first fused tally step (k ≤ 31).

    Returns ``(acc', ovf_span, ovf_u)``: *ovf_span* means a chunk's
    partition span missed the window blocks (retry with doubled
    *w_part*); *ovf_u* means a local chunk had more than *u_chunk*
    distinct keys (retry with doubled *u_chunk*, or fall back to
    :func:`join_tally_step` when dedup stops paying).
    """
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed
    hi2, lo2 = extract_mixed(codes, lengths, k, interpret=interpret)
    hi = hi2.reshape(-1)
    lo = lo2.reshape(-1)
    pad = (-hi.shape[0]) % LCHUNK_DD
    if pad:
        hi = jnp.concatenate(
            [hi, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
        lo = jnp.concatenate(
            [lo, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
    hc, lc, wc, ovf_u = _dedup_compact(hi, lo, u_chunk)
    s0, s1, sw = jax.lax.sort((hc, lc, wc), num_keys=1)
    n2 = s0.shape[0]
    pad2 = (-n2) % CHUNK_DD
    if pad2:
        s0 = jnp.concatenate(
            [s0, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
        s1 = jnp.concatenate(
            [s1, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
        sw = jnp.concatenate([sw, jnp.zeros(pad2, jnp.int32)])
        n2 += pad2
    # sentinel rows (junk + invalid windows, all weight 0) sort last;
    # masked span metadata excludes them so the kernel iterates real
    # rows only and all-sentinel tail chunks cost ~nothing
    sent_s = (s0 == jnp.uint32(0xFFFFFFFF)) \
        & (s1 == jnp.uint32(0xFFFFFFFF))
    spart = jnp.where(sent_s, p, _part_from_hi(s0, p))
    (spr, blk, base8, sub_start, sub_span, ovf_span,
     _need, active) = _masked_span_meta(spart, sent_s, p, CHUNK_DD,
                                        NSUB_DD, w_part,
                                        monotone=True)
    meta = jnp.concatenate([blk, base8, sub_start, sub_span, active])
    s0r = s0.reshape(n2 // 128, 128)
    s1r = s1.reshape(n2 // 128, 128)
    swr = sw.reshape(n2 // 128, 128)
    acc_out = _tally_call_w(meta, t0, t1, s0r, s1r, spr, swr, acc,
                            w_part, interpret)
    return acc_out, ovf_span, ovf_u


@functools.partial(
    jax.jit,
    static_argnames=("k", "p", "w_part", "u_chunk", "interpret"))
def join_tally_steps_dedup(t0, t1, acc, codes_nb, lengths_nb, k, p,
                           w_part=W_PART_DD, u_chunk=U_CHUNK_DD,
                           interpret=False):
    """Fold NB batches through the dedup tally in ONE dispatch.

    ``codes_nb`` is (NB, B, L) and ``lengths_nb`` (NB, B); the scan
    runs :func:`join_tally_step_dedup` per batch with the accumulator
    threaded through.  One jit call per NB batches amortises the
    per-dispatch host cost (multi-ms through a relay-attached chip,
    ~50 µs on PCIe hosts — either way pure overhead).  Returns
    ``(acc', ovf_span_any, ovf_u_any)``; on either overflow the caller
    must replay the whole super-batch from its pre-scan accumulator at
    the laddered capacity (same exact-retry contract as the
    single-batch step).
    """
    def body(acc, xs):
        codes, lengths = xs
        acc2, os_, ou_ = join_tally_step_dedup(
            t0, t1, acc, codes, lengths, k, p, w_part, u_chunk,
            interpret)
        return acc2, (os_, ou_)

    acc, (oss, ous) = jax.lax.scan(body, acc, (codes_nb, lengths_nb))
    return acc, jnp.any(oss), jnp.any(ous)


# Super-batch join window (batches per joined stream).  The join
# kernel's compare volume has a term ~TILE_KEYS·p ≈ M/fill that is
# INDEPENDENT of batch size — each batch's deduped queries still span
# every partition, so every partition row is DMA'd and compared at
# least once per join.  Deduping per batch but joining the
# concatenated compacted streams of NB_JOIN batches amortises that
# whole-table term NB_JOIN×; the marginal cost (a larger global sort +
# denser spans) is far smaller.  Replaces the reference's per-chunk
# jellyfish merge economics (core/jellyfish_wrappers.py:244–251) with
# on-device stream concatenation.
#
# Measured (round 5, 16.8M-key WGS config): tally nb=8 10.85 → nb=16
# 10.55 ms/batch; nb=32 does not compile (the scalar-prefetch meta
# array exceeds Mosaic's 1 MB SMEM budget at ~3,400 chunks), so 16 is
# the ceiling.  The member fan-out's unsorts grow superlinearly with
# the joined stream, so the member keeps its own smaller window
# (nb=8 13.53 vs nb=16 14.21 ms/batch).
NB_JOIN = 16
NB_JOIN_MEMBER = 8
W_PART_SB = 64             # super-batch streams are partition-dense
CHUNK_SB = 8192            # join chunk rows (halves per-chunk DMA and
NSUB_SB = CHUNK_SB // SUB_ROWS   # fixed cost vs CHUNK_DD)


@functools.partial(
    jax.jit,
    static_argnames=("k", "p", "w_part", "u_chunk", "interpret"))
def join_tally_superbatch_dedup(t0, t1, acc, codes_nb, lengths_nb, k,
                                p, w_part=W_PART_SB,
                                u_chunk=U_CHUNK_DD, interpret=False):
    """Dedup NB batches individually, join their compacted streams
    once.

    ``codes_nb`` is (NB, B, L), ``lengths_nb`` (NB, B).  Per batch:
    fused Pallas extract+mix → segmented local sort → run-length
    compaction (exactly :func:`join_tally_step_dedup`'s front half).
    The NB compacted (key, weight) streams then concatenate into ONE
    globally sorted query stream for a single weighted tile-join.
    Counts are exact: equal keys from different batches become
    adjacent weighted rows whose tallies sum.

    Returns ``(acc', ovf_span, ovf_u)`` with the usual retry
    semantics (replay the whole super-batch on overflow).
    """
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed

    def front(_, xs):
        codes, lengths = xs
        hi2, lo2 = extract_mixed(codes, lengths, k,
                                 interpret=interpret)
        hi = hi2.reshape(-1)
        lo = lo2.reshape(-1)
        pad = (-hi.shape[0]) % LCHUNK_DD
        if pad:
            hi = jnp.concatenate(
                [hi, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
            lo = jnp.concatenate(
                [lo, jnp.full(pad, jnp.uint32(0xFFFFFFFF))])
        hc, lc, wc, ovf_u = _dedup_compact(hi, lo, u_chunk)
        return 0, (hc, lc, wc, ovf_u)

    _, (hcs, lcs, wcs, ovf_us) = jax.lax.scan(
        front, 0, (codes_nb, lengths_nb))
    s0, s1, sw = jax.lax.sort(
        (hcs.reshape(-1), lcs.reshape(-1), wcs.reshape(-1)),
        num_keys=1)
    n2 = s0.shape[0]
    pad2 = (-n2) % CHUNK_SB
    if pad2:
        s0 = jnp.concatenate(
            [s0, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
        s1 = jnp.concatenate(
            [s1, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
        sw = jnp.concatenate([sw, jnp.zeros(pad2, jnp.int32)])
        n2 += pad2
    sent_s = (s0 == jnp.uint32(0xFFFFFFFF)) \
        & (s1 == jnp.uint32(0xFFFFFFFF))
    spart = jnp.where(sent_s, p, _part_from_hi(s0, p))
    (spr, blk, base8, sub_start, sub_span, ovf_span,
     _need, active) = _masked_span_meta(spart, sent_s, p, CHUNK_SB,
                                        NSUB_SB, w_part,
                                        monotone=True)
    meta = jnp.concatenate([blk, base8, sub_start, sub_span, active])
    s0r = s0.reshape(n2 // 128, 128)
    s1r = s1.reshape(n2 // 128, 128)
    swr = sw.reshape(n2 // 128, 128)
    acc_out = _tally_call_w(meta, t0, t1, s0r, s1r, spr, swr, acc,
                            w_part, interpret, nsub=NSUB_SB)
    return acc_out, ovf_span, jnp.any(ovf_us)


@functools.partial(
    jax.jit,
    static_argnames=("k", "p", "w_part", "u_chunk", "interpret"))
def join_member_steps_dedup(t0, t1, codes_nb, lengths_nb, k, p,
                            w_part=None, u_chunk=U_CHUNK_DD,
                            interpret=False):
    """Scan NB member batches in one dispatch (see
    :func:`join_tally_steps_dedup`).  Returns
    ``(found (NB, B, S) bool, ovf_span_any, ovf_u_any)``."""
    if w_part is None:
        w_part = W_PART_MEMBER_DD

    def body(carry, xs):
        codes, lengths = xs
        found, os_, ou_ = join_member_step_dedup(
            t0, t1, codes, lengths, k, p, w_part, u_chunk, interpret)
        return carry, (found, os_, ou_)

    _, (found, oss, ous) = jax.lax.scan(
        body, 0, (codes_nb, lengths_nb))
    return found, jnp.any(oss), jnp.any(ous)


# ── Dedup-first small-table sweep (round 5) ─────────────────────────
# The all-pairs VPU sweep (ops/device.py:small_table_tally) is
# compare-bound at ~16 ms/batch for M=4k tables — but its compare
# volume is proportional to the RAW window count.  Coverage-local
# batches dedup ~4.5× in 8192-window chunks (the round-4 machinery),
# so running the same sweep over the compacted WEIGHTED stream cuts
# the volume to the compacted capacity fraction (u_chunk/LCHUNK_DD ≈
# 22%) for ~3 ms of extract+dedup.  Equality in mixed space ≡
# equality in key space (the pair mix is bijective), so the table is
# mixed once at index build and the sweep compares mixed words
# directly.  Replaces the reference's per-window Aho-Corasick /
# jellyfish query loop economics (core/kmer_utils.py) the same way
# the tile-join does for big tables.

def small_weighted_tally(th, tl, hq, lq, wq, chunk=8192):
    """Weighted all-pairs sweep: per-table-key sums of query weights.

    *th*, *tl*: (M,) mixed table key words (sentinel-padded rows can
    only match a weight-0 junk row — see the sentinel-safety note
    above :func:`build_tile_partitions`).  *hq*, *lq*, *wq*: the
    compacted mixed query stream with run weights (junk rows carry
    weight 0).  Exact: int32 per-key sums of int32 weights.
    """
    m = th.shape[0]
    n = hq.shape[0]
    pad = (-n) % chunk
    if pad:
        hq = jnp.concatenate([hq, jnp.full(pad, SENTINEL)])
        lq = jnp.concatenate([lq, jnp.full(pad, SENTINEL)])
        wq = jnp.concatenate([wq, jnp.zeros(pad, jnp.int32)])
    hb = hq.reshape(-1, chunk)
    lb = lq.reshape(-1, chunk)
    wb = wq.reshape(-1, chunk)

    def body(carry, xs):
        h, l, w_ = xs
        eq = (h[:, None] == th[None, :]) & (l[:, None] == tl[None, :])
        return carry + jnp.where(eq, w_[:, None], 0).sum(
            axis=0, dtype=jnp.int32), 0.0

    counts, _ = jax.lax.scan(body, jnp.zeros(m, jnp.int32),
                             (hb, lb, wb))
    return counts


@functools.partial(
    jax.jit, static_argnames=("k", "u_chunk", "chunk", "interpret"))
def small_tally_step_dedup(th, tl, acc, codes, lengths, k,
                           u_chunk=U_CHUNK_DD, chunk=8192,
                           interpret=False):
    """Fused dedup-first small-table tally step (W == 2).

    extract+mix → segmented local dedup → weighted sweep against the
    mixed table.  Returns ``(acc', ovf_u)``; on *ovf_u* (a chunk had
    more than *u_chunk* distinct keys) the caller must replay the
    batch — doubled capacity or the plain sweep, both exact.
    """
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed
    hi2, lo2 = extract_mixed(codes, lengths, k, interpret=interpret)
    hi = hi2.reshape(-1)
    lo = lo2.reshape(-1)
    pad = (-hi.shape[0]) % LCHUNK_DD
    if pad:
        hi = jnp.concatenate([hi, jnp.full(pad, SENTINEL)])
        lo = jnp.concatenate([lo, jnp.full(pad, SENTINEL)])
    hc, lc, wc, ovf_u = _dedup_compact(hi, lo, u_chunk)
    sentq = (hc == SENTINEL) & (lc == SENTINEL)
    wq = jnp.where(sentq, 0, wc)
    counts = small_weighted_tally(th, tl, hc, lc, wq, chunk)
    return acc + counts, ovf_u


@functools.partial(
    jax.jit, static_argnames=("k", "u_chunk", "chunk", "interpret"))
def small_tally_steps_dedup(th, tl, acc, codes_nb, lengths_nb, k,
                            u_chunk=U_CHUNK_DD, chunk=8192,
                            interpret=False):
    """Fold NB same-shape batches through the dedup small sweep in
    ONE dispatch.  Returns ``(acc', ovf_u_any)``; on overflow the
    caller replays the whole group from its pre-scan accumulator
    (exact — same contract as :func:`join_tally_steps_dedup`)."""
    def body(acc, xs):
        codes, lengths = xs
        acc2, ovf = small_tally_step_dedup(
            th, tl, acc, codes, lengths, k, u_chunk, chunk, interpret)
        return acc2, ovf

    acc, ovfs = jax.lax.scan(body, acc, (codes_nb, lengths_nb))
    return acc, jnp.any(ovfs)


@functools.partial(
    jax.jit, static_argnames=("k", "u_chunk", "chunk", "interpret"))
def small_member_step_dedup(th, tl, codes, lengths, k,
                            u_chunk=U_CHUNK_DD, chunk=8192,
                            interpret=False):
    """Dedup-first small-table anchoring step (W == 2).

    Membership depends only on the key, so the all-pairs sweep runs
    over the compacted stream (~22% of the raw rows) and the bits fan
    back out.  Unlike :func:`join_member_step_dedup` there is no
    global route sort: an all-pairs sweep is order-free, so the
    compacted chunk-local stream feeds it directly and only the
    segmented expansion/unsort remains:

      sweep over (hc, lc) → :func:`_expand_by_rank` → packed
      segmented unsort of the local sort.

    Returns ``(found (B, S) bool, ovf_u)``.
    """
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed
    b, length = codes.shape
    s = length - k + 1
    hi2, lo2 = extract_mixed(codes, lengths, k, interpret=interpret)
    s_pad = hi2.shape[1]
    valid = ~((hi2 == SENTINEL) & (lo2 == SENTINEL))
    hi = hi2.reshape(-1)
    lo = lo2.reshape(-1)
    n_orig = hi.shape[0]
    pad = (-n_orig) % LCHUNK_DD
    if pad:
        hi = jnp.concatenate([hi, jnp.full(pad, SENTINEL)])
        lo = jnp.concatenate([lo, jnp.full(pad, SENTINEL)])
    n = hi.shape[0]
    nloc = n // LCHUNK_DD
    h2 = hi.reshape(nloc, LCHUNK_DD)
    l2 = lo.reshape(nloc, LCHUNK_DD)
    lidx = jnp.tile(
        jnp.arange(LCHUNK_DD, dtype=jnp.int32)[None, :], (nloc, 1))
    hs, ls, sl = jax.lax.sort((h2, l2, lidx), dimension=1, num_keys=1)
    flags = _dedup_flags(hs, ls)
    d = flags[2]
    hc, lc, _wgt, ovf_u = _dedup_compact_sorted(hs, ls, u_chunk,
                                                flags=flags)
    # order-free all-pairs membership over the compacted rows (junk
    # rows are the sentinel pair, which no real mixed table key can
    # equal — see the sentinel-safety note above build_tile_partitions)
    n2 = hc.shape[0]
    padq = (-n2) % chunk
    hq = jnp.concatenate([hc, jnp.full(padq, SENTINEL)]) if padq \
        else hc
    lq = jnp.concatenate([lc, jnp.full(padq, SENTINEL)]) if padq \
        else lc

    def body(carry, xs):
        h, l = xs
        eq = (h[:, None] == th[None, :]) & (l[:, None] == tl[None, :])
        return carry, eq.any(axis=1)

    _, fnd = jax.lax.scan(
        body, 0, (hq.reshape(-1, chunk), lq.reshape(-1, chunk)))
    found_comp = fnd.reshape(-1)[:n2].reshape(nloc, u_chunk)
    found_comp = jnp.pad(
        found_comp.astype(jnp.int32),
        ((0, 0), (0, LCHUNK_DD - u_chunk)))
    found_ls = _expand_by_rank(found_comp, d)
    pk = (sl << 1) | found_ls
    ordered2 = jax.lax.sort(pk, dimension=1)
    found_flat = ((ordered2 & 1) > 0).reshape(-1)[:n_orig]
    found = (found_flat.reshape(b, s_pad)[:, :s] & valid[:, :s])
    return found, ovf_u


@functools.partial(
    jax.jit, static_argnames=("k", "u_chunk", "chunk", "interpret"))
def small_member_steps_dedup(th, tl, codes_nb, lengths_nb, k,
                             u_chunk=U_CHUNK_DD, chunk=8192,
                             interpret=False):
    """Fold NB same-shape batches through the dedup small member
    sweep in ONE dispatch.  Returns ``(found (NB, B, S), ovf_any)``."""
    def body(carry, xs):
        codes, lengths = xs
        found, ovf = small_member_step_dedup(
            th, tl, codes, lengths, k, u_chunk, chunk, interpret)
        return carry, (found, ovf)

    _, (found, ovfs) = jax.lax.scan(
        body, 0, (codes_nb, lengths_nb))
    return found, jnp.any(ovfs)


# Member window over the compacted stream: ~4× fewer rows per
# partition than the raw stream means ~4× wider chunk spans (measured
# max ~450 at p≈27k for 4096-row chunks), and the member kernel has a
# single window block (no lo/hi pair), so it starts wide.
W_PART_MEMBER_DD = 512


@functools.partial(
    jax.jit,
    static_argnames=("k", "p", "w_part", "u_chunk", "interpret"))
def join_member_step_dedup(t0, t1, codes, lengths, k, p,
                           w_part=W_PART_MEMBER_DD,
                           u_chunk=U_CHUNK_DD, interpret=False):
    """Dedup-first anchoring step (k ≤ 31).

    The membership of a window depends only on its key, so the join
    kernel runs once per *distinct* chunk-local key (the compacted
    stream, ~4× fewer rows at WGS coverage) and the per-unique bits
    fan back out:

      found (global-sorted) → packed 1-op unsort to compacted order
      → :func:`_expand_by_rank` (reverse pull shifts; every row reads
      its run's bit at compacted column ``rank − 1``) → packed
      segmented unsort of the LOCAL sort (its permutation never
      crosses an 8192-row chunk, so the unsort is segmented too —
      0.35× the global unsort's n·log²n).

    Returns ``(found (B, S) bool, ovf_span, ovf_u)`` — same retry
    semantics as :func:`join_tally_step_dedup`.
    """
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed
    b, length = codes.shape
    s = length - k + 1
    hi2, lo2 = extract_mixed(codes, lengths, k, interpret=interpret)
    s_pad = hi2.shape[1]
    sentinel = jnp.uint32(0xFFFFFFFF)
    valid = ~((hi2 == sentinel) & (lo2 == sentinel))
    hi = hi2.reshape(-1)
    lo = lo2.reshape(-1)
    n_orig = hi.shape[0]
    pad = (-n_orig) % LCHUNK_DD
    if pad:
        hi = jnp.concatenate([hi, jnp.full(pad, sentinel)])
        lo = jnp.concatenate([lo, jnp.full(pad, sentinel)])
    n = hi.shape[0]
    nloc = n // LCHUNK_DD
    h2 = hi.reshape(nloc, LCHUNK_DD)
    l2 = lo.reshape(nloc, LCHUNK_DD)
    lidx = jnp.tile(
        jnp.arange(LCHUNK_DD, dtype=jnp.int32)[None, :], (nloc, 1))
    hs, ls, sl = jax.lax.sort((h2, l2, lidx), dimension=1, num_keys=1)
    flags = _dedup_flags(hs, ls)
    d = flags[2]
    hc, lc, _wgt, ovf_u = _dedup_compact_sorted(hs, ls, u_chunk,
                                                flags=flags)
    n2 = hc.shape[0]
    cpos = jnp.arange(n2, dtype=jnp.int32)
    s0, s1, scp = jax.lax.sort((hc, lc, cpos), num_keys=1)
    pad2 = (-n2) % CHUNK_ROWS
    if pad2:
        s0 = jnp.concatenate([s0, jnp.full(pad2, sentinel)])
        s1 = jnp.concatenate([s1, jnp.full(pad2, sentinel)])
        # padding cpos values sort past every real one in the packed
        # unsort below, so the [:n2] slice drops them
        scp = jnp.concatenate(
            [scp, n2 + jnp.arange(pad2, dtype=jnp.int32)])
    nq = s0.shape[0]
    # masked spans: junk/invalid rows are sentinel-pinned by the
    # compaction and excluded, so the kernel joins real rows only
    sent_s = (s0 == sentinel) & (s1 == sentinel)
    spart = jnp.where(sent_s, p, _part_from_hi(s0, p))
    (spr, _blk, base, sub_start, sub_span, _ovf_t,
     need, _active) = _masked_span_meta(spart, sent_s, p, CHUNK_ROWS,
                                        NSUB, w_part, monotone=True)
    ovf_span = need > w_part
    meta = _pack_meta(base, sub_start, sub_span)
    found_sorted = _member_call(
        meta, t0, t1, s0.reshape(nq // 128, 128),
        s1.reshape(nq // 128, 128), spr, w_part, interpret)
    packed = (scp << 1) | (found_sorted.reshape(nq) > 0).astype(
        jnp.int32)
    ordered = jax.lax.sort(packed)
    found_comp = ((ordered & 1) > 0)[:n2].reshape(nloc, u_chunk)
    found_comp = jnp.pad(
        found_comp.astype(jnp.int32),
        ((0, 0), (0, LCHUNK_DD - u_chunk)))
    found_ls = _expand_by_rank(found_comp, d)
    pk = (sl << 1) | found_ls
    ordered2 = jax.lax.sort(pk, dimension=1)
    found_flat = ((ordered2 & 1) > 0).reshape(-1)[:n_orig]
    found = (found_flat.reshape(b, s_pad)[:, :s] & valid[:, :s])
    return found, ovf_span, ovf_u


def _member_kernel_sb(meta_ref, t0lo, t0hi, t1lo, t1hi, s0_ref,
                      s1_ref, sp_ref, found_ref, *, w_part):
    """Super-batch member chunk: BlockSpec window pair (auto-deduped
    and double-buffered across the partition-ordered chunk sequence —
    the manual per-chunk window DMA of :func:`_join_kernel` would
    re-fetch ~1 MB per chunk) + active/span gating as in
    :func:`_tally_kernel_w`.

    meta layout (int32): [blk(nc) | sub_start(nc·NSUB) |
    sub_span(nc·NSUB) | active(nc)].
    """
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    act = meta_ref[nc + 2 * nc * NSUB + c]
    for s in range(NSUB):
        found_ref[s, :] = jnp.zeros((SUB_ROWS,), jnp.int32)

    @pl.when(act == 1)
    def _chunk():
        baseb = meta_ref[c] * w_part
        for s in range(NSUB):
            st = meta_ref[nc + c * NSUB + s]
            span = meta_ref[nc + nc * NSUB + c * NSUB + s]

            @pl.when(span > 0)
            def _sub(s=s, st=st, span=span):
                q0t = s0_ref[s, :].reshape(SUB_ROWS, 1)
                q1t = s1_ref[s, :].reshape(SUB_ROWS, 1)
                relt = sp_ref[s, :].reshape(SUB_ROWS, 1) - st

                @pl.when(st - baseb + span <= w_part)
                def _fast(q0t=q0t, q1t=q1t, relt=relt, st=st,
                          span=span, s=s):
                    def body(t, fnd):
                        row = st - baseb + t
                        eq = ((q0t == t0lo[pl.ds(row, 1), :])
                              & (q1t == t1lo[pl.ds(row, 1), :]))
                        hit = (jnp.any(eq, axis=1, keepdims=True)
                               & (relt == t))
                        return fnd | hit.astype(jnp.int32)
                    fnd = jax.lax.fori_loop(
                        0, span, body,
                        jnp.zeros((SUB_ROWS, 1), jnp.int32))
                    found_ref[s, :] = fnd.reshape(SUB_ROWS)

                @pl.when(st - baseb + span > w_part)
                def _straddle(q0t=q0t, q1t=q1t, relt=relt, st=st,
                              span=span, s=s):
                    def body(t, fnd):
                        row = st - baseb + t
                        rlo = jnp.minimum(row, w_part - 1)
                        rhi = jnp.minimum(
                            jnp.maximum(row - w_part, 0), w_part - 1)
                        in_lo = row < w_part
                        v0 = jnp.where(in_lo, t0lo[pl.ds(rlo, 1), :],
                                       t0hi[pl.ds(rhi, 1), :])
                        v1 = jnp.where(in_lo, t1lo[pl.ds(rlo, 1), :],
                                       t1hi[pl.ds(rhi, 1), :])
                        eq = (q0t == v0) & (q1t == v1)
                        hit = (jnp.any(eq, axis=1, keepdims=True)
                               & (relt == t))
                        return fnd | hit.astype(jnp.int32)
                    fnd = jax.lax.fori_loop(
                        0, span, body,
                        jnp.zeros((SUB_ROWS, 1), jnp.int32))
                    found_ref[s, :] = fnd.reshape(SUB_ROWS)


def _member_call_sb(meta, t0, t1, s0r, s1r, spr, w_part, interpret):
    n = s0r.shape[0] * 128
    nc = s0r.shape[0] // NSUB
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
            pl.BlockSpec((NSUB, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSUB, 128), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NSUB, 128), lambda c, m: (c, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_member_kernel_sb, w_part=w_part),
        out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, t0, t0, t1, t1, s0r, s1r, spr)


W_PART_SB_MEMBER = 128     # super-batch member window (dense stream)


@functools.partial(
    jax.jit,
    static_argnames=("k", "p", "w_part", "u_chunk", "interpret"))
def join_member_superbatch_dedup(t0, t1, codes_nb, lengths_nb, k, p,
                                 w_part=W_PART_SB_MEMBER,
                                 u_chunk=U_CHUNK_DD,
                                 interpret=False):
    """Super-batch anchoring scan: per-batch dedup, ONE member join.

    Front (scanned per batch): fused extract+mix → segmented local
    sort (index payload) → run detection → compaction.  The NB
    compacted streams join in a single gated member kernel over the
    concatenated globally-sorted stream; the found bits then fan back
    out per batch (packed global unsort → rank expansion → segmented
    local unsort — :func:`join_member_step_dedup`'s back half).

    Returns ``(found (NB, B, S) bool, ovf_span, ovf_u)``.
    """
    from kmer_denovo_filter_tpu.ops.pallas_extract import extract_mixed
    nb, b, length = codes_nb.shape
    s = length - k + 1
    sentinel = jnp.uint32(0xFFFFFFFF)

    def front(_, xs):
        codes, lengths = xs
        hi2, lo2 = extract_mixed(codes, lengths, k,
                                 interpret=interpret)
        valid = ~((hi2 == sentinel) & (lo2 == sentinel))
        hi = hi2.reshape(-1)
        lo = lo2.reshape(-1)
        pad = (-hi.shape[0]) % LCHUNK_DD
        if pad:
            hi = jnp.concatenate([hi, jnp.full(pad, sentinel)])
            lo = jnp.concatenate([lo, jnp.full(pad, sentinel)])
        nloc = hi.shape[0] // LCHUNK_DD
        h2 = hi.reshape(nloc, LCHUNK_DD)
        l2 = lo.reshape(nloc, LCHUNK_DD)
        lidx = jnp.tile(
            jnp.arange(LCHUNK_DD, dtype=jnp.int32)[None, :],
            (nloc, 1))
        hs, ls, sl = jax.lax.sort((h2, l2, lidx), dimension=1,
                                  num_keys=1)
        flags = _dedup_flags(hs, ls)
        hc, lc, _wgt, ovf_u = _dedup_compact_sorted(
            hs, ls, u_chunk, flags=flags)
        return 0, (hc, lc, flags[2], sl, valid, ovf_u)

    _, (hcs, lcs, ds, sls, valids, ovf_us) = jax.lax.scan(
        front, 0, (codes_nb, lengths_nb))
    s_pad = valids.shape[2]
    n2b = hcs.shape[1]
    n2 = nb * n2b
    cpos = jnp.arange(n2, dtype=jnp.int32)
    s0, s1, scp = jax.lax.sort(
        (hcs.reshape(-1), lcs.reshape(-1), cpos), num_keys=1)
    pad2 = (-n2) % CHUNK_ROWS
    if pad2:
        s0 = jnp.concatenate([s0, jnp.full(pad2, sentinel)])
        s1 = jnp.concatenate([s1, jnp.full(pad2, sentinel)])
        scp = jnp.concatenate(
            [scp, n2 + jnp.arange(pad2, dtype=jnp.int32)])
    nq = s0.shape[0]
    sent_s = (s0 == sentinel) & (s1 == sentinel)
    spart = jnp.where(sent_s, p, _part_from_hi(s0, p))
    (spr, blk, _base8, sub_start, sub_span, ovf_span,
     _need, active) = _masked_span_meta(spart, sent_s, p, CHUNK_ROWS,
                                        NSUB, w_part, monotone=True)
    meta = jnp.concatenate([blk, sub_start, sub_span, active])
    found_sorted = _member_call_sb(
        meta, t0, t1, s0.reshape(nq // 128, 128),
        s1.reshape(nq // 128, 128), spr, w_part, interpret)
    assert nq < (1 << 30), "super-batch too large for packed unsort"
    packed = (scp << 1) | (found_sorted.reshape(nq) > 0).astype(
        jnp.int32)
    ordered = jax.lax.sort(packed)
    found_comp = ((ordered & 1) > 0)[:n2].astype(jnp.int32).reshape(
        nb, n2b // u_chunk, u_chunk)

    def back(_, xs):
        fc, d, sl, valid = xs
        fc = jnp.pad(fc, ((0, 0), (0, LCHUNK_DD - u_chunk)))
        found_ls = _expand_by_rank(fc, d)
        pk = (sl << 1) | found_ls
        ordered2 = jax.lax.sort(pk, dimension=1)
        found_flat = ((ordered2 & 1) > 0).reshape(-1)[:b * s_pad]
        found = found_flat.reshape(b, s_pad)[:, :s] & valid[:, :s]
        return 0, found

    _, found_nb = jax.lax.scan(back, 0, (found_comp, ds, sls, valids))
    return found_nb, ovf_span, jnp.any(ovf_us)


# ── Wide dedup tally (k = 33..201) ──────────────────────────────────
# The same dedup-before-route trick for W ≥ 3 keys: local segmented
# sort by the route hash (raw words as payload), run-length
# compaction, global hash sort of the compacted stream, weighted wide
# kernel.  Smaller join chunks (2048 rows) keep the sparser compacted
# stream's partition spans inside VMEM-safe windows.

CHUNK_DD_WIDE = 2048
NSUB_DD_WIDE = CHUNK_DD_WIDE // SUB_ROWS


def wide_dd_w_part_cap(w):
    """VMEM-safe ladder ceiling for the weighted wide tally window
    (2·W double-buffered blocks + accumulator slab)."""
    per_row = 4 * TILE_KEYS * (4 * w + 1)
    return max(8, min(MAX_W_PART_TALLY,
                      _VMEM_BUDGET // per_row // 8 * 8))


def _dedup_compact_wide(flat, u_chunk):
    """(n, W) raw wide keys → compacted per-chunk (cols, weights).

    Same monotone-rank pull compaction as :func:`_dedup_compact`;
    runs are detected on the full W-word keys in route-hash order
    (hash-collision interleavings only split runs — exact either
    way).  Junk rows past a chunk's unique count become sentinels
    (weight 0, sort last).
    """
    n, w = flat.shape
    nloc = n // LCHUNK_DD
    cols = [flat[:, j].reshape(nloc, LCHUNK_DD) for j in range(w)]
    sent = cols[0] == jnp.uint32(0xFFFFFFFF)
    for cj in cols[1:]:
        sent = sent & (cj == jnp.uint32(0xFFFFFFFF))
    h = jnp.where(sent, jnp.uint32(0xFFFFFFFF), _route_hash(cols))
    srt = jax.lax.sort((h, *cols), dimension=1, num_keys=1)
    scols = list(srt[1:])
    st = None
    for cj in scols:
        prev = jnp.pad(cj[:, :-1], ((0, 0), (1, 0)))
        dj = cj != prev
        st = dj if st is None else (st | dj)
    col = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
    st = st | (col == 0)
    rank = jnp.cumsum(st.astype(jnp.int32), axis=1)
    d = col - rank + 1
    wd = (col << 14) | (d & 0x3FFF)
    live = st
    for j in range(13):
        sh = 1 << j

        def shl(a, fill, _s=sh):
            return jnp.concatenate(
                [a[:, _s:],
                 jnp.full((a.shape[0], _s), fill, a.dtype)], axis=1)

        src_live = shl(live, False)
        src_wd = shl(wd, 0)
        flag = src_live & (((src_wd >> j) & 1) == 1)
        stays = live & (((wd >> j) & 1) == 0)
        scols = [jnp.where(flag, shl(cj, jnp.uint32(0xFFFFFFFF)), cj)
                 for cj in scols]
        wd = jnp.where(flag, src_wd, wd)
        live = flag | stays
    u_c = rank[:, -1:]
    live_f = col < u_c
    pos = (wd >> 14) & 0x3FFF
    nxt = jnp.concatenate(
        [pos[:, 1:],
         jnp.full((nloc, 1), LCHUNK_DD, jnp.int32)], axis=1)
    nxt_live = jnp.concatenate(
        [live_f[:, 1:], jnp.zeros((nloc, 1), bool)], axis=1)
    nxt = jnp.where(nxt_live, nxt, LCHUNK_DD)
    wgt = jnp.where(live_f, nxt - pos, 0)
    # junk rows keep whatever stale key words survived the shifts;
    # unlike the narrow path those could disagree ACROSS word arrays
    # (each array shifted identically, so in fact they stay aligned),
    # but pin them to sentinels anyway so the global sort groups them
    # tightly at the end with zero weight
    scols = [jnp.where(live_f, cj, jnp.uint32(0xFFFFFFFF))
             for cj in scols]
    overflow = jnp.max(u_c) > u_chunk
    return ([cj[:, :u_chunk].reshape(-1) for cj in scols],
            wgt[:, :u_chunk].reshape(-1), overflow)


@functools.partial(
    jax.jit,
    static_argnames=("p", "w_part", "u_chunk", "interpret"))
def join_tally_flat_wide_dedup(planes, acc, flat, p,
                               w_part=W_PART_TALLY,
                               u_chunk=U_CHUNK_DD, interpret=False):
    """Dedup-first wide tally over pre-extracted flat keys.

    Returns ``(acc', ovf_span, ovf_u)`` with the same retry semantics
    as :func:`join_tally_step_dedup`; the caller ladders ``w_part``
    up to :func:`wide_dd_w_part_cap` and ``u_chunk`` up to
    ``LCHUNK_DD // 2`` before falling back to
    :func:`join_tally_flat_wide`.
    """
    w = len(planes)
    pad = (-flat.shape[0]) % LCHUNK_DD
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad, w), jnp.uint32(0xFFFFFFFF))],
            axis=0)
    cols_c, wgt, ovf_u = _dedup_compact_wide(flat, u_chunk)
    sent_c = cols_c[0] == jnp.uint32(0xFFFFFFFF)
    for cj in cols_c[1:]:
        sent_c = sent_c & (cj == jnp.uint32(0xFFFFFFFF))
    h2 = jnp.where(sent_c, jnp.uint32(0xFFFFFFFF),
                   _route_hash(cols_c))
    srt = jax.lax.sort((h2, *cols_c, wgt), num_keys=1)
    hs = srt[0]
    scols = list(srt[1:-1])
    sw = srt[-1]
    n2 = hs.shape[0]
    pad2 = (-n2) % CHUNK_DD_WIDE
    if pad2:
        hs = jnp.concatenate(
            [hs, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
        scols = [jnp.concatenate(
            [cj, jnp.full(pad2, jnp.uint32(0xFFFFFFFF))])
            for cj in scols]
        sw = jnp.concatenate([sw, jnp.zeros(pad2, jnp.int32)])
        n2 += pad2
    sent_s = scols[0] == jnp.uint32(0xFFFFFFFF)
    for cj in scols[1:]:
        sent_s = sent_s & (cj == jnp.uint32(0xFFFFFFFF))
    spart = jnp.where(sent_s, p, _part_from_hi(hs, p))
    (spr, blk, base8, sub_start, sub_span, ovf_span,
     _need, active) = _masked_span_meta(spart, sent_s, p,
                                        CHUNK_DD_WIDE, NSUB_DD_WIDE,
                                        w_part, monotone=True)
    meta = jnp.concatenate([blk, base8, sub_start, sub_span, active])
    qplanes = [cj.reshape(n2 // 128, 128) for cj in scols]
    swr = sw.reshape(n2 // 128, 128)
    acc_out = _tally_call_wide(meta, planes, qplanes, spr, acc, w,
                               w_part, interpret, wgt=swr,
                               nsub=NSUB_DD_WIDE, gated=True)
    return acc_out, ovf_span, ovf_u


# ── Shard-local routing (multi-chip tile-join) ──────────────────────
# On an S-device mesh the mixed high word does double duty: its top
# fixed-point scale picks the owner shard (floor(hi·S/2^32)) and the
# scale of the REMAINDER picks the partition within that shard — both
# monotone in hi.  One local sort therefore routes a batch for the
# all-to-all (contiguous per-destination segments, no scatter) AND
# pre-orders every segment for the receiving shard's join kernel (no
# second sort).  See parallel/tile_sharded.py for the shard_map
# programs built on these helpers.

def shard_thresholds(s):
    """uint32 thresholds t[d] = ceil(d·2^32 / s): the smallest mixed
    high word owned by shard d (d = 1..s-1)."""
    d = np.arange(1, s, dtype=np.uint64)
    return ((d << np.uint64(32)) + np.uint64(s - 1)) // np.uint64(s)


def local_part_from_hi(hi, s, p):
    """Partition within the owner shard: the fixed-point scale of the
    remainder ``hi·s mod 2^32`` — monotone in ``hi`` inside one
    shard's range, uniform over [0, p).  Reduces to
    :func:`_part_from_hi` at s == 1."""
    u = hi * jnp.uint32(s)          # wrapping ≡ hi·s − d·2^32
    return _part_from_hi(u, p)


def _local_part_np(hi, s, p):
    u = (hi.astype(np.uint64) * np.uint64(s)) & np.uint64(0xFFFFFFFF)
    return _part_from_hi_np(u.astype(np.uint32), p)


def build_shard_tile_partitions(keys_np, s, p=None):
    """Host-side: partition table keys across *s* shards, then into
    lane-major tiles per shard (common partition count *p*).

    Returns ``(t0, t1, perms, p)``: planes of shape
    (s, p + 1 + MAX_W_PART, TILE_KEYS) uint32 holding mixed key words
    and a list of per-shard (p, TILE_KEYS) int64 maps from tile slot
    back to the original table row (-1 = padding).
    """
    m, w = keys_np.shape
    if w != 2:
        raise ValueError("tile partitions require W == 2")
    h, low = mix_keys_np(keys_np[:, 0].astype(np.uint32),
                         keys_np[:, 1].astype(np.uint32))
    dest = ((h.astype(np.uint64) * np.uint64(s))
            >> np.uint64(32)).astype(np.int64)
    if p is None:
        per = max(1, -(-m // s))
        p = num_partitions(per)
    while True:
        part = _local_part_np(h, s, p)
        flat = dest * p + part
        counts = np.bincount(flat, minlength=s * p)
        if int(counts.max()) <= TILE_KEYS:
            break
        p = _grow_p(p)
    rows = p + 1 + MAX_W_PART
    t0 = np.full((s, rows, TILE_KEYS), SENTINEL, dtype=np.uint32)
    t1 = np.full((s, rows, TILE_KEYS), SENTINEL, dtype=np.uint32)
    perms = np.full((s, p, TILE_KEYS), -1, dtype=np.int64)
    order = np.argsort(flat, kind="stable")
    sf = flat[order]
    first = np.searchsorted(sf, np.arange(s * p))
    slot = np.arange(m) - first[sf]
    sd, sp_ = sf // p, sf % p
    t0[sd, sp_, slot] = h[order]
    t1[sd, sp_, slot] = low[order]
    perms[sd, sp_, slot] = order
    return t0, t1, perms, p


def route_presorted(s0, s1, p, s, chunk, nsub, w_part):
    """Chunk metadata for a stream of concatenated pre-sorted segments.

    ``s0``/``s1`` are mixed key words (sentinel rows (F, F) anywhere —
    segment padding is positional, so spans are computed over real
    rows only and sentinels get partition ``p``, matching nothing).
    Segment boundaries must align to *chunk*.

    Returns (s0r, s1r, spr, blk, base8, sub_start, sub_span,
    overflow_tally, need) — callers pick the tally or member fields.
    """
    n = s0.shape[0]
    sentinel = jnp.uint32(0xFFFFFFFF)
    sent = (s0 == sentinel) & (s1 == sentinel)
    spart = jnp.where(sent, p, local_part_from_hi(s0, s, p))
    (spr, blk, base8, sub_start, sub_span, overflow_tally,
     need, _active) = _masked_span_meta(spart, sent, p, chunk, nsub,
                                        w_part)
    s0r = s0.reshape(n // 128, 128)
    s1r = s1.reshape(n // 128, 128)
    return (s0r, s1r, spr, blk, base8, sub_start, sub_span,
            overflow_tally, need)


def _masked_span_meta(spart, sent, p, chunk, nsub, w_part,
                      monotone=False):
    """Real-masked sub-chunk spans + chunk window metadata.

    Also returns ``active`` — per-chunk "has any real row" flags, so
    kernels can skip all-sentinel chunks entirely (the sorted junk
    tail otherwise pays the full per-chunk fixed cost: window/acc DMA
    plus per-sub setup).

    ``monotone=True`` asserts *spart* is globally non-decreasing with
    sentinels (= p) last — true after a single global route sort —
    and halves the elementwise passes: each sub's min is its first
    element and its real max needs only one masked reduce.  Streams of
    concatenated per-segment sorts (route_presorted) must keep the
    general path.
    """
    n = spart.shape[0]
    nc = n // chunk
    sp2 = spart.reshape(nc * nsub, SUB_ROWS)
    if monotone:
        # ascending spart ⇒ each sub's min is its first element —
        # EXCEPT the s0 == 0xFFFFFFFF tail, where real rows (mixed hi
        # exactly F, partition p-1) interleave arbitrarily with
        # sentinels (partition p) under the 1-key sort.  In a sub
        # whose first element is already p, every real row is p-1, so
        # the real max doubles as the min there.
        mx = jnp.max(jnp.where(sp2 == p, -1, sp2), axis=1)
        first = sp2[:, 0]
        anyreal = mx >= 0
        mn = jnp.where(first < p, first, mx)
    else:
        real2 = ~sent.reshape(nc * nsub, SUB_ROWS)
        anyreal = jnp.any(real2, axis=1)
        mn = jnp.min(jnp.where(real2, sp2, p), axis=1)
        mx = jnp.max(jnp.where(real2, sp2, -1), axis=1)
    sub_start = jnp.where(anyreal, mn, 0).astype(jnp.int32)
    sub_span = jnp.where(anyreal, mx - mn + 1, 0).astype(jnp.int32)
    cmn = jnp.min(jnp.where(anyreal, mn, p).reshape(nc, nsub), axis=1)
    cmx = jnp.max(mx.reshape(nc, nsub), axis=1)
    active = (cmx >= 0).astype(jnp.int32)
    cfirst = jnp.where(cmx >= 0, cmn, 0)
    base8 = ((cfirst // 8) * 8).astype(jnp.int32)
    blk = (cfirst // w_part).astype(jnp.int32)
    last = jnp.maximum(cmx, cfirst)
    overflow_tally = (
        (jnp.max(last - blk * w_part + 1) > 2 * w_part)
        | (jnp.max(last - base8 + 1) > w_part))
    need = jnp.max(last - base8 + 1)
    spr = spart.reshape(n // 128, 128)
    return (spr, blk, base8, sub_start, sub_span, overflow_tally,
            need, active)


def route_presorted_wide(cols, p, s, chunk, nsub, w_part):
    """Wide-key analog of :func:`route_presorted`: *cols* is a list of
    W received word arrays (concatenated pre-sorted segments).  The
    local partition comes from the remainder scale of the route hash
    recomputed on the receiving shard (cheaper than shipping it)."""
    sent = cols[0] == jnp.uint32(0xFFFFFFFF)
    for cj in cols[1:]:
        sent = sent & (cj == jnp.uint32(0xFFFFFFFF))
    h = _route_hash(cols)
    spart = jnp.where(sent, p, local_part_from_hi(h, s, p))
    (spr, blk, base8, sub_start, sub_span, overflow_tally,
     need, _active) = _masked_span_meta(spart, sent, p, chunk, nsub,
                                        w_part)
    n = cols[0].shape[0]
    qplanes = [c.reshape(n // 128, 128) for c in cols]
    return (qplanes, spr, blk, base8, sub_start, sub_span,
            overflow_tally, need)


def build_shard_tile_partitions_wide(keys_np, s, p=None):
    """Host-side wide planes per shard: owner = scale of the route
    hash, partition = remainder scale.  Returns
    ``(planes (s, W, rows, 1024), perms (s, p, 1024), p)``."""
    m, w = keys_np.shape
    if not 3 <= w <= MAX_W_WIDE:
        raise ValueError(f"wide tile partitions require 3 <= W <= "
                         f"{MAX_W_WIDE}, got {w}")
    h = route_hash_np(np.ascontiguousarray(keys_np, np.uint32))
    dest = ((h.astype(np.uint64) * np.uint64(s))
            >> np.uint64(32)).astype(np.int64)
    if p is None:
        p = num_partitions(max(1, -(-m // s)))
    while True:
        part = _local_part_np(h, s, p)
        flat = dest * p + part
        counts = np.bincount(flat, minlength=s * p)
        if int(counts.max()) <= TILE_KEYS:
            break
        p = _grow_p(p)
    rows = p + 1 + MAX_W_PART
    planes = np.full((s, w, rows, TILE_KEYS), SENTINEL,
                     dtype=np.uint32)
    perms = np.full((s, p, TILE_KEYS), -1, dtype=np.int64)
    order = np.argsort(flat, kind="stable")
    sf = flat[order]
    first = np.searchsorted(sf, np.arange(s * p))
    slot = np.arange(m) - first[sf]
    sd, sp_ = sf // p, sf % p
    for j in range(w):
        planes[sd, j, sp_, slot] = keys_np[order, j]
    perms[sd, sp_, slot] = order
    return planes, perms, p


# ── Generic-W tile-join (k > 31) ────────────────────────────────────
# Wide keys (W words, 3 ≤ W ≤ 13 ⇒ every supported k ≤ 201) can't ride
# the bijective pair mix, so the route sort orders by a UNIFORM HASH
# of the whole key (one sort key) and carries the raw words as
# payload; the kernel compares raw words against W lane-major planes.
# Sentinels are detected post-sort (all words F) and excluded from
# spans, exactly like route_presorted.
#
# Wide widths above 8 carry a VMEM constraint: the tally pipeline
# holds 2·W double-buffered (w_part, 1024) window blocks, so w_part
# must shrink as W grows (`max_wide_w_part_tally`).  Large-k batches
# are window-sparse (k=151 ⇒ 2 windows per 152 bp read), so the
# engine accumulates extracted keys across read batches and joins
# once per dense super-batch (engine.FilteredCounter), keeping chunk
# partition spans inside those smaller windows.

MAX_W_WIDE = 13

_VMEM_BUDGET = 12 << 20  # leave headroom under the ~16 MB/core VMEM


def max_wide_w_part_tally(w):
    """Largest tally window (rows) whose 2·W double-buffered blocks +
    accumulator slab fit the VMEM budget, floored to 8.  Widths ≤ 8
    keep the measured MAX_W_PART_TALLY ceiling."""
    if w <= 8:
        return MAX_W_PART_TALLY
    per_row = 4 * TILE_KEYS * (4 * w + 1)  # 2W blocks ×2 buffers + acc
    return max(8, min(MAX_W_PART_TALLY,
                      _VMEM_BUDGET // per_row // 8 * 8))


def max_wide_w_part_member(w):
    """Largest member window whose W scratch buffers fit VMEM."""
    if w <= 8:
        return MAX_W_PART
    per_row = 4 * TILE_KEYS * w
    return max(8, min(MAX_W_PART, _VMEM_BUDGET // per_row // 8 * 8))


def route_hash_np(words):
    """Uniform uint32 route hash of (N, W) uint32 keys (numpy)."""
    h = np.zeros(words.shape[0], dtype=np.uint32)
    for j in range(words.shape[1]):
        h = _fmix32_np(h ^ words[:, j])
    return h


def _route_hash(words_cols):
    h = jnp.zeros_like(words_cols[0])
    for wj in words_cols:
        h = _fmix32(h ^ wj)
    return h


def build_tile_partitions_wide(keys_np, p=None):
    """Host-side planes for W ≥ 3 keys: (W, p + 1 + MAX_W_PART, 1024)
    raw words + (p, 1024) perm (slot → table row, -1 padding)."""
    m, w = keys_np.shape
    if not 3 <= w <= MAX_W_WIDE:
        raise ValueError(f"wide tile partitions require 3 <= W <= "
                         f"{MAX_W_WIDE}, got {w}")
    h = route_hash_np(np.ascontiguousarray(keys_np, np.uint32))
    if p is None:
        p = num_partitions(m)
    while True:
        part = _part_from_hi_np(h, p)
        counts = np.bincount(part, minlength=p)
        if int(counts.max()) <= TILE_KEYS:
            break
        p = _grow_p(p)
    rows = p + 1 + MAX_W_PART
    planes = np.full((w, rows, TILE_KEYS), SENTINEL, dtype=np.uint32)
    perm = np.full((p, TILE_KEYS), -1, dtype=np.int64)
    order = np.argsort(part, kind="stable")
    sp = part[order]
    first = np.searchsorted(sp, np.arange(p))
    slot = np.arange(m) - first[sp]
    for j in range(w):
        planes[j, sp, slot] = keys_np[order, j]
    perm[sp, slot] = order
    return planes, perm, p


def _tally_kernel_wide(meta_ref, *refs, w, w_part, nsub=NSUB_T,
                       weighted=False, gated=False):
    """Generic-W tally chunk: refs = W lo-blocks + W hi-blocks +
    W query planes + spart [+ weight plane] + acc HBM in/out +
    scratch accw + sems.  With *weighted*, each query row's run
    multiplicity rides the tally dot's mask (the dedup path).  With
    *gated*, meta carries a trailing per-chunk ``active`` flag and
    all-sentinel chunks / zero-span subs skip their work (see
    :func:`_tally_kernel_w`)."""
    lo = refs[:w]
    hi = refs[w:2 * w]
    qs = refs[2 * w:3 * w]
    sp_ref = refs[3 * w]
    woff = 1 if weighted else 0
    w_ref = refs[3 * w + 1] if weighted else None
    acc_out_hbm = refs[3 * w + woff + 2]
    accw, sem_in, sem_out = refs[3 * w + woff + 3:3 * w + woff + 6]
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    act = (meta_ref[2 * nc + 2 * nc * nsub + c] if gated
           else jnp.int32(1))

    @pl.when(act == 1)
    def _chunk():
        baseb = meta_ref[c] * w_part
        base8 = pl.multiple_of(meta_ref[nc + c], 8)
        din = pltpu.make_async_copy(
            acc_out_hbm.at[pl.ds(base8, w_part), :], accw, sem_in)
        din.start()
        din.wait()

        for s in range(nsub):
            st = meta_ref[2 * nc + c * nsub + s]
            span = meta_ref[2 * nc + nc * nsub + c * nsub + s]

            @pl.when(span > 0)
            def _sub(s=s, st=st, span=span):
                qt = [q[s, :].reshape(SUB_ROWS, 1) for q in qs]
                relt = sp_ref[s, :].reshape(SUB_ROWS, 1) - st
                wt = (w_ref[s, :].reshape(SUB_ROWS, 1).astype(
                    jnp.float32) if weighted else None)

                def tally(eq, t, arow, _relt=relt, _wt=wt):
                    if weighted:
                        maskv = jnp.where(_relt == t, _wt,
                                          0.0).reshape(1, SUB_ROWS)
                    else:
                        maskv = (_relt == t).astype(
                            jnp.float32).reshape(1, SUB_ROWS)
                    cnt = jax.lax.dot_general(
                        maskv, eq.astype(jnp.float32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    arow = jnp.minimum(arow, w_part - 1)
                    accw[pl.ds(arow, 1), :] += cnt.astype(jnp.int32)

                @pl.when(st - baseb + span <= w_part)
                def _fast(qt=qt, st=st, span=span):
                    def body(t, _):
                        row = st - baseb + t
                        eq = qt[0] == lo[0][pl.ds(row, 1), :]
                        for j in range(1, w):
                            eq &= qt[j] == lo[j][pl.ds(row, 1), :]
                        tally(eq, t, st - base8 + t)
                        return 0
                    jax.lax.fori_loop(0, span, body, 0)

                @pl.when(st - baseb + span > w_part)
                def _straddle(qt=qt, st=st, span=span):
                    def body(t, _):
                        row = st - baseb + t
                        rlo = jnp.minimum(row, w_part - 1)
                        rhi = jnp.minimum(
                            jnp.maximum(row - w_part, 0), w_part - 1)
                        in_lo = row < w_part
                        eq = None
                        for j in range(w):
                            v = jnp.where(in_lo,
                                          lo[j][pl.ds(rlo, 1), :],
                                          hi[j][pl.ds(rhi, 1), :])
                            e = qt[j] == v
                            eq = e if eq is None else (eq & e)
                        tally(eq, t, st - base8 + t)
                        return 0
                    jax.lax.fori_loop(0, span, body, 0)

        dout = pltpu.make_async_copy(
            accw, acc_out_hbm.at[pl.ds(base8, w_part), :], sem_out)
        dout.start()
        dout.wait()


def _member_kernel_wide(meta_ref, *refs, w, w_part):
    """Generic-W member chunk: refs = W plane HBM refs + W query
    planes + spart + found out + W window scratch + 2 DMA sems."""
    planes = refs[:w]
    qs = refs[w:2 * w]
    sp_ref = refs[2 * w]
    found_ref = refs[2 * w + 1]
    scratch = refs[2 * w + 2:3 * w + 2]
    sem_a, sem_b = refs[3 * w + 2:3 * w + 4]
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    base = pl.multiple_of(meta_ref[c], 8)
    copies = []
    for j in range(w):
        d = pltpu.make_async_copy(
            planes[j].at[pl.ds(base, w_part), :], scratch[j],
            sem_a if j % 2 == 0 else sem_b)
        d.start()
        copies.append(d)
        if j % 2 == 1 or j == w - 1:
            for dd in copies:
                dd.wait()
            copies = []

    for s in range(NSUB):
        st = meta_ref[nc + c * NSUB + s]
        span = meta_ref[nc + nc * NSUB + c * NSUB + s]
        qt = [q[s, :].reshape(SUB_ROWS, 1) for q in qs]
        relt = sp_ref[s, :].reshape(SUB_ROWS, 1) - st

        def body(t, fnd, qt=qt, relt=relt, st=st):
            row = jnp.minimum(st - base + t, w_part - 1)
            eq = qt[0] == scratch[0][pl.ds(row, 1), :]
            for j in range(1, w):
                eq &= qt[j] == scratch[j][pl.ds(row, 1), :]
            hit = (jnp.any(eq, axis=1, keepdims=True)
                   & (relt == t))
            return fnd | hit.astype(jnp.int32)

        fnd = jax.lax.fori_loop(
            0, span, body, jnp.zeros((SUB_ROWS, 1), jnp.int32))
        found_ref[s, :] = fnd.reshape(SUB_ROWS)


def _route_wide(flat, p, chunk, nsub, with_idx):
    """Route a (n, W) raw-key stream: hash sort + masked-span metadata.

    Returns (cols_sorted [W planes (n/128, 128)], spr, cfirst, clast,
    sub_start, sub_span, sidx, n) — cfirst/clast are each chunk's real
    partition extent, from which callers derive window indices and
    overflow at their own w_part.
    """
    w = flat.shape[1]
    pad = (-flat.shape[0]) % chunk
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad, w), jnp.uint32(0xFFFFFFFF))], axis=0)
    n = flat.shape[0]
    cols = [flat[:, j] for j in range(w)]
    sent = cols[0] == jnp.uint32(0xFFFFFFFF)
    for cj in cols[1:]:
        sent = sent & (cj == jnp.uint32(0xFFFFFFFF))
    h = jnp.where(sent, jnp.uint32(0xFFFFFFFF), _route_hash(cols))
    if with_idx:
        idx0 = jnp.arange(n, dtype=jnp.int32)
        srt = jax.lax.sort((h, *cols, idx0), num_keys=1)
        sidx = srt[-1]
        scols = srt[1:-1]
    else:
        srt = jax.lax.sort((h, *cols), num_keys=1)
        sidx = None
        scols = srt[1:]
    hs = srt[0]
    # sentinels detected post-sort from the payload words (the all-F
    # key is outside the valid key space: odd k ⇒ the last word always
    # has clear low bits)
    sent_s = scols[0] == jnp.uint32(0xFFFFFFFF)
    for cj in scols[1:]:
        sent_s = sent_s & (cj == jnp.uint32(0xFFFFFFFF))
    spart = jnp.where(sent_s, p, _part_from_hi(hs, p))
    nc = n // chunk
    sp2 = spart.reshape(nc * nsub, SUB_ROWS)
    real2 = ~sent_s.reshape(nc * nsub, SUB_ROWS)
    anyreal = jnp.any(real2, axis=1)
    mn = jnp.min(jnp.where(real2, sp2, p), axis=1)
    mx = jnp.max(jnp.where(real2, sp2, -1), axis=1)
    sub_start = jnp.where(anyreal, mn, 0).astype(jnp.int32)
    sub_span = jnp.where(anyreal, mx - mn + 1, 0).astype(jnp.int32)
    cmn = jnp.min(jnp.where(anyreal, mn, p).reshape(nc, nsub), axis=1)
    cmx = jnp.max(mx.reshape(nc, nsub), axis=1)
    cfirst = jnp.where(cmx >= 0, cmn, 0).astype(jnp.int32)
    clast = jnp.maximum(cmx, cfirst).astype(jnp.int32)
    planes = [c.reshape(n // 128, 128) for c in scols]
    spr = spart.reshape(n // 128, 128)
    return (planes, spr, cfirst, clast, sub_start, sub_span, sidx, n)


def _tally_call_wide(meta, planes, qplanes, spr, acc, w, w_part,
                     interpret, wgt=None, nsub=NSUB_T, gated=False):
    """Invoke the wide tally kernel on routed queries + metadata.
    With *wgt* (an (n/128, 128) int32 plane), runs the weighted
    (dedup) variant; *gated* skips all-sentinel chunks (the meta must
    then carry the trailing active flags)."""
    nc = spr.shape[0] // nsub
    weighted = wgt is not None
    nq = w + 1 + (1 if weighted else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=(
            [pl.BlockSpec((w_part, TILE_KEYS),
                          lambda c, m: (m[c], 0),
                          memory_space=pltpu.VMEM)] * w
            + [pl.BlockSpec((w_part, TILE_KEYS),
                            lambda c, m: (m[c] + 1, 0),
                            memory_space=pltpu.VMEM)] * w
            + [pl.BlockSpec((nsub, 128), lambda c, m: (c, 0),
                            memory_space=pltpu.VMEM)] * nq
            + [pl.BlockSpec(memory_space=pltpu.ANY)]
        ),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((w_part, TILE_KEYS), jnp.int32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
    )
    extra = (wgt,) if weighted else ()
    return pl.pallas_call(
        functools.partial(_tally_kernel_wide, w=w, w_part=w_part,
                          nsub=nsub, weighted=weighted, gated=gated),
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={2 * w + nq + 1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, *planes, *planes, *qplanes, spr, *extra, acc)


def _member_call_wide(meta, planes, qplanes, spr, w, w_part,
                      interpret):
    """Invoke the wide member kernel on routed queries + metadata."""
    n = spr.shape[0] * 128
    nc = spr.shape[0] // NSUB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.ANY)] * w
            + [pl.BlockSpec((NSUB, 128), lambda c, m: (c, 0),
                            memory_space=pltpu.VMEM)] * (w + 1)
        ),
        out_specs=pl.BlockSpec((NSUB, 128), lambda c, m: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((w_part, TILE_KEYS), jnp.uint32)] * w
            + [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
        ),
    )
    return pl.pallas_call(
        functools.partial(_member_kernel_wide, w=w, w_part=w_part),
        out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, *planes, *qplanes, spr)


def _tally_flat_wide(planes, acc, flat, p, w_part, interpret):
    """Route + wide tile-join of an (N, W) flat key stream."""
    w = len(planes)
    (qplanes, spr, cfirst, clast, sub_start, sub_span, _sidx,
     n) = _route_wide(flat, p, CHUNK_T, NSUB_T, with_idx=False)
    blk = cfirst // w_part
    base8 = (cfirst // 8) * 8
    overflow = ((jnp.max(clast - blk * w_part + 1) > 2 * w_part)
                | (jnp.max(clast - base8 + 1) > w_part))
    meta = jnp.concatenate([blk, base8, sub_start, sub_span])
    acc_out = _tally_call_wide(meta, planes, qplanes, spr, acc, w,
                               w_part, interpret)
    return acc_out, overflow


@functools.partial(
    jax.jit, static_argnames=("p", "w_part", "interpret"))
def join_tally_flat_wide(planes, acc, flat, p, w_part=W_PART_TALLY,
                         interpret=False):
    """Wide tally over pre-extracted flat keys (sentinel rows allowed).

    The k > 127 entry point: window-sparse read batches accumulate
    their extracted keys across feeds and join once per dense
    super-batch (engine.FilteredCounter flush), so chunk partition
    spans stay within the VMEM-constrained wide windows
    (`max_wide_w_part_tally`).
    """
    return _tally_flat_wide(planes, acc, flat, p, w_part, interpret)


@functools.partial(
    jax.jit, static_argnames=("k",))
def extract_flat_keys(codes, lengths, k):
    """Extract canonical windows as an (N, W) flat key stream
    (sentinels mark invalid windows) for deferred joining."""
    keys, _valid = dev.extract_canonical_windows(codes, lengths, k)
    return keys.reshape(-1, keys.shape[-1])


@functools.partial(
    jax.jit, static_argnames=("k", "p", "w_part", "interpret"))
def join_tally_step_wide(planes, acc, codes, lengths, k, p,
                         w_part=W_PART_TALLY, interpret=False):
    """Generic-W fused tally step (k > 31): extract → hash route →
    wide tile-join.  *planes* is a tuple of W (rows, 1024) uint32."""
    w = len(planes)
    keys, _valid = dev.extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, w)
    return _tally_flat_wide(planes, acc, flat, p, w_part, interpret)


@functools.partial(
    jax.jit, static_argnames=("k", "p", "w_part", "interpret"))
def join_member_step_wide(planes, codes, lengths, k, p, w_part=W_PART,
                          interpret=False):
    """Generic-W fused member step: per-window membership flags."""
    w = len(planes)
    b, length = codes.shape
    s = length - k + 1
    keys, valid = dev.extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, w)
    n_orig = flat.shape[0]
    (qplanes, spr, cfirst, clast, sub_start, sub_span, sidx,
     n) = _route_wide(flat, p, CHUNK_ROWS, NSUB, with_idx=True)
    base8 = (cfirst // 8) * 8
    overflow = jnp.max(clast - base8 + 1) > w_part
    meta = jnp.concatenate([base8, sub_start, sub_span])
    found_sorted = _member_call_wide(meta, planes, qplanes, spr, w,
                                     w_part, interpret)
    assert n < (1 << 30), "member batch too large for packed unsort"
    packed = (sidx << 1) | (found_sorted.reshape(n) > 0).astype(
        jnp.int32)
    ordered = jax.lax.sort(packed)
    found_flat = (ordered & 1) > 0
    found = found_flat[:n_orig].reshape(b, s) & valid
    return found, overflow
