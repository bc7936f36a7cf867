"""Device (jnp/XLA) k-mer kernels: extraction, sort-count, probe.

This is the TPU replacement for Jellyfish's count/query/dump core
(reference core/jellyfish_wrappers.py, kmer_utils.py:124–245):

* :func:`extract_canonical_windows` — all canonical k-mer keys of a
  padded 2-bit read batch, fully vectorised (shift/or word packing;
  no per-window gather of k bases).
* :func:`sort_count` — sort-based canonical counting
  (``jellyfish count -C`` ≡ multi-word radix sort + segment sum; on
  TPU a bitonic ``lax.sort`` over W uint32 words).
* :func:`lookup_sorted` — batched membership/count probe
  (``jellyfish query`` ≡ vectorised binary search).

All functions are jit-compatible with static ``k``; shapes are padded
by the engine layer to limit recompiles.  The invalid/padding sentinel
is all-ones in every word, which (k odd) can never be a real canonical
key and sorts after all real keys.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kmer_denovo_filter_tpu.ops.encode import words_per_kmer

SENTINEL = jnp.uint32(0xFFFFFFFF)


@functools.partial(jax.jit, static_argnames=("k",))
def extract_canonical_windows(codes, lengths, k):
    """Canonical k-mer keys for every window of a padded read batch.

    Args:
        codes: (B, L) uint8/int32 2-bit base codes; 4 marks N/padding.
        lengths: (B,) int32 true read lengths.
        k: k-mer length (static).

    Returns:
        keys: (B, S, W) uint32 canonical keys, S = L - k + 1
            (sentinel rows where invalid).
        valid: (B, S) bool — window inside the read and free of N.
    """
    codes = codes.astype(jnp.int32)
    b, length = codes.shape
    s = length - k + 1
    if s <= 0:
        raise ValueError(f"reads shorter than k={k}")
    w = words_per_kmer(k)
    full_words = k // 16
    rem = k % 16  # >0 because k is odd

    is_bad = (codes >= 4).astype(jnp.int32)
    clean = jnp.where(codes >= 4, 0, codes)
    comp = 3 - clean

    # pack32[t] = big-endian pack of clean[t..t+15]; needs 15 pad cols.
    padded = jnp.pad(clean, ((0, 0), (0, 15)))
    t_len = length  # t in [0, L-1]
    pack32 = jnp.zeros((b, t_len), dtype=jnp.uint32)
    for i in range(16):
        pack32 = pack32 | (
            padded[:, i:i + t_len].astype(jnp.uint32)
            << jnp.uint32(2 * (15 - i)))

    # rpack32[t] packs comp[t] (MSB) down to comp[t-15] (LSB), using a
    # 15-column leading pad so t-15 never indexes out of bounds.
    comp_p = jnp.pad(comp, ((0, 0), (15, 0)))
    rpack32 = jnp.zeros((b, t_len), dtype=jnp.uint32)
    for i in range(16):
        rpack32 = rpack32 | (
            comp_p[:, i:i + t_len].astype(jnp.uint32)
            << jnp.uint32(2 * i))

    last_mask = jnp.uint32(((1 << (2 * rem)) - 1) << (32 - 2 * rem))

    fwd_words = []
    rc_words = []
    for wi in range(w):
        if wi < full_words:
            fwd_words.append(jax.lax.dynamic_slice_in_dim(
                pack32, 16 * wi, s, axis=1))
            # rc word wi: MSB = comp[s + k - 1 - 16*wi] = rpack32 at
            # that index, so slice start is k - 1 - 16*wi.
            rc_words.append(jax.lax.dynamic_slice_in_dim(
                rpack32, k - 1 - 16 * wi, s, axis=1))
        else:
            fwd_words.append(jax.lax.dynamic_slice_in_dim(
                pack32, 16 * wi, s, axis=1) & last_mask)
            # rc last word: rpack32p index s + rem - 1 (with 15-lead pad)
            rc_words.append(jax.lax.dynamic_slice_in_dim(
                rpack32, rem - 1, s, axis=1) & last_mask)

    # canonical = word-wise lexicographic min(fwd, rc)
    lt = jnp.zeros((b, s), dtype=bool)
    eq = jnp.ones((b, s), dtype=bool)
    for wi in range(w):
        lt = lt | (eq & (fwd_words[wi] < rc_words[wi]))
        eq = eq & (fwd_words[wi] == rc_words[wi])
    pick_fwd = lt | eq

    # validity: no N in window, window fits in the read
    bad_prefix = jnp.cumsum(
        jnp.pad(is_bad, ((0, 0), (1, 0))), axis=1)  # (B, L+1)
    bad_in_win = (jax.lax.dynamic_slice_in_dim(bad_prefix, k, s, axis=1)
                  - jax.lax.dynamic_slice_in_dim(bad_prefix, 0, s, axis=1))
    starts = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    valid = (bad_in_win == 0) & (starts + k <= lengths[:, None])

    key_words = []
    for wi in range(w):
        word = jnp.where(pick_fwd, fwd_words[wi], rc_words[wi])
        key_words.append(jnp.where(valid, word, SENTINEL))
    keys = jnp.stack(key_words, axis=-1)
    return keys, valid


@functools.partial(jax.jit, static_argnames=("w",))
def sort_count(flat_keys, w):
    """Sort flattened keys and compute run lengths.

    Args:
        flat_keys: (N, W) uint32 (sentinel rows allowed).
        w: word count (static).

    Returns:
        sorted_keys: (N, W) uint32 in ascending order.
        starts: (N,) bool, True at the first row of each run.
        counts: (N,) int32, run length at each start row (0 elsewhere).
    """
    n = flat_keys.shape[0]
    operands = tuple(flat_keys[:, j] for j in range(w))
    sorted_ops = jax.lax.sort(operands, num_keys=w)
    skeys = jnp.stack(sorted_ops, axis=-1)
    neq = jnp.zeros(n, dtype=bool)
    for j in range(w):
        neq = neq.at[1:].set(neq[1:] | (sorted_ops[j][1:] != sorted_ops[j][:-1]))
    starts = neq.at[0].set(True)
    counts = _run_lengths(starts)
    return skeys, starts, counts


def _run_lengths(starts):
    """Run length at each run-start row (0 elsewhere).

    Segment-sum over run ids.  (A reverse-cummin scan formulation is
    algorithmically cheaper at runtime but `associative_scan` compile
    times through the remote TPU compiler are prohibitive — minutes
    per shape — so the scatter+gather pair stays.)
    """
    n = starts.shape[0]
    group = jnp.cumsum(starts.astype(jnp.int32)) - 1
    counts_per_group = jax.ops.segment_sum(
        jnp.ones(n, dtype=jnp.int32), group, num_segments=n)
    return jnp.where(starts, counts_per_group[group], 0)


@functools.partial(jax.jit, static_argnames=("w",))
def sort_count_weighted(flat_keys, weights, w):
    """Like :func:`sort_count` but sums int32 *weights* per run."""
    n = flat_keys.shape[0]
    operands = tuple(flat_keys[:, j] for j in range(w)) + (weights,)
    sorted_ops = jax.lax.sort(operands, num_keys=w)
    skeys = jnp.stack(sorted_ops[:w], axis=-1)
    sw = sorted_ops[w]
    neq = jnp.zeros(n, dtype=bool)
    for j in range(w):
        neq = neq.at[1:].set(neq[1:] | (sorted_ops[j][1:] != sorted_ops[j][:-1]))
    starts = neq.at[0].set(True)
    group = jnp.cumsum(starts.astype(jnp.int32)) - 1
    counts_per_group = jax.ops.segment_sum(sw, group, num_segments=n)
    counts = jnp.where(starts, counts_per_group[group], 0)
    return skeys, starts, counts


@functools.partial(jax.jit, static_argnames=("w",))
def sort_count_perm(flat_keys, w):
    """:func:`sort_count` + the sort permutation (original row index)."""
    n = flat_keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    operands = tuple(flat_keys[:, j] for j in range(w)) + (iota,)
    sorted_ops = jax.lax.sort(operands, num_keys=w)
    skeys = jnp.stack(sorted_ops[:w], axis=-1)
    perm = sorted_ops[w]
    neq = jnp.zeros(n, dtype=bool)
    for j in range(w):
        neq = neq.at[1:].set(
            neq[1:] | (sorted_ops[j][1:] != sorted_ops[j][:-1]))
    starts = neq.at[0].set(True)
    group = jnp.cumsum(starts.astype(jnp.int32)) - 1
    counts = _run_lengths(starts)
    return skeys, starts, counts, group, perm


def _compact_uniques(skeys, starts, counts, w, cap):
    """Scatter run-start rows into fixed-capacity unique buffers.

    Returns (uniq_keys (cap, W), uniq_counts (cap,), overflow).
    Sentinel runs land in the discard slot; real runs beyond *cap*
    raise the overflow flag so the caller can retry with a larger cap.
    """
    n = skeys.shape[0]
    sent = jnp.ones(n, dtype=bool)
    for j in range(w):
        sent = sent & (skeys[:, j] == SENTINEL)
    real_start = starts & ~sent
    pos = jnp.cumsum(real_start.astype(jnp.int32)) - 1
    overflow = jnp.any(real_start & (pos >= cap))
    tgt = jnp.where(real_start & (pos < cap), pos, cap)
    ukeys = jnp.full((cap + 1, w), SENTINEL).at[tgt].set(skeys)[:cap]
    ucnts = jnp.zeros(cap + 1, jnp.int32).at[tgt].set(counts)[:cap]
    upos_of_group = pos  # per sorted row: unique slot of its run start
    return ukeys, ucnts, upos_of_group, overflow


@functools.partial(
    jax.jit, static_argnames=("k", "w", "m_pad", "cap"))
def filtered_tally_step(table, acc, codes, lengths, k, w, m_pad, cap):
    """Fused parent-scan step: extract → dedup → probe uniques → tally.

    The production replacement for per-window binary search: window
    keys are deduplicated with one sort (coverage-local read batches
    dedup 10–30×), only the ≤``cap`` unique keys run the log₂(M)
    gather-round probe, and each hit adds its in-batch multiplicity to
    the table tally.  Returns (acc', overflow).
    """
    keys, _valid = extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, w)
    skeys, starts, counts = sort_count(flat, w)
    ukeys, ucnts, _upos, overflow = _compact_uniques(
        skeys, starts, counts, w, cap)
    idx, found = lookup_sorted(table, ukeys, w)
    idx = jnp.clip(idx, 0, m_pad - 1)
    acc = acc.at[idx].add(jnp.where(found, ucnts, 0))
    return acc, overflow


@functools.partial(jax.jit, static_argnames=("k", "w", "cap"))
def scan_hits_step(table, codes, lengths, k, w, cap):
    """Fused anchoring step: per-window hit mask via dedup + probe.

    Probes each batch-unique key once, then maps verdicts back to the
    (B, S) window grid through the sort permutation (two linear
    passes).  Returns (found (B, S) bool, overflow).
    """
    b, length = codes.shape
    s = length - k + 1
    keys, valid = extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, w)
    skeys, starts, counts, group, perm = sort_count_perm(flat, w)
    ukeys, _ucnts, upos_of_row, overflow = _compact_uniques(
        skeys, starts, counts, w, cap)
    _idx, ufound = lookup_sorted(table, ukeys, w)
    # per sorted row: verdict of its run's unique slot
    row_found = ufound[jnp.clip(upos_of_row, 0, cap - 1)] \
        & (upos_of_row >= 0) & (upos_of_row < cap)
    # unsort back to original window order
    n = flat.shape[0]
    found_flat = jnp.zeros(n, dtype=bool).at[perm].set(row_found)
    found = found_flat.reshape(b, s) & valid
    return found, overflow


def _lex_le_gather(table, idx, q, w):
    """table[idx] <= q, lexicographic over w words. idx clipped."""
    m = table.shape[0]
    idx_c = jnp.clip(idx, 0, m - 1)
    lt = jnp.zeros(q.shape[0], dtype=bool)
    eq = jnp.ones(q.shape[0], dtype=bool)
    for j in range(w):
        tj = table[idx_c, j]
        qj = q[:, j]
        lt = lt | (eq & (tj < qj))
        eq = eq & (tj == qj)
    return lt | eq


@functools.partial(jax.jit, static_argnames=("w", "chunk"))
def small_table_tally(table_small, flat_keys, w, chunk=8192):
    """Per-table-key hit counts by brute-force broadcast compare.

    For tables that fit comfortably in VMEM (M ≤ ~4k), an O(N·M)
    all-pairs equality sweep on the VPU beats every gather-based probe
    AND removes the need to sort/dedup the windows first — there is no
    per-element random access anywhere.  This is the fast path for
    VCF-mode parent scans (child tables are small) and GIAB-scale
    proband sets.
    """
    m = table_small.shape[0]
    n = flat_keys.shape[0]
    pad = (-n) % chunk
    keys = jnp.pad(flat_keys, ((0, pad), (0, 0)),
                   constant_values=jnp.uint32(0xFFFFFFFF))
    blocks = keys.reshape(-1, chunk, w)
    # exclude sentinel table padding from matching
    tsent = jnp.ones(m, dtype=bool)
    for j in range(w):
        tsent = tsent & (table_small[:, j] == jnp.uint32(0xFFFFFFFF))

    def body(carry, block):
        eq = jnp.ones((chunk, m), dtype=bool)
        for j in range(w):
            eq = eq & (block[:, j, None] == table_small[None, :, j])
        return carry + eq.sum(axis=0, dtype=jnp.int32), 0.0

    counts, _ = jax.lax.scan(body, jnp.zeros(m, jnp.int32), blocks)
    return jnp.where(tsent, 0, counts)


@functools.partial(jax.jit, static_argnames=("w", "chunk"))
def small_table_member(table_small, flat_keys, w, chunk=8192):
    """Per-query membership by brute-force broadcast compare (small M)."""
    m = table_small.shape[0]
    n = flat_keys.shape[0]
    pad = (-n) % chunk
    keys = jnp.pad(flat_keys, ((0, pad), (0, 0)),
                   constant_values=jnp.uint32(0xFFFFFFFF))
    blocks = keys.reshape(-1, chunk, w)
    tsent = jnp.ones(m, dtype=bool)
    for j in range(w):
        tsent = tsent & (table_small[:, j] == jnp.uint32(0xFFFFFFFF))

    def body(_, block):
        eq = jnp.ones((chunk, m), dtype=bool)
        for j in range(w):
            eq = eq & (block[:, j, None] == table_small[None, :, j])
        return 0.0, (eq & ~tsent[None, :]).any(axis=1)

    _, found = jax.lax.scan(body, 0.0, blocks)
    return found.reshape(-1)[:n]


@functools.partial(
    jax.jit, static_argnames=("k", "w", "chunk"))
def small_tally_step(table_small, acc, codes, lengths, k, w,
                     chunk=8192):
    """Fused small-table parent-scan step: extract → all-pairs tally.

    No sort, no dedup, no gathers — the whole filtered count is one
    VPU sweep.  ``acc`` is aligned with the (unpadded) small table.
    """
    keys, _valid = extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, w)
    return acc + small_table_tally(table_small, flat, w, chunk)


@functools.partial(
    jax.jit, static_argnames=("k", "w", "chunk"))
def small_tally_steps(table_small, acc, codes_nb, lengths_nb, k, w,
                      chunk=8192):
    """Fold NB same-shape batches through the small-table step in ONE
    dispatch (``codes_nb`` is (NB, B, L)) — the per-batch host
    dispatch is pure overhead on any transport (multi-ms through a
    relay-attached chip).  The small sweep has no overflow cases, so
    the scan needs no retry plumbing."""
    def body(acc, xs):
        codes, lengths = xs
        return small_tally_step(table_small, acc, codes, lengths, k,
                                w, chunk), None

    acc, _ = jax.lax.scan(body, acc, (codes_nb, lengths_nb))
    return acc


@functools.partial(jax.jit, static_argnames=("k", "w", "chunk"))
def small_scan_hits_step(table_small, codes, lengths, k, w,
                         chunk=8192):
    """Fused small-table anchoring step: extract → all-pairs member."""
    b, length = codes.shape
    s = length - k + 1
    keys, valid = extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, w)
    found = small_table_member(table_small, flat, w, chunk)
    return found.reshape(b, s) & valid


# ── Hash-partitioned sweep (mid-size tables) ───────────────────────
#
# For tables too big for the all-pairs sweep but where the gather-
# bound bucketed probe underperforms, both sides partition by a hash
# of the key: the table once at build time into (P, cap_t, W) padded
# blocks (hashing makes the partitions uniform despite canonical-key
# skew), each query batch on the fly by sorting on the hash and
# scattering into (P, cap_q, W) blocks.  Matching is then a blocked
# all-pairs compare per partition — sorts, scatters and VPU compares
# only, no per-element gathers.

_HASH_MULT = jnp.uint32(0x9E3779B1)


def _partition_hash(w0, w1):
    h = (w0 ^ (w1 * jnp.uint32(0x85EBCA77))) * _HASH_MULT
    return h ^ (h >> jnp.uint32(16))


def build_hash_partitions(keys_np, p_bits, slack=4.0):
    """Host-side: partition table keys by hash into padded blocks.

    Returns (blocks (P, cap_t, W) uint32, counts (P,), perm) where
    ``perm[p, i]`` is the original table row of block entry (p, i)
    (-1 for padding).
    """
    import numpy as _np
    m, w = keys_np.shape
    p = 1 << p_bits
    w0 = keys_np[:, 0].astype(_np.uint32)
    w1 = (keys_np[:, 1].astype(_np.uint32) if w > 1
          else _np.zeros(m, _np.uint32))
    h = (w0 ^ (w1 * _np.uint32(0x85EBCA77))) * _np.uint32(0x9E3779B1)
    h = h ^ (h >> _np.uint32(16))
    part = (h >> _np.uint32(32 - p_bits)).astype(_np.int64)
    counts = _np.bincount(part, minlength=p)
    cap_t = max(8, int(counts.max()))
    blocks = _np.full((p, cap_t, w), 0xFFFFFFFF, dtype=_np.uint32)
    perm = _np.full((p, cap_t), -1, dtype=_np.int64)
    cursor = _np.zeros(p, dtype=_np.int64)
    order = _np.argsort(part, kind="stable")
    for row in order:
        pp = part[row]
        blocks[pp, cursor[pp]] = keys_np[row]
        perm[pp, cursor[pp]] = row
        cursor[pp] += 1
    return blocks, counts, perm


@functools.partial(
    jax.jit, static_argnames=("k", "w", "p_bits", "cap_q"))
def partitioned_tally_step(tblocks, acc_blocks, codes, lengths, k, w,
                           p_bits, cap_q):
    """Fused mid-size parent-scan step via hash-partitioned sweep.

    ``acc_blocks`` is (P, cap_t) int32 aligned with *tblocks*; the
    engine maps it back to table order with the build permutation.
    Returns (acc_blocks', overflow).
    """
    p = 1 << p_bits
    keys, _valid = extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, w)
    n = flat.shape[0]
    w0 = flat[:, 0]
    w1 = flat[:, 1] if w > 1 else jnp.zeros(n, jnp.uint32)
    sent = jnp.ones(n, dtype=bool)
    for j in range(w):
        sent = sent & (flat[:, j] == SENTINEL)
    h = _partition_hash(w0, w1)
    part = jnp.where(sent, jnp.uint32(0xFFFFFFFF), h) \
        >> jnp.uint32(32 - p_bits)
    part = jnp.where(sent, p, part.astype(jnp.int32))

    # sort windows by partition id, then scatter into (P, cap_q) blocks
    operands = jax.lax.sort(
        (part,) + tuple(flat[:, j] for j in range(w)), num_keys=1)
    spart = operands[0]
    skeys = jnp.stack(operands[1:1 + w], axis=-1)
    idx = jnp.arange(n, dtype=jnp.int32)
    # first row index of each partition via scatter-min, then one
    # gather pass for the within-partition slot
    part_first = jnp.full(p + 1, n, jnp.int32).at[
        jnp.clip(spart, 0, p)].min(idx)
    slot = idx - part_first[jnp.clip(spart, 0, p)]
    valid_q = (spart < p) & (slot < cap_q)
    overflow = jnp.any((slot >= cap_q) & (spart < p))
    flat_idx = jnp.where(valid_q, spart * cap_q + slot, p * cap_q)
    qblocks = jnp.full((p * cap_q + 1, w), SENTINEL).at[flat_idx].set(
        skeys)[:-1].reshape(p, cap_q, w)

    # blocked all-pairs compare, chunked over partitions to bound the
    # (PC, cap_q, cap_t) intermediates
    cap_t = tblocks.shape[1]
    pc = max(1, min(p, (1 << 25) // max(cap_q * cap_t, 1)))
    while p % pc:
        pc -= 1
    qch = qblocks.reshape(p // pc, pc, cap_q, w)
    tch = tblocks.reshape(p // pc, pc, cap_t, w)

    def body(carry, operand):
        qb, tb = operand
        eq = jnp.ones((pc, cap_q, cap_t), dtype=bool)
        for j in range(w):
            eq = eq & (qb[:, :, None, j] == tb[:, None, :, j])
        return carry, eq.sum(axis=1, dtype=jnp.int32)

    _, hits = jax.lax.scan(body, 0.0, (qch, tch))
    hits = hits.reshape(p, cap_t)
    tsent = jnp.ones((p, cap_t), dtype=bool)
    for j in range(w):
        tsent = tsent & (tblocks[:, :, j] == SENTINEL)
    hits = jnp.where(tsent, 0, hits)
    return acc_blocks + hits, overflow


@functools.partial(
    jax.jit, static_argnames=("k", "w", "p_bits", "cap_q"))
def partitioned_scan_hits_step(tblocks, codes, lengths, k, w, p_bits,
                               cap_q):
    """Fused mid-size read-scan via the hash-partitioned sweep.

    Member-query sibling of :func:`partitioned_tally_step`: both sides
    are hash-partitioned, per-partition all-pairs compares decide
    membership, and the (P, cap_q) verdicts scatter back through the
    window sort to a (B, S) hit mask — no per-query table gathers.
    Returns (found (B, S) bool, overflow).
    """
    p = 1 << p_bits
    b, length = codes.shape
    s = length - k + 1
    keys, valid = extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, w)
    n = flat.shape[0]
    w0 = flat[:, 0]
    w1 = flat[:, 1] if w > 1 else jnp.zeros(n, jnp.uint32)
    sent = jnp.ones(n, dtype=bool)
    for j in range(w):
        sent = sent & (flat[:, j] == SENTINEL)
    h = _partition_hash(w0, w1)
    part = jnp.where(sent, jnp.uint32(0xFFFFFFFF), h) \
        >> jnp.uint32(32 - p_bits)
    part = jnp.where(sent, p, part.astype(jnp.int32))

    # sort by partition, carrying each window's original flat index so
    # block verdicts can scatter straight back
    idx0 = jnp.arange(n, dtype=jnp.int32)
    operands = jax.lax.sort(
        (part,) + tuple(flat[:, j] for j in range(w)) + (idx0,),
        num_keys=1)
    spart = operands[0]
    skeys = jnp.stack(operands[1:1 + w], axis=-1)
    sidx = operands[1 + w]
    idx = jnp.arange(n, dtype=jnp.int32)
    part_first = jnp.full(p + 1, n, jnp.int32).at[
        jnp.clip(spart, 0, p)].min(idx)
    slot = idx - part_first[jnp.clip(spart, 0, p)]
    valid_q = (spart < p) & (slot < cap_q)
    overflow = jnp.any((slot >= cap_q) & (spart < p))
    flat_idx = jnp.where(valid_q, spart * cap_q + slot, p * cap_q)
    qblocks = jnp.full((p * cap_q + 1, w), SENTINEL).at[flat_idx].set(
        skeys)[:-1].reshape(p, cap_q, w)

    cap_t = tblocks.shape[1]
    pc = max(1, min(p, (1 << 25) // max(cap_q * cap_t, 1)))
    while p % pc:
        pc -= 1
    qch = qblocks.reshape(p // pc, pc, cap_q, w)
    tch = tblocks.reshape(p // pc, pc, cap_t, w)

    def body(carry, operand):
        qb, tb = operand
        # NOTE: the transposed orientation ((pc, cap_t, cap_q), reduce
        # over the middle axis like the tally body) was measured
        # identical in runtime but 60x slower to compile — keep the
        # lane-axis reduce
        eq = jnp.ones((pc, cap_q, cap_t), dtype=bool)
        for j in range(w):
            eq = eq & (qb[:, :, None, j] == tb[:, None, :, j])
        return carry, eq.any(axis=2)

    _, fnd = jax.lax.scan(body, 0.0, (qch, tch))
    # per-sorted-row verdict via an O(n) gather from block space (a
    # block-space scatter would touch p*cap_q >> n elements, and a
    # shared dropped-row index would serialise it — measured 6x step
    # cost), then back to original window order through the sort
    # permutation (sidx is a permutation, so the scatter is unique)
    addr = jnp.where(valid_q, spart * cap_q + slot, 0)
    found_sorted = fnd.reshape(p * cap_q)[addr] & valid_q
    found_flat = jnp.zeros(n, dtype=bool).at[sidx].set(found_sorted)
    found = found_flat.reshape(b, s) & valid
    return found, overflow


def build_bucket_offsets(keys_np, p_bits):
    """Host-side: per-prefix rank offsets for the bucketed probe.

    ``off[p]`` = first table row whose word0's top *p_bits* are >= p.
    Returns (off (2^p+1,) int32, max_bucket).
    """
    import numpy as _np
    prefixes = (keys_np[:, 0] >> np.uint32(32 - p_bits)).astype(_np.int64)
    counts = _np.bincount(prefixes, minlength=1 << p_bits)
    off = _np.zeros((1 << p_bits) + 1, dtype=_np.int32)
    _np.cumsum(counts, out=off[1:])
    return off, int(counts.max()) if counts.size else 0


@functools.partial(jax.jit, static_argnames=("w", "p_bits", "rounds"))
def lookup_bucketed(table, off, queries, w, p_bits, rounds):
    """Bucket-pointer probe: prefix offsets + short local binary search.

    The top *p_bits* of word0 select a precomputed rank range in the
    sorted table, so only ``rounds`` = ceil(log2(max_bucket)) binary
    search iterations remain — ~3-5x fewer gather passes than the
    full-table search, which is the dominant cost of device probes.
    """
    m = table.shape[0]
    n = queries.shape[0]
    p = (queries[:, 0] >> jnp.uint32(32 - p_bits)).astype(jnp.int32)
    lo = off[p] - 1          # table[lo] <= q (virtual -inf at -1)
    hi = off[p + 1]          # table[hi] > q

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        le = _lex_le_gather(table, mid, queries, w)
        lo = jnp.where(le, mid, lo)
        hi = jnp.where(le, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, rounds, body, (lo, hi))
    idx_c = jnp.clip(lo, 0, m - 1)
    eq = jnp.ones(n, dtype=bool)
    for j in range(w):
        eq = eq & (table[idx_c, j] == queries[:, j])
    found = eq & (lo >= 0)
    return lo, found


@functools.partial(
    jax.jit, static_argnames=("k", "w", "m_pad", "cap", "p_bits",
                              "rounds"))
def filtered_tally_step_bucketed(table, off, acc, codes, lengths, k, w,
                                 m_pad, cap, p_bits, rounds):
    """:func:`filtered_tally_step` with the bucket-pointer probe."""
    keys, _valid = extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, w)
    skeys, starts, counts = sort_count(flat, w)
    ukeys, ucnts, _upos, overflow = _compact_uniques(
        skeys, starts, counts, w, cap)
    idx, found = lookup_bucketed(table, off, ukeys, w, p_bits, rounds)
    idx = jnp.clip(idx, 0, m_pad - 1)
    acc = acc.at[idx].add(jnp.where(found, ucnts, 0))
    return acc, overflow


@functools.partial(
    jax.jit, static_argnames=("k", "w", "cap", "p_bits", "rounds"))
def scan_hits_step_bucketed(table, off, codes, lengths, k, w, cap,
                            p_bits, rounds):
    """:func:`scan_hits_step` with the bucket-pointer probe."""
    b, length = codes.shape
    s = length - k + 1
    keys, valid = extract_canonical_windows(codes, lengths, k)
    flat = keys.reshape(-1, w)
    skeys, starts, counts, group, perm = sort_count_perm(flat, w)
    ukeys, _ucnts, upos_of_row, overflow = _compact_uniques(
        skeys, starts, counts, w, cap)
    _idx, ufound = lookup_bucketed(table, off, ukeys, w, p_bits, rounds)
    row_found = ufound[jnp.clip(upos_of_row, 0, cap - 1)] \
        & (upos_of_row >= 0) & (upos_of_row < cap)
    n = flat.shape[0]
    found_flat = jnp.zeros(n, dtype=bool).at[perm].set(row_found)
    found = found_flat.reshape(b, s) & valid
    return found, overflow


@functools.partial(jax.jit, static_argnames=("w",))
def lookup_sorted(table, queries, w):
    """Vectorised binary search of query rows in a sorted key table.

    Args:
        table: (M, W) uint32 sorted ascending (sentinel padding at end).
        queries: (N, W) uint32.
        w: word count (static).

    Returns:
        idx: (N,) int32 position of the first row >= query.
        found: (N,) bool exact-match flag.
    """
    m = table.shape[0]
    n = queries.shape[0]
    steps = max(1, (m + 1).bit_length())
    lo = jnp.full(n, -1, dtype=jnp.int32)   # table[lo] <= q (virtual -inf)
    hi = jnp.full(n, m, dtype=jnp.int32)    # table[hi] > q (virtual +inf)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        le = _lex_le_gather(table, mid, queries, w)
        lo = jnp.where(le, mid, lo)
        hi = jnp.where(le, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    # exact match iff table[lo] == q
    idx_c = jnp.clip(lo, 0, m - 1)
    eq = jnp.ones(n, dtype=bool)
    for j in range(w):
        eq = eq & (table[idx_c, j] == queries[:, j])
    found = eq & (lo >= 0)
    return lo, found


@functools.partial(jax.jit, static_argnames=("w", "m"))
def probe_accumulate(table, acc, queries, w, m):
    """Probe queries against *table* and add hits into per-key tally.

    The device analog of ``jellyfish count --if`` filtered counting
    (reference core/jellyfish_wrappers.py:167–176): *acc* is an int32
    tally aligned with the sorted *table* rows; each query found in the
    table increments its row.  Sentinel/padded queries never match.
    """
    idx, found = lookup_sorted(table, queries, w)
    idx_c = jnp.clip(idx, 0, m - 1)
    return acc.at[idx_c].add(found.astype(jnp.int32))


def pad_pow2_rows(arr, fill):
    """Pad axis 0 to the next power of two (numpy helper)."""
    n = arr.shape[0]
    target = 1 if n == 0 else 1 << (n - 1).bit_length()
    if target == n:
        return arr
    pad = np.full((target - n,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)
