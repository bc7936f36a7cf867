"""Multi-chip tile-join engine: the Pallas fast path over a mesh.

The single-chip tile-join (ops/pallas_join.py) routes a batch with one
sort because the mixed high word encodes the partition index.  On an
S-device mesh the same word does double duty:

* ``floor(hi · S / 2^32)`` — the owner shard (monotone in ``hi``);
* the fixed-point scale of the remainder — the partition within that
  shard (also monotone).

So ONE local sort per batch simultaneously (a) groups the stream into
contiguous per-destination segments for the ``all_to_all`` — no
routing scatter, the classic ``_bucketize`` one-hot scatter disappears
— and (b) pre-orders every segment for the receiving shard's join
kernel, which therefore needs NO second sort: segment boundaries align
to kernel chunks and spans are computed over real rows only
(ops/pallas_join.py:route_presorted).

Wide keys (W in 3..8, k ≤ 127) ride the same design with the route
hash in place of the mixed high word: owner = its top scale,
partition = its remainder scale, raw words shipped as payload and the
hash recomputed on the receiving shard (route_presorted_wide).

Per-chip step cost is the single-chip step at 1/S the rows: the sort,
the extraction and the join all shrink by the shard count while the
exchange rides ICI.  This is the multi-chip deployment path of
BASELINE.md's ">10× jellyfish" target: S chips × ~1M reads/s/chip.

Static capacities (route segment ``cap``, join window ``w_part``)
follow the repo-wide overflow contract: flags come back with the
step, are resolved one batch later (no per-batch device sync), and
the rare overflow replays exactly from the saved pre-batch
accumulator; batches that defeat every window fall back to an exact
host-side tally.
"""

import functools
import logging

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from kmer_denovo_filter_tpu.ops import device as dev
from kmer_denovo_filter_tpu.ops import encode as enc
from kmer_denovo_filter_tpu.ops import pallas_join as pj
from kmer_denovo_filter_tpu.parallel.sharded import AXIS

logger = logging.getLogger(__name__)

_F32 = jnp.uint32(0xFFFFFFFF)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _sorted_segments(codes_shard, lens_shard, k, w, s, cap,
                     thresholds, with_idx):
    """Extract + single local sort + scatter-free segmentation.

    Returns ``(segs, bounds, overflow, sidx, n)`` where ``segs`` is a
    list of W (s, cap) word arrays (sentinel padded positionally;
    mixed words for W == 2, raw words for wide keys), ``bounds`` the
    (s+1,) segment starts in the sorted stream, and ``sidx`` the sort
    permutation over the n local windows (None unless *with_idx*).

    Sentinels sort strictly last in both widths: the sort compares
    every carried word and no real key is all-F (W == 2: the mix's
    all-F preimage is outside the key space; wide: odd k leaves clear
    low bits), so the valid prefix ends exactly at n − #sentinels.
    """
    keys, _valid = dev.extract_canonical_windows(
        codes_shard, lens_shard, k)
    flat = keys.reshape(-1, w)
    n = flat.shape[0]
    cols = [flat[:, j] for j in range(w)]
    sent = cols[0] == _F32
    for cj in cols[1:]:
        sent = sent & (cj == _F32)
    if w == 2:
        h, low = pj._mix_keys(cols[0], cols[1])
        carried = [jnp.where(sent, _F32, h),
                   jnp.where(sent, _F32, low)]
        num_keys = 2
    else:
        h = jnp.where(sent, _F32, pj._route_hash(cols))
        carried = [h] + cols
        num_keys = 1 + w
    if with_idx:
        idx0 = jnp.arange(n, dtype=jnp.int32)
        srt = jax.lax.sort((*carried, idx0), num_keys=num_keys)
        sidx = srt[-1]
        sorted_cols = list(srt[:-1])
    else:
        sorted_cols = list(jax.lax.sort(tuple(carried),
                                        num_keys=num_keys))
        sidx = None
    route_key = sorted_cols[0]  # mixed hi (W==2) or route hash (wide)
    ship = sorted_cols if w == 2 else sorted_cols[1:]
    n_valid = (n - jnp.sum(sent)).astype(jnp.int32)
    inner = jnp.searchsorted(route_key, thresholds).astype(jnp.int32)
    inner = jnp.minimum(inner, n_valid)
    bounds = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), inner, n_valid[None]])
    seg_len = bounds[1:] - bounds[:-1]
    overflow = jnp.any(seg_len > cap)
    # pad the sorted stream so a cap-slice at any start stays in range
    padded = [jnp.concatenate([c, jnp.full(cap, _F32)]) for c in ship]
    js = jnp.arange(cap, dtype=jnp.int32)
    segs = []
    for c in padded:
        per_dest = []
        for d in range(s):
            st = bounds[d]
            m = js < seg_len[d]
            per_dest.append(jnp.where(
                m, jax.lax.dynamic_slice(c, (st,), (cap,)), _F32))
        segs.append(jnp.stack(per_dest))
    return segs, bounds, overflow, sidx, n


class ShardedTileCounter:
    """Multi-chip ``--if`` filtered counter over per-shard tile planes.

    Drop-in for :class:`engine.FilteredCounter` on a multi-device
    mesh when the Pallas tile-join is available (W == 2 via the mixed
    pair, W in 3..8 via the route-hash wide variant).
    """

    def __init__(self, keys_np, k, mesh, interpret=False):
        self.k = k
        self.w = enc.words_per_kmer(k)
        if not (self.w == 2 or 3 <= self.w <= pj.MAX_W_WIDE):
            raise ValueError(
                f"tile counter requires 2 <= W <= {pj.MAX_W_WIDE}")
        self.mesh = mesh
        self.s = int(mesh.devices.size)
        self.n = keys_np.shape[0]
        self.keys_np = np.ascontiguousarray(keys_np, np.uint32)
        self.interpret = interpret
        # multi-host: the mesh spans processes; every host builds the
        # same planes, feeds its own BAM shard, and flags/results
        # gather with process_allgather
        self.multihost = jax.process_count() > 1
        if self.w == 2:
            t0, t1, perms, p = pj.build_shard_tile_partitions(
                self.keys_np, self.s)
            planes = np.stack([t0, t1], axis=1)  # (s, 2, rows, lanes)
        else:
            planes, perms, p = pj.build_shard_tile_partitions_wide(
                self.keys_np, self.s)
        self.p = p
        self.perms = perms
        self._plane_spec = NamedSharding(mesh, P(AXIS, None, None,
                                                 None))
        self._acc_spec = NamedSharding(mesh, P(AXIS, None, None))
        self.planes = self._put_global(planes, self._plane_spec)
        self.acc = self._put_global(
            np.zeros((self.s,) + planes.shape[2:], np.int32),
            self._acc_spec)
        self.w_part = pj.W_PART_TALLY
        self._thresholds = jnp.asarray(
            pj.shard_thresholds(self.s).astype(np.uint32))
        self._step_cache = {}
        self._pending = None
        self._host_corr = None

    def _put_global(self, arr_np, sharding):
        """Place a host-replicated numpy array with *sharding* (works
        on single- and multi-process meshes)."""
        if not self.multihost:
            return jax.device_put(jnp.asarray(arr_np), sharding)
        return jax.make_array_from_callback(
            arr_np.shape, sharding, lambda idx: arr_np[idx])

    def _host_values(self, x):
        """Fetch a (possibly non-addressable) device value to host."""
        if not self.multihost:
            return np.asarray(x)
        from jax.experimental import multihost_utils
        return np.asarray(
            multihost_utils.process_allgather(x, tiled=True))

    # ── the fused shard_map step ───────────────────────────────────
    def _step_fn(self, cap, w_part):
        key = (cap, w_part)
        if key in self._step_cache:
            return self._step_cache[key]
        k, w, s, p = self.k, self.w, self.s, self.p
        interpret = self.interpret
        thresholds = self._thresholds

        @jax.jit
        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(AXIS, None, None, None),
                      P(AXIS, None, None), P(AXIS, None), P(AXIS)),
            out_specs=(P(AXIS, None, None), P(AXIS), P(AXIS)),
            check_vma=False)
        def step(planes_s, accs, codes_shard, lens_shard):
            segs, _bounds, ovf_route, _sidx, _n = _sorted_segments(
                codes_shard, lens_shard, k, w, s, cap, thresholds,
                with_idx=False)
            received = [jax.lax.all_to_all(sg, AXIS, 0, 0).reshape(-1)
                        for sg in segs]
            local = [planes_s[0, j] for j in range(w)]
            if w == 2:
                (s0r, s1r, spr, blk, base8, sub_start, sub_span,
                 ovf_win, _need) = pj.route_presorted(
                    received[0], received[1], p, s, pj.CHUNK_T,
                    pj.NSUB_T, w_part)
                meta = jnp.concatenate(
                    [blk, base8, sub_start, sub_span])
                acc = pj._tally_call(meta, local[0], local[1], s0r,
                                     s1r, spr, accs[0], w_part,
                                     interpret)
            else:
                (qplanes, spr, blk, base8, sub_start, sub_span,
                 ovf_win, _need) = pj.route_presorted_wide(
                    received, p, s, pj.CHUNK_T, pj.NSUB_T, w_part)
                meta = jnp.concatenate(
                    [blk, base8, sub_start, sub_span])
                acc = pj._tally_call_wide(meta, local, qplanes, spr,
                                          accs[0], w, w_part,
                                          interpret)
            return acc[None], ovf_route[None], ovf_win[None]

        self._step_cache[key] = step
        return step

    def _shard_reads(self, codes, lengths):
        """Stage a batch: process-local reads → mesh-sharded arrays.

        On a multi-process mesh *codes* is this host's OWN shard of the
        batch (the per-host BAM-slice input model,
        parallel/multihost.py); all hosts must pass matching shapes.
        """
        if self.multihost:
            from kmer_denovo_filter_tpu.parallel.multihost import (
                distribute_read_batch,
            )
            codes_d, lens_d = distribute_read_batch(
                codes, lengths, self.mesh)
            per = codes_d.shape[0] // self.s
            n_loc = per * (codes.shape[1] - self.k + 1)
            return codes_d, lens_d, n_loc
        b = codes.shape[0]
        per = -(-b // self.s)
        pad_b = per * self.s
        codes_p = np.full((pad_b, codes.shape[1]), 4, dtype=np.uint8)
        codes_p[:b] = codes
        lens_p = np.zeros(pad_b, dtype=np.int32)
        lens_p[:b] = lengths
        codes_d = jax.device_put(
            jnp.asarray(codes_p),
            NamedSharding(self.mesh, P(AXIS, None)))
        lens_d = jax.device_put(
            jnp.asarray(lens_p), NamedSharding(self.mesh, P(AXIS)))
        n_loc = per * (codes.shape[1] - self.k + 1)
        return codes_d, lens_d, n_loc

    def _cap_for(self, n_loc):
        return _round_up(max(pj.CHUNK_T, 2 * n_loc // self.s),
                         pj.CHUNK_T)

    def _tally_batch_on_host(self, codes_np, lens_np):
        """Exact fallback for a batch that defeated every window size
        (same contract as FilteredCounter._tally_batch_on_host).

        Operates on the PROCESS-LOCAL reads; on a multi-process mesh
        every host corrects its own shard of the batch and
        :meth:`result` sums the corrections across hosts.
        """
        length = max(codes_np.shape[1], self.k)
        codes_p = np.full((codes_np.shape[0], length), 4, np.uint8)
        codes_p[:, :codes_np.shape[1]] = codes_np
        keys, _valid = dev.extract_canonical_windows(
            jnp.asarray(codes_p), jnp.asarray(lens_np), self.k)
        skeys, starts, counts = dev.sort_count(
            keys.reshape(-1, self.w), self.w)
        skeys = np.asarray(skeys)
        mask = (np.asarray(starts)
                & ~(skeys == np.uint32(0xFFFFFFFF)).all(axis=1))
        uk = skeys[mask]
        uc = np.asarray(counts)[mask].astype(np.int64)
        width = f"S{4 * self.w}"
        tbl = np.ascontiguousarray(
            self.keys_np.astype(">u4")).view(width).ravel()
        q = np.ascontiguousarray(uk.astype(">u4")).view(width).ravel()
        pos = np.searchsorted(tbl, q)
        pos_c = np.minimum(pos, self.n - 1)
        hit = tbl[pos_c] == q
        if self._host_corr is None:
            self._host_corr = np.zeros(self.n, dtype=np.int64)
        np.add.at(self._host_corr, pos_c[hit], uc[hit])

    def _resolve_pending(self):
        if self._pending is None:
            return
        (codes_d, lens_d, codes_np, lens_np, acc_before, ovr_j, ovw_j,
         cap) = self._pending
        self._pending = None
        ovr = bool(self._host_values(ovr_j).any())
        ovw = bool(self._host_values(ovw_j).any())
        if not (ovr or ovw):
            return
        while True:
            if ovr:
                cap *= 2
            if ovw:
                if self.w_part >= pj.MAX_W_PART_TALLY:
                    self._tally_batch_on_host(codes_np, lens_np)
                    self.acc = acc_before
                    return
                self.w_part = min(self.w_part * 2,
                                  pj.MAX_W_PART_TALLY)
            acc, ovr_j, ovw_j = self._step_fn(cap, self.w_part)(
                self.planes, acc_before, codes_d, lens_d)
            ovr = bool(self._host_values(ovr_j).any())
            ovw = bool(self._host_values(ovw_j).any())
            if not (ovr or ovw):
                self.acc = acc
                return

    def feed(self, codes, lengths):
        codes_d, lens_d, n_loc = self._shard_reads(codes, lengths)
        cap = self._cap_for(n_loc)
        self._resolve_pending()
        acc_before = self.acc
        acc, ovr, ovw = self._step_fn(cap, self.w_part)(
            self.planes, acc_before, codes_d, lens_d)
        self.acc = acc
        self._pending = (codes_d, lens_d, codes, lengths, acc_before,
                         ovr, ovw, cap)

    def result(self):
        """int64 counts aligned with the (sorted) table key order.

        Identical on every host of a multi-process mesh.
        """
        self._resolve_pending()
        acc = self._host_values(self.acc)
        out = np.zeros(self.n, dtype=np.int64)
        for d in range(self.s):
            pd = self.perms[d]
            valid = pd >= 0
            out[pd[valid]] = acc[d, :pd.shape[0]][valid]
        if self._host_corr is not None:
            corr = self._host_corr
            if self.multihost:
                from jax.experimental import multihost_utils
                corr = np.asarray(multihost_utils.process_allgather(
                    corr)).reshape(jax.process_count(), -1).sum(axis=0)
            out = out + corr
        return out


class ShardedTileScanner:
    """Multi-chip anchoring scan (``scan_reads_for_hits`` analog).

    Same one-sort routing as :class:`ShardedTileCounter`; membership
    verdicts return with the inverse ``all_to_all`` and unsort to the
    original window order via a gather over segment offsets plus one
    packed-index sort (no scatter).
    """

    def __init__(self, keys_np, k, mesh, interpret=False):
        self.k = k
        self.w = enc.words_per_kmer(k)
        if not (self.w == 2 or 3 <= self.w <= pj.MAX_W_WIDE):
            raise ValueError(
                f"tile scanner requires 2 <= W <= {pj.MAX_W_WIDE}")
        self.mesh = mesh
        self.s = int(mesh.devices.size)
        self.interpret = interpret
        self.multihost = jax.process_count() > 1
        keys_np = np.ascontiguousarray(keys_np, np.uint32)
        if self.w == 2:
            t0, t1, _perms, p = pj.build_shard_tile_partitions(
                keys_np, self.s)
            planes = np.stack([t0, t1], axis=1)
        else:
            planes, _perms, p = pj.build_shard_tile_partitions_wide(
                keys_np, self.s)
        self.p = p
        spec = NamedSharding(mesh, P(AXIS, None, None, None))
        if self.multihost:
            self.planes = jax.make_array_from_callback(
                planes.shape, spec, lambda idx: planes[idx])
        else:
            self.planes = jax.device_put(jnp.asarray(planes), spec)
        self._thresholds = jnp.asarray(
            pj.shard_thresholds(self.s).astype(np.uint32))
        self._scan_cache = {}

    def _scan_fn(self, cap, w_part, s_windows):
        key = (cap, w_part, s_windows)
        if key in self._scan_cache:
            return self._scan_cache[key]
        k, w, s, p = self.k, self.w, self.s, self.p
        interpret = self.interpret
        thresholds = self._thresholds

        @jax.jit
        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(AXIS, None, None, None),
                      P(AXIS, None), P(AXIS)),
            out_specs=(P(AXIS, None), P(AXIS), P(AXIS)),
            check_vma=False)
        def scan(planes_s, codes_shard, lens_shard):
            keys, valid = dev.extract_canonical_windows(
                codes_shard, lens_shard, k)
            segs, bounds, ovf_route, sidx, n = _sorted_segments(
                codes_shard, lens_shard, k, w, s, cap, thresholds,
                with_idx=True)
            received = [jax.lax.all_to_all(sg, AXIS, 0, 0).reshape(-1)
                        for sg in segs]
            local = [planes_s[0, j] for j in range(w)]
            if w == 2:
                (s0r, s1r, spr, _blk, base8, sub_start, sub_span,
                 _ovf_t, need) = pj.route_presorted(
                    received[0], received[1], p, s, pj.CHUNK_ROWS,
                    pj.NSUB, w_part)
                ovf_win = need > w_part
                meta = jnp.concatenate([base8, sub_start, sub_span])
                found = pj._member_call(meta, local[0], local[1],
                                        s0r, s1r, spr, w_part,
                                        interpret)
            else:
                (qplanes, spr, _blk, base8, sub_start, sub_span,
                 _ovf_t, need) = pj.route_presorted_wide(
                    received, p, s, pj.CHUNK_ROWS, pj.NSUB, w_part)
                ovf_win = need > w_part
                meta = jnp.concatenate([base8, sub_start, sub_span])
                found = pj._member_call_wide(meta, local, qplanes,
                                             spr, w, w_part,
                                             interpret)
            back = jax.lax.all_to_all(
                found.reshape(s, cap), AXIS, 0, 0)
            # verdict for my sorted row i lives at segment d(i),
            # offset i − bounds[d(i)]
            i = jnp.arange(n, dtype=jnp.int32)
            d_of = (jnp.searchsorted(
                bounds[1:-1], i, side="right")).astype(jnp.int32)
            off = i - bounds[d_of]
            flatb = back.reshape(-1)
            found_sorted = jnp.where(
                off < cap, flatb[jnp.clip(d_of * cap + off,
                                          0, s * cap - 1)], 0)
            # unsort to original window order: pack the bit into the
            # index LSB and sort the single packed operand
            packed = (sidx << 1) | (found_sorted > 0).astype(jnp.int32)
            ordered = jax.lax.sort(packed)
            hit = ((ordered & 1) > 0).reshape(
                codes_shard.shape[0], s_windows)
            return hit & valid, ovf_route[None], ovf_win[None]

        self._scan_cache[key] = scan
        return scan

    def __call__(self, codes, lengths):
        """(B, S) window hit mask for this process's reads.

        On a multi-process mesh *codes* is this host's own shard of
        the batch (matching shapes across hosts) and the returned mask
        covers exactly those reads.
        """
        b, length = codes.shape
        s_windows = length - self.k + 1
        if self.multihost:
            from kmer_denovo_filter_tpu.parallel.multihost import (
                distribute_read_batch,
            )
            codes_d, lens_d = distribute_read_batch(
                codes, lengths, self.mesh)
            per = codes_d.shape[0] // self.s
        else:
            per = -(-b // self.s)
            pad_b = per * self.s
            codes_p = np.full((pad_b, length), 4, dtype=np.uint8)
            codes_p[:b] = codes
            lens_p = np.zeros(pad_b, dtype=np.int32)
            lens_p[:b] = lengths
            codes_d = jax.device_put(
                jnp.asarray(codes_p),
                NamedSharding(self.mesh, P(AXIS, None)))
            lens_d = jax.device_put(
                jnp.asarray(lens_p), NamedSharding(self.mesh, P(AXIS)))
        n_loc = per * s_windows
        cap = _round_up(max(pj.CHUNK_ROWS, 2 * n_loc // self.s),
                        pj.CHUNK_ROWS)
        w_part = pj.W_PART
        while True:
            hit, ovr, ovw = self._scan_fn(cap, w_part, s_windows)(
                self.planes, codes_d, lens_d)
            ovr = bool(self._host_flag(ovr))
            ovw = bool(self._host_flag(ovw))
            if not (ovr or ovw):
                return self._local_rows(hit, b)
            if ovr:
                cap = _round_up(cap * 2, pj.CHUNK_ROWS)
            if ovw:
                if w_part >= pj.MAX_W_PART:
                    raise RuntimeError(
                        "sharded member window overflow at maximum "
                        "w_part")
                w_part = min(w_part * 2, pj.MAX_W_PART)

    def _host_flag(self, x):
        if not self.multihost:
            return np.asarray(x).any()
        from jax.experimental import multihost_utils
        return np.asarray(
            multihost_utils.process_allgather(x, tiled=True)).any()

    def _local_rows(self, hit, b):
        """This process's rows of the globally-sharded hit mask."""
        if not self.multihost:
            return np.asarray(hit)[:b]
        shards = sorted(hit.addressable_shards,
                        key=lambda sh: sh.index[0].start)
        local = np.concatenate([np.asarray(sh.data) for sh in shards])
        return local[:b]
