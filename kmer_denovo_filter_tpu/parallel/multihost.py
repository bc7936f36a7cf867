"""Multi-host scaffolding: ``jax.distributed`` + per-host input feeds.

Scales the sharded k-mer engine past one host (BASELINE.md's 2-host
target; SURVEY.md §2.3's DCN dimension): every process contributes its
local devices to one global mesh, reads stream in per-host shards
(each host decodes its own BAM slice — the multi-host analog of the
reference's per-contig process pool, reference
discovery/pipeline.py:734–792), and the hash-owner all-to-all of the
sharded engine rides ICI within a host and DCN across hosts, scheduled
by XLA from the same ``shard_map`` programs used single-host.

Deployment contract:

* every process calls :func:`initialize` first (coordinator address
  via arguments or ``KDF_COORDINATOR`` / ``KDF_NUM_PROCESSES`` /
  ``KDF_PROCESS_ID`` env vars);
* batches are *process-local*: each host feeds the reads it decoded;
  batch shapes must match across processes for a given step (pad the
  tail batch);
* results gather to every host via ``process_allgather``.

Tested with a 2-process CPU harness (Gloo collectives) in
tests/test_multihost.py.
"""

import logging
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kmer_denovo_filter_tpu.ops import encode as enc
from kmer_denovo_filter_tpu.parallel.sharded import (
    AXIS,
    make_count_program,
)

logger = logging.getLogger(__name__)


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """Join the distributed runtime (idempotent).

    Arguments fall back to ``KDF_COORDINATOR`` / ``KDF_NUM_PROCESSES``
    / ``KDF_PROCESS_ID``; with none set this is a no-op so single-host
    runs need no configuration.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "KDF_COORDINATOR")
    if coordinator_address is None:
        return False
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return True  # already joined (e.g. by the entry script)
    if num_processes is None:
        num_processes = int(os.environ["KDF_NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["KDF_PROCESS_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError as e:
        # already joined (callers must initialize before any JAX call
        # touches the backend — importing this package is enough to
        # do that, so entry points init first and this becomes a
        # no-op); anything else is a real failure
        if "already initialized" not in str(e):
            raise
    logger.info("distributed runtime: process %d/%d, %d local / %d "
                "global devices", process_id, num_processes,
                jax.local_device_count(), jax.device_count())
    return True


def active():
    """True when this run spans multiple processes.

    Requires :func:`initialize` (or ``jax.distributed.initialize``) to
    have been called; single-process runs always return False.
    """
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is None:
        return False
    return jax.process_count() > 1


def process_index():
    return jax.process_index() if active() else 0


def process_count():
    return jax.process_count() if active() else 1


def is_primary():
    """True on the process that owns output writing (process 0)."""
    return process_index() == 0


def stripe():
    """(process_id, n_processes) input-shard assignment, or None.

    The per-host BAM-shard analog of the reference's per-contig worker
    pool (reference discovery/pipeline.py:734–792): host *i* consumes
    chunk/batch stripe ``i mod n`` of each input stream.
    """
    return (process_index(), process_count()) if active() else None


def allgather_bytes(payload):
    """Gather one bytes payload from every process, in process order."""
    from jax.experimental import multihost_utils

    arr = np.frombuffer(payload, dtype=np.uint8)
    n = np.array([arr.shape[0]], dtype=np.int64)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    cap = max(1, int(sizes.max()))
    padded = np.zeros(cap, dtype=np.uint8)
    padded[:arr.shape[0]] = arr
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(process_count(), cap)
    return [gathered[i, :int(sizes[i])].tobytes()
            for i in range(process_count())]


def allgather_object(obj):
    """Gather one picklable object from every process (process order)."""
    import pickle

    return [pickle.loads(b)
            for b in allgather_bytes(pickle.dumps(obj, protocol=4))]


def merge_counts(keys, counts):
    """Merge per-host (keys, counts) partial k-mer counts globally.

    Every process contributes the sorted output of its local stream
    counter; the merged result (concatenate → lexsort → segment-sum)
    is identical on every host and equal to a single-process count of
    the union of the input stripes.
    """
    parts = allgather_object((np.asarray(keys), np.asarray(counts)))
    all_keys = np.concatenate([p[0] for p in parts], axis=0)
    all_counts = np.concatenate([p[1] for p in parts], axis=0)
    if all_keys.shape[0] == 0:
        return all_keys, all_counts
    order = enc.lexsort_keys(all_keys)
    sk = all_keys[order]
    sc = all_counts[order]
    new = np.empty(sk.shape[0], dtype=bool)
    new[0] = True
    new[1:] = (sk[1:] != sk[:-1]).any(axis=1)
    seg = np.cumsum(new) - 1
    merged = np.zeros(int(seg[-1]) + 1, dtype=np.int64)
    np.add.at(merged, seg, sc.astype(np.int64))
    return sk[new], merged


def sum_aligned(values):
    """Element-wise sum of one aligned array across all processes."""
    from jax.experimental import multihost_utils

    stacked = np.asarray(multihost_utils.process_allgather(
        np.asarray(values)))
    return stacked.reshape((process_count(),) + np.asarray(values).shape
                           ).sum(axis=0)


def global_mesh():
    """1-D mesh over every device of every process."""
    return Mesh(np.array(jax.devices()), (AXIS,))


def distribute_read_batch(codes, lengths, mesh):
    """Build globally-sharded read arrays from this host's batch.

    ``codes``/``lengths`` are process-local; every process must pass
    the same shapes.  Rows pad to a multiple of the *local* device
    count so the global array splits evenly.
    """
    n_local = jax.local_device_count()
    b, length = codes.shape
    per = -(-b // n_local)
    pad_b = per * n_local
    codes_p = np.full((pad_b, length), 4, dtype=np.uint8)
    codes_p[:b] = codes
    lens_p = np.zeros(pad_b, dtype=np.int32)
    lens_p[:b] = lengths
    codes_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(AXIS, None)), codes_p)
    lens_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(AXIS)), lens_p)
    return codes_g, lens_g


def sharded_count_multihost(codes, lengths, k, mesh=None,
                            cap_per_shard=None):
    """Distributed canonical k-mer count with per-host input feeds.

    Same collective program as the single-host
    :func:`~kmer_denovo_filter_tpu.parallel.sharded_count` (via
    :func:`make_count_program`); inputs are process-local batches and
    the merged ``(keys, counts)`` result is identical on every host.
    """
    from jax.experimental import multihost_utils

    if mesh is None:
        mesh = global_mesh()
    n_shards = int(mesh.devices.size)
    w = enc.words_per_kmer(k)
    s = codes.shape[1] - k + 1
    codes_g, lens_g = distribute_read_batch(codes, lengths, mesh)
    per_shard = codes_g.shape[0] // n_shards
    if cap_per_shard is None:
        cap_per_shard = max(16, int(per_shard * s / n_shards * 4))

    while True:
        skeys, starts, counts, overflow = make_count_program(
            mesh, n_shards, k, w, cap_per_shard)(codes_g, lens_g)
        overflow = multihost_utils.process_allgather(
            overflow, tiled=True)
        if not bool(np.asarray(overflow).any()):
            break
        cap_per_shard *= 2

    skeys = np.asarray(
        multihost_utils.process_allgather(skeys, tiled=True))
    starts = np.asarray(
        multihost_utils.process_allgather(starts, tiled=True))
    counts = np.asarray(
        multihost_utils.process_allgather(counts, tiled=True))
    out_keys = []
    out_counts = []
    for d in range(n_shards):
        mask = starts[d]
        out_keys.append(skeys[d][mask])
        out_counts.append(counts[d][mask].astype(np.int64))
    keys = np.concatenate(out_keys, axis=0)
    cnts = np.concatenate(out_counts, axis=0)
    order = enc.lexsort_keys(keys)
    return keys[order], cnts[order]
