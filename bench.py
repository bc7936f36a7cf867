#!/usr/bin/env python3
"""Headline benchmark: parent-scan filtered k-mer counting throughput.

Measures the hot path of both pipelines — canonical 31-mer window
extraction over packed read batches + binary-search probe against an
HBM-resident child k-mer table + device tally — on one TPU chip, and
prints one JSON line.

Baseline: the reference's parent scan is ``samtools fasta | jellyfish
count -C --if`` (reference core/jellyfish_wrappers.py:115–283).
Jellyfish 2's published multithreaded counting rate on a server-class
host is ~10^6 k-mers/µs-order — concretely ~1.0 M reads/s for 150 bp
reads on a 16-core host once the samtools decode pipe is included
(≈150 Mbase/s end-to-end).  BASELINE.md's north star asks for >10×
that per v5e host; ``vs_baseline`` is measured reads/s divided by the
1.0e6 reads/s jellyfish-pipeline estimate.
"""

import json
import time

import numpy as np

K = 31
W = 2
READ_LEN = 152
BATCH_READS = 16384
TABLE_M = 1 << 24           # 16.8M child k-mers (WGS VCF-mode scale)
N_ITERS = 30
BASELINE_READS_PER_S = 1.0e6


def main():
    import jax
    import jax.numpy as jnp

    from kmer_denovo_filter_tpu.ops import device as dev
    from kmer_denovo_filter_tpu.ops import encode as enc

    rng = np.random.default_rng(0)

    # Sorted synthetic canonical-key table (valid padding bits).
    t = rng.integers(0, 2 ** 32, (TABLE_M, W), dtype=np.uint32)
    t[:, 1] &= 0xFFFFFFFC
    t = t[enc.lexsort_keys(t)]
    table = jnp.asarray(t)
    acc0 = jnp.zeros(TABLE_M, dtype=jnp.int32)

    @jax.jit
    def step(table, acc, codes, lengths):
        keys, _valid = dev.extract_canonical_windows(codes, lengths, K)
        flat = keys.reshape(-1, W)
        idx, found = dev.lookup_sorted(table, flat, W)
        idx = jnp.clip(idx, 0, TABLE_M - 1)
        return acc.at[idx].add(found.astype(jnp.int32))

    codes = jnp.asarray(
        rng.integers(0, 4, (BATCH_READS, READ_LEN), dtype=np.uint8))
    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)

    # Warm-up (compile + first run)
    acc = step(table, acc0, codes, lengths)
    acc.block_until_ready()

    start = time.perf_counter()
    for _ in range(N_ITERS):
        acc = step(table, acc, codes, lengths)
    acc.block_until_ready()
    elapsed = time.perf_counter() - start

    reads_per_s = BATCH_READS * N_ITERS / elapsed
    print(json.dumps({
        "metric": "parent_scan_reads_per_s",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
