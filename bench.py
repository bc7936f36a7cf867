#!/usr/bin/env python3
"""Headline benchmark: parent-scan filtered k-mer counting throughput.

Measures the hot device step of the flagship ``kmer-denovo`` VCF-mode
pipeline on one TPU chip: canonical 31-mer window extraction over
packed read batches + filtered tally against the child candidate
k-mer table (BASELINE.json configs[0]).  Child candidate tables are
small by construction (1,484 k-mers in the GIAB example; thousands of
candidate sites give tens of thousands), which selects the engine's
gather-free all-pairs VPU sweep (ops/device.py:small_tally_step).
PERF.md records the WGS-discovery-scale path (16M-key table, bucketed
binary-search probe) and the measurement-methodology caveats of the
axon relay.

Reads are sampled position-locally from a synthetic genome at ~40×
coverage with 0.3% error — the locality profile of a coordinate-sorted
WGS BAM.  Batches are pre-staged on device (the production input
pipeline overlaps host BAM decode with device steps; the relay's
~40 MB/s host↔device path would otherwise dominate and is not
representative of real PCIe hosts).

Baseline: the reference's parent scan is ``samtools fasta | jellyfish
count -C --if`` (reference core/jellyfish_wrappers.py:115–283) at
~1.0 M reads/s for 150 bp reads on a 16-core host (≈150 Mbase/s
end-to-end including the BAM-decode pipe).  ``vs_baseline`` is
measured reads/s over that estimate.
"""

import json
import time

import numpy as np

K = 31
W = 2
READ_LEN = 152
BATCH_READS = 32768
TABLE_M = 4096              # VCF-mode child candidate table scale
N_BATCHES = 16
COVERAGE = 40
GENOME_MB = 4
BASELINE_READS_PER_S = 1.0e6


def synth_reads(rng, genome, n_reads, read_len):
    """Position-local reads with 0.3% error, like a sorted WGS BAM."""
    span = max(n_reads * read_len // COVERAGE, read_len * 4)
    start0 = rng.integers(0, len(genome) - span - read_len)
    starts = np.sort(rng.integers(start0, start0 + span, n_reads))
    idx = starts[:, None] + np.arange(read_len)[None, :]
    reads = genome[idx]
    err = rng.random((n_reads, read_len)) < 0.003
    reads = np.where(err, (reads + rng.integers(
        1, 4, (n_reads, read_len))) % 4, reads).astype(np.uint8)
    return reads


def main():
    import jax
    import jax.numpy as jnp

    from kmer_denovo_filter_tpu.ops import device as dev
    from kmer_denovo_filter_tpu.ops import encode as enc

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, GENOME_MB << 20, dtype=np.uint8)

    t = rng.integers(0, 2 ** 32, (TABLE_M, W), dtype=np.uint32)
    t[:, 1] &= 0xFFFFFFFC
    t = t[enc.lexsort_keys(t)]
    table = jnp.asarray(t)
    acc = jnp.zeros(TABLE_M, dtype=jnp.int32)
    chunk = 16384

    lengths = jnp.full(BATCH_READS, READ_LEN, dtype=jnp.int32)
    batches = [jnp.asarray(synth_reads(rng, genome, BATCH_READS,
                                       READ_LEN))
               for _ in range(N_BATCHES)]

    # Warm-up (compile + first run); device→host transfer forces a
    # real sync (block_until_ready does not, through the axon relay).
    acc = dev.small_tally_step(table, acc, batches[0], lengths, K, W,
                               chunk)
    np.asarray(acc[:1])

    start = time.perf_counter()
    for b in batches:
        acc = dev.small_tally_step(table, acc, b, lengths, K, W, chunk)
    np.asarray(acc[:1])
    elapsed = time.perf_counter() - start

    reads_per_s = BATCH_READS * N_BATCHES / elapsed
    print(json.dumps({
        "metric": "parent_scan_reads_per_s",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
