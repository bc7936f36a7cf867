#!/usr/bin/env python3
"""Reconstruct a miniature test reference FASTA from perfect reads.

Functional twin of reference scripts/build_mini_ref.py (181 LoC): from
a BAM, takes reads with NM:i:0 and an all-M CIGAR (exact reference
matches), clusters their intervals per chromosome, and reconstructs
per-region contigs named ``{chrom}_{start}_{end}`` with N-filled gaps.
Writes the FASTA + .fai with the package's own writers (no pysam).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kmer_denovo_filter_tpu.htsio.bam import BamReader  # noqa: E402
from kmer_denovo_filter_tpu.htsio.fasta import write_fai  # noqa: E402


def reads_with_no_mismatches(bam):
    """Yield primary mapped reads with NM==0 and a single all-M CIGAR."""
    for read in bam.fetch(until_eof=True):
        if read.is_unmapped or read.is_secondary or read.is_supplementary:
            continue
        ct = read.cigartuples
        if not ct or len(ct) != 1 or ct[0][0] != 0:
            continue
        try:
            if read.get_tag("NM") != 0:
                continue
        except KeyError:
            continue
        yield read


def cluster_intervals(intervals, merge_distance=1000):
    """Merge sorted (start, end) intervals within *merge_distance*."""
    if not intervals:
        return []
    intervals = sorted(intervals)
    merged = [list(intervals[0])]
    for start, end in intervals[1:]:
        if start <= merged[-1][1] + merge_distance:
            merged[-1][1] = max(merged[-1][1], end)
        else:
            merged.append([start, end])
    return [tuple(x) for x in merged]


def build_mini_ref(bam_path, output_fasta, merge_distance=1000,
                   line_width=60):
    """Build the mini reference; returns {contig_name: length}."""
    bam = BamReader(bam_path)
    per_chrom = {}
    for read in reads_with_no_mismatches(bam):
        per_chrom.setdefault(read.reference_name, []).append(
            (read.reference_start, read.reference_end, read))

    contigs = {}
    for chrom in sorted(per_chrom):
        entries = per_chrom[chrom]
        regions = cluster_intervals(
            [(s, e) for s, e, _ in entries], merge_distance)
        for start, end in regions:
            seq = bytearray(b"N" * (end - start))
            for rstart, rend, read in entries:
                if rstart >= end or rend <= start:
                    continue
                rseq = read.query_sequence
                for i, base in enumerate(rseq):
                    pos = rstart + i
                    if start <= pos < end:
                        seq[pos - start] = ord(base)
            name = f"{chrom}_{start}_{end}"
            contigs[name] = seq.decode()

    with open(output_fasta, "w") as fh:
        for name, seq in contigs.items():
            fh.write(f">{name}\n")
            for i in range(0, len(seq), line_width):
                fh.write(seq[i:i + line_width] + "\n")
    write_fai(output_fasta)
    return {name: len(seq) for name, seq in contigs.items()}


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="build-mini-ref",
        description="Reconstruct a test reference FASTA from NM:0 "
                    "all-M reads in a BAM.")
    parser.add_argument("--bam", required=True, help="Input BAM")
    parser.add_argument("--output", "-o", required=True,
                        help="Output FASTA path")
    parser.add_argument("--merge-distance", type=int, default=1000,
                        help="Max gap when clustering read intervals "
                             "(default: 1000)")
    args = parser.parse_args(argv)
    contigs = build_mini_ref(args.bam, args.output, args.merge_distance)
    print(f"Wrote {len(contigs)} contigs to {args.output}")
    for name, length in contigs.items():
        print(f"  {name}: {length} bp")


if __name__ == "__main__":
    main()
