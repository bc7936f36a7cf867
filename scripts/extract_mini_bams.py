#!/usr/bin/env python3
"""Extract per-candidate mini BAM slices for IGV review.

samtools-free replacement for the reference's
examples/HG002_trio/extract_mini_crams.sh: for every candidate variant
in a VCF, writes ``{sample}.{chrom}_{pos}.bam`` slices (±padding,
sorted + indexed) for each provided alignment file.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kmer_denovo_filter_tpu.htsio.bam import (  # noqa: E402
    BamReader,
    BamWriter,
)
from kmer_denovo_filter_tpu.htsio.vcf import VcfReader  # noqa: E402


def extract(bam_path, sample, variants, out_dir, padding=1000):
    """Write one mini BAM per variant; returns list of paths."""
    bam = BamReader(bam_path)
    written = []
    for chrom, pos1 in variants:
        start = max(0, pos1 - 1 - padding)
        end = pos1 - 1 + padding
        out_path = os.path.join(out_dir, f"{sample}.{chrom}_{pos1}.bam")
        writer = BamWriter(out_path, bam.header_text, bam.refs)
        n = 0
        try:
            for read in bam.fetch(chrom, start, end):
                writer.write(read)
                n += 1
        except ValueError:
            pass  # contig absent from this BAM
        writer.close(sort=True, index=True)
        written.append((out_path, n))
    return written


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="extract-mini-bams",
        description="Extract ±padding BAM slices around candidate "
                    "variants for IGV review.")
    parser.add_argument("--vcf", required=True,
                        help="Candidates VCF (annotated or raw)")
    parser.add_argument("--bam", action="append", required=True,
                        metavar="SAMPLE=PATH",
                        help="sample=path pair; repeatable")
    parser.add_argument("--out-dir", "-o", required=True)
    parser.add_argument("--padding", type=int, default=1000,
                        help="bp of context each side (default: 1000)")
    args = parser.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    variants = [(rec.chrom, rec.pos) for rec in VcfReader(args.vcf)]
    print(f"{len(variants)} candidate loci")
    for pair in args.bam:
        sample, _, path = pair.partition("=")
        if not path:
            parser.error(f"--bam must be sample=path, got {pair!r}")
        written = extract(path, sample, variants, args.out_dir,
                          args.padding)
        for out_path, n in written:
            print(f"  {out_path}: {n} reads")


if __name__ == "__main__":
    main()
