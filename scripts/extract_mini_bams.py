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


def extract(bam_path, sample, variants, out_dir, padding=1000,
            cram_ref=None):
    """Write one mini BAM (or CRAM, when *cram_ref* is set) per
    variant; returns list of paths.  CRAM output matches the
    reference's extract_mini_crams.sh artifact format."""
    from kmer_denovo_filter_tpu.htsio.bam import open_bam
    bam = open_bam(bam_path, reference_filename=cram_ref)
    written = []
    for chrom, pos1 in variants:
        start = max(0, pos1 - 1 - padding)
        end = pos1 - 1 + padding
        ext = "cram" if cram_ref else "bam"
        out_path = os.path.join(
            out_dir, f"{sample}.{chrom}_{pos1}.{ext}")
        reads = []
        try:
            reads = list(bam.fetch(chrom, start, end))
        except (ValueError, KeyError):
            pass  # contig absent from this BAM
        if cram_ref:
            from kmer_denovo_filter_tpu.htsio.cram import CramWriter
            writer = CramWriter(out_path, bam.header_text, bam.refs)
            writer.set_reference(cram_ref)
            for read in sorted(reads, key=lambda r: (r.tid, r.pos)):
                writer.write(read)
            writer.close()
        else:
            writer = BamWriter(out_path, bam.header_text, bam.refs)
            for read in reads:
                writer.write(read)
            writer.close(sort=True, index=True)
        written.append((out_path, len(reads)))
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
    parser.add_argument("--cram-ref", default=None,
                        help="Reference FASTA; when given, slices are "
                             "written as CRAM (the reference's "
                             "extract_mini_crams.sh format)")
    args = parser.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    variants = [(rec.chrom, rec.pos) for rec in VcfReader(args.vcf)]
    print(f"{len(variants)} candidate loci")
    for pair in args.bam:
        sample, _, path = pair.partition("=")
        if not path:
            parser.error(f"--bam must be sample=path, got {pair!r}")
        written = extract(path, sample, variants, args.out_dir,
                          args.padding, cram_ref=args.cram_ref)
        for out_path, n in written:
            print(f"  {out_path}: {n} reads")


if __name__ == "__main__":
    main()
