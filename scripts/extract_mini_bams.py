#!/usr/bin/env python3
"""Extract mini trio alignment slices around candidate variant sites.

samtools/bcftools-free equivalent of the reference's
examples/HG002_trio/extract_mini_crams.sh (reference :1–326), built on
htsio: parse variant positions from the VCF, build a ±padding BED of
extraction regions (sorted, overlap-merged), extract the overlapping
reads of each trio member into ONE sorted+indexed mini file per
member (CRAM when a reference FASTA is given, BAM otherwise; --format
overrides), then report read counts and mini-vs-original sizes.

A per-variant mode (``extract``) is retained for single-locus slices
consumed by older workflows.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kmer_denovo_filter_tpu.htsio.bam import (  # noqa: E402
    BamWriter,
    open_bam,
)
from kmer_denovo_filter_tpu.htsio.vcf import VcfReader  # noqa: E402


def human_size(n):
    """Byte count for display (mirrors the reference's human_size)."""
    if n >= 1 << 30:
        return f"{n / (1 << 30):.1f} GB"
    if n >= 1 << 20:
        return f"{n / (1 << 20):.1f} MB"
    if n >= 1 << 10:
        return f"{n / (1 << 10):.1f} KB"
    return f"{n} B"


def build_regions(variants, padding):
    """±padding 0-based regions per variant, sorted (ref Step 1)."""
    regions = []
    for chrom, pos1 in variants:
        start = max(0, pos1 - padding - 1)
        regions.append((chrom, start, pos1 + padding))
    return sorted(regions)


def merge_regions(regions):
    """Merge overlapping sorted regions (ref bedtools-merge fallback)."""
    merged = []
    for chrom, start, end in regions:
        if merged and merged[-1][0] == chrom and start <= merged[-1][2]:
            if end > merged[-1][2]:
                merged[-1] = (chrom, merged[-1][1], end)
        else:
            merged.append((chrom, start, end))
    return merged


def write_bed(path, regions):
    with open(path, "w") as fh:
        for chrom, start, end in regions:
            fh.write(f"{chrom}\t{start}\t{end}\n")


def extract_member(label, bam_path, regions, out_base, fmt, ref_fasta):
    """Extract one member's reads over merged regions → sorted mini
    file + index; returns (path, read_count)."""
    bam = open_bam(bam_path, reference_filename=ref_fasta)
    seen = set()
    reads = []
    for chrom, start, end in regions:
        try:
            fetched = bam.fetch(chrom, start, end)
        except (ValueError, KeyError):
            continue  # contig absent from this file
        for read in fetched:
            ident = (read.query_name, read.flag, read.tid, read.pos)
            if ident in seen:
                continue  # read spans two disjoint merged regions
            seen.add(ident)
            reads.append(read)
    reads.sort(key=lambda r: (r.tid if r.tid >= 0 else 1 << 30, r.pos))
    out_path = f"{out_base}.{fmt}"
    if fmt == "cram":
        from kmer_denovo_filter_tpu.htsio.cram import CramWriter
        writer = CramWriter(out_path, bam.header_text, bam.refs)
        writer.set_reference(ref_fasta)
        for read in reads:
            writer.write(read)
        writer.close()
    else:
        writer = BamWriter(out_path, bam.header_text, bam.refs)
        for read in reads:
            writer.write(read)
        writer.close(sort=True, index=True)
    return out_path, len(reads)


def run_trio(args):
    """The reference-equivalent trio flow (ref Steps 1–3)."""
    fmt = args.format
    if not fmt:
        fmt = "cram" if args.ref_fasta else "bam"
    if fmt == "cram" and not args.ref_fasta:
        raise SystemExit("CRAM output requires --ref-fasta")
    os.makedirs(args.output_dir, exist_ok=True)

    variants = [(rec.chrom, rec.pos) for rec in VcfReader(args.vcf)]
    regions = build_regions(variants, args.padding)
    if not regions:
        raise SystemExit(f"No regions found in VCF: {args.vcf}")
    regions_bed = os.path.join(args.output_dir,
                               f"{args.prefix}_regions.bed")
    write_bed(regions_bed, regions)
    merged = merge_regions(regions)
    merged_bed = os.path.join(args.output_dir,
                              f"{args.prefix}_regions_merged.bed")
    write_bed(merged_bed, merged)
    span = sum(e - s for _c, s, e in merged)
    print(f"Extraction regions: {len(regions)} "
          f"({len(merged)} merged, {span} bp)")

    members = [("child", args.child_bam), ("father", args.father_bam),
               ("mother", args.mother_bam)]
    outputs = []
    for label, path in members:
        out_base = os.path.join(args.output_dir,
                                f"{args.prefix}_{label}")
        out_path, n = extract_member(label, path, merged, out_base,
                                     fmt, args.ref_fasta)
        size = os.path.getsize(out_path)
        orig = os.path.getsize(path)
        pct = 100.0 * size / orig if orig else 0.0
        outputs.append((label, out_path, n))
        print(f"  {label}: {n} reads, {human_size(size)} -> "
              f"{os.path.basename(out_path)} "
              f"({human_size(orig)} original, {pct:.2f}%)")
    print(f"Regions BED  : {regions_bed}")
    print(f"Merged BED   : {merged_bed}")
    return outputs


def extract(bam_path, sample, variants, out_dir, padding=1000,
            cram_ref=None):
    """Per-variant mode: one ``{sample}.{chrom}_{pos}`` slice per
    locus (sorted + indexed); returns list of (path, n_reads)."""
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
        description="Extract mini trio CRAM/BAM slices around "
                    "candidate variants for IGV review.")
    parser.add_argument("--vcf", required=True,
                        help="Candidates VCF (annotated or raw)")
    parser.add_argument("--child-bam", help="Child BAM/CRAM (indexed)")
    parser.add_argument("--father-bam", help="Father BAM/CRAM")
    parser.add_argument("--mother-bam", help="Mother BAM/CRAM")
    parser.add_argument("--output-dir", help="Output directory")
    parser.add_argument("--padding", type=int, default=1000,
                        help="bp of context each side (default: 1000)")
    parser.add_argument("--ref-fasta", default=None,
                        help="Reference FASTA (enables CRAM output)")
    parser.add_argument("--format", choices=("cram", "bam"), default="",
                        help="Override the automatic cram/bam choice")
    parser.add_argument("--prefix", default="mini",
                        help="Output filename prefix (default: mini)")
    # per-variant compatibility mode
    parser.add_argument("--bam", action="append", metavar="SAMPLE=PATH",
                        help="per-variant mode: sample=path pair; "
                             "repeatable")
    parser.add_argument("--out-dir", "-o",
                        help="per-variant mode output directory")
    args = parser.parse_args(argv)

    if args.bam:
        out_dir = args.out_dir or args.output_dir
        if not out_dir:
            parser.error("--out-dir is required with --bam")
        os.makedirs(out_dir, exist_ok=True)
        variants = [(rec.chrom, rec.pos) for rec in VcfReader(args.vcf)]
        print(f"{len(variants)} candidate loci")
        for pair in args.bam:
            sample, _, path = pair.partition("=")
            if not path:
                parser.error(f"--bam must be sample=path, got {pair!r}")
            written = extract(path, sample, variants, out_dir,
                              args.padding,
                              cram_ref=args.ref_fasta or None)
            for out_path, n in written:
                print(f"  {out_path}: {n} reads")
        return

    missing = [f for f in ("child_bam", "father_bam", "mother_bam",
                           "output_dir") if not getattr(args, f)]
    if missing:
        parser.error("trio mode requires --child-bam, --father-bam, "
                     "--mother-bam and --output-dir (or use --bam "
                     "sample=path for per-variant mode)")
    run_trio(args)


if __name__ == "__main__":
    main()
