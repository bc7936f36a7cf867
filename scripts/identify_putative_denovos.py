#!/usr/bin/env python3
"""Identify putative de novo candidates: child-private trio VCF sites.

bcftools-free replacement for the reference's two-pass
``bcftools isec`` candidate generation
(reference examples/HG002_trio/identify_putative_denovos.sh): a site
is a putative de novo candidate when the child VCF contains a
(chrom, pos, ref, alt) record absent from both parent VCFs.  Writes a
bgzipped + tabix-indexed VCF preserving the child's records verbatim.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kmer_denovo_filter_tpu.htsio.bgzf import BgzfWriter  # noqa: E402
from kmer_denovo_filter_tpu.htsio.tabix import tabix_index  # noqa: E402
from kmer_denovo_filter_tpu.htsio.vcf import VcfReader  # noqa: E402


def site_keys(vcf_path):
    """Set of (chrom, pos, ref, alt) keys — one per ALT allele."""
    keys = set()
    for rec in VcfReader(vcf_path):
        for alt in (rec.alts or ()):
            keys.add((rec.chrom, rec.pos, rec.ref, alt))
    return keys


def identify(child_vcf, father_vcf, mother_vcf, output_vcf,
             require_all_alts_private=True):
    """Write child-private records to *output_vcf*; returns the count."""
    parent_keys = site_keys(father_vcf) | site_keys(mother_vcf)
    child = VcfReader(child_vcf)
    kept = 0
    with BgzfWriter(output_vcf) as out:
        for line in child.header_lines:
            out.write((line + "\n").encode())
        out.write((child.chrom_line + "\n").encode())
        for rec in child:
            alts = rec.alts or ()
            private = [a for a in alts
                       if (rec.chrom, rec.pos, rec.ref, a)
                       not in parent_keys]
            keep = (len(private) == len(alts) if require_all_alts_private
                    else bool(private))
            if alts and keep:
                out.write((rec.line + "\n").encode())
                kept += 1
    tabix_index(output_vcf, preset="vcf", force=True)
    return kept


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="identify-putative-denovos",
        description="Select child VCF records absent from both parent "
                    "VCFs (putative de novo candidates).")
    parser.add_argument("--child-vcf", required=True)
    parser.add_argument("--father-vcf", required=True)
    parser.add_argument("--mother-vcf", required=True)
    parser.add_argument("--output", "-o", required=True,
                        help="Output candidates VCF (.vcf.gz)")
    parser.add_argument(
        "--any-alt-private", action="store_true", default=False,
        help="Keep records where ANY ALT is child-private (default: "
             "all ALTs must be private)")
    args = parser.parse_args(argv)
    n = identify(args.child_vcf, args.father_vcf, args.mother_vcf,
                 args.output,
                 require_all_alts_private=not args.any_alt_private)
    print(f"Wrote {n} putative de novo candidates to {args.output}")


if __name__ == "__main__":
    main()
