#!/usr/bin/env python3
"""IGV review TSV from an annotated VCF + mini BAM slices.

Replacement for the reference's
examples/HG002_trio/create_igv_review_tsv.sh: one row per candidate
with locus, alleles, the DK* evidence columns, and the per-sample mini
BAM paths, suitable for an IGV review server / spreadsheet triage.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kmer_denovo_filter_tpu.htsio.vcf import VcfReader  # noqa: E402

_DK_FIELDS = ["DKU", "DKT", "DKA", "DKU_DKT", "DKA_DKT",
              "MAX_PKC", "AVG_PKC", "MIN_PKC",
              "MAX_PKC_ALT", "AVG_PKC_ALT", "MIN_PKC_ALT"]


def build_rows(vcf_path, samples, mini_dir, padding=1000):
    vcf = VcfReader(vcf_path)
    rows = []
    for rec in vcf:
        values = {}
        if vcf.samples and rec.format:
            kv = dict(zip(rec.format.split(":"),
                          rec.sample_values[0].split(":")))
            values = {f: kv.get(f, ".") for f in _DK_FIELDS}
        else:
            info = dict(item.partition("=")[::2]
                        for item in rec.info.split(";"))
            values = {f: info.get(f, ".") for f in _DK_FIELDS}
        locus = f"{rec.chrom}:{max(1, rec.pos - padding)}-" \
                f"{rec.pos + padding}"
        row = {
            "locus": locus,
            "chrom": rec.chrom,
            "pos": str(rec.pos),
            "ref": rec.ref,
            "alt": ",".join(rec.alts) if rec.alts else ".",
            **values,
        }
        for sample in samples:
            row[f"{sample}_bam"] = os.path.join(
                mini_dir, f"{sample}.{rec.chrom}_{rec.pos}.bam")
        rows.append(row)
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="create-igv-review-tsv",
        description="Build an IGV review TSV from an annotated VCF "
                    "and mini BAM slices.")
    parser.add_argument("--vcf", required=True, help="Annotated VCF")
    parser.add_argument("--samples", default="child,father,mother",
                        help="Comma-separated sample labels matching "
                             "the mini BAM prefixes")
    parser.add_argument("--mini-dir", default="mini_bams",
                        help="Directory of extract_mini_bams.py output")
    parser.add_argument("--padding", type=int, default=1000)
    parser.add_argument("--output", "-o", required=True)
    args = parser.parse_args(argv)

    samples = [s for s in args.samples.split(",") if s]
    rows = build_rows(args.vcf, samples, args.mini_dir, args.padding)
    if not rows:
        print("No variants found", file=sys.stderr)
    columns = (["locus", "chrom", "pos", "ref", "alt"] + _DK_FIELDS
               + [f"{s}_bam" for s in samples])
    with open(args.output, "w") as fh:
        fh.write("\t".join(columns) + "\n")
        for row in rows:
            fh.write("\t".join(row.get(c, ".") for c in columns) + "\n")
    print(f"Wrote {len(rows)} rows to {args.output}")


if __name__ == "__main__":
    main()
