#!/usr/bin/env python3
"""IGV review-server TSV from an annotated VCF + mini trio slices.

bcftools-free equivalent of the reference's
examples/HG002_trio/create_igv_review_tsv.sh (reference :1–330), for
the IGV de novo review server: per-variant rows with

* required columns — chrom, pos, ref, alt;
* quality columns — quality (QUAL), filter (FILTER), child_gt (GT);
* every DK* FORMAT field discovered in the VCF header, lowercased
  (DKU/DKT/DKA/DKU_DKT/DKA_DKT plus any Kraken2 fraction fields);
* inheritance (always ``de_novo`` — candidates are putative de novos
  by construction);
* alignment tracks — child/father/mother mini file + index paths from
  extract_mini_bams.py's trio mode;
* VCF track — child_vcf / child_vcf_index / child_vcf_id.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kmer_denovo_filter_tpu.htsio.vcf import VcfReader  # noqa: E402

_LEGACY_DK_FIELDS = ["DKU", "DKT", "DKA", "DKU_DKT", "DKA_DKT",
                     "MAX_PKC", "AVG_PKC", "MIN_PKC",
                     "MAX_PKC_ALT", "AVG_PKC_ALT", "MIN_PKC_ALT"]


def discover_dk_tags(vcf):
    """DK*-prefixed FORMAT IDs from the VCF header, header order
    (reference Step 3)."""
    tags = []
    for line in vcf.header_lines:
        if not line.startswith("##FORMAT=<ID="):
            continue
        tag = line[len("##FORMAT=<ID="):].split(",", 1)[0]
        if tag.startswith("DK"):
            tags.append(tag)
    return tags


def _find_track(mini_dir, prefix, member):
    """Mini alignment file + index for one member (cram preferred)."""
    for ext, idxs in (("cram", (".crai",)),
                      ("bam", (".bai", ".csi"))):
        path = os.path.join(mini_dir, f"{prefix}_{member}.{ext}")
        if os.path.isfile(path):
            for idx in idxs:
                if os.path.isfile(path + idx):
                    return path, path + idx
            return path, path + idxs[0]
    # fall back to the conventional name even if absent (the review
    # server resolves paths lazily)
    path = os.path.join(mini_dir, f"{prefix}_{member}.bam")
    return path, path + ".bai"


def build_trio_rows(vcf_path, mini_dir, prefix, proband_id):
    """(header, rows) in the reference TSV layout."""
    vcf = VcfReader(vcf_path)
    tags = discover_dk_tags(vcf)
    header = ["chrom", "pos", "ref", "alt", "quality", "filter",
              "child_gt"]
    header += [t.lower() for t in tags]
    header += ["inheritance",
               "child_file", "child_index",
               "father_file", "father_index",
               "mother_file", "mother_index",
               "child_vcf", "child_vcf_index", "child_vcf_id"]

    tracks = {m: _find_track(mini_dir, prefix, m)
              for m in ("child", "father", "mother")}
    vcf_abs = os.path.abspath(vcf_path)
    vcf_tbi = vcf_abs + ".tbi"

    rows = []
    for rec in vcf:
        fmt_kv = {}
        if vcf.samples and rec.format:
            fmt_kv = dict(zip(rec.format.split(":"),
                              rec.sample_values[0].split(":")))
        else:
            # INFO fallback (no proband-id run): same values, INFO keys
            fmt_kv = dict(item.partition("=")[::2]
                          for item in rec.info.split(";"))
        row = [rec.chrom, str(rec.pos), rec.ref,
               ",".join(rec.alts) if rec.alts else ".",
               rec.qual if rec.qual is not None else ".",
               rec.filter or ".",
               fmt_kv.get("GT", ".")]
        row += [fmt_kv.get(t, ".") for t in tags]
        row += ["de_novo"]
        for m in ("child", "father", "mother"):
            row += list(tracks[m])
        row += [vcf_abs, vcf_tbi, proband_id]
        rows.append(row)
    return header, rows


def build_rows(vcf_path, samples, mini_dir, padding=1000):
    """Per-variant-slice mode rows (legacy layout, kept for older
    workflows built on extract_mini_bams.py's --bam mode)."""
    vcf = VcfReader(vcf_path)
    rows = []
    for rec in vcf:
        if vcf.samples and rec.format:
            kv = dict(zip(rec.format.split(":"),
                          rec.sample_values[0].split(":")))
            values = {f: kv.get(f, ".") for f in _LEGACY_DK_FIELDS}
        else:
            info = dict(item.partition("=")[::2]
                        for item in rec.info.split(";"))
            values = {f: info.get(f, ".") for f in _LEGACY_DK_FIELDS}
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
        description="Build an IGV review-server TSV from an annotated "
                    "VCF and mini trio alignment slices.")
    parser.add_argument("--vcf", required=True, help="Annotated VCF")
    parser.add_argument("--mini-dir", default="mini_crams",
                        help="Directory of extract_mini_bams.py trio "
                             "output (default: mini_crams)")
    parser.add_argument("--prefix", default="mini",
                        help="Mini-file prefix (default: mini)")
    parser.add_argument("--proband-id", default="HG002",
                        help="Child sample id for the VCF track")
    parser.add_argument("--output", "-o", required=True)
    parser.add_argument("--legacy-samples", default=None,
                        help="Comma-separated labels: emit the legacy "
                             "per-variant-slice layout instead")
    parser.add_argument("--padding", type=int, default=1000,
                        help="legacy mode locus padding")
    args = parser.parse_args(argv)

    if args.legacy_samples:
        samples = [s for s in args.legacy_samples.split(",") if s]
        rows = build_rows(args.vcf, samples, args.mini_dir,
                          args.padding)
        columns = (["locus", "chrom", "pos", "ref", "alt"]
                   + _LEGACY_DK_FIELDS
                   + [f"{s}_bam" for s in samples])
        with open(args.output, "w") as fh:
            fh.write("\t".join(columns) + "\n")
            for row in rows:
                fh.write("\t".join(row.get(c, ".")
                                   for c in columns) + "\n")
        print(f"Wrote {len(rows)} rows to {args.output}")
        return

    header, rows = build_trio_rows(args.vcf, args.mini_dir,
                                   args.prefix, args.proband_id)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)),
                exist_ok=True)
    with open(args.output, "w") as fh:
        fh.write("\t".join(header) + "\n")
        for row in rows:
            fh.write("\t".join(str(v) for v in row) + "\n")
    print(f"Wrote {len(rows)} variants x {len(header)} columns to "
          f"{args.output}")


if __name__ == "__main__":
    main()
