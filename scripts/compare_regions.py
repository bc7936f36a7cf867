#!/usr/bin/env python3
"""Compare discovery regions and VCF variants using bedGraph coverage.

Functional twin of reference scripts/compare_regions.py (390 LoC),
reimplemented on the package's own VCF reader (no pysam).  Classifies
each annotated variant as CONCORDANT / VCF_ONLY / NO_SIGNAL and lists
DISCOVERY_ONLY regions, writing the same summary format.
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kmer_denovo_filter_tpu.htsio.vcf import VcfReader  # noqa: E402


def load_bedgraph(path):
    """{chrom: [(start, end, count), ...]} from a bedGraph file."""
    intervals = collections.defaultdict(list)
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if (not line or line.startswith("#")
                    or line.startswith("track")):
                continue
            parts = line.split("\t")
            intervals[parts[0]].append(
                (int(parts[1]), int(parts[2]), int(parts[3])))
    return dict(intervals)


def load_discovery_bed(path):
    """{chrom: [region dicts]} from a discovery BED file."""

    def _int(val, default=0):
        try:
            return int(val)
        except (ValueError, TypeError):
            return default

    regions = collections.defaultdict(list)
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            regions[parts[0]].append({
                "start": int(parts[1]),
                "end": int(parts[2]),
                "reads": _int(parts[3] if len(parts) > 3 else None),
                "unique_kmers": _int(parts[4] if len(parts) > 4 else None),
                "split_reads": _int(parts[5] if len(parts) > 5 else None),
                "discordant_pairs": _int(
                    parts[6] if len(parts) > 6 else None),
                "max_clip_len": _int(parts[7] if len(parts) > 7 else None),
                "unmapped_mates": _int(
                    parts[8] if len(parts) > 8 else None),
                "class": parts[9].strip() if len(parts) > 9 else "UNKNOWN",
            })
    return dict(regions)


def load_vcf_variants(path):
    """Per-variant metadata (DKU/DKA from FORMAT or INFO)."""
    vcf = VcfReader(path)
    variants = []
    for rec in vcf:
        dku = dka = None
        if vcf.samples and rec.format:
            keys = rec.format.split(":")
            vals = rec.sample_values[0].split(":")
            kv = dict(zip(keys, vals))
            if "DKU" in kv:
                dku = int(kv["DKU"])
            if "DKA" in kv:
                dka = int(kv["DKA"])
        else:
            for item in rec.info.split(";"):
                if item.startswith("DKU="):
                    dku = int(item[4:])
                elif item.startswith("DKA="):
                    dka = int(item[4:])
        variants.append({
            "chrom": rec.chrom,
            "pos0": rec.pos - 1,
            "pos1": rec.pos,
            "ref": rec.ref,
            "alt": ",".join(rec.alts) if rec.alts else ".",
            "dku": dku,
            "dka": dka,
        })
    return variants


def _has_bedgraph_signal(chrom, pos0, bedgraph, window=0):
    q_start = pos0 - window
    q_end = pos0 + window + 1
    for start, end, count in bedgraph.get(chrom, []):
        if count > 0 and start < q_end and end > q_start:
            return True
    return False


def _overlapping_discovery_regions(chrom, pos0, discovery, window=0):
    q_start = pos0 - window
    q_end = pos0 + window + 1
    return [r for r in discovery.get(chrom, [])
            if r["start"] < q_end and r["end"] > q_start]


def _vcf_variants_in_region(chrom, reg_start, reg_end, variants_by_chrom):
    return [v for v in variants_by_chrom.get(chrom, [])
            if reg_start <= v["pos0"] < reg_end]


def compare(bedgraph, discovery, variants, window=0):
    """Classify variants/regions into concordance buckets."""
    variants_by_chrom = collections.defaultdict(list)
    for v in variants:
        variants_by_chrom[v["chrom"]].append(v)

    concordant = []
    vcf_only = []
    no_signal = []
    for v in variants:
        has_signal = _has_bedgraph_signal(
            v["chrom"], v["pos0"], bedgraph, window)
        overlaps = _overlapping_discovery_regions(
            v["chrom"], v["pos0"], discovery, window)
        if has_signal and overlaps:
            concordant.append({"variant": v, "regions": overlaps})
        elif has_signal and not overlaps:
            vcf_only.append({"variant": v})
        else:
            no_signal.append({
                "variant": v,
                "has_discovery": bool(overlaps),
                "discovery_regions": overlaps,
            })

    discovery_only = []
    for chrom, regions in sorted(discovery.items()):
        for region in regions:
            inside = _vcf_variants_in_region(
                chrom, region["start"], region["end"], variants_by_chrom)
            if not inside:
                discovery_only.append({"chrom": chrom, **region})

    return {
        "concordant": concordant,
        "vcf_only": vcf_only,
        "no_signal": no_signal,
        "discovery_only": discovery_only,
    }


def _fmt_variant(v):
    return f"{v['chrom']}:{v['pos1']} {v['ref']}>{v['alt']}"


def _fmt_region_stats(region):
    return (f"reads={region['reads']}"
            f"  unique_kmers={region['unique_kmers']}"
            f"  split_reads={region['split_reads']}"
            f"  class={region['class']}")


def format_summary(result, window=0):
    """Human-readable concordance summary (reference format)."""
    lines = []
    lines.append("=" * 60)
    lines.append("  bedGraph / Discovery / VCF Region Comparison")
    lines.append("=" * 60)
    if window:
        lines.append(
            f"  Search window: ±{window} bp around each VCF position")
    else:
        lines.append("  Search window: exact position overlap")
    lines.append("")

    concordant = result["concordant"]
    lines.append(f"CONCORDANT  ({len(concordant)} variants)")
    lines.append(
        "  VCF variant has k-mer signal AND overlaps a discovery region")
    lines.append("-" * 60)
    for item in concordant:
        v = item["variant"]
        for region in item["regions"]:
            region_coord = f"{v['chrom']}:{region['start']}-{region['end']}"
            lines.append(
                f"  {_fmt_variant(v)}"
                f"  DKU={v['dku']}  DKA={v['dka']}"
                f"  region={region_coord}"
                f"  {_fmt_region_stats(region)}")
    if not concordant:
        lines.append("  (none)")
    lines.append("")

    vcf_only = result["vcf_only"]
    lines.append(f"VCF_ONLY  ({len(vcf_only)} variants)")
    lines.append(
        "  VCF variant has k-mer signal but no overlapping discovery "
        "region")
    lines.append("-" * 60)
    for item in vcf_only:
        v = item["variant"]
        lines.append(f"  {_fmt_variant(v)}"
                     f"  DKU={v['dku']}  DKA={v['dka']}")
    if not vcf_only:
        lines.append("  (none)")
    lines.append("")

    no_signal = result["no_signal"]
    lines.append(f"NO_SIGNAL  ({len(no_signal)} variants)")
    lines.append(
        "  VCF variant has no bedGraph k-mer signal at its position")
    lines.append("-" * 60)
    for item in no_signal:
        v = item["variant"]
        if item["has_discovery"]:
            for region in item["discovery_regions"]:
                region_coord = (
                    f"{v['chrom']}:{region['start']}-{region['end']}")
                lines.append(
                    f"  {_fmt_variant(v)}"
                    f"  DKU={v['dku']}  DKA={v['dka']}"
                    f"  +discovery={region_coord}"
                    f"  {_fmt_region_stats(region)}")
        else:
            lines.append(f"  {_fmt_variant(v)}"
                         f"  DKU={v['dku']}  DKA={v['dka']}")
    if not no_signal:
        lines.append("  (none)")
    lines.append("")

    disc_only = result["discovery_only"]
    lines.append(f"DISCOVERY_ONLY  ({len(disc_only)} regions)")
    lines.append("  Discovery region has no overlapping VCF variant")
    lines.append("-" * 60)
    for item in disc_only:
        lines.append(
            f"  {item['chrom']}:{item['start']}-{item['end']}"
            f"  ({item['end'] - item['start']} bp)"
            f"  {_fmt_region_stats(item)}")
    if not disc_only:
        lines.append("  (none)")
    lines.append("")

    total_vcf = len(concordant) + len(vcf_only) + len(no_signal)
    lines.append("=" * 60)
    lines.append("  Summary")
    lines.append("=" * 60)
    lines.append(f"  Total VCF variants:            {total_vcf}")
    lines.append(f"  Concordant (signal + region):  {len(concordant)}")
    lines.append(f"  VCF-only (signal, no region):  {len(vcf_only)}")
    lines.append(f"  No k-mer signal:               {len(no_signal)}")
    lines.append(f"  Discovery-only regions:        {len(disc_only)}")
    lines.append("=" * 60)
    return "\n".join(lines)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        prog="compare-regions",
        description=(
            "Compare discovery BED regions and VCF variants using "
            "bedGraph k-mer coverage.  Produces a concordance summary."))
    parser.add_argument(
        "--bedgraph", "-b", required=True,
        help="bedGraph from the discovery pipeline "
             "([prefix].kmer_coverage.bedgraph)")
    parser.add_argument("--discovery", "-d", required=True,
                        help="Discovery BED file ([prefix].bed)")
    parser.add_argument(
        "--vcf", "-v", required=True,
        help="Annotated VCF (or VCF.gz) from the VCF-mode pipeline")
    parser.add_argument("--output", "-o", default=None,
                        help="Also write the summary to this file")
    parser.add_argument(
        "--window", "-w", type=int, default=0,
        help="Extra bases around each VCF position to search "
             "(default: 0, exact position overlap)")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    bedgraph = load_bedgraph(args.bedgraph)
    discovery = load_discovery_bed(args.discovery)
    variants = load_vcf_variants(args.vcf)
    result = compare(bedgraph, discovery, variants, window=args.window)
    summary = format_summary(result, window=args.window)
    print(summary)
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(summary + "\n")


if __name__ == "__main__":
    main()
