#!/usr/bin/env python3
"""Cross-reference the two pipelines' outputs into a concordance summary.

Functional twin of reference scripts/compare_regions.py (390 LoC),
rebuilt on the package's own VCF reader (no pysam) and a table-driven
parser/report structure.  Buckets:

  CONCORDANT      variant has bedGraph signal and a discovery region
  VCF_ONLY        variant has signal but no overlapping region
  NO_SIGNAL       variant position has no bedGraph k-mer signal
  DISCOVERY_ONLY  region contains no VCF variant

Output text is format-pinned to the reference so downstream diffs and
the committed goldens stay byte-identical.
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kmer_denovo_filter_tpu.htsio.vcf import VcfReader  # noqa: E402

# Discovery BED column layout after the 3 coordinate columns: the
# (key, required) spec drives both parsing and default filling.
_BED_INT_COLS = ("reads", "unique_kmers", "split_reads",
                 "discordant_pairs", "max_clip_len", "unmapped_mates")


def _data_lines(path, skip_track=False):
    """Stripped, non-comment lines of a tab text file, pre-split."""
    with open(path) as fh:
        for raw in fh:
            text = raw.strip()
            if not text or text.startswith("#"):
                continue
            if skip_track and text.startswith("track"):
                continue
            yield text.split("\t")


def load_bedgraph(path):
    """{chrom: [(start, end, count), ...]} from a bedGraph file."""
    intervals = collections.defaultdict(list)
    for cols in _data_lines(path, skip_track=True):
        intervals[cols[0]].append(
            (int(cols[1]), int(cols[2]), int(cols[3])))
    return dict(intervals)


def load_discovery_bed(path):
    """{chrom: [region dicts]} from a discovery BED file."""
    regions = collections.defaultdict(list)
    for cols in _data_lines(path):
        region = {"start": int(cols[1]), "end": int(cols[2])}
        for offset, key in enumerate(_BED_INT_COLS, start=3):
            try:
                region[key] = int(cols[offset])
            except (IndexError, ValueError):
                region[key] = 0
        cls_col = cols[9].strip() if len(cols) > 9 else ""
        region["class"] = cls_col or "UNKNOWN"
        regions[cols[0]].append(region)
    return dict(regions)


def _dk_fields(rec, has_samples):
    """(DKU, DKA) of one VCF record, FORMAT-first with INFO fallback."""
    pairs = {}
    if has_samples and rec.format:
        pairs = dict(zip(rec.format.split(":"),
                         rec.sample_values[0].split(":")))
    else:
        for item in rec.info.split(";"):
            key, eq, val = item.partition("=")
            if eq:
                pairs[key] = val
    def _get(name):
        return int(pairs[name]) if name in pairs else None
    return _get("DKU"), _get("DKA")


def load_vcf_variants(path):
    """Per-variant metadata (DKU/DKA from FORMAT or INFO)."""
    vcf = VcfReader(path)
    variants = []
    for rec in vcf:
        dku, dka = _dk_fields(rec, bool(vcf.samples))
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


class _Locus:
    """One VCF position widened by the search window."""

    def __init__(self, chrom, pos0, window):
        self.chrom = chrom
        self.lo = pos0 - window
        self.hi = pos0 + window + 1

    def has_signal(self, bedgraph):
        return any(count > 0 and start < self.hi and end > self.lo
                   for start, end, count in bedgraph.get(self.chrom, []))

    def regions(self, discovery):
        return [r for r in discovery.get(self.chrom, [])
                if r["start"] < self.hi and r["end"] > self.lo]


def compare(bedgraph, discovery, variants, window=0):
    """Classify variants/regions into concordance buckets."""
    by_chrom = collections.defaultdict(list)
    buckets = {"concordant": [], "vcf_only": [], "no_signal": [],
               "discovery_only": []}
    for v in variants:
        by_chrom[v["chrom"]].append(v)
        locus = _Locus(v["chrom"], v["pos0"], window)
        overlaps = locus.regions(discovery)
        if not locus.has_signal(bedgraph):
            buckets["no_signal"].append({
                "variant": v,
                "has_discovery": bool(overlaps),
                "discovery_regions": overlaps,
            })
        elif overlaps:
            buckets["concordant"].append(
                {"variant": v, "regions": overlaps})
        else:
            buckets["vcf_only"].append({"variant": v})

    for chrom, regions in sorted(discovery.items()):
        for region in regions:
            hit = any(region["start"] <= v["pos0"] < region["end"]
                      for v in by_chrom.get(chrom, []))
            if not hit:
                buckets["discovery_only"].append(
                    {"chrom": chrom, **region})
    return buckets


# ── summary rendering ────────────────────────────────────────────────

def _variant_label(v):
    return "%s:%s %s>%s" % (v["chrom"], v["pos1"], v["ref"], v["alt"])


def _variant_dk(v):
    return "  %s  DKU=%s  DKA=%s" % (_variant_label(v), v["dku"],
                                     v["dka"])


def _region_stats(region):
    return ("reads=%(reads)s  unique_kmers=%(unique_kmers)s"
            "  split_reads=%(split_reads)s  class=%(class)s" % region)


def _region_coord(chrom, region):
    return "%s:%s-%s" % (chrom, region["start"], region["end"])


class _Report:
    """Accumulates the pinned summary layout line by line."""

    RULE = "=" * 60

    def __init__(self):
        self.lines = []

    def add(self, *lines):
        self.lines.extend(lines)

    def banner(self, title):
        self.add(self.RULE, title, self.RULE)

    def open_section(self, heading, description):
        self.add(heading, description, "-" * 60)

    def close_section(self, n_rows):
        if not n_rows:
            self.add("  (none)")
        self.add("")

    def text(self):
        return "\n".join(self.lines)


def format_summary(result, window=0):
    """Human-readable concordance summary (reference format)."""
    rep = _Report()
    rep.banner("  bedGraph / Discovery / VCF Region Comparison")
    if window:
        rep.add("  Search window: ±%d bp around each VCF position"
                % window)
    else:
        rep.add("  Search window: exact position overlap")
    rep.add("")

    concordant = result["concordant"]
    rep.open_section(
        "CONCORDANT  (%d variants)" % len(concordant),
        "  VCF variant has k-mer signal AND overlaps a discovery region")
    for item in concordant:
        v = item["variant"]
        for region in item["regions"]:
            rep.add("%s  region=%s  %s" % (
                _variant_dk(v), _region_coord(v["chrom"], region),
                _region_stats(region)))
    rep.close_section(len(concordant))

    vcf_only = result["vcf_only"]
    rep.open_section(
        "VCF_ONLY  (%d variants)" % len(vcf_only),
        "  VCF variant has k-mer signal but no overlapping discovery "
        "region")
    for item in vcf_only:
        rep.add(_variant_dk(item["variant"]))
    rep.close_section(len(vcf_only))

    no_signal = result["no_signal"]
    rep.open_section(
        "NO_SIGNAL  (%d variants)" % len(no_signal),
        "  VCF variant has no bedGraph k-mer signal at its position")
    for item in no_signal:
        v = item["variant"]
        if not item["has_discovery"]:
            rep.add(_variant_dk(v))
            continue
        for region in item["discovery_regions"]:
            rep.add("%s  +discovery=%s  %s" % (
                _variant_dk(v), _region_coord(v["chrom"], region),
                _region_stats(region)))
    rep.close_section(len(no_signal))

    disc_only = result["discovery_only"]
    rep.open_section(
        "DISCOVERY_ONLY  (%d regions)" % len(disc_only),
        "  Discovery region has no overlapping VCF variant")
    for item in disc_only:
        rep.add("  %s  (%d bp)  %s" % (
            _region_coord(item["chrom"], item),
            item["end"] - item["start"], _region_stats(item)))
    rep.close_section(len(disc_only))

    n_variants = len(concordant) + len(vcf_only) + len(no_signal)
    rep.banner("  Summary")
    rep.add("  Total VCF variants:            %d" % n_variants,
            "  Concordant (signal + region):  %d" % len(concordant),
            "  VCF-only (signal, no region):  %d" % len(vcf_only),
            "  No k-mer signal:               %d" % len(no_signal),
            "  Discovery-only regions:        %d" % len(disc_only),
            rep.RULE)
    return rep.text()


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
    result = compare(
        load_bedgraph(args.bedgraph),
        load_discovery_bed(args.discovery),
        load_vcf_variants(args.vcf),
        window=args.window)
    summary = format_summary(result, window=args.window)
    print(summary)
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(summary + "\n")


if __name__ == "__main__":
    main()
