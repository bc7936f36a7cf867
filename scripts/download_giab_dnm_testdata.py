#!/usr/bin/env python3
"""Regenerate the GIAB trio test dataset (tests/data/giab).

Discovers child-private SNVs in the GIAB Ashkenazi trio (HG002 son /
HG003 father / HG004 mother) and slices small BAM windows around them
plus a curated set of SV-like de novo loci (Sulovari et al. 2023,
PMC10006329).  Python port of the capability provided by the reference
tool's scripts/download_giab_dnm_testdata.sh (598-line bash): same data
sources, same outputs, restructured as testable functions.

Everything is fetched via htslib HTTPS *random access* (samtools /
bcftools reading https:// URLs directly) — no bulk downloads; a full
run transfers a few MB.

Pipeline:
  1. Stream ~50 kb benchmark-VCF windows across the autosomes and
     collect HG002 SNVs.
  2. Keep SNVs absent from both parents' benchmark VCFs at the same
     position (child-private).
  3. Take the first N (default 5) plus every confirmed child-private
     variant inside the curated SV loci.
  4. Slice each sample's 2x250 bp Illumina BAM around all regions
     (±padding; custom padding for the curated loci), sort + index.
  5. Write candidates.vcf.gz (+ .tbi) and a provenance README.

Requires samtools >= 1.10 and bcftools >= 1.10 built with libcurl
(HTTPS) support on PATH.  Use --hg002-vcf/--hg002-bam/... to point at
local mirrors instead (the test suite does this with tiny fixtures).
"""

import argparse
import os
import subprocess
import sys

GIAB_BASE = ("https://ftp-trace.ncbi.nlm.nih.gov/ReferenceSamples/"
             "giab")
_BAM_BASE = f"{GIAB_BASE}/data/AshkenazimTrio"
_BENCH_BASE = f"{GIAB_BASE}/release/AshkenazimTrio"

DEFAULT_URLS = {
    "hg002_bam": (f"{_BAM_BASE}/HG002_NA24385_son/"
                  "NIST_Illumina_2x250bps/novoalign_bams/"
                  "HG002.GRCh38.2x250.bam"),
    "hg003_bam": (f"{_BAM_BASE}/HG003_NA24149_father/"
                  "NIST_Illumina_2x250bps/novoalign_bams/"
                  "HG003.GRCh38.2x250.bam"),
    "hg004_bam": (f"{_BAM_BASE}/HG004_NA24143_mother/"
                  "NIST_Illumina_2x250bps/novoalign_bams/"
                  "HG004.GRCh38.2x250.bam"),
    # v4.2.1 pinned explicitly: the 'latest' symlink can change names
    "hg002_vcf": (f"{_BENCH_BASE}/HG002_NA24385_son/NISTv4.2.1/GRCh38/"
                  "HG002_GRCh38_1_22_v4.2.1_benchmark.vcf.gz"),
    "hg003_vcf": (f"{_BENCH_BASE}/HG003_NA24149_father/NISTv4.2.1/"
                  "GRCh38/HG003_GRCh38_1_22_v4.2.1_benchmark.vcf.gz"),
    "hg004_vcf": (f"{_BENCH_BASE}/HG004_NA24143_mother/NISTv4.2.1/"
                  "GRCh38/HG004_GRCh38_1_22_v4.2.1_benchmark.vcf.gz"),
}

# ~50 kb benchmark windows, one per autosome, streamed for SNV
# discovery (each typically yields 100–200 HG002 benchmark SNVs).
DISCOVERY_WINDOWS = [
    "chr1:5000000-5050000", "chr2:10000000-10050000",
    "chr3:15000000-15050000", "chr4:20000000-20050000",
    "chr5:25000000-25050000", "chr6:30000000-30050000",
    "chr7:35000000-35050000", "chr8:40000000-40050000",
    "chr9:45000000-45050000", "chr10:50000000-50050000",
    "chr11:55000000-55050000", "chr12:60000000-60050000",
    "chr13:40000000-40050000", "chr14:50000000-50050000",
    "chr15:35000000-35050000", "chr16:20000000-20050000",
    "chr17:25000000-25050000", "chr18:30000000-30050000",
    "chr19:15000000-15050000", "chr20:10000000-10050000",
    "chr21:20000000-20050000", "chr22:25000000-25050000",
]

# Curated SV-like DNM loci (Sulovari et al. 2023): BAM windows are
# always extracted around these; overlapping benchmark variants are
# included in the candidate VCF only when confirmed child-private.
# (chrom, pos, event_size, pad_left, pad_right, label)
SV_DNM_REGIONS = [
    ("chr17", 53340465, 107, 500, 500, "107bp_deletion"),
    ("chr14", 23280711, 0, 500, 500,
     "microsatellite_repeat_expansion"),
    ("chr3", 85552367, 64, 500, 500, "64bp_event"),
    ("chr5", 97089276, 43, 500, 500, "43bp_event"),
    ("chr8", 125785998, 43, 500, 500, "43bp_event"),
    ("chr18", 62805217, 34, 500, 500, "34bp_event"),
    ("chr7", 142786222, 10607, 1000, 11000,
     "10607bp_deletion_TRB_locus"),
]


def log(msg):
    print(msg, file=sys.stderr)


def _run(cmd, **kw):
    res = subprocess.run(cmd, capture_output=True, text=True, **kw)
    if res.returncode != 0:
        raise RuntimeError(
            f"{' '.join(cmd[:3])}... failed (exit {res.returncode}): "
            f"{res.stderr.strip()[:500]}")
    return res.stdout


def check_tools():
    for tool in ("samtools", "bcftools", "tabix", "bgzip"):
        try:
            subprocess.run([tool, "--version"], capture_output=True)
        except OSError:
            raise RuntimeError(
                f"{tool} not found on PATH (htslib tools with HTTPS "
                "support are required)")


def vcf_records(vcf_url, region):
    """(chrom, pos, ref, alt, line) for each record in *region*."""
    out = _run(["bcftools", "view", "-H", "-r", region, vcf_url])
    recs = []
    for line in out.splitlines():
        f = line.split("\t")
        if len(f) < 8:
            continue
        recs.append((f[0], int(f[1]), f[3], f[4], line))
    return recs


def positions_in(vcf_url, region):
    """Set of (chrom, pos) present in *region* of a VCF."""
    out = _run(["bcftools", "query", "-f", "%CHROM\t%POS\n",
                "-r", region, vcf_url])
    pos = set()
    for line in out.splitlines():
        f = line.split("\t")
        if len(f) == 2:
            pos.add((f[0], int(f[1])))
    return pos


def is_snv(ref, alt):
    return (len(ref) == 1 and ref in "ACGT"
            and all(len(a) == 1 and a in "ACGT"
                    for a in alt.split(",")))


def discover_child_private(urls, windows, want, log_fn=log):
    """Child-private SNVs: in HG002's benchmark, absent both parents.

    Returns a list of (chrom, pos, line) in window order, at most
    *want* entries (scanning stops early once satisfied).
    """
    found = []
    for window in windows:
        if len(found) >= want:
            break
        child = [r for r in vcf_records(urls["hg002_vcf"], window)
                 if is_snv(r[2], r[3])]
        if not child:
            continue
        dad = positions_in(urls["hg003_vcf"], window)
        mum = positions_in(urls["hg004_vcf"], window)
        private = [(c, p, line) for c, p, _r, _a, line in child
                   if (c, p) not in dad and (c, p) not in mum]
        log_fn(f"  {window}: {len(child)} HG002 SNVs, "
               f"{len(private)} child-private")
        found.extend(private)
    return found[:want]


def curated_child_private(urls, log_fn=log):
    """Confirmed child-private benchmark variants in curated SV loci."""
    out = []
    for chrom, pos, size, pad_l, pad_r, label in SV_DNM_REGIONS:
        region = f"{chrom}:{max(1, pos - pad_l)}-{pos + size + pad_r}"
        try:
            recs = vcf_records(urls["hg002_vcf"], region)
        except RuntimeError as e:
            log_fn(f"  {label}: VCF scan failed ({e}); skipping")
            continue
        if not recs:
            continue
        dad = positions_in(urls["hg003_vcf"], region)
        mum = positions_in(urls["hg004_vcf"], region)
        for c, p, _r, _a, line in recs:
            if (c, p) not in dad and (c, p) not in mum:
                out.append((c, p, line))
        log_fn(f"  {label}: {len(recs)} benchmark variants in window")
    return out


def build_regions(snvs, padding):
    """Merged half-open extraction regions for all targets."""
    regions = [(c, max(0, p - 1 - padding), p + padding)
               for c, p, _line in snvs]
    for chrom, pos, size, pad_l, pad_r, _label in SV_DNM_REGIONS:
        regions.append((chrom, max(0, pos - 1 - pad_l),
                        pos + size + pad_r))

    def _chrom_key(c):
        s = c.replace("chr", "")
        return (0, int(s)) if s.isdigit() else (1, s)

    regions.sort(key=lambda r: (_chrom_key(r[0]), r[1]))
    merged = []
    for c, s, e in regions:
        if merged and merged[-1][0] == c and s <= merged[-1][2]:
            merged[-1][2] = max(merged[-1][2], e)
        else:
            merged.append([c, s, e])
    return [(c, s, e) for c, s, e in merged]


def extract_bam_slices(url, regions, out_bam, threads=2):
    """Slice *regions* out of a (possibly remote) BAM; sort + index."""
    region_args = [f"{c}:{s + 1}-{e}" for c, s, e in regions]
    tmp = out_bam + ".unsorted.bam"
    with open(tmp, "wb") as fh:
        res = subprocess.run(
            ["samtools", "view", "-b", url] + region_args,
            stdout=fh, stderr=subprocess.PIPE)
    if res.returncode != 0:
        raise RuntimeError(
            f"samtools view {url} failed: "
            f"{res.stderr.decode()[:500]}")
    _run(["samtools", "sort", "-@", str(threads), "-o", out_bam, tmp])
    os.unlink(tmp)
    _run(["samtools", "index", out_bam])


def write_candidates_vcf(urls, snvs, out_vcf):
    """bgzipped + tabixed VCF of the selected candidate lines."""
    header = _run(["bcftools", "view", "-h", urls["hg002_vcf"]])
    plain = out_vcf[:-3] if out_vcf.endswith(".gz") else out_vcf
    seen = set()
    with open(plain, "w") as fh:
        fh.write(header)
        for c, p, line in sorted(
                snvs, key=lambda x: (x[0], x[1])):
            if (c, p) in seen:
                continue
            seen.add((c, p))
            fh.write(line.rstrip("\n") + "\n")
    _run(["bgzip", "-f", plain])
    _run(["tabix", "-f", "-p", "vcf", plain + ".gz"])
    return plain + ".gz"


def write_readme(out_dir, n_snvs, n_curated):
    with open(os.path.join(out_dir, "README.md"), "w") as fh:
        fh.write(
            "# GIAB HG002 trio test data (regenerated)\n\n"
            f"- {n_snvs} discovered child-private SNVs "
            "(HG002 v4.2.1 benchmark, absent both parents)\n"
            f"- {n_curated} confirmed child-private variants inside "
            "the curated Sulovari et al. 2023 SV-like DNM loci\n"
            "- BAM slices from the NIST Illumina 2x250 bp novoalign "
            "GRCh38 alignments\n\n"
            "Regenerate with scripts/download_giab_dnm_testdata.py.\n")


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("-o", "--output-dir", default="giab_testdata")
    ap.add_argument("-n", "--num-variants", type=int, default=5,
                    help="discovered child-private SNVs to keep")
    ap.add_argument("-p", "--padding", type=int, default=500,
                    help="BAM padding around discovered SNVs (bp)")
    for key, url in DEFAULT_URLS.items():
        ap.add_argument(f"--{key.replace('_', '-')}", default=url,
                        help=f"override {key} source")
    args = ap.parse_args(argv)
    urls = {key: getattr(args, key) for key in DEFAULT_URLS}

    check_tools()
    os.makedirs(args.output_dir, exist_ok=True)

    log(f"Step 1/4: discovering child-private SNVs "
        f"(want {args.num_variants}) ...")
    snvs = discover_child_private(urls, DISCOVERY_WINDOWS,
                                  args.num_variants)
    if not snvs:
        raise RuntimeError("no child-private SNVs discovered — "
                           "check connectivity / source URLs")
    log(f"  selected {len(snvs)} SNVs")

    log("Step 2/4: scanning curated SV-like DNM loci ...")
    curated = curated_child_private(urls)
    log(f"  {len(curated)} confirmed child-private variants in "
        "curated loci")

    regions = build_regions(snvs, args.padding)
    log(f"Step 3/4: extracting {len(regions)} BAM regions per "
        "sample ...")
    for sample, key in (("HG002_child", "hg002_bam"),
                        ("HG003_father", "hg003_bam"),
                        ("HG004_mother", "hg004_bam")):
        out_bam = os.path.join(args.output_dir, f"{sample}.bam")
        extract_bam_slices(urls[key], regions, out_bam)
        log(f"  {out_bam}")

    log("Step 4/4: writing candidates VCF ...")
    vcf = write_candidates_vcf(urls, snvs + curated,
                               os.path.join(args.output_dir,
                                            "candidates.vcf.gz"))
    write_readme(args.output_dir, len(snvs), len(curated))
    log(f"Done: {vcf}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
