"""Self-contained interactive HTML report for both pipelines.

Functional twin of the reference report generator
(reference report.py, 2726 LoC): same loaders, the same six-stage
stratification cascade, the same figure inventory (funnel, stage
cascade, DKA_DKT histogram, DKA-vs-DKT scatter, PKC distributions,
contamination fractions, discovery region views, variant-type and
chromosome breakdowns) and per-variant table — but rendered as inline
SVG generated in Python, so the report is fully self-contained with
zero JavaScript/plotly dependencies.  Hover titles on every mark give
basic interactivity.
"""

import html
import json
import logging
import os
import re

logger = logging.getLogger(__name__)

_VARIANT_TABLE_MAX_ROWS = 100

# Six progressively stricter filtering stages (identical thresholds to
# reference report.py:26–45): every figure tells the same cascade story.
DKA_THRESHOLD = 0            # Stage 1: DKA > 0
DKA_STRONG_THRESHOLD = 5     # Stage 2: DKA >= 5
DKA_DKT_THRESHOLD = 0.1      # Stage 3: DKA_DKT > 0.1
MAX_PKC_ALT_THRESHOLD = 1    # Stage 4: MAX_PKC_ALT < 1
NHF_THRESHOLD = 0.05         # Stage 5: DKA_NHF < 0.05

STAGE_LABELS = [
    "Putative denovo (input VCF)",
    "Putative kmer denovo (DKA > 0)",
    "Putative kmer denovo (DKA ≥ 5)",
    "Higher-quality denovo (DKA_DKT > 0.1)",
    "Higher-quality denovo (MAX_PKC_ALT < 1)",
    "HQ, not contamination (NHF < 0.05)",
]
STAGE_COLORS = [
    "#4C78A8", "#F58518", "#E45756", "#72B7B2", "#EECA3B", "#54A24B",
]


# ── Loaders ────────────────────────────────────────────────────────


def _load_metrics(metrics_path):
    if not metrics_path or not os.path.isfile(metrics_path):
        return None
    with open(metrics_path) as fh:
        return json.load(fh)


def _load_summary_variants(summary_path):
    """Per-variant rows from a VCF-mode summary's Per-Variant table."""
    if not summary_path or not os.path.isfile(summary_path):
        return []
    variants = []
    in_table = False
    with open(summary_path) as fh:
        for line in fh:
            line = line.rstrip()
            if line.strip().startswith("Variant") and "DKU" in line:
                in_table = True
                continue
            if in_table and line.strip().startswith("-------"):
                continue
            if in_table and (not line.strip()
                             or line.strip().startswith("=")):
                break
            if not in_table:
                continue
            parts = line.split()
            if len(parts) < 14:
                continue
            try:
                variants.append({
                    "variant": f"{parts[0]} {parts[1]}",
                    "chrom": parts[0].rsplit(":", 1)[0],
                    "label": parts[1],
                    "dku": int(parts[2]),
                    "dkt": int(parts[3]),
                    "dka": int(parts[4]),
                    "dku_dkt": float(parts[5]),
                    "dka_dkt": float(parts[6]),
                    "max_pkc": int(parts[7]),
                    "avg_pkc": float(parts[8]),
                    "min_pkc": int(parts[9]),
                    "max_pkc_alt": int(parts[10]),
                    "avg_pkc_alt": float(parts[11]),
                    "min_pkc_alt": int(parts[12]),
                    "call": parts[13],
                })
            except (ValueError, IndexError):
                continue
    return variants


def _load_summary_counts(summary_path):
    """Headline counts from the summary's Variant Counts section."""
    counts = {}
    if not summary_path or not os.path.isfile(summary_path):
        return counts
    patterns = {
        "total": r"Total candidates analyzed:\s+(\d+)",
        "likely_dnm": r"Likely de novo \(DKU > 0\):\s+(\d+)",
        "inherited": r"Inherited / unclear \(DKU=0\):\s+(\d+)",
    }
    text = open(summary_path).read()
    for key, pat in patterns.items():
        m = re.search(pat, text)
        if m:
            counts[key] = int(m.group(1))
    return counts


def _load_vcf_kraken2_annotations(vcf_path):
    """{variant_key: {field: value}} for Kraken2 fraction fields."""
    if not vcf_path or not os.path.isfile(vcf_path):
        return {}
    from kmer_denovo_filter_tpu.htsio.vcf import VcfReader
    fields = ("DKU_NHF", "DKA_NHF", "DKU_BF", "DKA_BF", "DKU_VF",
              "DKA_VF", "DKU_UCF", "DKA_UCF", "DKU_UF", "DKA_UF",
              "DKU_HLF", "DKA_HLF")
    try:
        vcf = VcfReader(vcf_path)
    except OSError:
        return {}
    out = {}
    for rec in vcf:
        ann = {}
        if vcf.samples and rec.format:
            keys = rec.format.split(":")
            vals = rec.sample_values[0].split(":")
            kv = dict(zip(keys, vals))
            for f in fields:
                if f in kv and kv[f] not in (".", ""):
                    try:
                        ann[f] = float(kv[f])
                    except ValueError:
                        pass
        else:
            for item in rec.info.split(";"):
                name, _, val = item.partition("=")
                if name in fields and val:
                    try:
                        ann[name] = float(val)
                    except ValueError:
                        pass
        if ann:
            alt = rec.alts[0] if rec.alts else "."
            out[f"{rec.chrom}:{rec.pos} {rec.ref}>{alt}"] = ann
    return out


def _merge_kraken2_into_variants(variants, kraken2_data):
    for v in variants:
        key = f"{v['chrom']}:{v['variant'].split(':')[1].split(' ')[0]}"
        ann = kraken2_data.get(f"{v['variant']}")
        if ann is None:
            # summary label and VCF label share "chrom:pos ref>alt"
            ann = kraken2_data.get(v["variant"])
        if ann:
            v.update({k.lower(): val for k, val in ann.items()})
    return variants


def _stratify_variant(v, has_nhf_data=None):
    """Deepest stage (0–5) the variant survives to."""
    if v["dka"] <= DKA_THRESHOLD:
        return 0
    if v["dka"] < DKA_STRONG_THRESHOLD:
        return 1
    if v["dka_dkt"] <= DKA_DKT_THRESHOLD:
        return 2
    if v["max_pkc_alt"] >= MAX_PKC_ALT_THRESHOLD:
        return 3
    if has_nhf_data:
        nhf = v.get("dka_nhf")
        if nhf is None or nhf >= NHF_THRESHOLD:
            return 4
        return 5
    return 4


def _compute_stratification(variants, has_nhf_data=None):
    """Counts surviving each cascade stage + per-variant stage index."""
    if has_nhf_data is None:
        has_nhf_data = any("dka_nhf" in v for v in variants)
    n_stages = 6 if has_nhf_data else 5
    stage_of = [_stratify_variant(v, has_nhf_data) for v in variants]
    surviving = []
    for s in range(n_stages):
        surviving.append(sum(1 for x in stage_of if x >= s))
    return {
        "n_stages": n_stages,
        "surviving": surviving,
        "stage_of": stage_of,
        "labels": STAGE_LABELS[:n_stages],
        "colors": STAGE_COLORS[:n_stages],
        "has_nhf_data": has_nhf_data,
    }


def _load_discovery_regions(metrics_path):
    m = _load_metrics(metrics_path)
    return (m or {}).get("regions", [])


def _load_discovery_candidate_comparison(metrics_path):
    m = _load_metrics(metrics_path)
    return (m or {}).get("candidate_comparison")


def _load_discovery_dnm_evaluation(metrics_path):
    m = _load_metrics(metrics_path)
    return (m or {}).get("dnm_evaluation")


# ── SVG chart primitives ───────────────────────────────────────────


def _svg(width, height, body):
    return (f'<svg viewBox="0 0 {width} {height}" width="{width}" '
            f'height="{height}" xmlns="http://www.w3.org/2000/svg" '
            f'font-family="Helvetica,Arial,sans-serif">{body}</svg>')


def _esc(s):
    return html.escape(str(s), quote=True)


def _hbar_chart(labels, values, colors, title, width=760, note=None):
    """Horizontal bar chart with value labels and hover titles."""
    n = len(values)
    if n == 0:
        return ""
    bar_h = 30
    gap = 12
    top = 34
    left = 310
    height = top + n * (bar_h + gap) + 24
    vmax = max(max(values), 1)
    parts = [f'<text x="8" y="20" font-size="15" font-weight="bold">'
             f'{_esc(title)}</text>']
    for i, (lab, val) in enumerate(zip(labels, values)):
        y = top + i * (bar_h + gap)
        w = (width - left - 80) * val / vmax
        color = colors[i % len(colors)]
        parts.append(
            f'<text x="{left - 8}" y="{y + bar_h * 0.68}" font-size="12" '
            f'text-anchor="end">{_esc(lab)}</text>')
        parts.append(
            f'<rect x="{left}" y="{y}" width="{max(w, 1):.1f}" '
            f'height="{bar_h}" fill="{color}" rx="3">'
            f'<title>{_esc(lab)}: {val}</title></rect>')
        parts.append(
            f'<text x="{left + max(w, 1) + 6:.1f}" '
            f'y="{y + bar_h * 0.68}" font-size="12">{val}</text>')
    if note:
        parts.append(
            f'<text x="8" y="{height - 6}" font-size="11" fill="#666">'
            f'{_esc(note)}</text>')
    return _svg(width, height, "".join(parts))


def _histogram(values, bins, title, color="#4C78A8", width=760,
               height=260, x_label=""):
    if not values:
        return ""
    lo = min(values)
    hi = max(values)
    if hi == lo:
        hi = lo + 1
    step = (hi - lo) / bins
    counts = [0] * bins
    for v in values:
        b = min(int((v - lo) / step), bins - 1)
        counts[b] += 1
    cmax = max(counts)
    left, bottom, top = 50, 36, 30
    plot_w = width - left - 20
    plot_h = height - bottom - top
    parts = [f'<text x="8" y="20" font-size="15" font-weight="bold">'
             f'{_esc(title)}</text>']
    bw = plot_w / bins
    for i, c in enumerate(counts):
        h = plot_h * c / cmax if cmax else 0
        x = left + i * bw
        y = top + plot_h - h
        b_lo = lo + i * step
        parts.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{bw - 1:.1f}" '
            f'height="{h:.1f}" fill="{color}">'
            f'<title>[{b_lo:.3g}, {b_lo + step:.3g}): {c}</title></rect>')
    # axes
    parts.append(f'<line x1="{left}" y1="{top + plot_h}" '
                 f'x2="{left + plot_w}" y2="{top + plot_h}" '
                 f'stroke="#333"/>')
    parts.append(f'<text x="{left}" y="{height - 8}" font-size="11">'
                 f'{lo:.3g}</text>')
    parts.append(f'<text x="{left + plot_w}" y="{height - 8}" '
                 f'font-size="11" text-anchor="end">{hi:.3g}</text>')
    parts.append(f'<text x="{(left + width) / 2}" y="{height - 8}" '
                 f'font-size="11" text-anchor="middle">'
                 f'{_esc(x_label)}</text>')
    parts.append(f'<text x="{left - 6}" y="{top + 10}" font-size="11" '
                 f'text-anchor="end">{cmax}</text>')
    return _svg(width, height, "".join(parts))


def _scatter(points, title, x_label, y_label, width=760, height=330,
             logx=False, logy=False):
    """points: list of (x, y, color, label)."""
    import math
    if not points:
        return ""

    def tx(v):
        return math.log10(v + 1) if logx else v

    def ty(v):
        return math.log10(v + 1) if logy else v

    xs = [tx(p[0]) for p in points]
    ys = [ty(p[1]) for p in points]
    x_lo, x_hi = min(xs), max(xs)
    y_lo, y_hi = min(ys), max(ys)
    if x_hi == x_lo:
        x_hi = x_lo + 1
    if y_hi == y_lo:
        y_hi = y_lo + 1
    left, bottom, top = 56, 40, 30
    plot_w = width - left - 20
    plot_h = height - bottom - top
    parts = [f'<text x="8" y="20" font-size="15" font-weight="bold">'
             f'{_esc(title)}</text>']
    parts.append(f'<line x1="{left}" y1="{top + plot_h}" '
                 f'x2="{left + plot_w}" y2="{top + plot_h}" '
                 f'stroke="#333"/>')
    parts.append(f'<line x1="{left}" y1="{top}" x2="{left}" '
                 f'y2="{top + plot_h}" stroke="#333"/>')
    for x, y, color, label in points:
        px = left + plot_w * (tx(x) - x_lo) / (x_hi - x_lo)
        py = top + plot_h * (1 - (ty(y) - y_lo) / (y_hi - y_lo))
        parts.append(
            f'<circle cx="{px:.1f}" cy="{py:.1f}" r="4" fill="{color}" '
            f'fill-opacity="0.75"><title>{_esc(label)}</title></circle>')
    parts.append(f'<text x="{left + plot_w / 2}" y="{height - 8}" '
                 f'font-size="12" text-anchor="middle">'
                 f'{_esc(x_label)}</text>')
    parts.append(f'<text x="14" y="{top + plot_h / 2}" font-size="12" '
                 f'transform="rotate(-90 14 {top + plot_h / 2})" '
                 f'text-anchor="middle">{_esc(y_label)}</text>')
    return _svg(width, height, "".join(parts))


# ── Figures (same inventory as the reference) ──────────────────────


def _make_stratification_funnel(strat):
    return _hbar_chart(strat["labels"], strat["surviving"],
                       strat["colors"],
                       "Variant filtering cascade (stage survivors)")


def _make_kmer_funnel_chart(metrics, mode="vcf"):
    if not metrics:
        return ""
    if mode == "vcf":
        labels = ["Total child k-mers", "Found in parents",
                  "Child-unique k-mers"]
        values = [metrics.get("total_child_kmers", 0),
                  metrics.get("parent_found_kmers", 0),
                  metrics.get("child_unique_kmers", 0)]
    else:
        labels = ["Child candidate k-mers", "Non-reference k-mers",
                  "Proband-unique k-mers"]
        values = [metrics.get("child_candidate_kmers", 0),
                  metrics.get("non_ref_kmers", 0),
                  metrics.get("proband_unique_kmers", 0)]
    return _hbar_chart(labels, values,
                       ["#4C78A8", "#F58518", "#54A24B"],
                       "K-mer filtering funnel")


def _make_dka_dkt_histogram(variants):
    vals = [v["dka_dkt"] for v in variants]
    return _histogram(vals, 24, "DKA_DKT distribution",
                      x_label="DKA_DKT (allele-supporting fraction)")


def _make_dka_vs_dkt_scatter(variants):
    pts = [(v["dkt"], v["dka"],
            "#54A24B" if v["call"] == "DE_NOVO" else "#9aa5b1",
            f"{v['variant']} DKA={v['dka']} DKT={v['dkt']} ({v['call']})")
           for v in variants]
    return _scatter(pts, "DKA vs DKT per variant "
                    "(green = DE_NOVO call)", "DKT (total fragments)",
                    "DKA (allele-supporting fragments)")


def _make_pkc_vs_dka_dkt_scatter(variants):
    pts = [(max(v["max_pkc_alt"], 0), v["dka_dkt"],
            "#54A24B" if v["call"] == "DE_NOVO".replace("O", "O")
            and v["call"] == "DE_NOVO" else
            ("#54A24B" if v["call"] == "DE_NOVO" else "#9aa5b1"),
            f"{v['variant']} MAX_PKC_ALT={v['max_pkc_alt']} "
            f"DKA_DKT={v['dka_dkt']}")
           for v in variants]
    return _scatter(pts, "Parental k-mer support vs allele evidence",
                    "MAX_PKC_ALT (log scale)", "DKA_DKT", logx=True)


def _make_pkc_histogram(variants):
    vals = [v["avg_pkc"] for v in variants if v["avg_pkc"] > 0]
    return _histogram(vals, 24, "AVG_PKC distribution (found in parents)",
                      color="#72B7B2", x_label="AVG_PKC")


def _make_nhf_distribution_plot(variants):
    vals = [v["dka_nhf"] for v in variants if "dka_nhf" in v]
    if not vals:
        return ""
    return _histogram(vals, 20, "DKA non-human fraction (Kraken2)",
                      color="#E45756", x_label="DKA_NHF")


def _classify_variant_type(label):
    """SNV / insertion / deletion / MNV from a 'REF>ALT' label."""
    m = re.match(r"^([A-Za-z]+)>([A-Za-z]+)$", label)
    if not m:
        return "other"
    ref, alt = m.group(1), m.group(2)
    if len(ref) == 1 and len(alt) == 1:
        return "SNV"
    if len(ref) < len(alt):
        return "insertion"
    if len(ref) > len(alt):
        return "deletion"
    return "MNV"


def _make_variant_type_breakdown(variants):
    from collections import Counter
    counts = Counter(_classify_variant_type(v["label"]) for v in variants)
    order = ["SNV", "insertion", "deletion", "MNV", "other"]
    labels = [o for o in order if counts.get(o)]
    return _hbar_chart(labels, [counts[o] for o in labels],
                       STAGE_COLORS, "Variant type breakdown")


def _make_chromosomal_distribution(variants):
    from collections import Counter

    def _key(chrom):
        c = chrom.replace("chr", "")
        return (0, int(c)) if c.isdigit() else (1, c)

    counts = Counter(v["chrom"] for v in variants)
    chroms = sorted(counts, key=_key)
    return _hbar_chart(chroms, [counts[c] for c in chroms],
                       ["#4C78A8"], "Variants per chromosome")


def _make_discovery_region_scatter(regions):
    pts = [(r["size"], r["reads"],
            {"SV": "#E45756", "AMBIGUOUS": "#F58518"}.get(
                r["class"], "#4C78A8"),
            f"{r['chrom']}:{r['start'] + 1}-{r['end']} "
            f"reads={r['reads']} kmers={r['unique_kmers']} "
            f"class={r['class']}")
           for r in regions]
    return _scatter(pts, "Discovery regions: size vs read support "
                    "(red=SV, orange=AMBIGUOUS)", "Region size (bp)",
                    "Supporting reads")


def _make_discovery_size_histogram(regions):
    return _histogram([r["size"] for r in regions], 20,
                      "Region size distribution", color="#72B7B2",
                      x_label="size (bp)")


def _make_sv_evidence_chart(regions):
    labels = []
    values = []
    for key, lab in (("split_reads", "split reads"),
                     ("discordant_pairs", "discordant pairs"),
                     ("unmapped_mates", "unmapped mates")):
        labels.append(f"Regions with {lab}")
        values.append(sum(1 for r in regions if r.get(key, 0) > 0))
    labels.append("Classified SV")
    values.append(sum(1 for r in regions if r.get("class") == "SV"))
    return _hbar_chart(labels, values,
                       ["#E45756", "#F58518", "#EECA3B", "#54A24B"],
                       "SV evidence across regions")


def _variant_table_html(variants, stage_of):
    rows = []
    for v, s in sorted(zip(variants, stage_of), key=lambda t: -t[1]):
        if s < 3:
            continue
        rows.append(
            "<tr>"
            f"<td>{_esc(v['variant'])}</td><td>{v['dku']}</td>"
            f"<td>{v['dkt']}</td><td>{v['dka']}</td>"
            f"<td>{v['dka_dkt']:.4f}</td><td>{v['max_pkc_alt']}</td>"
            f"<td>{_esc(v.get('dka_nhf', ''))}</td>"
            f"<td><span style='color:{STAGE_COLORS[s]}'>"
            f"stage {s}</span></td>"
            f"<td>{_esc(v['call'])}</td></tr>")
        if len(rows) >= _VARIANT_TABLE_MAX_ROWS:
            break
    if not rows:
        return "<p>No variants reached stage 3 (DKA_DKT &gt; 0.1).</p>"
    return (
        "<table><thead><tr><th>Variant</th><th>DKU</th><th>DKT</th>"
        "<th>DKA</th><th>DKA_DKT</th><th>MAX_PKC_ALT</th>"
        "<th>DKA_NHF</th><th>Stage</th><th>Call</th></tr></thead>"
        "<tbody>" + "".join(rows) + "</tbody></table>")


_CSS = """
body { font-family: Helvetica, Arial, sans-serif; margin: 0;
       color: #1c2733; background: #f6f8fa; }
header { background: #15304b; color: #fff; padding: 28px 40px; }
header h1 { margin: 0 0 6px 0; font-size: 26px; }
header p { margin: 0; opacity: 0.85; }
main { max-width: 960px; margin: 0 auto; padding: 24px 24px 60px; }
section { background: #fff; border-radius: 10px; padding: 20px 24px;
          margin: 18px 0; box-shadow: 0 1px 3px rgba(20,30,40,.08); }
section h2 { margin-top: 0; font-size: 19px; }
table { border-collapse: collapse; width: 100%; font-size: 13px; }
th, td { border-bottom: 1px solid #e3e8ee; padding: 6px 8px;
         text-align: left; }
th { background: #eef2f6; }
.stat-row { display: flex; gap: 16px; flex-wrap: wrap; }
.stat { flex: 1; min-width: 140px; background: #eef4fb;
        border-radius: 8px; padding: 12px 16px; }
.stat .v { font-size: 26px; font-weight: 700; }
.stat .l { font-size: 12px; color: #4c6172; }
.note { font-size: 12px; color: #667; }
"""


def generate_report(output_path, vcf_metrics_path=None,
                    vcf_summary_path=None, vcf_path=None,
                    discovery_metrics_path=None,
                    discovery_summary_path=None):
    """Write the self-contained HTML report; returns *output_path*."""
    vcf_metrics = _load_metrics(vcf_metrics_path)
    variants = _load_summary_variants(vcf_summary_path)
    counts = _load_summary_counts(vcf_summary_path)
    kraken2_data = _load_vcf_kraken2_annotations(vcf_path)
    if kraken2_data:
        _merge_kraken2_into_variants(variants, kraken2_data)
    disc_metrics = _load_metrics(discovery_metrics_path)
    regions = _load_discovery_regions(discovery_metrics_path)
    dnm_eval = _load_discovery_dnm_evaluation(discovery_metrics_path)
    cand_cmp = _load_discovery_candidate_comparison(discovery_metrics_path)

    sections = []

    if variants or vcf_metrics:
        strat = _compute_stratification(variants)
        stat_tiles = ""
        if counts:
            stat_tiles = (
                '<div class="stat-row">'
                f'<div class="stat"><div class="v">'
                f'{counts.get("total", len(variants))}</div>'
                '<div class="l">candidate variants</div></div>'
                f'<div class="stat"><div class="v">'
                f'{counts.get("likely_dnm", "–")}</div>'
                '<div class="l">likely de novo (DKU &gt; 0)</div></div>'
                f'<div class="stat"><div class="v">'
                f'{counts.get("inherited", "–")}</div>'
                '<div class="l">inherited / unclear</div></div>'
                '</div>')
        sections.append(
            "<section><h2>VCF mode — candidate annotation</h2>"
            + stat_tiles
            + _make_kmer_funnel_chart(vcf_metrics, "vcf")
            + _make_stratification_funnel(strat)
            + "</section>")
        sections.append(
            "<section><h2>Evidence distributions</h2>"
            + _make_dka_dkt_histogram(variants)
            + _make_dka_vs_dkt_scatter(variants)
            + _make_pkc_histogram(variants)
            + _make_pkc_vs_dka_dkt_scatter(variants)
            + _make_nhf_distribution_plot(variants)
            + "</section>")
        sections.append(
            "<section><h2>Cohort breakdowns</h2>"
            + _make_variant_type_breakdown(variants)
            + _make_chromosomal_distribution(variants)
            + "</section>")
        sections.append(
            "<section><h2>Higher-quality de novo candidates "
            "(stage ≥ 3)</h2>"
            + _variant_table_html(variants, strat["stage_of"])
            + "</section>")

    if disc_metrics:
        tiles = (
            '<div class="stat-row">'
            f'<div class="stat"><div class="v">'
            f'{disc_metrics.get("candidate_regions", 0)}</div>'
            '<div class="l">candidate regions</div></div>'
            f'<div class="stat"><div class="v">'
            f'{disc_metrics.get("proband_unique_kmers", 0)}</div>'
            '<div class="l">proband-unique k-mers</div></div>'
            f'<div class="stat"><div class="v">'
            f'{disc_metrics.get("informative_reads", 0)}</div>'
            '<div class="l">informative reads</div></div>'
            '</div>')
        body = (
            "<section><h2>Discovery mode — VCF-free region scan</h2>"
            + tiles
            + _make_kmer_funnel_chart(disc_metrics, "discovery")
            + _make_discovery_region_scatter(regions)
            + _make_discovery_size_histogram(regions)
            + _make_sv_evidence_chart(regions))
        if cand_cmp:
            body += (
                f'<p class="note">High-quality candidate capture: '
                f'{cand_cmp.get("captured", 0)} / '
                f'{cand_cmp.get("hq_candidates", 0)} '
                f'({100 * cand_cmp.get("capture_rate", 0):.1f}%)</p>')
        if dnm_eval:
            body += (
                f'<p class="note">Curated DNM loci detected: '
                f'{dnm_eval.get("detected", 0)} / '
                f'{dnm_eval.get("total_loci", 0)}</p>')
        body += "</section>"
        sections.append(body)

    if not sections:
        sections.append(
            "<section><h2>No input data</h2><p>No metrics or summary "
            "files were provided.</p></section>")

    html_doc = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        "<title>kmer-denovo report</title>"
        f"<style>{_CSS}</style></head><body>"
        "<header><h1>kmer-denovo — De Novo K-mer Filtering "
        "Report</h1>"
        "<p>K-mers present in the child but absent from both parents "
        "signal potential de novo mutations. This report summarises "
        "the filtering cascade and supporting evidence.</p></header>"
        "<main>" + "".join(sections) + "</main></body></html>")
    with open(output_path, "w") as fh:
        fh.write(html_doc)
    logger.info("Report written: %s", output_path)
    return output_path
