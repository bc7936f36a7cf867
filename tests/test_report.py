"""Report generator tests: loaders, stratification, HTML generation."""

import os

import pytest

from kmer_denovo_filter_tpu import report

from kmer_denovo_filter_tpu.report import (
    _compute_stratification,
    _load_summary_counts,
    _load_summary_variants,
    _stratify_variant,
    generate_report,
)

from tests.conftest import (REF_EXAMPLE_OUTPUT_DIR,
                            REF_EXAMPLE_OUTPUT_DISCOVERY_DIR)

REF_SUMMARY = os.path.join(REF_EXAMPLE_OUTPUT_DIR, "summary.txt")
REF_METRICS = os.path.join(REF_EXAMPLE_OUTPUT_DIR, "metrics.json")
REF_DISC_METRICS = os.path.join(
    REF_EXAMPLE_OUTPUT_DISCOVERY_DIR, "giab_discovery.metrics.json")


def _v(dka=0, dka_dkt=0.0, max_pkc_alt=0, dka_nhf=None, **kw):
    v = {"dka": dka, "dka_dkt": dka_dkt, "max_pkc_alt": max_pkc_alt,
         "dku": 0, "dkt": 1, "call": "inherited"}
    if dka_nhf is not None:
        v["dka_nhf"] = dka_nhf
    v.update(kw)
    return v


class TestStratification:
    def test_cascade_stages(self):
        assert _stratify_variant(_v(dka=0)) == 0
        assert _stratify_variant(_v(dka=1)) == 1
        assert _stratify_variant(_v(dka=5, dka_dkt=0.05)) == 2
        assert _stratify_variant(_v(dka=5, dka_dkt=0.2,
                                    max_pkc_alt=3)) == 3
        assert _stratify_variant(_v(dka=5, dka_dkt=0.2,
                                    max_pkc_alt=0)) == 4
        assert _stratify_variant(
            _v(dka=5, dka_dkt=0.2, max_pkc_alt=0, dka_nhf=0.2),
            has_nhf_data=True) == 4
        assert _stratify_variant(
            _v(dka=5, dka_dkt=0.2, max_pkc_alt=0, dka_nhf=0.01),
            has_nhf_data=True) == 5

    def test_survivors_monotonic(self):
        variants = [_v(dka=d, dka_dkt=r, max_pkc_alt=m)
                    for d in (0, 1, 6) for r in (0.0, 0.2)
                    for m in (0, 2)]
        s = _compute_stratification(variants)
        surv = s["surviving"]
        assert surv[0] == len(variants)
        assert all(a >= b for a, b in zip(surv, surv[1:]))


@pytest.mark.skipif(not os.path.exists(REF_SUMMARY),
                    reason="reference goldens unavailable")
class TestLoaders:
    def test_load_summary_variants(self):
        variants = _load_summary_variants(REF_SUMMARY)
        assert len(variants) == 22
        v = next(x for x in variants if "55003995" in x["variant"])
        assert v["dku"] == 21
        assert v["dka_dkt"] == 0.4565
        assert v["call"] == "DE_NOVO"

    def test_load_summary_counts(self):
        counts = _load_summary_counts(REF_SUMMARY)
        assert counts == {"total": 22, "likely_dnm": 12,
                          "inherited": 10}


@pytest.mark.skipif(not os.path.exists(REF_SUMMARY),
                    reason="reference goldens unavailable")
class TestGeneration:
    def test_vcf_mode_report(self, tmp_path):
        out = str(tmp_path / "r.html")
        generate_report(out, vcf_metrics_path=REF_METRICS,
                        vcf_summary_path=REF_SUMMARY)
        text = open(out).read()
        assert text.startswith("<!DOCTYPE html>")
        # self-contained: only the inline zoom/pan script, no external
        # script/fetch of any kind
        assert "<script src" not in text
        assert "<script>" in text  # inline zoom/pan interactivity
        assert "scroll to zoom" in text
        assert text.count("<svg") >= 6
        assert "filtering cascade" in text
        assert "chr11:55003995" in text  # HQ table row

    def test_discovery_report(self, tmp_path):
        out = str(tmp_path / "d.html")
        generate_report(out, discovery_metrics_path=REF_DISC_METRICS)
        text = open(out).read()
        assert "Discovery mode" in text
        assert "candidate regions" in text
        assert "Curated DNM loci detected: 5 / 7" in text

    def test_combined_report_idempotent(self, tmp_path):
        out = str(tmp_path / "c.html")
        generate_report(out, vcf_metrics_path=REF_METRICS,
                        vcf_summary_path=REF_SUMMARY,
                        discovery_metrics_path=REF_DISC_METRICS)
        first = open(out).read()
        generate_report(out, vcf_metrics_path=REF_METRICS,
                        vcf_summary_path=REF_SUMMARY,
                        discovery_metrics_path=REF_DISC_METRICS)
        assert open(out).read() == first

    def test_empty_inputs(self, tmp_path):
        out = str(tmp_path / "e.html")
        generate_report(out)
        assert "No input data" in open(out).read()


@pytest.mark.skipif(not os.path.exists(REF_SUMMARY),
                    reason="reference goldens unavailable")
def test_report_cli_entry(tmp_path, capsys):
    from kmer_denovo_filter_tpu.cli import report_main
    out = str(tmp_path / "cli.html")
    report_main(["--output", out, "--vcf-metrics", REF_METRICS,
                 "--vcf-summary", REF_SUMMARY])
    assert os.path.exists(out)
    assert "Report written to" in capsys.readouterr().out


def _fake_variants(n, denovo_every=5):
    """Synthetic variant rows covering all stratification stages."""
    out = []
    for i in range(n):
        dn = i % denovo_every == 0
        out.append({
            "variant": f"chr1:{1000 + i} A>T",
            "chrom": "chr1",
            "label": "A>T",
            "dku": 3 if dn else 0,
            "dkt": 20,
            "dka": 8 if dn else i % 3,
            "dku_dkt": 0.15 if dn else 0.0,
            "dka_dkt": 0.4 if dn else 0.01 * (i % 4),
            "max_pkc": i % 40,
            "avg_pkc": float(i % 17),
            "min_pkc": 0,
            "max_pkc_alt": 0 if dn else 12,
            "avg_pkc_alt": 0.0 if dn else 9.5,
            "min_pkc_alt": 0 if dn else 7,
            "call": "DE_NOVO" if dn else "INHERITED",
        })
    return out


class TestDownsampling:
    """Heavy-dataset guards (reference tests/test_report.py:469–620)."""

    def test_no_downsampling_below_cap(self):
        from kmer_denovo_filter_tpu.report import _downsample_variants
        vs = _fake_variants(50)
        out, trimmed = _downsample_variants(vs, 2000)
        assert out is vs and not trimmed

    def test_downsampling_keeps_all_denovo(self):
        from kmer_denovo_filter_tpu.report import (
            SCATTER_MAX_POINTS, _downsample_variants)
        vs = _fake_variants(3 * SCATTER_MAX_POINTS, denovo_every=10)
        out, trimmed = _downsample_variants(vs, SCATTER_MAX_POINTS)
        assert trimmed
        assert len(out) <= SCATTER_MAX_POINTS
        n_dn = sum(1 for v in vs if v["call"] == "DE_NOVO")
        assert sum(1 for v in out if v["call"] == "DE_NOVO") == n_dn

    def test_downsampling_all_denovo_truncates(self):
        from kmer_denovo_filter_tpu.report import _downsample_variants
        vs = _fake_variants(100, denovo_every=1)
        out, trimmed = _downsample_variants(vs, 40)
        assert trimmed and len(out) == 40

    def test_scatter_notes_downsampling(self):
        from kmer_denovo_filter_tpu.report import (
            SCATTER_MAX_POINTS, _make_dka_vs_dkt_scatter)
        vs = _fake_variants(SCATTER_MAX_POINTS + 500)
        svg = _make_dka_vs_dkt_scatter(vs)
        assert "showing" in svg
        # point count bounded by the cap
        assert svg.count("<circle") <= SCATTER_MAX_POINTS


class TestEvidenceHeatmap:
    def test_individual_mode_below_cap(self):
        from kmer_denovo_filter_tpu.report import (
            _make_evidence_heatmap)
        svg = _make_evidence_heatmap(_fake_variants(20))
        assert "z-scores per metric" in svg
        assert svg.count("<rect") == 20 * 8

    def test_cluster_mode_above_cap(self):
        from kmer_denovo_filter_tpu.report import (
            HEATMAP_MAX_ROWS, HEATMAP_N_CLUSTERS, _make_evidence_heatmap)
        vs = _fake_variants(HEATMAP_MAX_ROWS + 50)
        svg = _make_evidence_heatmap(vs)
        assert "cluster summary" in svg
        # at most k cluster rows
        assert svg.count("<rect") <= HEATMAP_N_CLUSTERS * 8
        assert "% de novo" in svg

    def test_kmeans_deterministic(self):
        from kmer_denovo_filter_tpu.report import _kmeans_cluster
        z = [[float(i % 7), float(i % 3)] for i in range(300)]
        assert _kmeans_cluster(z, 8) == _kmeans_cluster(z, 8)

    def test_cluster_mode_report_is_idempotent(self, tmp_path):
        """k-means mode must not break byte-reproducibility."""
        from kmer_denovo_filter_tpu.report import (
            HEATMAP_MAX_ROWS, _make_evidence_heatmap)
        vs = _fake_variants(HEATMAP_MAX_ROWS + 123)
        assert _make_evidence_heatmap(vs) == _make_evidence_heatmap(
            _fake_variants(HEATMAP_MAX_ROWS + 123))


class TestNewFigures:
    def test_stratification_sankey(self):
        from kmer_denovo_filter_tpu.report import (
            _compute_stratification, _make_stratification_sankey)
        vs = _fake_variants(60)
        strat = _compute_stratification(vs)
        svg = _make_stratification_sankey(strat)
        assert "stratification stages" in svg
        assert "Filtered: DKA = 0" in svg
        assert svg.count("<path") == 2 * (strat["n_stages"] - 1)

    def test_kmer_sankey_modes(self):
        from kmer_denovo_filter_tpu.report import _make_kmer_sankey
        vcf = _make_kmer_sankey(
            {"total_child_kmers": 100, "parent_found_kmers": 80,
             "child_unique_kmers": 20}, "vcf")
        assert "Child-unique (20)" in vcf
        disc = _make_kmer_sankey(
            {"child_candidate_kmers": 500, "non_ref_kmers": 50,
             "proband_unique_kmers": 5}, "discovery")
        assert "Proband-unique (5)" in disc
        assert "Reference k-mers (450)" in disc

    def test_pkc_boxplot(self):
        from kmer_denovo_filter_tpu.report import _make_pkc_boxplot
        svg = _make_pkc_boxplot(_fake_variants(40))
        assert "MAX_PKC_ALT" in svg and "call type" in svg

    def test_threshold_sensitivity(self):
        from kmer_denovo_filter_tpu.report import (
            _make_threshold_sensitivity)
        svg = _make_threshold_sensitivity(_fake_variants(30))
        assert "threshold sensitivity" in svg
        assert "polyline" in svg

    def test_contamination_figures(self):
        from kmer_denovo_filter_tpu.report import (
            _compute_stratification, _make_contamination_bar,
            _make_contamination_funnel)
        vs = _fake_variants(30)
        for v in vs[:10]:
            v["dka_nhf"] = 0.4
            v["dka_hlf"] = 0.5
            v["dka_ucf"] = 0.05
            v["dka_uf"] = 0.05
        strat = _compute_stratification(vs)
        bar = _make_contamination_bar(vs)
        assert "putative contamination" in bar
        funnel = _make_contamination_funnel(strat, vs)
        assert "Contamination prevalence" in funnel

    def test_contamination_absent_without_nhf(self):
        from kmer_denovo_filter_tpu.report import (
            _compute_stratification, _make_contamination_bar,
            _make_contamination_funnel)
        vs = _fake_variants(30)
        strat = _compute_stratification(vs)
        assert _make_contamination_bar(vs) == ""
        assert _make_contamination_funnel(strat, vs) == ""


def test_full_report_self_contained_large(tmp_path):
    """Large synthetic dataset: report renders every figure, stays
    self-contained (no scripts, no external fetches) and bounded in
    size (cluster-summary + scatter caps engaged)."""
    import json
    from kmer_denovo_filter_tpu.report import generate_report

    vs = _fake_variants(5000)
    summary = tmp_path / "summary.txt"
    header = (f"{'Variant':<24} {'Label':<10} {'DKU':>5} {'DKT':>5} "
              f"{'DKA':>5} {'DKU_DKT':>8} {'DKA_DKT':>8} "
              f"{'MAX_PKC':>8} {'AVG_PKC':>8} {'MIN_PKC':>8} "
              f"{'MAX_PKC_ALT':>12} {'AVG_PKC_ALT':>12} "
              f"{'MIN_PKC_ALT':>12} {'Call':<10}")
    lines = ["Per-Variant Results", "", header, "-" * len(header)]
    for v in vs:
        lines.append(
            f"{v['chrom']}:{v['variant'].split(':')[1].split(' ')[0]:<18} "
            f"{v['label']:<10} {v['dku']:>5} {v['dkt']:>5} {v['dka']:>5} "
            f"{v['dku_dkt']:>8.4f} {v['dka_dkt']:>8.4f} "
            f"{v['max_pkc']:>8} {v['avg_pkc']:>8.2f} {v['min_pkc']:>8} "
            f"{v['max_pkc_alt']:>12} {v['avg_pkc_alt']:>12.2f} "
            f"{v['min_pkc_alt']:>12} "
            f"{v['call']:<10}")
    summary.write_text("\n".join(lines) + "\n\n")
    metrics = tmp_path / "metrics.json"
    metrics.write_text(json.dumps({
        "total_child_kmers": 100000, "parent_found_kmers": 90000,
        "child_unique_kmers": 10000}))
    out = str(tmp_path / "big.html")
    generate_report(out, vcf_metrics_path=str(metrics),
                    vcf_summary_path=str(summary))
    text = open(out).read()
    assert "<script src" not in text  # inline zoom/pan JS only
    # no external fetches (the SVG xmlns URI is not a fetch)
    assert 'src="http' not in text and 'href="http' not in text
    assert "@import" not in text
    assert "cluster summary" in text
    assert len(text) < 3_000_000


class TestStratifyVariantStages:
    """Per-stage semantics of the six-stage cascade (mirrors reference
    tests/test_report.py:642–747)."""

    def _v(self, **kw):
        base = {"dka": 0, "dka_dkt": 0.0, "max_pkc_alt": 0.0}
        base.update(kw)
        return base

    def test_stage_0_putative_only(self):
        assert report._stratify_variant(self._v(dka=0), True) == 0

    def test_stage_1_kmer_dnm(self):
        assert report._stratify_variant(self._v(dka=3), True) == 1

    def test_stage_2_dka_ge_5(self):
        v = self._v(dka=7, dka_dkt=0.05)
        assert report._stratify_variant(v, True) == 2

    def test_stage_3_higher_quality(self):
        v = self._v(dka=7, dka_dkt=0.5, max_pkc_alt=2)
        assert report._stratify_variant(v, True) == 3

    def test_stage_4_parental_confirmed(self):
        v = self._v(dka=7, dka_dkt=0.5, max_pkc_alt=0, dka_nhf=0.5)
        assert report._stratify_variant(v, True) == 4

    def test_stage_5_requires_low_nhf(self):
        v = self._v(dka=7, dka_dkt=0.5, max_pkc_alt=0, dka_nhf=0.01)
        assert report._stratify_variant(v, True) == 5

    def test_stage_5_missing_nhf_when_cohort_has_data(self):
        v = self._v(dka=7, dka_dkt=0.5, max_pkc_alt=0)
        assert report._stratify_variant(v, True) == 4

    def test_no_nhf_cohort_caps_at_stage_4(self):
        v = self._v(dka=7, dka_dkt=0.5, max_pkc_alt=0, dka_nhf=0.01)
        assert report._stratify_variant(v, False) == 4

    def test_thresholds_exported(self):
        assert report.DKA_THRESHOLD == 0
        assert report.DKA_STRONG_THRESHOLD == 5
        assert report.DKA_DKT_THRESHOLD == 0.1
        assert report.MAX_PKC_ALT_THRESHOLD == 1
        assert report.NHF_THRESHOLD == 0.05


class TestClassifyVariantType:
    def test_snv(self):
        assert report._classify_variant_type("A>T") == "SNV"

    def test_insertion(self):
        assert report._classify_variant_type("A>ACGT") == "insertion"

    def test_deletion(self):
        assert report._classify_variant_type("ACGT>A") == "deletion"

    def test_mnv(self):
        assert report._classify_variant_type("AC>GT") == "MNV"

    def test_malformed_label_is_other(self):
        assert report._classify_variant_type("sv:DEL") == "other"
        assert report._classify_variant_type("") == "other"


class TestReportRobustness:
    def test_nonexistent_input_paths_handled(self, tmp_path):
        out = str(tmp_path / "r.html")
        report.generate_report(
            out,
            vcf_metrics_path=str(tmp_path / "missing.json"),
            vcf_summary_path=str(tmp_path / "missing.txt"),
            discovery_metrics_path=str(tmp_path / "also_missing.json"))
        html = open(out).read()
        assert "<html" in html and "</html>" in html

    def test_variant_table_row_cap(self, tmp_path):
        lines = [
            "Per-Variant Results",
            "-" * 120,
            "  Variant                          DKU   DKT   DKA  "
            "DKU_DKT  DKA_DKT  MAX_PKC  AVG_PKC  MIN_PKC  "
            "MAX_PKC_ALT  AVG_PKC_ALT  MIN_PKC_ALT  Call",
            "  -------                          ---   ---   ---  "
            "-------  -------  -------  -------  -------  "
            "-----------  -----------  -----------  ----",
        ]
        n = report._VARIANT_TABLE_MAX_ROWS + 57
        for i in range(n):
            lines.append(
                f"  chr1:{1000 + i} A>T                  5    10"
                f"     {5 + i % 7}   0.5000   0.5000       10"
                f"    10.00        1            0         0.00"
                f"            0  DE_NOVO")
        summary = tmp_path / "summary.txt"
        summary.write_text("\n".join(lines) + "\n")
        variants = report._load_summary_variants(str(summary))
        assert len(variants) == n  # the loader keeps everything
        out = str(tmp_path / "r.html")
        report.generate_report(out, vcf_summary_path=str(summary))
        html = open(out).read()
        assert "chr1:1000" in html
        # the per-variant table body is capped
        beyond = f"chr1:{1000 + report._VARIANT_TABLE_MAX_ROWS + 20}"
        assert beyond not in html or html.count("<tr") <= (
            report._VARIANT_TABLE_MAX_ROWS + 40)
