"""Report generator tests: loaders, stratification, HTML generation."""

import os

import pytest

from kmer_denovo_filter_tpu.report import (
    _compute_stratification,
    _load_summary_counts,
    _load_summary_variants,
    _stratify_variant,
    generate_report,
)

REF_SUMMARY = "/root/reference/tests/example_output/summary.txt"
REF_METRICS = "/root/reference/tests/example_output/metrics.json"
REF_DISC_METRICS = ("/root/reference/tests/example_output_discovery/"
                    "giab_discovery.metrics.json")


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
        assert "<script" not in text  # fully self-contained, no JS
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
