"""CLI parser tests: defaults and overrides for all three parsers."""

import pytest

from kmer_denovo_filter_tpu.cli import (
    parse_args,
    parse_discovery_args,
    parse_report_args,
    parse_vcf_args,
)

_BASE = ["--child", "c.bam", "--mother", "m.bam", "--father", "f.bam"]


class TestVcfParser:
    def test_defaults(self):
        args = parse_vcf_args(_BASE + ["--vcf", "v.vcf", "--output",
                                       "o.vcf"])
        assert args.kmer_size == 31
        assert args.min_baseq == 20
        assert args.min_mapq == 20
        assert args.threads == 4
        assert args.proband_id is None
        assert args.kraken2_db is None
        assert args.kraken2_confidence == 0.0
        assert args.kraken2_memory_mapping is False
        assert args.no_expanded_bed is False
        assert args.metrics is None
        assert args.summary is None
        assert args.informative_reads is None
        assert args.memory is None
        assert args.tmp_dir is None
        assert args.report is None

    def test_overrides(self):
        args = parse_vcf_args(_BASE + [
            "--vcf", "v.vcf", "--output", "o.vcf",
            "--kmer-size", "21", "--min-baseq", "10", "--min-mapq", "0",
            "--threads", "8", "--proband-id", "HG002",
            "--kraken2-db", "/db", "--kraken2-confidence", "0.2",
            "--kraken2-memory-mapping", "--no-expanded-bed",
            "--memory", "64",
        ])
        assert args.kmer_size == 21
        assert args.min_baseq == 10
        assert args.min_mapq == 0
        assert args.threads == 8
        assert args.proband_id == "HG002"
        assert args.kraken2_db == "/db"
        assert args.kraken2_confidence == 0.2
        assert args.kraken2_memory_mapping is True
        assert args.no_expanded_bed is True
        assert args.memory == 64.0

    def test_vcf_required(self):
        with pytest.raises(SystemExit):
            parse_vcf_args(_BASE + ["--output", "o.vcf"])


class TestDiscoveryParser:
    def test_defaults(self):
        args = parse_discovery_args(_BASE + ["--out-prefix", "p"])
        assert args.min_child_count == 3
        assert args.cluster_distance == 500
        assert args.min_supporting_reads == 1
        assert args.min_distinct_kmers == 1
        assert args.min_bedgraph_reads == 3
        assert args.min_distinct_kmers_per_read is None
        assert args.parent_max_count == 0
        assert args.sv_bedpe is None
        assert args.ref_jf is None
        assert args.candidate_summary is None

    def test_overrides(self):
        args = parse_discovery_args(_BASE + [
            "--out-prefix", "p", "--min-child-count", "5",
            "--cluster-distance", "1000", "--min-supporting-reads", "3",
            "--min-distinct-kmers", "4", "--min-bedgraph-reads", "2",
            "--min-distinct-kmers-per-read", "6",
            "--parent-max-count", "2", "--sv-bedpe", "x.bedpe",
            "--ref-jf", "ref.jf", "--candidate-summary", "s.txt",
        ])
        assert args.min_child_count == 5
        assert args.cluster_distance == 1000
        assert args.min_supporting_reads == 3
        assert args.min_distinct_kmers == 4
        assert args.min_bedgraph_reads == 2
        assert args.min_distinct_kmers_per_read == 6
        assert args.parent_max_count == 2
        assert args.sv_bedpe == "x.bedpe"
        assert args.ref_jf == "ref.jf"

    def test_out_prefix_required(self):
        with pytest.raises(SystemExit):
            parse_discovery_args(_BASE)


class TestLegacyParser:
    def test_vcf_mode(self):
        args = parse_args(_BASE + ["--vcf", "v.vcf", "--output", "o.vcf"])
        assert args.vcf == "v.vcf"
        assert args.out_prefix is None

    def test_discovery_mode(self):
        args = parse_args(_BASE + ["--out-prefix", "p",
                                   "--ref-fasta", "r.fa"])
        assert args.vcf is None
        assert args.out_prefix == "p"
        assert args.ref_fasta == "r.fa"

    def test_has_both_flag_sets(self):
        args = parse_args(_BASE + ["--vcf", "v", "--output", "o",
                                   "--min-child-count", "7",
                                   "--min-mapq", "13"])
        assert args.min_child_count == 7
        assert args.min_mapq == 13


class TestReportParser:
    def test_defaults(self):
        args = parse_report_args(["--output", "r.html"])
        assert args.output == "r.html"
        assert args.vcf_metrics is None
        assert args.discovery_metrics is None

    def test_all_inputs(self):
        args = parse_report_args([
            "--output", "r.html", "--vcf-metrics", "m.json",
            "--vcf-summary", "s.txt", "--vcf", "a.vcf.gz",
            "--discovery-metrics", "dm.json",
            "--discovery-summary", "ds.txt",
        ])
        assert args.vcf == "a.vcf.gz"
        assert args.discovery_summary == "ds.txt"


def test_module_invocation_shows_help():
    """`python -m kmer_denovo_filter_tpu.cli --help` must work (the
    README's advertised invocation)."""
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, "-m", "kmer_denovo_filter_tpu.cli", "--help"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0
    assert "usage" in out.stdout.lower()
