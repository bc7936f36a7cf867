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


def test_package_module_invocation_shows_help():
    """`python -m kmer_denovo_filter_tpu --help` must work (reference
    src/kmer_denovo_filter/__main__.py:1-3)."""
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, "-m", "kmer_denovo_filter_tpu", "--help"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0
    assert "usage" in out.stdout.lower()


# ── Per-flag matrix (reference tests/test_cli.py coverage model) ───

_VCF_BASE = _BASE + ["--vcf", "v.vcf", "--output", "o.vcf"]
_DISC_BASE = _BASE + ["--ref-fasta", "r.fa", "--out-prefix", "pfx"]

# every VCF-mode flag: (argv fragment, attr, expected parsed value)
_VCF_FLAG_MATRIX = [
    (["--ref-fasta", "g.fa"], "ref_fasta", "g.fa"),
    (["--kmer-size", "25"], "kmer_size", 25),
    (["--min-baseq", "0"], "min_baseq", 0),
    (["--min-mapq", "1"], "min_mapq", 1),
    (["--threads", "16"], "threads", 16),
    (["--memory", "128"], "memory", 128.0),
    (["--debug-kmers"], "debug_kmers", True),
    (["--jf-hash-size", "1G"], "jf_hash_size", "1G"),
    (["--tmp-dir", "/scratch"], "tmp_dir", "/scratch"),
    (["--metrics", "m.json"], "metrics", "m.json"),
    (["--summary", "s.txt"], "summary", "s.txt"),
    (["--informative-reads", "i.bam"], "informative_reads", "i.bam"),
    (["--proband-id", "HG002"], "proband_id", "HG002"),
    (["--kraken2-db", "/db"], "kraken2_db", "/db"),
    (["--kraken2-confidence", "0.4"], "kraken2_confidence", 0.4),
    (["--kraken2-memory-mapping"], "kraken2_memory_mapping", True),
    (["--kraken2-read-detail", "rd.bed"], "kraken2_read_detail",
     "rd.bed"),
    (["--kraken2-span-bed", "sp.bed"], "kraken2_span_bed", "sp.bed"),
    (["--no-expanded-bed"], "no_expanded_bed", True),
    (["--report", "r.html"], "report", "r.html"),
]

_DISC_FLAG_MATRIX = [
    (["--kmer-size", "21"], "kmer_size", 21),
    (["--min-baseq", "30"], "min_baseq", 30),
    (["--threads", "2"], "threads", 2),
    (["--memory", "8"], "memory", 8.0),
    (["--debug-kmers"], "debug_kmers", True),
    (["--jf-hash-size", "500M"], "jf_hash_size", "500M"),
    (["--tmp-dir", "/t"], "tmp_dir", "/t"),
    (["--ref-jf", "ref.jf"], "ref_jf", "ref.jf"),
    (["--min-child-count", "5"], "min_child_count", 5),
    (["--candidate-summary", "c.txt"], "candidate_summary", "c.txt"),
    (["--cluster-distance", "1000"], "cluster_distance", 1000),
    (["--min-supporting-reads", "4"], "min_supporting_reads", 4),
    (["--min-distinct-kmers", "3"], "min_distinct_kmers", 3),
    (["--min-bedgraph-reads", "7"], "min_bedgraph_reads", 7),
    (["--min-distinct-kmers-per-read", "2"],
     "min_distinct_kmers_per_read", 2),
    (["--parent-max-count", "1"], "parent_max_count", 1),
    (["--sv-bedpe", "s.bedpe"], "sv_bedpe", "s.bedpe"),
    (["--save-proband-index"], "save_proband_index", True),
    (["--proband-index", "p.npz"], "proband_index", "p.npz"),
    (["--report", "d.html"], "report", "d.html"),
]

_REPORT_FLAG_MATRIX = [
    (["--vcf-metrics", "m.json"], "vcf_metrics", "m.json"),
    (["--vcf-summary", "s.txt"], "vcf_summary", "s.txt"),
    (["--vcf", "a.vcf.gz"], "vcf", "a.vcf.gz"),
    (["--discovery-metrics", "dm.json"], "discovery_metrics",
     "dm.json"),
    (["--discovery-summary", "ds.txt"], "discovery_summary", "ds.txt"),
]


@pytest.mark.parametrize("argv,attr,expected", _VCF_FLAG_MATRIX)
def test_vcf_flag(argv, attr, expected):
    assert getattr(parse_vcf_args(_VCF_BASE + argv), attr) == expected


@pytest.mark.parametrize("argv,attr,expected", _DISC_FLAG_MATRIX)
def test_discovery_flag(argv, attr, expected):
    assert getattr(parse_discovery_args(_DISC_BASE + argv),
                   attr) == expected


@pytest.mark.parametrize("argv,attr,expected",
                         _VCF_FLAG_MATRIX + _DISC_FLAG_MATRIX)
def test_legacy_combined_flag(argv, attr, expected):
    """The legacy parser accepts the union of both flag sets."""
    assert getattr(
        parse_args(_VCF_BASE + ["--ref-fasta", "r.fa"] + argv
                   if argv[0] != "--ref-fasta"
                   else _VCF_BASE + argv),
        attr) == expected


@pytest.mark.parametrize("argv,attr,expected", _REPORT_FLAG_MATRIX)
def test_report_flag(argv, attr, expected):
    assert getattr(parse_report_args(["--output", "o.html"] + argv),
                   attr) == expected


class TestParserErrors:
    @pytest.mark.parametrize("missing", ["--child", "--mother",
                                         "--father"])
    def test_vcf_trio_required(self, missing):
        argv = [a for pair in zip(_VCF_BASE[::2], _VCF_BASE[1::2])
                for a in pair if pair[0] != missing]
        with pytest.raises(SystemExit):
            parse_vcf_args(argv)

    def test_discovery_ref_fasta_optional_at_parse_time(self):
        # validated later by validate_inputs (needs ref_fasta OR
        # ref_jf), matching the reference parser contract
        args = parse_discovery_args(_BASE + ["--out-prefix", "p"])
        assert args.ref_fasta is None

    def test_discovery_requires_out_prefix(self):
        with pytest.raises(SystemExit):
            parse_discovery_args(_BASE + ["--ref-fasta", "r.fa"])

    def test_report_requires_output(self):
        with pytest.raises(SystemExit):
            parse_report_args(["--vcf-metrics", "m.json"])

    @pytest.mark.parametrize("argv", [
        ["--kmer-size", "abc"],
        ["--threads", "x"],
        ["--kraken2-confidence", "high"],
    ])
    def test_type_errors(self, argv):
        with pytest.raises(SystemExit):
            parse_vcf_args(_VCF_BASE + argv)

    def test_unknown_flag_rejected(self):
        with pytest.raises(SystemExit):
            parse_vcf_args(_VCF_BASE + ["--frobnicate"])


class TestShortOptions:
    def test_output_short_alias(self):
        args = parse_vcf_args(_BASE + ["--vcf", "v.vcf", "-o", "x.vcf"])
        assert args.output == "x.vcf"

    def test_report_output_short_alias(self):
        assert parse_report_args(["-o", "r.html"]).output == "r.html"


def test_vcf_full_default_snapshot():
    """Every VCF-parser attribute and its default, pinned."""
    args = parse_vcf_args(_VCF_BASE)
    assert vars(args) == {
        "child": "c.bam", "mother": "m.bam", "father": "f.bam",
        "vcf": "v.vcf", "output": "o.vcf", "ref_fasta": None,
        "kmer_size": 31, "min_baseq": 20, "min_mapq": 20,
        "threads": 4, "memory": None, "debug_kmers": False,
        "jf_hash_size": None, "tmp_dir": None, "metrics": None,
        "summary": None, "informative_reads": None,
        "proband_id": None, "kraken2_db": None,
        "kraken2_confidence": 0.0, "kraken2_memory_mapping": False,
        "kraken2_read_detail": None, "kraken2_span_bed": None,
        "no_expanded_bed": False, "report": None,
    }


def test_discovery_full_default_snapshot():
    args = parse_discovery_args(_DISC_BASE)
    assert vars(args) == {
        "child": "c.bam", "mother": "m.bam", "father": "f.bam",
        "ref_fasta": "r.fa", "out_prefix": "pfx", "kmer_size": 31,
        "min_baseq": 20, "threads": 4, "memory": None,
        "debug_kmers": False, "jf_hash_size": None, "tmp_dir": None,
        "ref_jf": None, "min_child_count": 3,
        "candidate_summary": None, "cluster_distance": 500,
        "min_supporting_reads": 1, "min_distinct_kmers": 1,
        "min_bedgraph_reads": 3, "min_distinct_kmers_per_read": None,
        "parent_max_count": 0, "sv_bedpe": None,
        "save_proband_index": False, "proband_index": None,
        "report": None,
    }
