"""Deep tests for scripts/compare_regions.py.

Mirrors the coverage of reference tests/test_compare_regions.py
(590 LoC): loaders, bucket classification, window expansion, summary
formatting, CLI parsing, main(), and a GIAB end-to-end run against the
shipped golden discovery/VCF outputs.
"""

import importlib.util
import os

import pytest

from kmer_denovo_filter_tpu.htsio.bgzf import BgzfWriter

from tests.conftest import (
    GIAB_DATA_EXISTS,
    REF_EXAMPLE_OUTPUT_DIR,
    REF_EXAMPLE_OUTPUT_DISCOVERY_DIR,
)

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "compare_regions",
        os.path.join(_SCRIPTS, "compare_regions.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def cr():
    return _load_module()


def _write_vcf(path, data_lines, fmt=True, gz=False):
    header = [
        "##fileformat=VCFv4.2",
        "##contig=<ID=chr1,length=100000>",
        "##contig=<ID=chr2,length=100000>",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="GT">',
        '##FORMAT=<ID=DKU,Number=1,Type=Integer,Description="d">',
        '##FORMAT=<ID=DKA,Number=1,Type=Integer,Description="d">',
        '##INFO=<ID=DKU,Number=1,Type=Integer,Description="d">',
        '##INFO=<ID=DKA,Number=1,Type=Integer,Description="d">',
    ]
    cols = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
    if fmt:
        cols += "\tFORMAT\tHG002"
    text = "\n".join(header + [cols] + data_lines) + "\n"
    if gz:
        with BgzfWriter(path) as out:
            out.write(text.encode())
    else:
        with open(path, "w") as fh:
            fh.write(text)


def _region(start, end, **kw):
    base = {"start": start, "end": end, "reads": 1, "unique_kmers": 1,
            "split_reads": 0, "discordant_pairs": 0, "max_clip_len": 0,
            "unmapped_mates": 0, "class": "SMALL"}
    base.update(kw)
    return base


def _variant(chrom, pos1, ref="A", alt="T", dku=1, dka=1):
    return {"chrom": chrom, "pos0": pos1 - 1, "pos1": pos1, "ref": ref,
            "alt": alt, "dku": dku, "dka": dka}


class TestLoadBedgraph:
    def test_basic_load(self, cr, tmp_path):
        p = tmp_path / "a.bedgraph"
        p.write_text("chr1\t10\t20\t5\nchr1\t20\t30\t2\nchr2\t0\t9\t1\n")
        got = cr.load_bedgraph(str(p))
        assert got == {"chr1": [(10, 20, 5), (20, 30, 2)],
                       "chr2": [(0, 9, 1)]}

    def test_empty_file(self, cr, tmp_path):
        p = tmp_path / "a.bedgraph"
        p.write_text("")
        assert cr.load_bedgraph(str(p)) == {}

    def test_comments_and_track_lines_skipped(self, cr, tmp_path):
        p = tmp_path / "a.bedgraph"
        p.write_text("# a comment\n"
                     "track type=bedGraph name=kmers\n"
                     "\n"
                     "chr1\t1\t2\t3\n")
        assert cr.load_bedgraph(str(p)) == {"chr1": [(1, 2, 3)]}


class TestLoadDiscoveryBed:
    def test_basic_load(self, cr, tmp_path):
        p = tmp_path / "a.bed"
        p.write_text("chr1\t100\t200\t7\t31\t2\t1\t12\t3\tSV\n")
        got = cr.load_discovery_bed(str(p))
        r = got["chr1"][0]
        assert (r["start"], r["end"]) == (100, 200)
        assert r["reads"] == 7
        assert r["unique_kmers"] == 31
        assert r["split_reads"] == 2
        assert r["discordant_pairs"] == 1
        assert r["max_clip_len"] == 12
        assert r["unmapped_mates"] == 3
        assert r["class"] == "SV"

    def test_empty_file(self, cr, tmp_path):
        p = tmp_path / "a.bed"
        p.write_text("")
        assert cr.load_discovery_bed(str(p)) == {}

    def test_comment_lines_skipped(self, cr, tmp_path):
        p = tmp_path / "a.bed"
        p.write_text("#filters: min_supporting_reads=2\n"
                     "#chrom\tstart\tend\n"
                     "chr3\t5\t9\n")
        got = cr.load_discovery_bed(str(p))
        assert list(got) == ["chr3"]

    def test_short_rows_get_defaults(self, cr, tmp_path):
        p = tmp_path / "a.bed"
        p.write_text("chr1\t1\t2\nchr1\t3\t4\t9\n")
        got = cr.load_discovery_bed(str(p))
        assert got["chr1"][0]["reads"] == 0
        assert got["chr1"][0]["class"] == "UNKNOWN"
        assert got["chr1"][1]["reads"] == 9
        assert got["chr1"][1]["unique_kmers"] == 0

    def test_non_numeric_stat_defaults_to_zero(self, cr, tmp_path):
        p = tmp_path / "a.bed"
        p.write_text("chr1\t1\t2\tNA\t.\t0\t0\t0\t0\tSMALL\n")
        r = cr.load_discovery_bed(str(p))["chr1"][0]
        assert r["reads"] == 0
        assert r["unique_kmers"] == 0
        assert r["class"] == "SMALL"


class TestLoadVcfVariants:
    def test_format_fields_preferred(self, cr, tmp_path):
        p = tmp_path / "a.vcf"
        _write_vcf(str(p), [
            "chr1\t101\t.\tA\tT\t.\tPASS\t.\tGT:DKU:DKA\t0/1:5:7",
        ])
        (v,) = cr.load_vcf_variants(str(p))
        assert (v["chrom"], v["pos1"], v["pos0"]) == ("chr1", 101, 100)
        assert (v["ref"], v["alt"]) == ("A", "T")
        assert (v["dku"], v["dka"]) == (5, 7)

    def test_info_fallback_without_samples(self, cr, tmp_path):
        p = tmp_path / "a.vcf"
        _write_vcf(str(p), [
            "chr1\t50\t.\tG\tC\t.\tPASS\tDKU=2;DKA=3",
        ], fmt=False)
        (v,) = cr.load_vcf_variants(str(p))
        assert (v["dku"], v["dka"]) == (2, 3)

    def test_multiallelic_alt_joined(self, cr, tmp_path):
        p = tmp_path / "a.vcf"
        _write_vcf(str(p), [
            "chr2\t9\t.\tA\tT,G\t.\tPASS\t.\tGT:DKU:DKA\t1/2:0:0",
        ])
        (v,) = cr.load_vcf_variants(str(p))
        assert v["alt"] == "T,G"

    def test_bgzipped_vcf(self, cr, tmp_path):
        p = tmp_path / "a.vcf.gz"
        _write_vcf(str(p), [
            "chr1\t101\t.\tA\tT\t.\tPASS\t.\tGT:DKU:DKA\t0/1:4:6",
        ], gz=True)
        (v,) = cr.load_vcf_variants(str(p))
        assert (v["dku"], v["dka"]) == (4, 6)

    def test_empty_vcf(self, cr, tmp_path):
        p = tmp_path / "a.vcf"
        _write_vcf(str(p), [])
        assert cr.load_vcf_variants(str(p)) == []

    def test_missing_dk_fields_none(self, cr, tmp_path):
        p = tmp_path / "a.vcf"
        _write_vcf(str(p), [
            "chr1\t101\t.\tA\tT\t.\tPASS\t.\tGT\t0/1",
        ])
        (v,) = cr.load_vcf_variants(str(p))
        assert v["dku"] is None and v["dka"] is None


class TestCompare:
    def test_concordant(self, cr):
        result = cr.compare(
            bedgraph={"chr1": [(95, 110, 4)]},
            discovery={"chr1": [_region(90, 120)]},
            variants=[_variant("chr1", 101)])
        assert len(result["concordant"]) == 1
        assert result["vcf_only"] == []
        assert result["no_signal"] == []
        assert result["discovery_only"] == []

    def test_vcf_only(self, cr):
        """Signal at the locus but no overlapping region."""
        result = cr.compare(
            bedgraph={"chr1": [(95, 110, 4)]},
            discovery={"chr1": [_region(500, 600)]},
            variants=[_variant("chr1", 101)])
        assert len(result["vcf_only"]) == 1
        assert len(result["discovery_only"]) == 1

    def test_no_signal(self, cr):
        result = cr.compare(
            bedgraph={"chr1": [(5000, 5100, 4)]},
            discovery={},
            variants=[_variant("chr1", 101)])
        (item,) = result["no_signal"]
        assert item["has_discovery"] is False

    def test_no_signal_with_region_keeps_region_list(self, cr):
        """A region without bedGraph signal still attaches to NO_SIGNAL."""
        result = cr.compare(
            bedgraph={},
            discovery={"chr1": [_region(90, 120)]},
            variants=[_variant("chr1", 101)])
        (item,) = result["no_signal"]
        assert item["has_discovery"] is True
        assert item["discovery_regions"][0]["start"] == 90
        # overlapped regions still count as covered, not discovery-only
        assert result["discovery_only"] == []

    def test_discovery_only(self, cr):
        result = cr.compare(
            bedgraph={}, discovery={"chr2": [_region(10, 20)]},
            variants=[])
        (item,) = result["discovery_only"]
        assert (item["chrom"], item["start"], item["end"]) == (
            "chr2", 10, 20)

    def test_zero_count_bedgraph_rows_are_not_signal(self, cr):
        result = cr.compare(
            bedgraph={"chr1": [(95, 110, 0)]},
            discovery={}, variants=[_variant("chr1", 101)])
        assert len(result["no_signal"]) == 1

    def test_window_expands_overlap(self, cr):
        bedgraph = {"chr1": [(150, 160, 3)]}
        discovery = {"chr1": [_region(150, 160)]}
        variants = [_variant("chr1", 120)]
        exact = cr.compare(bedgraph, discovery, variants, window=0)
        assert len(exact["no_signal"]) == 1
        wide = cr.compare(bedgraph, discovery, variants, window=50)
        assert len(wide["concordant"]) == 1
        # window applies only to the variant→region direction;
        # DISCOVERY_ONLY still uses containment of the exact position
        assert len(wide["discovery_only"]) == 1

    def test_chromosome_mismatch_never_matches(self, cr):
        result = cr.compare(
            bedgraph={"chr2": [(95, 110, 4)]},
            discovery={"chr2": [_region(90, 120)]},
            variants=[_variant("chr1", 101)])
        assert len(result["no_signal"]) == 1
        assert len(result["discovery_only"]) == 1

    def test_empty_inputs(self, cr):
        result = cr.compare({}, {}, [])
        assert all(result[k] == [] for k in result)

    def test_multiple_variants_and_regions(self, cr):
        bedgraph = {"chr1": [(100, 200, 2), (300, 400, 1)],
                    "chr2": [(50, 60, 9)]}
        discovery = {"chr1": [_region(100, 200), _region(900, 950)],
                     "chr2": [_region(40, 70)]}
        variants = [
            _variant("chr1", 150),   # concordant
            _variant("chr1", 350),   # vcf_only (signal, no region)
            _variant("chr1", 700),   # no_signal
            _variant("chr2", 55),    # concordant
        ]
        result = cr.compare(bedgraph, discovery, variants)
        assert len(result["concordant"]) == 2
        assert len(result["vcf_only"]) == 1
        assert len(result["no_signal"]) == 1
        assert len(result["discovery_only"]) == 1
        assert result["discovery_only"][0]["start"] == 900

    def test_variant_on_region_boundary(self, cr):
        """Region end is exclusive; start is inclusive."""
        discovery = {"chr1": [_region(100, 200)]}
        bedgraph = {"chr1": [(0, 1000, 1)]}
        at_start = cr.compare(bedgraph, discovery,
                              [_variant("chr1", 101)])  # pos0=100
        assert len(at_start["concordant"]) == 1
        at_end = cr.compare(bedgraph, discovery,
                            [_variant("chr1", 201)])  # pos0=200
        assert len(at_end["vcf_only"]) == 1


class TestFormatSummary:
    @pytest.fixture()
    def result(self, cr):
        return cr.compare(
            bedgraph={"chr1": [(95, 110, 4)]},
            discovery={"chr1": [_region(90, 120, reads=7,
                                        unique_kmers=31, split_reads=2,
                                        **{"class": "SV"})],
                       "chr2": [_region(10, 40)]},
            variants=[_variant("chr1", 101, ref="A", alt="TTG",
                               dku=5, dka=9),
                      _variant("chr1", 5000, dku=0, dka=0)])

    def test_section_headers_present(self, cr, result):
        text = cr.format_summary(result)
        assert "CONCORDANT  (1 variants)" in text
        assert "VCF_ONLY  (0 variants)" in text
        assert "NO_SIGNAL  (1 variants)" in text
        assert "DISCOVERY_ONLY  (1 regions)" in text

    def test_concordant_variant_appears(self, cr, result):
        text = cr.format_summary(result)
        assert "chr1:101 A>TTG" in text
        assert "DKU=5" in text and "DKA=9" in text
        assert "region=chr1:90-120" in text
        assert "reads=7" in text
        assert "unique_kmers=31" in text
        assert "split_reads=2" in text
        assert "class=SV" in text

    def test_discovery_only_region_appears(self, cr, result):
        text = cr.format_summary(result)
        assert "chr2:10-40  (30 bp)" in text

    def test_window_annotation(self, cr, result):
        exact = cr.format_summary(result, window=0)
        assert "Search window: exact position overlap" in exact
        wide = cr.format_summary(result, window=25)
        assert "Search window: ±25 bp around each VCF position" in wide

    def test_counts_in_summary(self, cr, result):
        text = cr.format_summary(result)
        assert "Total VCF variants:            2" in text
        assert "Concordant (signal + region):  1" in text
        assert "VCF-only (signal, no region):  0" in text
        assert "No k-mer signal:               1" in text
        assert "Discovery-only regions:        1" in text

    def test_empty_sections_say_none(self, cr):
        text = cr.format_summary(cr.compare({}, {}, []))
        assert text.count("(none)") == 4


class TestParseArgs:
    REQUIRED = ["--bedgraph", "b.bedgraph", "--discovery", "d.bed",
                "--vcf", "v.vcf"]

    def test_required_args(self, cr):
        with pytest.raises(SystemExit):
            cr.parse_args(["--bedgraph", "x"])

    def test_defaults(self, cr):
        args = cr.parse_args(self.REQUIRED)
        assert args.output is None
        assert args.window == 0

    def test_output_flag(self, cr):
        args = cr.parse_args(self.REQUIRED + ["--output", "out.txt"])
        assert args.output == "out.txt"

    def test_window_flag(self, cr):
        args = cr.parse_args(self.REQUIRED + ["--window", "100"])
        assert args.window == 100

    def test_short_flags(self, cr):
        args = cr.parse_args(["-b", "b", "-d", "d", "-v", "v",
                              "-o", "o", "-w", "9"])
        assert (args.bedgraph, args.discovery, args.vcf) == (
            "b", "d", "v")
        assert args.output == "o" and args.window == 9


class TestMain:
    def _inputs(self, cr, tmp_path):
        bg = tmp_path / "x.bedgraph"
        bg.write_text("chr1\t95\t110\t4\n")
        bed = tmp_path / "x.bed"
        bed.write_text("chr1\t90\t120\t7\t31\t0\t0\t0\t0\tSMALL\n")
        vcf = tmp_path / "x.vcf"
        _write_vcf(str(vcf), [
            "chr1\t101\t.\tA\tT\t.\tPASS\t.\tGT:DKU:DKA\t0/1:5:9",
        ])
        return ["-b", str(bg), "-d", str(bed), "-v", str(vcf)]

    def test_main_runs_and_writes_output(self, cr, tmp_path, capsys):
        out = tmp_path / "summary.txt"
        cr.main(self._inputs(cr, tmp_path) + ["-o", str(out)])
        text = out.read_text()
        assert "CONCORDANT  (1 variants)" in text
        assert text.endswith("\n")
        # stdout gets the same summary
        assert "CONCORDANT  (1 variants)" in capsys.readouterr().out

    def test_main_no_output_file(self, cr, tmp_path, capsys):
        cr.main(self._inputs(cr, tmp_path))
        assert "Summary" in capsys.readouterr().out


@pytest.mark.skipif(not GIAB_DATA_EXISTS, reason="GIAB data not found")
class TestGiabIntegration:
    """Run the comparison over the shipped reference goldens."""

    @pytest.fixture(scope="class")
    def giab_result(self, cr):
        bg = os.path.join(REF_EXAMPLE_OUTPUT_DISCOVERY_DIR,
                          "giab_discovery.kmer_coverage.bedgraph")
        bed = os.path.join(REF_EXAMPLE_OUTPUT_DISCOVERY_DIR,
                           "giab_discovery.bed")
        vcf = os.path.join(REF_EXAMPLE_OUTPUT_DIR, "annotated.vcf.gz")
        bedgraph = cr.load_bedgraph(bg)
        discovery = cr.load_discovery_bed(bed)
        variants = cr.load_vcf_variants(vcf)
        return cr.compare(bedgraph, discovery, variants), variants

    def test_giab_compare_produces_results(self, cr, giab_result):
        result, variants = giab_result
        assert len(variants) == 22
        total = (len(result["concordant"]) + len(result["vcf_only"])
                 + len(result["no_signal"]))
        assert total == 22
        assert len(result["concordant"]) >= 1

    def test_giab_summary_format(self, cr, giab_result):
        result, _ = giab_result
        text = cr.format_summary(result)
        assert text.splitlines()[0] == "=" * 60
        assert "Total VCF variants:            22" in text

    def test_giab_main_writes_output(self, cr, tmp_path):
        out = tmp_path / "giab_summary.txt"
        cr.main([
            "-b", os.path.join(REF_EXAMPLE_OUTPUT_DISCOVERY_DIR,
                               "giab_discovery.kmer_coverage.bedgraph"),
            "-d", os.path.join(REF_EXAMPLE_OUTPUT_DISCOVERY_DIR,
                               "giab_discovery.bed"),
            "-v", os.path.join(REF_EXAMPLE_OUTPUT_DIR,
                               "annotated.vcf.gz"),
            "-o", str(out), "-w", "50",
        ])
        assert "±50 bp" in out.read_text()
