"""Tests for the trio-pipeline helper scripts (no external binaries)."""

import gzip
import importlib.util
import os

from tests.helpers import create_bam, create_vcf

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestIdentifyPutativeDenovos:
    def test_child_private_selection(self, tmp_path):
        ipd = _load("identify_putative_denovos")
        child = str(tmp_path / "child.vcf.gz")
        father = str(tmp_path / "father.vcf.gz")
        mother = str(tmp_path / "mother.vcf.gz")
        create_vcf(child, "chr1",
                   [(10, "A", "T"), (50, "C", "G"), (90, "G", "A")])
        create_vcf(father, "chr1", [(50, "C", "G")])
        create_vcf(mother, "chr1", [(90, "G", "A")])
        out = str(tmp_path / "cand.vcf.gz")
        n = ipd.identify(child, father, mother, out)
        assert n == 1
        lines = [l for l in gzip.open(out, "rt").read().split("\n")
                 if l and not l.startswith("#")]
        assert len(lines) == 1
        assert lines[0].split("\t")[1] == "10"
        assert os.path.exists(out + ".tbi")

    def test_same_pos_different_alt_is_private(self, tmp_path):
        ipd = _load("identify_putative_denovos")
        child = str(tmp_path / "c.vcf.gz")
        father = str(tmp_path / "f.vcf.gz")
        mother = str(tmp_path / "m.vcf.gz")
        create_vcf(child, "chr1", [(10, "A", "T")])
        create_vcf(father, "chr1", [(10, "A", "G")])  # different ALT
        create_vcf(mother, "chr1", [])
        out = str(tmp_path / "cand.vcf.gz")
        assert ipd.identify(child, father, mother, out) == 1


class TestExtractMiniBams:
    def test_slices_written(self, tmp_path):
        from kmer_denovo_filter_tpu.htsio.bam import BamReader
        emb = _load("extract_mini_bams")
        bam_path = str(tmp_path / "s.bam")
        create_bam(bam_path, "chr1", [
            ("near", 95, "ACGTACGTAC"),
            ("far", 200, "ACGTACGTAC"),
        ], ref_length=300)
        vcf = str(tmp_path / "v.vcf.gz")
        create_vcf(vcf, "chr1", [(101, "A", "T")])
        written = emb.extract(bam_path, "child",
                              [("chr1", 101)], str(tmp_path), padding=50)
        assert len(written) == 1
        out_path, n = written[0]
        assert n == 1  # only the nearby read
        recs = list(BamReader(out_path).fetch(until_eof=True))
        assert [r.query_name for r in recs] == ["near"]
        assert os.path.exists(out_path + ".bai")


class TestIgvReviewTsv:
    def test_rows_built_from_format_fields(self, tmp_path):
        from kmer_denovo_filter_tpu.htsio.vcf import write_annotated_vcf
        igv = _load("create_igv_review_tsv")
        vcf = str(tmp_path / "v.vcf.gz")
        create_vcf(vcf, "chr1", [(101, "A", "T")])
        ann = {"chr1:100:A:T": {
            "dku": 3, "dkt": 9, "dka": 2, "dku_dkt": 0.3333,
            "dka_dkt": 0.2222, "max_pkc": 5, "avg_pkc": 2.5,
            "min_pkc": 1, "max_pkc_alt": 0, "avg_pkc_alt": 0.0,
            "min_pkc_alt": 0}}
        annotated = write_annotated_vcf(
            vcf, str(tmp_path / "a.vcf.gz"), ann, "HG002")
        rows = igv.build_rows(annotated, ["child"], "mini", padding=100)
        assert len(rows) == 1
        assert rows[0]["DKU"] == "3"
        assert rows[0]["locus"] == "chr1:1-201"
        assert rows[0]["child_bam"] == os.path.join(
            "mini", "child.chr1_101.bam")


class TestMiniCramExport:
    def test_cram_slices_written_and_readable(self, tmp_path):
        from scripts.extract_mini_bams import extract
        from kmer_denovo_filter_tpu.htsio.cram import CramReader
        from tests.helpers import create_bam, create_ref_fasta
        ref = str(tmp_path / "ref.fa")
        seq = create_ref_fasta(ref, "chr1", 400)
        bam = str(tmp_path / "s.bam")
        create_bam(bam, "chr1",
                   [(f"r{i}", 10 * i, seq[10 * i:10 * i + 80])
                    for i in range(20)], ref_length=400)
        written = extract(bam, "HG002", [("chr1", 101)],
                          str(tmp_path), padding=50, cram_ref=ref)
        (path, n), = written
        assert path.endswith(".cram")
        assert n > 0
        back = CramReader(path, ref).records
        assert len(back) == n
        assert all(r.pos <= 150 and r.pos + 80 >= 50 for r in back)
