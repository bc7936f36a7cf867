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


class TestExtractMiniTrio:
    """Reference-equivalent trio mode (ref extract_mini_crams.sh)."""

    def _trio(self, tmp_path, with_ref=False):
        from tests.helpers import create_ref_fasta
        seq = None
        ref = str(tmp_path / "ref.fa")
        if with_ref:
            seq = create_ref_fasta(ref, "chr1", 600)
        reads = lambda off: [  # noqa: E731
            (f"r{off}_{i}", off + 10 * i,
             (seq[off + 10 * i:off + 10 * i + 60]
              if seq else "ACGTACGTAC" * 6))
            for i in range(10)]
        paths = {}
        for member, off in (("child", 0), ("father", 5),
                            ("mother", 9)):
            p = str(tmp_path / f"{member}.bam")
            create_bam(p, "chr1", reads(off), ref_length=600)
            paths[member] = p
        vcf = str(tmp_path / "v.vcf.gz")
        # two overlapping loci (merge into one region) + one distant
        create_vcf(vcf, "chr1", [(101, "A", "T"), (121, "C", "G"),
                                 (401, "G", "A")])
        return paths, vcf, (ref if with_ref else None)

    def test_trio_bam_mode_merges_regions(self, tmp_path, capsys):
        emb = _load("extract_mini_bams")
        paths, vcf, _ = self._trio(tmp_path)
        out = tmp_path / "mini"
        emb.main(["--vcf", vcf,
                  "--child-bam", paths["child"],
                  "--father-bam", paths["father"],
                  "--mother-bam", paths["mother"],
                  "--output-dir", str(out),
                  "--padding", "50", "--prefix", "trio"])
        # regions BED: 3 rows; merged: 2 (101±50 overlaps 121±50)
        regions = (out / "trio_regions.bed").read_text().splitlines()
        merged = (out / "trio_regions_merged.bed").read_text(
            ).splitlines()
        assert len(regions) == 3
        assert merged == ["chr1\t50\t171", "chr1\t350\t451"]
        # one sorted+indexed BAM per member, reads deduped
        from kmer_denovo_filter_tpu.htsio.bam import BamReader
        for member in ("child", "father", "mother"):
            path = out / f"trio_{member}.bam"
            assert path.exists() and (out / (path.name + ".bai")
                                      ).exists()
            recs = list(BamReader(str(path)).fetch(until_eof=True))
            names = [r.query_name for r in recs]
            assert len(names) == len(set(names))  # no dup records
            assert recs == sorted(recs, key=lambda r: (r.tid, r.pos))
        txt = capsys.readouterr().out
        assert "3 (2 merged" in txt

    def test_trio_cram_mode(self, tmp_path):
        from kmer_denovo_filter_tpu.htsio.cram import CramReader
        emb = _load("extract_mini_bams")
        paths, vcf, ref = self._trio(tmp_path, with_ref=True)
        out = tmp_path / "minic"
        emb.main(["--vcf", vcf,
                  "--child-bam", paths["child"],
                  "--father-bam", paths["father"],
                  "--mother-bam", paths["mother"],
                  "--output-dir", str(out),
                  "--ref-fasta", ref, "--padding", "50"])
        # format auto-selects CRAM when a reference is given
        for member in ("child", "father", "mother"):
            path = out / f"mini_{member}.cram"
            assert path.exists(), path
            assert CramReader(str(path), ref).records

    def test_cram_without_ref_rejected(self, tmp_path):
        import pytest
        emb = _load("extract_mini_bams")
        paths, vcf, _ = self._trio(tmp_path)
        with pytest.raises(SystemExit):
            emb.main(["--vcf", vcf,
                      "--child-bam", paths["child"],
                      "--father-bam", paths["father"],
                      "--mother-bam", paths["mother"],
                      "--output-dir", str(tmp_path / "x"),
                      "--format", "cram"])


class TestIgvReviewTrioTsv:
    """Reference-equivalent TSV (ref create_igv_review_tsv.sh)."""

    def test_trio_tsv_layout(self, tmp_path):
        from kmer_denovo_filter_tpu.htsio.vcf import write_annotated_vcf
        igv = _load("create_igv_review_tsv")
        vcf = str(tmp_path / "v.vcf.gz")
        create_vcf(vcf, "chr1", [(101, "A", "T"), (201, "C", "G")])
        ann = {}
        for key in ("chr1:100:A:T", "chr1:200:C:G"):
            ann[key] = {"dku": 3, "dkt": 9, "dka": 2,
                        "dku_dkt": 0.3333, "dka_dkt": 0.2222,
                        "max_pkc": 5, "avg_pkc": 2.5, "min_pkc": 1,
                        "max_pkc_alt": 0, "avg_pkc_alt": 0.0,
                        "min_pkc_alt": 0}
        annotated = write_annotated_vcf(
            vcf, str(tmp_path / "a.vcf.gz"), ann, "HG002")
        mini = tmp_path / "mini"
        mini.mkdir()
        for m in ("child", "father", "mother"):
            (mini / f"trio_{m}.cram").write_bytes(b"x")
            (mini / f"trio_{m}.cram.crai").write_bytes(b"x")
        out = str(tmp_path / "review.tsv")
        igv.main(["--vcf", annotated, "--mini-dir", str(mini),
                  "--prefix", "trio", "--proband-id", "HG002",
                  "-o", out])
        lines = open(out).read().splitlines()
        header = lines[0].split("\t")
        # required + quality + DK* (lowercased, header order) +
        # inheritance + 6 track + 3 VCF columns
        assert header[:7] == ["chrom", "pos", "ref", "alt", "quality",
                              "filter", "child_gt"]
        assert "dku" in header and "dka_dkt" in header
        assert "max_pkc" not in header  # DK* prefix only, like the ref
        assert header[-10:] == [
            "inheritance", "child_file", "child_index", "father_file",
            "father_index", "mother_file", "mother_index", "child_vcf",
            "child_vcf_index", "child_vcf_id"]
        assert len(lines) == 3
        row = dict(zip(header, lines[1].split("\t")))
        assert row["inheritance"] == "de_novo"
        assert row["dku"] == "3"
        assert row["child_gt"] == "0/1"
        assert row["child_file"].endswith("trio_child.cram")
        assert row["child_index"].endswith("trio_child.cram.crai")
        assert row["child_vcf_id"] == "HG002"

    def test_tsv_without_format_fields_falls_back_to_info(
            self, tmp_path):
        igv = _load("create_igv_review_tsv")
        vcf = str(tmp_path / "v.vcf.gz")
        create_vcf(vcf, "chr1", [(101, "A", "T")])
        out = str(tmp_path / "review.tsv")
        igv.main(["--vcf", vcf, "--mini-dir", str(tmp_path),
                  "-o", out])
        lines = open(out).read().splitlines()
        assert len(lines) == 2  # header + 1 row, no DK columns
        assert "dku" not in lines[0].split("\t")


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
