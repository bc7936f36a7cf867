"""Synthetic end-to-end tests for the VCF-mode pipeline.

Builds tiny trio BAMs + candidate VCFs with the package's own writers
(no external binaries) and runs the real pipeline, mirroring the
reference's synthetic integration strategy
(reference tests/vcf/test_pipeline.py, 2091 LoC).
"""

import gzip
import json
import os

import pytest

from kmer_denovo_filter_tpu.cli import parse_args
from kmer_denovo_filter_tpu.pipeline import run_pipeline
from tests.helpers import create_bam, create_ref_fasta, create_vcf

K = 15
READ_LEN = 60


def _tiled_reads(seq, prefix, start, end, step=7, read_len=READ_LEN,
                 mutate=None, het=False):
    """Overlapping reads over seq[start:end); optional point mutation.

    With ``het=True`` only every other read carries the mutation,
    modelling a heterozygous sample.
    """
    reads = []
    i = 0
    for pos in range(start, max(end - read_len + 1, start + 1), step):
        sub = seq[pos:pos + read_len]
        if mutate is not None and not (het and i % 2):
            mpos, alt = mutate
            if pos <= mpos < pos + len(sub):
                sub = sub[:mpos - pos] + alt + sub[mpos - pos + 1:]
        reads.append((f"{prefix}{i}", pos, sub))
        i += 1
    return reads


@pytest.fixture()
def trio(tmp_path):
    """Synthetic trio: child carries a de novo SNV at pos 100 (0-based)."""
    ref_path = str(tmp_path / "ref.fa")
    seq = create_ref_fasta(ref_path, "chr1", 300)
    mpos = 100
    alt = "T" if seq[mpos] != "T" else "A"

    child = str(tmp_path / "child.bam")
    mother = str(tmp_path / "mother.bam")
    father = str(tmp_path / "father.bam")
    create_bam(child, "chr1",
               _tiled_reads(seq, "c", 40, 240, mutate=(mpos, alt),
                            het=True))
    create_bam(mother, "chr1", _tiled_reads(seq, "m", 40, 240))
    create_bam(father, "chr1", _tiled_reads(seq, "f", 40, 240))

    vcf = str(tmp_path / "cand.vcf.gz")
    create_vcf(vcf, "chr1", [(mpos + 1, seq[mpos], alt)])
    return {
        "tmp": tmp_path, "seq": seq, "pos0": mpos, "ref": seq[mpos],
        "alt": alt, "child": child, "mother": mother, "father": father,
        "vcf": vcf,
    }


def _run(trio, tmp_path, extra=(), vcf=None):
    out = str(tmp_path / "out.vcf.gz")
    metrics = str(tmp_path / "metrics.json")
    summary = str(tmp_path / "summary.txt")
    args = parse_args([
        "--child", trio["child"], "--mother", trio["mother"],
        "--father", trio["father"], "--vcf", vcf or trio["vcf"],
        "--output", out, "--metrics", metrics, "--summary", summary,
        "--kmer-size", str(K), "--min-baseq", "0",
        *extra,
    ])
    run_pipeline(args)
    return out, metrics, summary


def _read_vcf_fields(path, sample=None):
    lines = gzip.open(path, "rt").read().rstrip("\n").split("\n")
    data = [l for l in lines if l and not l.startswith("#")]
    out = []
    for line in data:
        f = line.split("\t")
        if len(f) > 9 and ":" in f[8]:
            keys = f[8].split(":")
            vals = f[9].split(":")
            out.append(dict(zip(keys, vals)))
        else:
            info = dict(kv.partition("=")[::2] for kv in f[7].split(";"))
            out.append(info)
    return out


class TestDeNovoDetection:
    def test_de_novo_has_positive_dku(self, trio, tmp_path):
        out, metrics, summary = _run(trio, tmp_path,
                                     ["--proband-id", "HG002"])
        fields = _read_vcf_fields(out)
        assert int(fields[0]["DKU"]) > 0
        assert int(fields[0]["DKA"]) > 0
        assert int(fields[0]["DKT"]) >= int(fields[0]["DKU"])
        with open(metrics) as fh:
            m = json.load(fh)
        assert m["variants_with_unique_reads"] == 1
        assert m["child_unique_kmers"] > 0
        assert "DE_NOVO" in open(summary).read()

    def test_inherited_variant_dku_zero(self, trio, tmp_path):
        """When both parents carry the same ALT reads, DKU must be 0."""
        seq = trio["seq"]
        mpos, alt = trio["pos0"], trio["alt"]
        create_bam(trio["mother"], "chr1",
                   _tiled_reads(seq, "m", 40, 240, mutate=(mpos, alt),
                                het=True))
        create_bam(trio["father"], "chr1",
                   _tiled_reads(seq, "f", 40, 240, mutate=(mpos, alt),
                                het=True))
        out, metrics, _ = _run(trio, tmp_path, ["--proband-id", "HG002"])
        fields = _read_vcf_fields(out)
        assert int(fields[0]["DKU"]) == 0
        with open(metrics) as fh:
            assert json.load(fh)["variants_with_unique_reads"] == 0

    def test_info_fallback_without_proband(self, trio, tmp_path):
        out, _, _ = _run(trio, tmp_path)  # no --proband-id
        fields = _read_vcf_fields(out)
        assert "DKU" in fields[0]  # parsed from INFO
        assert int(fields[0]["DKU"]) > 0
        hdr = [l for l in gzip.open(out, "rt").read().split("\n")
               if l.startswith("##INFO=<ID=DKU,")]
        assert hdr

    def test_pkc_reflects_parent_counts(self, trio, tmp_path):
        out, _, _ = _run(trio, tmp_path, ["--proband-id", "HG002"])
        fields = _read_vcf_fields(out)
        # spanning k-mers shared with the ref sequence occur in parents
        assert int(fields[0]["MAX_PKC"]) > 0
        # the alt-carrying k-mers are child-unique: absent from parents
        assert int(fields[0]["MAX_PKC_ALT"]) == 0


class TestIndelAlleleSpecificity:
    def test_insertion_dka(self, trio, tmp_path):
        """Reads carrying an insertion support DKA for the ins allele."""
        seq = trio["seq"]
        ipos = 120
        ins = "GGTT"
        reads = []
        for i, pos in enumerate(range(60, 180, 6)):
            sub = seq[pos:pos + READ_LEN]
            off = ipos - pos
            if 0 <= off < READ_LEN - 1:
                newseq = sub[:off + 1] + ins + sub[off + 1:]
                cigar = [(0, off + 1), (1, len(ins)),
                         (0, len(sub) - off - 1)]
                reads.append((f"ci{i}", pos, newseq, None, cigar))
            else:
                reads.append((f"ci{i}", pos, sub))
        create_bam(trio["child"], "chr1", reads)
        vcf = str(tmp_path / "ins.vcf.gz")
        create_vcf(vcf, "chr1",
                   [(ipos + 1, seq[ipos], seq[ipos] + ins)])
        out, _, _ = _run(trio, tmp_path, ["--proband-id", "HG002"],
                         vcf=vcf)
        fields = _read_vcf_fields(out)
        assert int(fields[0]["DKU"]) > 0
        assert int(fields[0]["DKA"]) > 0


class TestMultiallelic:
    def test_gt_informed_alt_selection(self, trio, tmp_path):
        """With GT 0/2, the second ALT is evaluated for the proband."""
        seq = trio["seq"]
        mpos, alt = trio["pos0"], trio["alt"]
        other = next(b for b in "ACGT" if b not in (seq[mpos], alt))
        vcf = str(tmp_path / "multi.vcf.gz")
        create_vcf(vcf, "chr1",
                   [(mpos + 1, seq[mpos], f"{other},{alt}")],
                   gts=["0/2"])
        out, _, summary = _run(trio, tmp_path, ["--proband-id", "HG002"],
                               vcf=vcf)
        fields = _read_vcf_fields(out)
        # child reads carry `alt` (the 2nd allele) → DKA > 0 only when
        # the GT-informed allele was selected
        assert int(fields[0]["DKA"]) > 0
        assert f">{alt}" in open(summary).read()


class TestValidation:
    def test_missing_child_exits(self, trio, tmp_path):
        args = parse_args([
            "--child", str(tmp_path / "nope.bam"),
            "--mother", trio["mother"], "--father", trio["father"],
            "--vcf", trio["vcf"],
            "--output", str(tmp_path / "o.vcf.gz"),
            "--kmer-size", str(K),
        ])
        with pytest.raises(SystemExit):
            run_pipeline(args)

    def test_even_kmer_size_rejected(self, trio, tmp_path):
        args = parse_args([
            "--child", trio["child"], "--mother", trio["mother"],
            "--father", trio["father"], "--vcf", trio["vcf"],
            "--output", str(tmp_path / "o.vcf.gz"),
            "--kmer-size", "16",
        ])
        with pytest.raises(SystemExit):
            run_pipeline(args)

    def test_missing_index_rejected(self, trio, tmp_path):
        os.unlink(trio["child"] + ".bai")
        args = parse_args([
            "--child", trio["child"], "--mother", trio["mother"],
            "--father", trio["father"], "--vcf", trio["vcf"],
            "--output", str(tmp_path / "o.vcf.gz"),
            "--kmer-size", str(K),
        ])
        with pytest.raises(SystemExit):
            run_pipeline(args)


class TestOutputs:
    def test_informative_reads_bam(self, trio, tmp_path):
        from kmer_denovo_filter_tpu.htsio.bam import BamReader
        info = str(tmp_path / "info.bam")
        out = str(tmp_path / "out.vcf.gz")
        args = parse_args([
            "--child", trio["child"], "--mother", trio["mother"],
            "--father", trio["father"], "--vcf", trio["vcf"],
            "--output", out, "--informative-reads", info,
            "--kmer-size", str(K), "--min-baseq", "0",
            "--proband-id", "HG002",
        ])
        run_pipeline(args)
        bam = BamReader(info)
        recs = list(bam.fetch(until_eof=True))
        assert recs
        var_key = (f"chr1:{trio['pos0']}:{trio['ref']}:{trio['alt']}")
        assert all(r.get_tag("DV") == var_key for r in recs)
        assert os.path.exists(info + ".bai")

    def test_report_generated(self, trio, tmp_path):
        report = str(tmp_path / "report.html")
        out = str(tmp_path / "out.vcf.gz")
        args = parse_args([
            "--child", trio["child"], "--mother", trio["mother"],
            "--father", trio["father"], "--vcf", trio["vcf"],
            "--output", out,
            "--metrics", str(tmp_path / "m.json"),
            "--summary", str(tmp_path / "s.txt"),
            "--kmer-size", str(K), "--min-baseq", "0",
            "--proband-id", "HG002",
        ])
        args.report = report
        run_pipeline(args)
        text = open(report).read()
        assert text.startswith("<!DOCTYPE html>")
        assert "svg" in text
        assert "filtering cascade" in text
