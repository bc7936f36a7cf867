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


class TestSelectAltFromGt:
    """Unit tests for GT→ALT selection (htsio/vcf._select_alt_from_gt),
    mirroring reference vcf/pipeline.py:730–744 behavior."""

    def _sel(self, alts, gt):
        from kmer_denovo_filter_tpu.htsio.vcf import _select_alt_from_gt
        return _select_alt_from_gt(alts, gt)

    def test_het_first_alt(self):
        alt, idx = self._sel(("T", "G"), (0, 1))
        assert alt == "T" and idx == [1]

    def test_het_second_alt(self):
        alt, idx = self._sel(("T", "G"), (0, 2))
        assert alt == "G" and idx == [2]

    def test_het_non_ref_picks_first_listed(self):
        alt, idx = self._sel(("T", "G"), (2, 1))
        assert alt == "T" and idx == [1, 2]

    def test_hom_ref_falls_back_to_first_alt(self):
        alt, idx = self._sel(("T", "G"), (0, 0))
        assert alt == "T" and idx == []

    def test_missing_gt(self):
        alt, idx = self._sel(("T", "G"), None)
        assert alt == "T" and idx == []

    def test_partial_missing_gt_uses_known_allele(self):
        alt, idx = self._sel(("T", "G"), (None, 2))
        assert alt == "G" and idx == [2]

    def test_hom_alt2(self):
        alt, idx = self._sel(("T", "G"), (2, 2))
        assert alt == "G" and idx == [2]

    def test_no_alts_fallback_case(self):
        """Empty *alts* returns None in the fallback paths
        (reference vcf/pipeline.py:737 docstring)."""
        alt, idx = self._sel((), (0, 0))
        assert alt is None and idx == []
        alt, idx = self._sel((), None)
        assert alt is None and idx == []


class TestParseVcfMultiallelic:
    """_parse_vcf_variants GT-informed ALT selection + fallbacks."""

    def _parse(self, tmp_path, alts, gts, proband=None, sample="HG002"):
        from kmer_denovo_filter_tpu.vcf.pipeline import _parse_vcf_variants
        vcf = str(tmp_path / "multi.vcf.gz")
        create_vcf(vcf, "chr1", [(11, "A", alts)], sample=sample,
                   gts=gts)
        return _parse_vcf_variants(vcf, proband_id=proband)

    def test_proband_carries_alt2(self, tmp_path):
        (v,) = self._parse(tmp_path, "T,G", ["0/2"], proband="HG002")
        assert v["alt"] == "G"
        assert v["alts"] == ("T", "G")

    def test_proband_het_non_ref_uses_first_alt(self, tmp_path, caplog):
        import logging
        with caplog.at_level(logging.WARNING):
            (v,) = self._parse(tmp_path, "T,G", ["1/2"],
                               proband="HG002")
        assert v["alt"] == "T"
        assert any("het non-ref" in r.message for r in caplog.records)

    def test_no_proband_id_fallback(self, tmp_path, caplog):
        import logging
        with caplog.at_level(logging.WARNING):
            (v,) = self._parse(tmp_path, "T,G", ["0/2"])
        assert v["alt"] == "T"
        assert any("only the first ALT" in r.message
                   for r in caplog.records)

    def test_proband_hom_ref_fallback(self, tmp_path, caplog):
        import logging
        with caplog.at_level(logging.WARNING):
            (v,) = self._parse(tmp_path, "T,G", ["0/0"],
                               proband="HG002")
        assert v["alt"] == "T"

    def test_proband_not_in_vcf_fallback(self, tmp_path):
        (v,) = self._parse(tmp_path, "T,G", ["0/2"], proband="HG999",
                           sample="HG002")
        assert v["alt"] == "T"

    def test_single_alt_no_change(self, tmp_path):
        (v,) = self._parse(tmp_path, "T", ["0/1"], proband="HG002")
        assert v["alt"] == "T"
        assert v["pos"] == 10  # 0-based


class TestDeletionVariants:
    def _deletion_child(self, trio, dpos, dlen, every=1):
        """Child reads where every *every*-th spanning read carries a
        deletion of *dlen* bases after dpos (0-based anchor base)."""
        seq = trio["seq"]
        reads = []
        for i, pos in enumerate(range(60, 180, 6)):
            sub = seq[pos:pos + READ_LEN]
            off = dpos - pos
            if 0 <= off < READ_LEN - dlen - 1 and i % every == 0:
                newseq = sub[:off + 1] + sub[off + 1 + dlen:]
                cigar = [(0, off + 1), (2, dlen),
                         (0, len(sub) - off - 1 - dlen)]
                reads.append((f"cd{i}", pos, newseq, None, cigar))
            else:
                reads.append((f"cd{i}", pos, sub))
        create_bam(trio["child"], "chr1", reads)

    def test_deletion_dka_positive(self, trio, tmp_path):
        seq = trio["seq"]
        dpos, dlen = 120, 5
        self._deletion_child(trio, dpos, dlen)
        vcf = str(tmp_path / "del.vcf.gz")
        create_vcf(vcf, "chr1",
                   [(dpos + 1, seq[dpos:dpos + dlen + 1], seq[dpos])])
        out, _, _ = _run(trio, tmp_path, ["--proband-id", "HG002"],
                         vcf=vcf)
        fields = _read_vcf_fields(out)
        assert int(fields[0]["DKU"]) > 0
        assert int(fields[0]["DKA"]) > 0
        assert int(fields[0]["DKA"]) <= int(fields[0]["DKT"])

    def test_deletion_dka_is_allele_specific(self, trio, tmp_path):
        """Child reads with a DIFFERENT de novo allele at the same locus
        contribute unique k-mers (DKU/DKT) but must not count toward
        the deletion's DKA."""
        seq = trio["seq"]
        dpos, dlen = 120, 5
        snv_alt = next(b for b in "ACGT" if b != seq[dpos + 2])
        reads = []
        for i, pos in enumerate(range(60, 180, 6)):
            sub = seq[pos:pos + READ_LEN]
            off = dpos - pos
            if 0 <= off < READ_LEN - dlen - 1:
                if i % 2 == 0:  # deletion-carrying read
                    newseq = sub[:off + 1] + sub[off + 1 + dlen:]
                    cigar = [(0, off + 1), (2, dlen),
                             (0, len(sub) - off - 1 - dlen)]
                    reads.append((f"cd{i}", pos, newseq, None, cigar))
                else:  # SNV-carrying read at dpos+2 (also de novo)
                    moff = off + 2
                    newseq = sub[:moff] + snv_alt + sub[moff + 1:]
                    reads.append((f"cs{i}", pos, newseq))
            else:
                reads.append((f"cd{i}", pos, sub))
        create_bam(trio["child"], "chr1", reads)
        vcf = str(tmp_path / "del.vcf.gz")
        create_vcf(vcf, "chr1",
                   [(dpos + 1, seq[dpos:dpos + dlen + 1], seq[dpos])])
        out, _, _ = _run(trio, tmp_path, ["--proband-id", "HG002"],
                         vcf=vcf)
        fields = _read_vcf_fields(out)
        dku, dka = int(fields[0]["DKU"]), int(fields[0]["DKA"])
        assert dka > 0
        assert dka < dku, (
            "SNV-carrying fragments must inflate DKU but not DKA")

    def test_insertion_dka_is_allele_specific(self, trio, tmp_path):
        seq = trio["seq"]
        ipos, ins = 120, "GGTT"
        snv_alt = next(b for b in "ACGT" if b != seq[ipos + 3])
        reads = []
        for i, pos in enumerate(range(60, 180, 6)):
            sub = seq[pos:pos + READ_LEN]
            off = ipos - pos
            if 0 <= off < READ_LEN - 1:
                if i % 2 == 0:
                    newseq = sub[:off + 1] + ins + sub[off + 1:]
                    cigar = [(0, off + 1), (1, len(ins)),
                             (0, len(sub) - off - 1)]
                    reads.append((f"ci{i}", pos, newseq, None, cigar))
                else:
                    moff = off + 3
                    newseq = sub[:moff] + snv_alt + sub[moff + 1:]
                    reads.append((f"cs{i}", pos, newseq))
            else:
                reads.append((f"ci{i}", pos, sub))
        create_bam(trio["child"], "chr1", reads)
        vcf = str(tmp_path / "ins.vcf.gz")
        create_vcf(vcf, "chr1",
                   [(ipos + 1, seq[ipos], seq[ipos] + ins)])
        out, _, _ = _run(trio, tmp_path, ["--proband-id", "HG002"],
                         vcf=vcf)
        fields = _read_vcf_fields(out)
        dku, dka = int(fields[0]["DKU"]), int(fields[0]["DKA"])
        assert 0 < dka < dku

    def test_decomposed_indel_allele_specific_dka(self, trio, tmp_path):
        """Two candidate rows at one locus (decomposed multiallelic):
        each row's DKA reflects only its own allele's supporting reads."""
        seq = trio["seq"]
        dpos, dlen = 120, 5
        ins = "GGTT"
        reads = []
        for i, pos in enumerate(range(60, 180, 6)):
            sub = seq[pos:pos + READ_LEN]
            off = dpos - pos
            if 0 <= off < READ_LEN - dlen - 1:
                if i % 2 == 0:
                    newseq = sub[:off + 1] + sub[off + 1 + dlen:]
                    cigar = [(0, off + 1), (2, dlen),
                             (0, len(sub) - off - 1 - dlen)]
                    reads.append((f"cd{i}", pos, newseq, None, cigar))
                else:
                    newseq = sub[:off + 1] + ins + sub[off + 1:]
                    cigar = [(0, off + 1), (1, len(ins)),
                             (0, len(sub) - off - 1)]
                    reads.append((f"ci{i}", pos, newseq, None, cigar))
            else:
                reads.append((f"cd{i}", pos, sub))
        create_bam(trio["child"], "chr1", reads)
        vcf = str(tmp_path / "both.vcf.gz")
        create_vcf(vcf, "chr1", [
            (dpos + 1, seq[dpos:dpos + dlen + 1], seq[dpos]),
            (dpos + 1, seq[dpos], seq[dpos] + ins),
        ])
        out, _, _ = _run(trio, tmp_path, ["--proband-id", "HG002"],
                         vcf=vcf)
        fields = _read_vcf_fields(out)
        assert len(fields) == 2
        del_dka = int(fields[0]["DKA"])
        ins_dka = int(fields[1]["DKA"])
        assert del_dka > 0 and ins_dka > 0
        # each allele's DKA is a strict subset of the locus's DKU
        assert del_dka < int(fields[0]["DKU"])
        assert ins_dka < int(fields[1]["DKU"])


class TestEmptyVcf:
    def test_empty_vcf_writes_valid_outputs(self, trio, tmp_path):
        """Early-exit path: annotated VCF header + minimal metrics,
        no summary (matches reference vcf/pipeline.py:1524–1534)."""
        vcf = str(tmp_path / "empty.vcf.gz")
        create_vcf(vcf, "chr1", [])
        out, metrics, summary = _run(trio, tmp_path,
                                     ["--proband-id", "HG002"], vcf=vcf)
        with open(metrics) as fh:
            m = json.load(fh)
        assert m == {"total_variants": 0}
        header = [l for l in gzip.open(out, "rt").read().split("\n")
                  if l.startswith("#")]
        assert any(l.startswith("#CHROM") for l in header)
        assert not os.path.exists(summary)


class TestProgressLogging:
    def test_pipeline_logs_step_markers(self, trio, tmp_path, caplog):
        import logging
        with caplog.at_level(logging.INFO):
            _run(trio, tmp_path, ["--proband-id", "HG002"])
        text = "\n".join(r.message for r in caplog.records)
        for step in range(1, 6):
            assert f"[Step {step}/5]" in text, f"missing step {step}"


class TestModuleSeparation:
    """Layering contract (reference tests/vcf/test_pipeline.py:2045)."""

    def test_discovery_does_not_import_vcf(self):
        import kmer_denovo_filter_tpu.discovery.pipeline as dp
        src = open(dp.__file__).read()
        assert "from kmer_denovo_filter_tpu.vcf" not in src
        assert "import kmer_denovo_filter_tpu.vcf" not in src

    def test_core_engine_is_domain_agnostic(self):
        import kmer_denovo_filter_tpu.engine as eng
        src = open(eng.__file__).read()
        for banned in ("argparse", "vcf", "discovery"):
            assert f"import {banned}" not in src, banned

    def test_subpackages_exist(self):
        import kmer_denovo_filter_tpu.vcf.pipeline as vp
        import kmer_denovo_filter_tpu.discovery.pipeline as dp
        assert callable(vp.run_pipeline)
        assert callable(dp.run_discovery_pipeline)

    def test_backward_compat_pipeline_reexports(self):
        import kmer_denovo_filter_tpu.pipeline as shim
        assert callable(shim.run_pipeline)
        assert callable(shim.run_discovery_pipeline)
        assert hasattr(shim, "_parse_vcf_variants")
        assert hasattr(shim, "_collect_child_kmers")


class TestSummaryFields:
    def test_summary_includes_pkc_fields(self, trio, tmp_path):
        _, _, summary = _run(trio, tmp_path, ["--proband-id", "HG002"])
        text = open(summary).read()
        for col in ("MAX_PKC", "AVG_PKC", "MIN_PKC", "MAX_PKC_ALT",
                    "DKU", "DKT", "DKA"):
            assert col in text, col

    def test_info_annotation_when_proband_unmatched(self, trio,
                                                    tmp_path):
        """--proband-id not matching any VCF sample → INFO fields."""
        out, _, _ = _run(trio, tmp_path, ["--proband-id", "NOT_THERE"])
        lines = gzip.open(out, "rt").read().split("\n")
        assert any(l.startswith("##INFO=<ID=DKU,") for l in lines)
        assert not any(l.startswith("##FORMAT=<ID=DKU,")
                       for l in lines)
        data = [l for l in lines if l and not l.startswith("#")]
        assert "DKU=" in data[0].split("\t")[7]


class TestDecomposedMultiallelicSnv:
    """Two same-position SNV rows with different ALTs (decomposed
    multiallelic, reference tests/vcf/test_pipeline.py:1223–1315):
    annotations key on (chrom, pos, ref, alt) so each row is
    independent — the uncarried allele's DKA must be exactly 0."""

    def test_uncarried_alt_gets_zero_dka(self, trio, tmp_path):
        seq, mpos = trio["seq"], trio["pos0"]
        carried = trio["alt"]
        uncarried = next(b for b in "ACGT"
                         if b not in (seq[mpos], carried))
        vcf = str(tmp_path / "decomp.vcf.gz")
        create_vcf(vcf, "chr1", [
            (mpos + 1, seq[mpos], carried),
            (mpos + 1, seq[mpos], uncarried),
        ])
        out, metrics, _ = _run(trio, tmp_path,
                               ["--proband-id", "HG002"], vcf=vcf)
        fields = _read_vcf_fields(out)
        assert len(fields) == 2
        assert int(fields[0]["DKA"]) > 0
        assert int(fields[1]["DKA"]) == 0
        # both rows share the locus's unique k-mers (DKU from any
        # de novo fragment spanning the position)
        assert int(fields[1]["DKU"]) > 0


class TestMultiallelicPipelineIntegration:
    """Single multiallelic record end-to-end (reference
    tests/vcf/test_pipeline.py:1452–1570): the GT-selected ALT drives
    the allele-specific annotation."""

    def _multi_vcf(self, trio, tmp_path, gts, sample="HG002"):
        seq, mpos = trio["seq"], trio["pos0"]
        carried = trio["alt"]
        other = next(b for b in "ACGT"
                     if b not in (seq[mpos], carried))
        # ALT order puts the carried allele SECOND: only GT-informed
        # selection can pick it
        vcf = str(tmp_path / "multi.vcf.gz")
        create_vcf(vcf, "chr1",
                   [(mpos + 1, seq[mpos], f"{other},{carried}")],
                   sample=sample, gts=gts)
        return vcf

    def test_proband_alt2_selected(self, trio, tmp_path):
        vcf = self._multi_vcf(trio, tmp_path, ["0/2"])
        out, _, _ = _run(trio, tmp_path, ["--proband-id", "HG002"],
                         vcf=vcf)
        (f,) = _read_vcf_fields(out)
        # the carried (second) allele was annotated: alt-supporting
        # fragments exist
        assert int(f["DKA"]) > 0

    def test_no_proband_id_falls_back_to_first_alt(self, trio,
                                                   tmp_path):
        vcf = self._multi_vcf(trio, tmp_path, ["0/2"])
        out, _, _ = _run(trio, tmp_path, vcf=vcf)
        (f,) = _read_vcf_fields(out)
        # first ALT is NOT carried by any read → zero alt support,
        # matching the reference's documented fallback behavior
        assert int(f["DKA"]) == 0
        assert int(f["DKU"]) > 0
