"""VCF-mode Kraken2 stage end-to-end with a mocked kraken2 subprocess.

Exercises the full optional stage: read fetch → classification →
fraction annotation in the VCF → the three companion BED outputs
(detail, span, expanded span), mirroring the reference's mocked
integration coverage (reference tests/test_kraken2_bed.py).
"""

import gzip
import json
import os
import struct
from unittest import mock

import pytest

from kmer_denovo_filter_tpu.cli import parse_args
from kmer_denovo_filter_tpu.htsio.bgzf import BgzfReader
from kmer_denovo_filter_tpu.pipeline import run_pipeline
from tests.vcf.test_pipeline import K, _tiled_reads
from tests.helpers import create_bam, create_ref_fasta, create_vcf


@pytest.fixture()
def kraken_db(tmp_path):
    db = tmp_path / "k2db"
    tax = db / "taxonomy"
    tax.mkdir(parents=True)
    nodes = {1: 1, 2: 1, 562: 2, 2759: 1, 33208: 2759, 9606: 33208,
             10239: 1, 81077: 1}
    with open(tax / "nodes.dmp", "w") as fh:
        for c, p in nodes.items():
            fh.write(f"{c}\t|\t{p}\t|\tno rank\t|\n")
    with open(tax / "names.dmp", "w") as fh:
        fh.write("562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|\n")
        fh.write("9606\t|\tHomo sapiens\t|\t\t|\tscientific name\t|\n")
    with open(db / "opts.k2d", "wb") as fh:
        fh.write(struct.pack("<Q", 35))
    return str(db)


def test_kraken2_stage_end_to_end(tmp_path, kraken_db):
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

    out = str(tmp_path / "out.vcf.gz")
    args = parse_args([
        "--child", child, "--mother", mother, "--father", father,
        "--vcf", vcf, "--output", out,
        "--metrics", str(tmp_path / "m.json"),
        "--kmer-size", str(K), "--min-baseq", "0",
        "--proband-id", "HG002",
        "--kraken2-db", kraken_db,
    ])

    real_popen = __import__("subprocess").Popen

    def fake_popen(cmd, *a, **kw):
        if cmd and cmd[0] == "kraken2":
            # classify every read in the temp FASTQ: half bacterial,
            # half human
            fastq = cmd[-1]
            names = [l[1:].strip() for l in open(fastq)
                     if l.startswith("@")]
            lines = []
            for i, name in enumerate(sorted(names)):
                if i % 2 == 0:
                    lines.append(f"C\t{name}\t562\t60\t562:46")
                else:
                    lines.append(f"C\t{name}\t9606\t60\t9606:46")
            proc = mock.MagicMock()
            proc.returncode = 0
            proc.pid = os.getpid()
            proc.communicate.return_value = (
                "\n".join(lines).encode(), b"")
            return proc
        return real_popen(cmd, *a, **kw)

    with mock.patch("shutil.which", return_value="/usr/bin/kraken2"), \
         mock.patch("subprocess.Popen", side_effect=fake_popen):
        run_pipeline(args)

    # VCF gained the 18 kraken fraction FORMAT fields
    text = gzip.open(out, "rt").read()
    assert "##FORMAT=<ID=DKU_NHF," in text
    data = [l for l in text.split("\n") if l and not l.startswith("#")]
    keys = data[0].split("\t")[8].split(":")
    vals = data[0].split("\t")[9].split(":")
    kv = dict(zip(keys, vals))
    nhf = float(kv["DKU_NHF"])
    ucf = float(kv["DKU_UCF"])
    hlf = float(kv["DKU_HLF"])
    uf = float(kv["DKU_UF"])
    assert nhf > 0  # half the informative reads are bacterial
    assert abs(nhf + ucf + hlf + uf - 1.0) < 1e-6  # four-way partition

    # metrics carry the kraken2 block
    with open(tmp_path / "m.json") as fh:
        m = json.load(fh)
    assert m["kraken2"]["bacterial_reads"] > 0
    assert (m["kraken2"]["classified"]
            == m["kraken2"]["total_reads_classified"])

    # companion BEDs written, bgzipped + indexed, with headers
    base = out[:-len(".vcf.gz")]
    detail = base + ".kraken2_reads.bed.gz"
    span = base + ".kraken2_spans.bed.gz"
    expanded = base + ".kraken2_spans_expanded.bed.gz"
    for path in (detail, span, expanded):
        assert os.path.exists(path), path
        assert os.path.exists(path + ".tbi"), path
    detail_text = BgzfReader(detail).read().decode()
    assert detail_text.startswith("#chrom\tchromStart")
    rows = [l for l in detail_text.rstrip("\n").split("\n")[1:]]
    assert rows
    assert any("\tBacteria\t" in r for r in rows)
    span_text = BgzfReader(span).read().decode()
    assert "Escherichia_coli" in span_text
    exp_text = BgzfReader(expanded).read().decode()
    assert "aligned_start" in exp_text.split("\n")[0]


def test_kraken2_beds_tabix_queryable(tmp_path, kraken_db):
    """The companion BEDs must answer region queries via their .tbi
    (the reference's tabix-queryability contract,
    reference tests/test_kraken2_bed.py)."""
    from kmer_denovo_filter_tpu.htsio.tabix import TabixFile
    test_kraken2_stage_end_to_end(tmp_path, kraken_db)
    base = str(tmp_path / "out")
    detail = TabixFile(base + ".kraken2_reads.bed.gz")
    rows = list(detail.query("chr1", 95, 105))
    assert rows
    assert all(r.split("\t")[0] == "chr1" for r in rows)
    assert not list(detail.query("chr1", 100000, 100100))
    span = TabixFile(base + ".kraken2_spans.bed.gz")
    assert list(span.query("chr1", 0, 300))
