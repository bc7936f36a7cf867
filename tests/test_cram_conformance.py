"""Third-party CRAM conformance: htsio vs a real htslib samtools.

The reference gets CRAM interchange for free via pysam/htslib
(reference core/bam_scanner.py:18).  htsio's own CRAM 3.0 codec is
unit- and round-trip-tested in tests/test_cram.py; THIS module proves
interchange with the canonical implementation, in both directions:

* samtools-produced CRAM  → htsio CramReader decodes identical records;
* htsio-produced CRAM     → samtools decodes identical records.

Runs wherever a real ``samtools`` is on PATH (the CI workflow installs
one; the reference uses the same skip-if-unavailable tier for
jellyfish/kraken2, reference tests/test_kmer_utils.py:594).
"""

import os
import shutil
import subprocess

import pytest

from tests.helpers import create_bam, create_ref_fasta

SAMTOOLS = shutil.which("samtools")

pytestmark = pytest.mark.skipif(
    SAMTOOLS is None, reason="samtools not on PATH")


def _mixed_reads(seq):
    """Reads exercising indels, softclips, pairs, and tag traffic."""
    reads = []
    for i in range(12):
        pos = 10 * i + 5
        sub = seq[pos:pos + 70]
        reads.append((f"plain{i}", pos, sub))
    # deletion
    reads.append(("del1", 40,
                  seq[40:61] + seq[66:66 + 29], None,
                  [(0, 21), (2, 5), (0, 29)]))
    # insertion
    reads.append(("ins1", 80,
                  seq[80:101] + "GGTTAA" + seq[101:101 + 24], None,
                  [(0, 21), (1, 6), (0, 24)]))
    # softclips both sides
    reads.append(("clip1", 120,
                  "TTTT" + seq[120:160] + "AAAA", None,
                  [(4, 4), (0, 40), (4, 4)]))
    return reads


@pytest.fixture()
def trio_bam(tmp_path):
    ref = str(tmp_path / "ref.fa")
    seq = create_ref_fasta(ref, "chr1", 400)
    bam = str(tmp_path / "in.bam")
    create_bam(bam, "chr1", _mixed_reads(seq), ref_length=400)
    subprocess.run([SAMTOOLS, "faidx", ref], check=True)
    return ref, bam


def _samtools_sam_lines(path, ref):
    out = subprocess.run(
        [SAMTOOLS, "view", "-T", ref, path],
        check=True, capture_output=True, text=True)
    lines = []
    for line in out.stdout.rstrip("\n").split("\n"):
        f = line.split("\t")
        # name flag chrom pos mapq cigar seq qual (drop mate/tags whose
        # defaults differ between writers)
        lines.append((f[0], int(f[1]), f[2], int(f[3]), int(f[4]),
                      f[5], f[9], f[10]))
    return sorted(lines)


def _htsio_lines(records, refs):
    lines = []
    for rec in records:
        cigar = "".join(
            f"{ln}{'MIDNSHP=X'[op]}" for op, ln in (rec.cigar or []))
        lines.append((rec.query_name, rec.flag,
                      refs[rec.tid][0] if rec.tid >= 0 else "*",
                      rec.pos + 1, rec.mapq, cigar or "*",
                      rec.query_sequence,
                      "".join(chr(q + 33) for q in rec.quals)))
    return sorted(lines)


class TestHtslibCramToHtsio:
    """A real htslib-written CRAM decodes identically in htsio."""

    def test_identical_records(self, tmp_path, trio_bam):
        from kmer_denovo_filter_tpu.htsio.cram import CramReader

        ref, bam = trio_bam
        cram = str(tmp_path / "htslib.cram")
        subprocess.run(
            [SAMTOOLS, "view", "-C", "-T", ref, "-o", cram, bam],
            check=True)
        want = _samtools_sam_lines(bam, ref)
        reader = CramReader(cram, ref)
        got = _htsio_lines(reader.records, reader.refs)
        assert got == want

    def test_lossy_name_mode_still_decodes(self, tmp_path, trio_bam):
        """htslib CRAM with default options (read-name preservation
        on) at higher compression levels."""
        from kmer_denovo_filter_tpu.htsio.cram import CramReader

        ref, bam = trio_bam
        cram = str(tmp_path / "level9.cram")
        subprocess.run(
            [SAMTOOLS, "view", "-C", "-T", ref,
             "--output-fmt-option", "level=9", "-o", cram, bam],
            check=True)
        reader = CramReader(cram, ref)
        assert len(reader.records) == len(
            _samtools_sam_lines(bam, ref))


class TestHtsioCramToHtslib:
    """htsio-written CRAM decodes identically in samtools."""

    def test_identical_records(self, tmp_path, trio_bam):
        from kmer_denovo_filter_tpu.htsio.bam import BamReader
        from kmer_denovo_filter_tpu.htsio.cram import CramWriter

        ref, bam = trio_bam
        reader = BamReader(bam)
        cram = str(tmp_path / "htsio.cram")
        writer = CramWriter(cram, reader.header_text, reader.refs)
        writer.set_reference(ref)
        for rec in reader.records:
            writer.write(rec)
        writer.close()
        got = _samtools_sam_lines(cram, ref)
        want = _samtools_sam_lines(bam, ref)
        assert got == want
