"""Utils unit tests: formatting, estimation, tmp-dir resolution."""

import os

from kmer_denovo_filter_tpu.utils import (
    estimate_fasta_sequence_count,
    format_elapsed,
    format_file_size,
    is_tmpfs,
    load_kmers_from_fasta,
    resolve_tmp_dir,
    write_kmer_fasta,
)


class TestFormatting:
    def test_elapsed(self):
        assert format_elapsed(5.25) == "5.2s"
        assert format_elapsed(65) == "1m 5.0s"
        assert format_elapsed(3725) == "1h 2m 5s"

    def test_file_size(self, tmp_path):
        p = tmp_path / "f"
        p.write_bytes(b"x" * 2048)
        assert format_file_size(str(p)) == "2.0 KB"
        assert format_file_size(str(tmp_path / "missing")) == "?"


class TestKmerFasta:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "k.fa")
        kmers = ["ACGTA", "TTTTT", "GGGCC"]
        write_kmer_fasta(kmers, p)
        assert load_kmers_from_fasta(p) == set(kmers)


class TestEstimation:
    def test_small_file_exact(self, tmp_path):
        p = str(tmp_path / "s.fa")
        write_kmer_fasta(["AAAAA"] * 7, p)
        count, extrapolated = estimate_fasta_sequence_count(p)
        assert count == 7
        assert extrapolated is False

    def test_large_file_extrapolates(self, tmp_path):
        p = str(tmp_path / "l.fa")
        write_kmer_fasta(["ACGTACGTAC"] * 5000, p)
        count, extrapolated = estimate_fasta_sequence_count(
            p, sample_lines=100)
        assert extrapolated is True
        assert 3500 < count < 6500

    def test_empty(self, tmp_path):
        p = str(tmp_path / "e.fa")
        open(p, "w").close()
        assert estimate_fasta_sequence_count(p) == (0, False)


class TestTmpDir:
    def test_explicit(self, tmp_path):
        target = str(tmp_path / "custom")
        assert resolve_tmp_dir(target, str(tmp_path)) == \
            os.path.abspath(target)
        assert os.path.isdir(target)

    def test_fallback_subdir(self, tmp_path):
        got = resolve_tmp_dir(None, str(tmp_path))
        assert got == os.path.abspath(
            os.path.join(str(tmp_path), "kmer_denovo_tmp"))
        assert os.path.isdir(got)

    def test_is_tmpfs_nonexistent(self):
        assert is_tmpfs("/definitely/not/a/path") in (True, False)
