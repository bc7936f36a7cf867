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


# ── validation matrix (reference tests/vcf/test_pipeline.py:1793–1895) ──


class TestValidationMatrix:
    """Every validate_inputs rejection path, one case per rule."""

    @staticmethod
    def _trio(tmp_path, with_vcf=True):
        import sys
        sys.path.insert(0, str(tmp_path))
        from tests.helpers import (create_bam, create_ref_fasta,
                                   create_vcf)
        ref = str(tmp_path / "ref.fa")
        seq = create_ref_fasta(ref, "chr1", 200)
        paths = {}
        for name in ("child", "mother", "father"):
            p = str(tmp_path / f"{name}.bam")
            create_bam(p, "chr1", [(f"{name}0", 10, seq[10:70])], 200)
            paths[name] = p
        if with_vcf:
            vcf = str(tmp_path / "v.vcf.gz")
            create_vcf(vcf, "chr1", [(20, seq[19], "A" if seq[19] != "A"
                                      else "C")])
            paths["vcf"] = vcf
        paths["ref_fasta"] = ref
        return paths

    def _args(self, tmp_path, **overrides):
        from kmer_denovo_filter_tpu.cli import parse_args
        trio = self._trio(tmp_path)
        argv = ["--child", trio["child"], "--mother", trio["mother"],
                "--father", trio["father"], "--vcf", trio["vcf"],
                "--output", str(tmp_path / "o.vcf.gz")]
        args = parse_args(argv)
        for key, val in overrides.items():
            setattr(args, key, val)
        return args

    def _expect_exit(self, args, caplog, needle):
        import logging

        import pytest as _pytest

        from kmer_denovo_filter_tpu.utils import validate_inputs
        with caplog.at_level(logging.ERROR):
            with _pytest.raises(SystemExit):
                validate_inputs(args)
        assert needle in caplog.text

    def test_valid_inputs_pass(self, tmp_path):
        from kmer_denovo_filter_tpu.utils import validate_inputs
        validate_inputs(self._args(tmp_path))  # no exit

    def test_missing_child(self, tmp_path, caplog):
        self._expect_exit(self._args(tmp_path, child="/nope.bam"),
                          caplog, "file not found")

    def test_missing_vcf(self, tmp_path, caplog):
        self._expect_exit(self._args(tmp_path, vcf="/nope.vcf.gz"),
                          caplog, "Input VCF")

    def test_missing_ref_fasta(self, tmp_path, caplog):
        self._expect_exit(self._args(tmp_path, ref_fasta="/nope.fa"),
                          caplog, "Reference FASTA")

    def test_cram_without_ref(self, tmp_path, caplog):
        args = self._args(tmp_path)
        cram = str(tmp_path / "c.cram")
        open(cram, "wb").write(b"")
        args.child = cram
        self._expect_exit(args, caplog,
                          "CRAM file but --ref-fasta was not provided")

    def test_missing_bam_index(self, tmp_path, caplog):
        args = self._args(tmp_path)
        import os as _os
        _os.unlink(args.mother + ".bai")
        self._expect_exit(args, caplog, "no index found")

    def test_kmer_size_too_small(self, tmp_path, caplog):
        self._expect_exit(self._args(tmp_path, kmer_size=1), caplog,
                          "must be >= 3")

    def test_kmer_size_too_large(self, tmp_path, caplog):
        self._expect_exit(self._args(tmp_path, kmer_size=203), caplog,
                          "must be <= 201")

    def test_kmer_size_even(self, tmp_path, caplog):
        self._expect_exit(self._args(tmp_path, kmer_size=30), caplog,
                          "odd")

    def test_negative_baseq(self, tmp_path, caplog):
        self._expect_exit(self._args(tmp_path, min_baseq=-1), caplog,
                          "--min-baseq")

    def test_negative_mapq(self, tmp_path, caplog):
        self._expect_exit(self._args(tmp_path, min_mapq=-2), caplog,
                          "--min-mapq")

    def test_zero_threads(self, tmp_path, caplog):
        self._expect_exit(self._args(tmp_path, threads=0), caplog,
                          "--threads")

    def test_discovery_needs_reference(self, tmp_path, caplog):
        args = self._args(tmp_path, vcf=None, ref_fasta=None)
        self._expect_exit(args, caplog, "Discovery mode requires")

    def test_discovery_missing_ref_jf(self, tmp_path, caplog):
        args = self._args(tmp_path, vcf=None)
        args.ref_jf = "/nope.jf"
        self._expect_exit(args, caplog, "--ref-jf")

    def test_discovery_min_child_count(self, tmp_path, caplog):
        args = self._args(tmp_path, vcf=None)
        args.min_child_count = 0
        self._expect_exit(args, caplog, "--min-child-count")

    def test_all_errors_reported_together(self, tmp_path, caplog):
        """Multiple problems surface in one pass (fail-fast but
        complete, like the reference's error list)."""
        import logging

        import pytest as _pytest

        from kmer_denovo_filter_tpu.utils import validate_inputs
        args = self._args(tmp_path, child="/nope.bam", kmer_size=4,
                          threads=0)
        with caplog.at_level(logging.ERROR):
            with _pytest.raises(SystemExit):
                validate_inputs(args)
        assert "file not found" in caplog.text
        assert "odd" in caplog.text
        assert "--threads" in caplog.text


class TestPrefetchBatches:
    def test_order_and_completeness(self):
        from kmer_denovo_filter_tpu.utils import prefetch_batches
        got = list(prefetch_batches(iter(range(100)), depth=3))
        assert got == list(range(100))

    def test_empty_iterable(self):
        from kmer_denovo_filter_tpu.utils import prefetch_batches
        assert list(prefetch_batches(iter(()))) == []

    def test_producer_exception_reraises(self):
        import pytest as _pytest
        from kmer_denovo_filter_tpu.utils import prefetch_batches

        def boom():
            yield 1
            yield 2
            raise ValueError("decode failed")

        it = prefetch_batches(boom(), depth=1)
        assert next(it) == 1
        assert next(it) == 2
        with _pytest.raises(ValueError, match="decode failed"):
            list(it)

    def test_abandoned_consumer_stops_producer(self):
        import time as _time
        from kmer_denovo_filter_tpu.utils import prefetch_batches

        produced = []

        def slow():
            for i in range(10_000):
                produced.append(i)
                yield i

        it = prefetch_batches(slow(), depth=2)
        assert next(it) == 0
        it.close()  # generator finalizer sets the stop event
        _time.sleep(0.3)
        n = len(produced)
        _time.sleep(0.2)
        assert len(produced) == n  # producer thread actually stopped

    def test_overlap_actually_happens(self):
        """Consumer work and producer work must run concurrently."""
        import threading as _threading
        import time as _time
        from kmer_denovo_filter_tpu.utils import prefetch_batches

        in_producer = _threading.Event()

        def produce():
            for i in range(4):
                if i == 1:
                    in_producer.set()
                _time.sleep(0.05)
                yield i

        it = prefetch_batches(produce(), depth=2)
        first = next(it)
        # while the consumer holds item 0, the producer is already
        # working on later items
        assert in_producer.wait(timeout=2.0)
        assert first == 0
        assert list(it) == [1, 2, 3]
