"""C++ host accelerator vs pure-Python path equivalence tests."""

import gzip
import os

import numpy as np
import pytest

from kmer_denovo_filter_tpu.htsio import native
from kmer_denovo_filter_tpu.htsio.bam import BamReader
from tests.helpers import create_bam

from tests.conftest import GIAB_DIR

GIAB_BAM = os.path.join(GIAB_DIR, "HG002_child.bam")

needs_native = pytest.mark.skipif(
    not native._load(), reason="native toolchain unavailable")


@needs_native
class TestNative:
    def test_bgzf_inflate_matches_gzip(self, tmp_path):
        path = str(tmp_path / "t.bam")
        create_bam(path, "chr1", [("r1", 5, "ACGTACGTAC"),
                                  ("r2", 9, "TTTTACGT")])
        assert native.bgzf_inflate(path) == gzip.open(path, "rb").read()

    @pytest.mark.skipif(not os.path.exists(GIAB_BAM),
                        reason="GIAB data unavailable")
    def test_giab_inflate_matches_gzip(self):
        assert native.bgzf_inflate(GIAB_BAM) == \
            gzip.open(GIAB_BAM, "rb").read()

    @pytest.mark.skipif(not os.path.exists(GIAB_BAM),
                        reason="GIAB data unavailable")
    def test_scan_matches_python_records(self):
        bam = BamReader(GIAB_BAM)
        assert bam._scan is not None
        recs = bam.records
        scan = bam._scan
        assert scan["n"] == len(recs)
        for i in (0, 1, 57, len(recs) - 1):
            r = recs[i]
            assert scan["tids"][i] == r.tid
            assert scan["poss"][i] == r.pos
            assert scan["flags"][i] == r.flag
            assert scan["mapqs"][i] == r.mapping_quality
            assert scan["l_seqs"][i] == r.query_length
            if not r.is_unmapped:
                assert (r.pos + scan["ref_spans"][i]) == r.reference_end

    @pytest.mark.skipif(not os.path.exists(GIAB_BAM),
                        reason="GIAB data unavailable")
    def test_packed_batches_match_python(self):
        bam = BamReader(GIAB_BAM)
        nat = list(bam._iter_packed_native(0xD00, 2048))
        pyb = list(bam.iter_packed(0xD00, 2048, records=bam.records))
        assert len(nat) == len(pyb)
        for (a, la), (b, lb) in zip(nat, pyb):
            assert np.array_equal(la, lb)
            assert np.array_equal(a, b)


def test_stream_packed_native_matches_python(tmp_path):
    """The native chunked stream walk yields the same reads (order and
    content) as the pure-Python record walk, across chunk boundaries."""
    from kmer_denovo_filter_tpu.htsio import native
    from kmer_denovo_filter_tpu.htsio.bam import (
        _stream_packed_python,
        stream_packed,
        stream_scan_chunks,
    )
    from tests.helpers import create_bam, create_ref_fasta

    if not native.available():
        import pytest
        pytest.skip("native scanner unavailable")
    ref = str(tmp_path / "ref.fa")
    seq = create_ref_fasta(ref, "chr1", 3000)
    reads = [(f"r{i}", p, seq[p:p + 50 + (i % 17)])
             for i, p in enumerate(range(0, 2500, 3))]
    bam = str(tmp_path / "t.bam")
    create_bam(bam, "chr1", reads, ref_length=3000)

    def flat(batches):
        rows = []
        for codes, lens in batches:
            for r, ln in zip(codes, lens):
                rows.append(bytes(r[:ln]))
        return rows

    a = flat(stream_packed(bam, 0xD00, batch_reads=64))
    b = flat(_stream_packed_python(bam, 0xD00, batch_reads=64))
    assert a == b and len(a) == len(reads)

    # tiny chunks force carry-over of partial trailing records;
    # each record must be scanned exactly once
    rows = 0
    for data, scan, refs in stream_scan_chunks(bam, chunk_bytes=1024):
        rows += int(scan["n"])
    assert rows == len(reads)


def test_stream_truncated_bam_yields_complete_prefix(tmp_path):
    """A file cut mid-record must stream every complete record and
    stop cleanly (no crash, no partial record)."""
    from kmer_denovo_filter_tpu.htsio.bgzf import BgzfWriter
    from kmer_denovo_filter_tpu.htsio.bam import stream_packed
    from tests.helpers import create_bam, create_ref_fasta

    ref = str(tmp_path / "ref.fa")
    seq = create_ref_fasta(ref, "chr1", 2000)
    reads = [(f"r{i}", p, seq[p:p + 60])
             for i, p in enumerate(range(0, 1500, 10))]
    bam = str(tmp_path / "t.bam")
    create_bam(bam, "chr1", reads, ref_length=2000)
    n_full = sum(c.shape[0] for c, l in stream_packed(bam, 0))

    # rebuild the BGZF container with the inflated payload cut inside
    # the final record
    from kmer_denovo_filter_tpu.htsio.bgzf import BgzfReader
    raw = BgzfReader(bam).read()
    cut = str(tmp_path / "cut.bam")
    with BgzfWriter(cut) as w:
        w.write(raw[:-17])
    n_cut = sum(c.shape[0] for c, l in stream_packed(cut, 0))
    assert n_cut == n_full - 1


def test_parallel_bgzf_reader_matches_serial(tmp_path):
    from kmer_denovo_filter_tpu.htsio.bgzf import (
        BgzfReader,
        BgzfWriter,
        ParallelBgzfReader,
    )

    payload = bytes(range(256)) * 5000  # spans multiple BGZF blocks
    path = str(tmp_path / "x.bgzf")
    with BgzfWriter(path) as w:
        w.write(payload)
    assert ParallelBgzfReader(path).read() == payload
    assert BgzfReader(path).read() == payload
    # chunked reads agree too
    r = ParallelBgzfReader(path)
    got = b"".join(iter(lambda: r.read(12345), b""))
    assert got == payload
    r.close()

    # non-gzip input raises at construction (callers fall back)
    plain = str(tmp_path / "plain.txt")
    with open(plain, "wb") as fh:
        fh.write(b"hello world")
    import pytest
    with pytest.raises(ValueError):
        ParallelBgzfReader(plain)
