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
