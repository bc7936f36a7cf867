"""I/O stack tests: BGZF, BAM round-trips, FASTA, tabix, jellyfish."""

import gzip
import os

import numpy as np
import pytest

from tests.conftest import GIAB_DIR, REF_EXAMPLE_OUTPUT_DIR

from kmer_denovo_filter_tpu.htsio.bam import (
    AlignedRead,
    BamReader,
    BamWriter,
    encode_read,
    reg2bin,
)
from kmer_denovo_filter_tpu.htsio.bgzf import (
    BgzfReader,
    BgzfWriter,
    is_bgzf,
)
from kmer_denovo_filter_tpu.htsio.fasta import read_fasta, write_fai
from kmer_denovo_filter_tpu.htsio.tabix import tabix_index
from tests.helpers import create_bam, create_ref_fasta


class TestBgzf:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.gz")
        data = os.urandom(300000) + b"tail"
        with BgzfWriter(path) as w:
            w.write(data)
        assert is_bgzf(path)
        with BgzfReader(path) as r:
            assert r.read() == data
        # gzip-compatible (BGZF is valid multi-member gzip)
        assert gzip.open(path, "rb").read() == data

    def test_virtual_offsets(self, tmp_path):
        path = str(tmp_path / "x.gz")
        lines = [f"line {i} {'x' * (i % 97)}\n".encode()
                 for i in range(5000)]
        offsets = []
        with BgzfWriter(path) as w:
            for line in lines:
                offsets.append(w.tell_virtual())
                w.write(line)
        with BgzfReader(path) as r:
            for i in (0, 1, 1234, 4999):
                r.seek_virtual(offsets[i])
                assert r.read(len(lines[i])) == lines[i]

    def test_iter_lines_voffsets(self, tmp_path):
        path = str(tmp_path / "x.gz")
        lines = [f"row{i}\t{'y' * (i % 53)}\n".encode()
                 for i in range(3000)]
        with BgzfWriter(path) as w:
            for line in lines:
                w.write(line)
        got = []
        with BgzfReader(path) as r:
            for vstart, line, vend in r.iter_lines_voffsets():
                got.append((vstart, line))
        assert [l for _, l in got] == lines
        # every vstart must seek back to the same line
        with BgzfReader(path) as r:
            for vstart, line in got[::271]:
                r.seek_virtual(vstart)
                assert r.read(len(line)) == line


class TestBamRoundtrip:
    def test_write_read(self, tmp_path):
        path = str(tmp_path / "t.bam")
        reads = [
            ("r1", 5, "ACGTACGTAC"),
            ("r2", 2, "TTTTACGTACGTT"),
            ("r3", 50, "ACGT"),
        ]
        create_bam(path, "chr1", reads)
        assert os.path.exists(path + ".bai")
        bam = BamReader(path)
        assert bam.references == ["chr1"]
        recs = list(bam.fetch(until_eof=True))
        assert [r.query_name for r in recs] == ["r2", "r1", "r3"]  # sorted
        by_name = {r.query_name: r for r in recs}
        assert by_name["r1"].query_sequence == "ACGTACGTAC"
        assert by_name["r1"].reference_start == 5
        assert by_name["r1"].reference_end == 15
        assert by_name["r1"].query_qualities == [40] * 10

    def test_fetch_overlap_semantics(self, tmp_path):
        path = str(tmp_path / "t.bam")
        create_bam(path, "chr1", [
            ("a", 0, "ACGTACGTAC"),   # [0, 10)
            ("b", 10, "ACGTACGTAC"),  # [10, 20)
            ("c", 15, "ACGTACGTAC"),  # [15, 25)
        ])
        bam = BamReader(path)
        assert {r.query_name for r in bam.fetch("chr1", 9, 10)} == {"a"}
        assert {r.query_name for r in bam.fetch("chr1", 10, 11)} == {"b"}
        assert {r.query_name for r in bam.fetch("chr1", 14, 16)} == {"b", "c"}
        assert {r.query_name for r in bam.fetch("chr1", 30, 40)} == set()

    def test_tags_roundtrip(self, tmp_path):
        raw = encode_read("r1", 0, 0, 10, 60, [(0, 4)], "ACGT",
                          [30, 30, 30, 30],
                          tags=b"SAZchr2,100,+,4M,60,0;\x00NMi"
                               + (5).to_bytes(4, "little"))
        read = AlignedRead(raw, [("chr1", 1000)])
        assert read.has_tag("SA")
        assert read.get_tag("SA") == "chr2,100,+,4M,60,0;"
        assert read.get_tag("NM") == 5
        read.set_tag("DV", "chr1:5:A:T", value_type="Z")
        assert read.get_tag("DV") == "chr1:5:A:T"
        assert read.get_tag("SA") == "chr2,100,+,4M,60,0;"

    def test_seq_codes(self, tmp_path):
        raw = encode_read("r", 0, 0, 0, 60, [(0, 5)], "ACGTN",
                          [40] * 5)
        read = AlignedRead(raw, [("chr1", 100)])
        assert read.seq_codes().tolist() == [0, 1, 2, 3, 4]

    def test_aligned_pairs(self):
        raw = encode_read("r", 0, 0, 10, 60,
                          [(4, 2), (0, 3), (1, 2), (0, 2), (2, 2), (0, 1)],
                          "SSMMMIIMMM", None)
        read = AlignedRead(raw, [("chr1", 1000)])
        pairs = read.get_aligned_pairs(matches_only=False)
        assert pairs == [
            (0, None), (1, None),            # soft clips
            (2, 10), (3, 11), (4, 12),       # 3M
            (5, None), (6, None),            # 2I
            (7, 13), (8, 14),                # 2M
            (None, 15), (None, 16),          # 2D
            (9, 17),                         # 1M
        ]
        assert read.get_aligned_pairs(matches_only=True) == [
            (2, 10), (3, 11), (4, 12), (7, 13), (8, 14), (9, 17)]
        full = read.get_reference_positions(full_length=True)
        assert full == [None, None, 10, 11, 12, None, None, 13, 14, 17]
        assert read.reference_end == 18


class TestGiabBam:
    @pytest.mark.skipif(
        not os.path.exists(os.path.join(GIAB_DIR, "HG002_child.bam")),
        reason="GIAB data unavailable")
    def test_parse_real_bam(self):
        bam = BamReader(os.path.join(GIAB_DIR, "HG002_child.bam"))
        assert bam.nreferences == 2580
        assert len(bam.records) == 11097
        rec = bam.records[0]
        assert len(rec.query_sequence) == rec.query_length


class TestFasta:
    def test_read_and_fai(self, tmp_path):
        path = str(tmp_path / "r.fa")
        create_ref_fasta(path, "chrT", 120)
        seqs = read_fasta(path)
        assert list(seqs) == ["chrT"]
        assert len(seqs["chrT"]) == 120
        fai = open(path + ".fai").read().split("\t")
        assert fai[0] == "chrT"
        assert int(fai[1]) == 120


class TestTabix:
    def test_vcf_index_written(self, tmp_path):
        from tests.helpers import create_vcf
        path = str(tmp_path / "t.vcf.gz")
        create_vcf(path, "chr1", [(10, "A", "T"), (50, "C", "G")])
        assert os.path.exists(path + ".tbi")
        assert is_bgzf(path + ".tbi")

    def test_reg2bin(self):
        assert reg2bin(0, 1) == 4681
        assert reg2bin(0, 1 << 14) == 4681
        assert reg2bin(0, (1 << 14) + 1) == 585


class TestJellyfishReader:
    @pytest.mark.skipif(
        not os.path.exists(
            os.path.join(GIAB_DIR, "mini_ref.fa.k31.jf")),
        reason="GIAB data unavailable")
    def test_matches_fasta_oracle(self):
        from collections import Counter

        from kmer_denovo_filter_tpu import kmer as K
        from kmer_denovo_filter_tpu.htsio.jellyfish import load_sorted_jf
        from kmer_denovo_filter_tpu.ops import encode as enc

        keys, counts, k = load_sorted_jf(
            os.path.join(GIAB_DIR, "mini_ref.fa.k31.jf"))
        assert k == 31
        seqs = read_fasta(os.path.join(GIAB_DIR, "mini_ref.fa"))
        oc = Counter()
        for seq in seqs.values():
            cap, _ = K.extract_read_kmers(seq, 31)
            for c in cap.values():
                oc[c] += 1
        got = dict(zip(enc.keys_to_kmers(keys, k), counts.tolist()))
        assert got == dict(oc)


class TestAnnotatedVcfByteParity:
    @pytest.mark.skipif(
        not os.path.exists(
            os.path.join(REF_EXAMPLE_OUTPUT_DIR, "annotated.vcf.gz")),
        reason="reference goldens unavailable")
    def test_regenerates_golden_bytes(self, tmp_path):
        """Feeding golden annotation values must reproduce the golden
        VCF byte-for-byte (validates the text-transform writer)."""
        from kmer_denovo_filter_tpu.htsio.vcf import write_annotated_vcf

        gold_path = os.path.join(REF_EXAMPLE_OUTPUT_DIR, "annotated.vcf.gz")
        gold = gzip.open(gold_path, "rb").read()
        glines = gold.decode().rstrip("\n").split("\n")
        gdata = [l for l in glines if not l.startswith("#")]
        keys = ["dku", "dkt", "dka", "dku_dkt", "dka_dkt", "max_pkc",
                "avg_pkc", "min_pkc", "max_pkc_alt", "avg_pkc_alt",
                "min_pkc_alt"]
        ann = {}
        for line in gdata:
            f = line.split("\t")
            vals = f[9].split(":")[-11:]
            conv = [float(v) if "_dkt" in k or "avg" in k else int(v)
                    for k, v in zip(keys, vals)]
            alts = f[4].split(",")
            gt = f[9].split(":")[0]
            ai = sorted({int(x) for x in gt.replace("|", "/").split("/")
                         if x not in (".", "") and int(x) > 0})
            alt = alts[ai[0] - 1] if ai else alts[0]
            ann[f"{f[0]}:{int(f[1]) - 1}:{f[3]}:{alt}"] = dict(
                zip(keys, conv))
        out = write_annotated_vcf(
            os.path.join(GIAB_DIR, "candidates.vcf.gz"),
            str(tmp_path / "annot.vcf.gz"), ann, "HG002")
        assert gzip.open(out, "rb").read() == gold


class TestStreamPacked:
    @pytest.mark.skipif(
        not os.path.exists(os.path.join(GIAB_DIR, "HG002_child.bam")),
        reason="GIAB data unavailable")
    def test_matches_whole_file_reader(self):
        from kmer_denovo_filter_tpu.htsio.bam import stream_packed
        path = os.path.join(GIAB_DIR, "HG002_child.bam")
        bam = BamReader(path)
        whole = list(bam.iter_packed(0xD00, 2048, records=bam.records))
        streamed = list(stream_packed(path, 0xD00, 2048))
        assert len(whole) == len(streamed)
        for (a, la), (b, lb) in zip(whole, streamed):
            assert np.array_equal(la, lb)
            assert np.array_equal(a, b)

    def test_synthetic_roundtrip(self, tmp_path):
        from kmer_denovo_filter_tpu.htsio.bam import stream_packed
        path = str(tmp_path / "t.bam")
        create_bam(path, "chr1", [
            (f"r{i}", i * 3, "ACGTACGTACGT"[:6 + (i % 6)])
            for i in range(50)
        ])
        batches = list(stream_packed(path, 0, batch_reads=16))
        total = sum(b[0].shape[0] for b in batches)
        assert total == 50


class TestTabixReader:
    def test_query_vcf(self, tmp_path):
        from kmer_denovo_filter_tpu.htsio.tabix import TabixFile
        from tests.helpers import create_vcf
        path = str(tmp_path / "q.vcf.gz")
        create_vcf(path, "chr1",
                   [(100, "A", "T"), (5000, "CAT", "C"),
                    (90000, "G", "C")])
        t = TabixFile(path)
        assert [l.split("\t")[1] for l in t.query("chr1", 0, 200)] \
            == ["100"]
        # deletion spans [4999, 5002); query overlapping its tail
        assert [l.split("\t")[1] for l in t.query("chr1", 5001, 5002)] \
            == ["5000"]
        assert [l.split("\t")[1] for l in t.query("chr1", 80000, 100000)] \
            == ["90000"]
        assert list(t.query("chr1", 200, 300)) == []
        assert list(t.query("chrX", 0, 100)) == []

    def test_query_bed(self, tmp_path):
        from kmer_denovo_filter_tpu.htsio.bgzf import BgzfWriter
        from kmer_denovo_filter_tpu.htsio.tabix import (
            TabixFile,
            tabix_index,
        )
        path = str(tmp_path / "q.bed.gz")
        with BgzfWriter(path) as out:
            out.write(b"#chrom\tstart\tend\tname\n")
            out.write(b"chr1\t10\t50\ta\n")
            out.write(b"chr1\t100\t200\tb\n")
            out.write(b"chr2\t5\t6\tc\n")
        tabix_index(path, preset="bed", force=True)
        t = TabixFile(path)
        assert [l.split("\t")[3] for l in t.query("chr1", 40, 60)] == ["a"]
        assert [l.split("\t")[3] for l in t.query("chr1", 0, 300)] \
            == ["a", "b"]
        assert [l.split("\t")[3] for l in t.query("chr2", 0, 10)] == ["c"]


def test_module_separation_contract():
    """Core engine/I/O layers must not depend on CLI or pipelines
    (the analog of the reference's TestModuleSeparation,
    reference tests/vcf/test_pipeline.py:2045)."""
    import inspect

    from kmer_denovo_filter_tpu import engine
    from kmer_denovo_filter_tpu.htsio import bam, bgzf, tabix, vcf
    from kmer_denovo_filter_tpu.ops import device, encode

    for mod in (engine, device, encode, bam, bgzf, tabix, vcf):
        src = inspect.getsource(mod)
        assert "argparse" not in src, mod.__name__
        assert "cli" not in [m.split(".")[-1] for m in
                             getattr(mod, "__dict__", {})], mod.__name__
        assert ".vcf.pipeline" not in src and \
            ".discovery.pipeline" not in src, mod.__name__


class TestIndexedBamReader:
    @pytest.mark.skipif(
        not os.path.exists(os.path.join(GIAB_DIR, "HG002_child.bam")),
        reason="GIAB data unavailable")
    def test_bai_fetch_matches_inmemory(self):
        from kmer_denovo_filter_tpu.htsio.bam import IndexedBamReader
        path = os.path.join(GIAB_DIR, "HG002_child.bam")
        full = BamReader(path)
        idx = IndexedBamReader(path)
        for (c, s, e) in [("chr8", 40003390, 40003391),
                          ("chr11", 55007000, 55007200),
                          ("chr7", 142780000, 142800000),
                          ("chr1", 0, 1000)]:
            a = sorted((r.query_name, r.flag, r.pos)
                       for r in full.fetch(c, s, e))
            b = sorted((r.query_name, r.flag, r.pos)
                       for r in idx.fetch(c, s, e))
            assert a == b, (c, s, e)

    def test_own_writer_roundtrip(self, tmp_path):
        from kmer_denovo_filter_tpu.htsio.bam import IndexedBamReader
        path = str(tmp_path / "t.bam")
        create_bam(path, "chr1", [
            (f"r{i}", i * 50, "ACGTACGTACGTACGTACGT")
            for i in range(40)
        ], ref_length=3000)
        idx = IndexedBamReader(path)
        got = [r.query_name for r in idx.fetch("chr1", 500, 520)]
        assert got == ["r10"]
        assert len(list(idx.fetch("chr1", 0, 3000))) == 40


class TestJellyfishWriter:
    def test_round_trip_engine_keys(self, tmp_path):
        from kmer_denovo_filter_tpu.htsio.jellyfish import (
            load_sorted_jf, write_sorted_jf)
        from kmer_denovo_filter_tpu.ops import encode as enc
        import random
        k = 31
        r = random.Random(11)
        kmers = set()
        while len(kmers) < 200:
            s = "".join(r.choice("ACGT") for _ in range(k))
            from kmer_denovo_filter_tpu import kmer as K
            kmers.add(K.canonicalize(s))
        keys = enc.kmers_to_keys(sorted(kmers), k)
        counts = [r.randrange(1, 1 << 20) for _ in range(len(kmers))]
        path = str(tmp_path / "x.jf")
        write_sorted_jf(path, keys, counts, k)
        gk, gc, gk_k = load_sorted_jf(path, expect_k=k)
        assert gk_k == k
        import numpy as np
        order = enc.lexsort_keys(keys)
        assert np.array_equal(gk, keys[order])
        assert np.array_equal(gc, np.asarray(counts)[order])

    def test_records_match_reference_format(self, tmp_path):
        """Re-encode the committed reference .jf: the 12-byte record
        multiset must be identical.  (Byte ORDER differs: jellyfish
        emits records in its internal matrix-hash order, which depends
        on the header's random hash matrix; this writer emits numeric
        key order.)"""
        import os
        ref_jf = os.path.join(GIAB_DIR, "mini_ref.fa.k31.jf")
        if not os.path.exists(ref_jf):
            import pytest
            pytest.skip("reference .jf unavailable")
        from kmer_denovo_filter_tpu.htsio.jellyfish import (
            load_sorted_jf, read_jf_header, write_sorted_jf)
        keys, counts, k = load_sorted_jf(ref_jf)
        out = str(tmp_path / "re.jf")
        write_sorted_jf(out, keys, counts, k)
        _m1, off1 = read_jf_header(ref_jf)
        _m2, off2 = read_jf_header(out)
        ref_body = open(ref_jf, "rb").read()[off1:]
        out_body = open(out, "rb").read()[off2:]
        assert len(out_body) == len(ref_body)
        recs = lambda b: sorted(b[i:i + 12]
                                for i in range(0, len(b), 12))
        assert recs(out_body) == recs(ref_body)

    def test_k_too_large_rejected(self, tmp_path):
        from kmer_denovo_filter_tpu.htsio.jellyfish import (
            JellyfishParseError, write_sorted_jf)
        import numpy as np
        import pytest
        with pytest.raises(JellyfishParseError):
            write_sorted_jf(str(tmp_path / "big.jf"),
                            np.zeros((1, 3), np.uint32), [1], 33)


class TestJellyfishHashFormat:
    """binary/hash .jf (quotiented matrix-hash) reader/writer."""

    def _table(self, n=300, k=31, seed=0):
        import numpy as np
        from kmer_denovo_filter_tpu.ops import encode as enc
        rng = np.random.default_rng(seed)
        kmers = sorted({"".join(np.array(list("ACGT"))[
            rng.integers(0, 4, k)]) for _ in range(n)})
        keys = enc.kmers_to_keys(kmers, k)
        counts = rng.integers(1, 1000, keys.shape[0]).astype("int64")
        return keys, counts

    def test_roundtrip(self, tmp_path):
        import numpy as np
        from kmer_denovo_filter_tpu.htsio import jellyfish as jf
        from kmer_denovo_filter_tpu.ops import encode as enc
        keys, counts = self._table()
        path = str(tmp_path / "t.jf")
        jf.write_hash_jf(path, keys, counts, 31)
        k2, c2, k = jf.load_hash_jf(path, expect_k=31)
        assert k == 31
        order = enc.lexsort_keys(k2)
        o = enc.lexsort_keys(keys)
        assert np.array_equal(k2[order], keys[o])
        assert np.array_equal(c2[order], counts[o])

    def test_format_conformance(self, tmp_path):
        """Header fields + slot layout match the documented format."""
        import json

        import numpy as np
        from kmer_denovo_filter_tpu.htsio import jellyfish as jf
        keys, counts = self._table(n=20, k=17, seed=1)
        path = str(tmp_path / "t.jf")
        jf.write_hash_jf(path, keys, counts, 17)
        raw = open(path, "rb").read()
        hlen = int(raw[:9])
        meta = json.loads(raw[9:9 + hlen])
        assert meta["format"] == "binary/hash"
        assert meta["key_len"] == 34
        assert meta["canonical"] is True
        assert meta["size"] & (meta["size"] - 1) == 0
        assert len(meta["matrix1"]["columns"]) == 34
        assert meta["reprobes"][0] == 0
        l = meta["size"].bit_length() - 1
        q_bytes = max(1, (meta["key_len"] - l + 7) // 8)
        slot_nb = 2 + q_bytes + meta["val_len"]
        data = raw[9 + hlen:]
        assert len(data) == meta["size"] * slot_nb
        occupied = sum(data[s * slot_nb] == 1
                       for s in range(meta["size"]))
        assert occupied == keys.shape[0]
        # every status byte is 0 or 1
        assert set(data[s * slot_nb] for s in range(meta["size"])) \
            <= {0, 1}

    def test_load_jf_dispatches_by_format(self, tmp_path):
        import numpy as np
        from kmer_denovo_filter_tpu.htsio import jellyfish as jf
        from kmer_denovo_filter_tpu.ops import encode as enc
        keys, counts = self._table(n=50, seed=2)
        sorted_path = str(tmp_path / "s.jf")
        hash_path = str(tmp_path / "h.jf")
        order = enc.lexsort_keys(keys)
        jf.write_sorted_jf(sorted_path, keys[order], counts[order], 31)
        jf.write_hash_jf(hash_path, keys, counts, 31)
        ks, cs, _ = jf.load_jf(sorted_path)
        kh, ch, _ = jf.load_jf(hash_path)
        oh = enc.lexsort_keys(kh)
        os_ = enc.lexsort_keys(ks)
        assert np.array_equal(kh[oh], ks[os_])
        assert np.array_equal(ch[oh], cs[os_])

    def test_k_mismatch_raises(self, tmp_path):
        import pytest as _pytest

        from kmer_denovo_filter_tpu.htsio import jellyfish as jf
        keys, counts = self._table(n=10, k=17, seed=3)
        path = str(tmp_path / "t.jf")
        jf.write_hash_jf(path, keys, counts, 17)
        with _pytest.raises(jf.JellyfishParseError,
                            match="k=17 index"):
            jf.load_hash_jf(path, expect_k=31)

    def test_truncated_raises(self, tmp_path):
        import pytest as _pytest

        from kmer_denovo_filter_tpu.htsio import jellyfish as jf
        keys, counts = self._table(n=10, seed=4)
        path = str(tmp_path / "t.jf")
        jf.write_hash_jf(path, keys, counts, 31)
        raw = open(path, "rb").read()
        open(path, "wb").write(raw[:len(raw) - 64])
        with _pytest.raises(jf.JellyfishParseError, match="truncated"):
            jf.load_hash_jf(path)

    def test_ref_jf_hash_format_accepted_by_discovery(self, tmp_path):
        """ensure_ref_index ingests a binary/hash --ref-jf."""
        import numpy as np
        from kmer_denovo_filter_tpu.discovery.pipeline import (
            ensure_ref_index)
        from kmer_denovo_filter_tpu.htsio import jellyfish as jf
        keys, counts = self._table(n=80, seed=5)
        path = str(tmp_path / "ref.jf")
        jf.write_hash_jf(path, keys, counts, 31)
        index = ensure_ref_index(str(tmp_path / "absent.fa"), 31,
                                 ref_jf=path)
        assert index.n == keys.shape[0]
        assert index.membership(keys).all()


class TestIndexedFetchProperty:
    def test_random_regions_match_whole_file_reader(self, tmp_path):
        """BAI-backed fetch equals the in-memory reader over many
        random regions of a synthetic multi-contig BAM."""
        import random as _random

        from kmer_denovo_filter_tpu.htsio.bam import (
            BamWriter,
            IndexedBamReader,
            encode_read,
        )

        rng = _random.Random(11)
        refs = [("chrA", 50_000), ("chrB", 30_000)]
        header = ("@HD\tVN:1.6\tSO:coordinate\n"
                  + "".join(f"@SQ\tSN:{n}\tLN:{ln}\n" for n, ln in refs))
        path = str(tmp_path / "multi.bam")
        w = BamWriter(path, header, refs)
        i = 0
        for tid, (name, ln) in enumerate(refs):
            for _ in range(400):
                pos = rng.randrange(0, ln - 100)
                seq = "".join(rng.choice("ACGT") for _ in range(80))
                raw = encode_read(f"q{i}", 0, tid, pos, 60,
                                  [(0, 80)], seq, [30] * 80)
                w.write_raw(tid, pos, raw)
                i += 1
        w.close(sort=True, index=True)

        full = BamReader(path)
        idx = IndexedBamReader(path)
        for _ in range(40):
            name, ln = refs[rng.randrange(2)]
            s = rng.randrange(0, ln)
            e = s + rng.randrange(1, 5000)
            a = sorted((r.query_name, r.flag, r.pos)
                       for r in full.fetch(name, s, e))
            b = sorted((r.query_name, r.flag, r.pos)
                       for r in idx.fetch(name, s, e))
            assert a == b, (name, s, e)
        # whole-contig and placed-only sweeps agree too
        a = sorted(r.query_name for r in full.fetch("chrB"))
        b = sorted(r.query_name for r in idx.fetch("chrB"))
        assert a == b and len(a) == 400
