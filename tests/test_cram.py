"""CRAM 3.0 reader/writer tests: codecs, round trips, feature codes,
mates, unmapped reads, open_bam dispatch, and pipeline parity vs BAM.

Mirrors the reference's CRAM acceptance surface (reference cli.py:13-24
— CRAM anywhere a BAM is accepted, ref FASTA required).  These tests
cover the codecs with self round-trips and hand-computed bit patterns;
third-party interchange against a REAL htslib samtools (both
directions) lives in tests/test_cram_conformance.py, which runs
wherever samtools is on PATH (installed by the CI workflow).
"""

import os
import random
import struct

import pytest

from kmer_denovo_filter_tpu.htsio import cram_codecs as cc
from kmer_denovo_filter_tpu.htsio.bam import BamReader, open_bam
from kmer_denovo_filter_tpu.htsio.cram import (
    CramReader, CramWriter, _Decoder, cram_to_bam, split_bam_tags)
from kmer_denovo_filter_tpu.htsio.cram_codecs import (
    BitReader, BitWriter, read_itf8, read_ltf8, write_itf8, write_ltf8)
from tests.helpers import (
    create_bam, create_bam_with_flags, create_ref_fasta)


class TestVarints:
    def test_itf8_boundaries(self):
        for v in (0, 1, 127, 128, 0x3FFF, 0x4000, 0x1FFFFF, 0x200000,
                  0xFFFFFFF, 0x10000000, 0xFFFFFFFF):
            b = write_itf8(v)
            got, pos = read_itf8(b, 0)
            assert got == v and pos == len(b)

    def test_itf8_random(self):
        r = random.Random(1)
        for _ in range(500):
            v = r.randrange(1 << 32)
            got, _pos = read_itf8(write_itf8(v), 0)
            assert got == v

    def test_ltf8_boundaries(self):
        for v in (0, 127, 128, 1 << 20, (1 << 55) - 1, 1 << 55,
                  (1 << 63), (1 << 64) - 1):
            b = write_ltf8(v)
            got, pos = read_ltf8(b, 0)
            assert got == v and pos == len(b)

    def test_ltf8_random(self):
        r = random.Random(2)
        for _ in range(500):
            v = r.randrange(1 << 64)
            got, _pos = read_ltf8(write_ltf8(v), 0)
            assert got == v


class TestBitIO:
    def test_round_trip(self):
        r = random.Random(3)
        vals = [(r.randrange(1 << n), n)
                for n in range(1, 25) for _ in range(10)]
        bw = BitWriter()
        for v, n in vals:
            bw.write(v, n)
        br = BitReader(bw.getvalue())
        for v, n in vals:
            assert br.read(n) == v


class TestRans:
    @pytest.mark.parametrize("order", [0, 1])
    def test_round_trip(self, order):
        r = random.Random(4)
        cases = [b"", b"x", b"AAAA" * 64,
                 bytes(r.randrange(256) for _ in range(5000)),
                 bytes(r.choice(b"ACGT!") for _ in range(20000))]
        for data in cases:
            assert cc.rans_decompress(
                cc.rans_compress(data, order)) == data

    def test_compresses_skewed_data(self):
        data = bytes(random.Random(5).choice(b"AC") for _ in range(8192))
        comp = cc.rans_compress(data, 0)
        assert len(comp) < len(data) // 2

    def test_block_methods(self):
        data = b"the quick brown fox" * 50
        for method in (cc.METHOD_RAW, cc.METHOD_RANS):
            blob = data if method == cc.METHOD_RAW \
                else cc.rans_compress(data, 1)
            assert cc.decompress_block(method, blob, len(data)) == data


class TestCoreEncodings:
    """Decoder unit tests against hand-computed bit patterns."""

    def _core(self, bits_str):
        bw = BitWriter()
        for ch in bits_str:
            bw.write(int(ch), 1)
        return BitReader(bw.getvalue())

    def test_beta(self):
        # BETA(offset=0, nbits=4): 0b0101 -> 5
        params = write_itf8(0) + write_itf8(4)
        d = _Decoder(6, params, {}, self._core("0101"))
        assert d.read_int() == 5

    def test_gamma(self):
        # Elias gamma of 5 = 00101; offset 0
        params = write_itf8(0)
        d = _Decoder(9, params, {}, self._core("00101"))
        assert d.read_int() == 5

    def test_subexp(self):
        # SUBEXP(offset=0, k=2): u=0 -> k bits: "0" + "11" = 3
        params = write_itf8(0) + write_itf8(2)
        d = _Decoder(7, params, {}, self._core("011"))
        assert d.read_int() == 3
        # u=1 -> 1<<(1+2-1) | 2 bits: "10" + "01" = 4|1 = 5
        d = _Decoder(7, params, {}, self._core("1001"))
        assert d.read_int() == 5

    def test_huffman_single_symbol(self):
        params = write_itf8(1) + write_itf8(42) \
            + write_itf8(1) + write_itf8(0)
        d = _Decoder(3, params, {}, self._core(""))
        assert d.read_int() == 42
        assert d.read_int() == 42  # consumes no bits

    def test_huffman_canonical(self):
        # symbols 1,2,3 with lengths 1,2,2 -> codes 0,10,11
        params = write_itf8(3) + b"".join(map(write_itf8, (1, 2, 3))) \
            + write_itf8(3) + b"".join(map(write_itf8, (1, 2, 2)))
        d = _Decoder(3, params, {}, self._core("0" "10" "11" "0"))
        assert [d.read_int() for _ in range(4)] == [1, 2, 3, 1]


@pytest.fixture()
def trio_dir(tmp_path):
    ref_path = str(tmp_path / "ref.fa")
    seq = create_ref_fasta(ref_path, "chr1", 600)
    return tmp_path, ref_path, seq


def _round_trip(tmp_path, ref_path, bam):
    br = BamReader(bam)
    cram = str(tmp_path / "rt.cram")
    cw = CramWriter(cram, br.header_text, br.refs)
    cw.set_reference(ref_path)
    for rd in br.records:
        cw.write(rd)
    cw.close()
    return br.records, CramReader(cram, ref_path).records, cram


def _assert_same(a, b):
    assert a.query_name == b.query_name
    assert a.flag == b.flag
    assert a.tid == b.tid
    assert a.pos == b.pos
    assert a.mapping_quality == b.mapping_quality
    assert a.cigartuples == b.cigartuples
    assert a.query_sequence == b.query_sequence
    assert (a.query_qualities or None) == (b.query_qualities or None)
    assert sorted(split_bam_tags(a.raw_tags())) == \
        sorted(split_bam_tags(b.raw_tags()))


class TestRoundTrip:
    def test_substitutions_and_matches(self, trio_dir):
        tmp_path, ref_path, seq = trio_dir
        reads = []
        for i in range(25):
            start = (i * 17) % 400
            s = seq[start:start + 120]
            if i % 2:
                alt = "ACGT"[(("ACGT".index(s[7]) + 1) % 4)]
                s = s[:7] + alt + s[8:]
            reads.append((f"r{i:03d}", start, s))
        bam = str(tmp_path / "in.bam")
        create_bam(bam, "chr1", reads, ref_length=600)
        orig, back, cram = _round_trip(tmp_path, ref_path, bam)
        assert len(back) == len(orig)
        for a, b in zip(orig, back):
            _assert_same(a, b)
        # substitution-coded CRAM stays compact: sequences come from
        # the reference, not verbatim bases
        assert os.path.getsize(cram) < os.path.getsize(bam) * 2

    def test_indel_softclip_features(self, trio_dir):
        tmp_path, ref_path, seq = trio_dir
        s0 = seq[50:150]
        reads = [
            # 30M 5I 65M
            ("ins", 50, s0[:30] + "ACGTA" + s0[30:95], None,
             [(0, 30), (1, 5), (0, 65)]),
            # 40M 6D 60M
            ("del", 50, s0[:40] + seq[96:156], None,
             [(0, 40), (2, 6), (0, 60)]),
            # 10S 80M 10S
            ("clip", 60, "TTTTTTTTTT" + seq[60:140] + "GGGGGGGGGG",
             None, [(4, 10), (0, 80), (4, 10)]),
            # 5H 90M with one substitution
            ("hard", 50,
             ("A" if s0[0] != "A" else "C") + s0[1:90], None,
             [(5, 5), (0, 90)]),
            # 20M 1000N 20M (spliced)
            ("skip", 50, s0[:20] + seq[1070:1090] if len(seq) > 1090
             else s0[:20] + s0[20:40], None,
             [(0, 20), (3, 30), (0, 20)]),
            # single-base insertion
            ("ins1", 50, s0[:10] + "G" + s0[10:49], None,
             [(0, 10), (1, 1), (0, 39)]),
        ]
        bam = str(tmp_path / "indel.bam")
        create_bam(bam, "chr1", reads, ref_length=600)
        orig, back, _ = _round_trip(tmp_path, ref_path, bam)
        for a, b in zip(orig, back):
            _assert_same(a, b)

    def test_pairs_flags_tags(self, trio_dir):
        tmp_path, ref_path, seq = trio_dir
        reads = [
            {"name": "p1", "chrom_idx": 0, "pos": 100,
             "seq": seq[100:200], "flag": 0x63, "mapq": 55,
             "sa_tag": "chr1,400,+,50M50S,60,0;"},
            {"name": "p1", "chrom_idx": 0, "pos": 300,
             "seq": seq[300:400], "flag": 0x93},
            {"name": "sup", "chrom_idx": 0, "pos": 150,
             "seq": seq[150:220], "flag": 0x800},
        ]
        bam = str(tmp_path / "pairs.bam")
        create_bam_with_flags(bam, ["chr1"], [600], reads)
        orig, back, _ = _round_trip(tmp_path, ref_path, bam)
        for a, b in zip(orig, back):
            _assert_same(a, b)
            assert a.next_tid == b.next_tid
            assert a.next_pos == b.next_pos
            assert a.tlen == b.tlen

    def test_unmapped_reads(self, trio_dir):
        tmp_path, ref_path, seq = trio_dir
        reads = [
            {"name": "u1", "chrom_idx": -1, "pos": -1,
             "seq": "ACGTACGTACGTACGT", "flag": 0x4, "mapq": 0,
             "cigar": []},
            {"name": "m1", "chrom_idx": 0, "pos": 10,
             "seq": seq[10:60], "flag": 0},
        ]
        bam = str(tmp_path / "unmapped.bam")
        create_bam_with_flags(bam, ["chr1"], [600], reads)
        orig, back, _ = _round_trip(tmp_path, ref_path, bam)
        assert len(back) == 2
        by_name = {r.query_name: r for r in back}
        assert by_name["u1"].is_unmapped
        assert by_name["u1"].query_sequence == "ACGTACGTACGTACGT"
        for a in orig:
            _assert_same(a, by_name[a.query_name])

    def test_multi_container(self, trio_dir):
        tmp_path, ref_path, seq = trio_dir
        reads = [(f"r{i}", i % 300, seq[i % 300:i % 300 + 80])
                 for i in range(57)]
        bam = str(tmp_path / "many.bam")
        create_bam(bam, "chr1", reads, ref_length=600)
        br = BamReader(bam)
        cram = str(tmp_path / "many.cram")
        cw = CramWriter(cram, br.header_text, br.refs,
                        records_per_slice=10)
        cw.set_reference(ref_path)
        for rd in br.records:
            cw.write(rd)
        cw.close()
        back = CramReader(cram, ref_path).records
        assert len(back) == 57
        for a, b in zip(br.records, back):
            _assert_same(a, b)


class TestIntegration:
    def test_open_bam_dispatch(self, trio_dir):
        tmp_path, ref_path, seq = trio_dir
        reads = [(f"r{i}", 20 * i, seq[20 * i:20 * i + 90])
                 for i in range(12)]
        bam = str(tmp_path / "d.bam")
        create_bam(bam, "chr1", reads, ref_length=600)
        _orig, _back, cram = _round_trip(tmp_path, ref_path, bam)
        reader = open_bam(cram, reference_filename=ref_path)
        got = sorted(r.query_name for r in reader.fetch("chr1", 0, 600))
        assert got == sorted(n for n, _p, _s in reads)
        assert os.path.exists(cram + ".converted.bam")
        # cache reused (no re-conversion): mtime stable across reopen
        m1 = os.path.getmtime(cram + ".converted.bam")
        open_bam(cram, reference_filename=ref_path)
        assert os.path.getmtime(cram + ".converted.bam") == m1

    def test_cram_to_bam_sorted_indexed(self, trio_dir):
        tmp_path, ref_path, seq = trio_dir
        reads = [("b", 200, seq[200:280]), ("a", 50, seq[50:130])]
        bam = str(tmp_path / "s.bam")
        create_bam(bam, "chr1", reads, ref_length=600)
        _o, _b, cram = _round_trip(tmp_path, ref_path, bam)
        out = str(tmp_path / "conv.bam")
        cram_to_bam(cram, out, ref_path)
        assert os.path.exists(out + ".bai")
        recs = BamReader(out).records
        assert [r.pos for r in recs] == sorted(r.pos for r in recs)

    def test_vcf_pipeline_cram_matches_bam(self, tmp_path):
        """Full VCF-mode run from CRAM trio == run from BAM trio."""
        import gzip

        from kmer_denovo_filter_tpu.cli import parse_args
        from kmer_denovo_filter_tpu.pipeline import run_pipeline
        from tests.vcf.test_pipeline import K, _tiled_reads
        from tests.helpers import create_vcf

        ref_path = str(tmp_path / "ref.fa")
        seq = create_ref_fasta(ref_path, "chr1", 300)
        mpos = 100
        alt = "T" if seq[mpos] != "T" else "A"
        paths = {}
        for who, mutate in (("child", (mpos, alt)), ("mother", None),
                            ("father", None)):
            bam = str(tmp_path / f"{who}.bam")
            create_bam(bam, "chr1",
                       _tiled_reads(seq, who[0], 40, 240,
                                    mutate=mutate,
                                    het=bool(mutate)))
            br = BamReader(bam)
            cram = str(tmp_path / f"{who}.cram")
            cw = CramWriter(cram, br.header_text, br.refs)
            cw.set_reference(ref_path)
            for rd in br.records:
                cw.write(rd)
            cw.close()
            # satisfy the index-presence validation for CRAM inputs
            open(cram + ".crai", "wb").close()
            paths[who] = (bam, cram)
        vcf = str(tmp_path / "cand.vcf.gz")
        create_vcf(vcf, "chr1", [(mpos + 1, seq[mpos], alt)])

        outs = {}
        for kind in ("bam", "cram"):
            out = str(tmp_path / f"out_{kind}.vcf.gz")
            sel = 0 if kind == "bam" else 1
            args = parse_args([
                "--child", paths["child"][sel],
                "--mother", paths["mother"][sel],
                "--father", paths["father"][sel],
                "--vcf", vcf, "--output", out,
                "--metrics", str(tmp_path / f"m_{kind}.json"),
                "--kmer-size", str(K), "--min-baseq", "0",
                "--ref-fasta", ref_path,
            ])
            run_pipeline(args)
            body = [l for l in gzip.open(out, "rt")
                    if not l.startswith("##")]
            outs[kind] = "".join(body)
        assert outs["cram"] == outs["bam"]

    def test_discovery_pipeline_cram_matches_bam(self, tmp_path):
        """Discovery-mode run from a CRAM trio == run from BAM trio."""
        from kmer_denovo_filter_tpu.cli import parse_discovery_args
        from kmer_denovo_filter_tpu.discovery.pipeline import (
            run_discovery_pipeline)
        from tests.discovery.test_pipeline import K as DK, _tiled

        ref_path = str(tmp_path / "ref.fa")
        seq = create_ref_fasta(ref_path, "chr1", 400)
        novel = "ACGTTGCAATCCGGATTAGC"
        paths = {}
        for who, ins in (("child", (150, novel)), ("mother", None),
                         ("father", None)):
            bam = str(tmp_path / f"{who}.bam")
            create_bam(bam, "chr1",
                       _tiled(seq, who[0], 40, 360, insert=ins),
                       ref_length=400)
            br = BamReader(bam)
            cram = str(tmp_path / f"{who}.cram")
            cw = CramWriter(cram, br.header_text, br.refs)
            cw.set_reference(ref_path)
            for rd in br.records:
                cw.write(rd)
            cw.close()
            open(cram + ".crai", "wb").close()
            paths[who] = (bam, cram)

        beds = {}
        for kind in ("bam", "cram"):
            sel = 0 if kind == "bam" else 1
            prefix = str(tmp_path / f"disc_{kind}")
            args = parse_discovery_args([
                "--child", paths["child"][sel],
                "--mother", paths["mother"][sel],
                "--father", paths["father"][sel],
                "--ref-fasta", ref_path, "--out-prefix", prefix,
                "--kmer-size", str(DK), "--min-child-count", "2",
            ])
            run_discovery_pipeline(args)
            beds[kind] = open(prefix + ".bed").read()
        assert beds["cram"] == beds["bam"]
        assert "chr1" in beds["bam"]


class TestWriterVariants:
    """Reader paths our default profile never emits: AP-delta
    positions and unpreserved (detached-carried) read names."""

    @pytest.mark.parametrize("ap_delta,preserve",
                             [(True, True), (False, False),
                              (True, False)])
    def test_round_trip(self, tmp_path, ap_delta, preserve):
        ref_path = str(tmp_path / "ref.fa")
        seq = create_ref_fasta(ref_path, "chr1", 600)
        reads = [(f"v{i}", 13 * i, seq[13 * i:13 * i + 70])
                 for i in range(20)]
        bam = str(tmp_path / "v.bam")
        create_bam(bam, "chr1", reads, ref_length=600)
        br = BamReader(bam)
        cram = str(tmp_path / "v.cram")
        cw = CramWriter(cram, br.header_text, br.refs,
                        ap_delta=ap_delta, preserve_names=preserve)
        cw.set_reference(ref_path)
        for rd in br.records:
            cw.write(rd)
        cw.close()
        back = CramReader(cram, ref_path).records
        assert len(back) == len(br.records)
        for a, b in zip(br.records, back):
            _assert_same(a, b)


def test_cram_to_bam_spill_merge_matches_in_memory(tmp_path,
                                                   monkeypatch):
    """The external-sort spill path (WGS memory bound) produces a BAM
    identical to the single-chunk path."""
    from kmer_denovo_filter_tpu.htsio import cram as cram_mod

    ref_path = str(tmp_path / "ref.fa")
    seq = create_ref_fasta(ref_path, "chr1", 600)
    # unsorted on purpose so the merge actually has to sort
    reads = [(f"r{i}", pos, seq[pos:pos + 60])
             for i, pos in enumerate([500, 20, 340, 90, 250, 410, 5,
                                      170, 300, 60, 450, 130])]
    bam = str(tmp_path / "in.bam")
    create_bam(bam, "chr1", reads, ref_length=600)
    br = BamReader(bam)
    cram = str(tmp_path / "in.cram")
    cw = CramWriter(cram, br.header_text, br.refs)
    cw.set_reference(ref_path)
    for rec in br.records:
        cw.write(rec)
    cw.close()

    big = str(tmp_path / "one_chunk.bam")
    cram_to_bam(cram, big, ref_path)

    monkeypatch.setattr(cram_mod, "_CRAM_SPILL_RECORDS", 3)
    spilled = str(tmp_path / "spilled.bam")
    cram_mod.cram_to_bam(cram, spilled, ref_path)

    a = [(r.query_name, r.pos, r.query_sequence)
         for r in BamReader(big).records]
    b = [(r.query_name, r.pos, r.query_sequence)
         for r in BamReader(spilled).records]
    assert a == b
    assert [p for _n, p, _s in a] == sorted(p for _n, p, _s in a)
    assert os.path.exists(spilled + ".bai")
