"""Unit tests for the host-side k-mer semantics oracle."""

import pytest

from kmer_denovo_filter_tpu.kmer import (
    canonicalize,
    extract_read_kmers,
    extract_variant_spanning_kmers,
    is_symbolic,
    read_supports_alt,
    reverse_complement,
)
from kmer_denovo_filter_tpu.htsio.bam import AlignedRead, encode_read


def make_read(seq, pos=10, cigar=None, quals=None, name="r1", flag=0):
    raw = encode_read(name, flag, 0, pos, 60,
                      cigar or [(0, len(seq))], seq, quals)
    return AlignedRead(raw, [("chr1", 1000)])


class TestReverseComplement:
    def test_basic(self):
        assert reverse_complement("ACGT") == "ACGT"
        assert reverse_complement("AAAA") == "TTTT"
        assert reverse_complement("ACCGT") == "ACGGT"

    def test_lowercase(self):
        assert reverse_complement("acgt") == "acgt"

    def test_n_preserved(self):
        assert reverse_complement("ACNGT") == "ACNGT"


class TestCanonicalize:
    def test_picks_smaller(self):
        assert canonicalize("TTTTT") == "AAAAA"
        assert canonicalize("AAAAA") == "AAAAA"

    def test_idempotent(self):
        import random
        random.seed(7)
        for _ in range(200):
            kmer = "".join(random.choice("ACGT") for _ in range(21))
            c = canonicalize(kmer)
            assert canonicalize(c) == c
            assert c == min(kmer, reverse_complement(kmer))


class TestIsSymbolic:
    @pytest.mark.parametrize("allele,expected", [
        ("<DEL>", True), ("<INS>", True), ("*", True),
        ("A[chr2:100[", True), ("]chr2:100]A", True),
        ("", True), (None, True),
        ("A", False), ("ACGT", False),
    ])
    def test_cases(self, allele, expected):
        assert is_symbolic(allele) is expected


class TestExtractReadKmers:
    def test_short_read(self):
        assert extract_read_kmers("ACG", 5) == ({}, [])

    def test_all_windows(self):
        seq = "ACGTACGTA"
        cap, uniq = extract_read_kmers(seq, 5)
        assert set(cap) == set(range(5))
        for i, c in cap.items():
            assert c == canonicalize(seq[i:i + 5])

    def test_n_windows_skipped(self):
        seq = "ACGTNACGTAC"
        cap, _ = extract_read_kmers(seq, 5)
        assert all(i > 4 for i in cap)  # windows 0–4 contain the N

    def test_dedup_preserves_order(self):
        seq = "AAAAAAAA"
        cap, uniq = extract_read_kmers(seq, 4)
        assert uniq == ["AAAA"]
        assert len(cap) == 5

    def test_lowercase_uppercased(self):
        cap, _ = extract_read_kmers("acgtacgt", 5)
        assert cap[0] == canonicalize("ACGTA")


class TestReadSupportsAlt:
    def test_snp_supports(self):
        read = make_read("AAATAAA", pos=10)
        assert read_supports_alt(read, 13, "C", "T")
        assert not read_supports_alt(read, 13, "C", "G")

    def test_symbolic_false(self):
        read = make_read("AAATAAA", pos=10)
        assert not read_supports_alt(read, 13, "C", "<DEL>")
        assert not read_supports_alt(read, 13, "C", None)

    def test_insertion(self):
        # read has a 2bp insertion after ref pos 12: ref AAA|AAA,
        # read AAA TT AAA with cigar 3M2I3M starting at 10
        read = make_read("AAATTAAA", pos=10, cigar=[(0, 3), (1, 2), (0, 3)])
        assert read_supports_alt(read, 12, "A", "ATT")
        assert not read_supports_alt(read, 12, "A", "A")

    def test_deletion(self):
        # 3M2D3M: ref positions 10-17, read misses ref 13,14
        read = make_read("AAAAAA", pos=10, cigar=[(0, 3), (2, 2), (0, 3)])
        assert read_supports_alt(read, 12, "AAA", "A")

    def test_min_baseq_fails(self):
        read = make_read("AAATAAA", pos=10, quals=[40, 40, 40, 5, 40, 40, 40])
        assert not read_supports_alt(read, 13, "C", "T", min_baseq=20)
        assert read_supports_alt(read, 13, "C", "T", min_baseq=0)

    def test_variant_before_read(self):
        read = make_read("AAATAAA", pos=10)
        assert not read_supports_alt(read, 5, "C", "T")


class TestExtractVariantSpanningKmers:
    def test_snp_window(self):
        seq = "ACGTACGTACGTACGTACGT"
        read = make_read(seq, pos=100)
        k = 5
        kmers = extract_variant_spanning_kmers(read, 110, k)
        expected = {canonicalize(seq[s:s + k]) for s in range(6, 11)}
        assert kmers == expected

    def test_variant_not_covered(self):
        read = make_read("ACGTACGT", pos=100)
        assert extract_variant_spanning_kmers(read, 200, 5) == set()

    def test_deleted_base_returns_empty(self):
        # variant position falls inside the deletion
        read = make_read("AAAAAA", pos=10, cigar=[(0, 3), (2, 2), (0, 3)])
        assert extract_variant_spanning_kmers(read, 13, 3) == set()

    def test_insertion_widens_window(self):
        seq = "ACGTTGCAATCCGGATTAGC"  # non-periodic: distinct k-mers
        read = make_read(seq, pos=100, cigar=[(0, 8), (1, 4), (0, 8)])
        k = 5
        with_alt = extract_variant_spanning_kmers(
            read, 107, k, ref="A", alt="AGGGG")
        without = extract_variant_spanning_kmers(read, 107, k)
        assert with_alt >= without
        assert len(with_alt) > len(without)

    def test_low_quality_window_skipped(self):
        seq = "ACGTACGTACGTACGTACGT"
        quals = [40] * len(seq)
        quals[10] = 2  # kills windows covering index 10
        read = make_read(seq, pos=100, quals=quals)
        k = 5
        kmers = extract_variant_spanning_kmers(read, 108, k, min_baseq=20)
        expected = {canonicalize(seq[s:s + k])
                    for s in range(4, 9) if not (s <= 10 < s + k)}
        assert kmers == expected

    def test_n_window_skipped(self):
        seq = "ACGTACGTACNTACGTACGT"
        read = make_read(seq, pos=100)
        kmers = extract_variant_spanning_kmers(read, 108, 5)
        expected = {canonicalize(seq[s:s + 5])
                    for s in range(4, 9) if "N" not in seq[s:s + 5]}
        assert kmers == expected


class TestReadSupportsAltMnpComplex:
    def test_mnp_supports(self):
        # ref CC -> alt TT at positions 13-14
        read = make_read("AAATTAA", pos=10)
        assert read_supports_alt(read, 13, "CC", "TT")
        assert not read_supports_alt(read, 13, "CC", "TA")

    def test_mnp_partial_match_fails(self):
        read = make_read("AAATCAA", pos=10)  # read has TC, alt is TT
        assert not read_supports_alt(read, 13, "CC", "TT")

    def test_complex_substitution(self):
        # ref AA (13-14) -> alt TTT: 2M replaced, insertion inside
        # read: AAA TTT AA  cigar 3M (13,14 consumed by) 2M→ need
        # aligned pairs covering ref span 13-14 gathering TTT
        read = make_read("AAATTTAA", pos=10,
                         cigar=[(0, 4), (1, 1), (0, 3)])
        # ref span 13..14; read gathers pos 3 (T at ref13), inserted
        # T (qpos4), then T at ref14 → "TTT"
        assert read_supports_alt(read, 13, "AA", "TTT")

    def test_deletion_with_flanking_mismatch_fails(self):
        # deletion read but anchor base differs from alt
        read = make_read("AAGAAA", pos=10, cigar=[(0, 3), (2, 2), (0, 3)])
        assert not read_supports_alt(read, 12, "AAA", "A")

    def test_alt_case_insensitive(self):
        read = make_read("AAATAAA", pos=10)
        assert read_supports_alt(read, 13, "c", "t")

    def test_variant_at_read_end_partial_span_fails(self):
        # MNP whose span extends past the read end gathers a shorter
        # string than alt → no support
        read = make_read("AAAT", pos=10)
        assert not read_supports_alt(read, 13, "CC", "TT")

    def test_low_quality_inside_indel_span_fails(self):
        read = make_read("AAATTAAA", pos=10,
                         cigar=[(0, 3), (1, 2), (0, 3)],
                         quals=[40, 40, 40, 40, 5, 40, 40, 40])
        assert not read_supports_alt(read, 12, "A", "ATT",
                                     min_baseq=20)
        assert read_supports_alt(read, 12, "A", "ATT", min_baseq=0)


class TestExtractVariantSpanningKmersMore:
    def test_window_count_interior(self):
        # 20bp read, k=7, variant mid-read: k windows cover it
        seq = "ACGTACGTACGTACGTACGT"
        read = make_read(seq, pos=100)
        kmers = extract_variant_spanning_kmers(read, 110, 7)
        # starts from max(0, 10-6)=4 .. min(13, 10) → 7 windows
        expected = {canonicalize(seq[s:s + 7]) for s in range(4, 11)}
        assert kmers == expected

    def test_variant_near_read_start_truncates(self):
        seq = "ACGTACGTACGT"
        read = make_read(seq, pos=100)
        kmers = extract_variant_spanning_kmers(read, 101, 5)
        expected = {canonicalize(seq[s:s + 5]) for s in range(0, 2)}
        assert kmers == expected

    def test_deletion_read_skips_locus(self):
        # read deletes ref 13-14 → variant base not in read
        read = make_read("AAAAAA", pos=10, cigar=[(0, 3), (2, 2), (0, 3)])
        assert extract_variant_spanning_kmers(read, 13, 5) == set()

    def test_canonical_form_returned(self):
        seq = "TTTTTTTTTT"
        read = make_read(seq, pos=50)
        kmers = extract_variant_spanning_kmers(read, 55, 5)
        assert kmers == {"AAAAA"}  # canonical of TTTTT

    def test_soft_clipped_read(self):
        # 3S followed by 7M: variant at ref pos 12 maps to qpos 5
        seq = "GGGACGTACG"
        read = make_read(seq, pos=10, cigar=[(4, 3), (0, 7)])
        kmers = extract_variant_spanning_kmers(read, 12, 5)
        # read pos of variant = 5; windows may include clipped bases
        expected = {canonicalize(seq[s:s + 5]) for s in range(1, 6)}
        assert kmers == expected


class TestOracleVsDeviceCross:
    """Host oracle and device extraction agree on random reads."""

    @pytest.mark.parametrize("k", [5, 15, 31])
    def test_extract_read_kmers_matches_device(self, k):
        import numpy as np
        from kmer_denovo_filter_tpu.ops import device as dev
        from kmer_denovo_filter_tpu.ops import encode as enc

        rng = np.random.default_rng(42 + k)
        bases = np.array(list("ACGT"))
        length = 64
        seqs = ["".join(bases[rng.integers(0, 4, length)])
                for _ in range(8)]
        # inject an N
        seqs[3] = seqs[3][:20] + "N" + seqs[3][21:]

        codes = np.stack([
            enc.ASCII_TO_CODE[np.frombuffer(s.encode(), np.uint8)]
            for s in seqs])
        lengths = np.full(len(seqs), length, np.int32)
        keys, valid = dev.extract_canonical_windows(codes, lengths, k)
        keys = np.asarray(keys)
        valid = np.asarray(valid)
        for i, s in enumerate(seqs):
            want = []
            for st in range(length - k + 1):
                win = s[st:st + k]
                if "N" in win:
                    assert not valid[i, st]
                    continue
                assert valid[i, st]
                want.append(canonicalize(win))
            vrows = keys[i][valid[i, : length - k + 1]]
            got = enc.keys_to_kmers(vrows, k)
            assert got == want
