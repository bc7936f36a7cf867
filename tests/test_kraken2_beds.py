"""Kraken2 companion BED writers: units, sort order, tabix contract.

Mirrors the reference's dedicated BED suite (reference
tests/test_kraken2_bed.py, 1,057 LoC): vote-string parsing, the three
writers' column layouts, DKA/DKU attribution, guard columns,
coordinate sort order, soft-clip expansion and tabix queryability —
all with fabricated classification results (no kraken2 binary).
"""

import gzip

import pytest

from kmer_denovo_filter_tpu.htsio.tabix import TabixFile
from kmer_denovo_filter_tpu.kraken2_beds import (
    _extract_softclips,
    parse_kmer_votes,
    write_kraken2_expanded_span_bed,
    write_kraken2_read_detail_bed,
    write_kraken2_span_bed,
)

NAME_MAP = {9606: "Homo_sapiens", 562: "Escherichia_coli",
            2: "Bacteria"}


class TestParseKmerVotes:
    def test_empty_string(self):
        assert parse_kmer_votes("") == ("", "", 0, 0)

    def test_basic_votes(self):
        votes, named, total, human = parse_kmer_votes(
            "562:10 9606:5 0:3", NAME_MAP)
        assert votes == "562:10;9606:5;0:3"
        assert named == "Escherichia_coli:10;Homo_sapiens:5;unclassified:3"
        assert total == 18
        assert human == 5

    def test_paired_segments_merge(self):
        """|:| separates read-pair segments; counts aggregate."""
        votes, _named, total, human = parse_kmer_votes(
            "9606:4 |:| 9606:6 562:1", NAME_MAP)
        assert votes.startswith("9606:10")
        assert total == 11
        assert human == 10

    def test_ambiguous_tokens_skipped(self):
        votes, _n, total, _h = parse_kmer_votes("A:5 562:2", NAME_MAP)
        assert votes == "562:2"
        assert total == 2

    def test_top_n_capped_and_ordered(self):
        s = " ".join(f"{tid}:{tid}" for tid in range(1, 30))
        votes, _n, _t, _h = parse_kmer_votes(s, None, top_n=10)
        entries = votes.split(";")
        assert len(entries) == 10
        counts = [int(e.split(":")[1]) for e in entries]
        assert counts == sorted(counts, reverse=True)

    def test_unknown_taxid_renders_numeric(self):
        _v, named, _t, _h = parse_kmer_votes("777:3", NAME_MAP)
        assert named == "777:3"


class TestSoftclips:
    def test_both_sides(self):
        # 5S 50M 3S
        assert _extract_softclips([(4, 5), (0, 50), (4, 3)]) == (5, 3)

    def test_no_clips(self):
        assert _extract_softclips([(0, 60)]) == (0, 0)

    def test_hard_clips_ignored(self):
        # 10H 60M: hard clips consume nothing
        assert _extract_softclips([(5, 10), (0, 60)]) == (0, 0)

    def test_none_cigar(self):
        assert _extract_softclips(None) == (0, 0)


class _FakeResult:
    def __init__(self, per_read_detail):
        self.per_read_detail = per_read_detail


def _detail(taxid=562, status="C", domain="bacteria",
            guard="classified_nonhuman", nonhuman=True,
            kmers="562:20 9606:2"):
    return {"taxid": taxid, "status": status, "domain": domain,
            "guard_status": guard, "is_nonhuman": nonhuman,
            "kmer_string": kmers}


@pytest.fixture
def bed_inputs():
    reads_by_variant = {
        "chr1:100:A:T": {"r1", "r2"},
        "chr1:300:C:G": {"r3"},
        "chr2:50:G:A": {"r4"},
    }
    alt_reads_by_variant = {"chr1:100:A:T": {"r2"}}
    result = _FakeResult({
        "r1": _detail(taxid=9606, domain="human", nonhuman=False,
                      guard="human_lineage", kmers="9606:25"),
        "r2": _detail(),
        "r3": _detail(status="U", taxid=0, domain="unclassified",
                      guard="unclassified", kmers="0:12"),
        "r4": _detail(taxid=777, kmers="777:9"),
    })
    return reads_by_variant, alt_reads_by_variant, result


class TestReadDetailBed:
    def _write(self, tmp_path, bed_inputs):
        path = str(tmp_path / "detail.bed.gz")
        write_kraken2_read_detail_bed(path, bed_inputs[0],
                                      bed_inputs[1], bed_inputs[2],
                                      NAME_MAP)
        with gzip.open(path, "rt") as fh:
            lines = fh.read().rstrip("\n").split("\n")
        return path, lines[0].split("\t"), [
            l.split("\t") for l in lines[1:]]

    def test_columns(self, tmp_path, bed_inputs):
        _p, header, _rows = self._write(tmp_path, bed_inputs)
        assert header[:5] == ["#chrom", "chromStart", "chromEnd",
                              "variant", "read_name"]
        assert "kmer_votes_named" in header
        assert "guard_status" in header

    def test_sorted_by_chrom_pos_read(self, tmp_path, bed_inputs):
        _p, _h, rows = self._write(tmp_path, bed_inputs)
        keys = [(r[0], int(r[1]), r[4]) for r in rows]
        assert keys == sorted(keys)

    def test_dka_vs_dku_attribution(self, tmp_path, bed_inputs):
        _p, header, rows = self._write(tmp_path, bed_inputs)
        col = header.index("read_set")
        by_read = {r[4]: r[col] for r in rows}
        assert by_read["r2"] == "DKA"
        assert by_read["r1"] == "DKU"

    def test_unclassified_renders_dot_taxon(self, tmp_path,
                                            bed_inputs):
        _p, header, rows = self._write(tmp_path, bed_inputs)
        taxon = header.index("assigned_taxon")
        r3 = next(r for r in rows if r[4] == "r3")
        assert r3[taxon] == "."

    def test_unknown_taxid_renders_number(self, tmp_path, bed_inputs):
        _p, header, rows = self._write(tmp_path, bed_inputs)
        taxon = header.index("assigned_taxon")
        r4 = next(r for r in rows if r[4] == "r4")
        assert r4[taxon] == "777"

    def test_tabix_queryable(self, tmp_path, bed_inputs):
        path, _h, _rows = self._write(tmp_path, bed_inputs)
        tbx = TabixFile(path)
        hits = list(tbx.query("chr1", 90, 110))
        assert len(hits) == 2
        assert all(h.split("\t")[0] == "chr1" for h in hits)
        assert list(tbx.query("chr2", 45, 55))
        assert not list(tbx.query("chr1", 5000, 6000))


def _meta(chrom="chr1", start=100, end=160, mapq=60, scl=0, scr=0,
          sa=False, supp=False):
    return {"chrom": chrom, "start": start, "end": end, "mapq": mapq,
            "softclip_left": scl, "softclip_right": scr,
            "has_sa": sa, "is_supplementary": supp}


class TestSpanBeds:
    @pytest.fixture
    def span_inputs(self, bed_inputs):
        reads_by_variant, alt_by_variant, result = bed_inputs
        alignment_meta = {
            "r1": [_meta(start=90, end=150)],
            "r2": [_meta(start=95, end=155, scl=10, scr=4, sa=True),
                   _meta(chrom="chr2", start=500, end=520,
                         supp=True, sa=True)],
            "r3": [_meta(start=290, end=350)],
            "r4": [_meta(chrom="chr2", start=40, end=100)],
        }
        return alignment_meta, reads_by_variant, alt_by_variant, result

    def _load(self, path):
        with gzip.open(path, "rt") as fh:
            lines = fh.read().rstrip("\n").split("\n")
        return lines[0].split("\t"), [l.split("\t") for l in lines[1:]]

    def test_span_rows_and_order(self, tmp_path, span_inputs):
        path = str(tmp_path / "span.bed.gz")
        write_kraken2_span_bed(path, *span_inputs, NAME_MAP)
        header, rows = self._load(path)
        assert header[-2:] == ["is_split", "is_supplementary"]
        # one row per alignment record (r2 has two)
        assert len(rows) == 5
        keys = [(r[0], int(r[1])) for r in rows]
        assert keys == sorted(keys)

    def test_split_and_supplementary_flags(self, tmp_path,
                                           span_inputs):
        path = str(tmp_path / "span.bed.gz")
        write_kraken2_span_bed(path, *span_inputs, NAME_MAP)
        header, rows = self._load(path)
        split = header.index("is_split")
        supp = header.index("is_supplementary")
        name = header.index("read_name")
        r2 = [r for r in rows if r[name] == "r2"]
        assert all(r[split] == "true" for r in r2)
        assert sorted(r[supp] for r in r2) == ["false", "true"]
        r1 = next(r for r in rows if r[name] == "r1")
        assert r1[split] == "false"

    def test_expanded_bed_applies_softclips(self, tmp_path,
                                            span_inputs):
        path = str(tmp_path / "exp.bed.gz")
        write_kraken2_expanded_span_bed(path, *span_inputs, NAME_MAP)
        header, rows = self._load(path)
        name = header.index("read_name")
        r2 = next(r for r in rows if r[name] == "r2"
                  and r[0] == "chr1")
        # start 95 − 10 softclip, end 155 + 4 softclip
        assert (r2[1], r2[2]) == ("85", "159")
        # original alignment span preserved in the extra columns
        a_start = header.index("aligned_start")
        assert (r2[a_start], r2[a_start + 1]) == ("95", "155")

    def test_expanded_start_clamps_at_zero(self, tmp_path,
                                           bed_inputs):
        reads_by_variant = {"chr1:3:A:T": {"rz"}}
        result = _FakeResult({"rz": _detail()})
        meta = {"rz": [_meta(start=2, end=60, scl=30)]}
        path = str(tmp_path / "clamp.bed.gz")
        write_kraken2_expanded_span_bed(path, meta, reads_by_variant,
                                        {}, result, NAME_MAP)
        _header, rows = self._load(path)
        assert rows[0][1] == "0"

    def test_reads_without_detail_skipped(self, tmp_path,
                                          span_inputs):
        alignment_meta, rbv, abv, result = span_inputs
        del result.per_read_detail["r4"]
        path = str(tmp_path / "span2.bed.gz")
        write_kraken2_span_bed(path, alignment_meta, rbv, abv, result,
                               NAME_MAP)
        _header, rows = self._load(path)
        assert all(r[7] != "r4" for r in rows)

    def test_span_tabix_queryable(self, tmp_path, span_inputs):
        path = str(tmp_path / "span.bed.gz")
        write_kraken2_span_bed(path, *span_inputs, NAME_MAP)
        tbx = TabixFile(path)
        assert list(tbx.query("chr1", 100, 120))
        assert list(tbx.query("chr2", 510, 515))
        assert not list(tbx.query("chr2", 9000, 9100))


class TestReadDetailBedEdges:
    """Reference test_kraken2_bed.py:268–321 edge cases."""

    def _load(self, path):
        with gzip.open(path, "rt") as fh:
            lines = fh.read().rstrip("\n").split("\n")
        return lines[0].split("\t"), [l.split("\t") for l in lines[1:]]

    def test_multi_variant_same_read_one_row_per_variant(
            self, tmp_path):
        informative = {"chr1:1000:A:T": {"shared"},
                       "chr1:1005:G:C": {"shared"}}
        result = _FakeResult({"shared": _detail(kmers="562:10")})
        path = str(tmp_path / "mv.bed.gz")
        write_kraken2_read_detail_bed(path, informative, {}, result,
                                      NAME_MAP)
        _h, rows = self._load(path)
        assert len(rows) == 2
        assert rows[0][3] == "chr1:1000:A:T"
        assert rows[1][3] == "chr1:1005:G:C"

    def test_indel_chrom_end_is_pos_plus_ref_len(self, tmp_path):
        informative = {"chr1:1000:ATG:A": {"r"}}
        result = _FakeResult({"r": _detail(kmers="562:10")})
        path = str(tmp_path / "indel.bed.gz")
        write_kraken2_read_detail_bed(path, informative, {}, result,
                                      NAME_MAP)
        _h, rows = self._load(path)
        assert (rows[0][1], rows[0][2]) == ("1000", "1003")


class TestSpanBedEdges:
    """Reference test_kraken2_bed.py:574–614, 832–1056 edge cases."""

    def _load(self, path):
        with gzip.open(path, "rt") as fh:
            lines = fh.read().rstrip("\n").split("\n")
        return lines[0].split("\t"), [l.split("\t") for l in lines[1:]]

    def _one_read(self, **meta_kw):
        alignment_meta = {"shared": [_meta(start=1000, end=1200,
                                           **meta_kw)]}
        informative = {"chr1:1050:A:T": {"shared"},
                       "chr1:1100:G:C": {"shared"}}
        result = _FakeResult({"shared": _detail(kmers="562:10")})
        return alignment_meta, informative, {}, result

    def test_multi_variant_comma_separated(self, tmp_path):
        path = str(tmp_path / "mv.bed.gz")
        write_kraken2_span_bed(path, *self._one_read(), NAME_MAP)
        header, rows = self._load(path)
        assert len(rows) == 1
        variants = rows[0][header.index("variant")].split(",")
        assert sorted(variants) == ["chr1:1050:A:T", "chr1:1100:G:C"]

    def test_no_clips_expanded_matches_standard_coords(self, tmp_path):
        span = str(tmp_path / "s.bed.gz")
        exp = str(tmp_path / "e.bed.gz")
        write_kraken2_span_bed(span, *self._one_read(), NAME_MAP)
        write_kraken2_expanded_span_bed(exp, *self._one_read(),
                                        NAME_MAP)
        _hs, rs = self._load(span)
        _he, re_ = self._load(exp)
        assert (rs[0][0], rs[0][1], rs[0][2]) == (
            re_[0][0], re_[0][1], re_[0][2])

    def test_column_counts_consistent(self, tmp_path):
        span = str(tmp_path / "s.bed.gz")
        exp = str(tmp_path / "e.bed.gz")
        write_kraken2_span_bed(span, *self._one_read(scl=5), NAME_MAP)
        write_kraken2_expanded_span_bed(exp, *self._one_read(scl=5),
                                        NAME_MAP)
        for path in (span, exp):
            header, rows = self._load(path)
            assert all(len(r) == len(header) for r in rows)
        # expanded adds the aligned_start/aligned_end pair
        hs, _ = self._load(span)
        he, _ = self._load(exp)
        assert len(he) == len(hs) + 2

    def test_split_read_produces_two_rows(self, tmp_path):
        alignment_meta = {"r": [
            _meta(start=1000, end=1100, sa=True),
            _meta(chrom="chr5", start=5000, end=5100, sa=True,
                  supp=True)]}
        informative = {"chr1:1050:A:T": {"r"}}
        result = _FakeResult({"r": _detail(kmers="562:10")})
        path = str(tmp_path / "split.bed.gz")
        write_kraken2_span_bed(path, alignment_meta, informative, {},
                               result, NAME_MAP)
        header, rows = self._load(path)
        assert len(rows) == 2
        assert {r[0] for r in rows} == {"chr1", "chr5"}
        split = header.index("is_split")
        assert all(r[split] == "true" for r in rows)
