"""Kraken2 subsystem tests with mocked subprocesses (no binary needed).

Mirrors the reference's mocked-Popen strategy
(reference tests/test_kraken2.py, 1524 LoC): fabricated
nodes.dmp/names.dmp trees and per-read kraken2 output lines.
"""

import struct
from unittest import mock

import pytest

from kmer_denovo_filter_tpu.kraken2 import (
    ARCHAEA_TAXID,
    BACTERIA_TAXID,
    EUKARYOTA_TAXID,
    FUNGI_TAXID,
    HUMAN_TAXID,
    Kraken2Runner,
    METAZOA_TAXID,
    UNIVEC_CORE_TAXID,
    VIRUSES_TAXID,
)
from kmer_denovo_filter_tpu.kraken2_beds import parse_kmer_votes

# Minimal taxonomy: root(1) → {Bacteria(2) → Ecoli(562)},
# {Archaea(2157)}, {Eukaryota(2759) → Metazoa(33208) → Human(9606) →
# subspecies(96061)}, {Eukaryota → Fungi(4751)}, {Eukaryota →
# protistX(5000)}, {Viruses(10239) → HBV(10407)},
# {UniVec(81077) → vec1(810771)}
_NODES = {
    1: 1, BACTERIA_TAXID: 1, 562: BACTERIA_TAXID,
    ARCHAEA_TAXID: 1,
    EUKARYOTA_TAXID: 1, METAZOA_TAXID: EUKARYOTA_TAXID,
    HUMAN_TAXID: METAZOA_TAXID, 96061: HUMAN_TAXID,
    FUNGI_TAXID: EUKARYOTA_TAXID, 5000: EUKARYOTA_TAXID,
    VIRUSES_TAXID: 1, 10407: VIRUSES_TAXID,
    UNIVEC_CORE_TAXID: 1, 810771: UNIVEC_CORE_TAXID,
}
_NAMES = {
    1: "root", BACTERIA_TAXID: "Bacteria", 562: "Escherichia coli",
    HUMAN_TAXID: "Homo sapiens", VIRUSES_TAXID: "Viruses",
    10407: "Hepatitis B virus", UNIVEC_CORE_TAXID: "UniVec Core",
}


@pytest.fixture()
def db(tmp_path):
    tax = tmp_path / "taxonomy"
    tax.mkdir()
    with open(tax / "nodes.dmp", "w") as fh:
        for child, parent in _NODES.items():
            fh.write(f"{child}\t|\t{parent}\t|\tno rank\t|\n")
    with open(tax / "names.dmp", "w") as fh:
        for tid, name in _NAMES.items():
            fh.write(f"{tid}\t|\t{name}\t|\t\t|\tscientific name\t|\n")
        fh.write("562\t|\tE. coli alias\t|\t\t|\tsynonym\t|\n")
    with open(tmp_path / "opts.k2d", "wb") as fh:
        fh.write(struct.pack("<Q", 35) + b"\x00" * 24)
    return str(tmp_path)


class TestTaxonomy:
    def test_parent_and_name_maps(self, db):
        pm = Kraken2Runner.load_parent_map(db)
        assert pm[562] == BACTERIA_TAXID
        nm = Kraken2Runner.load_name_map(db)
        assert nm[562] == "Escherichia_coli"
        assert "E._coli_alias" not in nm.values()  # synonyms skipped

    def test_descendants_and_ancestors(self, db):
        pm = Kraken2Runner.load_parent_map(db)
        bact = Kraken2Runner.descendants_of(pm, BACTERIA_TAXID)
        assert bact == {BACTERIA_TAXID, 562}
        anc = Kraken2Runner.ancestors_of(pm, HUMAN_TAXID)
        assert anc == {HUMAN_TAXID, METAZOA_TAXID, EUKARYOTA_TAXID, 1}

    def test_taxid_sets(self, db):
        sets = Kraken2Runner.load_all_taxid_sets(db)
        assert 562 in sets["bacterial"]
        assert 5000 in sets["protist"]
        assert FUNGI_TAXID not in sets["protist"]
        assert HUMAN_TAXID not in sets["protist"]
        assert 10407 in sets["viral"]
        assert 810771 in sets["univec_core"]
        assert 96061 in sets["human_clade"]
        assert METAZOA_TAXID in sets["human_lineage"]

    def test_read_kmer_length(self, db):
        assert Kraken2Runner.read_kmer_length(db) == 35

    def test_missing_taxonomy_returns_none(self, tmp_path):
        assert Kraken2Runner.load_parent_map(str(tmp_path)) is None


def _mock_run(db, output_lines, reads):
    """Run classify_sequences with a mocked kraken2 subprocess."""
    kr = Kraken2Runner(db)
    proc = mock.MagicMock()
    proc.returncode = 0
    proc.pid = 4242
    proc.communicate.return_value = (
        "\n".join(output_lines).encode(), b"")
    with mock.patch("subprocess.Popen", return_value=proc):
        return kr.classify_sequences(reads)


class TestClassification:
    def test_domain_tallies_and_partition(self, db):
        lines = [
            "C\tr_ecoli\t562\t100\t562:66",
            "C\tr_human\t9606\t100\t9606:66",
            "C\tr_viral\t10407\t100\t10407:66",
            "C\tr_univec\t810771\t100\t810771:66",
            "C\tr_root\t1\t100\t1:66",
            "C\tr_protist\t5000\t100\t5000:66",
            "U\tr_unclass\t0\t100\t",
        ]
        reads = {f"r_{x}": "ACGT" for x in
                 ("ecoli", "human", "viral", "univec", "root",
                  "protist", "unclass")}
        res = _mock_run(db, lines, reads)
        assert res.total == 7
        assert res.classified == 6
        assert res.unclassified == 1
        assert res.bacterial_read_names == {"r_ecoli"}
        assert res.viral_read_names == {"r_viral"}
        assert res.protist_read_names == {"r_protist"}
        assert res.univec_core_read_names == {"r_univec"}
        assert res.nonhuman_read_names == {
            "r_ecoli", "r_viral", "r_protist"}
        assert res.human_count == 1
        assert res.root_count == 1
        # four-set partition: NHF + UCF + HLF + UF covers every read
        parts = (res.nonhuman_read_names | res.univec_core_read_names
                 | res.human_lineage_read_names
                 | res.unclassified_read_names)
        assert parts == set(reads)
        total = (len(res.nonhuman_read_names)
                 + len(res.univec_core_read_names)
                 + len(res.human_lineage_read_names)
                 + len(res.unclassified_read_names))
        assert total == 7  # disjoint

    def test_human_homology_guard(self, db):
        lines = [
            "C\tr_hbv\t10407\t100\t10407:30 9606:36",  # human k-mers!
            "C\tr_pure\t10407\t100\t10407:66",
        ]
        res = _mock_run(db, lines,
                        {"r_hbv": "ACGT", "r_pure": "ACGT"})
        assert res.viral_read_names == {"r_pure"}
        assert "r_hbv" not in res.nonhuman_read_names
        assert "r_hbv" in res.human_lineage_read_names
        assert res.per_read_detail["r_hbv"]["guard_status"] == "HHG"
        assert res.per_read_detail["r_hbv"]["domain"] == "Viruses"

    def test_univec_excluded_from_nonhuman(self, db):
        lines = ["C\tr_vec\t810771\t100\t810771:66"]
        res = _mock_run(db, lines, {"r_vec": "ACGT"})
        assert res.univec_core_read_names == {"r_vec"}
        assert res.nonhuman_read_names == set()
        assert res.per_read_detail["r_vec"]["guard_status"] == "UVC"

    def test_failure_degrades_to_empty(self, db):
        kr = Kraken2Runner(db)
        proc = mock.MagicMock()
        proc.returncode = 1
        proc.pid = 4242
        proc.communicate.return_value = (b"", b"boom")
        with mock.patch("subprocess.Popen", return_value=proc):
            res = kr.classify_sequences({"r": "ACGT"})
        assert res.total == 1
        assert res.classified == 0

    def test_empty_input(self, db):
        res = Kraken2Runner(db).classify_sequences({})
        assert res.total == 0

    def test_ambiguous_ancestor_domain(self, db):
        lines = [f"C\tr_euk\t{EUKARYOTA_TAXID}\t100\t2759:66"]
        res = _mock_run(db, lines, {"r_euk": "ACGT"})
        d = res.per_read_detail["r_euk"]
        assert d["domain"] in ("Ambiguous_Ancestor", "Protist")
        # Eukaryota is on the human lineage → not non-human
        assert "r_euk" not in res.nonhuman_read_names


class TestKmerVotes:
    def test_parse_and_ranking(self):
        votes, named, total, human = parse_kmer_votes(
            "562:10 9606:5 |:| 562:3 0:2",
            name_map={562: "Escherichia_coli"})
        assert votes == "562:13;9606:5;0:2"
        assert named == "Escherichia_coli:13;9606:5;unclassified:2"
        assert total == 20
        assert human == 5

    def test_empty(self):
        assert parse_kmer_votes("") == ("", "", 0, 0)

    def test_extract_taxids(self):
        got = Kraken2Runner.extract_taxids_from_kmer_string(
            "562:10 |:| 9606:2 A:3 bogus")
        assert got == {562, 9606}


class TestCommandConstruction:
    """The kraken2 invocation itself (flags, FASTQ hand-off)."""

    def _capture(self, db, runner_kwargs, reads):
        captured = {}

        def fake_popen(cmd, **kw):
            captured["cmd"] = cmd
            fastq = cmd[-1]
            captured["fastq"] = open(fastq).read()
            proc = mock.MagicMock()
            proc.returncode = 0
            proc.pid = 4242
            proc.communicate.return_value = (b"", b"")
            return proc

        kr = Kraken2Runner(db, **runner_kwargs)
        with mock.patch("subprocess.Popen", side_effect=fake_popen):
            kr.classify_sequences(reads)
        return captured

    def test_default_flags(self, db):
        cap = self._capture(db, {}, {"r1": "ACGT"})
        cmd = cap["cmd"]
        assert cmd[0] == "kraken2"
        assert cmd[cmd.index("--db") + 1] == db
        assert cmd[cmd.index("--confidence") + 1] == "0.0"
        assert cmd[cmd.index("--threads") + 1] == "1"
        assert "--memory-mapping" not in cmd
        assert cmd[cmd.index("--output") + 1] == "/dev/stdout"

    def test_confidence_and_threads_forwarded(self, db):
        cap = self._capture(db, {"confidence": 0.25, "threads": 7},
                            {"r1": "ACGT"})
        cmd = cap["cmd"]
        assert cmd[cmd.index("--confidence") + 1] == "0.25"
        assert cmd[cmd.index("--threads") + 1] == "7"

    def test_memory_mapping_forwarded(self, db):
        cap = self._capture(db, {"memory_mapping": True}, {"r1": "ACGT"})
        assert "--memory-mapping" in cap["cmd"]
        # fastq path stays the last argument
        assert cap["cmd"][-1].endswith(".fq")

    def test_fastq_contents(self, db):
        cap = self._capture(db, {}, [("readA", "ACGTAC"),
                                     ("readB", "GG")])
        assert cap["fastq"] == ("@readA\nACGTAC\n+\nIIIIII\n"
                                "@readB\nGG\n+\nII\n")

    def test_temp_fastq_deleted(self, db, tmp_path):
        captured = {}

        def fake_popen(cmd, **kw):
            captured["fastq"] = cmd[-1]
            proc = mock.MagicMock()
            proc.returncode = 0
            proc.pid = 4242
            proc.communicate.return_value = (b"", b"")
            return proc

        kr = Kraken2Runner(db)
        with mock.patch("subprocess.Popen", side_effect=fake_popen):
            kr.classify_sequences({"r": "ACGT"}, tmpdir=str(tmp_path))
        assert captured["fastq"].startswith(str(tmp_path))
        import os as _os
        assert not _os.path.exists(captured["fastq"])


class TestTallyRobustness:
    def test_short_and_blank_lines_skipped(self, db):
        lines = ["", "C\tonly_two", "C\tr1\t562\t100\t562:66", "   "]
        res = _mock_run(db, lines, {"r1": "ACGT"})
        assert res.classified == 1

    def test_non_integer_taxid_skipped(self, db):
        lines = ["C\tr1\tnotanum\t100\t", "C\tr2\t562\t100\t562:66"]
        res = _mock_run(db, lines, {"r1": "ACGT", "r2": "ACGT"})
        assert res.classified == 1
        assert res.bacterial_read_names == {"r2"}

    def test_missing_kmer_column_tolerated(self, db):
        lines = ["C\tr1\t562\t100"]
        res = _mock_run(db, lines, {"r1": "ACGT"})
        assert res.bacterial_read_names == {"r1"}
        assert res.per_read_detail["r1"]["kmer_string"] == ""

    def test_fallback_without_taxonomy(self, tmp_path):
        """No nodes.dmp → exact-taxid matching only, with a warning."""
        import struct as _struct
        with open(tmp_path / "opts.k2d", "wb") as fh:
            fh.write(_struct.pack("<Q", 35) + b"\x00" * 24)
        db_no_tax = str(tmp_path)
        lines = [
            f"C\tr_b\t{BACTERIA_TAXID}\t100\t",   # exact domain taxid
            "C\tr_sub\t562\t100\t",               # species: unmatched
            f"C\tr_h\t{HUMAN_TAXID}\t100\t",
        ]
        res = _mock_run(db_no_tax, lines,
                        {"r_b": "A", "r_sub": "A", "r_h": "A"})
        assert res.bacterial_read_names == {"r_b"}
        # species-level taxid still counts as nonhuman in fallback
        assert "r_sub" in res.nonhuman_read_names
        assert res.human_count == 1

    def test_guard_status_labels(self, db):
        lines = [
            f"C\tr_hum\t{HUMAN_TAXID}\t100\t9606:66",
            "C\tr_pass\t562\t100\t562:66",
        ]
        res = _mock_run(db, lines, {"r_hum": "A", "r_pass": "A"})
        assert res.per_read_detail["r_hum"]["guard_status"] == "HUMAN"
        assert res.per_read_detail["r_pass"]["guard_status"] == "PASS"


class TestOptsK2d:
    def test_short_file_returns_none(self, tmp_path):
        (tmp_path / "opts.k2d").write_bytes(b"\x01\x02")
        assert Kraken2Runner.read_kmer_length(str(tmp_path)) is None

    def test_missing_file_returns_none(self, tmp_path):
        assert Kraken2Runner.read_kmer_length(str(tmp_path)) is None

    def test_implausible_k_rejected(self, tmp_path):
        with open(tmp_path / "opts.k2d", "wb") as fh:
            fh.write(struct.pack("<Q", 9999) + b"\x00" * 24)
        assert Kraken2Runner.read_kmer_length(str(tmp_path)) is None


class TestResultSummary:
    def test_summary_and_fractions(self, db):
        lines = [
            "C\tr1\t562\t100\t562:66",
            "C\tr2\t9606\t100\t9606:66",
            "U\tr3\t0\t100\t",
            "U\tr4\t0\t100\t",
        ]
        res = _mock_run(db, lines, {f"r{i}": "A" for i in range(1, 5)})
        assert res.bacterial_fraction == 0.25
        text = res.summary()
        assert "4" in text  # total appears
        nhf = len(res.nonhuman_read_names) / res.total
        ucf = len(res.univec_core_read_names) / res.total
        hlf = len(res.human_lineage_read_names) / res.total
        uf = len(res.unclassified_read_names) / res.total
        assert nhf + ucf + hlf + uf == pytest.approx(1.0)


class TestHomologyGuardPerDomain:
    """Per-domain mixed-vs-pure guard matrix (reference
    tests/test_kraken2.py:717–841): a read whose LCA lands in a
    non-human domain but whose k-mer votes include ANY human evidence
    is cleared from that domain AND from the non-human set."""

    CASES = [
        ("bacterial", 562, "bacterial_read_names"),
        ("archaeal", ARCHAEA_TAXID, "archaeal_read_names"),
        ("viral", 10407, "viral_read_names"),
        ("fungal", FUNGI_TAXID, "fungal_read_names"),
        ("protist", 5000, "protist_read_names"),
    ]

    @pytest.mark.parametrize("cat,taxid,names_attr", CASES)
    def test_mixed_skipped_pure_kept(self, db, cat, taxid, names_attr):
        lines = [
            f"C\tr_mixed\t{taxid}\t100\t{taxid}:8 {HUMAN_TAXID}:4",
            f"C\tr_pure\t{taxid}\t100\t{taxid}:10 0:2",
        ]
        res = _mock_run(db, lines,
                        {"r_mixed": "ACGT", "r_pure": "ACGT"})
        assert getattr(res, names_attr) == {"r_pure"}
        assert "r_mixed" not in res.nonhuman_read_names
        assert "r_pure" in res.nonhuman_read_names
        assert res.nonhuman_read_names == {"r_pure"}
        # guarded read keeps its pre-guard domain label in the detail
        d = res.per_read_detail["r_mixed"]
        assert d["guard_status"] == "HHG"
        assert not d["is_nonhuman"]
        # and lands in the human-lineage partition set
        assert "r_mixed" in res.human_lineage_read_names

    def test_human_subspecies_counts_as_human(self, db):
        # LCA below Homo sapiens (96061) is human, guard HUMAN
        res = _mock_run(db, ["C\tr_sub\t96061\t100\t96061:66"],
                        {"r_sub": "ACGT"})
        assert res.human_count == 1
        assert res.per_read_detail["r_sub"]["guard_status"] == "HUMAN"
        assert "r_sub" in res.human_lineage_read_names


class TestUniVecDepth:
    """UniVec Core exclusion matrix (reference
    tests/test_kraken2.py:944–1088)."""

    def test_univec_root_taxid(self, db):
        res = _mock_run(
            db, [f"C\tr\t{UNIVEC_CORE_TAXID}\t100\t"
                 f"{UNIVEC_CORE_TAXID}:66"], {"r": "ACGT"})
        assert res.univec_core_read_names == {"r"}
        assert res.nonhuman_read_names == set()
        assert res.per_read_detail["r"]["guard_status"] == "UVC"

    def test_univec_child_taxid(self, db):
        res = _mock_run(db, ["C\tr\t810771\t100\t810771:66"],
                        {"r": "ACGT"})
        assert res.univec_core_read_names == {"r"}
        assert res.nonhuman_read_names == set()

    def test_univec_fallback_without_taxonomy(self, tmp_path):
        # no nodes.dmp: only exact root-taxid matching applies, and
        # the UniVec root is still excluded from non-human
        (tmp_path / "opts.k2d").write_bytes(
            struct.pack("<Q", 35) + b"\x00" * 24)
        kr = Kraken2Runner(str(tmp_path))
        proc = mock.MagicMock()
        proc.returncode = 0
        proc.pid = 1
        proc.communicate.return_value = (
            f"C\tr\t{UNIVEC_CORE_TAXID}\t100\t".encode(), b"")
        with mock.patch("subprocess.Popen", return_value=proc):
            res = kr.classify_sequences({"r": "ACGT"})
        assert res.univec_core_read_names == {"r"}
        assert res.nonhuman_read_names == set()

    def test_univec_with_human_kmers_also_excluded(self, db):
        res = _mock_run(
            db, [f"C\tr\t810771\t100\t810771:30 {HUMAN_TAXID}:36"],
            {"r": "ACGT"})
        assert res.nonhuman_read_names == set()
        assert "r" in res.human_lineage_read_names
        assert res.per_read_detail["r"]["guard_status"] == "HHG"


class TestDbLayouts:
    """Versioned-subdir and root-level DB layouts (reference
    tests/test_kraken2.py:116–157, 488–531, 1118–1146)."""

    def test_kmer_length_from_versioned_subdir(self, tmp_path):
        sub = tmp_path / "k2_NCBI_reference_20251007"
        sub.mkdir()
        (sub / "opts.k2d").write_bytes(
            struct.pack("<Q", 29) + b"\x00" * 24)
        assert Kraken2Runner.read_kmer_length(str(tmp_path)) == 29

    def test_root_level_nodes_dmp(self, tmp_path):
        with open(tmp_path / "nodes.dmp", "w") as fh:
            fh.write("1\t|\t1\t|\tno rank\t|\n")
            fh.write(f"{BACTERIA_TAXID}\t|\t1\t|\tsuperkingdom\t|\n")
        pm = Kraken2Runner.load_parent_map(str(tmp_path))
        assert pm == {1: 1, BACTERIA_TAXID: 1}

    def test_taxonomy_subdir_preferred_over_root(self, tmp_path):
        # conflicting trees: taxonomy/ must win
        with open(tmp_path / "nodes.dmp", "w") as fh:
            fh.write("7\t|\t1\t|\tx\t|\n")
        tax = tmp_path / "taxonomy"
        tax.mkdir()
        with open(tax / "nodes.dmp", "w") as fh:
            fh.write("8\t|\t1\t|\tx\t|\n")
        pm = Kraken2Runner.load_parent_map(str(tmp_path))
        assert 8 in pm and 7 not in pm

    def test_names_subdir_preferred_over_root(self, tmp_path):
        with open(tmp_path / "names.dmp", "w") as fh:
            fh.write("7\t|\tWrong name\t|\t\t|\tscientific name\t|\n")
        tax = tmp_path / "taxonomy"
        tax.mkdir()
        with open(tax / "names.dmp", "w") as fh:
            fh.write("8\t|\tRight name\t|\t\t|\tscientific name\t|\n")
        nm = Kraken2Runner.load_name_map(str(tmp_path))
        assert nm == {8: "Right_name"}


class TestFourSetPartitionMatrix:
    """Exhaustive NHF+UCF+HLF+UF partition (reference
    tests/test_kraken2.py:843–943, 1287–1510): every read lands in
    exactly one of the four sets, across all domains, guards, root,
    ambiguous ancestors, and unclassified reads."""

    LINES = [
        ("r_ecoli", f"C\tr_ecoli\t562\t100\t562:66"),
        ("r_arch", f"C\tr_arch\t{ARCHAEA_TAXID}\t100\t"
                   f"{ARCHAEA_TAXID}:66"),
        ("r_fungus", f"C\tr_fungus\t{FUNGI_TAXID}\t100\t"
                     f"{FUNGI_TAXID}:66"),
        ("r_protist", "C\tr_protist\t5000\t100\t5000:66"),
        ("r_hbv", "C\tr_hbv\t10407\t100\t10407:66"),
        ("r_hbv_int", f"C\tr_hbv_int\t10407\t100\t"
                      f"10407:30 {HUMAN_TAXID}:36"),
        ("r_human", f"C\tr_human\t{HUMAN_TAXID}\t100\t"
                    f"{HUMAN_TAXID}:66"),
        ("r_sub", "C\tr_sub\t96061\t100\t96061:66"),
        ("r_meta", f"C\tr_meta\t{METAZOA_TAXID}\t100\t"
                   f"{METAZOA_TAXID}:66"),
        ("r_euk", f"C\tr_euk\t{EUKARYOTA_TAXID}\t100\t"
                  f"{EUKARYOTA_TAXID}:66"),
        ("r_root", "C\tr_root\t1\t100\t1:66"),
        ("r_vec", "C\tr_vec\t810771\t100\t810771:66"),
        ("r_un", "U\tr_un\t0\t100\t"),
    ]

    def _result(self, db):
        return _mock_run(db, [l for _n, l in self.LINES],
                         {n: "ACGT" for n, _l in self.LINES})

    def test_partition_is_exact(self, db):
        res = self._result(db)
        names = {n for n, _l in self.LINES}
        sets = [res.nonhuman_read_names, res.univec_core_read_names,
                res.human_lineage_read_names,
                res.unclassified_read_names]
        union = set().union(*sets)
        assert union == names
        assert sum(len(s) for s in sets) == len(names)  # disjoint

    def test_expected_membership(self, db):
        res = self._result(db)
        assert res.nonhuman_read_names == {
            "r_ecoli", "r_arch", "r_fungus", "r_protist", "r_hbv"}
        assert res.univec_core_read_names == {"r_vec"}
        assert res.unclassified_read_names == {"r_un"}
        # human, subspecies, metazoa/eukaryota ancestors, root, and
        # the HHG-guarded integration read all fall to human-lineage
        assert res.human_lineage_read_names == {
            "r_human", "r_sub", "r_meta", "r_euk", "r_root",
            "r_hbv_int"}

    def test_ambiguous_eukaryota_not_nonhuman(self, db):
        res = self._result(db)
        assert "r_euk" not in res.nonhuman_read_names
        d = res.per_read_detail["r_euk"]
        assert d["domain"] in ("Ambiguous_Ancestor", "Protist")

    def test_root_read_counted_and_in_lineage(self, db):
        res = self._result(db)
        assert res.root_count == 1
        assert "r_root" in res.human_lineage_read_names
        assert res.per_read_detail["r_root"]["domain"] == "Root"

    def test_domain_counts(self, db):
        res = self._result(db)
        assert res.bacterial_count == 1
        assert res.archaeal_count == 1
        assert res.fungal_count == 1
        # Eukaryota-LCA reads count as protist (protist = eukaryota −
        # metazoa − fungi − viridiplantae includes the root, reference
        # kmer_utils.py:717) while staying out of the non-human set
        assert res.protist_count == 2
        assert res.viral_count == 1  # the guarded one is cleared
        assert res.human_count == 2  # human + subspecies


class TestPerReadDetailDepth:
    """Per-read detail contract (reference
    tests/test_kraken2.py:1147–1285)."""

    def test_detail_fields_populated(self, db):
        res = _mock_run(db, ["C\tr\t562\t100\t562:40 0:26"],
                        {"r": "ACGT"})
        d = res.per_read_detail["r"]
        assert d == {"status": "C", "taxid": 562,
                     "domain": "Bacteria", "guard_status": "PASS",
                     "is_nonhuman": True,
                     "kmer_string": "562:40 0:26"}

    def test_unclassified_detail(self, db):
        res = _mock_run(db, ["U\tr\t0\t100\t"], {"r": "ACGT"})
        d = res.per_read_detail["r"]
        assert d["status"] == "U"
        assert d["domain"] == "Unclassified"
        assert d["guard_status"] == "UNCLASSIFIED"

    def test_empty_result_has_empty_detail_and_sets(self, db):
        res = Kraken2Runner(db).classify_sequences({})
        assert res.per_read_detail == {}
        assert res.human_lineage_read_names == set()
        assert res.unclassified_read_names == set()
        assert res.nonhuman_read_names == set()
