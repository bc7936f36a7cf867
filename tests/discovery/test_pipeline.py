"""Synthetic end-to-end tests for the discovery pipeline.

Mirrors the reference's synthetic discovery coverage
(reference tests/discovery/test_pipeline.py, 1598 LoC): region
detection, every filter knob, SV classification via SA tags, bedGraph
semantics — built with the package's own writers.
"""

import json
import os

import pytest

from kmer_denovo_filter_tpu.cli import parse_args
from kmer_denovo_filter_tpu.pipeline import run_discovery_pipeline
from tests.helpers import (
    create_bam,
    create_bam_with_flags,
    create_ref_fasta,
    create_vcf,
)

K = 15
READ_LEN = 60
# default per-read filter for k=15 is k//4 = 3 distinct unique k-mers


def _tiled(seq, prefix, start, end, step=6, read_len=READ_LEN,
           insert=None):
    reads = []
    i = 0
    for pos in range(start, end - read_len + 1, step):
        sub = seq[pos:pos + read_len]
        if insert is not None:
            ipos, ins = insert
            off = ipos - pos
            if 5 <= off < read_len - 5:
                newseq = sub[:off] + ins + sub[off:read_len - len(ins)]
                reads.append((f"{prefix}{i}", pos, newseq))
                i += 1
                continue
        reads.append((f"{prefix}{i}", pos, sub))
        i += 1
    return reads


@pytest.fixture()
def disco(tmp_path):
    """Child carries a 20 bp novel insertion around pos 150."""
    ref_path = str(tmp_path / "ref.fa")
    seq = create_ref_fasta(ref_path, "chr1", 400)
    novel = "ACGTTGCAATCCGGATTAGC"  # non-repetitive novel sequence
    child = str(tmp_path / "child.bam")
    mother = str(tmp_path / "mother.bam")
    father = str(tmp_path / "father.bam")
    create_bam(child, "chr1",
               _tiled(seq, "c", 40, 360, insert=(150, novel)),
               ref_length=400)
    create_bam(mother, "chr1", _tiled(seq, "m", 40, 360),
               ref_length=400)
    create_bam(father, "chr1", _tiled(seq, "f", 40, 360),
               ref_length=400)
    return {"tmp": tmp_path, "seq": seq, "ref": ref_path,
            "child": child, "mother": mother, "father": father}


def _run(disco, tmp_path, extra=()):
    prefix = str(tmp_path / "disc")
    args = parse_args([
        "--child", disco["child"], "--mother", disco["mother"],
        "--father", disco["father"], "--ref-fasta", disco["ref"],
        "--out-prefix", prefix, "--kmer-size", str(K),
        "--min-child-count", "2",
        *extra,
    ])
    run_discovery_pipeline(args)
    return prefix


def _read_bed(prefix):
    rows = []
    for line in open(prefix + ".bed"):
        if line.startswith("#"):
            continue
        f = line.rstrip("\n").split("\t")
        rows.append({"chrom": f[0], "start": int(f[1]), "end": int(f[2]),
                     "reads": int(f[3]), "kmers": int(f[4]),
                     "class": f[9]})
    return rows


class TestRegionDetection:
    def test_novel_insertion_detected(self, disco, tmp_path):
        prefix = _run(disco, tmp_path)
        rows = _read_bed(prefix)
        assert len(rows) == 1
        r = rows[0]
        assert r["chrom"] == "chr1"
        assert r["start"] < 150 < r["end"]
        assert r["reads"] > 0
        assert r["kmers"] > 0
        with open(prefix + ".metrics.json") as fh:
            m = json.load(fh)
        assert m["proband_unique_kmers"] > 0
        assert m["candidate_regions"] == 1

    def test_no_novel_sequence_empty(self, disco, tmp_path):
        create_bam(disco["child"], "chr1",
                   _tiled(disco["seq"], "c", 40, 360), ref_length=400)
        prefix = _run(disco, tmp_path)
        with open(prefix + ".metrics.json") as fh:
            m = json.load(fh)
        assert m["candidate_regions"] == 0

    def test_kmers_in_parents_filtered(self, disco, tmp_path):
        """Insertion also present in mother → not proband-unique."""
        create_bam(disco["mother"], "chr1",
                   _tiled(disco["seq"], "m", 40, 360,
                          insert=(150, "ACGTTGCAATCCGGATTAGC")),
                   ref_length=400)
        prefix = _run(disco, tmp_path)
        with open(prefix + ".metrics.json") as fh:
            m = json.load(fh)
        assert m["proband_unique_kmers"] == 0
        assert m["candidate_regions"] == 0


class TestFilters:
    def test_min_supporting_reads(self, disco, tmp_path):
        prefix = _run(disco, tmp_path, ["--min-supporting-reads", "999"])
        assert _read_bed(prefix) == []

    def test_min_distinct_kmers(self, disco, tmp_path):
        prefix = _run(disco, tmp_path, ["--min-distinct-kmers", "9999"])
        assert _read_bed(prefix) == []

    def test_min_distinct_kmers_per_read_excludes(self, disco, tmp_path):
        prefix = _run(disco, tmp_path,
                      ["--min-distinct-kmers-per-read", "9999"])
        with open(prefix + ".metrics.json") as fh:
            m = json.load(fh)
        assert m["informative_reads"] == 0

    def test_filters_recorded_in_header(self, disco, tmp_path):
        prefix = _run(disco, tmp_path, ["--min-supporting-reads", "2"])
        head = open(prefix + ".bed").readline()
        assert head.startswith("#filters:")
        assert "min_supporting_reads=2" in head

    def test_parent_max_count_loosens(self, disco, tmp_path):
        """A single mother read with the insertion kills the k-mers at
        parent-max-count 0 but not at 1."""
        reads = _tiled(disco["seq"], "m", 40, 360)
        ins_reads = _tiled(disco["seq"], "mx", 100, 220,
                           insert=(150, "ACGTTGCAATCCGGATTAGC"))
        with_one = reads + [r for r in ins_reads if r[1] <= 150][:1]
        create_bam(disco["mother"], "chr1", with_one, ref_length=400)
        p0 = _run(disco, tmp_path / "a" if False else tmp_path, [])
        with open(p0 + ".metrics.json") as fh:
            base = json.load(fh)["proband_unique_kmers"]
        p1 = _run(disco, tmp_path, ["--parent-max-count", "3"])
        with open(p1 + ".metrics.json") as fh:
            loose = json.load(fh)["proband_unique_kmers"]
        assert loose > base


class TestSvClassification:
    def test_sa_linked_regions_classified_sv(self, tmp_path):
        """Two clusters linked by SA-tagged split reads → SV + BEDPE."""
        ref_path = str(tmp_path / "ref.fa")
        seq = create_ref_fasta(ref_path, "chr1", 1200)
        novel = "TTGACCGGAATTCCGGAACT"
        reads = []
        # cluster A around 100, cluster B around 900, both novel-bearing
        for i, pos in enumerate(range(80, 160, 6)):
            sub = seq[pos:pos + 40] + novel
            reads.append({
                "name": f"s{i}", "chrom_idx": 0, "pos": pos,
                "seq": sub,
                "cigar": [(0, 40), (4, len(novel))],
                "sa_tag": f"chr1,901,+,40M20S,60,0;",
                "flag": 0,
            })
            reads.append({
                "name": f"s{i}", "chrom_idx": 0, "pos": 900,
                "seq": seq[900:940] + novel,
                "cigar": [(0, 40), (4, len(novel))],
                "flag": 0x800,
            })
        child = str(tmp_path / "child.bam")
        create_bam_with_flags(child, ["chr1"], [1200], reads)
        mother = str(tmp_path / "mother.bam")
        father = str(tmp_path / "father.bam")
        create_bam(mother, "chr1", _tiled(seq, "m", 40, 1100),
                   ref_length=1200)
        create_bam(father, "chr1", _tiled(seq, "f", 40, 1100),
                   ref_length=1200)
        prefix = str(tmp_path / "disc")
        args = parse_args([
            "--child", child, "--mother", mother, "--father", father,
            "--ref-fasta", ref_path, "--out-prefix", prefix,
            "--kmer-size", str(K), "--min-child-count", "2",
            "--min-distinct-kmers-per-read", "1",
        ])
        run_discovery_pipeline(args)
        rows = _read_bed(prefix)
        assert len(rows) == 2
        assert all(r["class"] == "SV" for r in rows)
        bedpe = [l for l in open(prefix + ".sv.bedpe")
                 if not l.startswith("#")]
        assert len(bedpe) == 1
        fields = bedpe[0].split("\t")
        assert fields[0] == "chr1" and fields[3] == "chr1"
        assert fields[8].strip() == "INTRA"


class TestBedgraph:
    def test_bedgraph_written_and_merged(self, disco, tmp_path):
        prefix = _run(disco, tmp_path, ["--min-bedgraph-reads", "1"])
        lines = [l for l in open(prefix + ".kmer_coverage.bedgraph")
                 if not l.startswith("#")]
        assert lines
        prev_end = None
        for line in lines:
            chrom, start, end, val = line.split("\t")
            assert int(end) > int(start)
            assert int(val) > 0

    def test_min_bedgraph_reads_filters(self, disco, tmp_path):
        prefix = _run(disco, tmp_path, ["--min-bedgraph-reads", "999"])
        lines = [l for l in open(prefix + ".kmer_coverage.bedgraph")
                 if not l.startswith("#")]
        assert lines == []


class TestCandidateComparison:
    def test_candidate_summary_capture(self, disco, tmp_path):
        summary = str(tmp_path / "cand_summary.txt")
        with open(summary, "w") as fh:
            fh.write(
                "Per-Variant Results\n" + "-" * 120 + "\n"
                "  Variant  DKU DKT DKA DKU_DKT DKA_DKT ...\n"
                "  -------  --- --- --- ------- -------\n"
                "  chr1:151 A>AACGT    20    40    20   0.5000"
                "   0.5000       10    5.00        1            0"
                "         0.00            0  DE_NOVO\n\n")
        prefix = _run(disco, tmp_path,
                      ["--candidate-summary", summary])
        with open(prefix + ".metrics.json") as fh:
            m = json.load(fh)
        cc = m["candidate_comparison"]
        assert cc["hq_candidates"] == 1
        assert cc["captured"] == 1


class TestSnapshotResume:
    def test_save_and_resume_identical_outputs(self, disco, tmp_path):
        p1 = _run(disco, tmp_path, extra=("--save-proband-index",))
        snap = p1 + ".proband_unique.kdx.npz"
        assert os.path.exists(snap)

        prefix2 = str(tmp_path / "resumed")
        args = parse_args([
            "--child", disco["child"], "--mother", disco["mother"],
            "--father", disco["father"], "--ref-fasta", disco["ref"],
            "--out-prefix", prefix2, "--kmer-size", str(K),
            "--min-child-count", "2",
            "--proband-index", snap,
        ])
        run_discovery_pipeline(args)
        for ext in (".bed", ".metrics.json", ".summary.txt",
                    ".kmer_coverage.bedgraph"):
            a = open(p1 + ext).read()
            b = open(prefix2 + ext).read()
            # summary embeds the prefix-derived paths; normalize
            b = b.replace(os.path.basename(prefix2),
                          os.path.basename(p1))
            assert a == b, ext

    def test_resume_k_mismatch_rejected(self, disco, tmp_path):
        import numpy as np
        import pytest
        snap = str(tmp_path / "bad.kdx.npz")
        np.savez(snap, keys=np.zeros((1, 2), np.uint32), k=99,
                 child_candidate_kmers=1, non_ref_kmers=1)
        args = parse_args([
            "--child", disco["child"], "--mother", disco["mother"],
            "--father", disco["father"], "--ref-fasta", disco["ref"],
            "--out-prefix", str(tmp_path / "x"),
            "--kmer-size", str(K), "--proband-index", snap,
        ])
        with pytest.raises(ValueError, match="k=99"):
            run_discovery_pipeline(args)


class TestKmerIndexSnapshot:
    def test_engine_save_load(self, tmp_path):
        import numpy as np
        from kmer_denovo_filter_tpu import engine as eng
        keys = np.sort(np.arange(40, dtype=np.uint32)).reshape(20, 2)
        idx = eng.KmerIndex.from_keys_counts(
            keys, np.arange(20, dtype=np.int64), 31)
        path = str(tmp_path / "i.npz")
        idx.save(path)
        back = eng.KmerIndex.load(path)
        assert back.k == 31
        assert np.array_equal(back.keys_np, keys)
        assert np.array_equal(back.counts_np, np.arange(20))


def test_ref_cache_staleness_rebuild(tmp_path, caplog):
    """A .kdx.npz cache older than the FASTA is rebuilt, not reused."""
    import logging
    import os
    import time as _time

    import numpy as np

    from kmer_denovo_filter_tpu.discovery.pipeline import (
        ensure_ref_index)
    from tests.helpers import create_ref_fasta

    ref = str(tmp_path / "r.fa")
    create_ref_fasta(ref, "chr1", 200)
    idx1 = ensure_ref_index(ref, K)
    cache = f"{ref}.k{K}.kdx.npz"
    assert os.path.exists(cache)
    # edit the FASTA afterwards -> cache must be considered stale
    _time.sleep(0.01)
    create_ref_fasta(ref, "chr1", 250)
    os.utime(ref)
    with caplog.at_level(logging.WARNING):
        idx2 = ensure_ref_index(ref, K)
    assert idx2.n != idx1.n or not np.array_equal(
        idx2.keys_np, idx1.keys_np)
    assert any("older than" in r.message for r in caplog.records)
    # refreshed cache is reused on the next call
    idx3 = ensure_ref_index(ref, K)
    assert np.array_equal(idx3.keys_np, idx2.keys_np)


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 2,
    reason="needs a multi-device mesh")
def test_discovery_sharded_module3_byte_identical(disco, tmp_path,
                                                  monkeypatch):
    """Full discovery with KDF_SHARDED=1 (anchoring scan + parent
    filters on the virtual mesh) produces byte-identical outputs."""
    monkeypatch.setenv("KDF_SHARDED", "0")
    base = _run(disco, tmp_path / "single")
    monkeypatch.setenv("KDF_SHARDED", "1")
    shard = _run(disco, tmp_path / "mesh")
    for suffix in (".bed", ".kmer_coverage.bedgraph",
                   ".read_coverage.bed", ".sv.bedpe"):
        a = open(base + suffix, "rb").read()
        b = open(shard + suffix, "rb").read()
        assert a == b, f"{suffix} differs under sharding"
    ja = json.load(open(base + ".metrics.json"))
    jb = json.load(open(shard + ".metrics.json"))
    for key in ("candidate_regions", "proband_unique_kmers",
                "informative_reads"):
        assert ja[key] == jb[key]
    assert ja["candidate_regions"] >= 1
