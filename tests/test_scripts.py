"""Tests for the helper scripts (compare_regions, build_mini_ref)."""

import importlib.util
import os

import pytest

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestCompareRegions:
    def test_classification_buckets(self, tmp_path):
        cr = _load("compare_regions")
        bedgraph = {"chr1": [(90, 120, 5)]}
        discovery = {"chr1": [
            {"start": 80, "end": 130, "reads": 3, "unique_kmers": 10,
             "split_reads": 0, "discordant_pairs": 0, "max_clip_len": 0,
             "unmapped_mates": 0, "class": "SMALL"},
            {"start": 500, "end": 600, "reads": 2, "unique_kmers": 5,
             "split_reads": 0, "discordant_pairs": 0, "max_clip_len": 0,
             "unmapped_mates": 0, "class": "SMALL"},
        ]}
        variants = [
            {"chrom": "chr1", "pos0": 100, "pos1": 101, "ref": "A",
             "alt": "T", "dku": 5, "dka": 5},      # concordant
            {"chrom": "chr1", "pos0": 110, "pos1": 111, "ref": "C",
             "alt": "G", "dku": 1, "dka": 0},      # concordant
            {"chrom": "chr1", "pos0": 300, "pos1": 301, "ref": "G",
             "alt": "A", "dku": 0, "dka": 0},      # no signal
        ]
        result = cr.compare(bedgraph, discovery, variants)
        assert len(result["concordant"]) == 2
        assert len(result["no_signal"]) == 1
        assert len(result["discovery_only"]) == 1
        text = cr.format_summary(result)
        assert "CONCORDANT  (2 variants)" in text
        assert "DISCOVERY_ONLY  (1 regions)" in text

    def test_loaders(self, tmp_path):
        cr = _load("compare_regions")
        bg = tmp_path / "x.bedgraph"
        bg.write_text("#track type=bedGraph\nchr1\t10\t20\t5\n")
        got = cr.load_bedgraph(str(bg))
        assert got == {"chr1": [(10, 20, 5)]}
        bed = tmp_path / "x.bed"
        bed.write_text("#filters: a=1\n#chrom\tstart\tend\n"
                       "chr2\t5\t50\t3\t7\t0\t0\t2\t0\tSMALL\n")
        got = cr.load_discovery_bed(str(bed))
        assert got["chr2"][0]["reads"] == 3
        assert got["chr2"][0]["class"] == "SMALL"


class TestBuildMiniRef:
    def test_reconstructs_reference(self, tmp_path):
        from kmer_denovo_filter_tpu.htsio.bam import (
            BamWriter,
            encode_read,
        )
        from kmer_denovo_filter_tpu.htsio.fasta import read_fasta
        from tests.helpers import make_ref_seq

        bmr = _load("build_mini_ref")
        seq = make_ref_seq(500)
        bam_path = str(tmp_path / "t.bam")
        header = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr9\tLN:500\n"
        writer = BamWriter(bam_path, header, [("chr9", 500)])
        # perfect reads over two distant regions + one mismatch read
        for name, pos in (("a", 10), ("b", 40), ("c", 300)):
            raw = encode_read(name, 0, 0, pos, 60, [(0, 60)],
                              seq[pos:pos + 60], [40] * 60,
                              tags=b"NMi" + (0).to_bytes(4, "little"))
            writer.write_raw(0, pos, raw)
        raw = encode_read("bad", 0, 0, 200, 60, [(0, 60)],
                          "A" * 60, [40] * 60,
                          tags=b"NMi" + (3).to_bytes(4, "little"))
        writer.write_raw(0, 200, raw)
        writer.close(sort=True, index=True)

        out = str(tmp_path / "mini.fa")
        contigs = bmr.build_mini_ref(bam_path, out, merge_distance=100)
        assert set(contigs) == {"chr9_10_100", "chr9_300_360"}
        seqs = read_fasta(out)
        assert seqs["chr9_10_100"] == seq[10:100]
        assert seqs["chr9_300_360"] == seq[300:360]
        assert os.path.exists(out + ".fai")

    def test_cluster_intervals(self):
        bmr = _load("build_mini_ref")
        got = bmr.cluster_intervals(
            [(0, 10), (15, 30), (500, 600)], merge_distance=10)
        assert got == [(0, 30), (500, 600)]
        assert bmr.cluster_intervals([]) == []


class TestDownloadKraken2Checksum:
    """SHA-256 verification + ambiguity handling of the download
    script (reference scripts/download_kraken2_db.sh:80–154 plus the
    checksum/resume hardening)."""

    def _script(self, tmp_path, payload_dirs):
        import stat
        import tarfile
        bindir = tmp_path / "bin"
        bindir.mkdir()
        payload = tmp_path / "payload"
        for d in payload_dirs:
            (payload / d).mkdir(parents=True)
            for f in ("hash.k2d", "opts.k2d", "taxo.k2d"):
                (payload / d / f).write_bytes(b"\x00" * 8)
        tarball = tmp_path / "db.tar.gz"
        with tarfile.open(tarball, "w:gz") as tf:
            for d in payload_dirs:
                tf.add(payload / d, arcname=d)
        wget = bindir / "wget"
        wget.write_text(
            "#!/usr/bin/env bash\n"
            f'echo "$@" >> {tmp_path}/wget.log\n'
            'out=""\n'
            'while [[ $# -gt 0 ]]; do\n'
            '  if [[ "$1" == "-O" ]]; then out="$2"; shift 2; '
            'else shift; fi\n'
            'done\n'
            f'cp {tarball} "$out"\n')
        wget.chmod(wget.stat().st_mode | stat.S_IEXEC)
        return bindir, tarball

    def _run(self, bindir, args):
        import os
        import subprocess
        env = dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}")
        return subprocess.run(
            ["bash", "scripts/download_kraken2_db.sh"] + args,
            capture_output=True, text=True, env=env, cwd="/root/repo")

    def test_checksum_pass_and_fail(self, tmp_path):
        import hashlib
        bindir, tarball = self._script(tmp_path, ["k2"])
        good = hashlib.sha256(tarball.read_bytes()).hexdigest()
        out = self._run(bindir, ["--db", str(tmp_path / "ok"),
                                 "--sha256", good])
        assert out.returncode == 0, out.stderr
        assert "Checksum OK" in out.stdout
        out = self._run(bindir, ["--db", str(tmp_path / "bad"),
                                 "--sha256", "0" * 64])
        assert out.returncode != 0
        assert "SHA-256 mismatch" in out.stderr

    def test_ambiguous_layout_rejected(self, tmp_path):
        bindir, _ = self._script(tmp_path, ["k2_a", "k2_b"])
        out = self._run(bindir, ["--db", str(tmp_path / "db")])
        assert out.returncode != 0
        assert "multiple Kraken2 database directories" in out.stderr

    def test_taxonomy_warnings(self, tmp_path):
        bindir, _ = self._script(tmp_path, ["k2"])
        out = self._run(bindir, ["--db", str(tmp_path / "db")])
        assert out.returncode == 0, out.stderr
        assert "nodes.dmp not found" in out.stderr
        assert "names.dmp not found" in out.stderr

    def test_keep_tarball(self, tmp_path):
        bindir, _ = self._script(tmp_path, ["k2"])
        dest = tmp_path / "db"
        out = self._run(bindir, ["--db", str(dest), "--keep-tarball"])
        assert out.returncode == 0, out.stderr
        assert (dest / "kraken2_db.tar.gz").exists()


class TestDownloadKraken2Script:
    """Fake-`wget` harness for scripts/download_kraken2_db.sh (the
    reference's test_download_kraken2_db_script.py pattern: a PATH
    shim logs its args and fabricates the tarball; no network)."""

    def _fake_wget(self, tmp_path):
        import stat
        import subprocess
        import tarfile
        bindir = tmp_path / "bin"
        bindir.mkdir()
        # a real tarball the fake wget will "download"
        payload = tmp_path / "payload"
        (payload / "k2_standard").mkdir(parents=True)
        for f in ("hash.k2d", "opts.k2d", "taxo.k2d"):
            (payload / "k2_standard" / f).write_bytes(b"\x00" * 8)
        tarball = tmp_path / "db.tar.gz"
        with tarfile.open(tarball, "w:gz") as tf:
            tf.add(payload / "k2_standard", arcname="k2_standard")
        wget = bindir / "wget"
        wget.write_text(
            "#!/usr/bin/env bash\n"
            f'echo "$@" >> {tmp_path}/wget.log\n'
            'out=""\n'
            'while [[ $# -gt 0 ]]; do\n'
            '  if [[ "$1" == "-O" ]]; then out="$2"; shift 2; '
            'else shift; fi\n'
            'done\n'
            f'cp {tarball} "$out"\n')
        wget.chmod(wget.stat().st_mode | stat.S_IEXEC)
        return bindir

    def test_downloads_extracts_validates(self, tmp_path):
        import os
        import subprocess
        bindir = self._fake_wget(tmp_path)
        dest = tmp_path / "db"
        env = dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}")
        out = subprocess.run(
            ["bash", "scripts/download_kraken2_db.sh", str(dest)],
            capture_output=True, text=True, env=env, cwd="/root/repo")
        assert out.returncode == 0, out.stderr
        assert "Database ready" in out.stdout
        log = (tmp_path / "wget.log").read_text()
        assert "genome-idx.s3.amazonaws.com" in log
        assert "--continue" in log  # resumable download
        assert (dest / "k2_standard" / "hash.k2d").exists()
        # tarball removed after extraction (reference behavior)
        assert not (dest / "kraken2_db.tar.gz").exists()

    def test_fails_without_k2d_files(self, tmp_path):
        import os
        import stat
        import subprocess
        bindir = tmp_path / "bin"
        bindir.mkdir()
        wget = bindir / "wget"
        # fabricate a tarball with no k2d files
        import tarfile
        junk = tmp_path / "junk"
        junk.mkdir()
        (junk / "readme.txt").write_text("nope")
        tarball = tmp_path / "bad.tar.gz"
        with tarfile.open(tarball, "w:gz") as tf:
            tf.add(junk, arcname="junk")
        wget.write_text(
            "#!/usr/bin/env bash\n"
            'out=""\n'
            'while [[ $# -gt 0 ]]; do\n'
            '  if [[ "$1" == "-O" ]]; then out="$2"; shift 2; '
            'else shift; fi\n'
            'done\n'
            f'cp {tarball} "$out"\n')
        wget.chmod(wget.stat().st_mode | stat.S_IEXEC)
        env = dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}")
        out = subprocess.run(
            ["bash", "scripts/download_kraken2_db.sh",
             str(tmp_path / "db2")],
            capture_output=True, text=True, env=env, cwd="/root/repo")
        assert out.returncode != 0
        assert "missing required database file" in out.stderr


class TestShardedBenchScript:
    def test_reports_balance_and_parity(self):
        import json
        import subprocess
        out = subprocess.run(
            [__import__("sys").executable, "scripts/bench_sharded.py",
             "4"],
            capture_output=True, text=True, cwd="/root/repo",
            env=dict(__import__("os").environ,
                     JAX_PLATFORMS="cpu",
                     XLA_FLAGS="--xla_force_host_platform_device_count=4"))
        assert out.returncode == 0, out.stderr
        rep = json.loads(out.stdout.strip().split("\n")[-1])
        assert rep["membership_parity"] is True
        assert rep["table_imbalance_max_over_mean"] < 1.2
        assert rep["query_imbalance_max_over_mean"] < 1.2
