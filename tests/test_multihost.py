"""2-process CPU multi-host harness: sharded_count across processes.

Spawns two worker processes that join a jax.distributed runtime
(Gloo collectives over localhost), each feeding HALF the reads from
its own process — the per-host BAM-shard input model — and asserts
the merged distributed count is identical on both hosts and equal to
the single-process oracle (SURVEY.md §4 "multi-host tests on a
simulated mesh"; BASELINE.md 2-host target).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
outdir = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

# join the runtime BEFORE any jax call initialises the backend
# (importing the package creates device constants)
os.environ["KDF_COORDINATOR"] = f"localhost:{port}"
os.environ["KDF_NUM_PROCESSES"] = str(nproc)
os.environ["KDF_PROCESS_ID"] = str(pid)
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

from kmer_denovo_filter_tpu.parallel import multihost

assert multihost.initialize()   # idempotent no-op once joined
assert jax.device_count() == 2 * nproc

K = 31
rng = np.random.default_rng(7)           # same stream on both procs
codes_all = rng.integers(0, 4, size=(16, 64), dtype=np.uint8)
codes_all[rng.random(codes_all.shape) < 0.02] = 4
lengths_all = rng.integers(K, 65, size=16).astype(np.int32)

half = 8
codes = codes_all[pid * half:(pid + 1) * half]
lengths = lengths_all[pid * half:(pid + 1) * half]

keys, counts = multihost.sharded_count_multihost(codes, lengths, K)
np.savez(os.path.join(outdir, f"result_{pid}.npz"),
         keys=keys, counts=counts)
print(f"[{pid}] distinct={keys.shape[0]} total={counts.sum()}")

# multi-host tile-join filtered counter: the table is the distinct
# k-mers just counted; feeding the same per-host batches must tally
# every table key exactly its global count (Pallas interpreter on CPU)
from kmer_denovo_filter_tpu.parallel.tile_sharded import (
    ShardedTileCounter,
)

mesh = multihost.global_mesh()
tc = ShardedTileCounter(keys, K, mesh, interpret=True)
tc.feed(codes, lengths)
tally = tc.result()
np.savez(os.path.join(outdir, f"tile_{pid}.npz"), tally=tally)
assert np.array_equal(tally, counts), "tile tally != distributed count"
print(f"[{pid}] tile tally ok total={tally.sum()}")

# multi-host anchoring scan: each host gets the mask for ITS reads
from kmer_denovo_filter_tpu.parallel.tile_sharded import (
    ShardedTileScanner,
)

sc = ShardedTileScanner(keys, K, mesh, interpret=True)
hits = sc(codes, lengths)
assert hits.shape[0] == codes.shape[0]
np.savez(os.path.join(outdir, f"scan_{pid}.npz"), hits=hits)
print(f"[{pid}] tile scan ok found={hits.sum()}")
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(os.environ.get("KDF_SKIP_MULTIHOST") == "1",
                    reason="multihost harness disabled")
def test_two_process_sharded_count(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port),
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(2)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"

    r0 = np.load(tmp_path / "result_0.npz")
    r1 = np.load(tmp_path / "result_1.npz")
    # identical merged result on every host
    assert np.array_equal(r0["keys"], r1["keys"])
    assert np.array_equal(r0["counts"], r1["counts"])

    # equals the single-process oracle over the full read set
    from collections import Counter

    from kmer_denovo_filter_tpu.kmer import extract_read_kmers
    from kmer_denovo_filter_tpu.ops import encode as enc

    K = 31
    rng = np.random.default_rng(7)
    codes_all = rng.integers(0, 4, size=(16, 64), dtype=np.uint8)
    codes_all[rng.random(codes_all.shape) < 0.02] = 4
    lengths_all = rng.integers(K, 65, size=16).astype(np.int32)
    bases = np.array(list("ACGTN"))
    expected = Counter()
    for row, ln in zip(codes_all, lengths_all):
        seq = "".join(bases[row[:ln]])
        per_pos, _ = extract_read_kmers(seq, K)
        expected.update(per_pos.values())
    got_kmers = enc.keys_to_kmers(r0["keys"], K)
    got = dict(zip(got_kmers, r0["counts"].tolist()))
    assert got == dict(expected)

    # the multi-host tile-join tally agrees on both hosts
    t0 = np.load(tmp_path / "tile_0.npz")["tally"]
    t1 = np.load(tmp_path / "tile_1.npz")["tally"]
    assert np.array_equal(t0, t1)
    assert np.array_equal(t0, r0["counts"])

    # the multi-host anchoring scan returns each host's own mask;
    # stitched together they must equal the single-process oracle
    h0 = np.load(tmp_path / "scan_0.npz")["hits"]
    h1 = np.load(tmp_path / "scan_1.npz")["hits"]
    stitched = np.concatenate([h0, h1])
    import jax

    from kmer_denovo_filter_tpu import engine as eng
    index = eng.KmerIndex(r0["keys"], K)
    expected = eng.scan_reads_for_hits(index, codes_all, lengths_all)
    assert np.array_equal(stitched, expected)
    assert expected.any()


# ── End-to-end: 2-process kmer-discovery deployment ─────────────────

E2E_WORKER = r"""
import os, sys

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
out_prefix = sys.argv[4]
giab = sys.argv[5]
candidate_summary = sys.argv[6]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

# the deployment contract: KDF_* env + the stock CLI entry point
os.environ["KDF_COORDINATOR"] = f"localhost:{port}"
os.environ["KDF_NUM_PROCESSES"] = str(nproc)
os.environ["KDF_PROCESS_ID"] = str(pid)

from kmer_denovo_filter_tpu.cli import discovery_main

discovery_main([
    "--child", os.path.join(giab, "HG002_child.bam"),
    "--mother", os.path.join(giab, "HG004_mother.bam"),
    "--father", os.path.join(giab, "HG003_father.bam"),
    "--ref-fasta", os.path.join(giab, "mini_ref.fa"),
    "--ref-jf", os.path.join(giab, "mini_ref.fa.k31.jf"),
    "--out-prefix", out_prefix,
    "--min-child-count", "3",
    "--kmer-size", "31",
    "--candidate-summary", candidate_summary,
])
print(f"[{pid}] discovery pipeline done")
"""


@pytest.mark.skipif(os.environ.get("KDF_SKIP_MULTIHOST") == "1",
                    reason="multihost harness disabled")
def test_two_process_discovery_end_to_end(tmp_path,
                                          generated_example_output,
                                          generated_discovery_output):
    """`kmer-discovery` as a 2-process deployment writes outputs (from
    process 0) byte-identical to the single-process run."""
    from tests.conftest import GIAB_DIR, GIAB_DISCOVERY_DATA_EXISTS

    if not GIAB_DISCOVERY_DATA_EXISTS:
        pytest.skip("GIAB discovery test data not available")

    worker = tmp_path / "worker_e2e.py"
    worker.write_text(E2E_WORKER)
    out_prefix = str(tmp_path / "mh_discovery")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port),
         out_prefix, GIAB_DIR, generated_example_output["summary"]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"

    # process 0 wrote every output file; byte parity with single-process
    single = generated_discovery_output
    for key, suffix in [("bed", ".bed"),
                        ("bedgraph", ".kmer_coverage.bedgraph"),
                        ("read_coverage_bed", ".read_coverage.bed"),
                        ("metrics", ".metrics.json"),
                        ("summary", ".summary.txt"),
                        ("bedpe", ".sv.bedpe")]:
        multi_path = out_prefix + suffix
        assert os.path.isfile(multi_path), f"missing {multi_path}"
        with open(multi_path, "rb") as fh:
            multi_bytes = fh.read()
        with open(single[key], "rb") as fh:
            single_bytes = fh.read()
        assert multi_bytes == single_bytes, f"{suffix} differs"

    # informative BAM: identical record set (BGZF framing may differ)
    from kmer_denovo_filter_tpu.htsio.bam import BamReader

    def bam_records(path):
        r = BamReader(path)
        return [(rec.query_name, rec.tid, rec.pos, rec.flag,
                 rec.query_sequence, rec.get_tag("dk"))
                for rec in r.records]

    assert (bam_records(out_prefix + ".informative.bam")
            == bam_records(single["bam"]))


VCF_E2E_WORKER = r"""
import os, sys

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
outdir = sys.argv[4]
giab = sys.argv[5]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

os.environ["KDF_COORDINATOR"] = f"localhost:{port}"
os.environ["KDF_NUM_PROCESSES"] = str(nproc)
os.environ["KDF_PROCESS_ID"] = str(pid)

from kmer_denovo_filter_tpu.cli import vcf_main

vcf_main([
    "--vcf", os.path.join(giab, "candidates.vcf.gz"),
    "--child", os.path.join(giab, "HG002_child.bam"),
    "--mother", os.path.join(giab, "HG004_mother.bam"),
    "--father", os.path.join(giab, "HG003_father.bam"),
    "--output", os.path.join(outdir, "out.vcf.gz"),
    "--metrics", os.path.join(outdir, "metrics.json"),
    "--summary", os.path.join(outdir, "summary.txt"),
    "--proband-id", "HG002",
])
print(f"[{pid}] vcf pipeline done")
"""


@pytest.mark.skipif(os.environ.get("KDF_SKIP_MULTIHOST") == "1",
                    reason="multihost harness disabled")
def test_two_process_vcf_end_to_end(tmp_path, generated_example_output):
    """`kmer-denovo` as a 2-process deployment: parent scans stripe
    across processes; process 0's outputs match single-process."""
    import gzip

    from tests.conftest import GIAB_DIR, GIAB_DATA_EXISTS

    if not GIAB_DATA_EXISTS:
        pytest.skip("GIAB test data not available")

    worker = tmp_path / "worker_vcf.py"
    worker.write_text(VCF_E2E_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port),
         str(tmp_path), GIAB_DIR],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"

    def vcf_data_lines(path):
        with gzip.open(path, "rt") as fh:
            return [l for l in fh if not l.startswith("#")]

    assert (vcf_data_lines(str(tmp_path / "out.vcf.gz"))
            == vcf_data_lines(generated_example_output["vcf"]))
    with open(tmp_path / "metrics.json") as fh:
        multi_metrics = fh.read()
    with open(generated_example_output["metrics"]) as fh:
        single_metrics = fh.read()
    assert multi_metrics == single_metrics
    with open(tmp_path / "summary.txt") as fh:
        multi_summary = fh.read()
    with open(generated_example_output["summary"]) as fh:
        single_summary = fh.read()
    assert multi_summary == single_summary
