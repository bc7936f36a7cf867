"""GIAB test-data regeneration script, driven with fake htslib tools.

Mirrors the reference's fake-wget harness approach (reference
tests/test_download_kraken2_db_script.py:19–44): stub samtools /
bcftools / bgzip / tabix executables are placed on PATH that log
their argv and emit canned outputs, so the full script logic (window
discovery, child-private filtering, region merging, BAM slicing,
candidate VCF assembly) runs without network or real binaries.
"""

import gzip
import os
import stat
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "download_giab_dnm_testdata.py")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))
import download_giab_dnm_testdata as dl  # noqa: E402


# ── pure-logic units ───────────────────────────────────────────────


def test_is_snv():
    assert dl.is_snv("A", "T")
    assert dl.is_snv("C", "G,T")
    assert not dl.is_snv("AT", "A")
    assert not dl.is_snv("A", "ATT")
    assert not dl.is_snv("N", "A")


def test_build_regions_merges_overlaps():
    snvs = [("chr1", 1000, "l1"), ("chr1", 1400, "l2"),
            ("chr2", 9000, "l3")]
    regions = dl.build_regions(snvs, padding=500)
    # chr1 windows [499,1500) and [899,1900) overlap → merged
    chr1 = [r for r in regions if r[0] == "chr1"]
    assert chr1 == [("chr1", 499, 1900)]
    chr2 = [r for r in regions if r[0] == "chr2"]
    assert chr2 == [("chr2", 8499, 9500)]
    # curated loci always present
    assert any(r[0] == "chr7" for r in regions)
    # sorted by chromosome then start
    assert regions == sorted(
        regions, key=lambda r: ((0, int(r[0][3:]))
                                if r[0][3:].isdigit() else (1, r[0]),
                                r[1]))


def test_build_regions_curated_padding():
    regions = dl.build_regions([], padding=500)
    trb = next(r for r in regions if r[0] == "chr7")
    # -1 kb / +11 kb padding around the 10,607 bp TRB deletion
    assert trb[1] == 142786222 - 1 - 1000
    assert trb[2] == 142786222 + 10607 + 11000


# ── fake-tool harness ──────────────────────────────────────────────


VCF_HEADER = ("##fileformat=VCFv4.2\n"
              "##contig=<ID=chr1>\n"
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
              "\tHG002\n")

# child has 3 SNVs; parents share position 5000100 → two are private
CHILD_RECORDS = [
    "chr1\t5000050\t.\tA\tT\t50\tPASS\t.\tGT\t0/1",
    "chr1\t5000100\t.\tC\tG\t50\tPASS\t.\tGT\t0/1",
    "chr1\t5000200\t.\tG\tA\t50\tPASS\t.\tGT\t1/1",
]
PARENT_POSITIONS = ["chr1\t5000100"]


def _write_stub(bindir, name, body):
    path = os.path.join(bindir, name)
    with open(path, "w") as fh:
        fh.write("#!/usr/bin/env python3\n" + body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


@pytest.fixture
def fake_tools(tmp_path):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    logf = tmp_path / "calls.log"
    common = (
        "import sys, os\n"
        f"log = open({str(logf)!r}, 'a')\n"
        "log.write(' '.join(sys.argv) + chr(10))\n"
        "log.flush()\n"
    )
    _write_stub(str(bindir), "bcftools", common + f"""
args = sys.argv[1:]
if args[:1] == ['--version']:
    sys.exit(0)
if args[0] == 'view' and '-h' in args:
    sys.stdout.write({VCF_HEADER!r})
elif args[0] == 'view':
    url = args[-1]
    if 'HG002' in url:
        sys.stdout.write('\\n'.join({CHILD_RECORDS!r}) + '\\n')
elif args[0] == 'query':
    url = args[-1]
    if 'HG003' in url or 'HG004' in url:
        sys.stdout.write('\\n'.join({PARENT_POSITIONS!r}) + '\\n')
""")
    _write_stub(str(bindir), "samtools", common + """
args = sys.argv[1:]
if args[:1] == ['--version']:
    sys.exit(0)
if args[0] == 'view':
    os.write(1, b'FAKEBAM')
elif args[0] == 'sort':
    out = args[args.index('-o') + 1]
    open(out, 'wb').write(b'FAKESORTED')
elif args[0] == 'index':
    open(args[1] + '.bai', 'wb').write(b'FAKEBAI')
""")
    _write_stub(str(bindir), "bgzip", common + """
import gzip
path = sys.argv[-1]
data = open(path, 'rb').read()
with gzip.open(path + '.gz', 'wb') as fh:
    fh.write(data)
os.unlink(path)
""")
    _write_stub(str(bindir), "tabix", common + """
if sys.argv[1:2] != ['--version']:
    open(sys.argv[-1] + '.tbi', 'wb').write(b'FAKETBI')
""")
    env = dict(os.environ)
    env["PATH"] = f"{bindir}:{env['PATH']}"
    return env, str(logf)


def test_full_script_with_fake_tools(fake_tools, tmp_path):
    env, logf = fake_tools
    out = tmp_path / "out"
    res = subprocess.run(
        [sys.executable, SCRIPT, "-o", str(out), "-n", "2"],
        env=env, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    # two child-private SNVs selected (5000100 is in both parents)
    assert "selected 2 SNVs" in res.stderr

    # per-sample sorted+indexed BAMs exist
    for sample in ("HG002_child", "HG003_father", "HG004_mother"):
        assert (out / f"{sample}.bam").read_bytes() == b"FAKESORTED"
        assert (out / f"{sample}.bam.bai").exists()

    # candidate VCF holds the header and only the private SNVs
    with gzip.open(out / "candidates.vcf.gz", "rt") as fh:
        lines = fh.read().splitlines()
    data = [l for l in lines if not l.startswith("#")]
    positions = sorted(int(l.split("\t")[1]) for l in data)
    assert 5000100 not in positions
    assert 5000050 in positions and 5000200 in positions
    assert (out / "candidates.vcf.gz.tbi").exists()
    assert (out / "README.md").exists()

    calls = open(logf).read()
    # remote slicing went through samtools view on the public URL
    assert "samtools view -b" in calls
    assert "novoalign_bams" in calls
    # discovery queried all three benchmark VCFs
    for s in ("HG002_GRCh38", "HG003_GRCh38", "HG004_GRCh38"):
        assert s in calls


def test_script_fails_cleanly_without_tools(tmp_path):
    env = dict(os.environ)
    env["PATH"] = str(tmp_path)  # nothing on PATH
    res = subprocess.run(
        [sys.executable, SCRIPT, "-o", str(tmp_path / "o")],
        env=env, capture_output=True, text=True)
    assert res.returncode != 0
    assert "not found on PATH" in (res.stderr + res.stdout)
