"""Self-golden regression: fresh runs must reproduce tests/goldens/."""

import gzip
import os

import pytest

from tests.conftest import GIAB_DATA_EXISTS

GOLD = os.path.join(os.path.dirname(__file__), "goldens")

TEXT_FILES = [
    "metrics.json", "summary.txt",
    "giab_discovery.bed", "giab_discovery.metrics.json",
    "giab_discovery.summary.txt", "giab_discovery.sv.bedpe",
    "giab_discovery.kmer_coverage.bedgraph",
    "giab_discovery.read_coverage.bed",
]


@pytest.mark.skipif(not GIAB_DATA_EXISTS, reason="GIAB data unavailable")
class TestSelfGoldens:
    def test_vcf_bytes(self, generated_example_output):
        exp = gzip.open(os.path.join(GOLD, "annotated.vcf.gz")).read()
        got = gzip.open(generated_example_output["vcf"]).read()
        assert got == exp

    def test_vcf_mode_text_outputs(self, generated_example_output):
        for name, key in (("metrics.json", "metrics"),
                          ("summary.txt", "summary")):
            exp = open(os.path.join(GOLD, name)).read()
            got = open(generated_example_output[key]).read()
            assert got == exp, name

    def test_discovery_text_outputs(self, generated_discovery_output):
        mapping = {
            "giab_discovery.bed": "bed",
            "giab_discovery.metrics.json": "metrics",
            "giab_discovery.summary.txt": "summary",
            "giab_discovery.sv.bedpe": "bedpe",
            "giab_discovery.kmer_coverage.bedgraph": "bedgraph",
            "giab_discovery.read_coverage.bed": "read_coverage_bed",
        }
        for name, key in mapping.items():
            exp = open(os.path.join(GOLD, name)).read()
            got = open(generated_discovery_output[key]).read()
            assert got == exp, name
