"""CLI e2e of `genotype --engine device`: report fields + output parity.

VERDICT r1 #7: the flagship (device) path must be exercised through the
CLI, not only via quasimap_reads(engine=...). Runs on the CPU backend
(conftest forces it) -- the engine code path is identical."""
import gzip
import json
from pathlib import Path

import pytest

from gramtools_tpu.cli import run

DATA_DIR = Path("/root/reference/gramtools/tests/integration_test_data")

pytestmark = pytest.mark.skipif(
    not DATA_DIR.exists(), reason="reference fixtures not available")


@pytest.fixture(scope="module", params=["IT1", "IT3"])
def both_engines(request, tmp_path_factory):
    base = DATA_DIR / request.param
    root = tmp_path_factory.mktemp(f"dev_{request.param}")
    assert run(["build", "--gram_dir", str(root / "gram"),
                "--prg", str(base / "prg.bin"), "--ref", str(base / "ref.fa"),
                "--kmer_size", "5", "--force"]) == 0
    for engine in ("host", "device"):
        assert run(["genotype", "--gram_dir", str(root / "gram"),
                    "--genotype_dir", str(root / engine),
                    "--reads", str(base / "reads.fastq"),
                    "--sample_id", "s", "--engine", engine, "--force"]) == 0
    return root


def _read(path):
    if path.suffix == ".gz":
        return gzip.open(path, "rt").read()
    return path.read_text()


def test_device_engine_report_fields(both_engines):
    rep = json.load(open(both_engines / "device" / "genotype_report.json"))
    eng = rep["processes"]["genotype"]["engine"]
    assert set(eng) >= {"device_mapped", "host_fallbacks", "device_retried"}
    assert eng["device_mapped"] > 0
    host_rep = json.load(open(both_engines / "host" / "genotype_report.json"))
    assert "engine" not in host_rep["processes"]["genotype"]


def test_device_engine_outputs_match_host(both_engines):
    for rel in ("genotype/genotyped.json",
                "coverage/allele_sum_coverage",
                "coverage/grouped_allele_counts_coverage.json",
                "coverage/allele_base_coverage.json",
                "genotype/personalised_reference.fasta"):
        dev = _read(both_engines / "device" / rel)
        host = _read(both_engines / "host" / rel)
        assert dev == host, rel
    dev_vcf = [l for l in _read(
        both_engines / "device" / "genotype/genotyped.vcf.gz").splitlines()
        if not l.startswith("##fileDate")]
    host_vcf = [l for l in _read(
        both_engines / "host" / "genotype/genotyped.vcf.gz").splitlines()
        if not l.startswith("##fileDate")]
    assert dev_vcf == host_vcf


def test_auto_engine_resolves_to_host_on_cpu(tmp_path):
    """--engine auto on the CPU backend must pick the host engine."""
    base = DATA_DIR / "IT1"
    assert run(["build", "--gram_dir", str(tmp_path / "gram"),
                "--prg", str(base / "prg.bin"), "--ref", str(base / "ref.fa"),
                "--kmer_size", "5", "--force"]) == 0
    assert run(["genotype", "--gram_dir", str(tmp_path / "gram"),
                "--genotype_dir", str(tmp_path / "geno"),
                "--reads", str(base / "reads.fastq"),
                "--sample_id", "s", "--engine", "auto", "--force"]) == 0
    rep = json.load(open(tmp_path / "geno" / "genotype_report.json"))
    assert "engine" not in rep["processes"]["genotype"]
