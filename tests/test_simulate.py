"""Simulate integration: sampled-path jVCF == induced-genotype jVCF
(ported from gramtools/tests/simulate/test_simulate_integration_tests.py).
"""
import json
from pathlib import Path

import pytest

from gramtools_tpu.cli import run

DATA_DIR = Path("/root/reference/gramtools/tests/integration_test_data")

pytestmark = pytest.mark.skipif(
    not DATA_DIR.exists(), reason="reference fixtures not available")


def strip_desc(simu_json):
    for sample in simu_json["Samples"]:
        sample.pop("Desc", None)


def test_make_paths_and_induce_from_paths_get_same_jsons(tmp_path):
    prg_file = str(DATA_DIR / "IT1" / "prg.bin")
    assert run(["simulate", "--prg", prg_file, "-n", "5", "--sample_id",
                "made", "-o", str(tmp_path), "--seed", "7", "--force"]) == 0
    made = json.load(open(tmp_path / "made.json"))
    strip_desc(made)

    assert run(["simulate", "--prg", prg_file, "-o", str(tmp_path),
                "--sample_id", "induced",
                "--induce_genotypes", str(tmp_path / "made.fasta"),
                "--force"]) == 0
    induced = json.load(open(tmp_path / "induced.json"))
    strip_desc(induced)

    assert made == induced
