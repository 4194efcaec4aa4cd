"""IT4 discover integration: rebasing parity on the reference's real
fixture (pers_ref + genotyped VCF), with the variant caller's known
output injected (the reference test runs cortex with a fixed seed and
obtains exactly this record: chr1:72 G->GCCAAACC, rebasing to
chr1:74 T->GCCAAACC -- test_discover_integration_tests.py:46-77)."""
from pathlib import Path
from types import SimpleNamespace

import pytest

from gramtools_tpu.commands.discover_command import rebase_vcf
from gramtools_tpu.common.vcf import parse_vcf

IT4 = Path("/root/reference/gramtools/tests/integration_test_data/IT4")

pytestmark = pytest.mark.skipif(not IT4.exists(), reason="IT4 unavailable")


def test_it4_rebase_parity(tmp_path):
    discov_vcf = tmp_path / "cortex.vcf"
    discov_vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t72\t.\tG\tGCCAAACC\t.\tPASS\t.\n")
    paths = SimpleNamespace(
        pers_ref=IT4 / "pers_ref.fa",
        geno_vcf=IT4 / "geno.vcf.gz",
        discov_vcf=discov_vcf,
    )
    rebased = rebase_vcf(paths)
    assert len(rebased) == 1
    rec = rebased[0]
    assert (rec.chrom, rec.pos, rec.ref, rec.alts) == (
        "chr1", 74, "T", ("GCCAAACC",))


def test_it4_inconsistent_record_dropped(tmp_path):
    """A record whose REF does not match the personalised reference is
    screened out (discover.py:250-262)."""
    discov_vcf = tmp_path / "cortex.vcf"
    discov_vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t72\t.\tT\tA\t.\tPASS\t.\n")  # pers ref has G at 72
    paths = SimpleNamespace(
        pers_ref=IT4 / "pers_ref.fa",
        geno_vcf=IT4 / "geno.vcf.gz",
        discov_vcf=discov_vcf,
    )
    assert rebase_vcf(paths) == []
