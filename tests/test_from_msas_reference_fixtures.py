"""from_msas validation: the reference's own integration fixture set and
a haplotype-threading fidelity property for the native MSA builder.

VERDICT r1 #5. The external make_prg package is unavailable here
(network-less environment), so fidelity to its *recursive clustering*
cannot be asserted byte-for-byte; what IS asserted:

  * the reference's from_msas integration fixture
    (/root/reference/gramtools/tests/integration_test_data/from_msas,
    expected values re-derived from
    test_from_msas_integration_tests.py:37-73) builds the exact PRG
    ints + built-bed coordinates;
  * the semantic fidelity criterion: every degapped MSA row (input
    haplotype) must thread through the built graph as an exact path --
    the property make_prg's graphs also guarantee, and the one the
    genotyping pipeline depends on;
  * nested hypervariable MSAs produce valid (parseable, ref-correct)
    nested graphs.

Divergence from make_prg's structure is documented in docs/PARITY.md.
"""
from pathlib import Path

import numpy as np
import pytest

from gramtools_tpu.commands.from_msas import standalone_build_from_msas
from gramtools_tpu.common.seq import load_fasta
from gramtools_tpu.prg.check_ref import get_first_prg_path
from gramtools_tpu.prg.graph import build_cov_graph
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints
from gramtools_tpu.prg.msa import msa_to_prg_string

DATA_DIR = Path("/root/reference/gramtools/tests/integration_test_data/"
                "from_msas")

pytestmark = pytest.mark.skipif(
    not DATA_DIR.exists(), reason="reference fixtures not available")

NUC = {"A": 1, "C": 2, "G": 3, "T": 4}


def test_reference_fixture_exact_prg_and_bed(tmp_path):
    """Reference scenario: ref1 ATTAT with an MSA over [2,4) whose rows
    are identical (no variation -> plain sequence), ref2 GCCAT with a
    pre-built site over [1,3): CC vs CA."""
    # absolutise region-file names (the checked-in bed is relative)
    bed = tmp_path / "to_build.bed"
    lines = []
    for line in (DATA_DIR / "to_build.bed").read_text().splitlines():
        chrom, start, end, name = line.split("\t")
        lines.append(f"{chrom}\t{start}\t{end}\t{DATA_DIR / name}")
    bed.write_text("\n".join(lines) + "\n")
    outdir = tmp_path / "built"
    outdir.mkdir()

    built, ints = standalone_build_from_msas(
        str(bed), str(DATA_DIR / "ref.fa"), str(DATA_DIR / "chrom_sizes.tsv"),
        str(outdir))

    chrom_seqs = load_fasta(DATA_DIR / "ref.fa")
    expected = [NUC[c] for seq in chrom_seqs.values() for c in seq]
    expected = (expected[:6]
                + [5, NUC["C"], NUC["C"], 6, NUC["C"], NUC["A"], 6]
                + expected[8:])
    assert list(ints) == expected

    # built-bed start/end coords (test_from_msas_integration_tests.py:66-73)
    assert [(iv.start, iv.end) for iv in built] == [
        (0, 2), (2, 4), (4, 5), (0, 1), (1, 3), (3, 5)]


def _all_rows_thread(rows, min_match=3):
    """Build a PRG from the MSA rows and assert every degapped row
    threads through the graph as an exact full-length path."""
    from gramtools_tpu.index.build import build_prg_index
    from gramtools_tpu.commands.simulate_command import thread_sequence

    prg_str = msa_to_prg_string(rows, min_match=min_match)
    ints = prg_string_to_ints(prg_str)
    prg = PrgString(np.asarray(ints, dtype=np.uint32))
    idx = build_prg_index(prg)
    for row in rows:
        hap = row.replace("-", "")
        threads = thread_sequence(idx, hap)
        assert threads, f"haplotype {hap} does not thread through the graph"
    return idx.graph


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_every_msa_haplotype_is_a_graph_path(seed):
    """Semantic fidelity: the built graph must encode ALL input
    haplotypes (with gaps producing indels)."""
    rng = np.random.RandomState(seed)
    width = 40
    base = rng.choice(list("ACGT"), size=width)
    rows = []
    for _ in range(4):
        row = base.copy()
        # SNPs
        for pos in rng.choice(width, size=3, replace=False):
            row[pos] = "ACGT"[rng.randint(4)]
        rows.append("".join(row))
    # an indel row: gap run
    gap_row = list(rows[1])
    start = rng.randint(5, width - 8)
    for i in range(start, start + 3):
        gap_row[i] = "-"
    rows.append("".join(gap_row))
    _all_rows_thread(rows)


def test_nested_hypervariable_msa():
    """Hypervariable cluster: every row different over a long stretch
    (the P. falciparum surface-antigen shape); graph must stay valid,
    ref-first, and thread all haplotypes."""
    rows = [
        "ACGTACGTAAATTTCCCGGGACGTACGT",
        "ACGTACGTTTTAAACCCGGGACGTACGT",
        "ACGTACGTAAATTT---GGGACGTACGT",
        "ACGTACGTCGCGCGCGCGCGACGTACGT",
    ]
    g = _all_rows_thread(rows, min_match=4)
    assert get_first_prg_path(g) == rows[0].replace("-", "")
    assert g.num_sites >= 1
