"""Recursive MSA clustering (prg/msa.py): make_prg-style nested-site
decomposition + the haplotype-threading invariant on clustered MSAs."""
import numpy as np
import pytest

from gramtools_tpu.prg.msa import (
    _cluster, msa_to_prg_string, MIN_MATCH_LENGTH)
from gramtools_tpu.prg.linearise import prg_string_to_ints, PrgString
from gramtools_tpu.prg.graph import build_cov_graph


def _rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def _mutate(rng, seq, n_snps):
    s = list(seq)
    for p in rng.choice(len(s), size=n_snps, replace=False):
        s[p] = "ACGT"[(("ACGT".index(s[p])) + 1 + rng.randint(3)) % 4]
    return "".join(s)


def _two_family_msa(rng, flank=20, core=40, per_family=4):
    """Two diverged families, each with light within-family variation;
    shared flanks so the variant interval is internal."""
    left, right = _rand_seq(rng, flank), _rand_seq(rng, flank)
    fam_a = _rand_seq(rng, core)
    fam_b = _mutate(rng, fam_a, core // 2)        # heavily diverged
    rows = []
    for fam in (fam_a, fam_b):
        for _ in range(per_family):
            rows.append(left + _mutate(rng, fam, 2) + right)
    return rows, left, right


def test_cluster_separates_families():
    rng = np.random.RandomState(0)
    rows, *_ = _two_family_msa(rng)
    groups = _cluster(rows)
    assert len(groups) == 2
    assert sorted(tuple(sorted(g)) for g in groups) == [
        (0, 1, 2, 3), (4, 5, 6, 7)]


def test_diverse_msa_builds_nested_sites():
    rng = np.random.RandomState(1)
    rows, left, right = _two_family_msa(rng)
    prg = msa_to_prg_string(rows)
    assert prg.startswith(left[:10]) and prg.endswith(right[-10:])
    # the two cluster alleles each carry their within-family variation
    # as sites INSIDE the outer site: bracket nesting depth >= 2
    depth = best = 0
    for c in prg:
        if c == "[":
            depth += 1
            best = max(best, depth)
        elif c == "]":
            depth -= 1
    assert best >= 2, f"no nested decomposition in {prg!r}"
    assert depth == 0


def test_flat_when_no_cluster_structure():
    """A biallelic SNP column must stay a flat site (no spurious
    nesting)."""
    rng = np.random.RandomState(2)
    left, right = _rand_seq(rng, 10), _rand_seq(rng, 10)
    rows = [left + "A" + right, left + "C" + right]
    assert msa_to_prg_string(rows) == f"{left}[A,C]{right}"


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_threading_invariant_on_clustered_msas(seed):
    """Every MSA row must thread exactly through the built PRG (the
    correctness contract of the builder, whatever the clustering)."""
    from gramtools_tpu.commands.simulate_command import thread_sequence
    from gramtools_tpu.index.build import build_prg_index

    rng = np.random.RandomState(seed)
    rows, *_ = _two_family_msa(rng, flank=15, core=30, per_family=3)
    # add an outlier family with a deletion
    rows.append(rows[0][:20] + "-" * 10 + rows[0][30:])
    prg = msa_to_prg_string(rows)
    idx = build_prg_index(PrgString(prg_string_to_ints(prg)))
    for row in rows:
        seq = row.replace("-", "")
        threads = thread_sequence(idx, seq)
        assert threads, f"row does not thread: {seq}"
