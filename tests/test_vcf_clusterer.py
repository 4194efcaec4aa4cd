"""Adversarial pins for the VCF record clusterer (prg/vcf_to_prg.py).

The reference delegates clustering to the external cluster_vcf_records
VcfClusterer with combined-haplotype enumeration (from_vcfs.py:32-46);
the repo implements its own merge. These tests freeze that merge's
observable contract -- overlap algebra, haplotype enumeration order,
dedup, and cap semantics -- so drift fails loudly (VERDICT r2 item 7).
"""
import itertools

import numpy as np
import pytest

from gramtools_tpu.common.vcf import VcfRecord
from gramtools_tpu.prg import vcf_to_prg
from gramtools_tpu.prg.vcf_to_prg import VcfToPrg, cluster_vcf_records


def rec(pos, ref, alts, chrom="c1", filt=("PASS",)):
    return VcfRecord(chrom=chrom, pos=pos, id=".", ref=ref,
                     alts=tuple(alts), qual=".", filter=filt, info=".")


# --- overlap algebra ---------------------------------------------------------


def test_snp_inside_deletion_merges():
    """A SNP under a deletion's REF span joins its cluster; alleles are
    later-record-only haplotypes first (skip-first DFS), then earlier
    records with their combinations."""
    merged = cluster_vcf_records([rec(2, "TTT", ["T"]), rec(3, "T", ["C"])])
    assert len(merged) == 1
    m = merged[0]
    assert (m.pos, m.ref) == (2, "TTT")
    assert m.alts == ("TCT", "T")


def test_same_position_records_merge():
    merged = cluster_vcf_records([rec(2, "T", ["G"]), rec(2, "T", ["C"])])
    assert len(merged) == 1
    m = merged[0]
    assert (m.pos, m.ref) == (2, "T")
    assert m.alts == ("C", "G")


def test_chain_overlap_combines_disjoint_ends():
    """r1 overlaps r2, r2 overlaps r3, but r1 and r3 are disjoint: the
    merged record must include the r1+r3 combined haplotype."""
    r1 = rec(1, "AA", ["G"])     # spans 1-2
    r2 = rec(2, "AAA", ["T"])    # spans 2-4 (overlaps both)
    r3 = rec(4, "AA", ["C"])     # spans 4-5
    merged = cluster_vcf_records([r1, r2, r3])
    assert len(merged) == 1
    m = merged[0]
    assert (m.pos, m.ref) == (1, "AAAAA")
    assert "GAC" in m.alts       # r1 + r3 applied together
    # enumeration order pin (skip-first DFS over (pos, stop)-sorted
    # records: r3-only, r2-only, r1-only, then r1+r3)
    assert m.alts == ("AAAC", "ATA", "GAAA", "GAC")


def test_touching_but_not_overlapping_stay_separate():
    """pos 2 REF 'TT' ends at 3; pos 4 starts after it: two records."""
    merged = cluster_vcf_records([rec(2, "TT", ["G"]), rec(4, "T", ["C"])])
    assert len(merged) == 2


def test_duplicate_haplotypes_deduped():
    """Two SNPs at the same position sharing an ALT yield it once."""
    merged = cluster_vcf_records([rec(2, "T", ["C", "G"]),
                                  rec(2, "T", ["C"])])
    assert len(merged) == 1
    assert sorted(merged[0].alts) == ["C", "G"]
    assert len(merged[0].alts) == 2


def test_ref_identical_haplotype_not_emitted():
    """A haplotype equal to the spanned REF is never an ALT."""
    merged = cluster_vcf_records([rec(2, "TT", ["TT", "G"]),
                                  rec(3, "T", ["C"])])
    assert "TT" not in merged[0].alts


def test_non_pass_records_dropped_before_clustering():
    merged = cluster_vcf_records([rec(2, "TTT", ["T"], filt=(".",)),
                                  rec(3, "T", ["C"])])
    assert len(merged) == 1
    assert merged[0].pos == 3


# --- cap semantics -----------------------------------------------------------


def test_cap_truncates_enumeration_in_order(monkeypatch):
    """The cap stops the DFS: the first `cap` enumerated haplotypes
    survive, in enumeration order."""
    records = [rec(2, "T", [b]) for b in ("A", "C", "G")] \
        + [rec(2, "TT", ["AA", "CC", "GG"])]
    uncapped = cluster_vcf_records(records)[0].alts
    assert len(uncapped) == 6
    monkeypatch.setattr(vcf_to_prg, "MAX_ALLELES_PER_CLUSTER", 4)
    capped = cluster_vcf_records(records)[0].alts
    assert capped == uncapped[:4]


def test_cap_default_matches_reference_constant():
    assert vcf_to_prg.MAX_ALLELES_PER_CLUSTER == 5000


# --- property: enumeration == brute force over non-overlapping subsets ------


def brute_force_haplotypes(cluster):
    start = min(r.pos for r in cluster)
    end = max(r.stop for r in cluster)
    ref = [""] * (end - start + 1)
    for r in cluster:
        for i, c in enumerate(r.ref):
            ref[r.pos - start + i] = c
    ref = "".join(ref)
    out = set()
    for n in range(1, len(cluster) + 1):
        for subset in itertools.combinations(cluster, n):
            spans = sorted(((r.pos, r.stop, r) for r in subset),
                           key=lambda t: t[:2])
            if any(spans[i][1] >= spans[i + 1][0] for i in range(n - 1)):
                continue  # overlapping subset: not a haplotype
            for alts in itertools.product(*(s[2].alts for s in spans)):
                h, cursor = "", start
                for (p, stop, _), alt in zip(spans, alts):
                    h += ref[cursor - start : p - start] + alt
                    cursor = stop + 1
                h += ref[cursor - start :]
                if h != ref:
                    out.add(h)
    return ref, out


@pytest.mark.parametrize("seed", range(8))
def test_merge_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    bases = "ACGT"
    # build one guaranteed-overlapping cluster of 3-5 records
    n = rng.randint(3, 6)
    records = []
    cursor = 2
    for i in range(n):
        pos = cursor if i == 0 else rng.randint(records[0].pos,
                                                records[0].stop + 1)
        ref_len = rng.randint(1, 4)
        n_alts = rng.randint(1, 3)
        alts = set()
        while len(alts) < n_alts:
            alt = "".join(rng.choice(list(bases), size=rng.randint(1, 3)))
            alts.add(alt)
        records.append(rec(pos, "A" * ref_len, sorted(alts)))
    # ensure they all really form one cluster under the sweep
    merged = cluster_vcf_records(records)
    clusters = []
    for m in merged:
        members = [r for r in records
                   if r.pos >= m.pos and r.stop <= m.pos + len(m.ref) - 1]
        clusters.append((m, members))
    for m, members in clusters:
        if len(members) == 1:
            continue
        ref, expected = brute_force_haplotypes(members)
        assert m.ref == ref
        assert set(m.alts) == expected, (seed, members)


# --- clustered output drives the PRG emitter --------------------------------


def test_clustered_records_build_prg():
    refs = {"c1": "ATTTTA"}
    merged = cluster_vcf_records([rec(2, "TTT", ["T"]), rec(3, "T", ["C"])])
    prg = VcfToPrg.from_records(merged, refs)
    assert prg.prg_string() == "A5TTT6TCT6T6TA"
