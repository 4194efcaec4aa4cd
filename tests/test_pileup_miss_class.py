"""Capability boundary of the native pileup caller (discover/pileup.py).

The reference's discover step shells to cortex, a de-Bruijn ASSEMBLY
caller (/root/reference/gramtools/commands/discover/discover.py:30-54):
complex variation -- long insertions, dense MNP clusters -- is
reconstructed by local assembly. The native seed-and-vote pileup caller
handles SNPs and small left-anchored indels only; this file MEASURES
the miss class so the boundary is documented by a test, not prose
(docs/PARITY.md divergence 5).

xfail = the capability gap, expected and documented. If one of these
starts passing, the caller grew capability: remove the marker.
"""
from pathlib import Path

import numpy as np
import pytest

from gramtools_tpu.common.vcf import parse_vcf
from gramtools_tpu.discover.pileup import call_variants


def _write_fasta(path, name, seq):
    path.write_text(f">{name}\n{seq}\n")


def _write_fastq(path, reads):
    with open(path, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


def _sample_reads(rng, hap, n, read_len):
    return [hap[s: s + read_len]
            for s in rng.randint(0, len(hap) - read_len, size=n)]


def _call(tmp_path, ref_seq, hap, n_reads=500, read_len=100):
    rng = np.random.RandomState(3)
    _write_fasta(tmp_path / "ref.fa", "chr1", ref_seq)
    _write_fastq(tmp_path / "r.fq", _sample_reads(rng, hap, n_reads,
                                                  read_len))
    out = tmp_path / "out.vcf"
    call_variants(str(tmp_path / "ref.fa"), [str(tmp_path / "r.fq")],
                  str(out))
    _headers, records = parse_vcf(str(out))
    return records


@pytest.fixture
def ref_seq():
    rng = np.random.RandomState(11)
    return "".join(rng.choice(list("ACGT"), size=3000))


@pytest.mark.xfail(reason="30bp insertion needs local assembly (cortex "
                          "class); the seed-and-vote caller anchors "
                          "indels within one read diagonal", strict=True)
def test_long_insertion_called(tmp_path, ref_seq):
    rng = np.random.RandomState(5)
    pos = 1500
    ins = "".join(rng.choice(list("ACGT"), size=30))
    hap = ref_seq[:pos] + ins + ref_seq[pos:]
    recs = _call(tmp_path, ref_seq, hap)
    assert any(len(r.alts[0]) - len(r.ref) >= 25 for r in recs
               if r.alts), "long insertion not reconstructed"


def test_dense_mnp_cluster_called_as_block(tmp_path, ref_seq):
    """WITHIN capability (measured, initially expected to miss): the
    voting window recovers a dense 8-edits-in-12bp cluster as
    individual SNP calls covering every edited base. An assembly caller
    would additionally phase them as one block; position coverage is
    what rebuild needs."""
    pos = 1200
    block = list(ref_seq[pos:pos + 12])
    flip = {"A": "C", "C": "G", "G": "T", "T": "A"}
    for i in (0, 1, 3, 5, 6, 8, 10, 11):
        block[i] = flip[block[i]]
    hap = ref_seq[:pos] + "".join(block) + ref_seq[pos + 12:]
    recs = _call(tmp_path, ref_seq, hap)
    # an assembly caller reports one phased block (or equivalent calls
    # covering all 8 edits); the pileup caller loses the cluster
    called_positions = set()
    for r in recs:
        if not r.alts:
            continue
        for i in range(len(r.ref)):
            called_positions.add(r.pos + i)
    edited = {pos + 1 + i for i in (0, 1, 3, 5, 6, 8, 10, 11)}
    assert edited <= called_positions, "MNP cluster not fully called"


def test_nearby_snps_still_called(tmp_path, ref_seq):
    """Boundary control: TWO snps 20bp apart are WITHIN capability --
    pins that the xfails above fail for capability reasons, not setup."""
    flip = {"A": "C", "C": "G", "G": "T", "T": "A"}
    p1, p2 = 1400, 1420
    hap = list(ref_seq)
    hap[p1] = flip[hap[p1]]
    hap[p2] = flip[hap[p2]]
    recs = _call(tmp_path, ref_seq, "".join(hap))
    got = {r.pos for r in recs if r.alts}
    assert {p1 + 1, p2 + 1} <= got
