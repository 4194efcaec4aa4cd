"""Vectorised kmer index builder vs scalar DFS builder: same index."""
import numpy as np
import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.index.kmer_index import build_kmer_index
from gramtools_tpu.index.kmer_index_vec import (ArrayKmerIndex,
                                                build_kmer_index_vectorised)
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints

PRGS = [
    "AAA[CC,TA]AC[TTTT,GGG]",
    "TT[AAAC,AAAG]GG[CAA,GAA]TTCAA",
    "T[CCCC[A,G]CT,]ATTTTT",
    "[A,]A[[G,A]A,C,T]",
    "ACGTACGT[AC,GT]TTACG[A,C,GG]ACACG[T[A,C]G,AA]CGTACG",
]


def all_kmers(k):
    from itertools import product
    for combo in product((1, 2, 3, 4), repeat=k):
        yield np.asarray(combo, dtype=np.uint8)


@pytest.mark.parametrize("prg_str", PRGS)
@pytest.mark.parametrize("k", [2, 3])
def test_vectorised_matches_scalar(prg_str, k):
    idx = build_prg_index(PrgString(prg_string_to_ints(prg_str)))
    scalar = build_kmer_index(idx, k)
    vec = build_kmer_index_vectorised(idx, k)

    assert vec.num_kmers() == len(scalar)
    for kmer in all_kmers(k):
        key = kmer.tobytes()
        in_scalar = key in scalar
        assert (key in vec) == in_scalar
        if in_scalar:
            s_states = {(s.lo, s.hi, s.traversed, s.traversing)
                        for s in scalar[key]}
            v_states = {(s.lo, s.hi, s.traversed, s.traversing)
                        for s in vec[key]}
            assert v_states == s_states, key


def test_roundtrip(tmp_path):
    idx = build_prg_index(PrgString(prg_string_to_ints(PRGS[2])))
    vec = build_kmer_index_vectorised(idx, 4)
    vec.save(tmp_path / "kidx.npz")
    vec2 = ArrayKmerIndex.load(tmp_path / "kidx.npz")
    assert np.array_equal(vec.codes, vec2.codes)
    for kmer in all_kmers(4):
        key = kmer.tobytes()
        assert (key in vec) == (key in vec2)
        if key in vec:
            assert [s for s in vec[key]] == [s for s in vec2[key]]
