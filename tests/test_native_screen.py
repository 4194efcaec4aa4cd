"""Native fused revcomp+kmer-screen (native/screen.cpp) equivalence.

The device engine's submit path screens both orientations of every read
against the kmer index before seeding (reference: per-read kmer check in
libgramtools' quasimap loop). The C++ kernel must match
kmer_index_vec.batch_all_indexed_matrix bit-for-bit, including the
oriented matrix layout _filter_buffer_rows builds (fwd rows even,
revcomp rows odd)."""
import numpy as np
import pytest

from gramtools_tpu.common.seq import _COMPLEMENT_LUT
from gramtools_tpu.index.native import native_kmer_screen


@pytest.fixture(scope="module")
def ki(small_idx):
    from gramtools_tpu.index.kmer_index_vec import build_kmer_index_vectorised

    return build_kmer_index_vectorised(small_idx, 5)


@pytest.fixture(scope="module")
def small_idx():
    from gramtools_tpu.prg.linearise import PrgString
    from gramtools_tpu.prg.graph import build_cov_graph
    from gramtools_tpu.index.fm import FMIndex
    from gramtools_tpu.mapping.search import PrgIndex

    rng = np.random.RandomState(11)
    parts = []
    marker = 5
    for _ in range(20):
        parts.append(rng.randint(1, 5, size=30))
        parts.append([marker, 1, marker + 1, 2, marker + 1])
        marker += 2
    prg_ints = np.concatenate([np.asarray(p, dtype=np.int64) for p in parts])
    prg = PrgString(prg_ints)
    graph = build_cov_graph(prg)
    fm = FMIndex.build(prg_ints)
    return PrgIndex(prg_ints, graph, fm, dict(prg.end_positions))


def _numpy_screen(ki, fwd):
    n, L = fwd.shape
    mat = np.empty((2 * n, L), dtype=np.uint8)
    mat[0::2] = fwd
    mat[1::2] = _COMPLEMENT_LUT[fwd[:, ::-1]]
    return mat, ki.batch_all_indexed_matrix(mat)


def test_native_screen_matches_numpy(ki):
    rng = np.random.RandomState(0)
    fwd = rng.randint(1, 5, size=(400, 40)).astype(np.uint8)
    out = native_kmer_screen(fwd, ki.kmer_size, ki._presence_bitmap())
    if out is None:
        pytest.skip("native library unavailable")
    mat_ref, passed_ref = _numpy_screen(ki, fwd)
    assert (out[0] == mat_ref).all()
    assert (out[1] == passed_ref).all()


def test_native_screen_mixed_pass_fail(ki, small_idx):
    # rows built from the PRG text itself pass; scrambled rows mostly
    # fail -- exercise the early-exit path on both classes
    rng = np.random.RandomState(1)
    text = small_idx.prg
    dna = text[(text >= 1) & (text <= 4)].astype(np.uint8)
    L = 30
    rows = [dna[o:o + L] for o in range(0, dna.size - L, 17)][:100]
    fwd = np.stack(rows)
    scram = fwd.copy()
    scram[:, ::3] = rng.randint(1, 5, size=scram[:, ::3].shape)
    both = np.concatenate([fwd, scram])
    out = native_kmer_screen(both, ki.kmer_size, ki._presence_bitmap())
    if out is None:
        pytest.skip("native library unavailable")
    mat_ref, passed_ref = _numpy_screen(ki, both)
    assert (out[0] == mat_ref).all()
    assert (out[1] == passed_ref).all()
    assert passed_ref.any() and not passed_ref.all()
