"""Suffix array / FM-index tests: native SA-IS vs numpy doubling vs brute force."""
import numpy as np
import pytest

from gramtools_tpu.index.suffix_array import suffix_array, _suffix_array_doubling
from gramtools_tpu.index.native import native_suffix_array
from gramtools_tpu.index.fm import FMIndex
from gramtools_tpu.prg.linearise import prg_string_to_ints


def brute_sa(text):
    t = list(text) + [0]
    return np.array(sorted(range(len(t)), key=lambda i: t[i:]), dtype=np.int32)


@pytest.mark.parametrize("seed", range(5))
def test_sa_random_small(seed):
    rng = np.random.RandomState(seed)
    text = rng.randint(1, 9, size=rng.randint(1, 200)).astype(np.uint32)
    expected = brute_sa(text)
    assert np.array_equal(_suffix_array_doubling(text), expected)
    native = native_suffix_array(text)
    assert native is not None, "native SA-IS should build in this environment"
    assert np.array_equal(native, expected)


def test_sa_prg_string():
    text = prg_string_to_ints("AAA[CC,TA]AC[TTTT,GGG]")
    expected = brute_sa(text)
    assert np.array_equal(suffix_array(text), expected)


def test_sa_repetitive():
    text = np.array([1] * 500 + [2] * 3 + [1] * 500, dtype=np.uint32)
    assert np.array_equal(native_suffix_array(text), _suffix_array_doubling(text))


def test_native_matches_doubling_large():
    rng = np.random.RandomState(42)
    # DNA-ish text with interspersed markers
    text = rng.choice([1, 2, 3, 4], size=20000).astype(np.uint32)
    pos = rng.choice(20000, size=50, replace=False)
    text[pos] = rng.randint(5, 105, size=50)
    assert np.array_equal(native_suffix_array(text), _suffix_array_doubling(text))


def test_fm_index_basics():
    text = prg_string_to_ints("AAA[CC,TA]AC[TTTT,GGG]")
    fm = FMIndex.build(text)
    n = len(text) + 1
    assert fm.size == n
    # occ consistency: total DNA counts match text
    for c in range(1, 5):
        assert fm.occ[c - 1, n] == np.sum(text == c)
    # symbol intervals partition the SA
    assert fm.sym_start[0] == 0 and fm.sym_end[0] == 0  # sentinel row
    # LF-mapping invariant: extending the full interval by base c gives
    # exactly count(c) rows
    for c in range(1, 5):
        lo, hi = fm.base_next_sa_interval(c, 0, n - 1)
        assert hi - lo + 1 == np.sum(text == c)
    # markers_in_interval over full range finds all marker BWT entries
    assert fm.markers_in_interval(0, n - 1).size == np.sum(text > 4)


def test_fm_index_roundtrip(tmp_path):
    text = prg_string_to_ints("T[cCCC[A,g]CT,]ATTTT")
    fm = FMIndex.build(text)
    fm.save(tmp_path / "fm.npz")
    fm2 = FMIndex.load(tmp_path / "fm.npz")
    assert np.array_equal(fm.sa, fm2.sa)
    assert np.array_equal(fm.occ, fm2.occ)


def test_timer_report_peak_memory():
    """Phases record peak RSS (the sdsl memory-monitor analogue,
    make_data_structures.cpp:12-29) alongside wall time."""
    import numpy as np
    from gramtools_tpu.common.timers import TimerReport

    t = TimerReport()
    with t.phase("alloc"):
        block = np.ones(30_000_000, dtype=np.uint8)  # ~30MB
        block[::4096] = 2                            # fault the pages in
    with t.phase("idle"):
        pass
    d = t.as_dict()
    assert set(d) == {"alloc", "idle"}
    assert d["alloc"]["seconds"] >= 0
    peak = d["alloc"]["peak_mem_mb"]
    assert peak is None or peak >= 30
