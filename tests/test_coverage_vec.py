"""Vectorised per-base recorder vs scalar recorder: bit-equality."""
import numpy as np
import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.index.kmer_index import build_kmer_index
from gramtools_tpu.common.seq import revcomp
from gramtools_tpu.mapping.coverage import (record_per_base,
                                            select_mapping_instance)
from gramtools_tpu.mapping.coverage_fast import record_per_base_batch
from gramtools_tpu.mapping.quasimap import all_read_kmers_in_index
from gramtools_tpu.mapping.search import search_read_backwards
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints

from test_search_jax import random_prg


@pytest.mark.parametrize("seed,nested", [(0, False), (1, True), (2, True),
                                         (5, False), (7, True)])
def test_batch_recorder_matches_scalar(seed, nested):
    rng = np.random.RandomState(seed)
    try:
        prg = PrgString(prg_string_to_ints(random_prg(rng, nested=nested)))
        idx = build_prg_index(prg)
    except ValueError:
        pytest.skip("inconsistent random PRG")
    k = 3
    kmer_index = build_kmer_index(idx, k)

    # map a set of reads and select their instances
    per_read = []
    for _ in range(40):
        read = rng.randint(1, 5, size=rng.randint(k, 14)).astype(np.uint8)
        for oriented in (read, revcomp(read)):
            if not all_read_kmers_in_index(k, oriented, kmer_index):
                continue
            seeds = kmer_index.get(
                oriented[oriented.size - k:].astype(np.uint8).tobytes(), [])
            states = (search_read_backwards(oriented, seeds, k, idx)
                      if seeds else [])
            if not states:
                continue
            selected = select_mapping_instance(states, idx, selection_seed=9)
            if selected.states:
                per_read.append((selected.states, int(oriented.size)))

    if not per_read:
        pytest.skip("no mapped reads for this random PRG")

    # scalar
    idx.graph.coverage[:] = 0
    for states, read_len in per_read:
        record_per_base(idx, states, read_len)
    scalar_cov = idx.graph.coverage.copy()

    # vectorised
    idx.graph.coverage[:] = 0
    record_per_base_batch(idx, per_read)
    assert np.array_equal(idx.graph.coverage, scalar_cov)
