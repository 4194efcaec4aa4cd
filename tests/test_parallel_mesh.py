"""Sharded quasimap on a virtual CPU mesh: device coverage psum equals a
host-computed reference, and sharding is invariant to mesh size."""
import numpy as np
import pytest

import jax

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.mapping.search import search_pattern
from gramtools_tpu.mapping.search_jax import DeviceIndex
from gramtools_tpu.parallel.mesh import (
    make_mesh,
    run_sharded_flat_quasimap,
    run_sharded_quasimap,
)
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints
from gramtools_tpu.prg.markers import site_id_to_index

PRG = "ACGT[AC,GT]TTACG[A,C]ACACGTT[TG,AA]CGT"
MAX_ALLELES = 2


@pytest.fixture(scope="module")
def idx():
    return build_prg_index(PrgString(prg_string_to_ints(PRG)))


def host_reference_coverage(idx, reads):
    """Sum of traversed loci over ALL final states of a seedless host
    search (the semantics of the device-side accumulation)."""
    cov = np.zeros((idx.num_sites, MAX_ALLELES), dtype=np.int32)
    for read in reads:
        for state in search_pattern(read, idx):
            for site, allele in state.traversed:
                cov[site_id_to_index(site), allele] += 1
    return cov


def sample_reads(idx, rng, n, length):
    path = idx.prg[idx.prg <= 4].astype(np.uint8)
    reads = []
    for _ in range(n):
        s = rng.randint(0, path.size - length)
        reads.append(path[s : s + length])
    return reads


@pytest.mark.parametrize("n_devices", [1, 2, 8])
@pytest.mark.parametrize("runner", [run_sharded_quasimap,
                                    run_sharded_flat_quasimap])
def test_sharded_coverage_matches_host(idx, n_devices, runner):
    rng = np.random.RandomState(3)
    reads = sample_reads(idx, rng, 4 * n_devices, 10)
    di = DeviceIndex.build(idx)
    mesh = make_mesh(n_devices)
    _, cov = runner(mesh, di, reads, idx.num_sites, MAX_ALLELES)
    expected = host_reference_coverage(idx, reads)
    assert np.array_equal(np.asarray(cov), expected)
