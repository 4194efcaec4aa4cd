"""Quasimap driver: map reads onto the PRG and record coverage.

Parity: libgramtools src/genotype/quasimap/quasimap.cpp. The reference
buffers 5,000 reads and maps them with OpenMP threads; here buffers are
the unit of batching for the JAX engine (search_jax) with this host
driver as the reference path. RNG consumption order (one master mt19937
draw per buffer slot) is preserved so multi-mapping selections are
bit-identical.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional

import numpy as np

from ..common.rng import RandomInclusiveInt, first_raw_draws
from ..common.seq import iter_fastx, encode_dna, revcomp
from ..index.kmer_index import KmerIndex
from .coverage import Coverage, record_search_states
from .search import PrgIndex, SearchState, search_read_backwards

READS_BUFFER_SIZE = 5000  # quasimap.cpp:128


@dataclass
class QuasimapStats:
    all_reads_count: int = 0
    skipped_reads_count: int = 0
    missing_kmer_reads_count: int = 0
    no_extension_reads_count: int = 0
    exact_mapped_reads_count: int = 0

    def as_dict(self) -> Dict[str, int]:
        return dict(self.__dict__)


def all_read_kmers_in_index(kmer_size: int, read: np.ndarray,
                            kmer_index: KmerIndex) -> bool:
    """quasimap.cpp:212-225: exact mapping needs every read kmer indexed."""
    if read.size < kmer_size:
        return False
    vec = getattr(kmer_index, "all_kmers_indexed", None)
    if vec is not None:
        return vec(read)
    data = read.astype(np.uint8).tobytes()
    for offset in range(read.size - kmer_size + 1):
        if data[offset : offset + kmer_size] not in kmer_index:
            return False
    return True


def quasimap_read(read: np.ndarray, coverage: Coverage, kmer_index: KmerIndex,
                  idx: PrgIndex, kmer_size: int, stats: QuasimapStats,
                  selection_seed: int, first_raw=None):
    """quasimap.cpp:159-194."""
    if not all_read_kmers_in_index(kmer_size, read, kmer_index):
        stats.missing_kmer_reads_count += 1
        return
    seeding_kmer = read[read.size - kmer_size :].astype(np.uint8).tobytes()
    seed_states = kmer_index.get(seeding_kmer)
    if not seed_states:
        states: List[SearchState] = []
    else:
        states = search_read_backwards(read, seed_states, kmer_size, idx)
    if not states:
        stats.no_extension_reads_count += 1
        return
    record_search_states(coverage, states, int(read.size), idx, selection_seed,
                         first_raw)
    stats.exact_mapped_reads_count += 1


def quasimap_forward_reverse(read, coverage, kmer_index, idx, kmer_size,
                             stats, selection_seed, first_raw=None):
    quasimap_read(read, coverage, kmer_index, idx, kmer_size, stats,
                  selection_seed, first_raw)
    quasimap_read(revcomp(read), coverage, kmer_index, idx, kmer_size, stats,
                  selection_seed, first_raw)


def iter_read_buffers(reads_fpath) -> Iterable[List[np.ndarray]]:
    """Buffers of int-encoded reads; non-ACGT reads become empty
    (utils.cpp:73-80). Uses the native C++ parser when built."""
    from ..index.native import native_read_batches

    native = native_read_batches(reads_fpath, batch_size=READS_BUFFER_SIZE)
    if native is not None:
        for batch in native:
            yield [r if not np.any(r == 0) else np.empty(0, dtype=np.uint8)
                   for r in batch]
        return

    buffer: List[np.ndarray] = []
    for _, seq, _ in iter_fastx(reads_fpath):
        encoded = encode_dna(seq)
        if np.any(encoded == 0):
            encoded = np.empty(0, dtype=np.uint8)
        buffer.append(encoded)
        if len(buffer) == READS_BUFFER_SIZE:
            yield buffer
            buffer = []
    if buffer:
        yield buffer


def quasimap_reads(reads_fpaths: List[str], kmer_index: KmerIndex,
                   idx: PrgIndex, kmer_size: int, seed: Optional[int] = None,
                   engine=None) -> "tuple[QuasimapStats, Coverage]":
    """quasimap.cpp:16-141. ``engine`` optionally provides a batched
    (JAX) search path: called with a list of reads, returns per-read
    SearchStates lists, or None entries for reads it could not handle."""
    stats = QuasimapStats()
    coverage = Coverage.empty(idx)
    master_seed_generator = RandomInclusiveInt(seed)

    for reads_fpath in reads_fpaths:
        for buffer in iter_read_buffers(reads_fpath):
            # one seed drawn per buffer slot, even for unfilled slots
            # (quasimap.cpp:136-137): preserves RNG stream parity
            selection_seeds = [master_seed_generator._raw()
                               for _ in range(READS_BUFFER_SIZE)]
            first_raws = first_raw_draws(np.asarray(selection_seeds,
                                                    dtype=np.uint32))
            if engine is not None:
                _map_buffer_batched(buffer, selection_seeds, first_raws,
                                    coverage, kmer_index, idx, kmer_size,
                                    stats, engine)
            else:
                for i, read in enumerate(buffer):
                    stats.all_reads_count += 2
                    if read.size == 0:
                        stats.skipped_reads_count += 2
                        continue
                    quasimap_forward_reverse(read, coverage, kmer_index, idx,
                                             kmer_size, stats,
                                             selection_seeds[i],
                                             int(first_raws[i]))
    return stats, coverage


def _map_buffer_batched(buffer, selection_seeds, first_raws, coverage,
                        kmer_index, idx, kmer_size, stats, engine):
    """Batched path: the engine searches fwd+rev in one device batch;
    coverage recording stays on host (cheap per mapped read)."""
    results = engine.search_buffer(buffer, kmer_index, kmer_size, stats)
    for i, read in enumerate(buffer):
        if read.size == 0:
            continue
        for states, read_len in results[i]:
            if not states:
                stats.no_extension_reads_count += 1
                continue
            record_search_states(coverage, states, read_len, idx,
                                 selection_seeds[i], int(first_raws[i]))
            stats.exact_mapped_reads_count += 1
