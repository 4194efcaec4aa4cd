"""Dual-coordinate rebasing map: base reference <-> personalised reference.

Capability parity with the reference's region map used by genotype/discover
(gramtools/commands/genotype/seq_region_map.py), re-designed here as a
columnar store: each chromosome keeps three parallel int64 coordinate
arrays (base-ref start, pers-ref start, run length) plus sparse ref/alt
sequence columns for variant rows.  Position lookup is a single
``np.searchsorted`` on the relevant coordinate column instead of a
per-query Python binary search, so batch rebasing of many records is
vectorisable.

Coordinate convention (same as the reference): 1-based starts, a row
covers ``[start, start + length)`` in its own coordinate system.  A
variant row's length is the *personalised* (alt) length; its footprint on
the base reference is ``len(ref_seq)``.
"""
from __future__ import annotations

import json
from dataclasses import dataclass
from enum import Enum, auto
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..common.vcf import VcfRecord

Chrom = str
ChromSizes = Dict[Chrom, int]


@dataclass(frozen=True)
class SeqRegion:
    """One dual-coordinate run (value object; rows materialise to these)."""

    base_ref_start: int
    pers_ref_start: int
    length: int
    vcf_record_ref: Optional[str] = None
    vcf_record_alt: Optional[str] = None

    def __post_init__(self):
        if self.vcf_record_alt is not None and self.length != len(self.vcf_record_alt):
            raise ValueError(
                f"variant region length {self.length} disagrees with alt "
                f"{self.vcf_record_alt!r} (pers-ref length is the alt length)")

    @property
    def is_variant_region(self) -> bool:
        return self.vcf_record_ref is not None

    def to_json(self, dump_sequences: bool = True) -> Dict:
        payload = {
            "base_ref_start": self.base_ref_start,
            "pers_ref_start": self.pers_ref_start,
            "length": self.length,
        }
        if dump_sequences and self.is_variant_region:
            payload["vcf_record_ref"] = self.vcf_record_ref
            payload["vcf_record_alt"] = self.vcf_record_alt
        return {"SeqRegion": payload}

    @staticmethod
    def from_json(dct):
        if "SeqRegion" in dct:
            return SeqRegion(**dct["SeqRegion"])
        return dct


SeqRegions = List[SeqRegion]
SeqRegionsMap = Dict[Chrom, SeqRegions]


class _ChromRuns:
    """Append-only run accumulator for one chromosome.

    Keeps the dual cursors and the run rows; adjacent invariant runs are
    coalesced on append so the frozen arrays are minimal.
    """

    __slots__ = ("base_starts", "pers_starts", "lengths", "refs", "alts",
                 "base_cursor", "pers_cursor")

    def __init__(self):
        self.base_starts: List[int] = []
        self.pers_starts: List[int] = []
        self.lengths: List[int] = []
        self.refs: List[Optional[str]] = []
        self.alts: List[Optional[str]] = []
        self.base_cursor = 1
        self.pers_cursor = 1

    def append_invariant(self, run_length: int) -> None:
        if self.lengths and self.refs[-1] is None:
            self.lengths[-1] += run_length
        else:
            self.base_starts.append(self.base_cursor)
            self.pers_starts.append(self.pers_cursor)
            self.lengths.append(run_length)
            self.refs.append(None)
            self.alts.append(None)
        self.base_cursor += run_length
        self.pers_cursor += run_length

    def append_variant(self, ref_seq: str, alt_seq: str) -> None:
        self.base_starts.append(self.base_cursor)
        self.pers_starts.append(self.pers_cursor)
        self.lengths.append(len(alt_seq))
        self.refs.append(ref_seq)
        self.alts.append(alt_seq)
        self.base_cursor += len(ref_seq)
        self.pers_cursor += len(alt_seq)

    def close(self, chrom_size: int) -> None:
        """Pad with the trailing invariant run up to the chrom end."""
        if self.base_cursor <= chrom_size:
            self.append_invariant(chrom_size - self.base_cursor + 1)

    def to_regions(self) -> SeqRegions:
        return [
            SeqRegion(b, p, n, r, a)
            for b, p, n, r, a in zip(self.base_starts, self.pers_starts,
                                     self.lengths, self.refs, self.alts)
        ]


def _picked_allele(record: VcfRecord) -> int:
    """First sample's first called allele; null / absent calls count as REF."""
    calls = record.genotypes()
    if not calls or set(calls) == {None}:
        return 0
    return calls[0]


class SeqRegionMapper:
    """Single pass over a position-sorted genotyped VCF -> per-chrom runs."""

    def __init__(self, base_records: Sequence[VcfRecord], chrom_sizes: ChromSizes):
        self.chrom_sizes = chrom_sizes
        self._runs: Dict[Chrom, _ChromRuns] = {}

        active: Optional[Chrom] = None
        last_pos = 0
        for record in base_records:
            if record.chrom != active:
                assert record.chrom not in self._runs, (
                    f"Ref IDs not contiguous: {record.chrom} and {active} "
                    "interspersed")
                if active is not None:
                    self._runs[active].close(chrom_sizes[active])
                active = record.chrom
                self._runs[active] = _ChromRuns()
                last_pos = 0
            assert record.pos > last_pos, (
                f"Records not in increasing pos order: pos {last_pos} then "
                f"{record} on {active}")
            last_pos = record.pos

            runs = self._runs[active]
            if record.pos > runs.base_cursor:
                runs.append_invariant(record.pos - runs.base_cursor)
            allele = _picked_allele(record)
            if allele == 0:
                runs.append_invariant(len(record.ref))
            else:
                runs.append_variant(record.ref, record.alts[allele - 1])

        if active is None:
            raise ValueError("No records in provided vcf.")
        self._runs[active].close(chrom_sizes[active])

    def get_map(self) -> SeqRegionsMap:
        mapped = {chrom: runs.to_regions() for chrom, runs in self._runs.items()}
        for chrom, size in self.chrom_sizes.items():
            if chrom not in mapped:
                mapped[chrom] = [SeqRegion(1, 1, size)]
        return mapped


class BisectTarget(Enum):
    BASE_REF = auto()
    PERS_REF = auto()


class _ChromIndex:
    """Frozen columnar index for one chromosome's runs."""

    __slots__ = ("base_starts", "pers_starts", "regions")

    def __init__(self, regions: SeqRegions):
        self.regions = regions
        self.base_starts = np.fromiter(
            (r.base_ref_start for r in regions), dtype=np.int64, count=len(regions))
        self.pers_starts = np.fromiter(
            (r.pers_ref_start for r in regions), dtype=np.int64, count=len(regions))

    def column(self, mode: BisectTarget) -> np.ndarray:
        return self.base_starts if mode is BisectTarget.BASE_REF else self.pers_starts


class SearchableSeqRegionsMap:
    """Region lookup by coordinate, both single-query and batched."""

    def __init__(self, map: SeqRegionsMap):
        self._map = map
        self._index = {chrom: _ChromIndex(regions)
                       for chrom, regions in map.items()}

    def bisect(self, chrom: Chrom, pos: int, mode: BisectTarget) -> int:
        """Index of the run whose ``mode``-coordinate span contains ``pos``."""
        column = self._index[chrom].column(mode)
        return int(np.searchsorted(column, pos, side="right")) - 1

    def bisect_many(self, chrom: Chrom, positions, mode: BisectTarget) -> np.ndarray:
        """Vectorised bisect for a whole array of positions at once."""
        column = self._index[chrom].column(mode)
        return np.searchsorted(column, np.asarray(positions), side="right") - 1

    def get_region(self, chrom: Chrom, region_index: int) -> SeqRegion:
        return self._index[chrom].regions[region_index]

    def __eq__(self, other):
        return isinstance(other, SearchableSeqRegionsMap) and self._map == other._map

    def dump_to(self, fname, dump_sequences: bool = True) -> None:
        serialisable = {
            chrom: [region.to_json(dump_sequences) for region in regions]
            for chrom, regions in self._map.items()
        }
        with open(fname, "w") as fout:
            json.dump(serialisable, fout)

    @staticmethod
    def load_from(fname) -> "SearchableSeqRegionsMap":
        with open(fname) as fin:
            loaded = json.load(fin, object_hook=SeqRegion.from_json)
        return SearchableSeqRegionsMap(loaded)
