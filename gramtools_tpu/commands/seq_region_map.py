"""Dual-coordinate region map between base reference and personalised
reference.

Parity: gramtools/commands/genotype/seq_region_map.py.
"""
from __future__ import annotations

import json
from enum import Enum, auto
from pathlib import Path
from typing import Callable, Dict, List, Optional

from ..common.vcf import VcfRecord

Chrom = str
ChromSizes = Dict[Chrom, int]


class SeqRegion:
    def __init__(self, base_ref_start: int, pers_ref_start: int, length: int,
                 vcf_record_ref: Optional[str] = None,
                 vcf_record_alt: Optional[str] = None):
        self.base_ref_start = base_ref_start
        self.pers_ref_start = pers_ref_start
        self.vcf_record_ref = vcf_record_ref
        self.vcf_record_alt = vcf_record_alt
        if vcf_record_alt is not None and length is not None:
            if length != len(vcf_record_alt):
                raise ValueError(
                    f"{length} must be length of {vcf_record_alt} when both provided.")
        self.length = length

    @property
    def is_variant_region(self):
        return self.vcf_record_ref is not None

    def __eq__(self, other):
        return self.__dict__ == other.__dict__

    def __repr__(self):
        return str(self.__dict__)

    def to_json(self, dump_sequences: bool = True) -> Dict:
        dumped = dict(self.__dict__)
        if not dump_sequences:
            dumped["vcf_record_ref"] = dumped["vcf_record_alt"] = None
        dumped = {k: v for k, v in dumped.items() if v is not None}
        return {"SeqRegion": dumped}

    @staticmethod
    def from_json(dct):
        if "SeqRegion" in dct:
            return SeqRegion(**dct["SeqRegion"])
        return dct


SeqRegions = List[SeqRegion]
SeqRegionsMap = Dict[Chrom, SeqRegions]


class _PosTracker:
    def __init__(self, base_ref_pos, pers_ref_pos):
        self.base_ref_pos = base_ref_pos
        self.pers_ref_pos = pers_ref_pos


class SeqRegionMapper:
    """Builds the region map by scanning the genotyped VCF
    (seq_region_map.py:75-187)."""

    def __init__(self, base_records: List[VcfRecord], chrom_sizes: ChromSizes):
        self.chrom_sizes = chrom_sizes
        self.map: SeqRegionsMap = {}
        self.pos_trackers: Dict[Chrom, _PosTracker] = {}

        prev_chrom_key, prev_record = None, None
        chrom_key = None
        for record in base_records:
            chrom_key = record.chrom
            if chrom_key not in self.map:
                self._new_chrom(chrom_key, prev_chrom_key)
            else:
                assert chrom_key == prev_chrom_key, (
                    f"Ref IDs not contiguous: {chrom_key} and {prev_chrom_key} "
                    "interspersed")
                assert record.pos > prev_record.pos, (
                    f"Records not in increasing pos order: {prev_record} and {record}")

            base_pos = self.pos_trackers[chrom_key].base_ref_pos
            if record.pos > base_pos:
                self._add_invariant_region(chrom_key, record.pos - base_pos)

            self._add_variant_region(chrom_key, record)
            prev_chrom_key = chrom_key
            prev_record = record

        if len(self.map) == 0:
            raise ValueError("No records in provided vcf.")

        chrom_size = self.chrom_sizes[chrom_key]
        base_pos = self.pos_trackers[chrom_key].base_ref_pos
        if base_pos <= chrom_size:
            self._add_invariant_region(chrom_key, chrom_size - base_pos + 1)

        self._map_invariant_chroms()

    def get_map(self) -> SeqRegionsMap:
        return self.map

    def _map_invariant_chroms(self):
        for chrom in self.chrom_sizes:
            if chrom not in self.map:
                self.map[chrom] = [SeqRegion(1, 1, self.chrom_sizes[chrom])]

    def _new_chrom(self, chrom_key, prev_chrom_key):
        if len(self.map) > 0:
            prev_base_pos = self.pos_trackers[prev_chrom_key].base_ref_pos
            prev_size = self.chrom_sizes[prev_chrom_key]
            if prev_base_pos <= prev_size:
                self._add_invariant_region(
                    prev_chrom_key, prev_size - prev_base_pos + 1)
        self.map[chrom_key] = []
        self.pos_trackers[chrom_key] = _PosTracker(1, 1)

    def _add_invariant_region(self, chrom_key, region_length: int):
        ref_positions = self.pos_trackers[chrom_key]
        focal = self.map[chrom_key]
        if focal and not focal[-1].is_variant_region:
            focal[-1].length += region_length
        else:
            focal.append(SeqRegion(
                base_ref_start=ref_positions.base_ref_pos,
                pers_ref_start=ref_positions.pers_ref_pos,
                length=region_length))
        ref_positions.base_ref_pos += region_length
        ref_positions.pers_ref_pos += region_length

    def _add_variant_region(self, chrom_key, record: VcfRecord):
        ref_positions = self.pos_trackers[chrom_key]
        picked_alleles = record.genotypes()
        if not picked_alleles or set(picked_alleles) == {None}:
            picked_allele = 0
        else:
            picked_allele = picked_alleles[0]

        if picked_allele != 0:
            alt = record.alts[picked_allele - 1]
            region = SeqRegion(
                base_ref_start=ref_positions.base_ref_pos,
                pers_ref_start=ref_positions.pers_ref_pos,
                length=len(alt),
                vcf_record_ref=record.ref,
                vcf_record_alt=alt)
            self.map[chrom_key].append(region)
            ref_positions.base_ref_pos += len(record.ref)
            ref_positions.pers_ref_pos += region.length
        else:
            self._add_invariant_region(chrom_key, len(record.ref))


class BisectTarget(Enum):
    BASE_REF = auto()
    PERS_REF = auto()


class SearchableSeqRegionsMap:
    """seq_region_map.py:199-261."""

    def __init__(self, map: SeqRegionsMap):
        self._map = map

    def bisect(self, chrom: Chrom, pos: int, mode: BisectTarget) -> int:
        regions = self._map[chrom]
        if mode is BisectTarget.BASE_REF:
            key = lambda region: region.base_ref_start
        else:
            key = lambda region: region.pers_ref_start
        lo, hi = 0, len(regions)
        while lo < hi:
            mid = (lo + hi) // 2
            if key(regions[mid]) > pos:
                hi = mid
            else:
                lo = mid + 1
        return lo - 1

    def get_region(self, chrom, region_index) -> SeqRegion:
        return self._map[chrom][region_index]

    def __eq__(self, other):
        return self._map == other._map

    def dump_to(self, fname, dump_sequences=True):
        serialisable = {
            chrom: [r.to_json(dump_sequences) for r in regions]
            for chrom, regions in self._map.items()
        }
        with open(fname, "w") as fout:
            json.dump(serialisable, fout)

    @staticmethod
    def load_from(fname) -> "SearchableSeqRegionsMap":
        with open(fname) as fin:
            loaded = json.load(fin, object_hook=SeqRegion.from_json)
        return SearchableSeqRegionsMap(loaded)
