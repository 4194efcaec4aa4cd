"""Build a PRG from a BED of region files (MSAs or pre-built .prg).

Parity: gramtools/commands/build/from_msas.py, with native replacements
for its external deps: BED handling + interval complement (pybedtools)
and MSA->PRG (make_prg, see prg/msa.py). Region builds run in a
multiprocessing pool as in the reference.
"""
from __future__ import annotations

import logging
import re
import shutil
from dataclasses import dataclass
from multiprocessing.pool import Pool
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..common.seq import load_fasta
from ..prg.linearise import PrgString, prg_string_to_ints
from ..prg.msa import msa_file_to_prg_string
from . import report

log = logging.getLogger("gramtools_tpu")

MSA_EXTS = re.compile(r".*(msa|fa|fasta)$")

DEFAULT_NUM_PROCESSES = 1


@dataclass
class BedInterval:
    chrom: str
    start: int  # 0-based
    end: int    # exclusive
    name: str


def parse_bed(path) -> List[BedInterval]:
    out = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            cols = line.split("\t")
            if len(cols) < 4:
                cols = line.split()
            out.append(BedInterval(cols[0], int(cols[1]), int(cols[2]), cols[3]))
    return out


def load_chrom_sizes(coords_fname) -> Dict[str, int]:
    sizes = {}
    with open(coords_fname) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2:
                sizes[parts[0]] = int(parts[1])
    return sizes


def complement_intervals(intervals: List[BedInterval],
                         chrom_sizes: Dict[str, int]) -> List[BedInterval]:
    """Invariant regions = genome minus the BED intervals (pybedtools
    complement equivalent, preserving coords-file chrom order)."""
    by_chrom: Dict[str, List[BedInterval]] = {}
    for iv in intervals:
        by_chrom.setdefault(iv.chrom, []).append(iv)
    out: List[BedInterval] = []
    for chrom, size in chrom_sizes.items():
        ivs = sorted(by_chrom.get(chrom, []), key=lambda i: i.start)
        cursor = 0
        for iv in ivs:
            if iv.start > cursor:
                out.append(BedInterval(chrom, cursor, iv.start, ""))
            cursor = max(cursor, iv.end)
        if cursor < size:
            out.append(BedInterval(chrom, cursor, size, ""))
    return out


@dataclass
class IntervalBuilder:
    """from_msas.py:104-146."""

    interval: BedInterval
    build_type: str  # "prg" | "msa" | "invariant"
    out_fname: str
    sequence: str = ""

    def build(self):
        if self.build_type == "prg":
            shutil.copy(self.interval.name, self.out_fname)
        elif self.build_type == "msa":
            prg_string = msa_file_to_prg_string(self.interval.name)
            ints = prg_string_to_ints(prg_string)
            PrgString(ints).write(self.out_fname)
        else:
            ints = prg_string_to_ints(self.sequence)
            np.asarray(ints, dtype="<u4").tofile(self.out_fname)

    @property
    def built_interval(self) -> BedInterval:
        return BedInterval(self.interval.chrom, self.interval.start,
                           self.interval.end, self.out_fname)


def _build_one(builder: IntervalBuilder):
    builder.build()
    return builder


class IntervalCollection:
    """from_msas.py:41-102."""

    def __init__(self, bed_fname, fasta_fname, coords_fname, out_dirname,
                 num_processes=DEFAULT_NUM_PROCESSES):
        self.num_processes = num_processes
        self.builders: List[IntervalBuilder] = []
        intervals = parse_bed(bed_fname)
        for iv in intervals:
            if not Path(iv.name).exists():
                raise ValueError(f"Error: {iv.name} not found (specified in "
                                 f"{bed_fname})")
            build_type = "msa" if MSA_EXTS.match(iv.name) else "prg"
            out_fname = f"{out_dirname}/{Path(iv.name).stem}.bin"
            self.builders.append(IntervalBuilder(iv, build_type, out_fname))

        chrom_seqs = load_fasta(fasta_fname)
        self.chrom_sizes = load_chrom_sizes(coords_fname)
        for i, invar in enumerate(
                complement_intervals(intervals, self.chrom_sizes)):
            out_fname = f"{out_dirname}/invariant_{i + 1}.bin"
            builder = IntervalBuilder(invar, "invariant", out_fname)
            builder.sequence = chrom_seqs[invar.chrom][invar.start : invar.end]
            self.builders.append(builder)

    def build(self):
        if self.num_processes > 1:
            with Pool(processes=self.num_processes) as pool:
                self.builders = pool.map(_build_one, self.builders)
        else:
            for b in self.builders:
                b.build()

    def get_built_intervals(self) -> List[BedInterval]:
        """Built intervals sorted genome-order (coords-file chrom order)."""
        chrom_rank = {c: i for i, c in enumerate(self.chrom_sizes)}
        built = [b.built_interval for b in self.builders]
        return sorted(built, key=lambda iv: (chrom_rank.get(iv.chrom, 1 << 30),
                                             iv.start))


class PRGAggregationError(Exception):
    pass


class Record:
    def __init__(self, translation: int, count: int):
        self.translation = translation
        self.count = count


class PRGAggregator:
    """Rescales site markers across region PRGs to be globally unique
    (from_msas.py:165-230, ported exactly incl. legacy odd-end support)."""

    def __init__(self):
        self.translations: Dict[str, Dict[int, Record]] = {}
        self.next_allocated = 5

    def translate(self, ID: str, marker: int) -> int:
        if ID not in self.translations:
            self.translations[ID] = {}
        if marker <= 4:
            raise PRGAggregationError(f"Marker {marker} is not >4")
        local_table = self.translations[ID]
        if marker % 2 == 0:
            site_id = marker - 1
            if site_id not in local_table:
                raise PRGAggregationError(
                    f"Error: {marker}'s site number {marker - 1} has never "
                    "been seen")
            return local_table[site_id].translation + 1
        if marker in local_table:
            record = local_table[marker]
            record.count += 1
            if record.count > 2:
                raise PRGAggregationError(
                    f"Error: {marker} site number present >2 times in local "
                    f"PRG {ID}")
            # legacy format: ending odd marker becomes even
            return local_table[marker].translation + 1
        local_table[marker] = Record(self.next_allocated, 1)
        self.next_allocated += 2
        return local_table[marker].translation


def get_aggregated_prgs(agg: PRGAggregator,
                        intervals: List[BedInterval]) -> List[int]:
    """from_msas.py:233-253."""
    out: List[int] = []
    for iv in intervals:
        prg_name = Path(iv.name).stem
        ints = np.fromfile(iv.name, dtype="<u4")
        for v in ints:
            v = int(v)
            if v <= 0:
                raise ValueError(f"PRG marker {v} should be > 0")
            if v <= 4:
                out.append(v)
            else:
                out.append(agg.translate(prg_name, v))
    log.info("Total length of built prg: %d", len(out))
    log.info("Total number of sites: %d", (agg.next_allocated - 3) // 2 - 1)
    return out


def standalone_build_from_msas(prgs_bed, reference, coords_file,
                               built_prg_dirname,
                               num_processes=DEFAULT_NUM_PROCESSES):
    ic = IntervalCollection(prgs_bed, reference, coords_file,
                            str(built_prg_dirname), num_processes)
    ic.build()
    built_intervals = ic.get_built_intervals()
    agg = PRGAggregator()
    rescaled = get_aggregated_prgs(agg, built_intervals)
    return built_intervals, rescaled


@report.with_report
def build_from_msas(build_report, action, build_paths, args):
    log.info("Building prg from prgs in %s", args.prgs_bed)
    built_intervals, rescaled = standalone_build_from_msas(
        args.prgs_bed, args.reference, build_paths.coords_file,
        build_paths.built_prg_dirname, args.max_threads)
    with open(build_paths.built_prg_bed, "w") as fh:
        for iv in built_intervals:
            fh.write(f"{iv.chrom}\t{iv.start}\t{iv.end}\t{iv.name}\n")
    PrgString(np.asarray(rescaled, dtype=np.uint32)).write(build_paths.prg)
