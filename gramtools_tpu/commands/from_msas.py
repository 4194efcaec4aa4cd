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


class PRGAggregator:
    """Renumbers site markers across region PRGs into one global,
    collision-free namespace.

    Marker algebra (capability parity with the reference's aggregation
    step in its MSA build path, behaviour pinned by tests): each region
    has its own local marker namespace. An odd marker allocates a fresh
    global site number at its first appearance and maps to the matching
    global even marker at its second (legacy PRGs close sites with the
    odd marker); a third appearance is an error. An even marker maps to
    global-site + 1 and is only legal after its odd partner. Global site
    numbers are handed out in stream order, two apart, starting at 5.

    Two entry points: scalar ``translate`` (one marker at a time) and
    the vectorised ``renumber_region`` (a whole region's int array in
    one numpy pass) -- both maintain the same per-region tables so they
    can be mixed."""

    def __init__(self):
        # per region: site(odd) local marker -> [global odd marker, #seen]
        self._tables: Dict[str, Dict[int, List[int]]] = {}
        self.next_allocated = 5

    def _table(self, region_id: str) -> Dict[int, List[int]]:
        return self._tables.setdefault(region_id, {})

    def translate(self, region_id: str, marker: int) -> int:
        table = self._table(region_id)
        if marker <= 4:
            raise PRGAggregationError(
                f"{marker} is a sequence value, not a variant marker")
        site, is_even = (marker - 1, True) if marker % 2 == 0 \
            else (marker, False)
        entry = table.get(site)
        if is_even:
            if entry is None:
                raise PRGAggregationError(
                    f"allele marker {marker} appears before site marker "
                    f"{site} in region {region_id}")
            return entry[0] + 1
        if entry is None:
            table[site] = [self.next_allocated, 1]
            self.next_allocated += 2
            return table[site][0]
        entry[1] += 1
        if entry[1] > 2:
            raise PRGAggregationError(
                f"site marker {marker} appears more than twice in region "
                f"{region_id}")
        return entry[0] + 1  # legacy close: second odd becomes even

    def renumber_region(self, region_id: str, ints: np.ndarray) -> np.ndarray:
        """Vectorised translate of one region PRG (int64 in/out).

        Equivalent to mapping ``translate`` over every marker of the
        array in order, but as array passes: group odd occurrences by
        value to rank them (1st vs 2nd vs error), allocate global sites
        in first-appearance order, and join even markers against their
        odd partner's allocation with a stream-order legality check."""
        ints = np.asarray(ints, dtype=np.int64)
        if ints.size and ints.min() <= 0:
            raise ValueError(
                f"PRG marker {int(ints.min())} should be > 0")
        table = self._table(region_id)
        if table:
            # region already partially translated via the scalar path:
            # keep one source of truth
            return np.array([v if v <= 4 else self.translate(region_id, v)
                             for v in ints.tolist()], dtype=np.int64)
        out = ints.copy()
        mpos = np.flatnonzero(ints > 4)
        if mpos.size == 0:
            return out
        vals = ints[mpos]
        odd = (vals % 2) == 1
        odd_vals = vals[odd]
        odd_stream = np.flatnonzero(odd)          # index into vals
        uniq, first_in_odd, counts = np.unique(
            odd_vals, return_index=True, return_counts=True)
        if np.any(counts > 2):
            bad = int(uniq[np.argmax(counts > 2)])
            raise PRGAggregationError(
                f"site marker {bad} appears more than twice in region "
                f"{region_id}")
        # global site numbers in first-appearance order
        appear_order = np.argsort(first_in_odd, kind="stable")
        g_of_uniq = np.empty(uniq.size, dtype=np.int64)
        g_of_uniq[appear_order] = self.next_allocated + 2 * np.arange(
            uniq.size, dtype=np.int64)
        self.next_allocated += 2 * uniq.size

        # odd occurrences: rank within their value group (0 = open site,
        # 1 = legacy close -> even)
        by_val = np.argsort(odd_vals, kind="stable")
        grp_new = np.ones(odd_vals.size, dtype=bool)
        grp_new[1:] = odd_vals[by_val][1:] != odd_vals[by_val][:-1]
        grp_first = np.maximum.accumulate(
            np.where(grp_new, np.arange(odd_vals.size), 0))
        rank = np.empty(odd_vals.size, dtype=np.int64)
        rank[by_val] = np.arange(odd_vals.size) - grp_first
        g_odd = g_of_uniq[np.searchsorted(uniq, odd_vals)]
        out[mpos[odd_stream]] = g_odd + (rank > 0)

        # even occurrences: must follow their odd partner in the stream
        even_stream = np.flatnonzero(~odd)
        if even_stream.size:
            keys = vals[even_stream] - 1
            k_idx = np.searchsorted(uniq, keys)
            known = (k_idx < uniq.size) & (uniq[np.minimum(
                k_idx, uniq.size - 1)] == keys)
            first_stream = odd_stream[first_in_odd]   # index into vals
            early = known & (even_stream < first_stream[np.minimum(
                k_idx, uniq.size - 1)])
            if np.any(~known | early):
                bad = int(keys[np.argmax(~known | early)]) + 1
                raise PRGAggregationError(
                    f"allele marker {bad} appears before site marker "
                    f"{bad - 1} in region {region_id}")
            out[mpos[even_stream]] = g_of_uniq[k_idx] + 1
        # commit the per-region table so later scalar calls stay coherent
        for j in range(uniq.size):
            table[int(uniq[j])] = [int(g_of_uniq[j]), int(counts[j])]
        return out


def get_aggregated_prgs(agg: PRGAggregator,
                        intervals: List[BedInterval]) -> List[int]:
    """Concatenate region PRGs under the aggregator's global marker
    namespace (one vectorised renumber pass per region)."""
    out: List[int] = []
    for iv in intervals:
        ints = np.fromfile(iv.name, dtype="<u4")
        out.extend(agg.renumber_region(Path(iv.name).stem, ints).tolist())
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
