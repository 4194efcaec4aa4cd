"""Personalised reference: root-to-sink graph walk splicing called alleles.

Parity: libgramtools src/genotype/infer/personalised_reference.cpp.
"""
from __future__ import annotations

from typing import List, Tuple

from ..mapping.search import PrgIndex
from ..prg.markers import site_id_to_index
from .segment_tracker import SegmentTracker
from .types import GenotypedSite


class InconsistentPloidyError(Exception):
    pass


def get_ploidy(sites: List[GenotypedSite]) -> int:
    for site in sites:
        if not site.is_null():
            return len(site.genotype)
    return 1


def _alleles_to_paste(site: GenotypedSite, ploidy: int) -> List[str]:
    gts = [0] * ploidy if site.is_null() else site.genotype
    if len(gts) != ploidy:
        raise InconsistentPloidyError()
    return [site.alleles[g].sequence for g in gts]


def get_personalised_ref(idx: PrgIndex, sites: List[GenotypedSite],
                         tracker: SegmentTracker) -> List[Tuple[str, str]]:
    """Returns [(ID, sequence)] -- one record per segment x ploidy."""
    g = idx.graph
    ploidy = get_ploidy(sites)
    num_segments = tracker.num_segments
    seqs: List[List[str]] = [[] for _ in range(num_segments * ploidy)]
    ids: List[str] = [""] * (num_segments * ploidy)

    def add_ids(offset: int, seg_id: str):
        if ploidy == 1:
            ids[offset] = seg_id
        else:
            for i in range(ploidy):
                ids[i + offset] = f"{seg_id}_{i + 1}"

    offset = 0
    cur_edge = tracker.edge
    add_ids(offset, tracker.get_id(cur_edge))

    def switch_segment(offset):
        nonlocal cur_edge
        if tracker.edge != tracker.global_edge:
            new_id = tracker.get_id(tracker.edge + 1)
            offset += ploidy
            add_ids(offset, new_id)
        cur_edge = tracker.edge
        return offset

    cur = g.root
    while len(g.node(cur).edges) > 0:
        node = g.node(cur)
        if node.is_bubble_start():
            site_index = site_id_to_index(node.site_id)
            site = sites[site_index]
            for i, seq in enumerate(_alleles_to_paste(site, ploidy)):
                seqs[i + offset].append(seq)
            cur = site.site_end_node
            node = g.node(cur)
            if cur_edge == node.pos - 1:
                offset = switch_segment(offset)

        if node.seq_size > 0:
            seq = node.seq_str()
            cur_pos = node.pos
            end_pos = cur_pos + node.seq_size - 1
            while cur_pos <= end_pos:
                if cur_edge <= end_pos:
                    chunk = seq[cur_pos - node.pos : cur_edge - node.pos + 1]
                    for i in range(ploidy):
                        seqs[i + offset].append(chunk)
                    cur_pos = cur_edge + 1
                    offset = switch_segment(offset)
                else:
                    for i in range(ploidy):
                        seqs[i + offset].append(seq[cur_pos - node.pos :])
                    cur_pos = end_pos + 1

        assert len(node.edges) == 1
        cur = node.edges[0]

    return [(ids[i], "".join(seqs[i])) for i in range(len(seqs))]


def write_personalised_ref(records: List[Tuple[str, str]], desc: str, path,
                           width: int = 60):
    """Dedup by sequence then write (genotype.cpp:16-21: unique_Fastas is
    a set ordered by sequence)."""
    seen = {}
    for rid, seq in records:
        if seq not in seen:
            seen[seq] = rid
    ordered = sorted(seen.items())  # operator< compares sequence
    with open(path, "w") as fh:
        for seq, rid in ordered:
            fh.write(f">{rid} {desc}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i : i + width] + "\n")
