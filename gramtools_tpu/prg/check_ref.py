"""Verify a fasta reference equals the first path of the coverage graph.

Parity: libgramtools src/build/check_ref.cpp (PrgRefChecker).
"""
from __future__ import annotations

from ..common.seq import iter_fastx
from .graph import CoverageGraph


class RefMismatchError(Exception):
    pass


def get_first_prg_path(graph: CoverageGraph) -> str:
    parts = []
    cur = graph.root
    while len(graph.node(cur).edges) > 0:
        node = graph.node(cur)
        if node.seq_size > 0:
            parts.append(node.seq_str())
        cur = node.edges[0]
    return "".join(parts)


def check_ref_against_graph(fasta_path, graph: CoverageGraph):
    """Raises RefMismatchError on the first differing line."""
    first_path = get_first_prg_path(graph)
    offset = 0
    for _, seq, _ in iter_fastx(fasta_path):
        seq = seq.upper()
        prg_slice = first_path[offset : offset + len(seq)]
        if prg_slice != seq:
            raise RefMismatchError(
                f"Reference sequence does not match prg first path from "
                f"position {offset}")
        offset += len(seq)
    assert offset > 0, "empty reference"
