"""Maps global PRG positions to (segment ID, relative position).

Parity: libgramtools include/genotype/infer/output_specs/segment_tracker.hpp.
"""
from __future__ import annotations

from typing import List, Tuple

_MAX = 2 ** 63 - 1


class SegmentTracker:
    def __init__(self, coords_content: str = ""):
        self.segments: List[Tuple[str, int]] = []
        for line in coords_content.splitlines():
            parts = line.split()
            if len(parts) >= 2:
                self.segments.append((parts[0], int(parts[1])))
        if not self.segments:
            self.segments.append(("gramtools_prg", _MAX))
        self.global_max = sum(size for _, size in self.segments)
        self.reset()

    @classmethod
    def from_file(cls, path) -> "SegmentTracker":
        with open(path) as fh:
            return cls(fh.read())

    def reset(self):
        self.min = 0
        self.cur_idx = 0
        self.max = self.segments[0][1] - 1

    def get_id(self, pos: int) -> str:
        assert self.min <= pos < self.global_max
        while pos > self.max:
            self.cur_idx += 1
            self.min = self.max + 1
            self.max += self.segments[self.cur_idx][1]
        return self.segments[self.cur_idx][0]

    def get_relative_pos(self, pos: int) -> int:
        assert self.min <= pos < self.global_max
        return pos - self.min

    @property
    def edge(self) -> int:
        return self.max

    @property
    def global_edge(self) -> int:
        return self.global_max - 1

    @property
    def num_segments(self) -> int:
        return len(self.segments)
