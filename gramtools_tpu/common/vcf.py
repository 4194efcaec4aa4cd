"""Minimal self-contained VCF reader/writer.

Replaces the reference's pysam dependency for the subset of VCF handling
gramtools needs: vcf->PRG construction, rebasing-map building, and
discover's record rebasing.
"""
from __future__ import annotations

import gzip
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional, Tuple


@dataclass
class VcfRecord:
    chrom: str
    pos: int  # 1-based
    id: str
    ref: str
    alts: Tuple[str, ...]
    qual: str = "."
    filter: Tuple[str, ...] = ()
    info: str = "."
    format: Optional[str] = None
    samples: Tuple[str, ...] = ()

    @property
    def stop(self) -> int:
        """1-based inclusive end of the REF span (pysam .stop is exclusive
        0-based == this value)."""
        return self.pos + len(self.ref) - 1

    def genotypes(self) -> List[Optional[int]]:
        """First sample's GT indices (None for '.')."""
        if not self.format or not self.samples:
            return []
        fields = self.format.split(":")
        if "GT" not in fields:
            return []
        gt = self.samples[0].split(":")[fields.index("GT")]
        out = []
        for part in gt.replace("|", "/").split("/"):
            out.append(None if part in (".", "") else int(part))
        return out

    def to_line(self) -> str:
        alt = ",".join(self.alts) if self.alts else "."
        filt = ";".join(self.filter) if self.filter else "."
        cols = [self.chrom, str(self.pos), self.id or ".", self.ref, alt,
                self.qual, filt, self.info]
        if self.format:
            cols.append(self.format)
            cols.extend(self.samples)
        return "\t".join(cols)


def _open(path):
    path = str(path)
    with open(path, "rb") as probe:
        if probe.read(2) == b"\x1f\x8b":
            return gzip.open(path, "rt")
    return open(path)


def parse_vcf(path) -> Tuple[List[str], List[VcfRecord]]:
    """Returns (header_lines, records)."""
    headers: List[str] = []
    records: List[VcfRecord] = []
    with _open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith("#"):
                headers.append(line)
                continue
            cols = line.split("\t")
            if len(cols) < 8:
                cols = line.split()
            chrom, pos, rid, ref, alt, qual, filt, info = cols[:8]
            fmt = cols[8] if len(cols) > 8 else None
            samples = tuple(cols[9:]) if len(cols) > 9 else ()
            records.append(VcfRecord(
                chrom=chrom, pos=int(pos), id=rid, ref=ref,
                alts=tuple(a for a in alt.split(",") if a != "."),
                qual=qual,
                filter=tuple(f for f in filt.split(";") if f != "."),
                info=info, format=fmt, samples=samples))
    return headers, records


def write_vcf_file(path, headers: List[str], records: List[VcfRecord]):
    text = "\n".join(headers + [r.to_line() for r in records]) + "\n"
    if str(path).endswith(".gz"):
        from .bgzf import bgzf_write
        bgzf_write(path, text.encode())
    else:
        Path(path).write_text(text)


MINIMAL_HEADER = ["##fileformat=VCFv4.2",
                  "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
