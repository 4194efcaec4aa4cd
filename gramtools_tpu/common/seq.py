"""Nucleotide codecs and sequence file IO.

Base encoding: A=1, C=2, G=3, T=4 (case-insensitive); 0 = unknown.
Parity: libgramtools/src/common/utils.cpp:13-92 and
gramtools/commands/common.py (nucleotide <-> int codecs).

All functions are numpy-vectorised; reads are handled as uint8 arrays.
"""
from __future__ import annotations

import os
import gzip
import io
from pathlib import Path
from typing import Iterator, List, Tuple

import numpy as np

# --- base codecs ------------------------------------------------------------

_ENCODE_LUT = np.zeros(256, dtype=np.uint8)
for _c, _v in (("A", 1), ("C", 2), ("G", 3), ("T", 4)):
    _ENCODE_LUT[ord(_c)] = _v
    _ENCODE_LUT[ord(_c.lower())] = _v

_DECODE_LUT = np.frombuffer(b"NACGT", dtype=np.uint8)

# Watson-Crick complement on the integer encoding (1<->4, 2<->3, 0->0)
_COMPLEMENT_LUT = np.array([0, 4, 3, 2, 1], dtype=np.uint8)


def encode_dna(seq: str | bytes) -> np.ndarray:
    """String/bytes -> uint8 array with A,C,G,T -> 1..4 (unknown -> 0)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    raw = np.frombuffer(seq, dtype=np.uint8)
    return _ENCODE_LUT[raw]


def decode_dna(arr: np.ndarray) -> str:
    """uint8 array (1..4) -> ACGT string ('N' for 0)."""
    a = np.asarray(arr)
    return _DECODE_LUT[np.clip(a, 0, 4)].tobytes().decode("ascii")


def revcomp(arr: np.ndarray) -> np.ndarray:
    """Reverse complement of an integer-encoded read.

    Parity: libgramtools quasimap.cpp:288-298 (reverse_complement_read).
    """
    return _COMPLEMENT_LUT[arr[::-1]]


# --- file IO ----------------------------------------------------------------


def _open_maybe_gz(path: str | Path, mode: str = "rt"):
    path = str(path)
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, mode)
    return open(path, mode)


def iter_fastx(path: str | Path) -> Iterator[Tuple[str, str, str]]:
    """Yield (name, sequence, quality) records from FASTA, FASTQ, SAM or
    BAM (.gz ok), or CRAM 3.0 (native decoder, common/cram.py; mapped
    reference-based slices take the fasta via GRAMTOOLS_TPU_CRAM_REF).

    Quality is '' for FASTA. Replaces the vendored kseq-style reader
    (libgramtools include/sequence_read/seq_file.h) for the host path; a
    native C++ reader is used for bulk fasta/fastq loading when built.
    """
    from .sam import detect_format, iter_bam, iter_sam

    fmt = detect_format(path)
    if fmt == "sam":
        yield from iter_sam(path)
        return
    if fmt == "bam":
        yield from iter_bam(path)
        return
    if fmt == "cram":
        from .cram import iter_cram_reads

        refs = None
        ref_env = os.environ.get("GRAMTOOLS_TPU_CRAM_REF")
        if ref_env:
            refs = load_fasta(ref_env)
        yield from iter_cram_reads(path, refs=refs)
        return
    with _open_maybe_gz(path, "rt") as fh:
        first = fh.read(1)
        if not first:
            return
        if first == ">":
            name = fh.readline().strip()
            chunks: List[str] = []
            for line in fh:
                line = line.rstrip()
                if line.startswith(">"):
                    yield name.split()[0] if name else "", "".join(chunks), ""
                    name = line[1:].strip()
                    chunks = []
                else:
                    chunks.append(line)
            yield name.split()[0] if name else "", "".join(chunks), ""
        elif first == "@":
            name = fh.readline().strip()
            while True:
                seq = fh.readline().strip()
                plus = fh.readline()
                qual = fh.readline().strip()
                yield name.split()[0] if name else "", seq, qual
                header = fh.readline()
                if not header:
                    return
                name = header[1:].strip()
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ (starts with {first!r})")


def load_fasta(path: str | Path) -> "dict[str, str]":
    """Ordered mapping of record name -> sequence."""
    return {name: seq for name, seq, _ in iter_fastx(path)}


def write_fasta(path: str | Path, records: "list[tuple[str, str]]", width: int = 60):
    with open(path, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i : i + width] + "\n")


def load_reads_encoded(path: str | Path) -> "list[np.ndarray]":
    """All reads of a FASTA/FASTQ file, integer encoded."""
    return [encode_dna(seq) for _, seq, _ in iter_fastx(path)]
