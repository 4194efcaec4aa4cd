"""SAM/BAM read input (native Python decoders, no htslib).

Capability parity: the reference accepts fasta/fastq/sam/bam/cram via a
vendored kseq-style reader over htslib codecs
(libgramtools/include/sequence_read/seq_file.h:20-28, 204-243). Its
record semantics, reproduced here:

  * every alignment record yields a read (secondary/supplementary are
    NOT filtered -- SeqRead uses seq_read, seqread.hpp:166-175);
  * reverse-strand records (FLAG & 16) are emitted reverse-complemented
    with reversed qualities, i.e. in original read orientation
    (seq_file.h:219-228);
  * qualities are phred+33 characters; BAM's 0xff ("absent") quality
    comes out as the reference's raw +33 offset bytes do.

BAM is BGZF-compressed (valid multi-member gzip, so the stdlib gzip
module decompresses it) with a simple little-endian binary record
layout; SAM is the tab-separated text form. CRAM needs the external
codec suite (rANS/bzip2 reference-based compression) that htslib
provides; without htslib in this environment it is detected and
rejected with a clear error rather than misparsed.
"""
from __future__ import annotations

import gzip
import struct
from pathlib import Path
from typing import Iterator, Tuple

_NT16 = "=ACMGRSVTWYHKDBN"
_COMP = str.maketrans("ACGTMRWSYKVHDBN", "TGCAKYWSRMBDHVN")


def _revcomp_str(seq: str) -> str:
    return seq.translate(_COMP)[::-1]


def detect_format(path) -> str:
    """'fasta' | 'fastq' | 'sam' | 'bam' | 'cram', by magic then content.

    SAM and FASTQ both start with '@'; a first line with >= 11
    tab-separated fields, or an @HD/@SQ/@RG/@PG/@CO header, means SAM.
    """
    path = str(path)
    with open(path, "rb") as fh:
        magic = fh.read(4)
    if not magic:
        return "fastq"  # empty file: the fastx reader yields nothing
    if magic[:4] == b"CRAM":
        return "cram"
    if magic[:2] == b"\x1f\x8b":
        with gzip.open(path, "rb") as fh:
            head = fh.read(4)
        if head[:4] == b"BAM\x01":
            return "bam"
        first = head[:1]
    else:
        first = magic[:1]
    if first == b">":
        return "fasta"
    opener = gzip.open if magic[:2] == b"\x1f\x8b" else open
    with opener(path, "rt") as fh:
        line = fh.readline().rstrip("\n")
    if line.count("\t") >= 10:
        return "sam"  # alignment line (headerless SAM included)
    if first != b"@":
        raise ValueError(f"{path}: unrecognised read-file format")
    if line[:3] in ("@HD", "@SQ", "@RG", "@PG", "@CO") and (
            len(line) == 3 or line[3:4] == "\t"):
        return "sam"
    return "fastq"


def iter_sam(path) -> Iterator[Tuple[str, str, str]]:
    """Yield (name, seq, qual) from a SAM file (.gz ok)."""
    path = str(path)
    with open(path, "rb") as probe:
        is_gz = probe.read(2) == b"\x1f\x8b"
    opener = gzip.open if is_gz else open
    with opener(path, "rt") as fh:
        for line in fh:
            if line.startswith("@"):
                continue
            fields = line.rstrip("\n").split("\t")
            if len(fields) < 11:
                raise ValueError(f"{path}: truncated SAM record: {line!r}")
            name, flag, seq, qual = fields[0], int(fields[1]), fields[9], fields[10]
            if seq == "*":
                seq = ""
            if qual == "*":
                qual = ""
            if flag & 16:
                seq = _revcomp_str(seq)
                qual = qual[::-1]
            yield name, seq, qual


def iter_bam(path) -> Iterator[Tuple[str, str, str]]:
    """Yield (name, seq, qual) from a BAM file."""
    with gzip.open(str(path), "rb") as fh:
        data = fh.read()
    if data[:4] != b"BAM\x01":
        raise ValueError(f"{path}: not a BAM file")
    (l_text,) = struct.unpack_from("<i", data, 4)
    off = 8 + l_text
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, off)
        off += 4 + l_name + 4
    end = len(data)
    while off + 4 <= end:
        (block_size,) = struct.unpack_from("<i", data, off)
        off += 4
        rec_end = off + block_size
        if rec_end > end:
            raise ValueError(f"{path}: truncated BAM record")
        (_refid, _pos, l_read_name, _mapq, _bin, n_cigar, flag, l_seq,
         _nref2, _npos, _tlen) = struct.unpack_from("<iiBBHHHiiii", data, off)
        name = data[off + 32: off + 32 + l_read_name - 1].decode("ascii")
        p = off + 32 + l_read_name + 4 * n_cigar
        packed = data[p: p + (l_seq + 1) // 2]
        qual_raw = data[p + (l_seq + 1) // 2: p + (l_seq + 1) // 2 + l_seq]
        chars = []
        for i in range(l_seq):
            nib = (packed[i // 2] >> 4) if i % 2 == 0 else (packed[i // 2] & 0xF)
            chars.append(_NT16[nib])
        seq = "".join(chars)
        qual = "".join(chr(33 + (q & 0xFF)) for q in qual_raw)
        if flag & 16:
            seq = _revcomp_str(seq)
            qual = qual[::-1]
        yield name, seq, qual
        off = rec_end
