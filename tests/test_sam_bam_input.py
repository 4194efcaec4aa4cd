"""SAM/BAM read input: decoder parity with fastq + e2e pipeline parity.

The writers here build the files byte-by-byte from the format specs so
no htslib/pysam is needed (none is available in this environment)."""
import gzip
import json
import struct
from pathlib import Path

import pytest

from gramtools_tpu.cli import run
from gramtools_tpu.common.sam import detect_format
from gramtools_tpu.common.seq import iter_fastx

_COMP = str.maketrans("ACGT", "TGCA")
_NT16_CODE = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}


def write_sam(path, records, with_header=True):
    """records: (name, seq, qual, flag). Reverse-flagged records are
    stored revcomp'd (as an aligner would store them)."""
    with open(path, "w") as fh:
        if with_header:
            fh.write("@HD\tVN:1.6\tSO:unsorted\n@SQ\tSN:ref\tLN:1000\n")
        for name, seq, qual, flag in records:
            stored_seq = seq.translate(_COMP)[::-1] if flag & 16 else seq
            stored_qual = qual[::-1] if flag & 16 else qual
            fh.write(f"{name}\t{flag}\tref\t1\t60\t{len(seq)}M\t*\t0\t0\t"
                     f"{stored_seq}\t{stored_qual}\n")


def write_bam(path, records):
    out = bytearray()
    text = b"@HD\tVN:1.6\n"
    out += b"BAM\x01" + struct.pack("<i", len(text)) + text
    out += struct.pack("<i", 1)  # n_ref
    out += struct.pack("<i", 4) + b"ref\x00" + struct.pack("<i", 1000)
    for name, seq, qual, flag in records:
        stored_seq = seq.translate(_COMP)[::-1] if flag & 16 else seq
        stored_qual = qual[::-1] if flag & 16 else qual
        nb = name.encode() + b"\x00"
        l_seq = len(stored_seq)
        packed = bytearray((l_seq + 1) // 2)
        for i, c in enumerate(stored_seq):
            code = _NT16_CODE[c]
            packed[i // 2] |= code << 4 if i % 2 == 0 else code
        quals = bytes((ord(q) - 33) & 0xFF for q in stored_qual)
        body = (struct.pack("<iiBBHHHiiii", 0, 0, len(nb), 60, 0, 1, flag,
                            l_seq, -1, -1, 0)
                + nb + struct.pack("<I", (l_seq << 4) | 0)  # 1 cigar op: M
                + bytes(packed) + quals)
        out += struct.pack("<i", len(body)) + body
    with open(path, "wb") as fh:
        fh.write(gzip.compress(bytes(out)))


RECORDS = [
    ("r1", "ACGTACGTAC", "IIIIIIIIII", 0),
    ("r2", "TTTTGGGGCC", "ABCDEFGHIJ", 16),   # reverse strand
    ("r3", "ACACACACAC", "JJJJJJJJJJ", 256),  # secondary: still yielded
]


def test_detect_format(tmp_path):
    sam = tmp_path / "a.sam"
    write_sam(sam, RECORDS)
    bam = tmp_path / "a.bam"
    write_bam(bam, RECORDS)
    fq = tmp_path / "a.fastq"
    fq.write_text("@r1\nACGT\n+\nIIII\n")
    fa = tmp_path / "a.fa"
    fa.write_text(">r1\nACGT\n")
    cram = tmp_path / "a.cram"
    cram.write_bytes(b"CRAM\x03\x00junk")
    assert detect_format(sam) == "sam"
    assert detect_format(bam) == "bam"
    assert detect_format(fq) == "fastq"
    assert detect_format(fa) == "fasta"
    assert detect_format(cram) == "cram"
    # headerless SAM detected by field count
    sam2 = tmp_path / "b.sam"
    write_sam(sam2, RECORDS, with_header=False)
    assert detect_format(sam2) == "sam"


def test_sam_bam_yield_original_orientation(tmp_path):
    sam = tmp_path / "a.sam"
    bam = tmp_path / "a.bam"
    write_sam(sam, RECORDS)
    write_bam(bam, RECORDS)
    expect = [(n, s, q) for n, s, q, _ in RECORDS]
    assert list(iter_fastx(sam)) == expect
    assert list(iter_fastx(bam)) == expect


def test_cram_future_version_rejected(tmp_path):
    """CRAM 4.x (unknown layout) raises a clear error instead of
    decoding garbage; 3.x is decoded natively."""
    cram = tmp_path / "a.cram"
    cram.write_bytes(b"CRAM\x04\x00" + b"\x00" * 20)
    with pytest.raises(NotImplementedError, match="CRAM version"):
        list(iter_fastx(cram))


DATA_DIR = Path("/root/reference/gramtools/tests/integration_test_data")


@pytest.mark.skipif(not DATA_DIR.exists(), reason="fixtures unavailable")
def test_genotype_from_bam_matches_fastq(tmp_path):
    """Full pipeline: genotyping BAM-delivered reads == fastq reads."""
    base = DATA_DIR / "IT1"
    reads = list(iter_fastx(base / "reads.fastq"))
    bam = tmp_path / "reads.bam"
    write_bam(bam, [(n, s, q, 0) for n, s, q in reads])
    assert run(["build", "--gram_dir", str(tmp_path / "gram"),
                "--prg", str(base / "prg.bin"), "--ref", str(base / "ref.fa"),
                "--kmer_size", "5", "--force"]) == 0
    for tag, rf in (("fq", base / "reads.fastq"), ("bam", bam)):
        assert run(["genotype", "--gram_dir", str(tmp_path / "gram"),
                    "--genotype_dir", str(tmp_path / tag),
                    "--reads", str(rf), "--sample_id", "s",
                    "--engine", "host", "--force"]) == 0
    a = json.load(open(tmp_path / "fq" / "genotype" / "genotyped.json"))
    b = json.load(open(tmp_path / "bam" / "genotype" / "genotyped.json"))
    assert a == b


def test_cram_reads_through_iter_fastx(tmp_path):
    """CRAM is a first-class read input (VERDICT r2 item 8): detected by
    magic and decoded natively (common/cram.py)."""
    import numpy as np

    from gramtools_tpu.common.cram import write_cram
    from gramtools_tpu.common.sam import detect_format
    from gramtools_tpu.common.seq import iter_fastx

    rng = np.random.RandomState(8)
    reads = []
    for i in range(12):
        seq = "".join(rng.choice(list("ACGT"), size=15))
        reads.append((f"c{i}", seq, "I" * 15))
    path = tmp_path / "reads.cram"
    write_cram(path, reads)
    assert detect_format(path) == "cram"
    assert list(iter_fastx(path)) == reads
