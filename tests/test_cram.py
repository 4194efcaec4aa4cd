"""CRAM 3.0 reader/writer conformance (common/cram.py).

The reference accepts CRAM reads through htslib
(include/sequence_read/seq_file.h:94-1002); these tests round-trip the
from-spec implementation: rANS-4x8 order-0/1 codecs, ITF-8/LTF-8,
containers/blocks, record decode for unmapped and reference-based
mapped records (embedded + external reference), and the pipeline
integration (CRAM reads == fastq reads through genotyping).
"""
import io

import numpy as np
import pytest

from gramtools_tpu.common.cram import (CramError, iter_cram_reads,
                                       rans_compress_o0, rans_compress_o1,
                                       rans_decompress, read_itf8,
                                       read_ltf8, write_cram, write_itf8,
                                       write_ltf8)


def test_itf8_ltf8_round_trip():
    for v in (0, 1, 127, 128, 16383, 16384, (1 << 21) - 1, 1 << 21,
              (1 << 28) - 1, 1 << 28, (1 << 31) - 1, -1, -42):
        assert read_itf8(io.BytesIO(write_itf8(v))) == v, v
    for v in (0, 127, 128, 1 << 20, 1 << 40, 1 << 62):
        assert read_ltf8(io.BytesIO(write_ltf8(v))) == v, v


@pytest.mark.parametrize("order", [0, 1])
def test_rans_round_trip(order):
    rng = np.random.RandomState(7)
    fn = rans_compress_o0 if order == 0 else rans_compress_o1
    for data in (b"A", b"AB" * 700, bytes([9] * 5000),
                 bytes(rng.randint(0, 256, 4097).astype(np.uint8)),
                 bytes(rng.choice([65, 67, 71, 84],
                                  p=[.45, .25, .2, .1],
                                  size=12345).astype(np.uint8))):
        assert rans_decompress(fn(data)) == data


def _reads(n, rng, L=20):
    out = []
    for i in range(n):
        seq = "".join(rng.choice(list("ACGT"), size=L))
        qual = "".join(chr(33 + int(q)) for q in rng.randint(0, 40, L))
        out.append((f"read{i}", seq, qual))
    return out


def test_unmapped_round_trip(tmp_path):
    rng = np.random.RandomState(0)
    reads = _reads(25, rng)
    path = tmp_path / "u.cram"
    write_cram(path, reads)
    assert list(iter_cram_reads(path)) == reads


def test_unmapped_gzip_blocks(tmp_path):
    from gramtools_tpu.common.cram import BLOCK_GZIP

    rng = np.random.RandomState(1)
    reads = _reads(10, rng)
    path = tmp_path / "g.cram"
    write_cram(path, reads, method=BLOCK_GZIP)
    assert list(iter_cram_reads(path)) == reads


def test_multi_slice_round_trip(tmp_path):
    rng = np.random.RandomState(2)
    reads = _reads(23, rng)
    path = tmp_path / "m.cram"
    write_cram(path, reads, records_per_slice=7)
    assert list(iter_cram_reads(path)) == reads


def _mapped_case(rng, ref, n):
    """Random reference-based records + their expected sequences."""
    reads, mapped = [], []
    others = {b: [o for o in "ACGTN" if o != b] for b in "ACGTN"}
    for i in range(n):
        pos = int(rng.randint(1, len(ref) - 40))
        rl = 20
        features = []
        seq = []
        rpos, rcur = 0, pos
        kind = rng.randint(0, 4)
        if kind == 1:       # substitution at read pos 5
            seq += list(ref[rcur - 1 : rcur + 3]); rpos += 4; rcur += 4
            code = int(rng.randint(0, 4))
            rb = ref[rcur - 1]
            features.append((rpos + 1, "X", code))
            seq.append(others[rb][code])
            rpos += 1; rcur += 1
        elif kind == 2:     # insertion
            seq += list(ref[rcur - 1 : rcur + 3]); rpos += 4; rcur += 4
            ins = "".join(rng.choice(list("ACGT"), size=3))
            features.append((rpos + 1, "I", ins.encode()))
            seq += list(ins); rpos += 3
        elif kind == 3:     # deletion
            seq += list(ref[rcur - 1 : rcur + 3]); rpos += 4; rcur += 4
            features.append((rpos + 1, "D", 2))
            rcur += 2
        while rpos < rl:
            seq.append(ref[rcur - 1]); rpos += 1; rcur += 1
        qual = "".join(chr(33 + int(q)) for q in rng.randint(0, 40, rl))
        reads.append((f"m{i}", "".join(seq[:rl]), qual))
        mapped.append((0, pos, features))
    return reads, mapped


def test_mapped_embedded_reference(tmp_path):
    rng = np.random.RandomState(3)
    ref = "".join(rng.choice(list("ACGT"), size=400))
    reads, mapped = _mapped_case(rng, ref, 20)
    path = tmp_path / "e.cram"
    write_cram(path, reads, sam_refs=[("chr1", len(ref))], mapped=mapped,
               embed_ref=ref)
    assert list(iter_cram_reads(path)) == reads


def test_mapped_external_reference(tmp_path):
    rng = np.random.RandomState(4)
    ref = "".join(rng.choice(list("ACGT"), size=400))
    reads, mapped = _mapped_case(rng, ref, 12)
    path = tmp_path / "x.cram"
    write_cram(path, reads, sam_refs=[("chr1", len(ref))], mapped=mapped)
    assert list(iter_cram_reads(path, refs={"chr1": ref})) == reads
    # without the reference: a clear error, not garbage
    with pytest.raises(CramError, match="reference"):
        list(iter_cram_reads(path))


def test_pipeline_cram_equals_fastq(tmp_path, monkeypatch):
    """genotype-grade parity: the same reads through CRAM and fastq
    produce identical coverage."""
    from gramtools_tpu.index.build import build_prg_index
    from gramtools_tpu.index.kmer_index import build_kmer_index
    from gramtools_tpu.mapping.quasimap import quasimap_reads
    from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints

    rng = np.random.RandomState(5)
    prg_str = "ACGT[AC,GT]TTACG[A,C]ACACGTT[TG,AA]CGT"
    idx1 = build_prg_index(PrgString(prg_string_to_ints(prg_str)))
    idx2 = build_prg_index(PrgString(prg_string_to_ints(prg_str)))
    k = 3
    path = idx1.prg[idx1.prg <= 4].astype(np.uint8)
    reads = []
    for i in range(30):
        s = rng.randint(0, path.size - 10)
        seq = "".join("ACGT"[b - 1] for b in path[s : s + 10])
        reads.append((f"r{i}", seq, "I" * 10))

    fq = tmp_path / "reads.fastq"
    fq.write_text("".join(f"@{n}\n{s}\n+\n{q}\n" for n, s, q in reads))
    cram = tmp_path / "reads.cram"
    write_cram(cram, reads)

    st1, cov1 = quasimap_reads([str(fq)], build_kmer_index(idx1, k), idx1,
                               k, seed=42)
    st2, cov2 = quasimap_reads([str(cram)], build_kmer_index(idx2, k), idx2,
                               k, seed=42)
    assert st1.as_dict() == st2.as_dict()
    assert cov1.allele_sum == cov2.allele_sum
    assert cov1.grouped_counts == cov2.grouped_counts
    assert np.array_equal(idx1.graph.coverage, idx2.graph.coverage)
