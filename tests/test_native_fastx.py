"""Native C++ fastx reader parity with the python iterator."""
from pathlib import Path

import numpy as np
import pytest

from gramtools_tpu.common.seq import encode_dna, iter_fastx
from gramtools_tpu.index.native import native_read_batches

DATA_DIR = Path("/root/reference/gramtools/tests/integration_test_data")

FILES = [
    DATA_DIR / "IT1" / "reads.fastq",
    DATA_DIR / "IT4" / "reads.fq.gz",   # gzip FASTQ
    DATA_DIR / "IT1" / "ref.fa",        # FASTA
]


@pytest.mark.parametrize("path", FILES,
                         ids=[p.name for p in FILES])
def test_native_reader_matches_python(path):
    if not path.exists():
        pytest.skip("fixture unavailable")
    gen = native_read_batches(path, batch_size=3)
    if gen is None:
        pytest.skip("native library unavailable")
    py = [encode_dna(seq) for _, seq, _ in iter_fastx(path)]
    nat = [r for batch in gen for r in batch]
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert np.array_equal(a, b)


def test_native_reader_multiline_fasta(tmp_path):
    fa = tmp_path / "multi.fa"
    fa.write_text(">s1 desc\nACGT\nACGTT\n>s2\nGGG\n")
    gen = native_read_batches(fa, batch_size=10)
    if gen is None:
        pytest.skip("native library unavailable")
    nat = [r for batch in gen for r in batch]
    assert [list(r) for r in nat] == [
        list(encode_dna("ACGTACGTT")), list(encode_dna("GGG"))]
