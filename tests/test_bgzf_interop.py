"""BGZF third-party interop: decode an htslib-written archive (checked
in from the reference's IT4 fixture -- written by bgzip/htslib, NOT by
this package) and cross-validate our writer against Python's gzip."""
import gzip

import pytest

from gramtools_tpu.common.bgzf import (
    BgzfFormatError, bgzf_read, bgzf_write, _EOF)

FOREIGN = "tests/fixtures/htslib_written.vcf.gz"


def test_decode_htslib_archive_bit_exact():
    ours = bgzf_read(FOREIGN)
    with gzip.open(FOREIGN, "rb") as fh:        # independent decoder
        theirs = fh.read()
    assert ours == theirs
    assert ours.startswith(b"##fileformat=VCF")


def test_htslib_archive_has_eof_and_blocks():
    raw = open(FOREIGN, "rb").read()
    assert raw.endswith(_EOF)                   # htslib EOF marker
    assert raw[:4] == b"\x1f\x8b\x08\x04"       # FEXTRA set = blocked


def test_our_writer_reads_back_and_gzip_compatible(tmp_path):
    payload = b"##fileformat=VCFv4.2\n" + b"A" * 200_000 + b"\n"
    p = tmp_path / "out.vcf.gz"
    bgzf_write(p, payload)
    assert bgzf_read(p) == payload              # strict BGZF framing
    with gzip.open(p, "rb") as fh:              # independent decoder
        assert fh.read() == payload
    raw = p.read_bytes()
    assert raw.endswith(_EOF)
    # the BC subfield must be exactly htslib's layout: XLEN=6 at
    # [10:12), then SI1='B' SI2='C' SLEN=2 (the pre-fix writer packed
    # 'B' as a 2-byte field, emitting SI2=0x00 -- htslib-unreadable)
    assert raw[10:12] == b"\x06\x00"
    assert raw[12:16] == b"\x42\x43\x02\x00"
    foreign = open(FOREIGN, "rb").read()
    assert foreign[10:16] == raw[10:16]         # byte-identical framing


def test_plain_gzip_rejected(tmp_path):
    p = tmp_path / "plain.gz"
    with gzip.open(p, "wb") as fh:
        fh.write(b"not blocked")
    with pytest.raises(BgzfFormatError):
        bgzf_read(p)


def test_missing_eof_rejected(tmp_path):
    p = tmp_path / "noeof.vcf.gz"
    bgzf_write(p, b"data")
    raw = p.read_bytes()[: -len(_EOF)]
    p.write_bytes(raw)
    with pytest.raises(BgzfFormatError):
        bgzf_read(p)
    assert bgzf_read(p, require_eof=False) == b"data"
