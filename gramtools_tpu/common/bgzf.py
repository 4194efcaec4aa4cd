"""Minimal BGZF (blocked gzip) reader + writer.

htslib-compatible: a series of gzip members, each carrying a BC extra
subfield giving the compressed block size, closed by the standard
28-byte EOF marker. Replaces the reference's htslib bgzf dependency for
vcf.gz output (make_vcf.cpp writes through htslib's bgzf layer).

Interop evidence (tests/test_bgzf_interop.py): the reader decodes an
htslib-written archive checked in from the reference's IT4 fixture
bit-exactly, and the writer's output round-trips through the strict
reader AND through Python's independent gzip implementation.
"""
from __future__ import annotations

import struct
import zlib

_MAX_BLOCK = 65280  # uncompressed payload per block (htslib default)
_EOF = bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000000000000000")


def _compress_block(data: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = c.compress(data) + c.flush()
    bsize = len(cdata) + 26  # 18 header + cdata + 8 footer
    header = struct.pack(
        "<4BI2BH2BHH",
        0x1F, 0x8B, 8, 4,     # magic, CM=deflate, FLG=FEXTRA
        0,                    # MTIME
        0, 0xFF,              # XFL, OS=unknown
        6,                    # XLEN
        0x42, 0x43,           # subfield id 'B','C'
        2,                    # subfield length
        bsize - 1,            # BSIZE - 1
    )
    footer = struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF, len(data))
    return header + cdata + footer


def bgzf_write(path, data: bytes):
    with open(path, "wb") as fh:
        for i in range(0, len(data), _MAX_BLOCK):
            fh.write(_compress_block(data[i : i + _MAX_BLOCK]))
        fh.write(_EOF)


class BgzfFormatError(ValueError):
    pass


def bgzf_read(path, require_eof: bool = True) -> bytes:
    """Strict BGZF decoder: validates each member's magic/FEXTRA, the
    BC subfield, BSIZE framing, CRC32 and ISIZE, and (by default) the
    28-byte EOF marker. Raises BgzfFormatError on any violation --
    plain (non-blocked) gzip is NOT accepted."""
    with open(path, "rb") as fh:
        raw = fh.read()
    out = []
    off = 0
    n = len(raw)
    saw_eof = False
    while off < n:
        if n - off < 18:
            raise BgzfFormatError(f"truncated BGZF header at {off}")
        magic = raw[off : off + 4]
        if magic != b"\x1f\x8b\x08\x04":
            raise BgzfFormatError(
                f"not a BGZF member at {off}: {magic.hex()} (FEXTRA unset "
                "= plain gzip)")
        xlen = struct.unpack_from("<H", raw, off + 10)[0]
        # scan extra subfields for BC
        bsize = None
        p, end = off + 12, off + 12 + xlen
        if end > n:
            raise BgzfFormatError(f"extra field overruns file at {off}")
        while p + 4 <= end:
            si1, si2, slen = raw[p], raw[p + 1], struct.unpack_from(
                "<H", raw, p + 2)[0]
            if si1 == 0x42 and si2 == 0x43:
                if slen != 2:
                    raise BgzfFormatError(f"BC subfield length {slen} != 2")
                bsize = struct.unpack_from("<H", raw, p + 4)[0] + 1
            p += 4 + slen
        if bsize is None:
            raise BgzfFormatError(f"member at {off} has no BC subfield")
        if off + bsize > n:
            raise BgzfFormatError(f"BSIZE overruns file at {off}")
        cdata = raw[off + 12 + xlen : off + bsize - 8]
        crc, isize = struct.unpack_from("<II", raw, off + bsize - 8)
        data = zlib.decompress(cdata, -15)
        if len(data) != isize:
            raise BgzfFormatError(f"ISIZE mismatch at {off}")
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise BgzfFormatError(f"CRC mismatch at {off}")
        if raw[off : off + bsize] == _EOF:
            saw_eof = off + bsize == n
        out.append(data)
        off += bsize
    if require_eof and not saw_eof:
        raise BgzfFormatError("missing BGZF EOF marker block")
    return b"".join(out)
