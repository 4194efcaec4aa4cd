"""Minimal BGZF (blocked gzip) writer.

htslib-compatible: a series of gzip members with a BC extra field giving
the block size, closed by the standard 28-byte EOF marker. Replaces the
reference's htslib bgzf dependency for vcf.gz output.
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
        "<4BI2B2H2BH",
        0x1F, 0x8B, 8, 4,     # magic, CM=deflate, FLG=FEXTRA
        0,                    # MTIME
        0, 0xFF,              # XFL, OS=unknown
        6,                    # XLEN
        66, 67, 2,            # 'B', 'C', subfield length
        bsize - 1,            # BSIZE - 1
    )
    footer = struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF, len(data))
    return header + cdata + footer


def bgzf_write(path, data: bytes):
    with open(path, "wb") as fh:
        for i in range(0, len(data), _MAX_BLOCK):
            fh.write(_compress_block(data[i : i + _MAX_BLOCK]))
        fh.write(_EOF)
