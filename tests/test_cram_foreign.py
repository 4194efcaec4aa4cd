"""Hand-assembled CRAM 3.0 archive decoded by the production reader.

No htslib-written CRAM can exist in this offline environment (htslib
and pysam are absent; the reference fetches htslib at build time --
docs/PARITY.md divergence 2b). The strongest available interop evidence
is this fixture: a CRAM 3.0 container assembled BYTE BY BYTE from the
spec with its own independent builders (own ITF-8/LTF-8 writers, own
MSB-first bit packer, own canonical-huffman code assignment), using
layout choices the package's writer (common/cram.py write_cram) NEVER
produces:

  * core-block bit codecs: HUFFMAN (incl. the zero-bit single-symbol
    idiom), BETA for read lengths, GAMMA for AP deltas -- the writer
    encodes every series EXTERNAL;
  * two slices inside one data container (the writer emits one slice
    per container);
  * mapped records reconstructed against an EXTERNAL reference with
    substitution (X/BS via the SM matrix) and deletion (D/DL) features,
    AP stored as deltas;
  * gzip-compressed external blocks mixed with raw blocks;
  * no EOF container (readers must handle plain EOF).

Reference read-input surface this corresponds to:
/root/reference/include/sequence_read/seqread.hpp:94-182 (htslib-backed
CRAM decoding).
"""
import struct
import zlib

from gramtools_tpu.common.cram import iter_cram_reads

# ---------------------------------------------------------------------------
# independent low-level builders (deliberately NOT imported from cram.py)
# ---------------------------------------------------------------------------


def itf8(val: int) -> bytes:
    v = val & 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF, (v >> 8) & 0xFF,
                      v & 0xFF])
    return bytes([0xF0 | (v >> 28), (v >> 24) & 0xFF, (v >> 16) & 0xFF,
                  (v >> 8) & 0xFF, v & 0x0F])


def ltf8(val: int) -> bytes:
    assert 0 <= val < 0x80
    return bytes([val])


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, b in enumerate(self.bits[i:i + 8]):
                byte |= b << (7 - j)
            out.append(byte)
        return bytes(out)


def gamma(w: BitWriter, value: int):
    """Elias gamma of value >= 1: n zeros, a one, low n bits."""
    n = value.bit_length() - 1
    w.write(0, n)
    w.write(1, 1)
    w.write(value & ((1 << n) - 1), n)


def block(method: int, ctype: int, cid: int, data: bytes) -> bytes:
    if method == 1:      # gzip
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        payload = co.compress(data) + co.flush()
    else:                # raw
        payload = data
    out = bytearray([method, ctype]) + itf8(cid) \
        + itf8(len(payload)) + itf8(len(data)) + payload
    out += struct.pack("<I", zlib.crc32(bytes(out)))
    return bytes(out)


def container(blocks, n_records: int, ref_id: int, start: int,
              span: int) -> bytes:
    body = b"".join(blocks)
    head = bytearray()
    head += struct.pack("<i", len(body))
    head += itf8(ref_id) + itf8(start) + itf8(span) + itf8(n_records)
    head += ltf8(0) + ltf8(0)           # counter, bases
    head += itf8(len(blocks))
    head += itf8(0)                     # no landmarks
    head += struct.pack("<I", zlib.crc32(bytes(head)))
    return bytes(head) + body


def enc(codec: int, params: bytes) -> bytes:
    return itf8(codec) + itf8(len(params)) + params


def huffman(alphabet, lengths) -> bytes:
    params = itf8(len(alphabet)) + b"".join(itf8(a) for a in alphabet) \
        + itf8(len(lengths)) + b"".join(itf8(l) for l in lengths)
    return enc(3, params)


def external(cid: int) -> bytes:
    return enc(1, itf8(cid))


def beta(offset: int, nbits: int) -> bytes:
    return enc(6, itf8(offset) + itf8(nbits))


def gamma_enc(offset: int) -> bytes:
    return enc(9, itf8(offset))


def byte_array_stop(stop: int, cid: int) -> bytes:
    return enc(5, bytes([stop]) + itf8(cid))


# ---------------------------------------------------------------------------
# the archive
# ---------------------------------------------------------------------------

REF = "ACGTACGTACGTACGTACGTACGTACGT"          # chr1, 28bp
SM = bytes([0x1B] * 5)                        # codes: others in order 0,1,2,3


def build_archive() -> bytes:
    out = bytearray()
    out += b"CRAM" + bytes([3, 0]) + b"\x00" * 20

    # --- container 1: SAM file header ---------------------------------
    header_text = "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:28\n"
    payload = struct.pack("<i", len(header_text)) + header_text.encode()
    out += container([block(0, 0, 0, payload)], 0, 0, 0, 0)

    # --- compression header -------------------------------------------
    pres = bytearray()
    pres += itf8(4)
    pres += b"RN" + b"\x01" + b"AP" + b"\x01" + b"RR" + b"\x01"
    pres += b"SM" + SM
    series = {
        b"BF": huffman([0, 4], [1, 1]),
        b"CF": huffman([3], [0]),
        b"RL": beta(0, 6),
        b"AP": gamma_enc(1),
        b"RG": huffman([0], [0]),
        b"RN": byte_array_stop(0, 6),
        b"MF": huffman([0], [0]),
        b"NS": huffman([0], [0]),
        b"NP": huffman([0], [0]),
        b"TS": huffman([0], [0]),
        b"TL": huffman([0], [0]),
        b"FN": huffman([1], [0]),
        b"FC": external(15),
        b"FP": external(16),
        b"BS": external(17),
        b"DL": huffman([2], [0]),
        b"MQ": huffman([30], [0]),
        b"BA": external(12),
        b"QS": external(13),
    }
    smap = bytearray()
    smap += itf8(len(series))
    for key, e in series.items():
        smap += key + e
    ch = itf8(len(pres)) + bytes(pres) + itf8(len(smap)) + bytes(smap) \
        + itf8(1) + itf8(0)             # empty tag-encoding map
    ch_block = block(0, 1, 0, ch)

    # --- slice 1: two mapped records against chr1 ---------------------
    w = BitWriter()
    # rec1: BF=0('0'), RL=8, AP delta 0 -> gamma(1), one X feature
    w.write(0, 1)
    w.write(8, 6)
    gamma(w, 1)
    # rec2: BF=0, RL=6, AP delta 3 -> gamma(4), one D feature
    w.write(0, 1)
    w.write(6, 6)
    gamma(w, 4)
    core1 = block(0, 5, 0, w.bytes())
    ext1 = [
        block(1, 4, 6, b"r1\x00r2\x00"),              # RN (gzip)
        block(0, 4, 15, b"XD"),                        # FC
        block(0, 4, 16, itf8(3) + itf8(4)),            # FP deltas
        block(0, 4, 17, bytes([2])),                   # BS code
        block(1, 4, 13, bytes([10] * 8 + [11] * 6)),   # QS (gzip)
    ]
    sh1 = itf8(0) + itf8(5) + itf8(20) + itf8(2) + ltf8(0) \
        + itf8(1 + len(ext1)) + itf8(5) \
        + itf8(6) + itf8(15) + itf8(16) + itf8(17) + itf8(13) \
        + itf8(-1)
    slice1 = [block(0, 2, 0, sh1), core1] + ext1

    # --- slice 2: one unmapped record ---------------------------------
    w = BitWriter()
    w.write(1, 1)       # BF = 4 (huffman code '1')
    w.write(4, 6)       # RL = 4
    gamma(w, 1)         # AP delta 0
    core2 = block(0, 5, 0, w.bytes())
    ext2 = [
        block(0, 4, 6, b"u1\x00"),                     # RN
        block(1, 4, 12, b"GATT"),                      # BA (gzip)
        block(0, 4, 13, bytes([12] * 4)),              # QS
    ]
    sh2 = itf8(-1) + itf8(0) + itf8(0) + itf8(1) + ltf8(0) \
        + itf8(1 + len(ext2)) + itf8(3) \
        + itf8(6) + itf8(12) + itf8(13) + itf8(-1)
    slice2 = [block(0, 2, 0, sh2), core2] + ext2

    blocks = [ch_block] + slice1 + slice2
    out += container(blocks, 3, 0, 5, 20)
    # no EOF container on purpose: plain EOF must terminate iteration
    return bytes(out)


def test_hand_assembled_archive_decodes(tmp_path):
    path = tmp_path / "foreign.cram"
    path.write_bytes(build_archive())
    got = list(iter_cram_reads(path, refs={"chr1": REF}))
    assert got == [
        ("r1", "ACTTACGT", "+" * 8),
        ("r2", "TACACG", "," * 6),
        ("u1", "GATT", "-" * 4),
    ]


def test_archive_needs_reference(tmp_path):
    """RR=1 slices must demand the reference instead of guessing."""
    import pytest

    from gramtools_tpu.common.cram import CramError

    path = tmp_path / "foreign.cram"
    path.write_bytes(build_archive())
    with pytest.raises(CramError):
        list(iter_cram_reads(path))
