"""CRAM 3.0 read input: container parsing, codecs, record decode.

The reference reads CRAM through htslib's codecs behind its kseq-style
iterator (libgramtools include/sequence_read/seq_file.h:94-1002); this
is a from-spec implementation of the decode path needed to iterate
reads (name, sequence, quality) out of a CRAM, plus a minimal writer
used by the round-trip conformance tests and the format-conversion
tool. Spec: CRAM format specification v3.0 (hts-specs).

Supported on read:
  * file definition, containers, blocks (raw / gzip / rANS-4x8 order
    0 and 1), compression header (preservation + data-series + tag
    encoding maps), slice headers;
  * encodings: EXTERNAL, HUFFMAN (canonical, incl. the 0-bit constant
    case), BYTE_ARRAY_STOP, BYTE_ARRAY_LEN, BETA, GAMMA;
  * record decode for mapped and unmapped records: bases from BA or
    from the slice's embedded reference / a supplied reference fasta +
    feature list (substitutions via the substitution matrix,
    insertions, deletions, soft clips, insert-base, ref-skip, padding,
    hard clips), qualities from QS.

Unsupported (clear error): bzip2/lzma blocks decode via the stdlib;
rANS-Nx16/arith/fqzcomp/tok3 (CRAM 3.1) raise NotImplementedError
naming the codec.
"""
from __future__ import annotations

import io
import struct
import zlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

CRAM_MAGIC = b"CRAM"
RANS_BYTE_L = 1 << 23
TOTFREQ = 4096
TF_SHIFT = 12

BLOCK_RAW = 0
BLOCK_GZIP = 1
BLOCK_BZIP2 = 2
BLOCK_LZMA = 3
BLOCK_RANS = 4

CT_FILE_HEADER = 0
CT_COMPRESSION_HEADER = 1
CT_SLICE_HEADER = 2
CT_EXTERNAL = 4
CT_CORE = 5


class CramError(Exception):
    pass


# ---------------------------------------------------------------------------
# varints
# ---------------------------------------------------------------------------


def read_itf8(buf: io.BytesIO) -> int:
    b0 = buf.read(1)
    if not b0:
        raise CramError("EOF in ITF-8")
    b0 = b0[0]
    if b0 < 0x80:
        val = b0
    elif b0 < 0xC0:
        val = ((b0 & 0x3F) << 8) | buf.read(1)[0]
    elif b0 < 0xE0:
        rest = buf.read(2)
        val = ((b0 & 0x1F) << 16) | (rest[0] << 8) | rest[1]
    elif b0 < 0xF0:
        rest = buf.read(3)
        val = ((b0 & 0x0F) << 24) | (rest[0] << 16) | (rest[1] << 8) | rest[2]
    else:
        rest = buf.read(4)
        val = (((b0 & 0x0F) << 28) | (rest[0] << 20) | (rest[1] << 12)
               | (rest[2] << 4) | (rest[3] & 0x0F))
    # ITF-8 carries int32: reinterpret the top bit as sign
    if val >= 1 << 31:
        val -= 1 << 32
    return val


def write_itf8(val: int) -> bytes:
    val &= 0xFFFFFFFF
    if val < 0x80:
        return bytes([val])
    if val < 0x4000:
        return bytes([0x80 | (val >> 8), val & 0xFF])
    if val < 0x200000:
        return bytes([0xC0 | (val >> 16), (val >> 8) & 0xFF, val & 0xFF])
    if val < 0x10000000:
        return bytes([0xE0 | (val >> 24), (val >> 16) & 0xFF,
                      (val >> 8) & 0xFF, val & 0xFF])
    return bytes([0xF0 | ((val >> 28) & 0x0F), (val >> 20) & 0xFF,
                  (val >> 12) & 0xFF, (val >> 4) & 0xFF, val & 0x0F])


def read_ltf8(buf: io.BytesIO) -> int:
    b0 = buf.read(1)[0]
    n_extra = 0
    mask = b0
    while mask & 0x80:
        n_extra += 1
        mask = (mask << 1) & 0xFF
    if n_extra == 0:
        return b0
    rest = buf.read(n_extra)
    if n_extra < 8:
        val = b0 & (0xFF >> (n_extra + 1))
    else:
        val = 0
    for byte in rest:
        val = (val << 8) | byte
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def write_ltf8(val: int) -> bytes:
    val &= (1 << 64) - 1
    if val < 0x80:
        return bytes([val])
    out = []
    n = val
    nbytes = (n.bit_length() + 7) // 8
    # choose smallest prefix that fits
    for n_extra in range(1, 9):
        avail = 8 * n_extra + (7 - n_extra if n_extra < 8 else 0)
        if val < (1 << avail):
            if n_extra < 8:
                prefix = (0xFF << (8 - n_extra)) & 0xFF
                head = prefix | (val >> (8 * n_extra))
                out = [head] + [(val >> (8 * (n_extra - 1 - i))) & 0xFF
                                for i in range(n_extra)]
            else:
                out = [0xFF] + [(val >> (8 * (7 - i))) & 0xFF
                                for i in range(8)]
            return bytes(out)
    raise CramError(f"LTF-8 overflow: {val}")


# ---------------------------------------------------------------------------
# rANS 4x8 (order 0 and 1) — htslib rANS_static.c wire format
# ---------------------------------------------------------------------------


def _read_freq(buf: io.BytesIO) -> int:
    b = buf.read(1)[0]
    if b >= 128:
        return ((b & 127) << 8) | buf.read(1)[0]
    return b


def _write_freq(f: int) -> bytes:
    if f < 128:
        return bytes([f])
    return bytes([128 | (f >> 8), f & 0xFF])


def _read_sym_freqs(buf: io.BytesIO) -> Dict[int, int]:
    """Symbol/frequency table with the +1-run RLE of rANS_static.c."""
    freqs: Dict[int, int] = {}
    rle = 0
    sym = buf.read(1)[0]
    while True:
        freqs[sym] = _read_freq(buf)
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            nxt = buf.read(1)[0]
            if nxt == sym + 1:
                sym = nxt
                rle = buf.read(1)[0]
            else:
                sym = nxt
        if sym == 0 and rle == 0:
            # a 0 symbol terminates unless it was RLE-continued
            break
    return freqs


def _write_sym_freqs(freqs: Dict[int, int]) -> bytes:
    """Inverse of _read_sym_freqs: consecutive symbol runs RLE as
    head, F(head), head+1, n_further, F(head+1), F(head+2), ..."""
    syms = sorted(s for s, f in freqs.items() if f > 0)
    out = bytearray()
    i = 0
    while i < len(syms):
        run = 0
        while (i + run + 1 < len(syms)
               and syms[i + run + 1] == syms[i + run] + 1):
            run += 1
        out.append(syms[i])
        out += _write_freq(freqs[syms[i]])
        if run > 0:
            out.append(syms[i] + 1)   # == head+1: triggers the RLE branch
            out.append(run - 1)       # further consecutive syms after it
            for j in range(1, run + 1):
                out += _write_freq(freqs[syms[i + j]])
        i += run + 1
    out.append(0)
    return bytes(out)


def _normalise_freqs(counts: Dict[int, int], total_target: int
                     ) -> Dict[int, int]:
    tot = sum(counts.values())
    if tot == 0:
        return {}
    norm: Dict[int, int] = {}
    acc = 0
    items = sorted(counts.items())
    for i, (sym, c) in enumerate(items):
        if i == len(items) - 1:
            f = total_target - acc
        else:
            f = max(1, (c * total_target) // tot)
            f = min(f, total_target - acc - (len(items) - 1 - i))
        norm[sym] = f
        acc += f
    assert acc == total_target
    return norm


def rans_compress_o0(data: bytes) -> bytes:
    if not data:
        return b""
    counts: Dict[int, int] = {}
    for b in data:
        counts[b] = counts.get(b, 0) + 1
    freqs = _normalise_freqs(counts, TOTFREQ)
    cum: Dict[int, int] = {}
    acc = 0
    for sym in sorted(freqs):
        cum[sym] = acc
        acc += freqs[sym]

    states = [RANS_BYTE_L] * 4
    out_rev = bytearray()
    # encode back to front; stream j owns positions i with i % 4 == j
    for i in range(len(data) - 1, -1, -1):
        j = i & 3
        sym = data[i]
        f, c = freqs[sym], cum[sym]
        x = states[j]
        x_max = ((RANS_BYTE_L >> TF_SHIFT) << 8) * f
        while x >= x_max:
            out_rev.append(x & 0xFF)
            x >>= 8
        states[j] = ((x // f) << TF_SHIFT) + (x % f) + c
    head = bytearray()
    for j in range(4):
        head += struct.pack("<I", states[j])
    payload = _write_sym_freqs(freqs) + bytes(head) + bytes(out_rev[::-1])
    return (b"\x00" + struct.pack("<I", len(payload))
            + struct.pack("<I", len(data)) + payload)


def rans_compress_o1(data: bytes) -> bytes:
    if len(data) < 4:
        return rans_compress_o0(data)
    n = len(data)
    isz4 = n >> 2
    # context counts: stream j encodes data[j*isz4:(j+1)*isz4]; the tail
    # belongs to stream 3. Context = previous byte within the stream
    # (0 at stream start).
    counts: Dict[int, Dict[int, int]] = {}

    def bump(ctx, sym):
        counts.setdefault(ctx, {})[sym] = counts.get(ctx, {}).get(sym, 0) + 1

    starts = [0, isz4, 2 * isz4, 3 * isz4]
    ends = [isz4, 2 * isz4, 3 * isz4, n]
    for j in range(4):
        prev = 0
        for i in range(starts[j], ends[j]):
            bump(prev, data[i])
            prev = data[i]
    tables = {ctx: _normalise_freqs(c, TOTFREQ) for ctx, c in counts.items()}
    cums = {}
    for ctx, freqs in tables.items():
        cum, acc = {}, 0
        for sym in sorted(freqs):
            cum[sym] = acc
            acc += freqs[sym]
        cums[ctx] = cum

    states = [RANS_BYTE_L] * 4
    out_rev = bytearray()
    # encode streams interleaved back-to-front by position-within-stream
    max_len = max(ends[j] - starts[j] for j in range(4))
    for pos in range(max_len - 1, -1, -1):
        for j in range(3, -1, -1):
            i = starts[j] + pos
            if i >= ends[j]:
                continue
            sym = data[i]
            ctx = data[i - 1] if i > starts[j] else 0
            f = tables[ctx][sym]
            c = cums[ctx][sym]
            x = states[j]
            x_max = ((RANS_BYTE_L >> TF_SHIFT) << 8) * f
            while x >= x_max:
                out_rev.append(x & 0xFF)
                x >>= 8
            states[j] = ((x // f) << TF_SHIFT) + (x % f) + c

    # frequency tables: outer symbol = context, with same RLE scheme
    ftab = bytearray()
    ctxs = sorted(tables)
    i = 0
    while i < len(ctxs):
        run = 0
        while (i + run + 1 < len(ctxs)
               and ctxs[i + run + 1] == ctxs[i + run] + 1):
            run += 1
        ftab.append(ctxs[i])
        ftab += _write_sym_freqs(tables[ctxs[i]])
        if run > 0:
            ftab.append(ctxs[i] + 1)
            ftab.append(run - 1)
            for j in range(1, run + 1):
                ftab += _write_sym_freqs(tables[ctxs[i + j]])
        i += run + 1
    ftab.append(0)

    head = bytearray()
    for j in range(4):
        head += struct.pack("<I", states[j])
    payload = bytes(ftab) + bytes(head) + bytes(out_rev[::-1])
    return (b"\x01" + struct.pack("<I", len(payload))
            + struct.pack("<I", n) + payload)


def _build_lookup(freqs: Dict[int, int]):
    """(cum dict, symbol-at-slot array of size TOTFREQ)."""
    cum: Dict[int, int] = {}
    slot = bytearray(TOTFREQ)
    acc = 0
    for sym in sorted(freqs):
        f = freqs[sym]
        cum[sym] = acc
        for k in range(acc, acc + f):
            slot[k] = sym
        acc += f
    if acc > TOTFREQ:
        raise CramError("rANS frequency table sum exceeds 4096")
    return cum, bytes(slot)


def rans_decompress(data: bytes) -> bytes:
    order = data[0]
    out_sz = struct.unpack("<I", data[5:9])[0]
    buf = io.BytesIO(data[9:])
    if order == 0:
        freqs = _read_sym_freqs(buf)
        cum, slot = _build_lookup(freqs)
        states = [struct.unpack("<I", buf.read(4))[0] for _ in range(4)]
        rest = buf.read()
        pos = 0
        out = bytearray(out_sz)
        for i in range(out_sz):
            j = i & 3
            x = states[j]
            m = x & (TOTFREQ - 1)
            sym = slot[m]
            out[i] = sym
            x = freqs[sym] * (x >> TF_SHIFT) + m - cum[sym]
            while x < RANS_BYTE_L and pos < len(rest):
                x = (x << 8) | rest[pos]
                pos += 1
            states[j] = x
        return bytes(out)
    if order == 1:
        tables: Dict[int, Dict[int, int]] = {}
        rle = 0
        ctx = buf.read(1)[0]
        while True:
            tables[ctx] = _read_sym_freqs(buf)
            if rle > 0:
                rle -= 1
                ctx += 1
            else:
                nxt = buf.read(1)[0]
                if nxt == ctx + 1:
                    ctx = nxt
                    rle = buf.read(1)[0]
                else:
                    ctx = nxt
            if ctx == 0 and rle == 0:
                break
        lookups = {c: _build_lookup(f) for c, f in tables.items()}
        states = [struct.unpack("<I", buf.read(4))[0] for _ in range(4)]
        rest = buf.read()
        pos = 0
        out = bytearray(out_sz)
        isz4 = out_sz >> 2
        starts = [0, isz4, 2 * isz4, 3 * isz4]
        ends = [isz4, 2 * isz4, 3 * isz4, out_sz]
        last = [0, 0, 0, 0]
        max_len = max(ends[j] - starts[j] for j in range(4))
        for p in range(max_len):
            for j in range(4):
                i = starts[j] + p
                if i >= ends[j]:
                    continue
                ctx = last[j]
                freqs = tables[ctx]
                cum, slot = lookups[ctx]
                x = states[j]
                m = x & (TOTFREQ - 1)
                sym = slot[m]
                out[i] = sym
                x = freqs[sym] * (x >> TF_SHIFT) + m - cum[sym]
                while x < RANS_BYTE_L and pos < len(rest):
                    x = (x << 8) | rest[pos]
                    pos += 1
                states[j] = x
                last[j] = sym
        return bytes(out)
    raise CramError(f"unknown rANS order {order}")


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


@dataclass
class Block:
    method: int
    content_type: int
    content_id: int
    data: bytes  # uncompressed


def read_block(buf: io.BytesIO) -> Block:
    method = buf.read(1)[0]
    ctype = buf.read(1)[0]
    cid = read_itf8(buf)
    comp_size = read_itf8(buf)
    raw_size = read_itf8(buf)
    payload = buf.read(comp_size)
    buf.read(4)  # crc32
    if method == BLOCK_RAW:
        data = payload
    elif method == BLOCK_GZIP:
        data = zlib.decompress(payload, wbits=31)
    elif method == BLOCK_BZIP2:
        import bz2
        data = bz2.decompress(payload)
    elif method == BLOCK_LZMA:
        import lzma
        data = lzma.decompress(payload)
    elif method == BLOCK_RANS:
        data = rans_decompress(payload)
    else:
        raise NotImplementedError(
            f"CRAM block compression method {method} (rANS-Nx16/arith/"
            "fqzcomp/tok3 are CRAM 3.1; this reader speaks CRAM 3.0)")
    if len(data) != raw_size:
        raise CramError(f"block size mismatch: {len(data)} != {raw_size}")
    return Block(method, ctype, cid, data)


def write_block(method: int, ctype: int, cid: int, data: bytes) -> bytes:
    if method == BLOCK_GZIP:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        payload = co.compress(data) + co.flush()
    elif method == BLOCK_RANS:
        payload = rans_compress_o0(data) if data else b""
        if not data:
            method = BLOCK_RAW
            payload = b""
    elif method == BLOCK_RAW:
        payload = data
    else:
        raise CramError(f"writer does not emit method {method}")
    out = bytearray()
    out.append(method)
    out.append(ctype)
    out += write_itf8(cid)
    out += write_itf8(len(payload))
    out += write_itf8(len(data))
    out += payload
    out += struct.pack("<I", zlib.crc32(bytes(out)))
    return bytes(out)


# ---------------------------------------------------------------------------
# encodings
# ---------------------------------------------------------------------------

ENC_NULL = 0
ENC_EXTERNAL = 1
ENC_HUFFMAN = 3
ENC_BYTE_ARRAY_LEN = 4
ENC_BYTE_ARRAY_STOP = 5
ENC_BETA = 6
ENC_SUBEXP = 7
ENC_GAMMA = 9


class _BitReader:
    """MSB-first bit reader over the core block."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bits(self, n: int) -> int:
        val = 0
        for _ in range(n):
            byte = self.data[self.pos]
            val = (val << 1) | ((byte >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return val


@dataclass
class Encoding:
    codec: int
    params: bytes

    def parse(self):
        buf = io.BytesIO(self.params)
        if self.codec == ENC_EXTERNAL:
            return (read_itf8(buf),)
        if self.codec == ENC_HUFFMAN:
            n = read_itf8(buf)
            alphabet = [read_itf8(buf) for _ in range(n)]
            n2 = read_itf8(buf)
            lengths = [read_itf8(buf) for _ in range(n2)]
            return alphabet, lengths
        if self.codec == ENC_BYTE_ARRAY_LEN:
            len_codec = read_itf8(buf)
            len_params = buf.read(read_itf8(buf))
            val_codec = read_itf8(buf)
            val_params = buf.read(read_itf8(buf))
            return Encoding(len_codec, len_params), Encoding(val_codec,
                                                             val_params)
        if self.codec == ENC_BYTE_ARRAY_STOP:
            stop = buf.read(1)[0]
            return stop, read_itf8(buf)
        if self.codec == ENC_BETA:
            return read_itf8(buf), read_itf8(buf)
        if self.codec == ENC_GAMMA:
            return (read_itf8(buf),)
        if self.codec == ENC_NULL:
            return ()
        raise NotImplementedError(f"CRAM encoding codec {self.codec}")


def read_encoding(buf: io.BytesIO) -> Encoding:
    codec = read_itf8(buf)
    n = read_itf8(buf)
    return Encoding(codec, buf.read(n))


def write_encoding(codec: int, params: bytes) -> bytes:
    return write_itf8(codec) + write_itf8(len(params)) + params


class Decoder:
    """Decodes one data series through its encoding."""

    def __init__(self, enc: Encoding, external: Dict[int, io.BytesIO],
                 core: _BitReader):
        self.enc = enc
        self.external = external
        self.core = core
        self.parsed = enc.parse()
        if enc.codec == ENC_HUFFMAN:
            alphabet, lengths = self.parsed
            self._huff = _canonical_huffman(alphabet, lengths)

    def _ext(self, cid) -> io.BytesIO:
        try:
            return self.external[cid]
        except KeyError:
            raise CramError(f"missing external block {cid}")

    def read_int(self) -> int:
        c = self.enc.codec
        if c == ENC_EXTERNAL:
            return read_itf8(self._ext(self.parsed[0]))
        if c == ENC_HUFFMAN:
            return self._read_huffman()
        if c == ENC_BETA:
            offset, nbits = self.parsed
            return self.core.read_bits(nbits) - offset
        if c == ENC_GAMMA:
            (offset,) = self.parsed
            n = 0
            while self.core.read_bits(1) == 0:
                n += 1
            val = 1
            for _ in range(n):
                val = (val << 1) | self.core.read_bits(1)
            return val - offset
        raise NotImplementedError(f"int decode for codec {c}")

    def read_byte(self) -> int:
        c = self.enc.codec
        if c == ENC_EXTERNAL:
            b = self._ext(self.parsed[0]).read(1)
            if not b:
                raise CramError("external block exhausted")
            return b[0]
        return self.read_int()

    def read_bytes(self) -> bytes:
        c = self.enc.codec
        if c == ENC_BYTE_ARRAY_STOP:
            stop, cid = self.parsed
            src = self._ext(cid)
            out = bytearray()
            while True:
                b = src.read(1)
                if not b:
                    raise CramError("unterminated BYTE_ARRAY_STOP")
                if b[0] == stop:
                    return bytes(out)
                out.append(b[0])
        if c == ENC_BYTE_ARRAY_LEN:
            len_enc, val_enc = self.parsed
            n = Decoder(len_enc, self.external, self.core).read_int()
            return Decoder(val_enc, self.external,
                           self.core).read_bytes_fixed(n)
        raise NotImplementedError(f"byte[] decode for codec {c}")

    def read_bytes_fixed(self, n: int) -> bytes:
        c = self.enc.codec
        if c == ENC_EXTERNAL:
            data = self._ext(self.parsed[0]).read(n)
            if len(data) != n:
                raise CramError("external block exhausted")
            return data
        return bytes(self.read_byte() for _ in range(n))

    def _read_huffman(self) -> int:
        codes = self._huff
        if codes is None:  # single-symbol alphabet: zero bits
            alphabet, _ = self.parsed
            return alphabet[0]
        code, length = 0, 0
        while True:
            code = (code << 1) | self.core.read_bits(1)
            length += 1
            sym = codes.get((length, code))
            if sym is not None:
                return sym
            if length > 32:
                raise CramError("bad canonical huffman stream")


def _canonical_huffman(alphabet, lengths):
    if all(l == 0 for l in lengths):
        return None
    # canonical code assignment: sort by (length, symbol)
    pairs = sorted(zip(lengths, alphabet))
    codes = {}
    code = 0
    prev_len = pairs[0][0]
    for length, sym in pairs:
        code <<= (length - prev_len)
        codes[(length, code)] = sym
        code += 1
        prev_len = length
    return codes


# ---------------------------------------------------------------------------
# compression header / slice header
# ---------------------------------------------------------------------------


@dataclass
class CompressionHeader:
    rn: bool = True            # read names preserved
    ap_delta: bool = True      # AP stored as delta
    rr: bool = True            # reference required
    sub_matrix: bytes = b"\x00" * 5
    tag_dict: List[List[Tuple[bytes, int]]] = field(default_factory=list)
    data_series: Dict[bytes, Encoding] = field(default_factory=dict)
    tag_encodings: Dict[int, Encoding] = field(default_factory=dict)


def parse_compression_header(data: bytes) -> CompressionHeader:
    buf = io.BytesIO(data)
    ch = CompressionHeader()
    read_itf8(buf)  # preservation map byte size
    n = read_itf8(buf)
    for _ in range(n):
        key = buf.read(2)
        if key == b"RN":
            ch.rn = buf.read(1)[0] != 0
        elif key == b"AP":
            ch.ap_delta = buf.read(1)[0] != 0
        elif key == b"RR":
            ch.rr = buf.read(1)[0] != 0
        elif key == b"SM":
            ch.sub_matrix = buf.read(5)
        elif key == b"TD":
            blob = buf.read(read_itf8(buf))
            ch.tag_dict = _parse_tag_dict(blob)
        else:
            raise CramError(f"unknown preservation key {key!r}")
    read_itf8(buf)  # data series map byte size
    n = read_itf8(buf)
    for _ in range(n):
        key = bytes(buf.read(2))
        ch.data_series[key] = read_encoding(buf)
    read_itf8(buf)  # tag encoding map byte size
    n = read_itf8(buf)
    for _ in range(n):
        key = read_itf8(buf)
        ch.tag_encodings[key] = read_encoding(buf)
    return ch


def _parse_tag_dict(blob: bytes) -> List[List[Tuple[bytes, int]]]:
    out: List[List[Tuple[bytes, int]]] = []
    cur: List[Tuple[bytes, int]] = []
    i = 0
    while i < len(blob):
        if blob[i] == 0:
            out.append(cur)
            cur = []
            i += 1
        else:
            cur.append((blob[i : i + 2], blob[i + 2]))
            i += 3
    return out


@dataclass
class SliceHeader:
    ref_id: int
    start: int
    span: int
    n_records: int
    counter: int
    n_blocks: int
    content_ids: List[int]
    embedded_ref_id: int


def parse_slice_header(data: bytes) -> SliceHeader:
    buf = io.BytesIO(data)
    ref_id = read_itf8(buf)
    start = read_itf8(buf)
    span = read_itf8(buf)
    n_records = read_itf8(buf)
    counter = read_ltf8(buf)
    n_blocks = read_itf8(buf)
    n_ids = read_itf8(buf)
    content_ids = [read_itf8(buf) for _ in range(n_ids)]
    embedded = read_itf8(buf)
    return SliceHeader(ref_id, start, span, n_records, counter, n_blocks,
                       content_ids, embedded)


# ---------------------------------------------------------------------------
# container iteration + record decode
# ---------------------------------------------------------------------------

_BASES = "ACGTN"


def _substitute(sub_matrix: bytes, ref_base: str, code: int) -> str:
    r = _BASES.index(ref_base.upper() if ref_base.upper() in _BASES else "N")
    byte = sub_matrix[r]
    others = [b for b in _BASES if b != _BASES[r]]
    for idx, b in enumerate(others):
        if (byte >> (6 - 2 * idx)) & 3 == code:
            return b
    return "N"


def _decode_records(ch: CompressionHeader, sh: SliceHeader,
                    external: Dict[int, io.BytesIO], core: _BitReader,
                    refs: Optional[Dict[int, str]],
                    embedded_ref: Optional[bytes]):
    dec: Dict[bytes, Decoder] = {}

    def D(key: bytes) -> Decoder:
        d = dec.get(key)
        if d is None:
            enc = ch.data_series.get(key)
            if enc is None:
                raise CramError(f"missing data series encoding {key!r}")
            d = dec[key] = Decoder(enc, external, core)
        return d

    out = []
    last_pos = sh.start
    for _ in range(sh.n_records):
        bf = D(b"BF").read_int()
        cf = D(b"CF").read_int()
        ref_id = sh.ref_id
        if sh.ref_id == -2:
            ref_id = D(b"RI").read_int()
        rl = D(b"RL").read_int()
        if ch.ap_delta:
            ap = last_pos + D(b"AP").read_int()
            last_pos = ap
        else:
            ap = D(b"AP").read_int()
        D(b"RG").read_int()
        name = b""
        if ch.rn:
            name = D(b"RN").read_bytes()
        if cf & 2:  # detached
            D(b"MF").read_int()
            if not ch.rn:
                name = D(b"RN").read_bytes()
            D(b"NS").read_int()
            D(b"NP").read_int()
            D(b"TS").read_int()
        elif cf & 4:  # mate downstream
            D(b"NF").read_int()
        tl = D(b"TL").read_int()
        if ch.tag_dict and 0 <= tl < len(ch.tag_dict):
            for tag, ttype in ch.tag_dict[tl]:
                key = (tag[0] << 16) | (tag[1] << 8) | ttype
                enc = ch.tag_encodings.get(key)
                if enc is None:
                    raise CramError(f"missing tag encoding {tag!r}")
                Decoder(enc, external, core).read_bytes()

        unmapped = bf & 4
        seq = None
        if not unmapped:
            fn = D(b"FN").read_int()
            features = []
            fpos = 0
            for _ in range(fn):
                fc = chr(D(b"FC").read_byte())
                fpos += D(b"FP").read_int()
                if fc == "X":
                    features.append((fpos, fc, D(b"BS").read_byte()))
                elif fc == "I":
                    features.append((fpos, fc, D(b"IN").read_bytes()))
                elif fc == "S":
                    features.append((fpos, fc, D(b"SC").read_bytes()))
                elif fc == "D":
                    features.append((fpos, fc, D(b"DL").read_int()))
                elif fc == "i":
                    features.append((fpos, fc, D(b"BA").read_byte()))
                elif fc == "N":
                    features.append((fpos, fc, D(b"RS").read_int()))
                elif fc == "P":
                    features.append((fpos, fc, D(b"PD").read_int()))
                elif fc == "H":
                    features.append((fpos, fc, D(b"HC").read_int()))
                elif fc == "B":
                    features.append((fpos, fc, (D(b"BA").read_byte(),
                                                D(b"QS").read_byte())))
                elif fc == "b":
                    features.append((fpos, fc, D(b"BB").read_bytes()))
                elif fc == "q":
                    features.append((fpos, fc, D(b"QQ").read_bytes()))
                elif fc == "Q":
                    features.append((fpos, fc, D(b"QS").read_byte()))
                else:
                    raise CramError(f"unknown feature code {fc!r}")
            D(b"MQ").read_int()
            seq = _reconstruct_sequence(ch, sh, ref_id, ap, rl, features,
                                        refs, embedded_ref)
        else:
            seq = D(b"BA").read_bytes_fixed(rl).decode("ascii")
        qual = ""
        if cf & 1:
            qual = "".join(chr(q + 33)
                           for q in D(b"QS").read_bytes_fixed(rl))
        out.append((name.decode("ascii", "replace"), seq, qual))
    return out


def _reconstruct_sequence(ch, sh, ref_id, ap, rl, features, refs,
                          embedded_ref) -> str:
    ref = None
    ref_offset = 0
    if embedded_ref is not None:
        ref = embedded_ref.decode("ascii")
        ref_offset = sh.start
    elif refs is not None and ref_id in refs:
        ref = refs[ref_id]
        ref_offset = 1
    elif ch.rr:
        raise CramError(
            "CRAM slice needs the reference sequence to reconstruct mapped "
            "reads: pass the reference fasta (reads_ref) or re-encode with "
            "embedded reference")
    seq = ["N"] * rl
    rpos = 0        # position in read
    ref_cursor = ap  # 1-based reference coordinate

    def fill_from_ref(until_read_pos):
        nonlocal rpos, ref_cursor
        while rpos < until_read_pos and rpos < rl:
            if ref is not None:
                k = ref_cursor - ref_offset
                seq[rpos] = ref[k] if 0 <= k < len(ref) else "N"
            rpos += 1
            ref_cursor += 1

    for fpos, fc, operand in features:
        fill_from_ref(fpos - 1)
        if fc == "X":
            if ref is not None:
                k = ref_cursor - ref_offset
                rb = ref[k] if 0 <= k < len(ref) else "N"
            else:
                rb = "N"
            seq[rpos] = _substitute(ch.sub_matrix, rb, operand)
            rpos += 1
            ref_cursor += 1
        elif fc in ("I", "S"):
            for b in operand.decode("ascii"):
                if rpos < rl:
                    seq[rpos] = b
                    rpos += 1
        elif fc == "D":
            ref_cursor += operand
        elif fc == "i":
            seq[rpos] = chr(operand)
            rpos += 1
        elif fc == "N":
            ref_cursor += operand
        elif fc == "P":
            pass
        elif fc == "H":
            pass
        elif fc == "B":
            seq[rpos] = chr(operand[0])
            rpos += 1
            ref_cursor += 1
        elif fc == "b":
            for b in operand.decode("ascii"):
                seq[rpos] = b
                rpos += 1
                ref_cursor += 1
        elif fc in ("q", "Q"):
            pass
    fill_from_ref(rl)
    return "".join(seq)


def iter_cram_reads(path, refs: Optional[Dict[str, str]] = None):
    """Yields (name, sequence, quality) per record of a CRAM 3.0 file.

    refs: optional {sequence_name: bases} for reference-based slices
    (the htslib REF_PATH analogue); slices with embedded references or
    unmapped records need none.
    """
    with open(path, "rb") as fh:
        data = fh.read()
    buf = io.BytesIO(data)
    magic = buf.read(4)
    if magic != CRAM_MAGIC:
        raise CramError("not a CRAM file")
    major, minor = buf.read(1)[0], buf.read(1)[0]
    if major != 3:
        raise NotImplementedError(f"CRAM version {major}.{minor}; this "
                                  "reader speaks CRAM 3.0")
    buf.read(20)  # file id

    sam_refs: List[str] = []
    ref_map: Dict[int, str] = {}
    first = True
    while True:
        header = _read_container_header(buf)
        if header is None:
            break
        length, n_blocks = header
        end = buf.tell() + length
        if first:
            block = read_block(buf)
            sam_refs = _sam_header_ref_names(block.data)
            if refs:
                for i, rname in enumerate(sam_refs):
                    if rname in refs:
                        ref_map[i] = refs[rname]
            buf.seek(end)
            first = False
            continue
        blocks = [read_block(buf) for _ in range(n_blocks)]
        buf.seek(end)
        if not blocks:
            continue
        if blocks[0].content_type != CT_COMPRESSION_HEADER:
            continue  # EOF container
        ch = parse_compression_header(blocks[0].data)
        i = 1
        while i < len(blocks):
            if blocks[i].content_type != CT_SLICE_HEADER:
                i += 1
                continue
            sh = parse_slice_header(blocks[i].data)
            slice_blocks = blocks[i + 1 : i + 1 + sh.n_blocks]
            i += 1 + sh.n_blocks
            core = _BitReader(b"")
            external: Dict[int, io.BytesIO] = {}
            embedded_ref = None
            for b in slice_blocks:
                if b.content_type == CT_CORE:
                    core = _BitReader(b.data)
                elif b.content_type == CT_EXTERNAL:
                    external[b.content_id] = io.BytesIO(b.data)
            if sh.embedded_ref_id >= 0:
                for b in slice_blocks:
                    if b.content_id == sh.embedded_ref_id:
                        embedded_ref = b.data
            for rec in _decode_records(ch, sh, external, core, ref_map,
                                       embedded_ref):
                yield rec


def _read_container_header(buf: io.BytesIO):
    head = buf.read(4)
    if len(head) < 4:
        return None
    length = struct.unpack("<i", head)[0]
    read_itf8(buf)   # ref seq id
    read_itf8(buf)   # start
    read_itf8(buf)   # span
    n_records = read_itf8(buf)
    read_ltf8(buf)   # record counter
    read_ltf8(buf)   # bases
    n_blocks = read_itf8(buf)
    n_landmarks = read_itf8(buf)
    for _ in range(n_landmarks):
        read_itf8(buf)
    buf.read(4)      # crc
    if length == 15 and n_records == 0 and n_blocks == 1:
        # might be the EOF container; let the caller parse its block
        pass
    return length, n_blocks


def _sam_header_ref_names(data: bytes) -> List[str]:
    # file header block: i32 text length then SAM text
    if len(data) >= 4:
        n = struct.unpack("<i", data[:4])[0]
        text = data[4 : 4 + n].decode("ascii", "replace")
    else:
        text = ""
    names = []
    for line in text.splitlines():
        if line.startswith("@SQ"):
            for fld in line.split("\t"):
                if fld.startswith("SN:"):
                    names.append(fld[3:])
    return names


# ---------------------------------------------------------------------------
# writer (round-trip conformance tests + format conversion tool)
# ---------------------------------------------------------------------------


def _enc_external(cid: int) -> bytes:
    return write_encoding(ENC_EXTERNAL, write_itf8(cid))


def _enc_byte_array_stop(stop: int, cid: int) -> bytes:
    return write_encoding(ENC_BYTE_ARRAY_STOP, bytes([stop]) + write_itf8(cid))


def _enc_byte_array_len(len_cid: int, val_cid: int) -> bytes:
    inner = (write_itf8(ENC_EXTERNAL) + write_itf8(len(write_itf8(len_cid)))
             + write_itf8(len_cid)
             + write_itf8(ENC_EXTERNAL) + write_itf8(len(write_itf8(val_cid)))
             + write_itf8(val_cid))
    return write_encoding(ENC_BYTE_ARRAY_LEN, inner)


# external block content ids used by the writer
_CID = {b"BF": 1, b"CF": 2, b"RL": 3, b"AP": 4, b"RG": 5, b"RN": 6,
        b"MF": 7, b"NS": 8, b"NP": 9, b"TS": 10, b"TL": 11, b"BA": 12,
        b"QS": 13, b"FN": 14, b"FC": 15, b"FP": 16, b"BS": 17, b"DL": 18,
        b"IN": 19, b"IN_len": 20, b"MQ": 21, b"SC": 22, b"SC_len": 23}
_EMBED_REF_CID = 99


def _container(blocks: List[bytes], n_records: int, ref_id: int = -1,
               start: int = 0, span: int = 0, counter: int = 0) -> bytes:
    body = b"".join(blocks)
    out = bytearray()
    out += struct.pack("<i", len(body))
    out += write_itf8(ref_id)
    out += write_itf8(start)
    out += write_itf8(span)
    out += write_itf8(n_records)
    out += write_ltf8(counter)
    out += write_ltf8(0)  # bases
    out += write_itf8(len(blocks))
    # landmarks: offset of each block in body (only slice starts matter
    # to indexers; emit all)
    offsets = []
    off = 0
    for b in blocks:
        offsets.append(off)
        off += len(b)
    out += write_itf8(len(offsets))
    for o in offsets:
        out += write_itf8(o)
    out += struct.pack("<I", zlib.crc32(bytes(out)))
    return bytes(out) + body


def write_cram(path, reads, sam_refs: Optional[List[Tuple[str, int]]] = None,
               mapped: Optional[List[Tuple[int, int, List]]] = None,
               embed_ref: Optional[str] = None, method: int = BLOCK_RANS,
               records_per_slice: int = 1000):
    """Write a CRAM 3.0 file.

    reads: list of (name, sequence, quality_string).
    mapped: optional per-read (ref_id, 1-based position, features) --
    records become reference-based (needs embed_ref or an external
    reference at read time); features use the decode operand types.
    Unmapped records (mapped=None) carry their bases verbatim (BA).
    """
    sam_refs = sam_refs or []
    header_text = "@HD\tVN:1.6\n" + "".join(
        f"@SQ\tSN:{name}\tLN:{ln}\n" for name, ln in sam_refs)
    header_payload = struct.pack("<i", len(header_text)) \
        + header_text.encode()
    header_block = write_block(BLOCK_RAW, CT_FILE_HEADER, 0, header_payload)

    out = bytearray()
    out += CRAM_MAGIC + bytes([3, 0]) + b"\x00" * 20
    out += _container([header_block], 0)

    for s0 in range(0, len(reads), records_per_slice):
        chunk = reads[s0 : s0 + records_per_slice]
        mchunk = mapped[s0 : s0 + records_per_slice] if mapped else None
        out += _write_data_container(chunk, mchunk, embed_ref, method)

    # EOF container (spec-defined special container)
    eof_block = write_block(BLOCK_RAW, CT_COMPRESSION_HEADER, 0,
                            write_itf8(0) * 2 + write_itf8(0) * 2
                            + write_itf8(0) * 2)
    out += _container([eof_block], 0, ref_id=-1, start=4542278)
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def _write_data_container(reads, mapped, embed_ref, method) -> bytes:
    streams: Dict[int, bytearray] = {cid: bytearray()
                                     for cid in _CID.values()}

    def put_int(key: bytes, val: int):
        streams[_CID[key]] += write_itf8(val)

    def put_byte(key: bytes, val: int):
        streams[_CID[key]].append(val)

    def put_bytes(key: bytes, val: bytes):
        streams[_CID[key]] += val

    min_start, max_end = None, 0
    for i, (name, seq, qual) in enumerate(reads):
        m = mapped[i] if mapped else None
        bf = 4 if m is None else 0
        put_int(b"BF", bf)
        put_int(b"CF", (1 if qual else 0) | 2)   # QS stored; detached
        put_int(b"RL", len(seq))
        ap = m[1] if m else 0
        put_int(b"AP", ap)
        if m:
            min_start = ap if min_start is None else min(min_start, ap)
            max_end = max(max_end, ap + len(seq))
        put_int(b"RG", -1)
        put_bytes(b"RN", name.encode() + b"\x00")
        put_int(b"MF", 0)
        put_int(b"NS", -1)
        put_int(b"NP", 0)
        put_int(b"TS", 0)
        put_int(b"TL", 0)
        if m is None:
            put_bytes(b"BA", seq.encode())
        else:
            _, _, features = m
            put_int(b"FN", len(features))
            prev = 0
            for fpos, fc, operand in features:
                put_byte(b"FC", ord(fc))
                put_int(b"FP", fpos - prev)
                prev = fpos
                if fc == "X":
                    put_byte(b"BS", operand)
                elif fc == "I":
                    put_int(b"IN_len", len(operand))
                    put_bytes(b"IN", operand)
                elif fc == "S":
                    put_int(b"SC_len", len(operand))
                    put_bytes(b"SC", operand)
                elif fc == "D":
                    put_int(b"DL", operand)
                else:
                    raise CramError(f"writer: unsupported feature {fc!r}")
            put_int(b"MQ", 60)
        if qual:
            put_bytes(b"QS", bytes(ord(q) - 33 for q in qual))

    # compression header
    pres = bytearray()
    entries = [(b"RN", b"\x01"), (b"AP", b"\x00"),
               (b"RR", b"\x01" if (mapped and embed_ref is None) else b"\x00"),
               (b"SM", bytes(range(5)) if False else
                bytes([0x1B, 0x1B, 0x1B, 0x1B, 0x1B])),
               (b"TD", write_itf8(1) + b"\x00")]
    pres += write_itf8(len(entries))
    for k, v in entries:
        pres += k + v
    pres = write_itf8(len(pres)) + pres

    ds = bytearray()
    series: List[Tuple[bytes, bytes]] = []
    for key in (b"BF", b"CF", b"RL", b"AP", b"RG", b"MF", b"NS", b"NP",
                b"TS", b"TL", b"BA", b"QS", b"FN", b"FC", b"FP", b"BS",
                b"DL", b"MQ"):
        series.append((key, _enc_external(_CID[key])))
    series.append((b"RN", _enc_byte_array_stop(0, _CID[b"RN"])))
    series.append((b"IN", _enc_byte_array_len(_CID[b"IN_len"], _CID[b"IN"])))
    series.append((b"SC", _enc_byte_array_len(_CID[b"SC_len"], _CID[b"SC"])))
    ds += write_itf8(len(series))
    for k, enc in series:
        ds += k + enc
    ds = write_itf8(len(ds)) + ds

    tags = write_itf8(0)                 # no tag encodings
    tags = write_itf8(len(tags)) + tags

    ch_block = write_block(method if method != BLOCK_RANS else BLOCK_GZIP,
                           CT_COMPRESSION_HEADER, 0,
                           bytes(pres + ds + tags))

    # slice
    used = [cid for cid in sorted(streams) if streams[cid]]
    sl_ref_id = mapped[0][0] if mapped else -1
    sl_start = min_start or 0
    sl_span = (max_end - sl_start) if mapped else 0
    content_ids = list(used)
    embed_id = -1
    ext_blocks = []
    if embed_ref is not None and mapped:
        embed_id = _EMBED_REF_CID
        content_ids.append(embed_id)
        ref_slice = embed_ref[sl_start - 1 : sl_start - 1 + sl_span]
        ext_blocks.append(write_block(BLOCK_GZIP, CT_EXTERNAL, embed_id,
                                      ref_slice.encode()))
    sh = bytearray()
    sh += write_itf8(sl_ref_id)
    sh += write_itf8(sl_start)
    sh += write_itf8(sl_span)
    sh += write_itf8(len(reads))
    sh += write_ltf8(0)
    sh += write_itf8(1 + len(content_ids))   # core + externals
    sh += write_itf8(len(content_ids))
    for cid in content_ids:
        sh += write_itf8(cid)
    sh += write_itf8(embed_id)
    sh += b"\x00" * 16  # md5
    slice_blocks = [write_block(BLOCK_RAW, CT_SLICE_HEADER, 0, bytes(sh)),
                    write_block(BLOCK_RAW, CT_CORE, 0, b"")]
    for cid in used:
        slice_blocks.append(write_block(method, CT_EXTERNAL, cid,
                                        bytes(streams[cid])))
    slice_blocks += ext_blocks

    blocks = [ch_block] + slice_blocks
    return _container(blocks, len(reads), ref_id=sl_ref_id, start=sl_start,
                      span=sl_span)
