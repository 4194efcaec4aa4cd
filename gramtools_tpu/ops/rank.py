"""Bit-packed BWT rank: Pallas popcount kernel over interleaved blocks.

TPU-first replacement for the dense occ prefix table (index/fm.py) on
the hot LF-mapping gather, and the TPU equivalent of the reference's
bit-packed rank_v bitmasks (libgramtools/src/prg/make_data_structures.cpp:113-163).

Layout -- one uint32[24] record (96 bytes) per 128 BWT symbols:

  words[0:4]   Occ checkpoint: #A,#C,#G,#T in bwt[0 : 128*blk]
  word[4]      marker checkpoint: #markers in bwt[0 : 128*blk]
  words[5:8]   reserved (0)
  words[8:24]  128 4-bit symbol codes, nibble j of word 8+w = code of
               bwt[128*blk + 8*w + j]; code 0 = sentinel/pad, 1-4 = DNA,
               5 = marker

rank(c, i) = ckpt[c] + popcount(nibble_eq(codes, c) & prefix_mask(i%128))

Why interleaved: a rank query needs the checkpoint AND the codes of one
block; packing them into a single 96-byte record means ONE gather row
(<= one HBM transaction) per query returns all four DNA ranks plus the
marker rank -- the dense table's row gather is also one transaction but
stores 16 bytes/position, vs 0.75 bytes/position here (21x), which is
what makes >HBM graphs shardable (parallel/sharded_index.py).

The in-block counting runs as a Pallas kernel on TPU (nibble-match +
popcount on the VPU, records staged through VMEM in tiles); a pure-jnp
twin serves CPU tests and non-TPU backends and is asserted bit-equal.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

BLOCK = 128            # symbols per block
WORDS = 24             # uint32 words per record
CODE_WORDS = 16        # words[8:24] hold the 4-bit codes
MARKER_CODE = 5

_REP = np.uint32(0x11111111)   # one bit per nibble


# --------------------------------------------------------------------------
# construction
# --------------------------------------------------------------------------

def build_packed_occ(fm) -> np.ndarray:
    """Packs an index.fm.FMIndex's BWT into (nblocks, 24) uint32 records.

    nblocks = floor(n / 128) + 1 so a query at i = n (prefix of the whole
    BWT) still has a record; pad symbols get code 0 and count as nothing.
    """
    bwt = np.asarray(fm.bwt, dtype=np.int64)
    n = bwt.size
    nblocks = n // BLOCK + 1
    codes = np.zeros(nblocks * BLOCK, dtype=np.uint32)
    codes[:n] = np.where(bwt == 0, 0, np.where(bwt <= 4, bwt, MARKER_CODE))

    blocks = np.zeros((nblocks, WORDS), dtype=np.uint32)
    # checkpoints: counts before each block start
    for c in range(1, 5):
        hits = np.zeros(nblocks, dtype=np.uint32)
        np.add.at(hits, np.flatnonzero(bwt == c) // BLOCK, 1)
        blocks[1:, c - 1] = np.cumsum(hits)[:-1]
    mhits = np.zeros(nblocks, dtype=np.uint32)
    np.add.at(mhits, np.flatnonzero(bwt > 4) // BLOCK, 1)
    blocks[1:, 4] = np.cumsum(mhits)[:-1]
    # 4-bit code words
    nib = codes.reshape(nblocks, CODE_WORDS, 8)
    shifts = (4 * np.arange(8, dtype=np.uint32))[None, None, :]
    blocks[:, 8:] = (nib << shifts).sum(axis=2, dtype=np.uint32)
    return blocks


# --------------------------------------------------------------------------
# query twins: numpy oracle, jnp, pallas
# --------------------------------------------------------------------------

def _count_channels_np(rec: np.ndarray, off: np.ndarray) -> np.ndarray:
    """(N, 24) records + (N,) in-block offsets -> (N, 4) DNA ranks."""
    words = rec[:, 8:]                                   # (N, 16)
    j = np.arange(CODE_WORDS, dtype=np.int64)
    t = np.clip(off[:, None] - 8 * j, 0, 8)              # nibbles in prefix
    pmask = np.where(t >= 8, np.uint32(0xFFFFFFFF),
                     (np.uint32(1) << (4 * np.minimum(t, 7)).astype(np.uint32))
                     - 1)
    out = np.empty((rec.shape[0], 4), dtype=np.int32)
    for c in range(1, 5):
        x = words ^ (np.uint32(c) * _REP)
        y = ~x
        m = y & (y >> 1) & (y >> 2) & (y >> 3) & _REP
        cnt = _popcount_np(m & pmask).sum(axis=1)
        out[:, c - 1] = rec[:, c - 1].astype(np.int32) + cnt.astype(np.int32)
    return out


def _popcount_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    x = x - ((x >> 1) & np.uint32(0x55555555))
    x = (x & np.uint32(0x33333333)) + ((x >> 2) & np.uint32(0x33333333))
    x = (x + (x >> 4)) & np.uint32(0x0F0F0F0F)
    return (x * np.uint32(0x01010101)) >> 24


def packed_occ_rows_np(blocks: np.ndarray, rows: np.ndarray,
                       size: int) -> np.ndarray:
    """Numpy oracle: rank of the four DNA bases at each row (prefix
    length), bit-equal to fm.occ.T[rows]."""
    rows = np.clip(np.asarray(rows, dtype=np.int64), 0, size)
    rec = blocks[rows // BLOCK]
    return _count_channels_np(rec, rows % BLOCK)


def _count_channels_jnp(rec, off):
    words = rec[..., 8:]                                  # (..., 16)
    j = jnp.arange(CODE_WORDS, dtype=jnp.int32)
    t = jnp.clip(off[..., None] - 8 * j, 0, 8)
    pmask = jnp.where(t >= 8, jnp.uint32(0xFFFFFFFF),
                      (jnp.uint32(1)
                       << (4 * jnp.minimum(t, 7)).astype(jnp.uint32))
                      - jnp.uint32(1))
    rep = jnp.uint32(0x11111111)
    outs = []
    for c in range(1, 5):
        x = words ^ (jnp.uint32(c) * rep)
        y = ~x
        m = y & (y >> 1) & (y >> 2) & (y >> 3) & rep
        cnt = jnp.sum(jax.lax.population_count(m & pmask), axis=-1)
        outs.append(rec[..., c - 1].astype(jnp.int32) + cnt.astype(jnp.int32))
    return jnp.stack(outs, axis=-1)


def _rank_kernel(rec_ref, off_ref, out_ref):
    """Pallas kernel body: one tile of gathered records through the VPU.
    rec: (T, 24) uint32 in VMEM; off: (T, 1) int32; out: (T, 4) int32."""
    out_ref[:] = _count_channels_jnp(rec_ref[:], off_ref[:, 0])


def _packed_rank_pallas(rec, off, tile: int = 512, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = rec.shape[0]
    pad = (-n) % tile
    if pad:
        rec = jnp.pad(rec, ((0, pad), (0, 0)))
        off = jnp.pad(off, ((0, pad),))
    grid = (rec.shape[0] // tile,)
    out = pl.pallas_call(
        _rank_kernel,
        out_shape=jax.ShapeDtypeStruct((rec.shape[0], 4), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, WORDS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rec, off[:, None].astype(jnp.int32))
    return out[:n]


def make_packed_occ_rows(blocks, size: int, use_pallas: bool | None = None,
                         interpret: bool = False):
    """Returns occ_rows(rows) -> (..., 4) int32, a drop-in for the dense
    di.occ gather in search_jax_log._build_log_step.

    blocks: (nblocks, 24) uint32 device array. use_pallas: None = auto
    (pallas on TPU devices, jnp elsewhere). Auto-detection goes by the
    device kind, NOT the backend name: relayed TPU backends (e.g. the
    axon relay) register under their own platform name, so a backend
    string test would silently route production onto the jnp fallback.
    """
    if use_pallas is None:
        import logging
        kind = jax.devices()[0].device_kind.lower()
        use_pallas = "tpu" in kind
        logging.getLogger("gramtools_tpu").info(
            "packed rank path: %s (device_kind=%r)",
            "pallas" if use_pallas else "jnp fallback",
            jax.devices()[0].device_kind)

    def occ_rows(rows):
        shape = rows.shape
        r = jnp.clip(rows.reshape(-1), 0, size)
        rec = blocks[(r // BLOCK).astype(jnp.int32)]       # XLA gather
        off = (r % BLOCK).astype(jnp.int32)
        if use_pallas:
            out = _packed_rank_pallas(rec, off, interpret=interpret)
        else:
            out = _count_channels_jnp(rec, off)
        return out.reshape(shape + (4,))

    return occ_rows
