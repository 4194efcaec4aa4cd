"""Native pileup variant caller for `discover`.

The reference shells out to cortex (a de-Bruijn assembly caller) for
variant discovery against the personalised reference
(/root/reference/gramtools/commands/discover/discover.py:30-54); that
dependency chain (cortex + R + perl) cannot exist in this environment,
so `discover` gains a built-in fallback: a seed-and-vote pileup caller
producing haploid SNP and small-indel calls. The pre-computed-VCF and
cortex paths remain (commands/discover_command.py).

Algorithm (vectorised numpy, host-side -- discovery runs once per
sample over a personal genome, far off the hot path):

1. index the personalised reference's k-mers (sorted code table);
2. seed each read (both orientations) at a stride, vote the modal
   alignment diagonal per read; the better orientation wins;
3. single-diagonal reads pile base votes over their ungapped placement;
   two-diagonal reads (prefix on d1, suffix on d2, |shift| <= max
   indel) are refined by exact prefix/suffix match into a left-anchored
   insertion/deletion candidate;
4. call a SNP where the top non-reference vote has >= min_count reads
   and >= min_frac of depth; call an indel where its supporting reads
   dominate the anchor's depth likewise.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from ..common.seq import encode_dna, load_fasta, load_reads_encoded, revcomp
from ..common.vcf import VcfRecord

BASES = "NACGT"


def _rolling_codes(seq: np.ndarray, k: int) -> np.ndarray:
    """Base-4 codes of every k-window of an encoded (1..4, 0=invalid)
    sequence; windows containing a 0 code to -1."""
    n = seq.size
    if n < k:
        return np.empty(0, dtype=np.int64)
    w = np.lib.stride_tricks.sliding_window_view(seq, k)
    powers = 4 ** np.arange(k - 1, -1, -1, dtype=np.int64)
    codes = (w.astype(np.int64) - 1) @ powers
    bad = (w == 0).any(axis=1)
    codes[bad] = -1
    return codes


class _RefIndex:
    def __init__(self, chrom_names: List[str], chrom_seqs: List[np.ndarray],
                 k: int):
        self.k = k
        self.names = chrom_names
        # concatenate with k zero separators so no k-mer spans chroms
        parts, starts = [], []
        cursor = 0
        gap = np.zeros(k, dtype=np.uint8)
        for s in chrom_seqs:
            starts.append(cursor)
            parts.append(s)
            parts.append(gap)
            cursor += s.size + k
        self.cat = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
        self.starts = np.asarray(starts, dtype=np.int64)
        self.lens = np.asarray([s.size for s in chrom_seqs], dtype=np.int64)
        codes = _rolling_codes(self.cat, k)
        valid = np.flatnonzero(codes >= 0)
        order = np.argsort(codes[valid], kind="stable")
        self.sorted_codes = codes[valid][order]
        self.sorted_pos = valid[order]

    def locate(self, abs_pos: int) -> Tuple[int, int]:
        """abs position in cat -> (chrom index, 0-based chrom offset)."""
        ci = int(np.searchsorted(self.starts, abs_pos, side="right") - 1)
        return ci, int(abs_pos - self.starts[ci])


def _pad_reads(read_lists: List[List[np.ndarray]]) -> np.ndarray:
    reads = [r for lst in read_lists for r in lst if r.size > 0]
    if not reads:
        return np.zeros((0, 1), dtype=np.uint8)
    L = max(r.size for r in reads)
    mat = np.zeros((2 * len(reads), L), dtype=np.uint8)
    for i, r in enumerate(reads):
        mat[2 * i, : r.size] = r
        mat[2 * i + 1, : r.size] = revcomp(r)
    return mat


def _seed_hits(ref: _RefIndex, mat: np.ndarray, stride: int, max_occ: int):
    """All (row, read_offset, diagonal) seed placements."""
    k = ref.k
    R, L = mat.shape
    if L < k or R == 0:
        return (np.empty(0, np.int64),) * 3
    offs = np.arange(0, L - k + 1, stride)
    w = np.lib.stride_tricks.sliding_window_view(mat, k, axis=1)[:, offs]
    powers = 4 ** np.arange(k - 1, -1, -1, dtype=np.int64)
    codes = (w.astype(np.int64) - 1) @ powers       # (R, S)
    codes[(w == 0).any(axis=2)] = -1
    lo = np.searchsorted(ref.sorted_codes, codes)
    hi = np.searchsorted(ref.sorted_codes, codes, side="right")
    occ = np.where(codes >= 0, hi - lo, 0)
    occ = np.where(occ <= max_occ, occ, 0)          # repeats don't vote
    total = int(occ.sum())
    if total == 0:
        return (np.empty(0, np.int64),) * 3
    flat_occ = occ.reshape(-1)
    row_of = np.repeat(np.arange(R * len(offs)) // len(offs), flat_occ)
    off_of = np.repeat(np.tile(offs, R), flat_occ)
    first = np.repeat(np.cumsum(flat_occ) - flat_occ, flat_occ)
    within = np.arange(total) - first
    pos = ref.sorted_pos[np.repeat(lo.reshape(-1), flat_occ) + within]
    return row_of, off_of, pos - off_of


def _best_diagonals(row_of, off_of, diag, R):
    """Per row, by seed vote: top two diagonals with their counts and
    mean seed read-offsets (the offsets tell which diagonal covers the
    read's left vs right part for indel reads). Fully vectorised:
    run-length the (row, diagonal) pairs, rank runs per row by count."""
    MIN = np.iinfo(np.int64).min
    d1 = np.full(R, MIN, np.int64)
    c1 = np.zeros(R, np.int64)
    o1 = np.zeros(R, np.float64)
    d2 = np.full(R, MIN, np.int64)
    c2 = np.zeros(R, np.int64)
    o2 = np.zeros(R, np.float64)
    if row_of.size == 0:
        return d1, c1, o1, d2, c2, o2
    order = np.lexsort((diag, row_of))
    r, d, o = row_of[order], diag[order], off_of[order]
    new = np.ones(r.size, bool)
    new[1:] = (r[1:] != r[:-1]) | (d[1:] != d[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, r.size))
    rr, dd = r[starts], d[starts]
    osum = np.add.reduceat(o, starts)
    omean = osum / counts
    # rank runs per row by count: sort (row, count) and take the last
    # two entries of each row's block
    order2 = np.lexsort((counts, rr))
    r_s, d_s, c_s, o_s = rr[order2], dd[order2], counts[order2], omean[order2]
    is_last = np.ones(r_s.size, bool)
    is_last[:-1] = r_s[1:] != r_s[:-1]
    li = np.flatnonzero(is_last)
    d1[r_s[li]], c1[r_s[li]], o1[r_s[li]] = d_s[li], c_s[li], o_s[li]
    prev = li - 1
    ok = (prev >= 0) & (r_s[np.clip(prev, 0, None)] == r_s[li])
    lp = prev[ok]
    d2[r_s[lp]], c2[r_s[lp]], o2[r_s[lp]] = d_s[lp], c_s[lp], o_s[lp]
    return d1, c1, o1, d2, c2, o2


def _match_len(a: np.ndarray, b: np.ndarray) -> int:
    """Length of the common prefix of two equal-length arrays."""
    neq = np.flatnonzero(a != b)
    return int(neq[0]) if neq.size else a.size


def call_variants(pers_ref_fasta, reads_files, out_vcf, k: int = 15,
                  stride: int = 4, max_occ: int = 8, min_count: int = 2,
                  min_frac: float = 0.8, max_indel: int = 50,
                  sample_name: str = "sample") -> List[VcfRecord]:
    """Run the pileup caller; writes a VCF (with ##contig headers, one
    haploid sample) and returns the records."""
    fasta = load_fasta(pers_ref_fasta)
    names = list(fasta)
    seqs = [encode_dna(fasta[n]) for n in names]
    ref = _RefIndex(names, seqs, k)
    mat = _pad_reads([load_reads_encoded(f) for f in reads_files])
    R, L = mat.shape

    row_of, off_of, diag = _seed_hits(ref, mat, stride, max_occ)
    d1, c1, o1, d2, c2, o2 = _best_diagonals(row_of, off_of, diag, R)

    # orientation choice: fwd row 2i vs rev row 2i+1 by top-diagonal vote
    use = np.zeros(R, bool)
    if R:
        fwd_better = c1[0::2] >= c1[1::2]
        use[0::2] = fwd_better & (c1[0::2] > 0)
        use[1::2] = ~fwd_better & (c1[1::2] > 0)

    rl_all = np.where(mat.any(axis=1),
                      L - np.argmax(mat[:, ::-1] != 0, axis=1), 0)
    two = (use & (c2 >= 2) & (d1 != d2)
           & (np.abs(d2 - d1) <= max_indel) & (np.abs(d2 - d1) > 0))

    votes = np.zeros((5, ref.cat.size + L), dtype=np.int32)
    # ---- single-diagonal reads: one flat vectorised vote scatter -------
    single = np.flatnonzero(use & ~two & (d1 >= 0)
                            & (d1 + rl_all <= ref.cat.size))
    if single.size:
        lens = rl_all[single]
        rows_f = np.repeat(single, lens)
        offs_f = np.arange(int(lens.sum())) - np.repeat(
            np.cumsum(lens) - lens, lens)
        np.add.at(votes, (mat[rows_f, offs_f],
                          np.repeat(d1[single], lens) + offs_f), 1)

    indel_support: Dict[Tuple[int, str, str], int] = {}
    # ---- two-diagonal (indel candidate) reads: per-read refinement -----
    for row in np.flatnonzero(two):
        rl = int(rl_all[row])
        read = mat[row, :rl]
        da, db = d1[row], d2[row]
        dl, dr = (da, db) if o1[row] < o2[row] else (db, da)
        dl, dr = int(dl), int(dr)
        if dl < 0 or dl + rl > ref.cat.size or dr < 0 \
                or dr + rl > ref.cat.size:
            continue
        shift = dr - dl
        if not (0 < abs(shift) <= max_indel):
            continue
        # exact refinement: longest matching prefix at dl, suffix at dr
        pre = _match_len(read, ref.cat[dl:dl + rl])
        suf = _match_len(read[::-1], ref.cat[dr:dr + rl][::-1])
        # left-most clean breakpoint b (end of the read's left segment):
        # the right segment starts at read offset b for deletions but at
        # b + |shift| for insertions (the inserted bases sit between)
        b = rl - suf + min(shift, 0)
        if b > pre or b < 1:
            continue                       # mismatch near breakpoint
        anchor = dl + b - 1                # 0-based, base before event
        if shift > 0:    # deletion of `shift` ref bases after read pos b
            ref_seq = ref.cat[anchor:anchor + 1 + shift]
            alt_seq = ref.cat[anchor:anchor + 1]
        else:            # insertion of -shift read bases after b
            ref_seq = ref.cat[anchor:anchor + 1]
            alt_seq = np.concatenate([ref.cat[anchor:anchor + 1],
                                      read[b:b - shift]])
        if (ref_seq == 0).any() or (alt_seq == 0).any():
            continue
        key = (anchor,
               "".join(BASES[x] for x in ref_seq),
               "".join(BASES[x] for x in alt_seq))
        indel_support[key] = indel_support.get(key, 0) + 1
        # the matched prefix/suffix still vote base coverage (the right
        # segment starts at read offset b - min(shift, 0): inserted
        # bases have no reference footprint)
        rs = b - min(shift, 0)
        np.add.at(votes, (read[:b], np.arange(dl, dl + b)), 1)
        np.add.at(votes, (read[rs:], np.arange(dr + rs, dr + rl)), 1)

    records: List[VcfRecord] = []
    depth = votes[1:5].sum(axis=0)
    # ---- indels first (their REF spans veto SNP artifacts) -------------
    # Reads whose post-indel segment is too short to seed the second
    # diagonal get classified single-diagonal and vote SHIFTED bases
    # through/past the event -- so (a) an indel needs only a robust
    # minority of the anchor depth (its own reads voted the anchor via
    # their matching prefix), and (b) positions inside a called
    # deletion's REF span (where only artifact votes can land) are
    # excluded from SNP calling.
    indel_veto = np.zeros(ref.cat.size, dtype=bool)
    for (anchor, ref_seq, alt_seq), c in sorted(indel_support.items()):
        d = int(depth[anchor])
        if c >= min_count and c >= 0.3 * d:
            ci, off = ref.locate(anchor)
            records.append(VcfRecord(
                chrom=ref.names[ci], pos=off + 1, id=".",
                ref=ref_seq, alts=(alt_seq,), qual=".",
                filter=("PASS",), info=f"DP={d}",
                format="GT:DP", samples=(f"1:{c}",)))
            indel_veto[anchor : anchor + len(ref_seq)] = True
    # ---- SNPs ----------------------------------------------------------
    ncat = ref.cat.size
    cand = np.flatnonzero((depth[:ncat] >= min_count) & (ref.cat > 0)
                          & ~indel_veto)
    for p in cand:
        refb = ref.cat[p]
        alt = int(np.argmax(votes[1:5, p])) + 1
        if alt == refb:
            continue
        c = int(votes[alt, p])
        if c >= min_count and c >= min_frac * depth[p]:
            ci, off = ref.locate(int(p))
            records.append(VcfRecord(
                chrom=ref.names[ci], pos=off + 1, id=".",
                ref=BASES[refb], alts=(BASES[alt],), qual=".",
                filter=("PASS",), info=f"DP={int(depth[p])}",
                format="GT:DP", samples=(f"1:{c}",)))

    records.sort(key=lambda r: (ref.names.index(r.chrom), r.pos))
    _write_vcf(out_vcf, ref, records, sample_name)
    return records


def _write_vcf(out_vcf, ref: _RefIndex, records: List[VcfRecord],
               sample_name: str):
    with open(out_vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("##source=gramtools_tpu_pileup\n")
        for name, length in zip(ref.names, ref.lens):
            fh.write(f"##contig=<ID={name},length={int(length)}>\n")
        fh.write('##FORMAT=<ID=GT,Number=1,Type=String,'
                 'Description="Genotype">\n')
        fh.write('##FORMAT=<ID=DP,Number=1,Type=Integer,'
                 'Description="Supporting read depth">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 f"{sample_name}\n")
        for rec in records:
            fh.write(rec.to_line() + "\n")
