"""VCF + reference fasta -> linear PRG ints.

Parity: gramtools/commands/build/vcf_to_prg_string.py (normal mode
'5T6G6', legacy mode '5T6G5') and from_vcfs.py (record clustering).

Behaviour (as in the reference):
  * records are taken per CHROM in increasing POS; overlapping or
    non-increasing records are dropped (after clustering);
  * records without PASS in FILTER are skipped;
  * reference contigs with no variants are appended at the end in
    reference order... (no: appended in their reference positions --
    each chrom's PRG chunk is concatenated in reference record order).
"""
from __future__ import annotations

import logging
from typing import Dict, List

import numpy as np

from ..common.seq import load_fasta
from ..common.vcf import VcfRecord, parse_vcf

log = logging.getLogger("gramtools_tpu")

_NUC = {"A": 1, "a": 1, "C": 2, "c": 2, "G": 3, "g": 3, "T": 4, "t": 4}

MAX_ALLELES_PER_CLUSTER = 5000  # from_vcfs.py:44


class ReferenceError(Exception):
    pass


def _encode_seq(seq: str) -> List[int]:
    try:
        return [_NUC[c] for c in seq]
    except KeyError as e:
        raise ReferenceError(f"non-ACGT character in sequence: {e}")


class VcfToPrg:
    """vcf_to_prg_string.py:32-189."""

    def __init__(self, vcf_file, reference_file, mode: str = "normal"):
        _, records = parse_vcf(vcf_file)
        self._init(records, load_fasta(reference_file), mode)

    @classmethod
    def from_records(cls, records: List[VcfRecord], ref_records: Dict[str, str],
                     mode: str = "normal") -> "VcfToPrg":
        self = cls.__new__(cls)
        self._init(records, ref_records, mode)
        return self

    def _init(self, records, ref_records, mode):
        if mode not in ("legacy", "normal"):
            raise ValueError("mode must be legacy or normal")
        self.ref_records: Dict[str, str] = ref_records
        self.num_sites = 0
        self.skipped_records = 0
        self.prg_ints_by_chrom: Dict[str, List[int]] = {}
        self._make_prg(records, mode)

    def prg_string(self) -> str:
        """Numbered-notation string, for tests/tools."""
        out = []
        for v in self.prg_ints():
            v = int(v)
            out.append("0ACGT"[v] if v <= 4 else str(v))
        return "".join(out)

    def _check_record_ref(self, rec: VcfRecord):
        if rec.chrom not in self.ref_records:
            raise ReferenceError(f"ref ID {rec.chrom} not found in reference")
        pos, length = rec.pos - 1, len(rec.ref)
        if self.ref_records[rec.chrom][pos : pos + length].upper() != rec.ref:
            raise ReferenceError(
                f"Vcf record REF sequence does not match ref ID {rec.chrom}")

    def _record_rep(self, rec: VcfRecord, site_marker: int, mode: str) -> List[int]:
        rep = [site_marker] + _encode_seq(rec.ref)
        allele_marker = site_marker + 1
        rep.append(allele_marker)
        for i, alt in enumerate(rec.alts):
            rep.extend(_encode_seq(alt))
            pushed = allele_marker
            if mode == "legacy" and i == len(rec.alts) - 1:
                pushed -= 1
            rep.append(pushed)
        return rep

    def _make_prg(self, records: List[VcfRecord], mode: str):
        ref_chrom = None
        ref_pos = 1
        site_marker = 5
        processed = set()
        out = self.prg_ints_by_chrom

        for rec in records:
            if "PASS" not in rec.filter:
                self.skipped_records += 1
                continue
            self.num_sites += 1
            self._check_record_ref(rec)
            if rec.chrom != ref_chrom:
                if ref_chrom is not None:
                    out.setdefault(ref_chrom, []).extend(
                        _encode_seq(self.ref_records[ref_chrom][ref_pos - 1 :]))
                    processed.add(ref_chrom)
                ref_pos = 1
                ref_chrom = rec.chrom
            if rec.pos < ref_pos:
                log.warning("Skipped record at pos %s (previous led to %s)",
                            rec.pos, ref_pos)
                continue
            if rec.pos > ref_pos:
                out.setdefault(ref_chrom, []).extend(_encode_seq(
                    self.ref_records[rec.chrom][ref_pos - 1 : rec.pos - 1]))
                ref_pos = rec.pos
            out.setdefault(ref_chrom, []).extend(
                self._record_rep(rec, site_marker, mode))
            ref_pos += len(rec.ref)
            site_marker += 2

        if ref_chrom is not None:
            out.setdefault(ref_chrom, []).extend(
                _encode_seq(self.ref_records[ref_chrom][ref_pos - 1 :]))
            processed.add(ref_chrom)
        for chrom in self.ref_records:
            if chrom not in processed:
                out.setdefault(chrom, []).extend(
                    _encode_seq(self.ref_records[chrom]))

    def prg_ints(self) -> np.ndarray:
        ints: List[int] = []
        for chrom in self.ref_records:
            ints.extend(self.prg_ints_by_chrom.get(chrom, []))
        return np.asarray(ints, dtype=np.uint32)


def cluster_vcf_records(records: List[VcfRecord]) -> List[VcfRecord]:
    """Merge REF-overlapping records into single multi-allelic records.

    The reference shells out to cluster_vcf_records.VcfClusterer
    (from_vcfs.py:40-45), which enumerates combined haplotypes of
    clustered records. Here overlapping records merge into one record
    spanning their union: alleles are every input allele spliced into
    the spanned reference plus combined haplotypes of non-overlapping
    pairs, deduped, capped at MAX_ALLELES_PER_CLUSTER.
    """
    by_chrom: Dict[str, List[VcfRecord]] = {}
    chrom_order: List[str] = []
    for r in records:
        if "PASS" not in r.filter:
            continue
        if r.chrom not in by_chrom:
            chrom_order.append(r.chrom)
        by_chrom.setdefault(r.chrom, []).append(r)

    out: List[VcfRecord] = []
    for chrom in chrom_order:
        recs = sorted(by_chrom[chrom], key=lambda r: r.pos)
        cluster: List[VcfRecord] = []
        cluster_end = -1
        for r in recs:
            if cluster and r.pos <= cluster_end:
                cluster.append(r)
                cluster_end = max(cluster_end, r.stop)
            else:
                if cluster:
                    out.append(_merge_cluster(cluster))
                cluster = [r]
                cluster_end = r.stop
        if cluster:
            out.append(_merge_cluster(cluster))
    return out


def _merge_cluster(cluster: List[VcfRecord]) -> VcfRecord:
    """Enumerate all haplotypes combining any mutually non-overlapping
    subset of the cluster's records (each contributing one of its ALTs),
    capped at MAX_ALLELES_PER_CLUSTER -- VcfClusterer semantics."""
    if len(cluster) == 1:
        return cluster[0]
    start = min(r.pos for r in cluster)
    end = max(r.stop for r in cluster)
    # spanned reference: reconstruct from the record REFs; records in a
    # cluster overlap, so use the longest-reaching record per position
    ref_span = [""] * (end - start + 1)
    for r in cluster:
        for i, c in enumerate(r.ref):
            ref_span[r.pos - start + i] = c
    ref = "".join(ref_span)
    recs = sorted(cluster, key=lambda r: (r.pos, r.stop))

    alleles = {ref}
    ordered: List[str] = []

    def add(h: str) -> bool:
        if len(ordered) >= MAX_ALLELES_PER_CLUSTER:
            return False
        if h not in alleles:
            alleles.add(h)
            ordered.append(h)
        return True

    def expand(i: int, cursor: int, prefix: str, used_any: bool) -> bool:
        """DFS over records i..; cursor = next unconsumed base-ref pos."""
        if i == len(recs):
            if used_any:
                return add(prefix + ref[cursor - start :])
            return True
        # option A: skip record i
        if not expand(i + 1, cursor, prefix, used_any):
            return False
        # option B: apply each ALT of record i (if it fits after cursor)
        r = recs[i]
        if r.pos >= cursor:
            gap = ref[cursor - start : r.pos - start]
            for alt in r.alts:
                if not expand(i + 1, r.stop + 1, prefix + gap + alt, True):
                    return False
        return True

    expand(0, start, "", False)
    return VcfRecord(chrom=cluster[0].chrom, pos=start, id=".", ref=ref,
                     alts=tuple(ordered), qual=".", filter=("PASS",),
                     info=".")
