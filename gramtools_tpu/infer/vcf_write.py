"""VCF output: level-1 sites as bgzipped VCF.

Parity: libgramtools src/genotype/infer/output_specs/make_vcf.cpp
(htslib-based there; self-contained text + BGZF writer here).
"""
from __future__ import annotations

from typing import List

from ..common.bgzf import bgzf_write
from ..mapping.search import PrgIndex
from ..prg.markers import index_to_site_id
from .segment_tracker import SegmentTracker
from .types import GenotypedSite


def _fmt_float(x: float) -> str:
    """htslib renders floats with %g."""
    return "%g" % x


def make_vcf_text(idx: PrgIndex, sites: List[GenotypedSite],
                  tracker: SegmentTracker, sample_id: str) -> str:
    lines = ["##fileformat=VCFv4.2"]
    lines.append('##FILTER=<ID=PASS,Description="All filters passed">')
    for seg_id, size in tracker.segments:
        lines.append(f'##contig=<ID={seg_id},length={size},Source="gramtools">')
    lines.append("##source=gramtools")
    lines.append('##Model=LevelGenotyping')
    lines.append('##FORMAT=<ID=GT_CONF,Number=1,Type=Float,Description='
                 '"Genotype confidence as likelihood ratio of called and '
                 'next most likely genotype.",Source="gramtools">')
    lines.append('##FORMAT=<ID=GT_CONF_PERCENTILE,Number=1,Type=Float,'
                 'Description="Percent of calls expected to have lower '
                 'GT_CONF",Source="gramtools">')
    lines.append('##FORMAT=<ID=GT,Number=1,Type=String,Description='
                 '"Genotype",Source="gramtools">')
    lines.append('##FORMAT=<ID=DP,Number=1,Type=Integer,Description='
                 '"Total read depth on variant site",Source="gramtools">')
    lines.append('##FORMAT=<ID=COV,Number=R,Type=Float,Description='
                 '"Read coverage on each allele",Source="gramtools">')
    lines.append('##FORMAT=<ID=FT,Number=1,Type=String,Description='
                 '"Filters failed in a sample",Source="gramtools">')
    lines.append('##FILTER=<ID=AMBIG,Description="Ambiguous site. Different '
                 'variant paths can produce the same sequence.",'
                 'Source="gramtools">')
    lines.append("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 + sample_id)

    par_map = idx.graph.par_map
    for site_index, site in enumerate(sites):
        if index_to_site_id(site_index) in par_map:
            continue  # only level-1 sites are emitted (make_vcf.cpp:49-60)
        lines.append(_site_record(site, tracker))
    return "\n".join(lines) + "\n"


def _site_record(site: GenotypedSite, tracker: SegmentTracker) -> str:
    chrom = tracker.get_id(site.pos)
    pos = tracker.get_relative_pos(site.pos) + 1  # 1-based

    alleles = [a.sequence for a in site.alleles]
    ref = alleles[0] if alleles else "."
    alt = ",".join(alleles[1:]) if len(alleles) > 1 else "."

    if site.is_null():
        gt = "."
    else:
        gt = "/".join(str(g) for g in site.genotype)

    fmt_fields = ["GT", "DP"]
    vals = [gt, str(site.total_coverage)]
    if site.allele_covs:
        fmt_fields.append("COV")
        vals.append(",".join(_fmt_float(c) for c in site.allele_covs))
    fmt_fields.append("FT")
    vals.append(",".join(site.filters) if site.filters else "PASS")
    fmt_fields.append("GT_CONF")
    vals.append(_fmt_float(site.gt_conf))
    fmt_fields.append("GT_CONF_PERCENTILE")
    vals.append(_fmt_float(site.gt_conf_percentile))

    return "\t".join([
        chrom, str(pos), ".", ref, alt, ".", ".", ".",
        ":".join(fmt_fields), ":".join(vals),
    ])


def write_vcf(idx: PrgIndex, sites: List[GenotypedSite],
              tracker: SegmentTracker, sample_id: str, path):
    text = make_vcf_text(idx, sites, tracker, sample_id)
    bgzf_write(path, text.encode("ascii"))
