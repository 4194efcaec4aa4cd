"""`discover` command: find new variants against the personalised
reference and rebase them into base-reference coordinates.

Parity: gramtools/commands/discover/discover.py. The variant caller is
pluggable (`--caller`):

  * ``native`` (default) -- the built-in seed-and-vote pileup caller
    (discover/pileup.py); zero external dependencies, so discover runs
    end-to-end unaided;
  * ``cortex`` -- the reference's py-cortex-api, when installed
    (discover.py:30-54);
  * a pre-computed VCF of variants against the personalised reference
    may be supplied via ``args.discov_vcf`` instead.
"""
from __future__ import annotations

import json
import logging
import shutil
from typing import Dict, List

from ..common.seq import load_fasta
from ..common.vcf import VcfRecord, parse_vcf, write_vcf_file
from . import report
from .paths import DiscoverPaths
from .seq_region_map import (
    BisectTarget,
    SearchableSeqRegionsMap,
    SeqRegionMapper,
)

log = logging.getLogger("gramtools_tpu")


def run(args):
    log.info("Start process: discover")
    disco_paths = DiscoverPaths(args.discovery_dir, args.genotype_dir, args.force)
    disco_paths.setup()

    enforce_genotyping_was_haploid(disco_paths)

    discov_vcf = getattr(args, "discov_vcf", None)
    caller = getattr(args, "caller", "native")
    if discov_vcf is not None:
        shutil.copyfile(discov_vcf, disco_paths.discov_vcf)
    elif caller == "cortex":
        _run_cortex(disco_paths, args)
    else:
        _run_native_caller(disco_paths)

    rebased = rebase_vcf(disco_paths)
    _dump_rebased_vcf(rebased, disco_paths)
    log.info("Found %d variants. Final vcf in %s", len(rebased),
             disco_paths.final_vcf)
    log.info("End process: discover.")


def _run_native_caller(disco_paths):
    from ..discover.pileup import call_variants

    log.info("Running native pileup variant caller")
    records = call_variants(disco_paths.pers_ref, disco_paths.reads_files,
                            disco_paths.discov_vcf)
    log.info("Native caller found %d candidate variants", len(records))


def _run_cortex(disco_paths, args):
    try:
        import cortex.calls as cortex
    except ModuleNotFoundError:
        raise SystemExit(
            "Cannot run discovery: missing cortex variant caller "
            "(py-cortex-api). Alternatively pass a pre-computed VCF of "
            "variants against the personalised reference.")
    cortex_args = {
        "reference_fasta": disco_paths.pers_ref,
        "reads_files": disco_paths.reads_files,
        "output_vcf_file_path": disco_paths.discov_vcf,
    }
    if hasattr(args, "mem_height"):
        cortex_args["mem_height"] = args.mem_height
    cortex.run(**cortex_args)


def enforce_genotyping_was_haploid(disco_paths):
    with open(disco_paths.geno_report) as f_in:
        genotype_report = json.load(f_in)
    if genotype_report["ploidy"] != "haploid":
        raise SystemExit(
            "Discover currently supports haploid genotyping only; genotype "
            f"ran in {genotype_report['ploidy']} mode.")


def check_ref_consistent(record: VcfRecord, inferred_sequence: str,
                         unplaced: List[str]) -> bool:
    """discover.py:250-262."""
    pos = record.pos
    if (len(inferred_sequence) < pos
            or record.ref != inferred_sequence[pos - 1 : pos - 1 + len(record.ref)]):
        unplaced.append(str(record))
        return False
    return True


def rebase_vcf(disco_paths, check_records: bool = True) -> List[VcfRecord]:
    """discover.py:67-114."""
    inferred_refs = load_fasta(disco_paths.pers_ref) if check_records else {}
    _, base_records = parse_vcf(disco_paths.geno_vcf)
    _, derived_records = parse_vcf(disco_paths.discov_vcf)

    chrom_sizes = _load_contig_sizes_from_vcf(disco_paths.geno_vcf)
    region_map = SeqRegionMapper(base_records, chrom_sizes).get_map()
    region_searcher = SearchableSeqRegionsMap(region_map)

    unplaced: List[str] = []
    out: List[VcfRecord] = []
    for record in derived_records:
        if check_records and not check_ref_consistent(
                record, inferred_refs[record.chrom], unplaced):
            continue
        out.append(rebase_vcf_record(record, record.chrom, region_searcher))
    if check_records and unplaced:
        log.warning(
            "%d new variant records were skipped, because record pos and ref "
            "do not coincide with personalised reference", len(unplaced))
    return out


def rebase_vcf_record(record: VcfRecord, chrom: str,
                      region_searcher: SearchableSeqRegionsMap) -> VcfRecord:
    """Rebase one discovered record from personalised-reference into
    base-reference coordinates.

    Span algebra over the columnar region map (behavioural contract:
    the reference's discover rebasing, discover.py:132-198; pinned by
    tests/test_discover_rebase.py and the IT4 fixture). The record's
    pers-ref footprint ``[pos, pos+len(ref)-1]`` selects a run of map
    regions via two vectorised bisects; then

      * the output POS is the first region's base-ref start, advanced by
        the footprint's lead offset when that region is invariant;
      * the output REF concatenates, region by region, the full base-ref
        REF of variant regions and the footprint's own slice of
        invariant regions;
      * the output ALT is the called ALT, extended with the unconsumed
        head of the first region's alt and tail of the last region's alt
        (variant regions substitute whole alleles, so a partial overlap
        must carry the rest of the allele through).
    """
    alt = record.alts[0]
    pos = record.pos
    end = pos + len(record.ref) - 1
    first_i, last_i = (int(i) for i in region_searcher.bisect_many(
        chrom, (pos, end), BisectTarget.PERS_REF))

    first = region_searcher.get_region(chrom, first_i)
    lead = pos - first.pers_ref_start
    new_pos = first.base_ref_start
    if first.is_variant_region:
        alt = first.vcf_record_alt[:lead] + alt
    else:
        new_pos += lead

    last = region_searcher.get_region(chrom, last_i)
    tail = (last.pers_ref_start + last.length - 1) - end
    if last.is_variant_region and tail > 0:
        alt += last.vcf_record_alt[last.length - tail:]

    parts = []
    for i in range(first_i, last_i + 1):
        region = region_searcher.get_region(chrom, i)
        if region.is_variant_region:
            parts.append(region.vcf_record_ref)
        else:
            lo = max(pos, region.pers_ref_start)
            hi = min(end, region.pers_ref_start + region.length - 1)
            parts.append(record.ref[lo - pos : hi - pos + 1])

    from dataclasses import replace
    return replace(record, pos=new_pos, ref="".join(parts), alts=(alt,))


def _load_contig_sizes_from_vcf(vcf_fname) -> Dict[str, int]:
    headers, _ = parse_vcf(vcf_fname)
    result: Dict[str, int] = {}
    for line in headers:
        if line.startswith("##contig=<"):
            body = line[len("##contig=<"):].rstrip(">")
            attrs = dict(part.split("=", 1) for part in _split_header(body))
            if "ID" in attrs and "length" in attrs:
                result[attrs["ID"]] = int(attrs["length"])
    if not result:
        raise ValueError(f"{vcf_fname} does not have 'contig' lines giving "
                         "contig sizes")
    return result


def _split_header(body: str) -> List[str]:
    """Split on commas outside quotes."""
    parts, cur, in_quotes = [], "", False
    for c in body:
        if c == '"':
            in_quotes = not in_quotes
        if c == "," and not in_quotes:
            parts.append(cur)
            cur = ""
        else:
            cur += c
    if cur:
        parts.append(cur)
    return parts


def _dump_rebased_vcf(records: List[VcfRecord], disco_paths):
    headers, _ = parse_vcf(disco_paths.discov_vcf)
    write_vcf_file(disco_paths.final_vcf, headers, records)
