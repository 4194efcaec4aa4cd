"""Native pileup variant caller (discover/pileup.py): unit calls on
synthetic data + end-to-end `discover` without any external caller."""
import json
from pathlib import Path

import numpy as np
import pytest

from gramtools_tpu.discover.pileup import call_variants
from gramtools_tpu.common.vcf import parse_vcf


def _write_fasta(path, name, seq):
    path.write_text(f">{name}\n{seq}\n")


def _write_fastq(path, reads):
    with open(path, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


def _sample_reads(rng, hap, n, read_len):
    return [hap[s : s + read_len]
            for s in rng.randint(0, len(hap) - read_len, size=n)]


@pytest.fixture
def ref_seq():
    rng = np.random.RandomState(0)
    return "".join(rng.choice(list("ACGT"), size=2000))


def test_snp_call(tmp_path, ref_seq):
    rng = np.random.RandomState(1)
    pos = 1000                                    # 0-based
    alt = "A" if ref_seq[pos] != "A" else "C"
    hap = ref_seq[:pos] + alt + ref_seq[pos + 1:]
    _write_fasta(tmp_path / "ref.fa", "chr1", ref_seq)
    _write_fastq(tmp_path / "r.fq", _sample_reads(rng, hap, 400, 100))
    recs = call_variants(tmp_path / "ref.fa", [tmp_path / "r.fq"],
                         tmp_path / "out.vcf")
    assert [(r.chrom, r.pos, r.ref, r.alts) for r in recs] == [
        ("chr1", pos + 1, ref_seq[pos], (alt,))]
    headers, parsed = parse_vcf(tmp_path / "out.vcf")
    assert any(h.startswith("##contig=<ID=chr1,length=2000>")
               for h in headers)
    assert parsed[0].genotypes() == [1]


def test_deletion_call(tmp_path, ref_seq):
    rng = np.random.RandomState(2)
    pos = 900
    dlen = 5
    hap = ref_seq[:pos] + ref_seq[pos + dlen:]
    _write_fasta(tmp_path / "ref.fa", "chr1", ref_seq)
    _write_fastq(tmp_path / "r.fq", _sample_reads(rng, hap, 400, 100))
    recs = call_variants(tmp_path / "ref.fa", [tmp_path / "r.fq"],
                         tmp_path / "out.vcf")
    dels = [r for r in recs if len(r.ref) == dlen + 1 and len(r.alts[0]) == 1]
    assert len(dels) == 1
    r = dels[0]
    # left-anchored: REF spans the deleted bases plus the anchor
    assert ref_seq[r.pos - 1 : r.pos - 1 + dlen + 1] == r.ref
    assert r.alts[0] == r.ref[0]
    # the called deletion reproduces the haplotype
    called = ref_seq[: r.pos - 1] + r.alts[0] + ref_seq[r.pos - 1 + len(r.ref):]
    assert called == hap


def test_insertion_call(tmp_path, ref_seq):
    rng = np.random.RandomState(3)
    pos = 1200
    ins = "GATTA"
    hap = ref_seq[:pos] + ins + ref_seq[pos:]
    _write_fasta(tmp_path / "ref.fa", "chr1", ref_seq)
    _write_fastq(tmp_path / "r.fq", _sample_reads(rng, hap, 400, 100))
    recs = call_variants(tmp_path / "ref.fa", [tmp_path / "r.fq"],
                         tmp_path / "out.vcf")
    inss = [r for r in recs if len(r.ref) == 1 and len(r.alts[0]) > 1]
    assert len(inss) == 1
    r = inss[0]
    called = ref_seq[: r.pos - 1] + r.alts[0] + ref_seq[r.pos:]
    assert called == hap


def test_no_false_calls_on_clean_reads(tmp_path, ref_seq):
    rng = np.random.RandomState(4)
    _write_fasta(tmp_path / "ref.fa", "chr1", ref_seq)
    _write_fastq(tmp_path / "r.fq", _sample_reads(rng, ref_seq, 300, 100))
    recs = call_variants(tmp_path / "ref.fa", [tmp_path / "r.fq"],
                         tmp_path / "out.vcf")
    assert recs == []


def test_reverse_complement_reads(tmp_path, ref_seq):
    """Reads from the reverse strand place and vote correctly."""
    comp = str.maketrans("ACGT", "TGCA")
    rng = np.random.RandomState(5)
    pos = 600
    alt = "G" if ref_seq[pos] != "G" else "T"
    hap = ref_seq[:pos] + alt + ref_seq[pos + 1:]
    fwd = _sample_reads(rng, hap, 200, 100)
    rev = [r.translate(comp)[::-1] for r in _sample_reads(rng, hap, 200, 100)]
    _write_fasta(tmp_path / "ref.fa", "chr1", ref_seq)
    _write_fastq(tmp_path / "r.fq", fwd + rev)
    recs = call_variants(tmp_path / "ref.fa", [tmp_path / "r.fq"],
                         tmp_path / "out.vcf")
    assert [(r.pos, r.ref, r.alts) for r in recs] == [
        (pos + 1, ref_seq[pos], (alt,))]


def test_discover_end_to_end_native_caller(tmp_path):
    """`discover` runs unaided: build -> genotype (haploid) -> discover
    with the native caller; a variant present in the reads but NOT in
    the graph is discovered against the personalised reference and
    rebased into base-ref coordinates."""
    from types import SimpleNamespace

    from gramtools_tpu.commands import build_command, genotype_command
    from gramtools_tpu.commands import discover_command

    rng = np.random.RandomState(7)
    base_ref = "".join(rng.choice(list("ACGT"), size=1500))
    # graph variant at 300 (0-based): base ref has X, sample carries ALT
    gpos = 300
    g_ref, g_alt = base_ref[gpos], ("A" if base_ref[gpos] != "A" else "C")
    # novel SNP at 900, absent from the graph
    npos = 900
    n_alt = "T" if base_ref[npos] != "T" else "G"
    sample = (base_ref[:gpos] + g_alt + base_ref[gpos + 1 : npos]
              + n_alt + base_ref[npos + 1:])

    (tmp_path / "ref.fa").write_text(f">chr1\n{base_ref}\n")
    (tmp_path / "v.vcf").write_text(
        "##fileformat=VCFv4.2\n"
        '##contig=<ID=chr1,length=1500>\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        f"chr1\t{gpos + 1}\t.\t{g_ref}\t{g_alt}\t.\tPASS\t.\n")
    reads = [sample[s : s + 100]
             for s in rng.randint(0, len(sample) - 100, size=300)]
    _write_fastq(tmp_path / "reads.fq", reads)

    build_command.run(SimpleNamespace(
        gram_dir=str(tmp_path / "gram"), vcf=[[str(tmp_path / "v.vcf")]],
        reference=str(tmp_path / "ref.fa"), prg=None, prgs_bed=None,
        kmer_size=7, force=True, debug=False, max_threads=1))
    genotype_command.run(SimpleNamespace(
        gram_dir=str(tmp_path / "gram"),
        genotype_dir=str(tmp_path / "geno"),
        reads=[[str(tmp_path / "reads.fq")]], sample_id="s1",
        ploidy="haploid", kmer_size=None, seed=42, force=True, debug=False,
        max_threads=1, engine="host"))
    discover_command.run(SimpleNamespace(
        genotype_dir=str(tmp_path / "geno"),
        discovery_dir=str(tmp_path / "disco"),
        force=True, debug=False, caller="native"))

    _, final = parse_vcf(tmp_path / "disco" / "final.vcf")
    snps = [(r.chrom, r.pos, r.ref, r.alts) for r in final]
    # the novel SNP rebases to its base-ref coordinate (the graph SNP at
    # 300 is substitution-length-preserving, so coordinates align)
    assert ("chr1", npos + 1, base_ref[npos], (n_alt,)) in snps
