"""End-to-end CLI pipeline tests: build -> genotype -> simulate -> discover."""
import gzip
import json
from pathlib import Path

import pytest

from gramtools_tpu.cli import run

DATA_DIR = Path("/root/reference/gramtools/tests/integration_test_data")

pytestmark = pytest.mark.skipif(
    not DATA_DIR.exists(), reason="reference fixtures not available")


@pytest.fixture(scope="module")
def it1_run(tmp_path_factory):
    base = DATA_DIR / "IT1"
    root = tmp_path_factory.mktemp("it1")
    assert run(["build", "--gram_dir", str(root / "gram"),
                "--prg", str(base / "prg.bin"), "--ref", str(base / "ref.fa"),
                "--kmer_size", "5", "--force"]) == 0
    assert run(["genotype", "--gram_dir", str(root / "gram"),
                "--genotype_dir", str(root / "geno"),
                "--reads", str(base / "reads.fastq"),
                "--sample_id", "test", "--force"]) == 0
    return root


def test_genotype_outputs_exist(it1_run):
    geno = it1_run / "geno"
    for f in ["genotype/genotyped.vcf.gz", "genotype/genotyped.json",
              "genotype/personalised_reference.fasta",
              "genotype/rebasing_map.json", "read_stats.json",
              "coverage/allele_base_coverage.json",
              "coverage/grouped_allele_counts_coverage.json",
              "coverage/allele_sum_coverage", "genotype_report.json"]:
        assert (geno / f).exists(), f


def test_genotype_calls_it1(it1_run):
    """PRG AAA[CC,TA]AC[TTTT,GGG]; reads AAATAACGG + CACTTTT map TA and
    TTTT respectively; per-base coverage favours TA (1,1 vs 0,1) and TTTT."""
    j = json.load(open(it1_run / "geno" / "genotype" / "genotyped.json"))
    sites = j["Sites"]
    assert sites[0]["ALS"][sites[0]["GT"][0][0]] == "TA"
    assert sites[1]["ALS"][sites[1]["GT"][0][0]] == "TTTT"
    assert j["Lvl1_Sites"] == ["all"]


def test_personalised_ref_it1(it1_run):
    text = (it1_run / "geno" / "genotype" /
            "personalised_reference.fasta").read_text()
    assert "AAATAACTTTT" in text.replace("\n", "").split(">")[1]


def test_vcf_records_it1(it1_run):
    vcf = gzip.open(it1_run / "geno" / "genotype" / "genotyped.vcf.gz",
                    "rt").read()
    records = [l for l in vcf.splitlines() if not l.startswith("#")]
    assert len(records) == 2
    cols0 = records[0].split("\t")
    assert cols0[0] == "ref" and cols0[1] == "4"
    assert cols0[3] == "CC" and cols0[4] == "TA"
    assert cols0[9].startswith("1:2:1,1:PASS")


def test_genotype_nested_it3(tmp_path):
    base = DATA_DIR / "IT3"
    assert run(["build", "--gram_dir", str(tmp_path / "gram"),
                "--prg", str(base / "prg.bin"), "--ref", str(base / "ref.fa"),
                "--kmer_size", "5", "--force"]) == 0
    assert run(["genotype", "--gram_dir", str(tmp_path / "gram"),
                "--genotype_dir", str(tmp_path / "geno"),
                "--reads", str(base / "reads.fastq"),
                "--sample_id", "test", "--force"]) == 0
    j = json.load(open(tmp_path / "geno" / "genotype" / "genotyped.json"))
    # nested PRG: child map and level-1 sites are reported
    assert j["Lvl1_Sites"] == [0]
    assert j["Child_Map"] == {"0": {"0": [1]}}


def test_genotype_diploid_it1(it1_run, tmp_path):
    base = DATA_DIR / "IT1"
    assert run(["genotype", "--gram_dir", str(it1_run / "gram"),
                "--genotype_dir", str(tmp_path / "geno"),
                "--reads", str(base / "reads.fastq"),
                "--sample_id", "t", "--ploidy", "diploid", "--force"]) == 0
    j = json.load(open(tmp_path / "geno" / "genotype" / "genotyped.json"))
    # one read on each allele of each site: heterozygous calls
    assert j["Sites"][0]["GT"] == [[0, 1]]
    assert j["Sites"][1]["GT"] == [[0, 1]]
    # diploid personalised ref: one sequence per haplotype
    pers = (tmp_path / "geno" / "genotype" /
            "personalised_reference.fasta").read_text()
    assert pers.count(">") == 2


def test_simulate_paths(it1_run, tmp_path):
    assert run(["simulate", "--prg", str(it1_run / "gram" / "prg"),
                "-o", str(tmp_path), "-n", "30", "--sample_id", "sim",
                "--seed", "1", "--force"]) == 0
    j = json.load(open(tmp_path / "sim.json"))
    fasta = (tmp_path / "sim.fasta").read_text()
    # 4 possible paths through 2 biallelic sites
    n_samples = len(j["Samples"])
    assert 1 <= n_samples <= 4
    assert fasta.count(">") == n_samples
    assert j["Model"] == "Simulated_Path"


def test_simulate_induce_genotypes(it1_run, tmp_path):
    fasta = tmp_path / "seqs.fa"
    fasta.write_text(">s1\nAAATAACTTTTAC\n")
    assert run(["simulate", "--prg", str(it1_run / "gram" / "prg"),
                "-o", str(tmp_path), "--sample_id", "induced",
                "--induce_genotypes", str(fasta), "--force"]) == 0
    j = json.load(open(tmp_path / "induced.json"))
    sites = j["Sites"]
    assert sites[0]["GT"] == [[1]]          # TA (alt)
    assert sites[0]["ALS"] == ["CC", "TA"]
    assert sites[1]["GT"] == [[0]]          # TTTT (ref)


def test_build_from_prgs_bed_and_genotype(tmp_path):
    """--prgs_bed CLI path: MSA region + invariant flanks -> genotype."""
    ref = tmp_path / "ref.fa"
    ref.write_text(">c1\nAAAATTTTCCCCGGGG\n")
    msa = tmp_path / "region1.msa.fa"
    msa.write_text(">s1\nTTTT\n>s2\nTATT\n")
    bed = tmp_path / "regions.bed"
    bed.write_text(f"c1\t4\t8\t{msa}\n")
    assert run(["build", "--gram_dir", str(tmp_path / "gram"),
                "--prgs_bed", str(bed), "--ref", str(ref),
                "--kmer_size", "4", "--force"]) == 0
    reads = tmp_path / "reads.fastq"
    reads.write_text("@r0\nAAAATATTCCCC\n+\nIIIIIIIIIIII\n" * 1)
    assert run(["genotype", "--gram_dir", str(tmp_path / "gram"),
                "--genotype_dir", str(tmp_path / "geno"),
                "--reads", str(reads), "--sample_id", "s", "--force"]) == 0
    # the MSA collapses to a single SNP column: T[T,A]TT
    j = json.load(open(tmp_path / "geno" / "genotype" / "genotyped.json"))
    called = j["Sites"][0]["ALS"][j["Sites"][0]["GT"][0][0]]
    assert called == "A"
    pers = (tmp_path / "geno" / "genotype" /
            "personalised_reference.fasta").read_text()
    assert "AAAATATTCCCCGGGG" in pers.replace("\n", "")


def test_discover_with_precomputed_vcf(it1_run, tmp_path):
    # variant against pers ref AAATAACTTTT: pos 6 A->G (inside invariant)
    discov = tmp_path / "discov.vcf"
    discov.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "ref\t6\t.\tA\tG\t.\tPASS\t.\n")
    assert run(["discover", "--genotype_dir", str(it1_run / "geno"),
                "--discovery_dir", str(tmp_path / "disco"),
                "--discov_vcf", str(discov), "--force"]) == 0
    final = (tmp_path / "disco" / "final.vcf").read_text()
    records = [l for l in final.splitlines() if not l.startswith("#")]
    assert len(records) == 1
    cols = records[0].split("\t")
    # pers pos 6 is in the invariant region after the 2bp site: base pos 6
    assert cols[0] == "ref" and cols[1] == "6" and cols[3] == "A" and cols[4] == "G"
