"""Property-based pipeline fuzz: random nested PRGs + sampled reads
through build -> quasimap -> genotype -> outputs, asserting structural
invariants.
"""
import gzip
import json

import numpy as np
import pytest

from gramtools_tpu.cli import run
from gramtools_tpu.prg.check_ref import get_first_prg_path
from gramtools_tpu.prg.graph import build_cov_graph
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints

from test_search_jax import random_prg


def sample_path_reads(rng, graph, n_reads, read_len):
    """Random haplotype walks through the graph, sliced into reads."""
    seqs = []
    for _ in range(6):
        parts = []
        cur = graph.root
        while graph.node(cur).edges:
            node = graph.node(cur)
            if node.is_bubble_start():
                cur = node.edges[rng.randint(len(node.edges))]
                continue
            if node.seq_size:
                parts.append(node.seq_str())
            cur = node.edges[0]
        seqs.append("".join(parts))
    reads = []
    for _ in range(n_reads):
        seq = seqs[rng.randint(len(seqs))]
        if len(seq) <= read_len:
            reads.append(seq)
        else:
            start = rng.randint(len(seq) - read_len)
            reads.append(seq[start : start + read_len])
    return reads


@pytest.mark.parametrize("seed", [11, 23, 37, 51])
def test_pipeline_invariants(tmp_path, seed):
    rng = np.random.RandomState(seed)
    try:
        prg_str = random_prg(rng, num_sites=6, nested=True)
        prg = PrgString(prg_string_to_ints(prg_str))
        graph = build_cov_graph(prg)
    except ValueError:
        pytest.skip("inconsistent random PRG")

    prg_file = tmp_path / "prg.bin"
    prg.write(prg_file)
    ref = tmp_path / "ref.fa"
    ref_seq = get_first_prg_path(graph)
    ref.write_text(f">chr1\n{ref_seq}\n")
    reads_file = tmp_path / "reads.fastq"
    reads = sample_path_reads(rng, graph, 30, 12)
    with open(reads_file, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")

    assert run(["build", "--gram_dir", str(tmp_path / "gram"),
                "--prg", str(prg_file), "--ref", str(ref),
                "--kmer_size", "4", "--force"]) == 0
    assert run(["genotype", "--gram_dir", str(tmp_path / "gram"),
                "--genotype_dir", str(tmp_path / "geno"),
                "--reads", str(reads_file), "--sample_id", "fuzz",
                "--seed", "3", "--force"]) == 0

    geno = tmp_path / "geno" / "genotype"
    j = json.load(open(geno / "genotyped.json"))

    # invariant: one jVCF site per graph bubble, GT indices within ALS
    assert len(j["Sites"]) == graph.num_sites
    for site in j["Sites"]:
        gts = site["GT"][0]
        if gts != [None]:
            for gt in gts:
                assert 0 <= gt < len(site["ALS"])

    # invariant: the personalised reference is a concatenation of graph
    # path sequences (spot check: same length class and ACGT alphabet)
    pers = (geno / "personalised_reference.fasta").read_text()
    seq = "".join(l for l in pers.splitlines() if not l.startswith(">"))
    assert set(seq) <= set("ACGT")

    # invariant: VCF parses and records reference level-1 sites in order
    vcf_lines = gzip.open(geno / "genotyped.vcf.gz", "rt").read().splitlines()
    records = [l.split("\t") for l in vcf_lines if not l.startswith("#")]
    level1 = [b for b in graph.bubbles
              if graph.node(b[0]).site_id not in graph.par_map]
    assert len(records) == len(level1)
    positions = [int(r[1]) for r in records]
    assert positions == sorted(positions)

    # invariant: rebasing map loads and is navigable
    from gramtools_tpu.commands.seq_region_map import (
        BisectTarget, SearchableSeqRegionsMap)
    smap = SearchableSeqRegionsMap.load_from(geno / "rebasing_map.json")
    assert smap.bisect("chr1", 1, BisectTarget.PERS_REF) == 0


@pytest.mark.parametrize("seed", [5, 19])
def test_pipeline_invariants_diploid(tmp_path, seed):
    rng = np.random.RandomState(seed)
    try:
        prg_str = random_prg(rng, num_sites=4, nested=True)
        prg = PrgString(prg_string_to_ints(prg_str))
        graph = build_cov_graph(prg)
    except ValueError:
        pytest.skip("inconsistent random PRG")
    prg_file = tmp_path / "prg.bin"
    prg.write(prg_file)
    ref = tmp_path / "ref.fa"
    ref.write_text(f">chr1\n{get_first_prg_path(graph)}\n")
    reads_file = tmp_path / "reads.fastq"
    reads = sample_path_reads(rng, graph, 40, 10)
    with open(reads_file, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    assert run(["build", "--gram_dir", str(tmp_path / "gram"),
                "--prg", str(prg_file), "--ref", str(ref),
                "--kmer_size", "4", "--force"]) == 0
    assert run(["genotype", "--gram_dir", str(tmp_path / "gram"),
                "--genotype_dir", str(tmp_path / "geno"),
                "--reads", str(reads_file), "--sample_id", "fuzz",
                "--ploidy", "diploid", "--seed", "3", "--force"]) == 0
    j = json.load(open(tmp_path / "geno" / "genotype" / "genotyped.json"))
    for site in j["Sites"]:
        gts = site["GT"][0]
        if gts != [None]:
            assert len(gts) == 2
            for gt in gts:
                assert 0 <= gt < len(site["ALS"])
