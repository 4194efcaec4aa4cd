"""Per-command directory layouts and file naming.

Parity: gramtools/commands/paths.py:12-242 (ProjectPaths and friends),
with index artifact names adapted to this build's formats.
"""
from __future__ import annotations

import logging
import os
import shutil
from pathlib import Path
from typing import List

log = logging.getLogger("gramtools_tpu")


class CommandError(Exception):
    pass


class ProjectPaths:
    def __init__(self, output_dir: Path, force: bool):
        self.output_dir = Path(output_dir)
        self.made_output_dir = False
        self.force = force

    def check_exists(self, fname: Path, file_description="File"):
        if not Path(fname).exists():
            self.cleanup()
            raise CommandError(f"{file_description} required but not found: {fname}")

    def initial_setup(self):
        if not self.output_dir.exists():
            self.output_dir.mkdir(parents=True)
            self.made_output_dir = True
            return
        if not self.force:
            self.raise_error(
                f"{self.output_dir} already exists.\nRun with --force to overwrite.")
        shutil.rmtree(self.output_dir)
        self.output_dir.mkdir()

    def cleanup(self):
        if self.made_output_dir and self.output_dir.exists():
            shutil.rmtree(self.output_dir)

    def raise_error(self, message):
        self.cleanup()
        raise CommandError(message)

    def dict(self):
        out = {}
        for var, entry in vars(self).items():
            if isinstance(entry, Path):
                out[var] = str(entry)
            elif isinstance(entry, list) and entry and all(
                    isinstance(e, Path) for e in entry):
                out[var] = [str(e) for e in entry]
        return out

    def items(self):
        return {k: Path(v) if isinstance(v, str) else [Path(x) for x in v]
                for k, v in self.dict().items()}.items()


class BuildPaths(ProjectPaths):
    def __init__(self, gram_dir, force=False):
        self.gram_dir = Path(gram_dir).resolve()
        super().__init__(self.gram_dir, force)
        self.prg = self.gram_dir / "prg"
        self.coords_file = self.gram_dir / "prg_coords.tsv"
        self.built_vcf = self.gram_dir / "build.vcf"
        self.report = self.gram_dir / "build_report.json"
        self.fm_index = self.gram_dir / "fm_index.npz"
        self.kmer_index = self.gram_dir / "kmer_index.npz"
        self.built_prg_dirname = self.gram_dir / "built_prgs"
        self.built_prg_bed = self.built_prg_dirname / "built_prgs.bed"

    def setup(self):
        super().initial_setup()
        self.built_prg_dirname.mkdir(exist_ok=True)

    def ready_ref_and_vcf(self, reference, vcfs: List[List[str]]):
        ref = Path(reference).resolve()
        self.check_exists(ref)
        self.ref = ref
        vcf_files = [Path(v) for arglist in vcfs for v in arglist]
        for v in vcf_files:
            self.check_exists(v)
        self.input_vcfs = vcf_files


class GenotypePaths(ProjectPaths):
    def __init__(self, genotype_dir, force=False):
        self.geno_dir = Path(genotype_dir).resolve()
        super().__init__(self.geno_dir, force)
        self.gram_dir = self.geno_dir / "gram_dir"
        self.reads_dir = self.geno_dir / "reads_dir"
        self.report = self.geno_dir / "genotype_report.json"
        self.read_stats = self.geno_dir / "read_stats.json"
        self.debug_info = self.geno_dir / "site_gtyping_debug_info.txt"
        cov = self.geno_dir / "coverage"
        self.allele_sum_cov = cov / "allele_sum_coverage"
        self.gped_cov = cov / "grouped_allele_counts_coverage.json"
        self.pb_cov = cov / "allele_base_coverage.json"
        geno = self.geno_dir / "genotype"
        self.geno_json = geno / "genotyped.json"
        self.geno_vcf = geno / "genotyped.vcf.gz"
        self.pers_ref = geno / "personalised_reference.fasta"
        self.rebasing_map = geno / "rebasing_map.json"

    def setup(self, gram_dir, reads: List[List[str]]):
        super().initial_setup()
        (self.geno_dir / "coverage").mkdir()
        (self.geno_dir / "genotype").mkdir()
        self.reads_dir.mkdir()
        self._link_to_build(gram_dir)
        self._link_to_reads(reads)

    def _link_to_build(self, existing_gram_dir):
        target = Path(existing_gram_dir).resolve()
        self.check_exists(target)
        if os.path.lexists(self.gram_dir):
            os.unlink(self.gram_dir)
        self.gram_dir.symlink_to(target, target_is_directory=True)

    def _link_to_reads(self, reads: List[List[str]]):
        self.reads_files = [Path(r).resolve() for arglist in reads for r in arglist]
        for read_file in self.reads_files:
            self.check_exists(read_file)
            (self.reads_dir / read_file.name).symlink_to(read_file)


class DiscoverPaths(ProjectPaths):
    def __init__(self, discovery_dir, genotype_dir, force=False):
        self.disco_dir = Path(discovery_dir).resolve()
        super().__init__(self.disco_dir, force)
        geno_paths = GenotypePaths(genotype_dir)
        self.pers_ref = geno_paths.pers_ref
        self.geno_vcf = geno_paths.geno_vcf
        self.geno_report = geno_paths.report
        self.rebasing_map = geno_paths.rebasing_map
        self.reads_files = []
        if geno_paths.reads_dir.exists():
            for read_file in geno_paths.reads_dir.iterdir():
                self.reads_files.append(read_file.resolve())
        self.discov_vcf = self.disco_dir / "cortex.vcf"
        self.final_vcf = self.disco_dir / "final.vcf"
        self.report = self.disco_dir / "discover_report.json"

    def setup(self):
        super().initial_setup()
        self.check_exists(self.pers_ref)


class SimulatePaths(ProjectPaths):
    def __init__(self, output_dir, sample_id: str, prg_filepath,
                 induce_genotypes: str = "", force=False):
        self.sim_dir = Path(output_dir).resolve()
        super().__init__(self.sim_dir, force)
        self.prg_fpath = Path(prg_filepath).resolve()
        self.json_out = self.sim_dir / f"{sample_id}.json"
        self.fasta_out = self.sim_dir / f"{sample_id}.fasta"
        self.report = self.sim_dir / "simulate_report.json"
        self.input_multifasta = (
            Path(induce_genotypes).resolve() if induce_genotypes else None)

    def setup(self):
        if not self.sim_dir.exists():
            self.sim_dir.mkdir(parents=True)
            self.made_output_dir = True
        self.check_exists(self.prg_fpath)
        if self.input_multifasta is not None:
            self.check_exists(self.input_multifasta)
        for path in (self.json_out, self.fasta_out):
            if path.exists() and not self.force:
                self.raise_error(
                    f"{path} already exists.\nRun with --force to overwrite.")
