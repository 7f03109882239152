"""Genome exclusion during desharding (genome_exclusion.rs)."""

from __future__ import annotations


class GenomeExclusion:
    def is_excluded(self, contig_name: str) -> bool:
        raise NotImplementedError


class NoExclusionGenomeFilter(GenomeExclusion):
    def is_excluded(self, contig_name: str) -> bool:
        return False


class SeparatorGenomeExclusionFilter(GenomeExclusion):
    def __init__(self, excluded_genomes, separator="~"):
        self.excluded = set(excluded_genomes)
        self.separator = separator

    def is_excluded(self, contig_name: str) -> bool:
        genome = contig_name.split(self.separator, 1)[0]
        return genome in self.excluded


class GenomesAndContigsExclusionFilter(GenomeExclusion):
    def __init__(self, genomes_and_contigs):
        self.gc = genomes_and_contigs

    def is_excluded(self, contig_name: str) -> bool:
        return self.gc.genome_index_of_contig(contig_name) is not None
