"""coverm-tpu: a TPU-native metagenomic coverage engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of CoverM
(read coverage and relative abundance of genomes/contigs from metagenomic
samples).  Architecture:

  host BAM decode (C++/zlib or pure-python)  ->  packed interval tensors
  ->  device depth engine (scatter-add deltas, tiled prefix-sum, segment
      reductions, depth histograms)           ->  exact estimator suite
  ->  takers (streaming/cached sinks)         ->  printers (TSV contracts)

The output contracts (TSV columns, float formatting, normalisation
formulas) are bit-compatible with CoverM where float semantics allow;
see SURVEY.md for the mapping onto the reference implementation.
"""

__version__ = "0.1.0"

CONCATENATED_FASTA_FILE_SEPARATOR = "~"
