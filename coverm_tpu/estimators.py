"""Coverage estimator suite.

Each estimator consumes integer per-entity statistics (accumulated over
the observed contigs of a contig/genome entity) plus the list of
unobserved contig lengths, and reproduces the reference's exact f32
arithmetic (mosdepth_genome_coverage_estimators.rs):

  mean            :532-565   trimmed_mean      :566-647
  coverage_histogram (pileup) :648-678, print :952-967
  covered_fraction:679-695   covered_bases     :696-712
  rpkm            :713-737   tpm               :738-763
  variance (shifted, sample) :764-813          length :814-817
  count           :818       reads_per_base    :819-826
  anir            :827-836

All accumulators in the reference are u64/f64; floats only appear in the
final expressions, so results here are bit-identical.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

f32 = np.float32
f64 = np.float64


def unobserved_bases(unobserved_lengths, contig_end_exclusion: int) -> int:
    """calculate_unobserved_bases (estimators.rs:226-243).

    Note the quirk: an unobserved contig shorter than 2*exclusion
    contributes its *full* length (not zero)."""
    e = 2 * contig_end_exclusion
    total = 0
    for l in unobserved_lengths:
        total += l if l < e else l - e
    return int(total)


@dataclass
class EntityStats:
    """Integer statistics accumulated over an entity's observed contigs.

    Mirrors the union of the reference estimator states after their
    add_contig calls (estimators.rs:366-528)."""

    # Mean-group state (only contigs with len > 2*exclusion contribute
    # bases/count/covered; reads and mismatches always accumulate)
    total_count: int = 0        # Σ depth inside exclusion window
    total_bases_window: int = 0  # Σ (len - 2*exclusion)
    covered_window: int = 0     # positions depth>0 inside window
    # fraction-group state (full contig, no exclusion)
    total_bases_full: int = 0   # Σ len over observed contigs
    covered_full: int = 0       # positions depth>0 anywhere
    # histogram-group state (inside exclusion window)
    hist: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    # length-group state
    observed_length_full: int = 0  # Σ len over observed contigs
    # read-level
    reads: int = 0              # mode-appropriate mapped-read count
    mismatches: int = 0         # Σ (NM - indels)
    sum_identity: float = 0.0   # Σ (aligned-NM)/aligned  (f64)
    # unobserved contigs of this entity
    unobserved_lengths: list = field(default_factory=list)

    def hist_trimmed(self) -> np.ndarray:
        """Reference counts vec: length = max observed depth + 1."""
        nz = np.flatnonzero(self.hist)
        if nz.size == 0:
            return self.hist[:1] if self.total_bases_window > 0 else self.hist[:0]
        return self.hist[: nz[-1] + 1]


class Estimator:
    """Base estimator: configuration + pure functions over EntityStats."""

    headers: tuple = ()
    uses_window = False   # needs exclusion-window stats
    uses_hist = False     # needs the depth histogram

    def calculate(self, s: EntityStats) -> np.float32:
        raise NotImplementedError

    def zero_entry_value(self, entry_length: int):
        """Value used by print_zero_coverage (estimators.rs:971-991).
        None means 0.0; Length overrides."""
        return f32(0.0)


@dataclass
class MeanEstimator(Estimator):
    min_fraction_covered_bases: float = 0.0
    contig_end_exclusion: int = 0
    exclude_mismatches: bool = False
    headers = ("Mean",)
    uses_window = True

    def calculate(self, s: EntityStats) -> np.float32:
        final_total = s.total_bases_window + unobserved_bases(
            s.unobserved_lengths, self.contig_end_exclusion)
        if final_total == 0 or (
            f32(s.covered_window) / f32(final_total) < f32(self.min_fraction_covered_bases)
        ):
            return f32(0.0)
        numer = s.total_count - s.mismatches if self.exclude_mismatches else s.total_count
        return f32(numer) / f32(final_total)


@dataclass
class TrimmedMeanEstimator(Estimator):
    trim_min: float = 0.05
    trim_max: float = 0.95
    min_fraction_covered_bases: float = 0.0
    contig_end_exclusion: int = 0
    headers = ("Trimmed Mean",)
    uses_window = True
    uses_hist = True

    def calculate(self, s: EntityStats) -> np.float32:
        unobs = unobserved_bases(s.unobserved_lengths, self.contig_end_exclusion)
        total_bases = s.total_bases_window + unobs
        if total_bases == 0:
            return f32(0.0)
        if f32(s.covered_window) / f32(total_bases) < f32(self.min_fraction_covered_bases):
            return f32(0.0)
        min_index = int(math.floor(f32(self.trim_min) * f32(total_bases)))
        max_index = int(math.ceil(f32(self.trim_max) * f32(total_bases)))
        if s.covered_window == 0:
            return f32(0.0)
        counts = s.hist_trimmed().copy()
        if counts.size == 0:
            counts = np.zeros(1, dtype=np.int64)
        counts[0] += unobs
        # histogram CDF walk, exactly estimators.rs:598-643
        num_accounted_for = 0
        total = 0
        started = False
        for i, num_covered in enumerate(counts.tolist()):
            num_accounted_for += num_covered
            if num_accounted_for >= min_index:
                if started:
                    if num_accounted_for > max_index:
                        num_excess = num_accounted_for - num_covered
                        num_wanted = (
                            max_index - num_excess + 1 if max_index >= num_excess else 0
                        )
                        total += num_wanted * i
                        break
                    else:
                        total += num_covered * i
                elif num_accounted_for > max_index:
                    # all coverages are the same in the trimmed set
                    total = (max_index - min_index + 1) * i
                    started = True
                elif num_accounted_for < min_index:
                    pass
                else:
                    num_wanted = num_accounted_for - min_index + 1
                    total = num_wanted * i
                    started = True
        return f32(total) / f32(max_index - min_index)


@dataclass
class PileupCountsEstimator(Estimator):
    min_fraction_covered_bases: float = 0.0
    contig_end_exclusion: int = 0
    headers = ("Coverage", "Bases")
    uses_window = True
    uses_hist = True

    def calculate(self, s: EntityStats) -> np.float32:
        if s.total_bases_window == 0:
            return f32(0.0)
        total_bases = s.total_bases_window + unobserved_bases(
            s.unobserved_lengths, self.contig_end_exclusion)
        if f32(s.covered_window) / f32(total_bases) < f32(self.min_fraction_covered_bases):
            return f32(0.0)
        # "Hack": the number of zero-coverage bases + 1 (estimators.rs:671-674)
        return f32(total_bases - s.covered_window + 1)

    def histogram_rows(self, coverage: np.float32, s: EntityStats):
        """Rows for print_coverage (estimators.rs:952-967): (depth, count)."""
        counts = s.hist_trimmed()
        rows = []
        for i, num_covered in enumerate(counts.tolist()):
            if i == 0:
                c = int(np.floor(coverage))
                rows.append((0, 0 if c == 0 else c - 1))
            else:
                rows.append((i, num_covered))
        return rows


@dataclass
class CoveredFractionEstimator(Estimator):
    min_fraction_covered_bases: float = 0.0
    headers = ("Covered Fraction",)

    def calculate(self, s: EntityStats) -> np.float32:
        final_total = s.total_bases_full + sum(s.unobserved_lengths)
        if final_total == 0 or (
            f32(s.covered_full) / f32(final_total) < f32(self.min_fraction_covered_bases)
        ):
            return f32(0.0)
        return f32(s.covered_full) / f32(final_total)


@dataclass
class CoveredBasesEstimator(Estimator):
    min_fraction_covered_bases: float = 0.0
    headers = ("Covered Bases",)

    def calculate(self, s: EntityStats) -> np.float32:
        final_total = s.total_bases_full + sum(s.unobserved_lengths)
        if final_total == 0 or (
            f32(s.covered_full) / f32(final_total) < f32(self.min_fraction_covered_bases)
        ):
            return f32(0.0)
        return f32(s.covered_full)


@dataclass
class RPKMEstimator(Estimator):
    min_fraction_covered_bases: float = 0.0
    headers = ("RPKM",)

    def calculate(self, s: EntityStats) -> np.float32:
        final_total = s.total_bases_full + sum(s.unobserved_lengths)
        if final_total == 0 or (
            f32(s.covered_full) / f32(final_total) < f32(self.min_fraction_covered_bases)
        ):
            return f32(0.0)
        # Pre-normalisation: reads*1e9/len; divided by mapped reads in the
        # printer (estimators.rs:727-735)
        return f32(s.reads * 10**9) / f32(final_total)


@dataclass
class TPMEstimator(Estimator):
    min_fraction_covered_bases: float = 0.0
    headers = ("TPM",)

    def calculate(self, s: EntityStats) -> np.float32:
        final_total = s.total_bases_full + sum(s.unobserved_lengths)
        if final_total == 0 or (
            f32(s.covered_full) / f32(final_total) < f32(self.min_fraction_covered_bases)
        ):
            return f32(0.0)
        if s.reads == 0:
            # ln(0) = -inf -> exp = 0 in the reference too
            return f32(0.0)
        return f32(np.exp(np.log(f64(s.reads)) - np.log(f64(final_total))))


@dataclass
class VarianceEstimator(Estimator):
    min_fraction_covered_bases: float = 0.0
    contig_end_exclusion: int = 0
    headers = ("Variance",)
    uses_window = True
    uses_hist = True

    def calculate(self, s: EntityStats) -> np.float32:
        unobs = unobserved_bases(s.unobserved_lengths, self.contig_end_exclusion)
        total_bases = s.total_bases_window + unobs
        if total_bases == 0:
            return f32(0.0)
        counts = s.hist_trimmed()
        if (
            f32(s.covered_window) / f32(total_bases) < f32(self.min_fraction_covered_bases)
            or total_bases < 3
            or counts.size == 0
        ):
            return f32(0.0)
        counts = counts.copy()
        counts[0] += unobs
        # shifted (sample) variance, estimators.rs:788-809
        k = 0
        clist = counts.tolist()
        while clist[k] == 0:
            k += 1
        ex = 0
        ex2 = 0
        for x, nc in enumerate(clist):
            if nc == 0:
                continue
            ex += (x - k) * nc
            ex2 += (x - k) * (x - k) * nc
        return (f32(ex2) - f32(ex * ex) / f32(total_bases)) / f32(total_bases - 1)


@dataclass
class LengthEstimator(Estimator):
    headers = ("Length",)

    def calculate(self, s: EntityStats) -> np.float32:
        return f32(s.observed_length_full + sum(s.unobserved_lengths))

    def zero_entry_value(self, entry_length: int):
        return f32(entry_length)


@dataclass
class ReadCountEstimator(Estimator):
    headers = ("Read Count",)

    def calculate(self, s: EntityStats) -> np.float32:
        return f32(s.reads)


@dataclass
class ReadsPerBaseEstimator(Estimator):
    headers = ("Reads per base",)

    def calculate(self, s: EntityStats) -> np.float32:
        return f32(s.reads) / f32(
            s.observed_length_full + sum(s.unobserved_lengths))


@dataclass
class ANIrEstimator(Estimator):
    headers = ("ANIr",)

    def calculate(self, s: EntityStats) -> np.float32:
        if s.reads == 0:
            return f32(0.0)
        return f32(f64(s.sum_identity) / f64(s.reads))


@dataclass
class StrobealignAembEstimator(Estimator):
    """Passthrough for `-m strobealign-aemb` (strobealign_aemb.rs)."""
    headers = ("Strobealign aemb",)

    def calculate(self, s: EntityStats) -> np.float32:
        raise RuntimeError("strobealign-aemb coverage comes from the mapper output")


def any_needs_hist(estimators) -> bool:
    return any(e.uses_hist for e in estimators)
