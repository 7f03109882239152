"""Coverage run modes: per-contig, per-genome (separator / named).

The scan layer produces per-contig integer statistics; these functions
aggregate them into entities (contigs or genomes), evaluate the
estimator suite, and drive the taker exactly like the reference's
streaming loops do (contig.rs:13-253, genome.rs:17-322, genome.rs:419-797),
including zero-coverage back-fill and per-sample ReadsMapped accounting.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass

import numpy as np

from .estimators import (EntityStats, Estimator, PileupCountsEstimator,
                         TrimmedMeanEstimator, any_needs_hist,
                         any_needs_hist_batch)
from .flags import FlagFilter
from .io.bam import BamReader
from .ops.depth import ReferenceLayout, start_transfer_warmup
from .printers import ReadsMapped
from .scan import SampleScan, scan_any, scan_sample

logger = logging.getLogger("coverm_tpu")


def _log_reads_mapped(stoit_name, rm, elapsed=None):
    pct = (rm.num_mapped_reads * 100) / rm.num_reads if rm.num_reads else float("nan")
    logger.info(
        "In sample '%s', found %d reads mapped out of %d total (%.2f%%)",
        stoit_name, rm.num_mapped_reads, rm.num_reads, pct)
    if elapsed:
        # reads/s is the north-star throughput metric (SURVEY.md §5/§6)
        logger.info("Sample '%s' scanned in %.2fs (%s aligned reads/s)",
                    stoit_name, elapsed,
                    f"{rm.num_reads / elapsed:,.0f}" if rm.num_reads else "-")
    if rm.num_reads == 0:
        logger.warning(
            "No primary alignments were observed for sample %s - perhaps "
            "something went wrong in the mapping?", stoit_name)


# BAMs whose compressed size exceeds this stream in bounded memory
# (contig-boundary batches) instead of whole-file decode
STREAM_THRESHOLD_BYTES = int(os.environ.get(
    "COVERM_TPU_STREAM_THRESHOLD", 1 << 29))


@dataclass
class BamFileSource:
    """A pre-made sorted BAM file (bam_generator.rs:103-144)."""

    path: str
    stoit_name: str = None

    def __post_init__(self):
        if self.stoit_name is None:
            base = os.path.basename(self.path)
            if base.endswith(".bam"):
                base = base[: -len(".bam")]
            self.stoit_name = base

    @property
    def name(self):
        return self.stoit_name

    def read(self):
        if os.path.getsize(self.path) >= STREAM_THRESHOLD_BYTES:
            from .io.bam import BamStreamReader
            return BamStreamReader(self.path).read()
        r = BamReader(self.path)
        return r.header, r.batch

    def finish(self):
        pass


def _entity_stats(scan: SampleScan, layout: ReferenceLayout, observed_tids,
                  unobserved_tids, reads, identity, contig_mode=False) -> EntityStats:
    lens = layout.lengths[observed_tids]
    ee = layout.contig_end_exclusion
    long_enough = lens > 2 * ee
    d = scan.depth
    s = EntityStats()
    s.total_count = int(d.sum_depth_window[observed_tids].sum())
    s.total_bases_window = int((lens[long_enough] - 2 * ee).sum())
    s.covered_window = int(d.covered_window[observed_tids].sum())
    s.total_bases_full = int(lens.sum())
    s.covered_full = int(d.covered_full[observed_tids].sum())
    s.observed_length_full = int(lens.sum())
    s.reads = int(reads[observed_tids].sum())
    s.mismatches = int(scan.mismatches[observed_tids].sum())
    s.sum_identity = float(identity[observed_tids].sum())
    if d.hist is not None:
        s.hist = d.hist[observed_tids].sum(axis=0)
    if contig_mode:
        s.unobserved_lengths = [0]
    else:
        s.unobserved_lengths = [int(l) for l in layout.lengths[unobserved_tids]]
    return s


def _batch_stats(scan: SampleScan, layout: ReferenceLayout):
    """Column-wise per-contig stats for the vectorised contig mode."""
    from .estimators import BatchStats
    lens = layout.lengths
    ee = layout.contig_end_exclusion
    d = scan.depth
    return BatchStats(
        total_count=d.sum_depth_window,
        total_bases_window=np.where(lens > 2 * ee, lens - 2 * ee, 0),
        covered_window=d.covered_window,
        total_bases_full=lens,
        covered_full=d.covered_full,
        observed_length_full=lens,
        reads=scan.reads_primary,
        mismatches=scan.mismatches,
        sum_identity=scan.identity_sum_primary,
        hist=d.hist,
        sumsq_window=d.sumsq_window,
        min_depth_window=d.min_depth_window,
        trimmed_sum=d.trimmed_sum,
    )


def _scanned(sources, layout_for_fn, flag_filter, need_hist, trim=None):
    """Yield (source, header, layout, scan, scan_seconds) in source order.

    With multiple local devices, samples are scanned CONCURRENTLY, one
    per device (sample data parallelism — the mesh analogue of the
    reference's serial multi-sample loop, SURVEY.md §2.3); the big
    record batches stay inside the worker and only the small per-contig
    statistics are retained.  With one device, the prefetch pipeline
    overlaps host decode with device compute instead.
    """
    import jax

    devs = jax.local_devices()
    workers = min(len(sources), len(devs))
    if workers <= 1:
        for s, (header, payload) in _prefetched(sources):
            t0 = time.perf_counter()
            layout = layout_for_fn(header)
            scan = scan_any(header, payload, layout, flag_filter,
                            need_hist, trim=trim)
            yield s, header, layout, scan, time.perf_counter() - t0
        return

    from concurrent.futures import ThreadPoolExecutor

    def job(i, s):
        t0 = time.perf_counter()
        with jax.default_device(devs[i % len(devs)]):
            header, payload = s.read()
            layout = layout_for_fn(header)
            scan = scan_any(header, payload, layout, flag_filter,
                            need_hist, trim=trim)
        return s, header, layout, scan, time.perf_counter() - t0

    with ThreadPoolExecutor(max_workers=workers) as ex:
        futures = [ex.submit(job, i, s) for i, s in enumerate(sources)]
        for f in futures:
            yield f.result()


def _prefetched(sources):
    """Overlap host BAM decode of sample i+1 with compute of sample i
    (the pipeline-parallelism analogue of the reference's
    mapper|sort|scan subprocess overlap, SURVEY.md §2.3)."""
    import queue
    import threading

    if len(sources) <= 1:
        for s in sources:
            yield s, s.read()
        return
    q = queue.Queue(maxsize=1)

    def worker():
        for s in sources:
            try:
                q.put((s, s.read(), None))
            except BaseException as e:  # surface errors in the main thread
                q.put((s, None, e))
                return
        q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            return
        s, hb, err = item
        if err is not None:
            raise err
        yield s, hb


def _emit_entry(taker, estimators, coverages, stats_list):
    """print_coverage per estimator (estimators.rs:936-969)."""
    for est, cov, st in zip(estimators, coverages, stats_list):
        if isinstance(est, PileupCountsEstimator):
            for depth_v, count in est.histogram_rows(cov, st):
                taker.add_coverage_entry(depth_v, count)
        else:
            taker.add_single_coverage(cov)


def _emit_zero_entry(taker, estimators, entry_length):
    """print_zero_coverage per estimator (estimators.rs:971-991)."""
    for est in estimators:
        if isinstance(est, PileupCountsEstimator):
            continue
        taker.add_single_coverage(est.zero_entry_value(entry_length))


def contig_coverage(sources, taker, estimators, print_zero_coverage_contigs,
                    flag_filter: FlagFilter, threads: int = 1,
                    layout_cache=None):
    """`coverm contig` engine. Returns per-sample ReadsMapped."""
    reads_mapped_vector = []
    has_pileup = any(isinstance(e, PileupCountsEstimator) for e in estimators)
    # the vectorised path derives variance from moments and trimmed_mean
    # from device rank queries, so the (large at assembly scale)
    # histogram is only computed for coverage_histogram output or when
    # several different trim windows are requested at once
    trims = {(float(e.trim_min), float(e.trim_max)) for e in estimators
             if isinstance(e, TrimmedMeanEstimator)}
    use_trim = (not has_pileup) and len(trims) == 1
    trim = next(iter(trims)) if use_trim else None
    need_hist = (any_needs_hist(estimators) if has_pileup
                 else (any_needs_hist_batch(estimators) and not use_trim))
    ee = _exclusion_of(estimators)
    start_transfer_warmup()
    layout_for_fn = lambda header: _layout_for(header, ee, layout_cache)
    for source, header, layout, scan, t_scan in _scanned(
            sources, layout_for_fn, flag_filter, need_hist, trim):
        taker.start_stoit(source.name)
        npo = getattr(source, "num_primary_override", None)
        if npo is not None:
            scan.num_detected_primary_alignments = npo

        num_mapped_total = 0
        if not has_pileup:
            # vectorised path: one numpy pass per estimator instead of a
            # Python loop per contig (the loop costs ~100us/contig, which
            # dominates assembly-scale runs)
            bs = _batch_stats(scan, layout)
            cov_matrix = np.stack(
                [e.calculate_batch(bs) for e in estimators])  # [E, C]
            nonzero_v = (cov_matrix > 0.0).any(axis=0)
            num_mapped_total = int(
                scan.reads_primary[scan.observed & nonzero_v].sum())
            emit = (np.arange(header.n_ref)
                    if print_zero_coverage_contigs else
                    np.flatnonzero(scan.observed & nonzero_v))
            for tid in emit:
                tid = int(tid)
                if scan.observed[tid] and (print_zero_coverage_contigs
                                           or nonzero_v[tid]):
                    taker.start_entry(tid, header.target_names[tid])
                    for cov in cov_matrix[:, tid]:
                        taker.add_single_coverage(cov)
                    taker.finish_entry()
                elif not scan.observed[tid]:
                    taker.start_entry(tid, header.target_names[tid])
                    _emit_zero_entry(taker, estimators,
                                     int(header.target_lens[tid]))
                    taker.finish_entry()
        else:
            for tid in range(header.n_ref):
                if scan.observed[tid]:
                    st = _entity_stats(scan, layout, np.array([tid]), None,
                                       scan.reads_primary,
                                       scan.identity_sum_primary, contig_mode=True)
                    coverages = [e.calculate(st) for e in estimators]
                    nonzero = any(c > 0.0 for c in coverages)
                    if nonzero:
                        num_mapped_total += int(scan.reads_primary[tid])
                    if print_zero_coverage_contigs or nonzero:
                        taker.start_entry(tid, header.target_names[tid])
                        _emit_entry(taker, estimators, coverages, [st] * len(estimators))
                        taker.finish_entry()
                elif print_zero_coverage_contigs:
                    taker.start_entry(tid, header.target_names[tid])
                    _emit_zero_entry(taker, estimators, int(header.target_lens[tid]))
                    taker.finish_entry()

        rm = ReadsMapped(
            num_mapped_reads=num_mapped_total,
            num_reads=scan.num_detected_primary_alignments)
        _log_reads_mapped(source.name, rm, t_scan)
        reads_mapped_vector.append(rm)
        source.finish()
    return reads_mapped_vector


def genome_coverage_separator(sources, separator: str, taker, estimators,
                              print_zero_coverage_genomes,
                              flag_filter: FlagFilter, single_genome=False,
                              threads: int = 1, layout_cache=None):
    """`coverm genome -s <sep>` engine (genome.rs:419-797)."""
    reads_mapped_vector = []
    need_hist = any_needs_hist(estimators)
    ee = _exclusion_of(estimators)
    start_transfer_warmup()
    layout_for_fn = lambda header: _layout_for(header, ee, layout_cache)
    for source, header, layout, scan, t_scan in _scanned(
            sources, layout_for_fn, flag_filter, need_hist):
        taker.start_stoit(source.name)
        npo = getattr(source, "num_primary_override", None)
        if npo is not None:
            scan.num_detected_primary_alignments = npo

        # genome of each tid
        if single_genome:
            genome_of = ["genome1"] * header.n_ref
        else:
            genome_of = []
            for name in header.target_names:
                if separator not in name:
                    raise ValueError(
                        f"Contig name {name} does not contain split symbol, so "
                        "cannot determine which genome it belongs to")
                genome_of.append(name.split(separator, 1)[0])

        # group contigs by genome, ordered by first tid
        groups = {}
        for tid, g in enumerate(genome_of):
            groups.setdefault(g, []).append(tid)
        ordered = sorted(groups.items(), key=lambda kv: kv[1][0])

        num_mapped_total = 0
        # The reference still zero-fills every genome when there are primary
        # alignments but none pass/map (genome.rs:731-778 via
        # print_previous_zero_coverage_genomes2 with last_genome=None).
        any_entries = scan.observed.any() or scan.num_detected_primary_alignments > 0
        if single_genome and not scan.observed.any():
            # quirk parity (genome.rs:739-778): a single-genome run with no
            # passing mapped reads emits one zero row for "genome1" whose
            # unobserved set excludes tid 0 and whose zero entry_length is 9.
            if any_entries and print_zero_coverage_genomes:
                st = _entity_stats(scan, layout, np.empty(0, np.int64),
                                   np.arange(1, header.n_ref),
                                   scan.reads_nonsupp, scan.identity_sum_primary)
                coverages = [e.calculate(st) for e in estimators]
                taker.start_entry(0, "genome1")
                for est, cov in zip(estimators, coverages):
                    if cov > 0.0:
                        _emit_entry(taker, [est], [cov], [st])
                    else:
                        _emit_zero_entry(taker, [est], 9)
                taker.finish_entry()
            reads_mapped_vector.append(ReadsMapped(
                num_mapped_reads=0,
                num_reads=scan.num_detected_primary_alignments))
            source.finish()
            continue
        for genome, tids in ordered:
            tids = np.asarray(tids)
            obs = tids[scan.observed[tids]]
            unobs = tids[~scan.observed[tids]]
            if obs.size == 0:
                if print_zero_coverage_genomes and any_entries:
                    taker.start_entry(int(tids[0]), genome)
                    _emit_zero_entry(taker, estimators,
                                     int(layout.lengths[tids].sum()))
                    taker.finish_entry()
                continue
            st = _entity_stats(scan, layout, obs, unobs, scan.reads_nonsupp,
                               scan.identity_sum_primary)
            coverages = [e.calculate(st) for e in estimators]
            nonzero = any(c > 0.0 for c in coverages)
            if nonzero:
                num_mapped_total += int(scan.reads_nonsupp[tids].sum())
            if print_zero_coverage_genomes or nonzero:
                taker.start_entry(int(tids[0]), genome)
                for est, cov in zip(estimators, coverages):
                    if cov > 0.0:
                        _emit_entry(taker, [est], [cov], [st])
                    else:
                        _emit_zero_entry(taker, [est], 9)
                taker.finish_entry()

        rm = ReadsMapped(
            num_mapped_reads=num_mapped_total,
            num_reads=scan.num_detected_primary_alignments)
        _log_reads_mapped(source.name, rm, t_scan)
        reads_mapped_vector.append(rm)
        source.finish()
    return reads_mapped_vector


def genome_coverage_named(sources, genomes_and_contigs, taker, estimators,
                          print_zero_coverage_genomes, flag_filter: FlagFilter,
                          threads: int = 1, layout_cache=None):
    """`coverm genome` with a contig->genome map (genome.rs:17-322)."""
    reads_mapped_vector = []
    need_hist = any_needs_hist(estimators)
    ee = _exclusion_of(estimators)
    start_transfer_warmup()
    layout_for_fn = lambda header: _layout_for(header, ee, layout_cache)
    for source, header, layout, scan, t_scan in _scanned(
            sources, layout_for_fn, flag_filter, need_hist):
        taker.start_stoit(source.name)
        npo = getattr(source, "num_primary_override", None)
        if npo is not None:
            scan.num_detected_primary_alignments = npo

        genome_of_tid = np.full(header.n_ref, -1, dtype=np.int64)
        for tid, name in enumerate(header.target_names):
            gi = genomes_and_contigs.genome_index_of_contig(name)
            if gi is not None:
                genome_of_tid[tid] = gi
        if not (genome_of_tid >= 0).any():
            raise ValueError(
                "Error: There are no found reference sequences that are a "
                "part of a genome")

        num_mapped_total = 0
        no_primary = scan.num_detected_primary_alignments == 0 and not scan.observed.any()
        for gi, genome in enumerate(genomes_and_contigs.genomes):
            if no_primary:
                break
            tids = np.flatnonzero(genome_of_tid == gi)
            obs = tids[scan.observed[tids]]
            unobs = tids[~scan.observed[tids]]
            st = _entity_stats(scan, layout, obs, unobs, scan.reads_all,
                               scan.identity_sum_nonsupp)
            coverages = [e.calculate(st) for e in estimators]
            nonzero = any(c > 0.0 for c in coverages)
            if nonzero:
                num_mapped_total += int(scan.reads_all[tids].sum())
            if print_zero_coverage_genomes or nonzero:
                taker.start_entry(gi, genome)
                for est, cov in zip(estimators, coverages):
                    if cov > 0.0:
                        _emit_entry(taker, [est], [cov], [st])
                    else:
                        _emit_zero_entry(taker, [est],
                                         int(layout.lengths[tids].sum()))
                taker.finish_entry()

        rm = ReadsMapped(
            num_mapped_reads=num_mapped_total,
            num_reads=scan.num_detected_primary_alignments)
        _log_reads_mapped(source.name, rm, t_scan)
        reads_mapped_vector.append(rm)
        source.finish()
    return reads_mapped_vector


def _exclusion_of(estimators) -> int:
    for e in estimators:
        ee = getattr(e, "contig_end_exclusion", None)
        if ee is not None:
            return int(ee)
    return 0


def _layout_for(header, ee, cache):
    key = (tuple(header.target_names), ee)
    if cache is not None and key in cache:
        return cache[key]
    layout = ReferenceLayout.build(header.target_lens, ee)
    if cache is not None:
        cache[key] = layout
    return layout
