"""Taker/printer unit tests ported from coverage_printer.rs:555-712 and
coverage_takers.rs:379-789."""

import io

import numpy as np

from coverm_tpu.printers import (DenseCachedCoveragePrinter,
                                 MetabatAdjustedCoveragePrinter, ReadsMapped,
                                 SparseCachedCoveragePrinter)
from coverm_tpu.takers import CachedCoverageTaker, OutputWriter


def make_taker(nc=2):
    c = CachedCoverageTaker(nc)
    c.start_stoit("stoit1")
    c.start_entry(0, "contig1")
    c.add_single_coverage(np.float32(1.1))
    c.add_single_coverage(np.float32(1.2))
    return c


def finalise_dense(c, reads_mapped=None, cols=(), rpkm=None, tpm=None):
    buf = io.StringIO()
    p = DenseCachedCoveragePrinter()
    p.print_headers("Contig", ["mean", "std"], OutputWriter(fileobj=io.StringIO()))
    p.finalise_printing(c, OutputWriter(fileobj=buf), reads_mapped, list(cols),
                        rpkm, tpm)
    return buf.getvalue()


def test_dense_cached_printer_hello_world():
    c = make_taker()
    out = finalise_dense(c)
    assert out == "Contig\tstoit1 mean\tstoit1 std\ncontig1\t1.1\t1.2\n"


def test_dense_cached_printer_newline_trimmed():
    c = CachedCoverageTaker(2)
    c.start_stoit("stoit1")
    c.start_entry(0, "contig1\r")
    c.add_single_coverage(np.float32(1.1))
    c.add_single_coverage(np.float32(1.2))
    out = finalise_dense(c)
    assert out == "Contig\tstoit1 mean\tstoit1 std\ncontig1\t1.1\t1.2\n"


def test_dense_cached_printer_easy_normalised():
    c = make_taker()
    out = finalise_dense(c, [ReadsMapped(num_mapped_reads=1, num_reads=2)],
                         cols=[0])
    assert out == ("Contig\tstoit1 mean\tstoit1 std\n"
                   "unmapped\t50\tNA\n"
                   "contig1\t50\t1.2\n")


def test_sparse_cached_printer_hello_world():
    c = make_taker()
    buf = io.StringIO()
    SparseCachedCoveragePrinter().finalise_printing(
        c, OutputWriter(fileobj=buf), None, [], None, None)
    assert buf.getvalue() == "stoit1\tcontig1\t1.1\t1.2\n"


def test_metabat_mode_printer_easy():
    c = CachedCoverageTaker(3)
    for stoit, (m, v) in [("stoit1", (1.1, 1.2)), ("stoit2", (21.1, 21.2))]:
        c.start_stoit(stoit)
        c.start_entry(0, "contig1")
        c.add_single_coverage(np.float32(1024.0))
        c.add_single_coverage(np.float32(m))
        c.add_single_coverage(np.float32(v))
        c.start_entry(1, "contig2")
        c.add_single_coverage(np.float32(1025.0))
        c.add_single_coverage(np.float32(m + 1.0))
        c.add_single_coverage(np.float32(v + 1.0))
    buf = io.StringIO()
    MetabatAdjustedCoveragePrinter().finalise_printing(
        c, OutputWriter(fileobj=buf), None, [], None, None)
    assert buf.getvalue() == (
        "contigName\tcontigLen\ttotalAvgDepth\tstoit1.bam\tstoit1.bam-var\t"
        "stoit2.bam\tstoit2.bam-var\n"
        "contig1\t1024\t11.1\t1.1\t1.2\t21.1\t21.2\n"
        "contig2\t1025\t12.1\t2.1\t2.2\t22.1\t22.2\n")


def test_cached_taker_zero_fill_across_stoits():
    """The merge iterator zero-fills entries a stoit never saw
    (coverage_takers.rs:228-377)."""
    c = CachedCoverageTaker(1)
    c.start_stoit("s1")
    c.start_entry(0, "c0")
    c.add_single_coverage(np.float32(5.0))
    c.start_entry(2, "c2")
    c.add_single_coverage(np.float32(7.0))
    c.start_stoit("s2")
    c.start_entry(1, "c1")
    c.add_single_coverage(np.float32(9.0))
    rows = [(e.stoit_index, e.entry_index, [float(x) for x in e.coverages])
            for e in c.iter_entries()]
    assert rows == [
        (0, 0, [5.0]), (0, 1, [0.0]), (0, 2, [7.0]),
        (1, 0, [0.0]), (1, 1, [9.0]), (1, 2, [0.0]),
    ]
