"""Profile the host BAM-ingestion pipeline term by term (VERDICT r3 #1).

Times, on the bench fixture:
  inflate   - native BGZF scan + threaded inflate of the whole file
  phase1    - sequential record walk + per-record block counts
  phase2    - parallel per-record decode (fields, CIGAR, aux, qname FNV)
  bookkeep  - scan_sample's numpy mask/bincount work (device stubbed)
  stream    - full BamStreamReader iteration (inflate+parse, prefetch)
  e2e-cpu   - full production pass with the device engine stubbed out

Run: python scripts/profile_ingest.py [/path/to.bam]
"""
import os
import sys
import time

os.environ.setdefault("COVERM_TPU_PLATFORM", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BAM = sys.argv[1] if len(sys.argv) > 1 else "/tmp/coverm_tpu_bench_r3.bam"


def t(label, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    print(f"{label:26s} {best:7.3f}s")
    return out, best


def fused_profile():
    """Round-4 fused path: one-call native ingest per segment."""
    from coverm_tpu.io import native
    from coverm_tpu.io.fastscan import FusedScanStream

    t0 = time.time()
    s = FusedScanStream(BAM)
    h = s.open()
    mm, off, csz, usz, carry, j = s._plan
    stats = native.StatsAccum(h.n_ref)
    cum = np.cumsum(usz)
    n, i = off.size, j
    while i < n:
        base = int(cum[i - 1]) if i else 0
        k = min(max(int(np.searchsorted(cum, base + s.target_bytes)) + 1,
                    i + 1), n)
        _bt, _bs, _be, _cnt, carry = native.ingest_scan(
            mm, off[i:k], csz[i:k], usz[i:k], carry, 0, stats, 0x100, 0)
        i = k
    dt = time.time() - t0
    print(f"{'fused one-call ingest':26s} {dt:7.3f}s "
          f"({stats.n_records / dt / 1e6:.2f}M rec/s)")


def main():
    from coverm_tpu.io import native
    from coverm_tpu.io.bam import BamStreamReader, parse_records, _parse_header

    lib = native.get_lib()
    assert lib is not None
    mm = np.memmap(BAM, np.uint8, mode="r")
    print(f"file: {BAM} ({mm.size/1e6:.0f} MB compressed)")

    (off, csz, usz), _ = t("bgzf scan", lambda: native.bgzf_scan(mm))
    data, t_inf = t("inflate (all threads)",
                    lambda: native.bgzf_inflate_blocks(mm, off, csz, usz))
    print(f"  decoded {data.size/1e9:.2f} GB -> {data.size/1e9/t_inf:.2f} GB/s")

    header, start = _parse_header(data)
    n = data.size

    import ctypes
    c = native.ctypes

    def phase1():
        est = (n - start) // 40 + 16
        rec_off = np.empty(est, np.int64)
        nblocks = np.empty(est, np.int64)
        got = lib.ct_parse_phase1(native._u8p(data), n, start, est,
                                  native._i64p(rec_off), native._i64p(nblocks))
        return rec_off[:got], nblocks[:got]

    (rec_off, nblocks), _ = t("phase1 (seq walk)", phase1)
    nrec = rec_off.size
    print(f"  {nrec} records")

    def phase2():
        return native.parse_records_full(data, start, None)

    full, t_p2 = t("phase1+phase2 (full parse)", phase2)
    print(f"  {full['block_read'].size} blocks")

    # bookkeeping: scan_sample numpy work with depth stubbed
    from coverm_tpu.flags import FlagFilter
    from coverm_tpu.io.bam import RecordBatch
    from coverm_tpu.ops.depth import ReferenceLayout
    from coverm_tpu.scan import scan_sample

    batch = RecordBatch(
        n_records=nrec, tid=full["tid"], pos=full["pos"], flag=full["flag"],
        mapq=full["mapq"], nm=full["nm"], as_score=full["as_score"],
        seq_len=full["seq_len"], aligned_cov=full["aligned_cov"],
        aligned_single=full["aligned_cov"], aligned_pair=full["aligned_pair"],
        indels=full["indels"], read_end=full["read_end"],
        qname_hash=full["qname_hash"], rec_start=full["rec_start"],
        rec_end=full["rec_end"], block_read=full["block_read"],
        block_start=full["block_start"], block_end=full["block_end"],
    )
    layout = ReferenceLayout.build(header.target_lens, 75)

    class StubDepth:
        def __call__(self, layout, tids, starts, ends, **kw):
            return None

    t("bookkeep (scan_sample-dev)",
      lambda: scan_sample(header, batch, layout, FlagFilter(), False,
                          depth_fn=StubDepth(), depth_kwargs={}))

    del batch, full, data

    def stream():
        hdr, gen = BamStreamReader(BAM).read()
        tot = 0
        for b in gen:
            tot += b.n_records
        return tot

    t("stream (inflate+parse)", stream, reps=3)
    fused_profile()


if __name__ == "__main__":
    main()
