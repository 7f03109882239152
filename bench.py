"""Benchmark: aligned reads/s/chip through the PRODUCTION call path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Workload: a synthetic metagenomic sample — 32 contigs x 1 Mbp at 20x
coverage with 150 bp reads (~4.27M aligned reads) — written ONCE as a
real BGZF BAM (~0.11 GB compressed / 1.2 GB decoded; reads are slices
of the contigs so compression matches real data), then measured
END TO END through exactly the code `coverm-tpu contig -b sample.bam -m
mean trimmed_mean variance covered_fraction` runs on one chip:
BamFileSource -> BamStreamReader (native multi-threaded BGZF inflate,
C++ record parse, contig-boundary batches) -> scan_sample_batches
(device event-sweep with on-device accumulator, ONE d2h fetch) ->
vectorised estimator suite -> streaming taker.

The primary metric is decode-INCLUSIVE (VERDICT r2: the host BAM decode
is a large fraction of real wall time and must be inside the
measurement).  Also reported:
  - device_only_reads_per_s: the depth-accumulation + estimator engine
    fed from pre-decoded block arrays (the r01/r02 metric, for
    continuity);
  - warmup_s: wall time from "BAM exists" to the end of the first
    production pass — XLA compiles (overlapped with the untimed decode
    pass via sweep.prewarm_sweep + the persistent compile cache) and the
    tunnelled TPU's one-time d2h channel setup (overlapped with the BAM
    fixture build when that runs);
  - baseline_reads_per_s: a single-core CoverM-style scan (numpy
    ups-and-downs + prefix sum + bincount, the reference's concurrency
    model, SURVEY.md §6) fed by the SAME decoded stream — generous to
    the baseline (it gets our multi-threaded decode for free), so
    vs_baseline isolates the compute engine and never flatters the TPU.
    The true Rust reference binary cannot be built here (no cargo in the
    image); the reference publishes no numbers of its own (BASELINE.md).
"""

import json
import os
import struct
import sys
import time

import numpy as np

N_CONTIGS = 32
CONTIG_LEN = 1_000_000
COVERAGE = 20
READ_LEN = 150
SEED = 0
REPS = 11  # shared host: passes vary >3x; best-of + median reported
TRIM = (0.05, 0.95)
EE = 75
BAM_PATH = os.environ.get("COVERM_TPU_BENCH_BAM",
                          "/tmp/coverm_tpu_bench_r3.bam")
META_PATH = BAM_PATH + ".meta.json"
FIXTURE_VERSION = 4
CRAM_PATH = os.environ.get("COVERM_TPU_BENCH_CRAM",
                           "/tmp/coverm_tpu_bench_r5.cram")
CRAM_META_PATH = CRAM_PATH + ".meta.json"
CRAM_FIXTURE_VERSION = 1
CRAM_REPS = 5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_bam(path):
    """Vectorised synthetic-BAM writer: coordinate-sorted 150M reads
    whose sequences are real slices of 32 synthetic contigs (one SNP per
    read) with instrument-style banded qualities + NM aux.  Sorted 20x
    coverage makes neighbouring records share ~95% of their sequence —
    the compression profile of real BAMs — where random bytes would be
    DEFLATE's worst case and overstate host decode cost."""
    rng = np.random.default_rng(SEED)
    n_reads = N_CONTIGS * CONTIG_LEN * COVERAGE // READ_LEN
    t0 = time.time()
    tids = np.sort(rng.integers(0, N_CONTIGS, n_reads)).astype(np.int32)
    starts = (rng.random(n_reads) * (CONTIG_LEN - 1)).astype(np.int32)
    order = np.lexsort((starts, tids))
    tids, starts = tids[order], starts[order]

    LNAME, LSEQ = 10, READ_LEN
    seq_b = (LSEQ + 1) // 2
    rec_size = 4 + 32 + LNAME + 4 + seq_b + LSEQ + 4
    rec = np.zeros((n_reads, rec_size), dtype=np.uint8)

    def put_i32(col, vals):
        v = np.asarray(vals, dtype=np.int64)
        for k in range(4):
            rec[:, col + k] = (v >> (8 * k)) & 0xFF

    put_i32(0, rec_size - 4)            # block_size
    put_i32(4, tids)                    # refID
    put_i32(8, starts)                  # pos
    rec[:, 12] = LNAME
    rec[:, 13] = 60                     # mapq
    rec[:, 16] = 1                      # n_cigar
    put_i32(20, LSEQ)                   # l_seq
    put_i32(24, -1)                     # next_refID
    put_i32(28, -1)                     # next_pos
    rec[:, 36] = ord("r")
    idx = np.arange(n_reads, dtype=np.int64)
    for k in range(8):
        rec[:, 37 + k] = ord("0") + (idx // 10 ** (7 - k)) % 10
    put_i32(46, (READ_LEN << 4) | 0)    # CIGAR: 150M
    nyb_map = np.array([1, 2, 4, 8], np.uint8)  # A C G T
    contig_codes = rng.integers(0, 4, (N_CONTIGS, CONTIG_LEN + LSEQ),
                                dtype=np.uint8)
    span = np.arange(LSEQ, dtype=np.int32)[None, :]
    CH = 1 << 18
    for o in range(0, n_reads, CH):
        t, s = tids[o:o + CH], starts[o:o + CH]
        codes = contig_codes[t[:, None], s[:, None] + span]
        snp_at = rng.integers(0, LSEQ, t.size)
        codes[np.arange(t.size), snp_at] ^= \
            rng.integers(1, 4, t.size).astype(np.uint8)
        nyb = nyb_map[codes]
        rec[o:o + CH, 50:50 + seq_b] = (nyb[:, 0::2] << 4) | nyb[:, 1::2]
    rec[:, 50 + seq_b:50 + seq_b + LSEQ] = \
        (25 + (np.arange(LSEQ) * 7) % 12).astype(np.uint8)  # binned quals
    a0 = 50 + seq_b + LSEQ
    rec[:, a0] = ord("N"); rec[:, a0 + 1] = ord("M"); rec[:, a0 + 2] = ord("C")
    rec[:, a0 + 3] = rng.integers(0, 3, n_reads, dtype=np.uint8)

    hdr = bytearray(b"BAM\x01")
    text = b"".join(b"@SQ\tSN:c%d\tLN:%d\n" % (i, CONTIG_LEN)
                    for i in range(N_CONTIGS))
    hdr += struct.pack("<i", len(text)) + text
    hdr += struct.pack("<i", N_CONTIGS)
    for i in range(N_CONTIGS):
        nb = b"c%d\x00" % i
        hdr += struct.pack("<i", len(nb)) + nb + struct.pack("<I", CONTIG_LEN)

    from coverm_tpu.io import bgzf
    buf = rec.reshape(-1).tobytes()
    with open(path + ".tmp", "wb") as f:
        f.write(bgzf.compress_block(bytes(hdr), 1))
        step = 0xFF00
        for o in range(0, len(buf), step):
            f.write(bgzf.compress_block(buf[o:o + step], 1))
        f.write(bgzf.BGZF_EOF)
    os.replace(path + ".tmp", path)
    with open(META_PATH, "w") as f:
        json.dump({"version": FIXTURE_VERSION, "n_reads": int(n_reads)}, f)
    log(f"BAM fixture built in {time.time()-t0:.1f}s: "
        f"{os.path.getsize(path)/1e9:.2f} GB compressed, {n_reads} reads")
    return n_reads


def _itf8_col(v):
    """Vectorised ITF8 column encode (values < 2^21)."""
    v = np.asarray(v, np.int64)
    nb = np.where(v < 0x80, 1, np.where(v < 0x4000, 2, 3))
    off = np.cumsum(nb) - nb
    out = np.zeros(int(nb.sum()), np.uint8)
    m1 = nb == 1
    out[off[m1]] = v[m1]
    m2 = nb == 2
    out[off[m2]] = 0x80 | (v[m2] >> 8)
    out[off[m2] + 1] = v[m2] & 0xFF
    m3 = nb == 3
    out[off[m3]] = 0xC0 | (v[m3] >> 16)
    out[off[m3] + 1] = (v[m3] >> 8) & 0xFF
    out[off[m3] + 2] = v[m3] & 0xFF
    return out.tobytes()


def build_cram_twin(path):
    """CRAM 3.0 twin of the BAM fixture (VERDICT r4 #2): same read
    geometry (32 x 1 Mbp contigs, 20x, 150 bp, coordinate-sorted, one
    substitution per read), written htslib-style — RR=1 reference-coded
    bases (no embedded reference; the coverage path never reconstructs
    sequence), names preserved, qualities stored, NM:c tags, detached
    single-end mate info, single-reference slices of 10k records.
    Streams are numpy-built and gzip-compressed (the in-repo python rANS
    ENCODER is too slow for 4.3M reads; rANS decode is pinned by the
    test corpus instead — the bench twin measures stream walk + record
    decode + inflate, with the quality stream lazily SKIPPED by the
    direct route exactly as on htslib files)."""
    import zlib

    from coverm_tpu.io.cram import (CRAM_EOF, CRAM_MAGIC, CT_COMP_HEADER,
                                    CT_EXTERNAL, CT_FILE_HEADER,
                                    CT_SLICE_HEADER, M_GZIP, M_RAW,
                                    build_compression_header,
                                    build_slice_header,
                                    byte_array_len_encoding,
                                    byte_array_stop_encoding, ext_encoding,
                                    huffman_const_encoding, write_block,
                                    write_container)

    t0 = time.time()
    rng = np.random.default_rng(1)
    n_reads = N_CONTIGS * CONTIG_LEN * COVERAGE // READ_LEN
    tids = np.sort(rng.integers(0, N_CONTIGS, n_reads)).astype(np.int64)
    starts = (rng.random(n_reads) * (CONTIG_LEN - READ_LEN)).astype(
        np.int64) + 1  # 1-based
    order = np.lexsort((starts, tids))
    tids, starts = tids[order], starts[order]
    snp_at = rng.integers(1, READ_LEN + 1, n_reads).astype(np.int64)  # FP
    bs_codes = rng.integers(0, 4, n_reads).astype(np.uint8)

    IDS = {"AP": 5, "RN": 6, "FP": 13, "BS": 27, "QS": 25, "NMV": 40}
    senc = {
        "BF": huffman_const_encoding(0),
        "CF": huffman_const_encoding(3),     # QS stored | detached
        "RL": huffman_const_encoding(READ_LEN),
        "AP": ext_encoding(IDS["AP"]),
        "RG": huffman_const_encoding(-1),
        "RN": byte_array_stop_encoding(0, IDS["RN"]),
        "MF": huffman_const_encoding(0),
        "NS": huffman_const_encoding(-1),
        "NP": huffman_const_encoding(0),
        "TS": huffman_const_encoding(0),
        "TL": huffman_const_encoding(0),
        "FN": huffman_const_encoding(1),     # one substitution per read
        "FC": huffman_const_encoding(ord("X")),
        "FP": ext_encoding(IDS["FP"]),
        "BS": ext_encoding(IDS["BS"]),
        "MQ": huffman_const_encoding(60),
        "QS": ext_encoding(IDS["QS"]),
    }
    tenc = {("NM", "c"): byte_array_len_encoding(
        huffman_const_encoding(1), ext_encoding(IDS["NMV"]))}
    comp_data = build_compression_header(
        senc, tenc, [[("NM", "c")]], rn_preserved=True, ap_delta=True,
        ref_required=True)

    # per-read 8-digit names (same style as the BAM fixture)
    qrow = (25 + (np.arange(READ_LEN) * 7) % 12).astype(np.uint8)
    out = open(path + ".tmp", "wb")
    out.write(CRAM_MAGIC + bytes([3, 0]) + b"coverm-tpu".ljust(20, b"\x00"))
    text = b"".join(b"@SQ\tSN:c%d\tLN:%d\n" % (i, CONTIG_LEN)
                    for i in range(N_CONTIGS))
    hdr_payload = struct.pack("<i", len(text)) + text
    out.write(write_container(-1, 0, 0, 0, 0, 0, [
        write_block(M_RAW, CT_FILE_HEADER, 0, hdr_payload)]))

    PER_SLICE = 10_000
    counter = 0
    bounds = np.searchsorted(tids, np.arange(N_CONTIGS + 1))
    idx_all = np.arange(n_reads, dtype=np.int64)
    name_digits = np.empty((n_reads, 10), np.uint8)
    name_digits[:, 0] = ord("r")
    for k in range(8):
        name_digits[:, 1 + k] = ord("0") + (idx_all // 10 ** (7 - k)) % 10
    name_digits[:, 9] = 0  # the stop byte
    for c in range(N_CONTIGS):
        lo, hi = int(bounds[c]), int(bounds[c + 1])
        for s0 in range(lo, hi, PER_SLICE):
            s1 = min(s0 + PER_SLICE, hi)
            n = s1 - s0
            st = starts[s0:s1]
            ap = np.empty(n, np.int64)
            ap[0] = 0
            np.subtract(st[1:], st[:-1], out=ap[1:])
            streams = [
                (IDS["AP"], _itf8_col(ap)),
                (IDS["RN"], name_digits[s0:s1].tobytes()),
                (IDS["FP"], _itf8_col(snp_at[s0:s1])),
                (IDS["BS"], bs_codes[s0:s1].tobytes()),
                (IDS["NMV"], b"\x01" * n),
                (IDS["QS"], np.broadcast_to(
                    qrow, (n, READ_LEN)).tobytes()),
            ]
            blocks = [write_block(M_GZIP, CT_COMP_HEADER, 0, comp_data)]
            sl_start = int(st[0])
            sl_span = int(st[-1]) + READ_LEN - sl_start
            sh = build_slice_header(c, sl_start, sl_span, n, counter,
                                    1 + len(streams),
                                    [cid for cid, _ in streams])
            blocks.append(write_block(M_RAW, CT_SLICE_HEADER, 0, sh))
            blocks.append(write_block(M_RAW, 5, 0, b""))  # CT_CORE empty
            for cid, data in streams:
                blocks.append(write_block(M_GZIP, CT_EXTERNAL, cid, data))
            out.write(write_container(c, sl_start, sl_span, n, counter,
                                      n * READ_LEN, blocks))
            counter += n
    out.write(CRAM_EOF)
    out.close()
    os.replace(path + ".tmp", path)
    with open(CRAM_META_PATH, "w") as f:
        json.dump({"version": CRAM_FIXTURE_VERSION, "n_reads": int(n_reads)},
                  f)
    log(f"CRAM twin built in {time.time()-t0:.1f}s: "
        f"{os.path.getsize(path)/1e9:.2f} GB, {n_reads} reads")
    return n_reads


def ensure_cram():
    if os.path.exists(CRAM_PATH) and os.path.exists(CRAM_META_PATH):
        try:
            with open(CRAM_META_PATH) as f:
                meta = json.load(f)
            if meta.get("version") == CRAM_FIXTURE_VERSION:
                log(f"CRAM twin reused: {CRAM_PATH} "
                    f"({os.path.getsize(CRAM_PATH)/1e9:.2f} GB)")
                return meta["n_reads"]
        except Exception:
            pass
    return build_cram_twin(CRAM_PATH)


def cram_bench(devnull):
    """Decode-inclusive CRAM production path (VERDICT r4 #2): the same
    contig-coverage call as the BAM metric, fed the CRAM twin.  Logged
    every run so a CRAM regression can never be silent."""
    from coverm_tpu.flags import FlagFilter
    from coverm_tpu.modes import BamFileSource, contig_coverage
    from coverm_tpu.takers import OutputWriter, StreamingCoverageTaker

    n_reads = ensure_cram()

    def one_pass():
        source = BamFileSource(CRAM_PATH)
        taker = StreamingCoverageTaker(OutputWriter(fileobj=devnull))
        return contig_coverage([source], taker, make_estimators(),
                               print_zero_coverage_contigs=True,
                               flag_filter=FlagFilter())
    rm = one_pass()  # residual warmup (kernel shapes shared with BAM)
    assert rm[0].num_reads == n_reads, (rm[0], n_reads)
    times = []
    for _ in range(CRAM_REPS):
        t0 = time.time()
        one_pass()
        times.append(time.time() - t0)
    best = float(np.min(times))
    rps = n_reads / best
    log(f"CRAM production-path times: {[round(t, 2) for t in times]} "
        f"best={best:.2f}s ({rps:,.0f} reads/s decode-inclusive best-of)")
    return rps, n_reads / float(np.median(times))


def ensure_bam():
    if os.path.exists(BAM_PATH) and os.path.exists(META_PATH):
        try:
            with open(META_PATH) as f:
                meta = json.load(f)
            if meta.get("version") == FIXTURE_VERSION:
                log(f"BAM fixture reused: {BAM_PATH} "
                    f"({os.path.getsize(BAM_PATH)/1e9:.2f} GB)")
                return meta["n_reads"]
        except Exception:
            pass
    return build_bam(BAM_PATH)


def make_estimators():
    from coverm_tpu.estimators import (CoveredFractionEstimator,
                                       MeanEstimator, TrimmedMeanEstimator,
                                       VarianceEstimator)
    return [MeanEstimator(0.0, EE, False),
            TrimmedMeanEstimator(TRIM[0], TRIM[1], 0.0, EE),
            VarianceEstimator(0.0, EE),
            CoveredFractionEstimator(0.0)]


def production_pass(devnull):
    """Exactly what `coverm-tpu contig -b BAM -m mean trimmed_mean
    variance covered_fraction` runs (modes.contig_coverage with a
    streaming taker); returns per-sample ReadsMapped."""
    from coverm_tpu.flags import FlagFilter
    from coverm_tpu.modes import BamFileSource, contig_coverage
    from coverm_tpu.takers import OutputWriter, StreamingCoverageTaker

    source = BamFileSource(BAM_PATH)
    taker = StreamingCoverageTaker(OutputWriter(fileobj=devnull))
    return contig_coverage([source], taker, make_estimators(),
                           print_zero_coverage_contigs=True,
                           flag_filter=FlagFilter())


def decode_blocks():
    """Untimed decode pass: per-batch block arrays + the exact dispatch
    signatures the production engine will compile for."""
    from coverm_tpu.io.bam import BamStreamReader
    from coverm_tpu.ops.depth import ReferenceLayout, _bucket
    from coverm_tpu.ops.sweep import choose_payload, encode_start_deltas

    header, gen = BamStreamReader(BAM_PATH).read()
    layout = ReferenceLayout.build(header.target_lens, EE)
    batches, sigs = [], set()
    for b in gen:
        t, s, e = (b.tid[b.block_read].astype(np.int64),
                   b.block_start[:].astype(np.int64),
                   b.block_end[:].astype(np.int64))
        batches.append((t, s, e))
        n_seg = _bucket(header.n_ref, minimum=8)
        counts = np.bincount(t.astype(np.int32), minlength=n_seg)
        len_mode, _sl, _v = choose_payload(layout, t, s, e)
        start_mode = "abs"
        if t.size > (1 << 14):
            _d, _f, mode = encode_start_deltas(s, counts, t.size)
            if mode is not None:
                start_mode = mode
        sigs.add((t.size, header.n_ref, len_mode, start_mode))
    return header, layout, batches, sigs


def device_only(layout, batches, n_reads):
    """The r01/r02 metric: accumulator sweep + estimator suite from
    pre-decoded block arrays."""
    from coverm_tpu.estimators import BatchStats
    from coverm_tpu.ops.sweep import (DepthAccumulator,
                                      compute_depth_stats_sweep)

    ests = make_estimators()
    lens = layout.lengths

    def one_pass():
        acc = DepthAccumulator()
        for bt, bs, be in batches:
            compute_depth_stats_sweep(layout, bt, bs, be, need_hist=False,
                                      trim=TRIM, deferred=True, acc=acc)
        acc.start_fetch()
        d = acc.result()
        zeros = np.zeros(len(lens), dtype=np.int64)
        b = BatchStats(
            total_count=d.sum_depth_window,
            total_bases_window=np.where(lens > 2 * EE, lens - 2 * EE, 0),
            covered_window=d.covered_window, total_bases_full=lens,
            covered_full=d.covered_full, observed_length_full=lens,
            reads=zeros, mismatches=zeros,
            sum_identity=zeros.astype(float), hist=d.hist,
            sumsq_window=d.sumsq_window, min_depth_window=d.min_depth_window,
            trimmed_sum=d.trimmed_sum)
        return np.stack([e.calculate_batch(b) for e in ests])

    one_pass()  # residual warmup (shapes normally already compiled)
    times = []
    for _ in range(REPS):
        t0 = time.time()
        one_pass()
        times.append(time.time() - t0)
    best = float(np.min(times))
    log(f"device-only times: {[round(t,3) for t in times]} best={best:.3f}s")
    return n_reads / best


def baseline(n_reads):
    """Single-core CoverM-style scan over the SAME decoded stream:
    per-contig ups-and-downs delta array, serial prefix sum, window
    reductions + histogram walk (the reference's single-threaded scan,
    contig.rs:144-202 / estimators.rs:396-466)."""
    from coverm_tpu.io.bam import BamStreamReader

    times = []
    for _ in range(2):
        t0 = time.time()
        header, gen = BamStreamReader(BAM_PATH).read()
        lens = header.target_lens
        for b in gen:
            t = b.tid[b.block_read]
            s = b.block_start
            e = b.block_end
            for c in np.unique(t):
                ln = int(lens[c])
                m = t == c
                delta = np.zeros(ln + 1, dtype=np.int32)
                np.add.at(delta, s[m], 1)
                ee_ends = e[m]
                np.add.at(delta, ee_ends[ee_ends < ln], -1)
                depth = np.cumsum(delta[:ln])
                w = depth[EE: ln - EE]
                w.sum(), (w > 0).sum(), (depth > 0).sum()
                np.bincount(w)
        times.append(time.time() - t0)
    best = min(times)
    log(f"baseline single-core scan (decode-inclusive): best {best:.2f}s "
        f"of {[round(t,2) for t in times]}")
    return n_reads / best


def _backend_alive(timeout_s: float):
    """Probe a tiny jitted computation in a killable subprocess: a
    degraded TPU tunnel can list devices fine yet HANG compilation
    forever, which would hang the whole bench.

    Returns (alive, seconds).  The subprocess does NOT configure the
    persistent compilation cache, so its sort-kernel compile always goes
    to the (remote) compile service — `seconds` is a per-run health
    yardstick for that service (VERDICT r4 #1: distinguishes "service
    degraded" from "cache-key regression" in the warmup attribution).
    """
    import subprocess
    # the sort is the sweep's dominant primitive; a degraded remote
    # compile service has been observed hanging exactly this class of
    # kernel while trivial elementwise jits still compile
    probe = ("import jax, jax.numpy as jnp; "
             "jax.jit(lambda x: jax.lax.sort(x))("
             "jnp.arange(200000) % 977).block_until_ready(); "
             "print('ok')")
    t0 = time.time()
    try:
        res = subprocess.run([sys.executable, "-c", probe],
                             timeout=timeout_s, capture_output=True,
                             text=True)
        return (res.returncode == 0 and "ok" in res.stdout,
                time.time() - t0)
    except Exception:
        return False, time.time() - t0


_PC_LOG = {"hits": [], "misses": []}


def _install_compile_telemetry():
    """Per-kernel persistent-cache hit/miss attribution (VERDICT r4 #1).

    jax logs every persistent-cache lookup through two module-global
    functions; wrapping them records the module names so the bench JSON
    can say WHICH kernels compiled fresh vs loaded from cache."""
    try:
        import jax._src.compiler as _comp

        orig_hit = _comp.log_persistent_cache_hit
        orig_miss = _comp.log_persistent_cache_miss

        def _hit(module_name, cache_key):
            _PC_LOG["hits"].append((module_name, round(time.time(), 1)))
            orig_hit(module_name, cache_key)

        def _miss(module_name, cache_key):
            _PC_LOG["misses"].append((module_name, round(time.time(), 1)))
            orig_miss(module_name, cache_key)

        _comp.log_persistent_cache_hit = _hit
        _comp.log_persistent_cache_miss = _miss
    except Exception as e:
        log(f"compile telemetry unavailable: {e!r}")


def host_profile(n_reads):
    """Host-side ingestion breakdown (VERDICT r3 #1) + the measured
    2-vCPU host FLOOR (VERDICT r4 #4): single-thread pure libdeflate
    inflate and single-thread fused scan give per-stage core-seconds;
    floor wall = total core-seconds / n_cpus (perfect packing, zero
    contention).  pct_of_floor in the JSON makes "the BAM path is at
    the host optimum" a per-run measurement instead of an assertion.

    Returns a dict of floor fields for the JSON (or {})."""
    from coverm_tpu.io import native

    if native.get_lib() is None or not hasattr(native.get_lib(),
                                               "ct_stats_scan"):
        log("host profile: native fused scan unavailable")
        return {}
    mm = np.memmap(BAM_PATH, np.uint8, mode="r")
    t0 = time.time()
    tabs = native.bgzf_scan(mm)
    data = native.bgzf_inflate_blocks(mm, *tabs)
    t_inflate = time.time() - t0
    from coverm_tpu.io.bam import _parse_header
    header, start = _parse_header(data)
    acc = native.StatsAccum(header.n_ref)
    t0 = time.time()
    # default FlagFilter masks (exclude secondary only)
    bt, _bs, _be, _cnt, _eo = native.stats_scan(data, start, acc, 0x100, 0)
    t_scan = time.time() - t0
    log(f"host profile: inflate {t_inflate:.2f}s "
        f"({data.size / 1e9 / t_inflate:.2f} GB/s), fused chain+stats scan "
        f"{t_scan:.2f}s ({acc.n_records / t_scan / 1e6:.1f}M rec/s, "
        f"{bt.size} blocks)")

    # ---- floor calibration: 1-thread core-seconds, best of 2 (shared
    # host: the calmest rep is the honest hardware number) ----
    t_inf1 = min(_timed(lambda: native.bgzf_inflate_blocks(
        mm, *tabs, n_threads=1)) for _ in range(2))
    def scan1():
        a = native.StatsAccum(header.n_ref)
        native.stats_scan(data, start, a, 0x100, 0, n_threads=1)
    t_scan1 = min(_timed(scan1) for _ in range(2))
    ncpu = os.cpu_count() or 1
    floor_wall = (t_inf1 + t_scan1) / ncpu
    floor_rps = n_reads / floor_wall
    log(f"host floor: 1-thread inflate {t_inf1:.2f}s "
        f"({data.size / 1e9 / t_inf1:.2f} GB/s), 1-thread scan "
        f"{t_scan1:.2f}s -> perfect-packing floor {floor_wall:.2f}s "
        f"on {ncpu} vCPUs = {floor_rps:,.0f} reads/s")
    return {"host_floor_reads_per_s": round(floor_rps),
            "host_inflate_1t_s": round(t_inf1, 2),
            "host_scan_1t_s": round(t_scan1, 2)}


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def _cache_entries():
    d = os.environ.get("COVERM_TPU_CACHE_DIR",
                       os.path.expanduser("~/.cache/coverm_tpu_jax"))
    try:
        return len(os.listdir(d))
    except OSError:
        return 0


def main():
    t_start = time.time()
    # COVERM_TPU_BENCH_COLD=1: wipe the persistent XLA cache so warmup_s
    # measures COLD compiles (VERDICT r3 #7; the default keeps the cache
    # and the JSON reports how many kernels still compiled fresh)
    cold = os.environ.get("COVERM_TPU_BENCH_COLD") == "1"
    if cold:
        import shutil
        d = os.environ.get("COVERM_TPU_CACHE_DIR",
                           os.path.expanduser("~/.cache/coverm_tpu_jax"))
        shutil.rmtree(d, ignore_errors=True)
        log("cold mode: persistent XLA cache cleared")
    cache_before = _cache_entries()
    _install_compile_telemetry()
    probe_s = None
    if not os.environ.get("COVERM_TPU_PLATFORM"):
        alive, probe_s = _backend_alive(
            float(os.environ.get("COVERM_TPU_BENCH_INIT_TIMEOUT_S", 240)))
        log(f"compile-service probe (fresh sort kernel, no cache): "
            f"{probe_s:.1f}s")
        if not alive:
            log("TPU backend unresponsive: falling back to CPU "
                "(JSON reports the platform measured)")
            os.environ["COVERM_TPU_PLATFORM"] = "cpu"

    from coverm_tpu.ops.depth import start_transfer_warmup

    start_transfer_warmup()  # d2h channel setup runs in the background
    import jax
    platform = jax.devices()[0].platform
    log(f"devices: {jax.devices()}")

    n_reads = ensure_bam()
    t_warm0 = time.time()

    # untimed decode pass: block arrays for the device-only metric +
    # exact kernel signatures; compiles overlap this via prewarm threads
    header, layout, batches, sigs = decode_blocks()
    log(f"{len(batches)} contig-disjoint batches, block counts "
        f"{[len(b[0]) for b in batches]}; kernel signatures {sorted(sigs)}")
    from coverm_tpu.ops.depth import _bucket
    from coverm_tpu.ops.sweep import _bucket_geo, prewarm_sweep

    # dedup by BUCKETED signature: several raw block counts land in one
    # size bucket, and duplicate prewarm threads would serialise on the
    # same jit compile (r4's "6 compiles in flight" were 3 kernels)
    bucketed = {(_bucket_geo(nb), _bucket(nref, minimum=8), lm, sm):
                (nb, nref, lm, sm) for nb, nref, lm, sm in sigs}
    threads = [prewarm_sweep(nb, nref, EE, need_hist=False, trim=TRIM,
                             len_mode=lm, start_mode=sm)
               for nb, nref, lm, sm in bucketed.values()]
    # bounded wait: if the (remote) compile service is slow, proceed —
    # remaining compiles happen lazily inside the first timed pass and
    # are charged to warmup_s either way
    deadline = time.time() + float(os.environ.get(
        "COVERM_TPU_PREWARM_TIMEOUT_S", 600))
    # Block only on the LARGEST kernel: once it is live, the shape-reuse
    # registry (ops/sweep._pick_shape) serves every smaller batch on it
    # while the remaining compiles land in the background — first-result
    # latency is ONE executable load, not one per shape (r5 measured
    # 167-387 s PER cache-hit load on a degraded compile service).
    threads.sort(key=lambda t: -t.sig[0])
    threads[0].join(timeout=max(0.0, deadline - time.time()))
    grace = time.time() + min(20.0, max(0.0, deadline - time.time()))
    for t in threads[1:]:
        t.join(timeout=max(0.0, grace - time.time()))
    stragglers = [t for t in threads if t.is_alive()]
    prewarm_join_s = time.time() - t_warm0
    log(f"prewarm joined at +{prewarm_join_s:.1f}s"
        + (f" ({len(stragglers)} compiles still in flight)"
           if stragglers else ""))

    def _profile_row(t):
        state = ("error" if t.error else
                 "in-flight" if t.seconds is None else "ok")
        return {"sig": list(t.sig),
                "s": round(t.seconds, 1) if t.seconds is not None else None,
                "state": state, **({"err": t.error} if t.error else {})}

    # flushed NOW (before the first timed pass can hang) so a partial
    # warmup is still attributed in the stderr log — VERDICT r4 #8
    log("compile profile: " + json.dumps(
        [_profile_row(t) for t in threads])
        + f"; persistent-cache hits={len(_PC_LOG['hits'])}"
          f" misses={len(_PC_LOG['misses'])}")
    import threading as _threading
    for t in stragglers:
        def _watch(t=t):
            t.join()
            log(f"prewarm straggler finished: sig={t.sig} "
                f"after {t.seconds:.1f}s (hits={len(_PC_LOG['hits'])} "
                f"misses={len(_PC_LOG['misses'])})")
        _threading.Thread(target=_watch, daemon=True).start()

    devnull = open(os.devnull, "w")
    rm = production_pass(devnull)  # first pass: d2h setup + residual compile
    warmup_s = time.time() - t_warm0
    log(f"warmup (compile + d2h channel setup + first pass): {warmup_s:.1f}s")
    assert rm[0].num_reads == n_reads, (rm[0], n_reads)

    times = []
    for _ in range(REPS):
        t0 = time.time()
        production_pass(devnull)
        times.append(time.time() - t0)
    # best-of, matching the baseline's statistic: this host is shared and
    # single passes vary >2x under external load; best-of measures the
    # engine, the spread is logged for transparency
    best = float(np.min(times))
    prod_rps = n_reads / best
    log(f"production-path times: {[round(t,2) for t in times]} "
        f"best={best:.2f}s median={np.median(times):.2f}s "
        f"({prod_rps:,.0f} reads/s decode-inclusive best-of)")

    dev_rps = device_only(layout, batches, n_reads)
    log(f"device-only: {dev_rps:,.0f} reads/s")

    cram_rps, cram_med = cram_bench(devnull)

    floor = host_profile(n_reads)

    base_rps = baseline(n_reads)
    log(f"baseline: {base_rps:,.0f} reads/s")

    out = {
        "metric": "aligned reads/s/chip (BAM-file-in production path: "
                  "decode + depth accumulation + estimator suite)",
        "value": round(prod_rps),
        "unit": "reads/s",
        "vs_baseline": round(prod_rps / base_rps, 3),
        "platform": platform,
        "warmup_s": round(warmup_s, 1),
        "median_reads_per_s": round(n_reads / float(np.median(times))),
        "device_only_reads_per_s": round(dev_rps),
        "cram_reads_per_s": round(cram_rps),
        "cram_median_reads_per_s": round(cram_med),
        "baseline_reads_per_s": round(base_rps),
        "n_reads": n_reads,
        "bam_bytes": os.path.getsize(BAM_PATH),
        "xla_cache_entries_added": _cache_entries() - cache_before,
        "xla_cache_entries_before": cache_before,
        "total_s": round(time.time() - t_start, 1),
        # ---- warmup attribution (VERDICT r4 #1) ----
        "probe_compile_s": round(probe_s, 1) if probe_s is not None else None,
        "prewarm_join_s": round(prewarm_join_s, 1),
        "compile_profile": [_profile_row(t) for t in threads],
        "pc_hits": len(_PC_LOG["hits"]),
        "pc_misses": len(_PC_LOG["misses"]),
        # ---- measured host floor (VERDICT r4 #4) ----
        **floor,
    }
    if floor.get("host_floor_reads_per_s"):
        out["pct_of_floor"] = round(
            100.0 * prod_rps / floor["host_floor_reads_per_s"], 1)
    if cold:
        # warmup_s measured with the persistent cache wiped above
        out["warmup_cold_s"] = out["warmup_s"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
