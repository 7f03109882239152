"""Device depth engine: interval tensors -> per-contig coverage statistics.

This replaces the reference's mosdepth-style streaming scan (the
ups-and-downs delta array + serial prefix sum, contig.rs:144-202 and the
estimators' add_contig prefix-sum loops) with an array program over a
*chunked, padded position space*:

  - contigs are padded to a multiple of ``LANE`` (128) and greedily
    packed into fixed-size chunks of up to ``DEFAULT_CHUNK`` positions;
    the chunk layout is *reference-static*: built once per reference,
    its position metadata (segment ids, window/valid masks) lives on the
    device and is reused by every sample;
  - per sample, only chunks that received alignment blocks are executed
    (cost scales with mapped data, not reference size), and only the
    scatter points (2 int32 per block) cross host->device;
  - alignment blocks scatter +1 at their start and -1 at their end (ends
    at the contig end are dropped, matching contig.rs:178-183);
  - depth is one cumsum per chunk with per-contig carry subtraction;
  - per-contig statistics are segment reductions over the position axis;
  - the depth histogram (trimmed mean / variance / coverage_histogram)
    is a 2-D scatter-add with a static bin count;
  - only per-contig statistics (KBs) ever cross device->host — on the
    tunnelled TPU backend d2h bandwidth is the scarcest resource.

All statistics are integers; the estimator layer (estimators.py)
reproduces the reference's exact f32 arithmetic from them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

LANE = 128
DEFAULT_CHUNK = 1 << 22  # 4M positions per device call

# int64 statistics on device require x64; TPU lowers i64 to i32 pairs.
jax.config.update("jax_enable_x64", True)

# Platform override: the axon TPU plugin ignores JAX_PLATFORMS, so honour
# our own env var through the (working) config knob.
import os as _os

if _os.environ.get("COVERM_TPU_PLATFORM"):
    jax.config.update("jax_platforms", _os.environ["COVERM_TPU_PLATFORM"])

# Persistent compilation cache: first-compile on the tunnelled TPU is ~3min,
# so cache compiled executables across processes (COVERM_TPU_CACHE=0 disables).
if _os.environ.get("COVERM_TPU_CACHE", "1") != "0":
    _cache_dir = _os.environ.get(
        "COVERM_TPU_CACHE_DIR",
        _os.path.expanduser("~/.cache/coverm_tpu_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def _round_up(x, m):
    return (x + m - 1) // m * m


def _bucket(n: int, minimum: int = 1024) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


_warmup_ref = None


def start_transfer_warmup():
    """Kick the device->host data plane in the background.

    On the tunnelled axon TPU backend the *first* device->host transfer of
    a process pays a ~200s one-time channel setup.  Starting it with the
    runtime's own async D2H path (``copy_to_host_async``) lets it overlap
    with host-side BAM decode instead of blocking the first result fetch.
    Harmless (a 4-byte copy) everywhere else.  Deliberately NOT a Python
    daemon thread: on CPython 3.12 a daemon thread reacquiring the GIL
    after a long native transfer during interpreter finalisation is
    killed via pthread_exit, whose forced unwind aborts inside the
    runtime's C++ frames ("FATAL: exception not rethrown").
    """
    global _warmup_ref
    if _warmup_ref is not None:
        return
    try:
        x = jnp.zeros((), jnp.int32)
        x.copy_to_host_async()
        _warmup_ref = x
    except Exception:
        _warmup_ref = False


@dataclass
class _Chunk:
    """One chunk of the padded position space."""

    cids: np.ndarray          # global contig ids packed in this chunk
    base: np.ndarray          # int64, chunk-local offset of each contig
    n_local: int
    _device: tuple = None     # lazily-built (pos_seg, window, valid)


class ReferenceLayout:
    """Reference-static chunked layout (lengths + end exclusion).

    Chunk position metadata is built lazily per chunk and cached on the
    device, shared by every sample scanned against this reference.
    """

    def __init__(self, lengths, contig_end_exclusion: int,
                 chunk_positions: int = DEFAULT_CHUNK):
        self.lengths = np.asarray(lengths, dtype=np.int64)
        self.contig_end_exclusion = int(contig_end_exclusion)
        C = self.lengths.size
        padded = np.maximum(_round_up(self.lengths, LANE), LANE) if C else \
            np.zeros(0, np.int64)
        max_padded = int(padded.max()) if C else LANE
        total = int(padded.sum()) if C else LANE
        P = min(_bucket(total, minimum=LANE), chunk_positions)
        P = max(P, _bucket(max_padded, minimum=LANE))
        self.P = P

        # greedy packing in tid order
        self.chunk_of_contig = np.zeros(C, dtype=np.int32)
        self.base_of_contig = np.zeros(C, dtype=np.int64)
        chunks = []
        cur_ids, cur_fill = [], 0
        for cid in range(C):
            pl = int(padded[cid])
            if cur_fill + pl > P:
                chunks.append((cur_ids, cur_fill))
                cur_ids, cur_fill = [], 0
            self.chunk_of_contig[cid] = len(chunks)
            self.base_of_contig[cid] = cur_fill
            cur_ids.append(cid)
            cur_fill += pl
        if cur_ids or not chunks:
            chunks.append((cur_ids, cur_fill))
        self.chunks = []
        max_local = 1
        for ids, fill in chunks:
            cids = np.asarray(ids, dtype=np.int64)
            self.chunks.append(_Chunk(
                cids=cids, base=self.base_of_contig[cids],
                n_local=len(ids)))
            max_local = max(max_local, len(ids))
        # uniform static segment count across chunks (one compilation);
        # padding positions always map to segment K-1 which no real contig
        # uses because the bucket is strictly larger
        self.K = _bucket(max_local + 1, minimum=8)
        self._padded = padded

    @staticmethod
    def build(lengths, contig_end_exclusion: int) -> "ReferenceLayout":
        return ReferenceLayout(lengths, contig_end_exclusion)

    @property
    def n_contigs(self) -> int:
        return int(self.lengths.size)

    def device_chunk(self, ci: int):
        """(pos_seg, window, valid) device arrays for chunk ci (cached)."""
        ch = self.chunks[ci]
        if ch._device is not None:
            return ch._device
        P, K = self.P, self.K
        plens = self._padded[ch.cids]
        fill = int(plens.sum())
        seg = np.full(P, K - 1, dtype=np.int32)
        seg[:fill] = np.repeat(np.arange(ch.n_local, dtype=np.int32), plens)
        pos_in = np.arange(P, dtype=np.int64)
        base_of_pos = np.zeros(P, dtype=np.int64)
        base_of_pos[:fill] = np.repeat(ch.base, plens)
        pos_in = pos_in - base_of_pos
        len_of_pos = np.zeros(P, dtype=np.int64)
        len_of_pos[:fill] = np.repeat(self.lengths[ch.cids], plens)
        valid = pos_in < len_of_pos
        valid[fill:] = False
        ee = self.contig_end_exclusion
        window = valid & (len_of_pos > 2 * ee) & (pos_in >= ee) & (
            pos_in <= len_of_pos - 1 - ee)
        ch._device = (jnp.asarray(seg), jnp.asarray(window), jnp.asarray(valid))
        return ch._device


@dataclass
class DepthStats:
    """Per-contig integer statistics for one sample (host numpy)."""

    sum_depth_window: np.ndarray   # int64[C]  Σ depth inside exclusion window
    covered_window: np.ndarray     # int64[C]  positions depth>0 inside window
    covered_full: np.ndarray       # int64[C]  positions depth>0 anywhere
    max_depth_window: np.ndarray   # int64[C]  max depth inside window
    hist: np.ndarray | None = None  # int64[C, D] window depth histogram
    trimmed_sum: np.ndarray | None = None  # int64[C] trimmed-mean numerators
    # second moment + window minimum: enough for the shifted-variance
    # estimator without materialising a histogram (hist cost is
    # O(contigs x max_depth) — prohibitive at assembly scale)
    sumsq_window: np.ndarray | None = None  # int64[C] Σ depth² inside window
    min_depth_window: np.ndarray | None = None  # int64[C] min depth in window
    # ragged overflow rows for contigs whose depth exceeds the dense hist
    # width (tid -> full int64 row); dense rows for those tids are zero
    hist_wide: dict | None = None


def stats_core_math(scatter_idx, scatter_val, pos_seg, window_mask, valid_mask,
                    n_seg):
    """One chunk: scatter deltas, cumsum depth, reduce per local segment.

    Pure jittable math (unjitted entry point used by __graft_entry__)."""
    P = pos_seg.shape[0]
    delta = jnp.zeros(P + 1, dtype=jnp.int32)
    delta = delta.at[scatter_idx].add(scatter_val, mode="drop")
    delta = delta[:P]

    raw = jnp.cumsum(delta, dtype=jnp.int32)
    seg_total = jax.ops.segment_sum(delta, pos_seg, n_seg)
    carry = jnp.cumsum(seg_total) - seg_total
    depth = raw - carry[pos_seg].astype(jnp.int32)

    dw = jnp.where(window_mask, depth, 0)
    sum_w = jax.ops.segment_sum(dw.astype(jnp.int64), pos_seg, n_seg)
    cov_w = jax.ops.segment_sum((dw > 0).astype(jnp.int32), pos_seg, n_seg)
    cov_f = jax.ops.segment_sum(
        ((depth > 0) & valid_mask).astype(jnp.int32), pos_seg, n_seg)
    max_w = jax.ops.segment_max(dw, pos_seg, n_seg,
                                indices_are_sorted=True)
    sq_w = jax.ops.segment_sum(
        dw.astype(jnp.int64) * dw.astype(jnp.int64), pos_seg, n_seg)
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    min_w = jax.ops.segment_min(jnp.where(window_mask, depth, big), pos_seg,
                                n_seg, indices_are_sorted=True)
    min_w = jnp.where(min_w == big, 0, min_w)  # contig without window
    return (sum_w, cov_w.astype(jnp.int64), cov_f.astype(jnp.int64), max_w,
            depth, sq_w, min_w)


_stats_core = partial(jax.jit, static_argnames=("n_seg",))(stats_core_math)


@partial(jax.jit, static_argnames=("n_seg", "n_bins"))
def _hist_core(depth, pos_seg, window_mask, n_seg, n_bins):
    d = jnp.clip(depth, 0, n_bins - 1).astype(jnp.int32)
    flat = pos_seg.astype(jnp.int32) * n_bins + d
    hist = jnp.zeros(n_seg * n_bins, dtype=jnp.int32)
    hist = hist.at[jnp.where(window_mask, flat, n_seg * n_bins)].add(
        1, mode="drop")
    return hist.reshape(n_seg, n_bins)


def compute_depth_stats(layout: ReferenceLayout, tids, starts, ends,
                        need_hist: bool = False, trim=None) -> DepthStats:
    """Compute per-contig depth statistics for one sample's blocks.

    tids/starts/ends: one row per alignment block (M/X/= run), already
    filtered to records that contribute coverage.  Blocks must satisfy
    0 <= start < len and start <= end <= len.
    """
    C = layout.n_contigs
    sum_w = np.zeros(C, dtype=np.int64)
    cov_w = np.zeros(C, dtype=np.int64)
    cov_f = np.zeros(C, dtype=np.int64)
    max_w = np.zeros(C, dtype=np.int64)
    sq_w = np.zeros(C, dtype=np.int64)
    min_w = np.zeros(C, dtype=np.int64)

    tids = np.asarray(tids, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    if tids.size == 0 or C == 0:
        return DepthStats(sum_w, cov_w, cov_f, max_w,
                          np.zeros((C, 1), np.int64) if need_hist else None,
                          np.zeros(C, np.int64) if trim is not None else None,
                          sq_w, min_w)

    P, K = layout.P, layout.K
    chunk_ids = layout.chunk_of_contig[tids]
    order = np.argsort(chunk_ids, kind="stable")
    s_chunk = chunk_ids[order]
    s_tids = tids[order]
    local_start = layout.base_of_contig[s_tids] + starts[order]
    raw_end = ends[order]
    local_end = layout.base_of_contig[s_tids] + raw_end
    end_keep = raw_end < layout.lengths[s_tids]

    touched = np.unique(s_chunk)
    lo = np.searchsorted(s_chunk, touched, side="left")
    hi = np.searchsorted(s_chunk, touched, side="right")

    pending = []  # (chunk, device result tuple)
    for t in range(touched.size):
        ci = int(touched[t])
        a, b = int(lo[t]), int(hi[t])
        n = b - a
        idx = np.concatenate([
            local_start[a:b],
            np.where(end_keep[a:b], local_end[a:b], P)])
        val = np.concatenate([
            np.ones(n, dtype=np.int32), -np.ones(n, dtype=np.int32)])
        nb = _bucket(idx.size)
        pad = nb - idx.size
        if pad:
            idx = np.concatenate([idx, np.full(pad, P, dtype=np.int64)])
            val = np.concatenate([val, np.zeros(pad, dtype=np.int32)])
        pos_seg, window, valid = layout.device_chunk(ci)
        r = _stats_core(jnp.asarray(idx.astype(np.int32)), jnp.asarray(val),
                        pos_seg, window, valid, K)
        pending.append((ci, r))

    global_max = 0
    for ci, r in pending:
        ch = layout.chunks[ci]
        nl = ch.n_local
        # only the tiny per-segment stats cross device->host
        rs, rcw, rcf, rmw = [np.asarray(jax.device_get(x)) for x in r[:4]]
        rsq, rmin = [np.asarray(jax.device_get(x)) for x in r[5:7]]
        sum_w[ch.cids] += rs[:nl]
        cov_w[ch.cids] += rcw[:nl]
        cov_f[ch.cids] += rcf[:nl]
        sq_w[ch.cids] += rsq[:nl]
        min_w[ch.cids] = rmin[:nl]  # a contig lives in exactly one chunk
        mw = np.maximum(rmw[:nl], 0)
        max_w[ch.cids] = np.maximum(max_w[ch.cids], mw)
        if mw.size:
            global_max = max(global_max, int(mw.max()))

    hist = None
    if need_hist or trim is not None:
        n_bins = _bucket(global_max + 1, minimum=128)
        hist = np.zeros((C, n_bins), dtype=np.int64)
        for ci, r in pending:
            ch = layout.chunks[ci]
            pos_seg, window, _valid = layout.device_chunk(ci)
            h = np.asarray(jax.device_get(_hist_core(
                r[4], pos_seg, window, K, n_bins)))
            hist[ch.cids] += h[: ch.n_local]

    trimmed = None
    if trim is not None:
        from .sweep import trimmed_sum_via_hist
        trimmed = trimmed_sum_via_hist(layout, hist, trim)
        if not need_hist:
            hist = None
    return DepthStats(sum_w, cov_w, cov_f, max_w, hist, trimmed, sq_w, min_w)


def compute_depth_stats_numpy(layout: ReferenceLayout, tids, starts, ends,
                              need_hist: bool = False,
                              trim=None) -> DepthStats:
    """Pure-numpy oracle of compute_depth_stats (for tests)."""
    C = layout.n_contigs
    sum_w = np.zeros(C, dtype=np.int64)
    cov_w = np.zeros(C, dtype=np.int64)
    cov_f = np.zeros(C, dtype=np.int64)
    max_w = np.zeros(C, dtype=np.int64)
    sq_w = np.zeros(C, dtype=np.int64)
    min_w = np.zeros(C, dtype=np.int64)
    ee = layout.contig_end_exclusion
    tids = np.asarray(tids)
    starts = np.asarray(starts)
    ends = np.asarray(ends)
    max_bins = 1
    per_contig_depth = {}
    for c in np.unique(tids).tolist():
        ln = int(layout.lengths[c])
        delta = np.zeros(ln + 1, dtype=np.int64)
        m = tids == c
        np.add.at(delta, starts[m], 1)
        e = ends[m]
        np.add.at(delta, e[e < ln], -1)
        depth = np.cumsum(delta[:ln])
        per_contig_depth[c] = depth
        if ln > 2 * ee:
            w = depth[ee : ln - ee]
            sum_w[c] = w.sum()
            cov_w[c] = (w > 0).sum()
            max_w[c] = w.max() if w.size else 0
            sq_w[c] = (w * w).sum()
            min_w[c] = w.min() if w.size else 0
            max_bins = max(max_bins, int(max_w[c]) + 1)
        cov_f[c] = (depth > 0).sum()
    hist = None
    if need_hist:
        hist = np.zeros((C, max_bins), dtype=np.int64)
        for c, depth in per_contig_depth.items():
            ln = int(layout.lengths[c])
            if ln > 2 * ee:
                w = depth[ee : ln - ee]
                hist[c] += np.bincount(w, minlength=max_bins)[:max_bins]
    trimmed = None
    if trim is not None:
        hh = hist
        if hh is None:
            hh = np.zeros((C, max_bins), dtype=np.int64)
            for c, depth in per_contig_depth.items():
                ln = int(layout.lengths[c])
                if ln > 2 * ee:
                    w = depth[ee : ln - ee]
                    hh[c] += np.bincount(w, minlength=max_bins)[:max_bins]
        from .sweep import trimmed_sum_via_hist
        trimmed = trimmed_sum_via_hist(layout, hh, trim)
    return DepthStats(sum_w, cov_w, cov_f, max_w, hist, trimmed, sq_w, min_w)
