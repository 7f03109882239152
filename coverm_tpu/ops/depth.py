"""Device depth engine: interval tensors -> per-contig coverage statistics.

This replaces the reference's mosdepth-style streaming scan (the
ups-and-downs delta array + serial prefix sum, contig.rs:144-202 and the
estimators' add_contig prefix-sum loops) with an array program over a
*chunked, padded position space*:

  - only contigs with at least one alignment block are materialised
    ("observed"; unobserved contigs contribute zero statistics and are
    handled symbolically by the estimator layer), so cost scales with
    the mapped data, not the reference size;
  - observed contigs are padded to a multiple of ``LANE`` (128) and
    greedily packed into fixed-size chunks of ``CHUNK`` positions, so
    every device call has static shapes (one XLA compilation per bucket);
  - alignment blocks scatter +1 at their start and -1 at their end (ends
    at the contig end are dropped, matching contig.rs:178-183);
  - depth is one cumsum per chunk with per-contig carry subtraction;
  - per-contig statistics are segment reductions over the position axis;
  - the depth histogram (trimmed mean / variance / coverage_histogram)
    is a 2-D scatter-add with a static bin count.

All statistics are integers; the estimator layer (estimators.py)
reproduces the reference's exact f32 arithmetic from them.
"""

from __future__ import annotations

from dataclasses import dataclass
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
import os as _os_plat

if _os_plat.environ.get("COVERM_TPU_PLATFORM"):
    jax.config.update("jax_platforms", _os_plat.environ["COVERM_TPU_PLATFORM"])

# Persistent compilation cache: first-compile on the tunnelled TPU is ~3min,
# so cache compiled executables across processes (COVERM_TPU_CACHE=0 disables).
import os as _os

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


_warmup_thread = None


def start_transfer_warmup():
    """Kick the device->host data plane in the background.

    On the tunnelled axon TPU backend the *first* device->host transfer of
    a process pays a ~200s one-time channel setup.  Starting it on a daemon
    thread lets it overlap with host-side BAM decode instead of blocking
    the first result fetch.  Harmless (a 4-byte copy) everywhere else.
    """
    global _warmup_thread
    if _warmup_thread is not None:
        return
    import threading

    def _kick():
        try:
            jax.device_get(jnp.zeros((), jnp.int32))
        except Exception:
            pass

    _warmup_thread = threading.Thread(target=_kick, daemon=True)
    _warmup_thread.start()


@dataclass(frozen=True)
class ReferenceLayout:
    """Reference metadata shared by all samples (lengths + end exclusion)."""

    lengths: np.ndarray  # int64[C]
    contig_end_exclusion: int

    @staticmethod
    def build(lengths, contig_end_exclusion: int) -> "ReferenceLayout":
        return ReferenceLayout(
            lengths=np.asarray(lengths, dtype=np.int64),
            contig_end_exclusion=int(contig_end_exclusion),
        )

    @property
    def n_contigs(self) -> int:
        return int(self.lengths.size)


@dataclass
class DepthStats:
    """Per-contig integer statistics for one sample (host numpy)."""

    sum_depth_window: np.ndarray   # int64[C]  Σ depth inside exclusion window
    covered_window: np.ndarray     # int64[C]  positions depth>0 inside window
    covered_full: np.ndarray       # int64[C]  positions depth>0 anywhere
    max_depth_window: np.ndarray   # int64[C]  max depth inside window
    hist: np.ndarray | None = None  # int64[C, D] window depth histogram


@partial(jax.jit, static_argnames=("n_seg",))
def _stats_core(scatter_idx, scatter_val, pos_seg, window_mask, valid_mask, n_seg):
    """One chunk: scatter deltas, cumsum depth, reduce per local segment."""
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
    return sum_w, cov_w.astype(jnp.int64), cov_f.astype(jnp.int64), max_w, depth


@partial(jax.jit, static_argnames=("n_seg", "n_bins"))
def _hist_core(depth, pos_seg, window_mask, n_seg, n_bins):
    d = jnp.clip(depth, 0, n_bins - 1).astype(jnp.int32)
    flat = pos_seg.astype(jnp.int32) * n_bins + d
    hist = jnp.zeros(n_seg * n_bins, dtype=jnp.int32)
    hist = hist.at[jnp.where(window_mask, flat, n_seg * n_bins)].add(
        1, mode="drop")
    return hist.reshape(n_seg, n_bins)


def _bucket(n: int, minimum: int = 1024) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclass
class _Chunk:
    contigs: np.ndarray      # global contig ids packed in this chunk
    seg_of_pos: np.ndarray   # int32[P] local segment id per position
    window: np.ndarray       # bool[P]
    valid: np.ndarray        # bool[P]
    pos_base: np.ndarray     # int64[K] flat offset of each segment in chunk
    block_sel: np.ndarray    # indices into the block arrays for this chunk
    n_local: int


def _pack_chunks(obs_ids, lengths, ee, chunk_positions):
    """Greedily pack observed contigs into fixed-size position chunks."""
    padded = np.maximum(_round_up(lengths[obs_ids], LANE), LANE)
    max_padded = int(padded.max()) if padded.size else LANE
    total_padded = int(padded.sum()) if padded.size else LANE
    # small samples use small (bucketed) chunks; large ones cap at
    # chunk_positions so memory stays bounded
    P = min(_bucket(total_padded, minimum=LANE), chunk_positions)
    P = max(P, _bucket(max_padded, minimum=LANE))
    chunks = []
    cur, cur_fill = [], 0
    for cid, pl in zip(obs_ids.tolist(), padded.tolist()):
        if cur_fill + pl > P:
            chunks.append(cur)
            cur, cur_fill = [], 0
        cur.append((cid, pl))
        cur_fill += pl
    if cur:
        chunks.append(cur)
    return P, chunks


def compute_depth_stats(layout: ReferenceLayout, tids, starts, ends,
                        need_hist: bool = False,
                        chunk_positions: int = DEFAULT_CHUNK) -> DepthStats:
    """Compute per-contig depth statistics for one sample's blocks.

    tids/starts/ends: one row per alignment block (M/X/= run), already
    filtered to records that contribute coverage.  Blocks must satisfy
    0 <= start < len and start <= end <= len.
    """
    C = layout.n_contigs
    lengths = layout.lengths
    ee = layout.contig_end_exclusion
    sum_w = np.zeros(C, dtype=np.int64)
    cov_w = np.zeros(C, dtype=np.int64)
    cov_f = np.zeros(C, dtype=np.int64)
    max_w = np.zeros(C, dtype=np.int64)

    tids = np.asarray(tids, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    obs_ids = np.unique(tids)
    if obs_ids.size == 0:
        return DepthStats(sum_w, cov_w, cov_f, max_w,
                          np.zeros((C, 1), np.int64) if need_hist else None)

    order = np.argsort(tids, kind="stable")
    s_tids, s_starts, s_ends = tids[order], starts[order], ends[order]
    block_lo = np.searchsorted(s_tids, obs_ids, side="left")
    block_hi = np.searchsorted(s_tids, obs_ids, side="right")

    P, packs = _pack_chunks(obs_ids, lengths, ee, chunk_positions)
    K = max(len(p) for p in packs)
    K = _bucket(K, minimum=8)

    chunk_results = []
    for pack in packs:
        cids = np.array([c for c, _ in pack], dtype=np.int64)
        plens = np.array([p for _, p in pack], dtype=np.int64)
        n_local = len(pack)
        bases = np.concatenate(([0], np.cumsum(plens)))[:-1]
        fill = int(plens.sum())

        seg_of_pos = np.full(P, K - 1, dtype=np.int32)
        seg_of_pos[:fill] = np.repeat(np.arange(n_local, dtype=np.int32), plens)
        pos_in = np.arange(P, dtype=np.int64)
        base_of_pos = np.zeros(P, dtype=np.int64)
        base_of_pos[:fill] = np.repeat(bases, plens)
        pos_in = pos_in - base_of_pos
        len_of_pos = np.zeros(P, dtype=np.int64)
        len_of_pos[:fill] = np.repeat(lengths[cids], plens)
        valid = pos_in < len_of_pos
        valid[fill:] = False
        window = valid & (len_of_pos > 2 * ee) & (pos_in >= ee) & (
            pos_in <= len_of_pos - 1 - ee)

        # blocks for this chunk
        sel = np.concatenate([
            np.arange(block_lo[np.searchsorted(obs_ids, c)],
                      block_hi[np.searchsorted(obs_ids, c)])
            for c in cids
        ])
        btid = s_tids[sel]
        local = np.searchsorted(cids, btid)
        bstart = s_starts[sel] + bases[local]
        bend = s_ends[sel] + bases[local]
        end_keep = s_ends[sel] < lengths[btid]

        idx = np.concatenate([bstart, np.where(end_keep, bend, P)])
        val = np.concatenate([
            np.ones(bstart.size, dtype=np.int32),
            -np.ones(bend.size, dtype=np.int32)])
        nb = _bucket(idx.size)
        idx = np.concatenate([idx, np.full(nb - idx.size, P, dtype=np.int64)])
        val = np.concatenate([val, np.zeros(nb - val.size, dtype=np.int32)])

        r = _stats_core(jnp.asarray(idx.astype(np.int32)), jnp.asarray(val),
                        jnp.asarray(seg_of_pos), jnp.asarray(window),
                        jnp.asarray(valid), K)
        chunk_results.append((cids, n_local, r, seg_of_pos, window))

    # accumulate per-contig stats on host
    global_max = 0
    for cids, n_local, r, _, _ in chunk_results:
        rs, rcw, rcf, rmw, _depth = [np.asarray(jax.device_get(x)) for x in r]
        sum_w[cids] += rs[:n_local]
        cov_w[cids] += rcw[:n_local]
        cov_f[cids] += rcf[:n_local]
        max_w[cids] = np.maximum(max_w[cids], np.maximum(rmw[:n_local], 0))
        global_max = max(global_max, int(max_w[cids].max()))

    hist = None
    if need_hist:
        n_bins = _bucket(global_max + 1, minimum=128)
        hist = np.zeros((C, n_bins), dtype=np.int64)
        for cids, n_local, r, seg_of_pos, window in chunk_results:
            depth = r[4]
            h = np.asarray(jax.device_get(_hist_core(
                depth, jnp.asarray(seg_of_pos), jnp.asarray(window), K, n_bins)))
            hist[cids] += h[:n_local]

    return DepthStats(sum_w, cov_w, cov_f, max_w, hist)


def compute_depth_stats_numpy(layout: ReferenceLayout, tids, starts, ends,
                              need_hist: bool = False) -> DepthStats:
    """Pure-numpy oracle of compute_depth_stats (for tests)."""
    C = layout.n_contigs
    sum_w = np.zeros(C, dtype=np.int64)
    cov_w = np.zeros(C, dtype=np.int64)
    cov_f = np.zeros(C, dtype=np.int64)
    max_w = np.zeros(C, dtype=np.int64)
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
    return DepthStats(sum_w, cov_w, cov_f, max_w, hist)
