"""Event-sweep depth engine: O(B log B) in alignment blocks.

Instead of materialising per-position depth (ops/depth.py), sort the
2B interval endpoints and sweep: between consecutive events the depth is
constant, so every statistic is a weighted reduction over event *gaps*:

    sum_w  = Σ_gaps depth · |gap ∩ window|
    cov_w  = Σ_gaps [depth>0] · |gap ∩ window|
    cov_f  = Σ_gaps [depth>0] · |gap ∩ [0, len)|
    hist[d]= Σ_gaps [depth=d] · |gap ∩ window|   (d>0; bin 0 by difference)

Cost scales with the number of mapped reads — independent of reference
length.  The pipeline is built ONLY from TPU-fast primitives — sort,
cumsum/cummax scans, vector select — with no scatters or large gathers
(XLA lowers those serially on TPU):

  - per-contig metadata (length) travels with the sort as *sentinel
    events* (one per contig, sorting before its contig's blocks) and is
    forward-filled to every event with a packed cummax scan;
  - the per-contig depth carry is read off the running sign-cumsum at
    each sentinel and forward-filled the same way;
  - per-contig reductions are boundary differences of weighted cumsums
    (boundaries located with a tiny searchsorted);
  - the depth histogram is a second sort by (contig, depth) followed by
    a cumsum and dense boundary queries.

The host uploads 3 int32 arrays per sample and downloads per-contig
statistics; nothing position-sized ever crosses the link.

Semantics match ops/depth.py bit-for-bit: ends at the contig end drop
their -1 event (contig.rs:178-183), the exclusion window is
[ee, len-1-ee] for contigs with len > 2·ee.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .depth import DepthStats, ReferenceLayout, _bucket

# beyond this many contigs, per-contig outputs are remapped to the dense
# observed set on host to bound histogram/stat sizes
DENSE_REMAP_THRESHOLD = 1 << 16
_MASK32 = (1 << 32) - 1

# speculative histogram width fused into the main sweep call; depths
# >= this trigger one re-dispatch with a wider histogram (rare: depth
# 512+ coverage)
SPEC_HIST_BINS = 512

# ---- warm-shape registry (VERDICT r4 #1) -------------------------------
# On the tunnelled TPU, loading ONE sweep executable (even a persistent-
# cache HIT) costs 55-400 s when the remote compile service is degraded
# — measured r5: 3 concurrent cache-hit loads at 167 s each, a single
# load at 387 s minutes later, vs ~5 s on a healthy day.  Blocking the
# first result on every distinct batch shape multiplies that cost.
# Instead: the first time a shape is needed, dispatch on any ALREADY-
# WARM compatible shape with B' >= B (padding blocks are free semantics
# — they route to the invalid segment and contribute nothing), capped at
# _REUSE_CAP x waste, while the exact shape compiles in the background;
# dispatches upgrade to the exact shape the moment its executable is
# live.  No dispatch ever blocks on a compile that a warm shape could
# cover.  COVERM_TPU_SHAPE_REUSE=0 disables.
_warm_shapes: set = set()
_inflight_shapes: set = set()
import threading as _threading  # noqa: E402

_shape_lock = _threading.Lock()
_REUSE_CAP = 8


def _reuse_enabled() -> bool:
    import os
    return os.environ.get("COVERM_TPU_SHAPE_REUSE", "1") != "0"


def _shape_key(B, n_seg, ee, need_hist, n_bins, len_mode, trim_key,
               start_mode):
    return (B, n_seg, ee, need_hist, n_bins, len_mode, trim_key, start_mode)


def _mark_warm(key):
    with _shape_lock:
        _warm_shapes.add(key)
        _inflight_shapes.discard(key)


def _pick_shape(B_exact, n_seg, ee, need_hist, n_bins, len_mode, trim_key,
                start_mode):
    """The B to dispatch on: exact if warm (or reuse disabled / nothing
    better), else the smallest warm compatible B' in [B_exact,
    cap*B_exact] — kicking the exact shape's compile off in the
    background so later dispatches converge to the tight shape."""
    exact = _shape_key(B_exact, n_seg, ee, need_hist, n_bins, len_mode,
                       trim_key, start_mode)
    if not _reuse_enabled():
        return B_exact
    with _shape_lock:
        if exact in _warm_shapes:
            return B_exact
        best = None
        for k in _warm_shapes:
            if (k[1:] == exact[1:] and k[0] >= B_exact
                    and k[0] <= _REUSE_CAP * B_exact
                    and (best is None or k[0] < best)):
                best = k[0]
        if best is None:
            return B_exact  # first-ever shape family: compile blocking
        spawn = exact not in _inflight_shapes
        if spawn:
            _inflight_shapes.add(exact)
    if spawn:
        prewarm_sweep(B_exact, n_seg, ee, need_hist=need_hist,
                      trim=trim_key, len_mode=len_mode,
                      start_mode=start_mode, n_bins=n_bins)
    return best


def _bucket_geo(n: int, minimum: int = 1024) -> int:
    """Geometric size buckets: bounds h2d padding waste while keeping the
    number of distinct compiled shapes small.  Ratio 1.25 below 1M blocks
    (25% max waste), ratio 1.5 above (each fresh compile of the fused
    sweep costs tens of seconds on the tunnelled TPU, so the large-shape
    family must stay small — VERDICT r2 measured a 716s warmup from
    shape-family growth)."""
    b = minimum
    while b < n:
        # ceil(b*ratio) rounded UP to a multiple of 128 (rounding down
        # stalls the loop at small b, e.g. 128 -> 160 -> 128)
        num, den = (3, 2) if b >= (1 << 20) else (5, 4)
        b = (-(-b * num // den) + 127) // 128 * 128
    return b


def packed_result_len(n_seg: int, need_hist: bool, n_bins: int,
                      has_trim: bool) -> int:
    """Length of the packed int64 stats vector produced by _packed_math:
    [sum_w | cov_w | cov_f | max_w | sq_w | min_w | gmax (| trim) (| hist)]."""
    n = 6 * n_seg + 1
    if has_trim:
        n += n_seg
    if need_hist:
        n += n_seg * n_bins
    return n


def _sweep_core(tids, starts, ends, valid_block, end_keep, seg_len, n_seg,
                ee, with_max=True):
    """Events + sort + sweep + per-contig reductions, scan-only.

    tids/starts/ends: int32[B] (padded; valid_block False on padding)
    end_keep: bool[B] (end < contig length; end events at the contig end
              are dropped, contig.rs:178-183)
    seg_len: int64[n_seg] contig lengths (0 for unused segments)
    """

    seg_b = tids.astype(jnp.int64)
    # keys: seg<<34 | (pos+1)<<2 | is_start<<1 ; sentinels use pos-field 0
    # so they sort first within their contig; padding sorts last with key
    # MAX.  The event sign travels in a key bit, so the sort carries ONE
    # payload (i32 contig lengths on the sentinels) instead of three.
    # Events at equal (seg, pos) now order ends-before-starts — the gap
    # between equal positions has zero length, so no statistic changes.
    key_start = jnp.where(valid_block,
                          (seg_b << 34) | ((starts.astype(jnp.int64) + 1) << 2)
                          | 2,
                          jnp.iinfo(jnp.int64).max)
    key_end = jnp.where(end_keep,
                        (seg_b << 34) | ((ends.astype(jnp.int64) + 1) << 2),
                        jnp.iinfo(jnp.int64).max)
    sent_seg = jnp.arange(n_seg, dtype=jnp.int64)
    key_sent = sent_seg << 34

    key = jnp.concatenate([key_sent, key_start, key_end])
    paylen = jnp.concatenate([
        seg_len.astype(jnp.int32), jnp.zeros(tids.shape[0] * 2, jnp.int32)])

    key_s, paylen_s = jax.lax.sort((key, paylen), num_keys=1)
    is_pad = key_s == jnp.iinfo(jnp.int64).max
    seg_s = jnp.where(is_pad, n_seg, key_s >> 34)
    pos_s = ((key_s >> 2) & _MASK32) - 1  # sentinel -> -1
    sign_s = jnp.where(is_pad | (pos_s == -1), 0,
                       jnp.where((key_s & 2) != 0, 1, -1)).astype(jnp.int32)

    # forward-fill contig length from the sentinel (packed cummax)
    length = jax.lax.cummax(
        (seg_s << 33) + paylen_s.astype(jnp.int64)) - (seg_s << 33)
    length = jnp.where(is_pad, 0, length)

    # running depth; per-contig carry = running sum at the sentinel
    csum = jnp.cumsum(sign_s, dtype=jnp.int32)
    is_sent = pos_s == -1
    carry_fill = jax.lax.cummax(
        (seg_s << 33) + jnp.where(is_sent, csum.astype(jnp.int64), 0))
    carry = carry_fill - (seg_s << 33)
    depth = csum - carry.astype(jnp.int32)

    # gap i covers [pos_i, next_pos_i) within contig seg_i
    next_seg = jnp.concatenate([seg_s[1:], jnp.full((1,), n_seg, jnp.int64)])
    next_pos = jnp.concatenate([pos_s[1:], jnp.zeros((1,), pos_s.dtype)])
    gap_end = jnp.where(next_seg == seg_s, next_pos, length)

    full_len = jnp.clip(jnp.minimum(gap_end, length) - jnp.maximum(pos_s, 0), 0)
    whi = length - ee  # exclusive window end
    w_len = jnp.clip(jnp.minimum(gap_end, whi) - jnp.maximum(pos_s, ee), 0)
    w_len = jnp.where(length > 2 * ee, w_len, 0)
    full_len = jnp.where(is_pad, 0, full_len)
    w_len = jnp.where(is_pad, 0, w_len)

    covered = depth > 0
    d64 = depth.astype(jnp.int64)
    cs_sum = jnp.cumsum(jnp.where(covered, d64 * w_len, 0))
    cs_cov = jnp.cumsum(jnp.where(covered, w_len, 0))
    cs_ful = jnp.cumsum(jnp.where(covered, full_len, 0))
    cs_sq = jnp.cumsum(jnp.where(covered, d64 * d64 * w_len, 0))
    # window minimum depth via a (seg, BIG-depth) cummax fill; gaps with
    # no window overlap carry payload 0 and lose to any real gap
    bigm = jnp.int64(1) << 31
    cm_min = jax.lax.cummax(
        (seg_s << 33) + jnp.where(w_len > 0, bigm - d64, 0))
    if with_max:
        cm_max = jax.lax.cummax(
            (seg_s << 33) + jnp.where(covered & (w_len > 0),
                                      depth.astype(jnp.int64), 0))

    # per-contig boundary positions: first event (the sentinel) of each seg
    bounds = jnp.searchsorted(key_s, (jnp.arange(
        n_seg + 1, dtype=jnp.int64) << 34))
    hi = jnp.clip(bounds[1:] - 1, 0)  # last event of each seg
    lo = jnp.clip(bounds[:-1] - 1, 0)  # event before the sentinel

    def seg_diff(cs):
        first = jnp.where(bounds[:-1] > 0, cs[lo], 0)
        return cs[hi] - first

    sum_w = seg_diff(cs_sum)
    cov_w = seg_diff(cs_cov)
    cov_f = seg_diff(cs_ful)
    sq_w = seg_diff(cs_sq)
    min_fill = cm_min[hi] - (jnp.arange(n_seg, dtype=jnp.int64) << 33)
    min_w = jnp.where(min_fill > 0, bigm - min_fill, 0)
    if with_max:
        max_w = jnp.clip(
            cm_max[hi] - (jnp.arange(n_seg, dtype=jnp.int64) << 33), 0)
        gmax = jnp.max(jnp.where(covered & (w_len > 0), depth, 0))
    else:
        max_w = jnp.zeros(n_seg, jnp.int64)
        gmax = jnp.zeros((), jnp.int32)
    return (sum_w, cov_w, cov_f, max_w, gmax, depth, w_len, seg_s,
            sq_w, min_w)


_fused_sweep = partial(jax.jit, static_argnames=("n_seg", "ee", "with_max"))(
    _sweep_core)


def _hist_math(depth, w_len, seg_of_event, n_seg, n_bins):
    """Gap-weighted depth histogram via sort + cumsum + dense queries."""
    d = jnp.clip(depth, 0, n_bins - 1).astype(jnp.int64)
    contrib = jnp.where((depth > 0) & (seg_of_event < n_seg),
                        w_len.astype(jnp.int64), 0)
    bin_key = jnp.where(seg_of_event < n_seg,
                        seg_of_event * n_bins + d,
                        n_seg * n_bins)
    key_s, w_s = jax.lax.sort((bin_key, contrib), num_keys=1)
    cs = jnp.cumsum(w_s)
    q = jnp.arange(n_seg * n_bins + 1, dtype=jnp.int64)
    b = jnp.searchsorted(key_s, q)
    ends = jnp.where(b > 0, cs[jnp.clip(b - 1, 0)], 0)
    totals = ends[1:] - ends[:-1]
    return totals.reshape(n_seg, n_bins)


def _packed_math(starts, lens_or_ends, counts_ext, seg_len, scalar_len,
                 n_seg, ee, need_hist, n_bins, len_mode, trim=None,
                 start_mode="abs", first_start=None):
    """Transfer-minimal fused sweep: ONE device call, ONE packed result.

    The host sends, per sample:
      starts: int32[B]   block starts (grouped by contig — BAM streams
                         are reference-sorted so this grouping is free),
                         or uint16[B] start DELTAS (start_mode="d16":
                         starts are non-decreasing within a contig, so
                         the column is sent as within-contig differences
                         at 2 bytes/block and reconstructed on device
                         with one cumsum + per-contig rebase from the
                         first_start table)
      lens_or_ends:      block lengths as uint16 (len_mode="u16"), block
                         ends as int32 (len_mode="ends"), or a dummy when
                         every block has the same length
                         (len_mode="scalar": ends = starts + scalar_len)
      counts_ext: int32[n_seg+1]  blocks per contig (+ padding count) —
                         the contig-id column is reconstructed on device
                         with a repeat, so it never crosses the link
      first_start: int32[n_seg+1]  first block start per contig
                         (start_mode="d16" only; dummy otherwise)
      seg_len: int64[n_seg], scalar_len: int32 scalar

    Returns one int64 vector [sum_w | cov_w | cov_f | max_w | gmax
    (| hist[n_seg*n_bins])] so a single device->host fetch retrieves
    everything (each small fetch over the tunnelled link costs ~30ms).
    The histogram is computed speculatively with n_bins; the host
    re-dispatches wider iff gmax >= n_bins.
    """
    B = starts.shape[0]
    tids = jnp.repeat(jnp.arange(n_seg + 1, dtype=jnp.int32), counts_ext,
                      total_repeat_length=B)
    len_tab = jnp.concatenate(
        [seg_len.astype(jnp.int32), jnp.zeros(1, jnp.int32)])
    len_of = jnp.repeat(len_tab, counts_ext, total_repeat_length=B)
    if start_mode in ("d16", "d8"):
        cum = jnp.cumsum(starts.astype(jnp.int32))
        bnds = jnp.cumsum(counts_ext) - counts_ext  # first index per seg run
        base_tbl = cum[jnp.clip(bnds, 0, B - 1)]
        base = jnp.repeat(base_tbl, counts_ext, total_repeat_length=B)
        first = jnp.repeat(first_start, counts_ext, total_repeat_length=B)
        starts = first + cum - base
    if len_mode == "scalar":
        ends = starts + scalar_len
    elif len_mode == "u16":
        ends = starts + lens_or_ends.astype(jnp.int32)
    else:
        ends = lens_or_ends
    valid_block = tids < n_seg
    end_keep = valid_block & (ends < len_of)

    # with_max is pinned True: compiling the graph WITHOUT the max cummax
    # SIGSEGVs the TPU AOT compiler (same family as the fusion bug worked
    # around below), and the pass costs one cummax — noise next to the
    # sort.  Callers' need_max=False is normalised away before dispatch
    # so the jit cache holds ONE entry per shape.
    r = _sweep_core(tids, starts, ends, valid_block, end_keep, seg_len,
                    n_seg, ee, with_max=True)
    sum_w, cov_w, cov_f, max_w, gmax = r[:5]
    if not need_hist and trim is None:
        # Workaround for a TPU AOT compiler SIGSEGV: concatenating 5+ of
        # the per-seg reductions crashes the compile UNLESS a second sort
        # appears in the graph (the hist/trim sections both have one).
        # An n_seg-sized no-op sort breaks the offending fusion for free.
        sum_w = sum_w + 0 * jax.lax.sort(sum_w)
    parts = [sum_w, cov_w, cov_f, max_w, r[8], r[9],
             gmax.astype(jnp.int64).reshape(1)]
    if trim is not None:
        seg_W = jnp.where(seg_len > 2 * ee, seg_len - 2 * ee, 0)
        parts.append(_trimmed_math(r[5], r[6], r[7], seg_W,
                                   trim[0], trim[1], n_seg))
    if need_hist:
        hist = _hist_math(r[5], r[6], r[7], n_seg, n_bins)
        parts.append(hist.reshape(-1))
    return jnp.concatenate(parts)


_sweep_packed = partial(jax.jit, static_argnames=(
    "n_seg", "ee", "need_hist", "n_bins", "len_mode", "trim",
    "start_mode"))(_packed_math)


def _u8_layout(B, n_seg, start_mode, len_mode):
    """Byte offsets of the single-upload input buffer.

    The tunnelled link is LATENCY-bound (~4-5 ms per transfer call, not
    bandwidth): shipping scalar_len + counts + first_start + starts +
    payload as SEPARATE device puts costs 4-5 round-trip latencies per
    batch.  One u8 buffer = one put; the device splits it with
    bitcast_convert_type (free — layout is static).
    """
    start_bytes = {"abs": 4, "d16": 2, "d8": 1}[start_mode] * B
    start_bytes = -(-start_bytes // 4) * 4
    pay_bytes = {"scalar": 0, "u16": 2 * B, "ends": 4 * B}[len_mode]
    hdr = 16
    meta = 4 * (n_seg + 1)
    o_counts = hdr
    o_first = o_counts + meta
    o_starts = o_first + meta
    o_pay = o_starts + start_bytes
    total = o_pay + pay_bytes
    return o_counts, o_first, o_starts, o_pay, total


def _u8_math(buf, acc, seg_len, n_seg, ee, need_hist, n_bins, len_mode,
             trim, start_mode, B):
    """Single-buffer variant of _packed_math (+ in-call merge).

    buf: uint8[total] per _u8_layout; acc: an int64 vector added to the
    packed output in the same fused call — the previous contig-disjoint
    batch's packed output (DepthAccumulator: one d2h fetch per streaming
    pass) or zeros.  Always an array, never None, so every shape compiles
    exactly ONE variant (each fresh compile of this kernel costs tens of
    seconds on the tunnelled TPU).
    """
    from jax import lax

    o_counts, o_first, o_starts, o_pay, _ = _u8_layout(
        B, n_seg, start_mode, len_mode)

    def i32(lo, n):
        return lax.bitcast_convert_type(
            buf[lo:lo + 4 * n].reshape(n, 4), jnp.int32)

    def u16(lo, n):
        return lax.bitcast_convert_type(
            buf[lo:lo + 2 * n].reshape(n, 2), jnp.uint16)

    scalar_len = i32(0, 1)[0]
    counts_ext = i32(o_counts, n_seg + 1)
    first_start = i32(o_first, n_seg + 1)
    if start_mode == "abs":
        starts = i32(o_starts, B)
    elif start_mode == "d16":
        starts = u16(o_starts, B)
    else:
        starts = buf[o_starts:o_starts + B]
    if len_mode == "scalar":
        payload = jnp.zeros(1, jnp.uint16)
    elif len_mode == "u16":
        payload = u16(o_pay, B)
    else:
        payload = i32(o_pay, B)

    packed = _packed_math(starts, payload, counts_ext, seg_len, scalar_len,
                          n_seg, ee, need_hist, n_bins, len_mode, trim,
                          start_mode, first_start)
    return packed + acc


_sweep_packed_u8 = partial(jax.jit, static_argnames=(
    "n_seg", "ee", "need_hist", "n_bins", "len_mode", "trim", "start_mode",
    "B"))(_u8_math)


def _pack_u8(scalar_len, counts_ext, first_start, starts_col, payload_col,
             B, n_seg, start_mode, len_mode):
    """Assemble the single-upload buffer (host side, one memcpy each)."""
    o_counts, o_first, o_starts, o_pay, total = _u8_layout(
        B, n_seg, start_mode, len_mode)
    buf = np.zeros(total, dtype=np.uint8)
    buf[:4] = np.asarray([scalar_len], dtype=np.int32).view(np.uint8)
    buf[o_counts:o_counts + counts_ext.nbytes] = counts_ext.view(np.uint8)
    fs = first_start
    buf[o_first:o_first + fs.nbytes] = fs.view(np.uint8)
    sc = np.ascontiguousarray(starts_col)
    buf[o_starts:o_starts + sc.nbytes] = sc.view(np.uint8)
    if payload_col is not None:
        pc = np.ascontiguousarray(payload_col)
        buf[o_pay:o_pay + pc.nbytes] = pc.view(np.uint8)
    return buf

_sweep_hist = partial(jax.jit, static_argnames=("n_seg", "n_bins"))(_hist_math)


def _trimmed_math(depth, w_len, seg_s, seg_W, trim_min, trim_max, n_seg):
    """Per-seg trimmed-mean numerators from sorted gaps — scan-only.

    Rank-space closed form of the reference's histogram CDF walk
    (estimators.rs:598-643): the walk sums the depths at window ranks
    [max(lo,1), min(hi+1, W)], except when a single depth bin contains
    both rank lo and rank hi+1, which contributes (hi-lo+1)·depth.
    Gaps are re-sorted by (seg, depth); rank queries are searchsorted
    probes into the weight CDF — no histogram is ever materialised, so
    cost is independent of the maximum depth.
    """
    E = depth.shape[0]
    segi = seg_s.astype(jnp.int64)
    valid = segi < n_seg
    d64 = depth.astype(jnp.int64)
    w64 = jnp.where(valid, w_len.astype(jnp.int64), 0)
    key = jnp.where(valid, (segi << 32) + d64, jnp.iinfo(jnp.int64).max)
    key_s, w_s, d_s = jax.lax.sort((key, w64, d64), num_keys=1)
    cumw = jnp.cumsum(w_s)
    cumwd = jnp.cumsum(w_s * d_s)

    # trim indices, f32 arithmetic as the reference (estimators.rs:595-597)
    Wf = seg_W.astype(jnp.float32)
    lo = jnp.floor(jnp.float32(trim_min) * Wf).astype(jnp.int64)
    hi = jnp.ceil(jnp.float32(trim_max) * Wf).astype(jnp.int64)

    seg_ids = jnp.arange(n_seg, dtype=jnp.int64)
    bounds = jnp.searchsorted(key_s, seg_ids << 32)  # first gap of each seg
    base_w = jnp.where(bounds > 0, cumw[jnp.clip(bounds - 1, 0)], 0)
    base_wd = jnp.where(bounds > 0, cumwd[jnp.clip(bounds - 1, 0)], 0)

    def rank_gap(r):
        """Sorted-gap index holding within-seg rank r (1 <= r <= W)."""
        tgt = base_w + jnp.clip(r, 1, seg_W)
        return jnp.clip(jnp.searchsorted(cumw, tgt, side="left"), 0, E - 1)

    def S(r):
        """Σ_{k<=r} depth_at_rank(k) within each seg (0 when r <= 0)."""
        rr = jnp.clip(r, 0, seg_W)
        tgt = base_w + rr
        j = rank_gap(rr)
        prev_w = jnp.where(j > 0, cumw[jnp.clip(j - 1, 0)], 0)
        prev_wd = jnp.where(j > 0, cumwd[jnp.clip(j - 1, 0)], 0)
        s = (prev_wd - base_wd) + (tgt - prev_w) * d_s[j]
        return jnp.where(rr > 0, s, 0)

    a = jnp.maximum(lo, 1)
    b = jnp.minimum(hi + 1, seg_W)
    normal = S(b) - S(a - 1)
    normal = jnp.where(b >= a, normal, 0)
    # single-bin override: ranks lo and hi+1 fall in the same depth bin
    can_single = (lo >= 1) & (hi + 1 <= seg_W)
    d_lo = d_s[rank_gap(lo)]
    d_hi1 = d_s[rank_gap(hi + 1)]
    single = can_single & (d_lo == d_hi1)
    total = jnp.where(single, (hi - lo + 1) * d_lo, normal)
    return jnp.where(seg_W > 0, total, 0)


@partial(jax.jit, static_argnames=("n_seg",))
def _legacy_moments(depth, w_len, seg_s, n_seg):
    """Σ depth²·w and min depth over *covered* window gaps, for the
    Pallas legacy path (its w_len output is pre-masked to covered gaps;
    the caller zeroes the min where the window is not fully covered)."""
    d64 = depth.astype(jnp.int64)
    w64 = w_len.astype(jnp.int64)
    seg = seg_s.astype(jnp.int32)
    sq = jax.ops.segment_sum(jnp.where(depth > 0, d64 * d64 * w64, 0),
                             seg, n_seg + 1)
    big = jnp.int64(1) << 31
    mn = jax.ops.segment_min(jnp.where(w_len > 0, d64, big), seg, n_seg + 1)
    mn = jnp.where(mn >= big, 0, mn)
    return sq[:n_seg], mn[:n_seg]


@partial(jax.jit, static_argnames=("n_seg", "ee"))
def _fused_sweep_pallas(tids, starts, ends, valid_block, end_keep, seg_len,
                        n_seg, ee):
    """Sort in XLA, then run the fused Pallas sweep-scan kernel
    (ops/pallas_sweep.py) instead of the multi-pass XLA scans."""
    from .pallas_sweep import PAD_POS, TILE, pallas_sweep_scan

    B = tids.shape[0]
    seg = jnp.concatenate([
        jnp.arange(n_seg, dtype=jnp.int32),
        jnp.where(valid_block, tids, n_seg),
        jnp.where(end_keep, tids, n_seg)])
    pos = jnp.concatenate([
        jnp.full((n_seg,), -1, jnp.int32),
        jnp.where(valid_block, starts, PAD_POS),
        jnp.where(end_keep, ends, PAD_POS)])
    sign = jnp.concatenate([
        jnp.zeros(n_seg, jnp.int32),
        jnp.where(valid_block, 1, 0).astype(jnp.int32),
        jnp.where(end_keep, -1, 0).astype(jnp.int32)])
    paylen = jnp.concatenate([
        seg_len.astype(jnp.int32), jnp.zeros(2 * B, jnp.int32)])

    E = seg.shape[0]
    Epad = (E + TILE - 1) // TILE * TILE
    extra = Epad - E
    seg = jnp.concatenate([seg, jnp.full((extra,), n_seg, jnp.int32)])
    pos = jnp.concatenate([pos, jnp.full((extra,), PAD_POS, jnp.int32)])
    sign = jnp.concatenate([sign, jnp.zeros(extra, jnp.int32)])
    paylen = jnp.concatenate([paylen, jnp.zeros(extra, jnp.int32)])

    # sort by (seg, pos) with sentinels (pos -1) first within their contig
    key = (seg.astype(jnp.int64) << 33) + (pos.astype(jnp.int64) + 2)
    _k, seg_s, pos_s, sign_s, paylen_s = jax.lax.sort(
        (key, seg, pos, sign, paylen), num_keys=1)
    next_seg = jnp.concatenate([seg_s[1:], jnp.full((1,), n_seg, jnp.int32)])
    next_pos = jnp.concatenate([pos_s[1:], jnp.full((1,), PAD_POS, jnp.int32)])

    depth, w_len_c, full_len_c, maxs, maxv = pallas_sweep_scan(
        seg_s, pos_s, sign_s, paylen_s, next_seg, next_pos, ee,
        interpret=jax.default_backend() == "cpu")
    # the three wide cumulative sums stay in XLA (Mosaic has no i64)
    cs_sum = jnp.cumsum(depth.astype(jnp.int64) * w_len_c.astype(jnp.int64))
    cs_cov = jnp.cumsum(w_len_c.astype(jnp.int64))
    cs_ful = jnp.cumsum(full_len_c.astype(jnp.int64))
    w_len = w_len_c

    bounds = jnp.searchsorted(seg_s, jnp.arange(n_seg + 1, dtype=jnp.int32))
    hi = jnp.clip(bounds[1:] - 1, 0)
    lo = jnp.clip(bounds[:-1] - 1, 0)

    def seg_diff(cs):
        first = jnp.where(bounds[:-1] > 0, cs[lo], 0)
        return cs[hi] - first

    sum_w = seg_diff(cs_sum)
    cov_w = seg_diff(cs_cov)
    cov_f = seg_diff(cs_ful)
    seg_ids = jnp.arange(n_seg, dtype=jnp.int32)
    max_w = jnp.where(maxs[hi] == seg_ids, maxv[hi], 0).astype(jnp.int64)
    gmax = jnp.max(max_w)
    return (sum_w, cov_w, cov_f, max_w, gmax, depth, w_len, seg_s)


def _use_pallas() -> bool:
    import os
    return os.environ.get("COVERM_TPU_PALLAS", "0") == "1"


def _device_lengths(layout: ReferenceLayout, n_seg: int):
    # cache keyed by (n_seg, default device) — concurrent sample scans
    # pin different devices via jax.default_device (modes._scanned)
    dev_cfg = jax.config.jax_default_device
    key = (n_seg, getattr(dev_cfg, "id", None))
    cache = getattr(layout, "_sweep_seg_len_cache", None)
    if cache is None:
        cache = layout._sweep_seg_len_cache = {}
    cached = cache.get(key)
    if cached is not None:
        return cached
    seg_len = np.zeros(n_seg, dtype=np.int64)
    seg_len[: layout.n_contigs] = layout.lengths
    dev = jnp.asarray(seg_len)
    cache[key] = dev
    return dev


def empty_depth_stats(C, need_hist, trim):
    zero = lambda: np.zeros(C, dtype=np.int64)
    return DepthStats(zero(), zero(), zero(), zero(),
                      np.zeros((C, 1), np.int64) if need_hist else None,
                      zero() if trim is not None else None,
                      zero(), zero())


def prep_segments(layout: ReferenceLayout, tids, starts, ends,
                  contig_counts=None):
    """Shared host prologue: tid-sort fallback + dense remap.

    Returns (tids, starts, ends, seg_ids, n_seg, seg_len_dev, n_out, obs,
    counts); obs is None unless the dense remap kicked in.

    contig_counts (int64[C], from the native fused scan) certifies that
    blocks arrive grouped by contig in tid order and carries the
    per-contig block counts, skipping the sortedness pass and the
    bincount over all blocks."""
    C = layout.n_contigs
    if contig_counts is None:
        if np.any(tids[1:] < tids[:-1]):
            order = np.argsort(tids, kind="stable")
            tids, starts, ends = tids[order], starts[order], ends[order]
    if C > DENSE_REMAP_THRESHOLD:
        if contig_counts is None:
            obs = np.unique(tids)
        else:
            obs = np.flatnonzero(contig_counts)
        seg_ids = np.searchsorted(obs, tids).astype(np.int32)
        n_seg = _bucket(obs.size, minimum=8)
        seg_len = np.zeros(n_seg, dtype=np.int64)
        seg_len[: obs.size] = layout.lengths[obs]
        seg_len_dev = jnp.asarray(seg_len)
        n_out = obs.size
        if contig_counts is not None:
            counts = np.zeros(n_seg, dtype=np.int64)
            counts[: obs.size] = contig_counts[obs]
            return (tids, starts, ends, seg_ids, n_seg, seg_len_dev, n_out,
                    obs, counts)
    else:
        obs = None
        seg_ids = tids.astype(np.int32)
        n_seg = _bucket(C, minimum=8)
        seg_len_dev = _device_lengths(layout, n_seg)
        n_out = C
        if contig_counts is not None:
            counts = np.zeros(n_seg, dtype=np.int64)
            counts[:C] = contig_counts
            return (tids, starts, ends, seg_ids, n_seg, seg_len_dev, n_out,
                    obs, counts)
    counts = np.bincount(seg_ids, minlength=n_seg)
    return tids, starts, ends, seg_ids, n_seg, seg_len_dev, n_out, obs, counts


def choose_payload(layout, tids, starts, ends):
    """Pick the cheapest block-length representation for the link.

    Returns (len_mode, scalar_len, vals) where vals is the per-block
    payload column (None for scalar mode).
    """
    lens = (ends - starts).astype(np.int64)
    L = int(lens.max(initial=0))
    scalar_len = np.int32(L)
    # scalar also covers uniform-length reads clamped at contig ends:
    # a computed end >= contig length drops its -1 event exactly like
    # the true clamped end does (contig.rs:178-183)
    if tids.size and (
        np.all(lens == L)
        or np.array_equal(
            np.minimum(starts + L, layout.lengths[tids]), ends)):
        return "scalar", scalar_len, None
    if L < (1 << 16):
        return "u16", scalar_len, lens.astype(np.uint16)
    return "ends", scalar_len, ends.astype(np.int32)


def unpack_packed(layout, packed, n_seg, n_out, obs, tids, need_hist, trim,
                  n_bins):
    """Decode the packed device vector into DepthStats (shared by the
    single-device and mesh engines; hist requires the caller to have
    re-dispatched on overflow already)."""
    C = layout.n_contigs
    ee = layout.contig_end_exclusion
    zero = lambda: np.zeros(C, dtype=np.int64)
    out = DepthStats(zero(), zero(), zero(), zero(), None,
                     sumsq_window=zero(), min_depth_window=zero())
    tgt = obs if obs is not None else slice(0, C)
    out.sum_depth_window[tgt] = packed[:n_out]
    out.covered_window[tgt] = packed[n_seg: n_seg + n_out]
    out.covered_full[tgt] = packed[2 * n_seg: 2 * n_seg + n_out]
    out.max_depth_window[tgt] = np.maximum(
        packed[3 * n_seg: 3 * n_seg + n_out], 0)
    out.sumsq_window[tgt] = packed[4 * n_seg: 4 * n_seg + n_out]
    out.min_depth_window[tgt] = packed[5 * n_seg: 5 * n_seg + n_out]
    base = 6 * n_seg + 1
    if trim is not None:
        out.trimmed_sum = zero()
        out.trimmed_sum[tgt] = packed[base: base + n_out]
        base += n_seg
    if need_hist:
        h = packed[base:].reshape(n_seg, n_bins)
        hist = np.zeros((C, n_bins), dtype=np.int64)
        hist[tgt] = h[:n_out]
        _fix_hist_bin0(layout, out, hist, tids, obs, ee)
        out.hist = hist
    return out


def encode_start_deltas(starts, counts, n_blocks):
    """Within-contig start differences (1-2 bytes/block on the link).

    BAM streams are coordinate-sorted, so starts are non-decreasing
    within a contig and the deltas are tiny (mean spacing = contig
    length / reads per contig).  Returns (deltas, first_start_i32, mode)
    where mode is "d8" (u8 deltas) or "d16" (u16), or (None, None, None)
    when a delta is negative (synthetic unsorted input) or over 65535.
    """
    d = np.empty(n_blocks, dtype=np.int64)
    d[0] = 0
    np.subtract(starts[1:], starts[:-1], out=d[1:])
    bounds = np.concatenate(([0], np.cumsum(counts)))[:-1]
    nz = counts > 0
    d[bounds[nz]] = 0  # first block of each (non-empty) contig run
    dmax = d.max()
    if d.min() < 0 or dmax >= (1 << 16):
        return None, None, None
    first_start = np.zeros(counts.shape[0] + 1, dtype=np.int32)
    first_start[: counts.shape[0]][nz] = starts[bounds[nz]]
    if dmax < (1 << 8):  # typical: mean spacing = contig_len/reads
        return d.astype(np.uint8), first_start, "d8"
    return d.astype(np.uint16), first_start, "d16"


class _EmptyPending:
    """Pending that resolves to an empty DepthStats (used for empty
    inputs and for batches whose statistics were folded into a
    DepthAccumulator)."""

    def __init__(self, C, need_hist, trim):
        self._out = empty_depth_stats(C, need_hist, trim)

    def start_fetch(self):
        pass

    def result(self):
        return self._out


class DepthAccumulator:
    """Device-side merge of contig-disjoint batch sweeps.

    Streaming scans cut batches at contig boundaries, so per-contig
    statistics from different batches never overlap — merging is plain
    addition.  Doing that addition ON DEVICE (fused into each batch's
    packed sweep call) means a whole streaming pass costs ONE d2h fetch
    instead of one per batch; over the tunnelled link each fetch is
    ~20-30 ms of pure latency.

    The accumulated gmax element is a SUM of batch maxima (an upper
    bound); accumulation is therefore only engaged for need_hist=False
    calls, where gmax has no consumer.
    """

    def __init__(self):
        self._dev = None
        self._meta = None
        self._unpack = None

    @property
    def empty(self):
        return self._dev is None

    def compatible(self, meta):
        return self._dev is None or self._meta == meta

    def start_fetch(self):
        if self._dev is not None:
            try:
                self._dev.copy_to_host_async()
            except Exception:
                pass

    def result(self):
        """One fetch -> DepthStats of everything accumulated (None if
        nothing was)."""
        if self._dev is None:
            return None
        layout, n_seg, n_out, trim = self._unpack
        packed = np.asarray(jax.device_get(self._dev))
        return unpack_packed(layout, packed, n_seg, n_out, None, None,
                             False, trim, 0)


class PendingDepthStats:
    """An in-flight packed sweep: the device call is dispatched, the
    result fetch is deferred so the caller can pipeline the next batch's
    host decode + h2d behind this batch's device compute."""

    def __init__(self, dev, redo, layout, n_seg, n_out, obs, tids,
                 need_hist, trim, n_bins, blocks=None):
        self._dev = dev
        self._redo = redo
        self._args = (layout, n_seg, n_out, obs, tids, need_hist, trim)
        self._n_bins = n_bins
        self._blocks = blocks  # original (tids, starts, ends) numpy arrays

    def start_fetch(self):
        """Begin the async device->host copy (overlaps multiple pending
        results' d2h latency; each fetch over the tunnelled link costs
        ~30ms serially)."""
        try:
            self._dev.copy_to_host_async()
        except Exception:
            pass

    def result(self) -> DepthStats:
        layout, n_seg, n_out, obs, tids, need_hist, trim = self._args
        packed = np.asarray(jax.device_get(self._dev))
        gmax = int(packed[6 * n_seg])
        if need_hist and gmax >= self._n_bins:
            if self._blocks is not None:
                # A handful of very deep contigs must not widen every
                # contig's histogram row (a uniform re-dispatch would
                # materialise O(contigs x max_depth) — 7 GB on a 54k-
                # contig assembly with one 16k-deep contig — and compile
                # a fresh wide kernel).  Keep the speculative-width
                # device result for the normal contigs and recompute the
                # overflow contigs' exact rows on host via the oracle
                # over a sub-layout, stored as a ragged side table.
                d = unpack_packed(layout, packed, n_seg, n_out, obs, tids,
                                  need_hist, trim, self._n_bins)
                of = np.flatnonzero(d.max_depth_window >= self._n_bins)
                if of.size:
                    from .depth import (ReferenceLayout,
                                        compute_depth_stats_numpy)
                    bt, bs, be = self._blocks
                    bt = np.asarray(bt)
                    sel = np.isin(bt, of)
                    remap = np.full(layout.n_contigs, -1, np.int64)
                    remap[of] = np.arange(of.size)
                    sub = ReferenceLayout.build(
                        layout.lengths[of], layout.contig_end_exclusion)
                    dd = compute_depth_stats_numpy(
                        sub, remap[bt[sel]], np.asarray(bs)[sel],
                        np.asarray(be)[sel], need_hist=True)
                    wide = {}
                    for j, c in enumerate(of.tolist()):
                        wide[c] = dd.hist[j].astype(np.int64)
                        d.hist[c, :] = 0
                    d.hist_wide = wide
                return d
            # no retained blocks: one uniform wider re-dispatch
            self._n_bins = _bucket(gmax + 1, minimum=128)
            packed = np.asarray(jax.device_get(self._redo(self._n_bins)))
        return unpack_packed(layout, packed, n_seg, n_out, obs, tids,
                             need_hist, trim, self._n_bins)


def resolve_depth(stats):
    """Resolve any pending depth result (PendingDepthStats, _EmptyPending,
    or any engine-specific deferred handle) into a concrete DepthStats."""
    return stats.result() if hasattr(stats, "result") else stats


def prewarm_sweep(n_blocks: int, n_contigs: int, ee: int,
                  need_hist: bool = False, trim=None,
                  len_mode: str = "scalar", start_mode: str = "abs",
                  n_bins: int = SPEC_HIST_BINS):
    """Compile the fused sweep for an anticipated shape ahead of the data.

    Invokes the jitted kernel once on zero-filled inputs of the bucketed
    shape on a background thread, so the XLA compile (tens of seconds per
    shape on the tunnelled TPU) overlaps host-side work such as BAM
    decode.  Returns the started (non-daemon) Thread; join it to block
    until the executable is ready.  Exceptions are swallowed — prewarm is
    best-effort and the real call would surface any genuine failure.

    The returned thread self-profiles (VERDICT r4 #1 — the 697s r4
    warmup was unattributable): `t.sig` is the BUCKETED kernel signature
    (B, n_seg, len_mode, start_mode, need_hist, trim?), `t.seconds` the
    wall time of the jit call once finished, `t.error` a repr of any
    swallowed exception.
    """
    import threading
    import time as _time

    B = _bucket_geo(n_blocks)
    n_seg = _bucket(n_contigs, minimum=8)
    trim_key = (float(trim[0]), float(trim[1])) if trim is not None else None
    o_counts, _o_first, _o_starts, _o_pay, total = _u8_layout(
        B, n_seg, start_mode, len_mode)
    buf = np.zeros(total, dtype=np.uint8)
    counts_ext = np.zeros(n_seg + 1, dtype=np.int32)
    counts_ext[-1] = B  # every block is padding: valid, trivial work
    buf[o_counts:o_counts + counts_ext.nbytes] = counts_ext.view(np.uint8)

    def run():
        t0 = _time.perf_counter()
        try:
            acc = jnp.zeros(packed_result_len(n_seg, need_hist, n_bins,
                                              trim_key is not None),
                            jnp.int64)
            r = _sweep_packed_u8(
                jnp.asarray(buf), acc, jnp.zeros(n_seg, jnp.int64),
                n_seg=n_seg, ee=ee, need_hist=need_hist, n_bins=n_bins,
                len_mode=len_mode, trim=trim_key, start_mode=start_mode, B=B)
            jax.block_until_ready(r)
            _mark_warm(_shape_key(B, n_seg, ee, need_hist, n_bins,
                                  len_mode, trim_key, start_mode))
        except Exception as e:  # noqa: BLE001 — best-effort, recorded
            t.error = repr(e)
            with _shape_lock:
                _inflight_shapes.discard(_shape_key(
                    B, n_seg, ee, need_hist, n_bins, len_mode, trim_key,
                    start_mode))
        t.seconds = _time.perf_counter() - t0

    # Deliberately NON-daemon: tearing a daemon thread down mid-XLA-
    # compile at interpreter exit aborts the process (glibc 'FATAL:
    # exception not rethrown' -> SIGABRT, found by test_fastscan CLI
    # parity).  _pick_shape's background compiles therefore delay exit
    # until they finish — they only spawn mid-stream, so the common case
    # completes long before exit, and a slow exit beats a crashing one.
    t = threading.Thread(target=run, name=f"prewarm-sweep-{B}")
    t.sig = (B, n_seg, len_mode, start_mode, bool(need_hist),
             trim_key is not None)
    t.seconds = None
    t.error = None
    t.start()
    return t


def dispatch_shape(layout: ReferenceLayout, tids, starts, ends,
                   need_hist: bool, trim=None, contig_counts=None):
    """(warm, prewarm_kwargs) for the kernel compute_depth_stats_sweep
    would dispatch these blocks on — WITHOUT dispatching.

    Lets a streaming caller overlap the first family-cold kernel
    compile/load (45-390 s on a degraded remote compile service) with
    the rest of its host ingest: start prewarm_sweep(**kwargs) in the
    background and queue block chunks until it lands.  Mirrors the
    dispatcher's own mode choices (bucketing, payload, start deltas) so
    the compiled shape is exactly the one later dispatches hit."""
    tids = np.asarray(tids)
    starts = np.asarray(starts)
    ends = np.asarray(ends)
    C = layout.n_contigs
    if tids.size == 0 or C == 0 or _use_pallas():
        return True, None
    (tids, starts, ends, _seg_ids, n_seg, _sl, _n_out, _obs,
     counts) = prep_segments(layout, tids, starts, ends,
                             contig_counts=contig_counts)
    len_mode, _scalar, _vals = choose_payload(layout, tids, starts, ends)
    start_mode = "abs"
    if tids.size > (1 << 14):
        _d, _f, mode = encode_start_deltas(starts, counts, tids.size)
        if mode is not None:
            start_mode = mode
    ee = layout.contig_end_exclusion
    trim_key = (float(trim[0]), float(trim[1])) if trim is not None else None
    B = _bucket_geo(tids.size)
    exact = _shape_key(B, n_seg, ee, need_hist, SPEC_HIST_BINS, len_mode,
                       trim_key, start_mode)
    with _shape_lock:
        # with reuse disabled, only the exact shape counts as warm (the
        # dispatcher would block-compile it regardless of warm cousins)
        warm = exact in _warm_shapes or (_reuse_enabled() and any(
            k[1:] == exact[1:] and B <= k[0] <= _REUSE_CAP * B
            for k in _warm_shapes))
        if not warm:
            if exact in _inflight_shapes:
                # someone else (another sample's gate, or _pick_shape's
                # background spawn) is already compiling this shape —
                # no kwargs, so the caller does not launch a duplicate
                return False, None
            _inflight_shapes.add(exact)
    # n_seg is already bucketed and _bucket is idempotent, so passing it
    # as prewarm's n_contigs reproduces the same kernel signature
    kwargs = dict(n_blocks=tids.size, n_contigs=n_seg, ee=ee,
                  need_hist=need_hist, trim=trim_key, len_mode=len_mode,
                  start_mode=start_mode)
    return warm, kwargs


def compute_depth_stats_sweep(layout: ReferenceLayout, tids, starts, ends,
                              need_hist: bool = False, trim=None,
                              need_max: bool = True, deferred: bool = False,
                              acc: "DepthAccumulator | None" = None,
                              contig_counts=None):
    """Event-sweep drop-in for compute_depth_stats (transfer-minimal).

    Host cost is O(B): a bincount for the contig-id run lengths (blocks
    arrive grouped by contig because BAM streams are reference-sorted; a
    stable argsort fallback covers synthetic callers) and the padding
    copy.  Device transfer is ONE u8 buffer of 1-6 bytes per block
    (u8/u16 start deltas + u16 lengths, or one scalar length) — the
    tunnelled link is latency-bound, so everything ships in a single
    put.  With deferred=True the fetch is left in flight
    (PendingDepthStats) so batch pipelines overlap h2d/compute/d2h;
    with acc= given (and need_hist=False), the result is instead added
    into the accumulator ON DEVICE and an empty pending is returned —
    the caller fetches acc.result() once at the end of the stream.
    """
    C = layout.n_contigs
    tids = np.asarray(tids)
    starts = np.asarray(starts)
    ends = np.asarray(ends)
    if tids.size == 0 or C == 0:
        out = empty_depth_stats(C, need_hist, trim)
        return _EmptyPending(C, need_hist, trim) if deferred else out

    ee = layout.contig_end_exclusion
    n_blocks = tids.size
    (tids, starts, ends, seg_ids, n_seg, seg_len_dev, n_out, obs,
     counts) = prep_segments(layout, tids, starts, ends,
                             contig_counts=contig_counts)

    if _use_pallas():
        return _sweep_legacy(layout, seg_ids, starts, ends, obs, n_seg,
                             seg_len_dev, n_out, need_hist, trim)

    len_mode, scalar_len, vals = choose_payload(layout, tids, starts, ends)

    start_mode = "abs"
    first_start = np.zeros(n_seg + 1, dtype=np.int32)
    deltas = None
    if n_blocks > (1 << 14):  # shrinking the link only matters at scale
        deltas, fs, mode = encode_start_deltas(starts, counts, n_blocks)
        if deltas is not None:
            start_mode, first_start = mode, fs
    trim_key = (float(trim[0]), float(trim[1])) if trim is not None else None
    B = _pick_shape(_bucket_geo(n_blocks), n_seg, ee, need_hist,
                    SPEC_HIST_BINS, len_mode, trim_key, start_mode)
    if start_mode in ("d16", "d8"):
        starts_p = np.zeros(B, dtype=deltas.dtype)
        starts_p[:n_blocks] = deltas
    else:
        starts_p = np.zeros(B, dtype=np.int32)
        starts_p[:n_blocks] = starts
    counts_ext = np.append(counts, B - n_blocks).astype(np.int32)
    if vals is None:
        payload = None
    else:
        payload = np.zeros(B, dtype=vals.dtype)
        payload[:n_blocks] = vals

    buf = _pack_u8(scalar_len, counts_ext, first_start, starts_p, payload,
                   B, n_seg, start_mode, len_mode)
    d_buf = jnp.asarray(buf)

    use_acc = acc is not None and not need_hist and obs is None
    if use_acc:
        meta = (id(layout), n_seg, n_out, trim_key)
        use_acc = acc.compatible(meta)

    def dispatch(n_bins, acc_in=None):
        if acc_in is None:
            # zeros accumulator: keeps the jit signature uniform so every
            # (shape, flags) combination compiles exactly one variant
            acc_in = jnp.zeros(
                packed_result_len(n_seg, need_hist, n_bins,
                                  trim_key is not None), jnp.int64)
        r = _sweep_packed_u8(
            d_buf, acc_in, seg_len_dev, n_seg=n_seg, ee=ee,
            need_hist=need_hist, n_bins=n_bins, len_mode=len_mode,
            trim=trim_key, start_mode=start_mode, B=B)
        _mark_warm(_shape_key(B, n_seg, ee, need_hist, n_bins, len_mode,
                              trim_key, start_mode))
        return r

    if use_acc:
        acc._dev = dispatch(SPEC_HIST_BINS, acc._dev)
        acc._meta = meta
        acc._unpack = (layout, n_seg, n_out, trim)
        out = _EmptyPending(C, need_hist, trim)
        return out if deferred else out.result()

    pending = PendingDepthStats(dispatch(SPEC_HIST_BINS), dispatch, layout,
                                n_seg, n_out, obs, tids, need_hist, trim,
                                SPEC_HIST_BINS, blocks=(tids, starts, ends))
    return pending if deferred else pending.result()


def _fix_hist_bin0(layout, out, hist, tids, obs, ee):
    """bin 0 = window positions not covered (observed contigs only)."""
    win_len = np.where(layout.lengths > 2 * ee, layout.lengths - 2 * ee, 0)
    hist[:, 0] = 0
    obs_all = np.unique(tids) if obs is None else obs
    hist[obs_all, 0] = win_len[obs_all] - out.covered_window[obs_all]


def _sweep_legacy(layout, seg_ids, starts, ends, obs, n_seg, seg_len_dev,
                  n_out, need_hist, trim=None):
    """Full-transfer path retained for the Pallas post-sort kernel
    (COVERM_TPU_PALLAS=1)."""
    C = layout.n_contigs
    ee = layout.contig_end_exclusion
    zero = lambda: np.zeros(C, dtype=np.int64)
    tids = seg_ids if obs is None else obs[seg_ids]
    end_keep_real = ends < layout.lengths[tids]
    B = _bucket(seg_ids.size)
    pad = B - seg_ids.size
    valid = np.ones(B, dtype=bool)
    end_keep = np.zeros(B, dtype=bool)
    end_keep[: seg_ids.size] = end_keep_real
    if pad:
        valid[seg_ids.size:] = False
        z = np.zeros(pad, np.int32)
        seg_ids = np.concatenate([seg_ids, z])
        starts = np.concatenate([starts.astype(np.int32), z])
        ends = np.concatenate([ends.astype(np.int32), z])
    else:
        starts = starts.astype(np.int32)
        ends = ends.astype(np.int32)

    r = _fused_sweep_pallas(jnp.asarray(seg_ids), jnp.asarray(starts),
                            jnp.asarray(ends), jnp.asarray(valid),
                            jnp.asarray(end_keep), seg_len_dev, n_seg, ee)

    sum_w, cov_w, cov_f, max_w = [np.asarray(jax.device_get(x)) for x in r[:4]]
    sq_w, min_w = [np.asarray(jax.device_get(x))
                   for x in _legacy_moments(r[5], r[6], r[7], n_seg)]
    out = DepthStats(zero(), zero(), zero(), zero(), None,
                     sumsq_window=zero(), min_depth_window=zero())
    out.sumsq_window[obs if obs is not None else slice(0, C)] = sq_w[:n_out]
    out.min_depth_window[obs if obs is not None else slice(0, C)] = \
        min_w[:n_out]
    tgt = obs if obs is not None else slice(0, C)
    out.sum_depth_window[tgt] = sum_w[:n_out]
    out.covered_window[tgt] = cov_w[:n_out]
    out.covered_full[tgt] = cov_f[:n_out]
    out.max_depth_window[tgt] = np.maximum(max_w[:n_out], 0)
    # legacy min is over covered gaps only; a not-fully-covered window
    # has true min 0
    win_len = np.where(layout.lengths > 2 * ee, layout.lengths - 2 * ee, 0)
    out.min_depth_window[out.covered_window < win_len] = 0

    if need_hist or trim is not None:
        gmax = int(jax.device_get(r[4]))
        n_bins = _bucket(max(gmax, 0) + 1, minimum=128)
        h = np.asarray(jax.device_get(
            _sweep_hist(r[5], r[6], r[7], n_seg, n_bins)))
        hist = np.zeros((C, n_bins), dtype=np.int64)
        hist[tgt] = h[:n_out]
        _fix_hist_bin0(layout, out, hist, tids, obs, ee)
        if trim is not None:
            out.trimmed_sum = trimmed_sum_via_hist(layout, hist, trim)
        if need_hist:
            out.hist = hist
    return out


def trimmed_sum_via_hist(layout, hist, trim):
    """Host fallback: trimmed-mean numerators from a dense histogram
    (used by engines without the device rank-query path)."""
    from ..estimators import f32, trimmed_total_from_hist
    ee = layout.contig_end_exclusion
    W = np.where(layout.lengths > 2 * ee, layout.lengths - 2 * ee, 0)
    lo = np.floor(np.float32(trim[0]) * W.astype(np.float32)).astype(np.int64)
    hi = np.ceil(np.float32(trim[1]) * W.astype(np.float32)).astype(np.int64)
    return trimmed_total_from_hist(hist, lo, hi)
