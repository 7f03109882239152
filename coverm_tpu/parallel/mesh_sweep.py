"""Production contig-sharded mesh sweep (the `--sharded` mesh analogue).

The event-sweep depth engine (ops/sweep.py) is independent across
contigs, so the natural multi-device decomposition is *reference
sharding* (SURVEY.md §2.3, the mesh re-imagining of the reference's
shard_bam_reader.rs merge): alignment blocks are routed to devices by
contig id (greedy longest-processing-time balance over per-contig block
counts), each device runs the identical packed sweep on its local
blocks, and the per-contig output vectors are psum-merged — every
contig's statistics are nonzero on exactly one shard, so the merge is
exact and the result is bit-equal to the single-device engine.

A second mesh axis ``dp`` carries sample data parallelism (the mesh form
of the reference's serial multi-sample loop, contig.rs:22): each dp row
scans one sample's blocks, and per-sample outputs stay sharded over dp.

This path is CLI-reachable: modes._scanned selects it automatically
whenever more than one local device is visible (COVERM_TPU_MESH=0
disables; =1 forces even for multi-sample thread-DP runs).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.depth import ReferenceLayout, _bucket
from ..ops.sweep import (SPEC_HIST_BINS, _bucket_geo, _packed_math,
                         choose_payload, empty_depth_stats, prep_segments,
                         unpack_packed)


def make_shard_mesh(n_devices: int | None = None, dp: int = 1) -> Mesh:
    devices = np.array(jax.devices()[: n_devices or len(jax.devices())])
    shard = len(devices) // dp
    return Mesh(devices[: dp * shard].reshape(dp, shard),
                axis_names=("dp", "shard"))


def assign_contigs(counts: np.ndarray, n_shards: int) -> np.ndarray:
    """Greedy LPT: heaviest contig (by block count) to the least-loaded
    shard. Deterministic (ties broken by lowest shard id / lowest tid)."""
    shard_of = np.zeros(counts.shape[0], dtype=np.int32)
    load = np.zeros(n_shards, dtype=np.int64)
    order = np.argsort(-counts, kind="stable")
    for c in order:
        s = int(np.argmin(load))
        shard_of[c] = s
        load[s] += int(counts[c])
    return shard_of


@partial(jax.jit, static_argnames=("n_seg", "ee", "need_hist", "n_bins",
                                   "len_mode", "trim", "mesh"))
def _mesh_sweep(starts, payload, counts_ext, seg_len, scalar_len,
                n_seg, ee, need_hist, n_bins, len_mode, trim, mesh):
    """One packed sweep per (dp row, shard), psum-merged over shards.

    starts/payload: [S, n_shards * B_local]   sharded (dp, shard)
    counts_ext:     [S, n_shards, n_seg + 1]  sharded (dp, shard, -)
    seg_len:        [n_seg]                   replicated
    scalar_len:     [S, 1]                    sharded (dp, -)
    Returns the packed stats vector per dp row, sharded over dp. The
    gmax element is a psum of shard maxima — an upper bound on the true
    maximum, used only as the histogram-overflow trigger.
    """
    def local(starts, payload, counts_ext, seg_len, scalar_len):
        fn = lambda s, p, c, sl: _packed_math(
            s, p, c[0], seg_len, sl[0], n_seg, ee, need_hist, n_bins,
            len_mode, trim)
        packed = jax.vmap(fn)(starts, payload, counts_ext, scalar_len)
        return jax.lax.psum(packed, "shard")

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("dp", "shard"), P("dp", "shard"),
                  P("dp", "shard", None), P(None), P("dp", None)),
        out_specs=P("dp"),
    )
    return fn(starts, payload, counts_ext, seg_len, scalar_len)


def split_heavy_contigs(tids, starts, ends, n_shards,
                        slack: float = 1.25):
    """Position-split contigs whose block count defeats contig-level
    balancing (SURVEY §5: the sequence-parallel axis; a single huge
    contig must shard across devices).

    A heavy contig's blocks are cut at position boundaries chosen from
    block-start quantiles; blocks crossing a boundary are CLIPPED into
    two sub-blocks, so every reference position's depth lives on exactly
    one piece and per-position statistics psum-merge exactly.  Returns
    (tids, starts, ends, piece_of_block, piece_counts, split_tids) —
    with split_tids empty, the inputs pass through untouched (and the
    caller keeps the bit-identical whole-contig route)."""
    if n_shards <= 1 or tids.size == 0 or np.any(tids[1:] < tids[:-1]):
        # unsorted synthetic input: let prep_segments' argsort handle it
        # on the whole-contig route
        return tids, starts, ends, None, None, np.empty(0, np.int64)
    counts = np.bincount(tids)
    total = int(counts.sum())
    target = -(-total // n_shards)  # ceil
    heavy = np.flatnonzero(counts > slack * target)
    if heavy.size == 0:
        return tids, starts, ends, None, None, np.empty(0, np.int64)

    bounds = np.concatenate(([0], np.cumsum(counts)))
    # Python loops run only over the handful of HEAVY contigs; runs of
    # non-heavy contigs between them pass through as whole slices with
    # vectorised piece ids (assembly-scale: 100k+ contigs, few heavy)
    out_t, out_s, out_e, out_p = [], [], [], []
    piece_counts = []
    next_piece = 0

    def passthrough(c_lo, c_hi):
        """Contigs [c_lo, c_hi) unsplit: one piece per non-empty contig."""
        nonlocal next_piece
        lo, hi = int(bounds[c_lo]), int(bounds[c_hi])
        if hi == lo:
            return
        sub_counts = counts[c_lo:c_hi]
        nz = sub_counts[sub_counts > 0]
        pid = np.repeat(np.arange(nz.size, dtype=np.int64) + next_piece, nz)
        out_t.append(tids[lo:hi])
        out_s.append(starts[lo:hi])
        out_e.append(ends[lo:hi])
        out_p.append(pid)
        piece_counts.extend(nz.tolist())
        next_piece += nz.size

    prev = 0
    for c in heavy.tolist():
        passthrough(prev, c)
        prev = c + 1
        lo, hi = int(bounds[c]), int(bounds[c + 1])
        ct, cs, ce = tids[lo:hi], starts[lo:hi], ends[lo:hi]
        k = min(int(-(-counts[c] // target)), n_shards)
        # position boundaries at block-start quantiles (starts are
        # nondecreasing within a contig: BAM coordinate order)
        qs = cs[np.linspace(0, hi - lo - 1, k + 1).astype(np.int64)]
        cuts = np.unique(qs[1:-1])
        edges = np.concatenate(([np.iinfo(np.int32).min], cuts,
                                [np.iinfo(np.int32).max]))
        for m0, m1 in zip(edges[:-1], edges[1:]):
            sel = (cs < m1) & (ce > m0)
            if not np.any(sel):
                continue
            ps = np.maximum(cs[sel], m0)
            pe = np.minimum(ce[sel], m1)
            out_t.append(ct[sel])
            out_s.append(ps.astype(starts.dtype))
            out_e.append(pe.astype(ends.dtype))
            out_p.append(np.full(ps.size, next_piece, np.int64))
            piece_counts.append(ps.size)
            next_piece += 1
    passthrough(prev, counts.shape[0])
    return (np.concatenate(out_t), np.concatenate(out_s),
            np.concatenate(out_e), np.concatenate(out_p),
            np.asarray(piece_counts, np.int64), heavy.astype(np.int64))


def _route_sample(layout, tids, starts, ends, n_shards,
                  allow_split: bool = False):
    """Host-side routing of one sample's blocks to contig shards.

    Returns (per-shard starts list, per-shard payload list, counts
    [n_shards, n_seg], len_mode, scalar_len, plus the prep_segments
    outputs needed for unpacking, and the tids of position-split
    contigs — empty unless allow_split found an imbalance)."""
    split_tids = np.empty(0, np.int64)
    piece_of_block = None
    if allow_split:
        (tids, starts, ends, piece_of_block, piece_counts,
         split_tids) = split_heavy_contigs(tids, starts, ends, n_shards)
    (tids, starts, ends, seg_ids, n_seg, seg_len_dev, n_out, obs,
     counts) = prep_segments(layout, tids, starts, ends)
    len_mode, scalar_len, vals = choose_payload(layout, tids, starts, ends)

    if split_tids.size:
        shard_of_piece = assign_contigs(piece_counts, n_shards)
        shard_of_block = shard_of_piece[piece_of_block]
        counts_mat = np.zeros((n_shards, n_seg), np.int64)
        np.add.at(counts_mat, (shard_of_block, seg_ids), 1)
    else:
        shard_of_contig = assign_contigs(counts, n_shards)
        shard_of_block = shard_of_contig[seg_ids]
        counts_mat = counts[None, :] * (shard_of_contig[None, :]
                                        == np.arange(n_shards)[:, None])
    order = np.argsort(shard_of_block, kind="stable")  # keeps tid order
    seg_sorted = seg_ids[order]
    starts_sorted = starts[order].astype(np.int32)
    vals_sorted = None if vals is None else vals[order]
    per_shard = np.bincount(shard_of_block, minlength=n_shards)
    offsets = np.concatenate(([0], np.cumsum(per_shard)))

    return (seg_sorted, starts_sorted, vals_sorted, offsets, counts_mat,
            len_mode, scalar_len, n_seg, seg_len_dev, n_out, obs, tids,
            per_shard, split_tids)


def _pack_shards(starts_sorted, vals_sorted, offsets, counts_mat, B_local,
                 n_shards, n_seg, len_mode):
    """Pad each shard's block list to B_local and stack."""
    starts_p = np.zeros((n_shards, B_local), dtype=np.int32)
    if len_mode == "scalar":
        payload_p = np.zeros((n_shards, 1), dtype=np.uint16)
    else:
        payload_p = np.zeros((n_shards, B_local), dtype=vals_sorted.dtype)
    counts_ext = np.zeros((n_shards, n_seg + 1), dtype=np.int32)
    counts_ext[:, :n_seg] = counts_mat
    for s in range(n_shards):
        lo, hi = offsets[s], offsets[s + 1]
        k = hi - lo
        starts_p[s, :k] = starts_sorted[lo:hi]
        if len_mode != "scalar" and k:
            payload_p[s, :k] = vals_sorted[lo:hi]
        counts_ext[s, n_seg] = B_local - k
    return starts_p, payload_p, counts_ext


def _fix_split_contigs(d, split_tids, layout, trim, want_hist):
    """Exact min/trimmed for position-split contigs from the merged
    histogram.

    Under a position split, each shard's window includes the other
    shards' positions at depth 0, so the device rank/min outputs for a
    split contig are meaningless; but the psum-merged histogram is
    EXACT after the host bin-0 fix (foreign positions only ever land in
    a shard's bin 0, which unpack_packed recomputes from the merged
    covered counts).  Min is the first occupied bin; trimmed sums walk
    the histogram exactly like estimators.rs:566-647."""
    ee = layout.contig_end_exclusion
    rows = []
    for c in split_tids.tolist():
        wide = (d.hist_wide or {}).get(c)
        row = np.asarray(wide if wide is not None
                         else d.hist[c], dtype=np.int64)
        rows.append(row)
        win = max(int(layout.lengths[c]) - 2 * ee, 0) \
            if layout.lengths[c] > 2 * ee else 0
        nz = np.flatnonzero(row[1:])
        if win == 0 or row[0] > 0:
            d.min_depth_window[c] = 0
        else:
            d.min_depth_window[c] = int(nz[0]) + 1 if nz.size else 0
        # psum of piece maxima over-counts; the last occupied bin is
        # the true window maximum
        d.max_depth_window[c] = int(nz[-1]) + 1 if nz.size else 0
    if trim is not None and rows:
        from ..ops.sweep import trimmed_sum_via_hist
        W = max(len(r) for r in rows)
        mat = np.zeros((len(rows), W), np.int64)
        for j, r in enumerate(rows):
            mat[j, : len(r)] = r
        sub = ReferenceLayout.build(layout.lengths[split_tids],
                                    layout.contig_end_exclusion)
        d.trimmed_sum[split_tids] = trimmed_sum_via_hist(sub, mat, trim)
    if not want_hist:
        d.hist = None
        d.hist_wide = None
    return d


class _SplitFixPending:
    """Wraps the mesh PendingDepthStats to post-fix split contigs."""

    def __init__(self, pending, split_tids, layout, trim, want_hist):
        self._p = pending
        self._args = (split_tids, layout, trim, want_hist)

    def start_fetch(self):
        self._p.start_fetch()

    def result(self):
        return _fix_split_contigs(self._p.result(), *self._args)


def compute_depth_stats_sweep_mesh(layout: ReferenceLayout, tids, starts,
                                   ends, need_hist: bool = False, trim=None,
                                   mesh: Mesh | None = None,
                                   need_max: bool = True, deferred=False,
                                   allow_split: bool = True):
    """Drop-in for compute_depth_stats_sweep over a (dp=1, shard) mesh.

    allow_split: position-split contigs whose block count defeats
    contig-level balance (the sequence-parallel axis); the dispatch then
    carries a histogram so split contigs' min/trimmed stay exact."""
    if mesh is None:
        mesh = make_shard_mesh()
    C = layout.n_contigs
    tids = np.asarray(tids)
    starts = np.asarray(starts)
    ends = np.asarray(ends)
    if tids.size == 0 or C == 0:
        return empty_depth_stats(C, need_hist, trim)

    n_shards = mesh.devices.shape[1]
    (seg_sorted, starts_sorted, vals_sorted, offsets, counts_mat, len_mode,
     scalar_len, n_seg, seg_len_dev, n_out, obs, tids_s,
     per_shard, split_tids) = _route_sample(layout, tids, starts, ends,
                                            n_shards,
                                            allow_split=allow_split)
    want_hist = need_hist
    if split_tids.size:
        need_hist = True  # exact min/trimmed for split contigs ride it

    B_local = _bucket_geo(max(int(per_shard.max(initial=1)), 1), minimum=128)
    starts_p, payload_p, counts_ext = _pack_shards(
        starts_sorted, vals_sorted, offsets, counts_mat, B_local, n_shards,
        n_seg, len_mode)

    ee = layout.contig_end_exclusion
    trim_key = (float(trim[0]), float(trim[1])) if trim is not None else None
    sl = np.asarray([[scalar_len]], dtype=np.int32)
    n_bins = SPEC_HIST_BINS

    def dispatch(n_bins):
        return _mesh_sweep(
            jnp.asarray(starts_p.reshape(1, -1)),
            jnp.asarray(payload_p.reshape(1, -1)),
            jnp.asarray(counts_ext.reshape(1, n_shards, n_seg + 1)),
            seg_len_dev, jnp.asarray(sl), n_seg, ee, need_hist, n_bins,
            len_mode, trim_key, mesh)[0]

    from ..ops.sweep import PendingDepthStats

    # NOTE: the pending gmax element is a psum of shard maxima — an
    # upper bound on the true maximum, used only to trigger (possibly
    # over-wide, never under-wide) histogram re-dispatch.
    pending = PendingDepthStats(dispatch(n_bins), dispatch, layout, n_seg,
                                n_out, obs, tids_s, need_hist, trim, n_bins,
                                blocks=(tids, starts, ends))
    if split_tids.size:
        pending = _SplitFixPending(pending, split_tids, layout, trim,
                                   want_hist)
    return pending if deferred else pending.result()


def mesh_depth_fn(mesh: Mesh | None = None):
    """A scan_sample-compatible depth_fn bound to a mesh."""
    if mesh is None:
        mesh = make_shard_mesh()
    return partial(compute_depth_stats_sweep_mesh, mesh=mesh)
