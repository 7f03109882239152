"""Pallas TPU kernel: fused post-sort sweep scan.

After the event sort, the XLA path (`sweep._fused_sweep`) runs ~7
separate scans (cumsum/cummax) plus a dozen elementwise passes — each a
full HBM round-trip over the 2B-event arrays.  This kernel fuses the
entire post-sort pipeline into ONE pass: a sequential grid over event
tiles, with the inter-tile state (running sign sum, per-contig
forward-fill registers, weighted cumulative sums) carried in SMEM
scratch between grid steps.

In-kernel algorithm per tile (events sorted by (contig, position)):
  1. local inclusive scan of the ±1 signs  -> running depth
  2. forward-fill of (contig, sentinel payload) pairs by lexicographic
     max scan — recovers each event's contig length and the per-contig
     depth carry without any gather
  3. gap/window arithmetic (elementwise)
  4. local i64 scans of the three weighted quantities
  5. SMEM carries updated from the tile's last lane

Outputs are the cumulative arrays (cs_sum/cs_cov/cs_ful), the depth and
window-gap arrays for the histogram pass, and the (contig, max) fill
pair; the consumer reads per-contig statistics as boundary differences
exactly like the XLA path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

# Mosaic lowering of the fused kernel nests deeply enough to hit CPython's
# default recursion limit during tracing.
import sys as _sys

if _sys.getrecursionlimit() < 10000:
    _sys.setrecursionlimit(10000)

LANES = 128
ROWS = 16  # tile = ROWS x LANES events
TILE = ROWS * LANES
PAD_POS = 1 << 30  # position marking padding events
_NEG1 = np.int32(-1)
_ZERO = np.int32(0)


def _scan_axis_add(x, axis, size):
    """Inclusive add-scan along one axis via log-shift rolls (Mosaic has no
    cumsum lowering)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    zero = jnp.zeros_like(x)
    k = 1
    while k < size:
        x = x + jnp.where(idx >= k, pltpu.roll(x, np.int32(k), axis), zero)
        k *= 2
    return x


def _scan_rows_add(x):
    """Inclusive add-scan along the flattened (row-major) tile order."""
    x = _scan_axis_add(x, 1, LANES)
    row_tot = jnp.broadcast_to(x[:, -1:], x.shape)
    row_incl = _scan_axis_add(row_tot, 0, ROWS)
    return x + row_incl - row_tot


def _lexmax(a, b):
    """Pairwise lexicographic max of (s, v) pairs."""
    s1, v1 = a
    s2, v2 = b
    take2 = (s2 > s1) | ((s2 == s1) & (v2 >= v1))
    return (jnp.where(take2, s2, s1), jnp.where(take2, v2, v1))


def _scan_rows_lexmax(s, v):
    """Inclusive lexicographic-max scan of (s, v) pairs in tile order."""
    lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    cur = (s, v)
    k = 1
    while k < LANES:
        shifted = (jnp.where(lane >= k, pltpu.roll(cur[0], np.int32(k), 1), _NEG1),
                   jnp.where(lane >= k, pltpu.roll(cur[1], np.int32(k), 1), _ZERO))
        cur = _lexmax(shifted, cur)
        k *= 2
    # carry row suffix maxima down to later rows
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    last_s = jnp.broadcast_to(cur[0][:, -1:], s.shape)
    last_v = jnp.broadcast_to(cur[1][:, -1:], s.shape)
    k = 1
    while k < ROWS:
        shifted = (jnp.where(row >= k, pltpu.roll(last_s, np.int32(k), 0), _NEG1),
                   jnp.where(row >= k, pltpu.roll(last_v, np.int32(k), 0), _ZERO))
        last_s, last_v = _lexmax(shifted, (last_s, last_v))
        k *= 2
    prev = (jnp.where(row >= 1, pltpu.roll(last_s, np.int32(1), 0), _NEG1),
            jnp.where(row >= 1, pltpu.roll(last_v, np.int32(1), 0), _ZERO))
    return _lexmax(prev, cur)


def _sweep_kernel(seg_ref, pos_ref, sign_ref, paylen_ref, nseg_ref, npos_ref,
                  depth_ref, wlen_ref, flen_ref, maxs_ref, maxv_ref,
                  carry_i32, *, ee):
    """Pure-int32 kernel (Mosaic on this toolchain has no 64-bit types):
    the three i64 weighted cumsums stay in XLA; everything else — the sign
    scan, both forward fills, the gap/window arithmetic and the running
    per-contig max — fuses into this single pass."""
    t = pl.program_id(0)

    seg = seg_ref[:]
    pos = pos_ref[:]
    sign = sign_ref[:]
    paylen = paylen_ref[:]
    next_seg = nseg_ref[:]
    next_pos = npos_ref[:]

    @pl.when(t == 0)
    def _():
        carry_i32[0] = 0    # running sign cumsum
        carry_i32[1] = -1   # length-fill seg
        carry_i32[2] = 0    # length-fill value
        carry_i32[3] = -1   # carry-fill seg
        carry_i32[4] = 0    # carry-fill value
        carry_i32[5] = -1   # max-fill seg
        carry_i32[6] = 0    # max-fill value

    # 1. running depth
    gsign = _scan_rows_add(sign) + carry_i32[0]

    ee = np.int32(ee)
    is_sent = pos == _NEG1

    def fill(value, carry_s_idx, carry_v_idx):
        """Forward-fill `value` from sentinel-style sparse entries, blending
        the inter-tile carry pair."""
        fs, fv = _scan_rows_lexmax(seg, value)
        cs, cv = carry_i32[carry_s_idx], carry_i32[carry_v_idx]
        take_carry = (cs > fs) | ((cs == fs) & (cv > fv))
        return (jnp.where(take_carry, cs, fs),
                jnp.where(take_carry, cv, fv))

    # 2a. contig length fill; 2b. per-contig depth carry fill
    ls, length = fill(jnp.where(is_sent, paylen, _ZERO), 1, 2)
    cs_, carry_v = fill(jnp.where(is_sent, gsign, _ZERO), 3, 4)
    depth = gsign - carry_v

    # 3. gap/window arithmetic
    same = next_seg == seg
    gap_end = jnp.where(same, next_pos, length)
    full_len = jnp.maximum(
        jnp.minimum(gap_end, length) - jnp.maximum(pos, _ZERO), _ZERO)
    w_len = jnp.maximum(
        jnp.minimum(gap_end, length - ee) - jnp.maximum(pos, ee), _ZERO)
    w_len = jnp.where(length > np.int32(2) * ee, w_len, _ZERO)
    is_pad = pos >= np.int32(PAD_POS)
    full_len = jnp.where(is_pad, _ZERO, full_len)
    w_len = jnp.where(is_pad, _ZERO, w_len)

    covered = depth > _ZERO
    # max-depth fill pair
    ms, mv = fill(jnp.where(covered & (w_len > _ZERO), depth, _ZERO), 5, 6)

    depth_ref[:] = depth
    wlen_ref[:] = jnp.where(covered, w_len, _ZERO)
    flen_ref[:] = jnp.where(covered, full_len, _ZERO)
    maxs_ref[:] = ms
    maxv_ref[:] = mv

    # 4. update carries from the last element
    carry_i32[0] = gsign[ROWS - 1, LANES - 1]
    carry_i32[1] = ls[ROWS - 1, LANES - 1]
    carry_i32[2] = length[ROWS - 1, LANES - 1]
    carry_i32[3] = cs_[ROWS - 1, LANES - 1]
    carry_i32[4] = carry_v[ROWS - 1, LANES - 1]
    carry_i32[5] = ms[ROWS - 1, LANES - 1]
    carry_i32[6] = mv[ROWS - 1, LANES - 1]


@partial(jax.jit, static_argnames=("ee", "interpret"))
def pallas_sweep_scan(seg, pos, sign, paylen, next_seg, next_pos, ee,
                      interpret=False):
    """Run the fused sweep scan. All inputs int32[E], E % TILE == 0.

    Returns (depth, w_len, full_len, max_seg, max_val); w_len/full_len are
    pre-masked to covered (depth>0) gaps."""
    E = seg.shape[0]
    n_tiles = E // TILE
    shape2d = (E // LANES, LANES)
    args = [x.reshape(shape2d) for x in
            (seg, pos, sign, paylen, next_seg, next_pos)]
    # index maps must return a SINGLE integer type: with jax_enable_x64
    # on (this module enables it for the i64 cumsums), a literal 0 traces
    # as i64 while program_id is i32, and Mosaic fails to legalize the
    # mixed (i32, i64) func.return on the real TPU toolchain.  t * 0
    # keeps both components i32.
    in_specs = [pl.BlockSpec((ROWS, LANES), lambda t: (t, t * 0))
                for _ in range(6)]
    out_specs = [pl.BlockSpec((ROWS, LANES), lambda t: (t, t * 0))
                 for _ in range(5)]
    out_shape = [jax.ShapeDtypeStruct(shape2d, jnp.int32) for _ in range(5)]
    outs = pl.pallas_call(
        partial(_sweep_kernel, ee=ee),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
        interpret=interpret,
    )(*args)
    return tuple(o.reshape(E) for o in outs)
