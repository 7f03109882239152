"""Warm-shape reuse (VERDICT r4 #1): dispatching a batch on a larger
already-compiled shape must be bit-identical to the exact shape, and the
picker must never block a dispatch on a compile a warm shape can cover.

On the tunnelled TPU a single executable load costs 55-400 s when the
remote compile service is degraded (r5 measurements), so first-result
latency rides ONE load instead of one per batch-size bucket.
"""

import numpy as np
import pytest

from coverm_tpu.ops import sweep
from coverm_tpu.ops.depth import ReferenceLayout, compute_depth_stats_numpy
from coverm_tpu.ops.sweep import (_bucket_geo, _pick_shape, _shape_key,
                                  _shape_lock, _warm_shapes,
                                  compute_depth_stats_sweep)


@pytest.fixture
def clean_registry(monkeypatch):
    """Isolate the process-global registry and stub the background
    compile (the real one would block CI on a CPU jit)."""
    with _shape_lock:
        saved = set(_warm_shapes)
        _warm_shapes.clear()
        saved_inflight = set(sweep._inflight_shapes)
        sweep._inflight_shapes.clear()
    spawned = []
    monkeypatch.setattr(sweep, "prewarm_sweep",
                        lambda *a, **k: spawned.append((a, k)))
    yield spawned
    with _shape_lock:
        _warm_shapes.clear()
        _warm_shapes.update(saved)
        sweep._inflight_shapes.clear()
        sweep._inflight_shapes.update(saved_inflight)


def _key(B, **kw):
    d = dict(n_seg=8, ee=75, need_hist=False, n_bins=512,
             len_mode="scalar", trim_key=None, start_mode="abs")
    d.update(kw)
    return _shape_key(B, d["n_seg"], d["ee"], d["need_hist"], d["n_bins"],
                      d["len_mode"], d["trim_key"], d["start_mode"])


def _pick(B, **kw):
    d = dict(n_seg=8, ee=75, need_hist=False, n_bins=512,
             len_mode="scalar", trim_key=None, start_mode="abs")
    d.update(kw)
    return _pick_shape(B, d["n_seg"], d["ee"], d["need_hist"], d["n_bins"],
                       d["len_mode"], d["trim_key"], d["start_mode"])


def test_pick_exact_when_warm(clean_registry):
    with _shape_lock:
        _warm_shapes.add(_key(1024))
        _warm_shapes.add(_key(4096))
    assert _pick(1024) == 1024
    assert not clean_registry  # no background compile spawned


def test_pick_reuses_smallest_compatible_larger(clean_registry):
    with _shape_lock:
        _warm_shapes.add(_key(4096))
        _warm_shapes.add(_key(2048))
    assert _pick(1024) == 2048
    # the exact shape's compile was kicked off in the background, once
    assert len(clean_registry) == 1
    assert _pick(1024) == 2048  # still reusing; no duplicate spawn
    assert len(clean_registry) == 1


def test_pick_respects_waste_cap_and_params(clean_registry):
    with _shape_lock:
        _warm_shapes.add(_key(1024 * sweep._REUSE_CAP * 2))  # too wasteful
        _warm_shapes.add(_key(2048, len_mode="u16"))         # wrong family
        _warm_shapes.add(_key(2048, need_hist=True))         # wrong family
    assert _pick(1024) == 1024  # nothing compatible: exact, blocking


def test_pick_disabled_by_env(clean_registry, monkeypatch):
    monkeypatch.setenv("COVERM_TPU_SHAPE_REUSE", "0")
    with _shape_lock:
        _warm_shapes.add(_key(2048))
    assert _pick(1024) == 1024


def test_cold_gate_queues_and_matches(tmp_path, monkeypatch):
    """Family-cold first dispatch: the fused scan must queue block
    chunks behind the background compile (cold start = max(load,
    decode), not the sum) and produce a bit-identical result."""
    import threading

    from coverm_tpu.flags import FlagFilter
    from coverm_tpu.io.fastscan import (FusedScanStream, fused_available,
                                        scan_sample_fused)
    from test_fastscan import assert_scan_equal
    from test_streaming import make_bam

    if not fused_available():
        pytest.skip("native fused scan unavailable")
    path = make_bam(str(tmp_path / "g.bam"), n_contigs=6, n_reads=5000)

    def scan():
        s = FusedScanStream(path, target_bytes=1 << 14)
        h = s.open()
        layout = ReferenceLayout.build(h.target_lens, 75)
        return scan_sample_fused(h, s, layout, FlagFilter(), False,
                                 trim=(0.1, 0.9))

    warm_ref = scan()  # everything warm after this

    # simulate a SLOW first compile: a fake prewarm thread that stays
    # alive until released, so several dispatches queue behind the gate
    release = threading.Event()
    spawned = []

    def fake_prewarm(*a, **kw):
        t = threading.Thread(target=release.wait)
        t.start()
        spawned.append((a, kw))
        return t

    monkeypatch.setattr(sweep, "prewarm_sweep", fake_prewarm)
    monkeypatch.setattr(sweep, "dispatch_shape",
                        lambda *a, **k: (False, {"n_blocks": 1}))
    # release the gate shortly after the scan starts queueing
    threading.Timer(0.2, release.set).start()
    try:
        cold = scan()
    finally:
        release.set()
    assert spawned, "gate never engaged"
    assert_scan_equal(cold, warm_ref)


def test_coarse_dispatch_bit_identical(monkeypatch):
    """End to end: force a dispatch onto an 8x larger shape and compare
    against the numpy oracle — padding blocks must contribute nothing."""
    rng = np.random.default_rng(5)
    lengths = np.array([5000, 3000, 800, 12000], np.int64)
    layout = ReferenceLayout.build(lengths, 75)
    n = 700
    tids = np.sort(rng.integers(0, 4, n))
    starts = (rng.random(n) * (lengths[tids] - 150)).astype(np.int64)
    ends = np.minimum(starts + rng.integers(30, 150, n), lengths[tids])

    oracle = compute_depth_stats_numpy(layout, tids, starts, ends,
                                       need_hist=True, trim=(0.05, 0.95))
    exact = compute_depth_stats_sweep(layout, tids, starts, ends,
                                      need_hist=True, trim=(0.05, 0.95))
    # force the picker to choose a far larger B
    monkeypatch.setattr(sweep, "_pick_shape",
                        lambda B, *a: _bucket_geo(8 * B))
    coarse = compute_depth_stats_sweep(layout, tids, starts, ends,
                                       need_hist=True, trim=(0.05, 0.95))
    for f in ("sum_depth_window", "covered_window", "covered_full",
              "max_depth_window", "sumsq_window", "min_depth_window",
              "trimmed_sum"):
        np.testing.assert_array_equal(getattr(coarse, f), getattr(oracle, f),
                                      err_msg=f)
        np.testing.assert_array_equal(getattr(exact, f), getattr(oracle, f),
                                      err_msg=f)
    W = min(coarse.hist.shape[1], oracle.hist.shape[1])
    np.testing.assert_array_equal(coarse.hist[:, :W], oracle.hist[:, :W])
