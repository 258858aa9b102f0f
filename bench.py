"""Benchmark: pair-affinity rate + warm end-to-end images/s on one chip.

Two numbers, one JSON line (driver contract):

  * ``value`` (headline): candidate line-pair affinities/sec/chip — the full
    raw-matching stage (the TPU replacement for K_pairwise_matches PLUS the
    reference's host-side download/sort/offset build, cudawrapper.cu:538-611
    and 923-1007) at production shape: 3072 padded segments per view, 10
    visual neighbors.  Fused pairwise epipolar kernel, per-128-block key
    compaction, cross-neighbor merge, depth recompute at the compacted
    shape; every stage's output feeds the timed reduction so nothing is
    dead-code-eliminated.
  * ``e2e_images_per_sec_p25``: warm end-to-end images/s at the
    Herz-Jesu-P25 shape (25 views x 2990 segments, 10 neighbors) — the
    BASELINE.md north-star metric, covering detection-bypass scene build,
    matching, scoring, selection, collinearity, affinity, clustering, and
    line fitting (reference driver: cudawrapper.cu:858-1128 per view).

Measurement protocol (required on this TPU tunnel backend, which memoizes
repeated identical executions and whose per-dispatch overhead is ~15 ms):
the kernel benchmark runs N iterations inside one device-side fori_loop
with the input perturbed per iteration and a host readback to force
execution; the e2e benchmark perturbs the scene's segment coordinates per
trial so no two dispatches are memoizable, and takes the best of 3 warm
trials after a discarded cold (compile/load) run.

Tunnel health: the axon PJRT connect blocks forever without error when the
relay is down (observed 2026-08-18).  Before touching the device in-process
we probe with short subprocess attempts under exponential backoff, bounded
by the watchdog window, so a transient blip doesn't zero the round but a
real outage still exits non-zero promptly.

vs_baseline is measured against a nominal (NOT measured — the reference
publishes no numbers, BASELINE.md) 1e9 pair-affinities/sec for the CUDA
kernel on a 2015-era GPU (16x16 blocks over a 3000x3000 grid, a few
hundred flops per pair).
"""
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

# persistent XLA compilation cache (same as the CLI): first compile of the
# production-shape matching program is slow; repeat bench runs are instant.
# (Must be jax.config.update, not env vars — sitecustomize imports jax
# before this script body runs; see utils/xla_cache.py.)
from line3d_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache()

NOMINAL_BASELINE_PAIRS_PER_SEC = 1.0e9
LOOP_N = 16
E2E_VIEWS = 25
E2E_SEGMENTS = 2990
EXACT_VIEWS = 25

# Watchdog: a healthy bench finishes in ~3 min warm and ~12 min on cold
# remote compiles (the axon service compiles each new executable on first
# execution, 40-160 s each, high variance; the exact-path rows add the
# M=1024 rematch executables).  If we are still running at the deadline the
# tunnel died mid-run — exit non-zero instead of stalling the driver
# indefinitely.
BENCH_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 2700))
# Minimum window the measured phase needs after probing succeeds (cold
# remote compiles of the match + e2e programs dominate).
MEASURE_RESERVE_S = float(os.environ.get("BENCH_MEASURE_RESERVE_S", 700))
PROBE_TIMEOUT_S = 75   # one connect+tiny-program attempt (healthy: ~10 s)

_PROBE_SRC = "import jax, jax.numpy as jnp; print(float(jnp.arange(8.0).sum()))"


def _arm_watchdog(seconds):
    if seconds <= 0:          # BENCH_DEADLINE_S=0 disables the watchdog
        return threading.Timer(0, lambda: None)  # inert, cancel()-able
    def _trip():
        sys.stderr.write(
            f"[bench] watchdog: no result after {seconds:.0f}s — TPU "
            "tunnel died mid-run (PJRT calls block without error when the "
            "axon relay is down); aborting\n")
        sys.stderr.flush()
        os._exit(2)
    t = threading.Timer(seconds, _trip)
    t.daemon = True
    t.start()
    return t


def _probe_once():
    """One bounded tunnel-health attempt in a subprocess (a blocked PJRT
    connect cannot be cancelled in-process; a child can be killed)."""
    try:
        out = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                             capture_output=True, text=True,
                             timeout=PROBE_TIMEOUT_S)
        return out.returncode == 0 and "28.0" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def _wait_for_tunnel(deadline):
    """Bounded retry/backoff until the tunnel answers or the remaining
    window is too small to finish a cold run anyway."""
    delay = 10.0
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        if _probe_once():
            sys.stderr.write(f"[bench] tunnel ok (attempt {attempt}, "
                             f"{time.time() - t0:.0f}s)\n")
            return True
        left = deadline - time.time()
        if left < MEASURE_RESERVE_S + delay:
            sys.stderr.write(
                f"[bench] tunnel unreachable after {attempt} attempts and "
                f"{left:.0f}s left in the window — giving up\n")
            return False
        sys.stderr.write(f"[bench] tunnel probe {attempt} failed; retrying "
                         f"in {delay:.0f}s ({left:.0f}s left)\n")
        time.sleep(delay)
        delay = min(delay * 2, 120.0)


def _bench_pair_rate(cfg):
    """Pair-affinity rate at production shape (device-side fori_loop)."""
    import jax
    import jax.numpy as jnp
    from line3d_tpu.core.conditioning import compute_conditioning
    from line3d_tpu.scene import view_similarities_from_worldpoints, \
        find_visual_neighbors
    from line3d_tpu.utils.demo import make_demo_scene
    from line3d_tpu.match import pairwise

    scene, cams = make_demo_scene(num_views=12, num_random_segments=E2E_SEGMENTS,
                                  config=cfg)
    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)
    sim, _ = view_similarities_from_worldpoints(scene.wp_lists,
                                                scene.num_views)
    neighbors = find_visual_neighbors(sim, cams.baselines(),
                                      cfg.min_baseline, 10)
    v = 0
    nb = np.asarray(neighbors[v])
    N = len(nb)
    S = scene.max_segments

    F = cams.fundamentals_for_pairs(
        np.stack([np.full(N, v), nb], axis=1)).astype(np.float32)

    args = (jnp.asarray(scene.segments[nb]), jnp.asarray(scene.seg_mask[nb]),
            jnp.asarray(F), jnp.asarray(cams.f32("RtKinv")[nb]),
            jnp.asarray(cams.f32("C")[nb]), jnp.asarray(np.ones(N, bool)))
    src_rest = (jnp.asarray(scene.seg_mask[v]),
                jnp.asarray(cams.f32("RtKinv")[v]),
                jnp.asarray(cams.f32("C")[v]))

    @jax.jit
    def loop(segs_src, *a):
        (mask_src, RtKinv_src, C_src,
         segs_nb, mask_nb, F_nb, RtKinv_nb, C_nb, nb_mask) = a

        def body(i, acc):
            x = segs_src + i.astype(jnp.float32) * 1e-4
            res = pairwise.match_view_against_neighbors(
                x, mask_src, RtKinv_src, C_src,
                segs_nb, mask_nb, F_nb, RtKinv_nb, C_nb, nb_mask, quota=8,
                min_capacity=256)
            cam, tgt, valid = pairwise.merge_neighbor_tables(
                res, 256, segs_nb.shape[1])
            depths = pairwise.depths_for_matches(
                x, segs_nb, cam, tgt, valid,
                F_nb, RtKinv_src, RtKinv_nb, C_src, C_nb)
            # consume every stage so nothing is dead-code-eliminated
            return (acc + res["n_valid"].sum().astype(jnp.float32)
                    + depths.sum() + cam.sum().astype(jnp.float32))
        return jax.lax.fori_loop(0, LOOP_N, body, jnp.float32(0))

    base = jnp.asarray(scene.segments[v])
    float(loop(base, *src_rest, *args))          # compile + warm

    times = []
    for trial in range(3):
        x = jnp.asarray(scene.segments[v] + np.float32(0.01 * (trial + 1)))
        t0 = time.perf_counter()
        float(loop(x, *src_rest, *args))         # host read forces execution
        times.append(time.perf_counter() - t0)

    per_iter = min(times) / LOOP_N
    return N * S * S / per_iter


def _bench_e2e():
    """Warm end-to-end images/s at the Herz-Jesu-P25 shape.

    Per-trial segment perturbation defeats the tunnel's result memoization
    (identical program + identical inputs would return a cached answer).
    """
    import contextlib

    from line3d_tpu import Line3D
    from line3d_tpu.config import L3DConfig
    from line3d_tpu.utils.demo import make_demo_scene

    # uncapped_fallback off: the demo scene's random segments saturate the
    # 256-slot cap by construction (mean 233/256 — CLAUDE.md), so the
    # reference-exactness fallback would re-match every view and measure a
    # different program.  The bench pins the capped production path; the
    # drop rate rides along in the JSON (e2e_match_overflow).
    cfg = L3DConfig(stable_shapes=True, uncapped_fallback=False)
    scene, dcams = make_demo_scene(num_views=E2E_VIEWS,
                                   num_random_segments=E2E_SEGMENTS,
                                   config=cfg)

    def run_once(jitter, warm):
        l3d = Line3D(config=cfg)
        if warm:
            l3d.warmup_async(E2E_VIEWS, cfg.max_num_segments)
        for v in range(scene.num_views):
            segs = scene.segments[v][scene.seg_mask[v]] + np.float32(jitter)
            l3d.add_view_segments(
                v, segs, dcams.K[v], dcams.R[v], dcams.t[v],
                worldpoint_ids=scene.wp_lists[v], width=1920, height=1440)
        t1 = time.perf_counter()
        # the overflow warning prints to stdout; keep stdout JSON-only
        with contextlib.redirect_stdout(sys.stderr):
            res = l3d.compute_3d_model()
        return time.perf_counter() - t1, len(res), l3d.stats

    run_once(0.0, warm=True)                      # cold: compile + remote load
    best, lines, overflow = np.inf, 0, 0
    for trial in range(3):
        dt, nlines, stats = run_once(1e-3 * (trial + 1), warm=False)
        if dt < best:   # report lines/overflow from the best-time trial
            best, lines = dt, nlines
            overflow = int(stats.get("match_overflow", 0))
    return E2E_VIEWS / best, best, lines, overflow


def _bench_e2e_exact():
    """Reference-exact warm e2e on the structured facade scene.

    The facade's match density is realistic (epipolar physics: long
    vertical edges collect 50-80 gate-passing candidates per neighbor), so
    the default caps overflow and the uncapped fallback re-matches every
    overflowing view at exact capacity — the reported model is provably
    identical to an unbounded-list run (reference semantics,
    cudawrapper.cu:923-1007; oracle-equality tests in tests/test_caps.py).
    residual_overflow in the JSON must be 0.
    """
    import contextlib

    from line3d_tpu import Line3D
    from line3d_tpu.config import L3DConfig
    from line3d_tpu.utils.demo import make_facade_scene

    cfg = L3DConfig(stable_shapes=True)   # uncapped_fallback defaults on
    scene, dcams = make_facade_scene(num_views=EXACT_VIEWS, config=cfg)

    def run_once(jitter):
        l3d = Line3D(config=cfg)
        for v in range(scene.num_views):
            segs = scene.segments[v][scene.seg_mask[v]] + np.float32(jitter)
            l3d.add_view_segments(
                v, segs, dcams.K[v], dcams.R[v], dcams.t[v],
                worldpoint_ids=scene.wp_lists[v], width=1920, height=1440)
        t1 = time.perf_counter()
        with contextlib.redirect_stdout(sys.stderr):
            res = l3d.compute_3d_model()
        return time.perf_counter() - t1, len(res), l3d.stats

    run_once(0.0)                                 # cold: compile + load
    best, lines, rematched, residual = np.inf, 0, 0, -1
    for trial in range(3):
        dt, nlines, stats = run_once(1e-3 * (trial + 1))
        if dt < best:
            best, lines = dt, nlines
            rematched = int(stats.get("views_rematched_uncapped", 0))
            # the guard repairs every overflowing view, so the result is
            # exact whenever it ran (or nothing overflowed); a nonzero
            # residual here means the guard failed
            overflow = int(stats.get("match_overflow", 0))
            residual = 0 if (rematched > 0 or overflow == 0) else overflow
    return EXACT_VIEWS / best, best, lines, rematched, residual


def _bench_fallback_cost(cfg):
    """Cost of rematch_views_exact at PRODUCTION shape (S=3072 bucket,
    demo-scene density -> exact capacity M=1024), warm, one view."""
    from line3d_tpu.core.conditioning import compute_conditioning
    from line3d_tpu.scene import view_similarities_from_worldpoints, \
        find_visual_neighbors
    from line3d_tpu.utils.demo import make_demo_scene
    from line3d_tpu.match import engine

    scene, cams = make_demo_scene(num_views=12,
                                  num_random_segments=E2E_SEGMENTS,
                                  config=cfg)
    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)
    sim, _ = view_similarities_from_worldpoints(scene.wp_lists,
                                                scene.num_views)
    neighbors = find_visual_neighbors(sim, cams.baselines(),
                                      cfg.min_baseline, 10)
    engine.rematch_views_exact(scene, cams, neighbors, cfg, [0])  # cold
    sc = scene.segments.copy()
    times = []
    for trial in range(3):
        scene.segments[:] = sc + np.float32(1e-3 * (trial + 1))
        t0 = time.perf_counter()
        engine.rematch_views_exact(scene, cams, neighbors, cfg, [0])
        times.append(time.perf_counter() - t0)
    scene.segments[:] = sc
    return min(times)


def main():
    deadline = time.time() + BENCH_DEADLINE_S
    if BENCH_DEADLINE_S > 0 and not _wait_for_tunnel(deadline):
        sys.exit(2)
    watchdog = _arm_watchdog(deadline - time.time() if BENCH_DEADLINE_S > 0
                             else 0)
    from line3d_tpu.config import L3DConfig
    cfg = L3DConfig()

    rate = _bench_pair_rate(cfg)
    e2e_ips, e2e_s, e2e_lines, e2e_overflow = _bench_e2e()
    ex_ips, ex_s, ex_lines, ex_rematched, ex_residual = _bench_e2e_exact()
    fb_view_s = _bench_fallback_cost(cfg)

    watchdog.cancel()
    print(json.dumps({
        "metric": "line_pair_affinities_per_sec_per_chip",
        "value": rate,
        "unit": "pairs/s",
        # nominal 2015-GPU estimate, NOT a measured CUDA number (the
        # reference publishes none — BASELINE.md)
        "vs_baseline": rate / NOMINAL_BASELINE_PAIRS_PER_SEC,
        "e2e_images_per_sec_p25": e2e_ips,
        "e2e_warm_seconds_p25": e2e_s,
        "e2e_num_lines": e2e_lines,
        "e2e_shape": f"{E2E_VIEWS}x{E2E_SEGMENTS}",
        "e2e_match_overflow": e2e_overflow,
        # reference-exact row: realistic-density facade scene, uncapped
        # fallback armed; residual overflow MUST be 0
        "e2e_exact_images_per_sec": ex_ips,
        "e2e_exact_warm_seconds": ex_s,
        "e2e_exact_num_lines": ex_lines,
        "e2e_exact_views_rematched": ex_rematched,
        "e2e_exact_residual_overflow": ex_residual,
        "e2e_exact_shape": f"{EXACT_VIEWS}xfacade",
        # uncapped-exact rematch cost for ONE view at production shape
        # (S=3072 bucket, demo density -> M=1024), warm
        "fallback_seconds_per_view_s3072": fb_view_s,
    }))


if __name__ == "__main__":
    main()
