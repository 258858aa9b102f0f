"""Benchmark: candidate line-pair affinities/sec/chip.

Runs the full raw-matching stage (the TPU replacement for
K_pairwise_matches PLUS the reference's host-side download/sort/offset
build, cudawrapper.cu:538-611 and 923-1007) at production shape — 3072
padded segments per view, 10 visual neighbors — on one chip and reports
evaluated line-pair affinities per second: fused pairwise epipolar kernel,
per-128-block key compaction, cross-neighbor merge, and depth recompute at
the compacted shape.  Every stage's output feeds the timed reduction so
nothing is dead-code-eliminated.

Measurement protocol (required on this TPU tunnel backend, which memoizes
repeated identical executions and whose per-dispatch overhead is ~15 ms):
N kernel iterations run inside one device-side fori_loop with the input
perturbed per iteration; the result is read back to host to force
execution; per-iteration time = wall / N after a warm compile.

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against a nominal 1e9 pair-affinities/sec for the CUDA kernel on a 2015-era
GPU (16x16 blocks over a 3000x3000 grid, a few hundred flops per pair).
"""
import json
import os
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

# Tunnel-outage watchdog: the axon PJRT connect can block forever with no
# error when the relay is down (observed 2026-08-18, ~2h).  A healthy bench
# finishes in well under 5 min warm and ~4 min on a cold remote compile;
# if we are still running after the deadline, the tunnel is gone — exit
# non-zero instead of stalling the driver indefinitely.
BENCH_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 1200))


def _arm_watchdog(seconds):
    if seconds <= 0:          # BENCH_DEADLINE_S=0 disables the watchdog
        return threading.Timer(0, lambda: None)  # inert, cancel()-able
    def _trip():
        sys.stderr.write(
            f"[bench] watchdog: no result after {seconds:.0f}s — TPU "
            "tunnel unreachable (PJRT connect blocks without error when "
            "the axon relay is down); aborting\n")
        sys.stderr.flush()
        os._exit(2)
    t = threading.Timer(seconds, _trip)
    t.daemon = True
    t.start()
    return t


def main():
    watchdog = _arm_watchdog(BENCH_DEADLINE_S)
    import jax
    import jax.numpy as jnp
    from line3d_tpu.config import L3DConfig
    from line3d_tpu.core.conditioning import compute_conditioning
    from line3d_tpu.scene import view_similarities_from_worldpoints, \
        find_visual_neighbors
    from line3d_tpu.utils.demo import make_demo_scene
    from line3d_tpu.match import pairwise

    cfg = L3DConfig()
    # ~3000 segments/view (the reference cap, commons.h:44), padded to 3072
    scene, cams = make_demo_scene(num_views=12, num_random_segments=2990,
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
    pairs = N * S * S
    rate = pairs / per_iter
    watchdog.cancel()
    print(json.dumps({
        "metric": "line_pair_affinities_per_sec_per_chip",
        "value": rate,
        "unit": "pairs/s",
        "vs_baseline": rate / NOMINAL_BASELINE_PAIRS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
