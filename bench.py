"""Benchmark: candidate line-pair affinities/sec/chip.

Runs the fused pairwise epipolar matching kernel (the TPU replacement for
K_pairwise_matches, cudawrapper.cu:538-611) at production shape — 3072
padded segments per view, 10 visual neighbors — on one chip and reports
evaluated line-pair affinities per second.

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against a nominal 1e9 pair-affinities/sec for the CUDA kernel on a 2015-era
GPU (16x16 blocks over a 3000x3000 grid, a few hundred flops per pair).
"""
import json
import time

import numpy as np

NOMINAL_BASELINE_PAIRS_PER_SEC = 1.0e9


def main():
    import jax
    from line3d_tpu.config import L3DConfig
    from line3d_tpu.core.conditioning import compute_conditioning
    from line3d_tpu.scene import view_similarities_from_worldpoints, \
        find_visual_neighbors
    from line3d_tpu.utils.demo import make_demo_scene
    from line3d_tpu.match import pairwise
    import jax.numpy as jnp
    import functools

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

    match_fn = jax.jit(functools.partial(
        pairwise.match_view_against_neighbors, m_cap=256))

    args = (jnp.asarray(scene.segments[v]), jnp.asarray(scene.seg_mask[v]),
            jnp.asarray(cams.f32("RtKinv")[v]), jnp.asarray(cams.f32("C")[v]),
            jnp.asarray(scene.segments[nb]), jnp.asarray(scene.seg_mask[nb]),
            jnp.asarray(F), jnp.asarray(cams.f32("RtKinv")[nb]),
            jnp.asarray(cams.f32("C")[nb]), jnp.asarray(np.ones(N, bool)))

    # warmup + compile.  NOTE: results must be *consumed* (accumulated into a
    # scalar that is then blocked on) — on the axon backend,
    # block_until_ready on an unconsumed output can return before the work
    # actually executes, giving wildly optimistic timings.
    out = match_fn(*args)
    acc = out["n_valid"].sum()
    acc.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = match_fn(*args)
        acc = acc + out["n_valid"].sum()
    acc.block_until_ready()
    dt = time.perf_counter() - t0

    pairs = N * S * S * iters
    rate = pairs / dt
    print(json.dumps({
        "metric": "line_pair_affinities_per_sec_per_chip",
        "value": rate,
        "unit": "pairs/s",
        "vs_baseline": rate / NOMINAL_BASELINE_PAIRS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
