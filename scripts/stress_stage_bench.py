"""Per-stage device budget of the EXACT-capacity match program at the
stress shape (25x2990 clutter, probe decision: quota=8, m_total=2048,
k_export=4.19M) — locates the 380 ms/view of BENCH_r04's
e2e_exact_stress row (VERDICT r04 items 1-2).

Stages measured cumulatively with the fori-loop + perturbation protocol
(CLAUDE.md), on view 0 of the stress scene with its real neighbor stacks
(so the tiled scoring kernel sees the REAL occupancy distribution):

  A  pair gates + block compaction  (match_view_against_neighbors)
  B  + merge to [S, 2048]           (merge_neighbor_tables)
  C  + depth recompute              (depths_for_matches)
  D  + scoring                      (score_matches_best, tiled kernel)
  E  + device select/export         (device_select, k_export=4.19M)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/stress_stage_bench.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from line3d_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache()

from line3d_tpu.config import L3DConfig                    # noqa: E402
from line3d_tpu.core.conditioning import compute_conditioning  # noqa: E402
from line3d_tpu.scene import view_similarities_from_worldpoints, \
    find_visual_neighbors                                  # noqa: E402
from line3d_tpu.utils.demo import make_demo_scene          # noqa: E402
from line3d_tpu.match import pairwise, scoring             # noqa: E402
from line3d_tpu.parallel import sharded                    # noqa: E402

E2E_VIEWS, E2E_SEGMENTS = 25, 2990
QUOTA, M_TOTAL, K_EXPORT = 8, 2048, 4194304
LOOP_N = 8


def fixture():
    cfg = L3DConfig()
    scene, cams = make_demo_scene(num_views=E2E_VIEWS,
                                  num_random_segments=E2E_SEGMENTS,
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
    F = cams.fundamentals_for_pairs(
        np.stack([np.full(N, v), nb], axis=1)).astype(np.float32)
    nbd = (jnp.asarray(scene.segments[nb]), jnp.asarray(scene.seg_mask[nb]),
           jnp.asarray(F), jnp.asarray(cams.f32("RtKinv")[nb]),
           jnp.asarray(cams.f32("C")[nb]),
           jnp.asarray(cams.f32("P")[nb]), jnp.asarray(np.ones(N, bool)))
    src = (jnp.asarray(scene.segments[v]), jnp.asarray(scene.seg_mask[v]),
           jnp.asarray(cams.f32("RtKinv")[v]), jnp.asarray(cams.f32("C")[v]))
    sk = np.float32(cams.spatial_uncertainty_k(2.0 * cfg.sigma_p)[0])
    return scene, src, nbd, sk


def timed(loop_fn, base, *rest, n_iter=LOOP_N):
    float(loop_fn(base, *rest))
    times = []
    for trial in range(3):
        x = base + np.float32(0.01 * (trial + 1))
        t0 = time.perf_counter()
        float(loop_fn(x, *rest))
        times.append(time.perf_counter() - t0)
    return min(times) / n_iter


def main():
    scene, src, nbd, sk = fixture()
    segs_src, mask_src, RtKinv_src, C_src = src
    (segs_nb, mask_nb, F_nb, RtKinv_nb, C_nb, P_nb, nb_mask) = nbd
    S = scene.max_segments

    def stage_loop(upto):
        @jax.jit
        def loop(segs_src):
            def body(i, acc):
                x = segs_src + i.astype(jnp.float32) * 1e-4
                res = pairwise.match_view_against_neighbors(
                    x, mask_src, RtKinv_src, C_src,
                    segs_nb, mask_nb, F_nb, RtKinv_nb, C_nb, nb_mask,
                    quota=QUOTA, min_capacity=M_TOTAL)
                if upto == "A":
                    return acc + res["n_valid"].sum().astype(jnp.float32)
                cam, tgt, valid = pairwise.merge_neighbor_tables(
                    res, M_TOTAL, segs_nb.shape[1])
                if upto == "B":
                    return acc + cam.sum().astype(jnp.float32)
                tcoords = pairwise.gather_target_coords(segs_nb, cam,
                                                         tgt)
                depths = pairwise.depths_for_matches(
                    x, segs_nb, cam, tgt, valid,
                    F_nb, RtKinv_src, RtKinv_nb, C_src, C_nb,
                    tcoords=tcoords)
                if upto == "C":
                    return acc + depths.sum()
                conf = scoring.score_matches_best(
                    x, mask_src, RtKinv_src, C_src,
                    cam, tgt, depths, valid, P_nb, segs_nb,
                    jnp.float32(3.5), jnp.float32(10.0), jnp.float32(sk),
                    row_chunk=min(128, S), tcoords=tcoords)
                if upto == "D":
                    return acc + conf.sum()
                out = sharded.device_select(cam, tgt, depths, valid, conf,
                                            jnp.float32(0.5), K_EXPORT,
                                            segs_nb.shape[0])
                leaves = jax.tree.leaves(out)
                return acc + sum(l.astype(jnp.float32).sum()
                                 for l in leaves)
            return jax.lax.fori_loop(0, LOOP_N, body, jnp.float32(0))
        return loop

    prev = 0.0
    for st in ("A", "B", "C", "D", "E"):
        t = timed(stage_loop(st), segs_src)
        print(f"stage {st}: {t * 1e3:8.2f} ms/view cumulative "
              f"(+{(t - prev) * 1e3:7.2f} ms)", flush=True)
        prev = t

    # occupancy distribution feeding the tiled scoring kernel
    res = pairwise.match_view_against_neighbors(
        segs_src, mask_src, RtKinv_src, C_src,
        segs_nb, mask_nb, F_nb, RtKinv_nb, C_nb, nb_mask,
        quota=QUOTA, min_capacity=M_TOTAL)
    cam, tgt, valid = pairwise.merge_neighbor_tables(res, M_TOTAL,
                                                     segs_nb.shape[1])
    need = np.asarray(jnp.sum(valid, axis=1))
    print(f"occupancy: mean {need.mean():.0f} p50 {np.median(need):.0f} "
          f"p90 {np.percentile(need, 90):.0f} max {need.max()} "
          f"(M={M_TOTAL}, S={S})", flush=True)


if __name__ == "__main__":
    main()
