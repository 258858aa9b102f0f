"""Quota-bucket overpay measurement (VERDICT r04 weak #6 / item 8).

decide_exact_capacities quantizes the block quota to {default, 32, 128}
(coarse buckets keep the executable count finite; each new combination
is a 40-160 s first-execution remote compile).  The effective quota is
max(quota, ceil(m_total/B)) capped at the block width, so the bucket
choice only matters when it EXCEEDS that floor.  This sweep times the
full per-view device program (pair gates -> blockq -> merge -> depths ->
scoring -> select) on the stress clutter fixture across (m_total, quota)
combos to bound what a coarser-than-needed bucket costs.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/quota_bucket_bench.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from line3d_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache()

import stress_stage_bench as ssb                     # noqa: E402
from line3d_tpu.match import pairwise, scoring       # noqa: E402
from line3d_tpu.parallel import sharded              # noqa: E402

LOOP_N = 8
K_EXPORT = 1 << 22


def full_loop(fix, quota, m_total):
    scene, src, nbd, sk = fix
    segs_src, mask_src, RtKinv_src, C_src = src
    (segs_nb, mask_nb, F_nb, RtKinv_nb, C_nb, P_nb, nb_mask) = nbd
    S = scene.max_segments

    @jax.jit
    def loop(segs_src):
        def body(i, acc):
            x = segs_src + i.astype(jnp.float32) * 1e-4
            res = pairwise.match_view_against_neighbors(
                x, mask_src, RtKinv_src, C_src,
                segs_nb, mask_nb, F_nb, RtKinv_nb, C_nb, nb_mask,
                quota=quota, min_capacity=m_total)
            cam, tgt, valid = pairwise.merge_neighbor_tables(
                res, m_total, segs_nb.shape[1])
            tcoords = pairwise.gather_target_coords(segs_nb, cam, tgt)
            depths = pairwise.depths_for_matches(
                x, segs_nb, cam, tgt, valid,
                F_nb, RtKinv_src, RtKinv_nb, C_src, C_nb, tcoords=tcoords)
            conf = scoring.score_matches_best(
                x, mask_src, RtKinv_src, C_src,
                cam, tgt, depths, valid, P_nb, segs_nb,
                jnp.float32(3.5), jnp.float32(10.0), jnp.float32(sk),
                row_chunk=min(128, S), tcoords=tcoords)
            out = sharded.device_select(cam, tgt, depths, valid, conf,
                                        jnp.float32(0.5), K_EXPORT,
                                        segs_nb.shape[0])
            leaves = jax.tree.leaves(out)
            return acc + sum(l.astype(jnp.float32).sum() for l in leaves)
        return jax.lax.fori_loop(0, LOOP_N, body, jnp.float32(0))
    return loop


def main():
    fix = ssb.fixture()
    S = fix[0].max_segments
    B = S // 128
    combos = [(2048, 8), (2048, 32), (2048, 128),
              (1024, 8), (1024, 128),
              (512, 32), (512, 128),
              (256, 8), (256, 32), (256, 128)]
    for m_total, quota in combos:
        eff = min(max(quota, -(-m_total // B)), 128)
        loop = full_loop(fix, quota, m_total)
        t = ssb.timed(loop, fix[1][0])
        print(f"m_total {m_total:5d} quota {quota:3d} (eff {eff:3d}): "
              f"{t * 1e3:7.2f} ms/view", flush=True)


if __name__ == "__main__":
    main()
