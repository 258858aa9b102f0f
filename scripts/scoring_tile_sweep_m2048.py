"""Tile-shape sweep for the dynamic-inner-loop tiled scoring kernel at
the REAL stress occupancy (M=2048, measured need p50 ~870): with the
m2 axis now an in-kernel fori_loop (no per-tile grid step), smaller m2
tiles may win back the ceil(need/T)^2 quantization the 256 default pays.

Per-combo prints flush immediately so a killed run keeps its partials.
Usage: PYTHONPATH=/root/repo:/root/repo/scripts:$PYTHONPATH \
           python scripts/scoring_tile_sweep_m2048.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from line3d_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache()

import stress_stage_bench as ssb                      # noqa: E402
from line3d_tpu.match import pairwise                 # noqa: E402
from line3d_tpu.match import scoring_pallas as sp     # noqa: E402

M_TOTAL, LOOP = 2048, 8
COMBOS = [(256, 256), (256, 128), (128, 128), (512, 256), (1024, 128),
          (512, 128)]


def main():
    fix = ssb.fixture()
    scene, src, nbd, sk = fix
    segs_src, mask_src, RtKinv_src, C_src = src
    (segs_nb, mask_nb, F_nb, RtKinv_nb, C_nb, P_nb, nb_mask) = nbd

    res = pairwise.match_view_against_neighbors(
        segs_src, mask_src, RtKinv_src, C_src,
        segs_nb, mask_nb, F_nb, RtKinv_nb, C_nb, nb_mask,
        quota=8, min_capacity=M_TOTAL)
    cam, tgt, valid = pairwise.merge_neighbor_tables(
        res, M_TOTAL, segs_nb.shape[1])
    tcoords = pairwise.gather_target_coords(segs_nb, cam, tgt)
    depths = pairwise.depths_for_matches(
        segs_src, segs_nb, cam, tgt, valid,
        F_nb, RtKinv_src, RtKinv_nb, C_src, C_nb, tcoords=tcoords)
    # the raw (unjitted) wrapper: the module-level jit would cache the
    # FIRST tile's trace (same avals) and ignore the monkeypatch
    raw = sp.score_matches_pallas.__wrapped__

    def bench(tiles):
        orig = sp._tiles_for
        sp._tiles_for = lambda m: tiles
        try:
            @jax.jit
            def loop(depths):
                def body(i, acc):
                    d = depths + i.astype(jnp.float32) * 1e-5
                    conf = raw(segs_src, mask_src, RtKinv_src, C_src,
                               cam, tgt, d, valid, P_nb, segs_nb,
                               jnp.float32(3.5), jnp.float32(10.0),
                               jnp.float32(sk), tcoords=tcoords)
                    return acc + conf.sum()
                return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))

            float(loop(depths))
            ts = []
            for t in range(3):
                d = depths + np.float32(1e-3 * (t + 1))
                t0 = time.perf_counter()
                float(loop(d))
                ts.append(time.perf_counter() - t0)
            return min(ts) / LOOP
        finally:
            sp._tiles_for = orig

    for tiles in COMBOS:
        try:
            v = bench(tiles)
            print(f"m_tile {tiles[0]:4d} x m2_tile {tiles[1]:4d}: "
                  f"{v * 1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{tiles}: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
