"""Measure the adaptively-tiled scoring kernel at M=1024 across tile shapes.

The tiled kernel's cost is Sum_s ceil(need_s/tile)^2 tile-visits: a larger
tile amortizes per-tile overhead but pays quadratic quantization waste when
row occupancies sit just above a tile boundary.  Sweeps (m_tile, m2_tile)
combos over facade-like occupancy distributions on the real chip using the
fori-loop + perturbation protocol (CLAUDE.md).

Measured (v5e, 2026-08-20, ms/iter):
  mix200_500  256x256 65.3  512x256 58.1  256x512 63.2  512x512 58.7  1024x256 99.9
  const700    256x256 143.6 512x256 168.4 256x512 182.9 512x512 212.7 1024x256 161.0
  (symmetric sweep: 128x128 is 1.3-1.6x slower than 256x256 everywhere)
Conclusion: distribution-dependent with modest swing; real scenes are
low-need-heavy, so the symmetric 256 default stays (_tiles_for docstring).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/scoring_tile_bench.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from line3d_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache()

from line3d_tpu.match import scoring_pallas as sp  # noqa: E402

S, M, N, St = 3072, 1024, 10, 3072
LOOP_N = 16


def make_inputs(rng, need_fn):
    segs_src = rng.uniform(0, 1000, (S, 4)).astype(np.float32)
    RtKinv = np.eye(3, dtype=np.float32)
    C = np.zeros(3, np.float32)
    cam = rng.integers(0, N, (S, M)).astype(np.int32)
    tgt = rng.integers(0, St, (S, M)).astype(np.int32)
    depths = rng.uniform(0.5, 2.0, (S, M, 2)).astype(np.float32)
    need = need_fn(rng).astype(np.int32)
    valid = np.arange(M)[None, :] < need[:, None]
    P_nb = rng.normal(size=(N, 3, 4)).astype(np.float32)
    segs_nb = rng.uniform(0, 1000, (N, St, 4)).astype(np.float32)
    return (segs_src, np.ones(S, bool), RtKinv, C, cam, tgt, depths, valid,
            P_nb, segs_nb)


def bench(tiles, inputs):
    orig = sp._tiles_for
    sp._tiles_for = lambda m: tiles
    try:
        (segs_src, mask, RtKinv, C, cam, tgt, depths, valid,
         P_nb, segs_nb) = [jnp.asarray(x) for x in inputs]
        # the raw (unjitted) kernel wrapper: the module-level jit would
        # cache the FIRST tile's trace (same avals/statics) and silently
        # ignore the monkeypatch on the second sweep point
        raw = sp.score_matches_pallas.__wrapped__

        @jax.jit
        def loop(depths):
            def body(i, acc):
                d = depths + i.astype(jnp.float32) * 1e-5
                conf = raw(
                    segs_src, mask, RtKinv, C, cam, tgt, d, valid,
                    P_nb, segs_nb,
                    jnp.float32(3.5), jnp.float32(10.0), jnp.float32(0.2))
                return acc + conf.sum()
            return jax.lax.fori_loop(0, LOOP_N, body, jnp.float32(0))

        float(loop(depths))          # compile + warm
        times = []
        for trial in range(3):
            d = depths + np.float32(1e-3 * (trial + 1))
            t0 = time.perf_counter()
            float(loop(d))
            times.append(time.perf_counter() - t0)
        return min(times) / LOOP_N
    finally:
        sp._tiles_for = orig


DISTS = {
    # facade-ish: most rows a few hundred live slots, a tail near M
    "mix200_500": lambda rng: rng.integers(200, 500, S),
    "const700": lambda rng: np.full(S, 700),
}

# (m_tile [lanes, scored axis], m2_tile [sublanes, supporting axis])
COMBOS = [(256, 256), (512, 256), (256, 512), (512, 512), (1024, 256),
          (512, 128), (256, 128)]

if __name__ == "__main__":
    for name, fn in DISTS.items():
        rng = np.random.default_rng(7)
        inputs = make_inputs(rng, fn)
        parts = []
        for tiles in COMBOS:
            try:
                v = bench(tiles, inputs)
                parts.append(f"{tiles[0]}x{tiles[1]}: {v * 1e3:7.2f} ms")
            except Exception as e:  # VMEM overflow etc.
                parts.append(f"{tiles[0]}x{tiles[1]}: FAIL "
                             f"({type(e).__name__})")
            print(f"{name:12s} {parts[-1]}", flush=True)   # progress
        print(f"{name:12s} " + "  ".join(parts), flush=True)
