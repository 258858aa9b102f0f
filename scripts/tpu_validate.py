"""Post-change TPU validation: run after any compute-path change once the
axon tunnel is reachable.  Prints per-stage timings to compare against the
README table (warm e2e 0.65 s @ 12 views, 1.27 s @ 25 views at production
shape) and exercises the TPU-only paths CPU tests cannot reach:

  1. tiny probe (fails fast when the tunnel is down),
  2. Pallas pair kernel at S=384 (gcd block fix — Mosaic, not interpret),
  3. warm e2e at 12 and 25 views x 2990 segs, stable shapes + warmup
     (covers shard_map engine, HIGHEST-precision einsums, bucket logic),
  4. bench.py's metric inline (pair affinities/s).

Usage:  python scripts/tpu_validate.py  (from the repo root, default env)
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from line3d_tpu.utils.xla_cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    assert float(jnp.sum(jnp.arange(8.0))) == 28.0
    dev = jax.devices()[0]
    print(f"[1] probe ok on {dev.platform} ({time.time() - t0:.1f}s)")
    if dev.platform not in ("tpu", "axon"):
        print("    WARNING: not a TPU — timings below are not comparable")

    # ---- 2. Pallas S=384 (odd multiple of 128) -------------------------
    from line3d_tpu.match import pairwise, pairwise_pallas
    from synthetic import make_scene
    syn = make_scene(num_views=6)
    cams, sc = syn.cameras, syn.scene
    S = 384
    segs = np.zeros((2, S, 4), np.float32)
    mask = np.zeros((2, S), bool)
    ns = min(S, sc.segments.shape[1])
    segs[0, :ns], segs[1, :ns] = sc.segments[1][:ns], sc.segments[3][:ns]
    mask[0, :ns], mask[1, :ns] = sc.seg_mask[1][:ns], sc.seg_mask[3][:ns]
    args = (jnp.asarray(segs[0]), jnp.asarray(segs[1]),
            jnp.asarray(mask[0]), jnp.asarray(mask[1]),
            jnp.asarray(cams.fundamental(1, 3).astype(np.float32)),
            jnp.asarray(cams.RtKinv[1].astype(np.float32)),
            jnp.asarray(cams.RtKinv[3].astype(np.float32)),
            jnp.asarray(cams.C[1].astype(np.float32)),
            jnp.asarray(cams.C[3].astype(np.float32)))
    on_tpu = dev.platform in ("tpu", "axon")
    d_x, v_x = pairwise.match_pair_dense(*args)
    d_p, v_p = pairwise_pallas.match_pair_dense_pallas(
        *args, interpret=not on_tpu)
    v_x, v_p = np.asarray(v_x), np.asarray(v_p)
    mism = (v_x != v_p).mean()
    both = v_x & v_p
    ok = mism < 1e-3 and both.sum() > 20
    for k in range(4):
        ok &= np.allclose(np.asarray(d_x[k])[both], np.asarray(d_p[k])[both],
                          rtol=1e-3, atol=1e-4)
    print(f"[2] pallas S=384 on-device: {'ok' if ok else 'MISMATCH'} "
          f"(gate disagreement {mism:.2e}, {int(both.sum())} shared valid)")

    # ---- 3. warm e2e at production shape --------------------------------
    from line3d_tpu import Line3D, L3DConfig
    from line3d_tpu.utils.demo import make_demo_scene
    for nviews in (12, 25):
        # fallback off: the demo scene saturates the match caps by
        # construction; README timings are for the capped production path
        cfg = L3DConfig(stable_shapes=True, uncapped_fallback=False)
        scene, dcams = make_demo_scene(num_views=nviews,
                                       num_random_segments=2990, config=cfg)

        def run_once(warm=False):
            l3d = Line3D(config=cfg)
            if warm:
                l3d.warmup_async(nviews, cfg.max_num_segments)
            for v in range(scene.num_views):
                l3d.add_view_segments(
                    v, scene.segments[v][scene.seg_mask[v]],
                    dcams.K[v], dcams.R[v], dcams.t[v],
                    worldpoint_ids=scene.wp_lists[v],
                    width=1920, height=1440)
            t1 = time.time()
            res = l3d.compute_3d_model()
            return time.time() - t1, res, l3d

        run_once(warm=True)               # cold (compile/load)
        best = np.inf
        for _ in range(3):
            dt, res, l3d2 = run_once()
            best = min(best, dt)
        print(f"[3] warm e2e {nviews} views x 2990 segs: {best:.2f}s "
              f"({nviews / best:.1f} images/s), {len(res)} lines "
              f"[README: {'0.65' if nviews == 12 else '1.27'}s]")
        tstats = {k: round(v, 3) for k, v in l3d2.stats.items()
                  if isinstance(v, float)}
        print(f"    stage times: {tstats}")

    # ---- 4. bench metric -------------------------------------------------
    import subprocess
    out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                         text=True, timeout=2400)
    print(f"[4] bench: {out.stdout.strip() or out.stderr.strip()}")


if __name__ == "__main__":
    main()
