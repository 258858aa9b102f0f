"""EXACT-path e2e at scale (VERDICT r04 item 6): probe -> exact
capacities -> deferred export -> cluster on the structured facade scene
at V >= 100, per-stage split printed for the README scaling row.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/scale_exact_profile.py [V ...]
"""
import contextlib
import json
import sys
import time

import numpy as np

from line3d_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache()

from line3d_tpu import Line3D                        # noqa: E402
from line3d_tpu.config import L3DConfig              # noqa: E402
from line3d_tpu.utils.demo import make_facade_scene  # noqa: E402


def run_once(cfg, scene, dcams, jitter, warm):
    l3d = Line3D(config=cfg)
    if warm:
        l3d.warmup_async(scene.num_views, cfg.max_num_segments)
    for v in range(scene.num_views):
        segs = scene.segments[v][scene.seg_mask[v]] + np.float32(jitter)
        l3d.add_view_segments(
            v, segs, dcams.K[v], dcams.R[v], dcams.t[v],
            worldpoint_ids=scene.wp_lists[v], width=1920, height=1440)
    t1 = time.perf_counter()
    with contextlib.redirect_stdout(sys.stderr):
        res = l3d.compute_3d_model()
    return time.perf_counter() - t1, len(res), l3d.stats


def main():
    views = [int(a) for a in sys.argv[1:]] or [100]
    for V in views:
        cfg = L3DConfig(stable_shapes=True)
        scene, dcams = make_facade_scene(num_views=V, config=cfg)
        t0 = time.perf_counter()
        dt, n, st = run_once(cfg, scene, dcams, 0.0, warm=True)
        print(f"V={V} cold: {time.perf_counter() - t0:.1f}s "
              f"(model {dt:.2f}s, {n} lines)", flush=True)
        best = (np.inf, 0, {})
        trials = []
        for trial in range(4):
            dt, n, st = run_once(cfg, scene, dcams, 1e-3 * (trial + 1),
                                 warm=False)
            trials.append(round(dt, 2))
            if dt < best[0]:
                best = (dt, n, st)
        dt, n, st = best
        keys = [k for k in st if k.startswith("t_") or "probe" in k
                or "overflow" in k or "rematched" in k
                or "recollin" in k]
        print(f"V={V} warm best {dt:.2f}s of {trials} -> "
              f"{V / dt:.2f} img/s, {n} lines", flush=True)
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in st.items() if k in keys},
                         sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
