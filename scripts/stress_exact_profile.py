"""Per-stage profile of the STRESS exact e2e run (25x2990 clutter,
probe-driven exact capacities, m_total=2048 at this density) on the real
chip — answers VERDICT r04 item 1: where do the 10.2 s go?

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/stress_exact_profile.py
"""
import contextlib
import json
import sys
import time

import numpy as np

from line3d_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache()

from line3d_tpu import Line3D                      # noqa: E402
from line3d_tpu.config import L3DConfig            # noqa: E402
from line3d_tpu.utils.demo import make_demo_scene  # noqa: E402

E2E_VIEWS, E2E_SEGMENTS = 25, 2990


def run_once(cfg, scene, dcams, jitter, warm):
    l3d = Line3D(config=cfg)
    if warm:
        l3d.warmup_async(E2E_VIEWS, cfg.max_num_segments)
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
    cfg = L3DConfig(stable_shapes=True)
    scene, dcams = make_demo_scene(num_views=E2E_VIEWS,
                                   num_random_segments=E2E_SEGMENTS,
                                   config=cfg)
    t0 = time.perf_counter()
    dt, n, st = run_once(cfg, scene, dcams, 0.0, warm=True)
    print(f"cold: {time.perf_counter() - t0:.1f}s (model {dt:.2f}s, "
          f"{n} lines)", flush=True)
    for trial in range(3):
        dt, n, st = run_once(cfg, scene, dcams, 1e-3 * (trial + 1),
                             warm=False)
        keys = [k for k in st if k.startswith("t_") or "probe" in k
                or "overflow" in k or "rematched" in k
                or "recollin" in k]
        print(f"warm {trial}: {dt:.3f}s, {n} lines")
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in st.items() if k in keys},
                         indent=None, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
