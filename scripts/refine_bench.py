"""Refinement backend benchmark: host f64 numpy vs device f32 jit at the
173k-cluster scale of scripts/host_stage_scaling.py (the 1000-view shape).

Synthesizes C random 3D lines observed by M=12-member clusters with pixel
noise, runs both backends, and reports wall time + optimum quality.

Usage: python scripts/refine_bench.py [C] (default 173000)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from line3d_tpu.utils.xla_cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()
from line3d_tpu.fit import refine  # noqa: E402


def synthesize(C, M=12, n_cams=40, seed=0):
    rng = np.random.default_rng(seed)
    # cameras on a ring
    Pms = []
    for k in range(n_cams):
        ang = 2 * np.pi * k / n_cams
        Cc = np.array([6 * np.cos(ang), 6 * np.sin(ang), 2.0])
        fwd = -Cc / np.linalg.norm(Cc)
        right = np.cross(fwd, [0, 0, 1.0])
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd])
        t = -R @ Cc
        K = np.array([[1500.0, 0, 960], [0, 1500.0, 540], [0, 0, 1.0]])
        Pms.append(K @ np.concatenate([R, t[:, None]], axis=1))
    Pms = np.stack(Pms)

    A = rng.uniform(-1, 1, (C, 3))
    d = rng.normal(size=(C, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    B = A + 0.5 * d

    cam_ids = rng.integers(0, n_cams, (C, M))
    Pm = Pms[cam_ids]                                   # [C, M, 3, 4]

    def proj(X):
        Xh = np.concatenate([X, np.ones((C, 1))], axis=1)
        x = np.einsum("cmij,cj->cmi", Pm, Xh)
        return x[..., :2] / x[..., 2:3]

    p1 = proj(A) + rng.normal(0, 1.0, (C, M, 2))
    p2 = proj(B) + rng.normal(0, 1.0, (C, M, 2))
    mask = np.ones((C, M), bool)

    P0 = (A + B) / 2 + rng.normal(0, 0.02, (C, 3))
    d0 = d + rng.normal(0, 0.02, (C, 3))
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    return P0, d0, Pm, p1, p2, mask


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 173000
    t0 = time.time()
    P0, d0, Pm, p1, p2, mask = synthesize(C)
    print(f"[refine_bench] synthesized C={C} clusters x {mask.shape[1]} "
          f"members ({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    _, _, rb_d, ra_d = refine.refine_lines_device(P0, d0, Pm, p1, p2, mask)
    t_dev_cold = time.time() - t0
    t0 = time.time()
    _, _, rb_d, ra_d = refine.refine_lines_device(
        P0 + 1e-4, d0, Pm, p1, p2, mask)
    t_dev = time.time() - t0
    print(f"[refine_bench] device: cold {t_dev_cold:.1f}s warm {t_dev:.2f}s "
          f"rms {np.median(rb_d):.3f} -> {np.median(ra_d):.3f} px",
          flush=True)

    t0 = time.time()
    _, _, rb_h, ra_h = refine.refine_lines(P0, d0, Pm, p1, p2, mask)
    t_host = time.time() - t0
    print(f"[refine_bench] host:   {t_host:.1f}s "
          f"rms {np.median(rb_h):.3f} -> {np.median(ra_h):.3f} px")
    print(f"[refine_bench] speedup: {t_host / t_dev:.1f}x warm")


if __name__ == "__main__":
    main()
