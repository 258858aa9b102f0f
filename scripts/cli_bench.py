"""CLI throughput benchmark: render a synthetic bundler dataset (full-res
images with anti-aliased wireframe + facade segments), then run
`line3d_tpu.cli bundler` end to end (detection included) and report wall
time and images/s.

Usage: python scripts/cli_bench.py [--views 25] [--width 1920]
       [--height 1440] [--keep DIR] [--runs 2]

The first run pays the remote executable loads (the axon service compiles
each new program shape on first execution); the LAST run is the warm
number reported by README.md.
"""
import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def render_dataset(root, num_views, width, height):
    import cv2
    from line3d_tpu.utils.demo import make_facade_scene
    from line3d_tpu.config import L3DConfig

    cfg = L3DConfig()
    scene, cams = make_facade_scene(num_views=num_views, width=width,
                                    height=height,
                                    focal=0.9 * width, config=cfg)
    img_dir = os.path.join(root, "visualize")
    os.makedirs(img_dir, exist_ok=True)
    for v in range(scene.num_views):
        img = np.full((height, width), 235, np.uint8)
        segs = scene.segments[v][scene.seg_mask[v]]
        for s in segs:
            cv2.line(img, (int(s[0]), int(s[1])), (int(s[2]), int(s[3])),
                     40, 2, lineType=cv2.LINE_AA)
        img = cv2.GaussianBlur(img, (3, 3), 0.7)
        cv2.imwrite(os.path.join(img_dir, f"{v:08d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))

    wp_views = {}
    for v in range(num_views):
        for w in scene.wp_lists[v]:
            wp_views.setdefault(w, []).append(v)
    lines = ["# Bundle file v0.3", f"{num_views} {len(wp_views)}"]
    for v in range(num_views):
        lines.append(f"{cams.K[v][0, 0]:.6f} 0 0")
        R = cams.R[v].copy()
        R[1:3] *= -1.0
        for r in range(3):
            lines.append(" ".join(f"{x:.9f}" for x in R[r]))
        t = cams.t[v].copy()
        t[1:3] *= -1.0
        lines.append(" ".join(f"{x:.9f}" for x in t))
    for w in sorted(wp_views):
        lines.append("0 0 0")
        lines.append("128 128 128")
        entry = f"{len(wp_views[w])}"
        for v in wp_views[w]:
            entry += f" {v} 0 0.0 0.0"
        lines.append(entry)
    with open(os.path.join(root, "bundle.rd.out"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=25)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1440)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--keep", default=None,
                    help="reuse/keep the dataset directory")
    ap.add_argument("--load_segments", action="store_true",
                    help="benchmark the cached re-run mode (-l)")
    args = ap.parse_args()

    from line3d_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()
    from line3d_tpu import cli

    root = args.keep or tempfile.mkdtemp(prefix="cli_bench_")
    if not os.path.exists(os.path.join(root, "bundle.rd.out")):
        print(f"[cli_bench] rendering {args.views} views "
              f"{args.width}x{args.height} into {root}", flush=True)
        render_dataset(root, args.views, args.width, args.height)

    for run in range(args.runs):
        # fresh caches unless benchmarking the cached mode
        l3d_dir = os.path.join(root, "Line3D")
        if not args.load_segments and os.path.exists(l3d_dir):
            shutil.rmtree(l3d_dir)
        t0 = time.perf_counter()
        cli.main(["bundler", "-i", root, "-w", str(args.width)])
        dt = time.perf_counter() - t0
        print(f"[cli_bench] run {run}: {dt:.2f} s "
              f"({args.views / dt:.1f} images/s)", flush=True)

    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
