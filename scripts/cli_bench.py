"""CLI throughput benchmark: render a synthetic dataset (full-res images
with anti-aliased facade segments) in bundler or VisualSfM NVM format,
then run the `line3d_tpu.cli` front-end end to end (detection included)
and report wall time and images/s.

Usage: python scripts/cli_bench.py [--views 25] [--width 1920]
       [--height 1440] [--keep DIR] [--runs 2] [--format bundler|nvm]

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


def _render_images(scene, img_dir, name_fn, width, height):
    import cv2
    os.makedirs(img_dir, exist_ok=True)
    for v in range(scene.num_views):
        img = np.full((height, width), 235, np.uint8)
        segs = scene.segments[v][scene.seg_mask[v]]
        for s in segs:
            cv2.line(img, (int(s[0]), int(s[1])), (int(s[2]), int(s[3])),
                     40, 2, lineType=cv2.LINE_AA)
        img = cv2.GaussianBlur(img, (3, 3), 0.7)
        cv2.imwrite(os.path.join(img_dir, name_fn(v)),
                    cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))


def _wp_views(scene, num_views):
    wp_views = {}
    for v in range(num_views):
        for w in scene.wp_lists[v]:
            wp_views.setdefault(w, []).append(v)
    return wp_views


def _make_scene(kind, num_views, width, height):
    from line3d_tpu.config import L3DConfig
    if kind == "facade":
        from line3d_tpu.utils.demo import make_facade_scene
        return make_facade_scene(num_views=num_views, width=width,
                                 height=height, focal=0.9 * width,
                                 config=L3DConfig())
    # sparse wireframe (the round-2 detection-bound CLI row's shape)
    from line3d_tpu.utils.demo import make_demo_scene
    scene, cams = make_demo_scene(num_views=num_views, width=width,
                                  height=height, focal=0.9 * width,
                                  config=L3DConfig())
    return scene, cams


def render_dataset(root, num_views, width, height, kind="facade"):
    scene, cams = _make_scene(kind, num_views, width, height)
    _render_images(scene, os.path.join(root, "visualize"),
                   lambda v: f"{v:08d}.jpg", width, height)

    wp_views = _wp_views(scene, num_views)
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


def render_nvm_dataset(root, num_views, width, height, kind="facade"):
    """NVM_V3 dataset as main_vsfm.cpp:121-223 parses it (the ~200-image
    VisualSfM benchmark config, BASELINE.md)."""
    scene, cams = _make_scene(kind, num_views, width, height)
    _render_images(scene, root, lambda v: f"img_{v:04d}.jpg",
                   width, height)

    def rot_to_quat(R):
        tr = np.trace(R)
        if tr > 0:
            s = np.sqrt(tr + 1.0) * 2
            return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                             (R[0, 2] - R[2, 0]) / s,
                             (R[1, 0] - R[0, 1]) / s])
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
        q = np.empty(4)
        q[0] = (R[k, j] - R[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (R[j, i] + R[i, j]) / s
        q[1 + k] = (R[k, i] + R[i, k]) / s
        return q

    wp_views = _wp_views(scene, num_views)
    lines = ["NVM_V3", "", f"{num_views}"]
    for v in range(num_views):
        q = rot_to_quat(cams.R[v])
        C = cams.C[v]
        lines.append(
            f"img_{v:04d}.jpg {cams.K[v][0, 0]:.6f} "
            + " ".join(f"{x:.9f}" for x in q) + " "
            + " ".join(f"{x:.9f}" for x in C) + " 0.0 0")
    lines += ["", f"{len(wp_views)}"]
    for w in sorted(wp_views):
        entry = f"0 0 0 128 128 128 {len(wp_views[w])}"
        for v in wp_views[w]:
            entry += f" {v} 0 0.0 0.0"
        lines.append(entry)
    with open(os.path.join(root, "scene.nvm"), "w") as f:
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
    ap.add_argument("--format", choices=("bundler", "nvm"),
                    default="bundler")
    ap.add_argument("--scene", choices=("facade", "house"),
                    default="facade",
                    help="facade = realistic density (exact-path bound); "
                         "house = sparse wireframe (detection bound)")
    args = ap.parse_args()

    from line3d_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()
    from line3d_tpu import cli

    root = args.keep or tempfile.mkdtemp(prefix="cli_bench_")
    marker = os.path.join(root, "bundle.rd.out" if args.format == "bundler"
                          else "scene.nvm")
    if not os.path.exists(marker):
        print(f"[cli_bench] rendering {args.views} views "
              f"{args.width}x{args.height} ({args.format}) into {root}",
              flush=True)
        render_fn = render_dataset if args.format == "bundler" \
            else render_nvm_dataset
        render_fn(root, args.views, args.width, args.height,
                  kind=args.scene)

    cli_args = (["bundler", "-i", root] if args.format == "bundler"
                else ["vsfm", "-i", os.path.join(root, "scene.nvm")])
    for run in range(args.runs):
        # fresh caches unless benchmarking the cached mode
        l3d_dir = os.path.join(root, "Line3D")
        if not args.load_segments and os.path.exists(l3d_dir):
            shutil.rmtree(l3d_dir)
        t0 = time.perf_counter()
        cli.main(cli_args + ["-w", str(args.width)])
        dt = time.perf_counter() - t0
        print(f"[cli_bench] run {run}: {dt:.2f} s "
              f"({args.views / dt:.1f} images/s)", flush=True)

    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
