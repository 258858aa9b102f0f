"""CLI end-to-end: a rendered synthetic bundler dataset through
`python -m line3d_tpu.cli bundler` — images -> detector -> full pipeline ->
STL/TXT outputs (the reference's primary entry point, main_bundler.cpp)."""
import glob
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from synthetic import make_scene
from line3d_tpu import cli
from line3d_tpu.io import writers


def render_bundler_dataset(root, num_views=8, width=640, height=480):
    """Write bundle.rd.out + visualize/ images for the synthetic scene."""
    syn = make_scene(num_views=num_views, width=width, height=height,
                     focal=600.0)
    cams = syn.cameras
    os.makedirs(os.path.join(root, "visualize"), exist_ok=True)

    # images: draw the projected wireframe segments
    for v in range(num_views):
        img = np.full((height, width), 235, np.uint8)
        segs = syn.scene.segments[v][syn.scene.seg_mask[v]]
        for s in segs:
            cv2.line(img, (int(s[0]), int(s[1])), (int(s[2]), int(s[3])),
                     40, 2, lineType=cv2.LINE_AA)
        img = cv2.GaussianBlur(img, (3, 3), 0.7)
        cv2.imwrite(os.path.join(root, "visualize", f"{v:08d}.png"),
                    cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))

    # bundle.rd.out: undo the loader's sign conventions so that parsing
    # reproduces our cameras (main_bundler.cpp:159-176 flips back)
    wp_views = {}
    for v in range(num_views):
        for w in syn.wp_lists[v]:
            wp_views.setdefault(w, []).append(v)
    lines = ["# Bundle file v0.3",
             f"{num_views} {len(wp_views)}"]
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
        views = wp_views[w]
        entry = f"{len(views)}"
        for v in views:
            entry += f" {v} 0 0.0 0.0"
        lines.append(entry)
    with open(os.path.join(root, "bundle.rd.out"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return syn


def test_cli_bundler_end_to_end(tmp_path):
    root = str(tmp_path / "dataset")
    os.makedirs(root)
    syn = render_bundler_dataset(root)

    cli.main(["bundler", "-i", root, "-w", "640", "-n", "6",
              "--stable_shapes", "false"])

    out_dir = os.path.join(root, "Line3D")
    txts = glob.glob(os.path.join(out_dir, "line3D_result_*.txt"))
    stls = glob.glob(os.path.join(out_dir, "line3D_result_*.stl"))
    assert len(txts) == 1 and len(stls) == 1
    # the parameter stamp encodes the flags (main_bundler.cpp:302-327)
    assert "W_640" in txts[0] and "N_6" in txts[0]

    parsed = writers.load_txt(txts[0])
    assert len(parsed) >= 6, f"only {len(parsed)} 3D lines"

    # recovered lines must lie near ground-truth wireframe lines
    errs = []
    for segs3d, _res in parsed:
        pts = segs3d.reshape(-1, 3)
        best = min(
            np.linalg.norm(np.cross(pts - A, (B - A) / np.linalg.norm(B - A)),
                           axis=1).mean()
            for A, B in syn.lines3d)
        errs.append(best)
    assert np.median(errs) < 0.05, f"median err {np.median(errs)}"

    # segment caches were written (the -l flag default, line3D.cc:144-190)
    caches = glob.glob(os.path.join(out_dir, "L3D_data", "segments_*.npz"))
    assert len(caches) == 8

    # re-run must reuse caches and succeed (determinism-by-caching,
    # SURVEY.md §4); also captures a device-pipeline profile (--profile_dir,
    # our observability extension — the reference has no tracing, SURVEY §5)
    prof = str(tmp_path / "profile")
    cli.main(["bundler", "-i", root, "-w", "640", "-n", "6",
              "--stable_shapes", "false", "--profile_dir", prof])
    parsed2 = writers.load_txt(txts[0])
    assert len(parsed2) == len(parsed)
    assert glob.glob(os.path.join(prof, "**", "*.xplane.pb"),
                     recursive=True), "no profiler trace captured"


def test_parse_bool_reference_semantics():
    """'-e 0' must disable (TCLAP istream>>bool semantics), not enable."""
    import pytest
    from line3d_tpu.cli import _parse_bool
    assert _parse_bool("0") is False and _parse_bool("false") is False
    assert _parse_bool("no") is False and _parse_bool("off") is False
    assert _parse_bool("1") is True and _parse_bool("true") is True
    with pytest.raises(Exception):
        _parse_bool("maybe")
