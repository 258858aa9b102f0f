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


def _render_images(img_dir, syn, name_fn, width, height):
    """Draw each view's projected wireframe segments into an image file."""
    os.makedirs(img_dir, exist_ok=True)
    for v in range(syn.scene.num_views):
        img = np.full((height, width), 235, np.uint8)
        segs = syn.scene.segments[v][syn.scene.seg_mask[v]]
        for s in segs:
            cv2.line(img, (int(s[0]), int(s[1])), (int(s[2]), int(s[3])),
                     40, 2, lineType=cv2.LINE_AA)
        img = cv2.GaussianBlur(img, (3, 3), 0.7)
        cv2.imwrite(os.path.join(img_dir, name_fn(v)),
                    cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))


def render_bundler_dataset(root, num_views=8, width=640, height=480):
    """Write bundle.rd.out + visualize/ images for the synthetic scene."""
    syn = make_scene(num_views=num_views, width=width, height=height,
                     focal=600.0)
    cams = syn.cameras
    _render_images(os.path.join(root, "visualize"), syn,
                   lambda v: f"{v:08d}.png", width, height)

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


# ---------------------------------------------------------------------------
# VisualSfM front-end e2e (reference: main_vsfm.cpp:121-270)
# ---------------------------------------------------------------------------

def _rot_to_quat(R):
    """Inverse of nvm.quat_to_R (w, x, y, z), robust branch selection."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def render_nvm_dataset(root, num_views=8, width=640, height=480):
    """Write scene.nvm + images for the synthetic scene (NVM_V3 format as
    main_vsfm.cpp:121-223 parses it: filename focal qw qx qy qz C d 0,
    then worldpoint measurement lists)."""
    syn = make_scene(num_views=num_views, width=width, height=height,
                     focal=600.0)
    cams = syn.cameras
    _render_images(root, syn, lambda v: f"img_{v:03d}.png", width, height)

    wp_views = {}
    for v in range(num_views):
        for w in syn.wp_lists[v]:
            wp_views.setdefault(w, []).append(v)

    lines = ["NVM_V3", "", f"{num_views}"]
    for v in range(num_views):
        q = _rot_to_quat(cams.R[v])
        # loader round-trip check: quat -> R must reproduce the camera
        from line3d_tpu.io.nvm import quat_to_R
        np.testing.assert_allclose(quat_to_R(*q), cams.R[v], atol=1e-9)
        C = cams.C[v]
        lines.append(
            f"img_{v:03d}.png {cams.K[v][0, 0]:.6f} "
            + " ".join(f"{x:.9f}" for x in q) + " "
            + " ".join(f"{x:.9f}" for x in C) + " 0.0 0")
    lines += ["", f"{len(wp_views)}"]
    for w in sorted(wp_views):
        views = wp_views[w]
        entry = f"0 0 0 128 128 128 {len(views)}"
        for v in views:
            entry += f" {v} 0 0.0 0.0"
        lines.append(entry)
    with open(os.path.join(root, "scene.nvm"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return syn


def test_cli_vsfm_end_to_end(tmp_path):
    root = str(tmp_path / "nvm_dataset")
    os.makedirs(root)
    syn = render_nvm_dataset(root)

    cli.main(["vsfm", "-i", os.path.join(root, "scene.nvm"),
              "-w", "640", "-n", "6", "--stable_shapes", "false"])

    out_dir = os.path.join(root, "Line3D")
    txts = glob.glob(os.path.join(out_dir, "line3D_result_*.txt"))
    stls = glob.glob(os.path.join(out_dir, "line3D_result_*.stl"))
    assert len(txts) == 1 and len(stls) == 1

    parsed = writers.load_txt(txts[0])
    assert len(parsed) >= 6, f"only {len(parsed)} 3D lines"

    errs = []
    for segs3d, _res in parsed:
        pts = segs3d.reshape(-1, 3)
        best = min(
            np.linalg.norm(np.cross(pts - A, (B - A) / np.linalg.norm(B - A)),
                           axis=1).mean()
            for A, B in syn.lines3d)
        errs.append(best)
    assert np.median(errs) < 0.05, f"median err {np.median(errs)}"
