"""Facade benchmark scene: structured geometry at realistic match density
through the reference-exact path.

The facade generator (utils/demo.make_facade_scene) exists because the
random-clutter demo scene saturates the match caps by construction; the
facade's counts are driven by real epipolar physics (long vertical edges
collect ~50-80 gate-passing candidates per neighbor), exceeding the
default caps.  The one-pass exact flow (capacity_probe, the default) must
therefore raise the launch capacities upfront so NOTHING overflows and no
view pays a rematch (reference semantics: unbounded match lists,
cudawrapper.cu:923-1007; the fallback machinery itself is pinned with
capacity_probe=False in tests/test_caps.py).  This pins the whole exact
path end-to-end on a scene shaped like the benchmark rows in README.md.
"""
import numpy as np

from line3d_tpu import Line3D
from line3d_tpu.config import L3DConfig
from line3d_tpu.utils.demo import make_facade_scene, facade_lines


def test_facade_scene_exact_one_pass_end_to_end():
    cfg = L3DConfig(stable_shapes=False)
    scene, dcams = make_facade_scene(num_views=6, width=640, height=480,
                                     focal=600.0, n_cols=3, n_rows=3,
                                     distance=4.5, config=cfg)
    assert scene.seg_count.min() >= 40

    l3d = Line3D(config=cfg)
    for v in range(scene.num_views):
        segs = scene.segments[v][scene.seg_mask[v]]
        l3d.add_view_segments(v, segs, dcams.K[v], dcams.R[v], dcams.t[v],
                              worldpoint_ids=scene.wp_lists[v],
                              width=640, height=480)
    res = l3d.compute_3d_model()

    # realistic density exceeds the default caps, so the probe must have
    # raised the one-pass launch capacity — and then nothing overflows and
    # no view is rematched (one-pass reference exactness)
    assert l3d.stats["probe_m_total"] > 0
    assert l3d.stats["match_overflow"] == 0
    assert l3d.stats["views_rematched_uncapped"] == 0

    assert len(res) >= 20, len(res)

    # recovered 3D lines lie on ground-truth facade lines (the generator is
    # deterministic: same seed -> same 3D segments)
    gt = facade_lines(n_cols=3, n_rows=3, seed=0 + 11)
    A = gt[:, 0]
    d = gt[:, 1] - gt[:, 0]
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    errs = []
    for line in res:
        pts = np.asarray(line.segments3d, np.float64).reshape(-1, 3)
        e = np.linalg.norm(np.cross(pts[:, None, :] - A[None], d[None]),
                           axis=2).min(axis=1).mean()
        errs.append(e)
    assert np.median(errs) < 0.05, np.median(errs)
