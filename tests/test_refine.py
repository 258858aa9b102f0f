"""Line refinement (bundle adjustment) tests."""
import numpy as np

from line3d_tpu import Line3D, L3DConfig
from line3d_tpu.fit import refine
from synthetic import make_scene


def test_refine_recovers_perturbed_line():
    """A perturbed 3D line must converge back to the one that generated the
    observations."""
    rng = np.random.default_rng(0)
    syn = make_scene(num_views=8)
    cams = syn.cameras
    li = 0
    A, B = syn.lines3d[li]
    d_true = (B - A) / np.linalg.norm(B - A)

    mviews, msegs = [], []
    for v in range(8):
        hits = np.nonzero(syn.seg_line_id[v] == li)[0]
        for s in hits:
            mviews.append(v)
            msegs.append(s)
    assert len(mviews) >= 4
    Pm, p1, p2, mask = refine.build_cluster_member_data(
        [np.array(mviews)], [np.array(msegs)],
        syn.scene.segments, cams.P)

    # perturb the line
    P0 = (A + B) / 2 + rng.normal(0, 0.05, 3)
    d0 = d_true + rng.normal(0, 0.05, 3)
    d0 /= np.linalg.norm(d0)

    P0r, dr, rms_b, rms_a = refine.refine_lines(
        P0[None], d0[None], Pm, p1, p2, mask, iterations=10)
    assert rms_a[0] < rms_b[0]
    assert rms_a[0] < 0.1            # sub-0.1px reprojection
    # direction aligned with ground truth
    assert abs(float(dr[0] @ d_true)) > 0.99999
    # base point on the true line
    off = np.linalg.norm(np.cross(P0r[0] - A, d_true))
    assert off < 1e-3


def test_pipeline_with_refinement_improves_noisy_scene():
    syn = make_scene(num_views=10, noise_px=0.7, seed=2)

    def run(refine_on):
        l3d = Line3D(config=L3DConfig(use_collinearity=True,
                                      refine_lines=refine_on))
        for v in range(syn.scene.num_views):
            l3d.add_view_segments(
                v, syn.scene.segments[v][syn.scene.seg_mask[v]],
                syn.cameras.K[v].copy(), syn.cameras.R[v].copy(),
                syn.cameras.t[v].copy(),
                worldpoint_ids=syn.wp_lists[v], width=640, height=480)
        res = l3d.compute_3d_model(perform_diffusion=False)
        errs = []
        for line in res:
            pts = line.segments3d.reshape(-1, 3)
            best = min(np.linalg.norm(
                np.cross(pts - A, (B - A) / np.linalg.norm(B - A)),
                axis=1).mean() for A, B in syn.lines3d)
            errs.append(best)
        return res, float(np.median(errs))

    res0, err0 = run(False)
    res1, err1 = run(True)
    assert len(res1) >= len(res0) - 2
    assert err1 < err0, f"refined {err1} vs raw {err0}"
    assert err1 < 0.015
