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


def test_refine_device_matches_host():
    """refine_lines_device (jit f32, exact JVP Jacobians) converges to the
    same optimum as the host f64 numeric-Jacobian reference — equal final
    geometry within f32 tolerance, and no cluster left materially worse."""
    rng = np.random.default_rng(3)
    syn = make_scene(num_views=8, noise_px=0.3, seed=4)
    cams = syn.cameras

    mviews, msegs, P0s, d0s, gt = [], [], [], [], []
    for li, (A, B) in enumerate(syn.lines3d):
        mv, ms = [], []
        for v in range(8):
            hits = np.nonzero(syn.seg_line_id[v] == li)[0]
            for s in hits:
                mv.append(v)
                ms.append(s)
        if len(mv) < 4:
            continue
        mviews.append(np.array(mv))
        msegs.append(np.array(ms))
        d_true = (B - A) / np.linalg.norm(B - A)
        P0s.append((A + B) / 2 + rng.normal(0, 0.03, 3))
        d0 = d_true + rng.normal(0, 0.03, 3)
        d0s.append(d0 / np.linalg.norm(d0))
        gt.append((A, d_true))
    assert len(P0s) >= 8

    Pm, p1, p2, mask = refine.build_cluster_member_data(
        mviews, msegs, syn.scene.segments, cams.P)
    P0 = np.stack(P0s)
    d0 = np.stack(d0s)
    Ph, dh, rb_h, ra_h = refine.refine_lines(P0, d0, Pm, p1, p2, mask,
                                             iterations=8)
    Pd, dd, rb_d, ra_d = refine.refine_lines_device(P0, d0, Pm, p1, p2,
                                                    mask, iterations=8)
    np.testing.assert_allclose(rb_d, rb_h, rtol=1e-4, atol=1e-4)
    # both backends must reach the same optimum quality
    assert np.median(ra_d) <= np.median(ra_h) * 1.1 + 1e-3
    assert (ra_d <= ra_h + 0.05).all(), (ra_d - ra_h).max()
    # refined geometry agrees across backends (f32 vs f64)
    align = np.abs(np.sum(dd * dh, axis=1))
    assert align.min() > 0.9999, align.min()
    # base points lie on the same refined line (compare perpendicular
    # offsets, the parameterization's gauge is along-line translation)
    perp = np.linalg.norm(np.cross(Pd - Ph, dh), axis=1)
    assert perp.max() < 5e-3, perp.max()


def test_refine_device_sharded_matches_unsharded():
    """Sharding the cluster axis over an 8-device mesh is bit-equivalent to
    the single-device run: the per-cluster Gauss-Newton has no cross-cluster
    term, so partitioning must not change any value (and needs zero
    collectives)."""
    import jax
    from line3d_tpu.parallel import mesh as mesh_mod

    rng = np.random.default_rng(7)
    syn = make_scene(num_views=8, noise_px=0.3, seed=4)
    cams = syn.cameras

    mviews, msegs, P0s, d0s = [], [], [], []
    for li, (A, B) in enumerate(syn.lines3d):
        mv, ms = [], []
        for v in range(8):
            hits = np.nonzero(syn.seg_line_id[v] == li)[0]
            for s in hits:
                mv.append(v)
                ms.append(s)
        if len(mv) < 4:
            continue
        mviews.append(np.array(mv))
        msegs.append(np.array(ms))
        d_true = (B - A) / np.linalg.norm(B - A)
        P0s.append((A + B) / 2 + rng.normal(0, 0.03, 3))
        d0 = d_true + rng.normal(0, 0.03, 3)
        d0s.append(d0 / np.linalg.norm(d0))

    Pm, p1, p2, mask = refine.build_cluster_member_data(
        mviews, msegs, syn.scene.segments, cams.P)
    P0, d0 = np.stack(P0s), np.stack(d0s)

    mesh = mesh_mod.make_view_mesh(jax.devices()[:8])
    Pu, du, rbu, rau = refine.refine_lines_device(P0, d0, Pm, p1, p2, mask,
                                                  iterations=6)
    Ps, ds, rbs, ras = refine.refine_lines_device(P0, d0, Pm, p1, p2, mask,
                                                  iterations=6, mesh=mesh)
    # bit-exact today, but partitioning legally lets XLA re-fuse the
    # within-cluster einsum reductions at the per-shard batch shape — a
    # tight tolerance (not exact equality) keeps this robust across XLA
    # upgrades/backends while still catching any real sharding bug
    np.testing.assert_allclose(Ps, Pu, rtol=0, atol=1e-6)
    np.testing.assert_allclose(ds, du, rtol=0, atol=1e-6)
    np.testing.assert_allclose(ras, rau, rtol=0, atol=1e-6)


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
