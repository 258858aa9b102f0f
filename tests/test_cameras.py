import numpy as np

from line3d_tpu.core.cameras import CameraSet
from line3d_tpu.core.conditioning import compute_conditioning
from synthetic import make_scene


def test_camera_derivations():
    syn = make_scene(num_views=5)
    cams = syn.cameras
    V = cams.num_views
    for v in range(V):
        # C = -R^T t (view.cc:27)
        np.testing.assert_allclose(cams.C[v], cams.Rt[v] @ (-cams.t[v]),
                                   atol=1e-12)
        # P = K [R|t] (view.cc:30-34)
        Rt = np.concatenate([cams.R[v], cams.t[v][:, None]], axis=1)
        np.testing.assert_allclose(cams.P[v], cams.K[v] @ Rt, atol=1e-12)
        # RtKinv maps principal point to forward-ish ray
        pp = np.array([cams.width[v] / 2, cams.height[v] / 2, 1.0])
        ray = cams.RtKinv[v] @ pp
        ray /= np.linalg.norm(ray)
        fwd = cams.Rt[v] @ np.array([0, 0, 1.0])
        assert ray @ fwd > 0.99


def test_uncertainty_slopes():
    syn = make_scene(num_views=5)
    cams = syn.cameras
    assert np.all(cams.k_upper > cams.k_lower)
    assert np.all(cams.k_lower > 0)
    # for a pinhole with focal f, a shift of d px at depth 1 is ~ d/f
    f = cams.K[0, 0, 0]
    np.testing.assert_allclose(cams.k_lower, 1.0 / f, rtol=0.05)
    np.testing.assert_allclose(cams.k_upper, 5.0 / f, rtol=0.05)
    # monotone in pixel distance
    k2 = cams.spatial_uncertainty_k(7.0)
    assert np.all(k2 > cams.k_upper)


def test_uncertainty_depth_clamp():
    syn = make_scene(num_views=5)
    cams = syn.cameras
    cams.median_depth[:] = 2.0
    lo_near = cams.lower_uncertainty(0, 1.0)
    lo_far = cams.lower_uncertainty(0, 5.0)   # clamped at median 2.0
    np.testing.assert_allclose(lo_near, cams.k_lower[0] * 1.0)
    np.testing.assert_allclose(lo_far, cams.k_lower[0] * 2.0)
    sig = cams.uncertainty_sigma_sq(0, 1.0)
    d1 = cams.lower_uncertainty(0, 1.0)
    d2 = cams.upper_uncertainty(0, 1.0)
    np.testing.assert_allclose(sig, -(d2 - d1) ** 2 / (2 * np.log(0.01)))


def test_conditioning_roundtrip():
    syn = make_scene(num_views=6)
    cams = syn.cameras
    C_orig = cams.C.copy()
    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)
    # conditioned centers: COG ~ 0, mean spread ~ sqrt(2)
    cog = cams.C.mean(axis=0)
    np.testing.assert_allclose(cog, 0.0, atol=1e-9)
    spread = np.linalg.norm(cams.C, axis=1).mean()
    np.testing.assert_allclose(spread, np.sqrt(2.0), rtol=1e-9)
    # inverse transform maps conditioned points back to the original frame
    back = tr.inverse_transform_points(cams.C)
    np.testing.assert_allclose(back, C_orig, atol=1e-9)


def test_conditioning_preserves_projection():
    """Pixel coordinates of a transformed 3D point must be unchanged."""
    syn = make_scene(num_views=6)
    cams = syn.cameras
    X = np.array([0.3, -0.2, 0.1])
    x_before = cams.P[1] @ np.append(X, 1.0)
    x_before = x_before[:2] / x_before[2]

    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)
    # the conditioned-space position of X is X' = s (R X + t): the camera
    # update [R_v | s t_v] Qinv composed with this map reproduces s * pixel
    # (applyTransformation line3D.cc:1758-1779; inverseTransform 1782-1786
    # is its inverse)
    Xc = tr.scale * (tr.R @ X + tr.t)
    x_after = cams.P[1] @ np.append(Xc, 1.0)
    x_after = x_after[:2] / x_after[2]
    np.testing.assert_allclose(x_after, x_before, atol=1e-6)
    # and inverseTransform undoes the conditioning of points
    np.testing.assert_allclose(tr.inverse_transform_points(Xc[None])[0],
                               X, atol=1e-9)
