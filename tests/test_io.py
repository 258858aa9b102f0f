"""IO tests: bundler/NVM parsers against hand-written files, undistortion,
caches."""
import os

import numpy as np

from line3d_tpu.io import bundler, nvm, images, cache


def test_parse_bundle_file(tmp_path):
    # 2 cameras, 2 points (bundler v0.3 format, main_bundler.cpp:109-204)
    content = """# Bundle file v0.3
2 2
800 0.01 -0.002
1 0 0
0 1 0
0 0 1
0.5 1.0 2.0
900 0 0
0.5 0 0.5
0 1 0
-0.5 0 0.5
-1 2 -3
1.5 2.5 3.5
255 0 0
2 0 11 1.0 2.0 1 22 3.0 4.0
-1 -2 -3
0 255 0
1 1 33 5.0 6.0
"""
    p = tmp_path / "bundle.rd.out"
    p.write_text(content)
    focal, dist, R, t, wps = bundler.parse_bundle_file(str(p))
    assert focal.tolist() == [800, 900]
    np.testing.assert_allclose(dist[0], [0.01, -0.002])
    # rows 2-3 sign flipped (main_bundler.cpp:159-161)
    np.testing.assert_allclose(R[0], np.diag([1.0, -1.0, -1.0]))
    # t y/z flipped (main_bundler.cpp:173-176)
    np.testing.assert_allclose(t[0], [0.5, -1.0, -2.0])
    assert wps[0] == [0]
    assert sorted(wps[1]) == [0, 1]


def test_parse_nvm(tmp_path):
    content = """NVM_V3

2
img0.jpg 800 1 0 0 0 1.0 2.0 3.0 0.05 0
img1.jpg 820 0.9238795 0 0.3826834 0 -1 0 1 0 0

1
0.1 0.2 0.3 255 255 255 2 0 5 1.1 2.2 1 7 3.3 4.4

"""
    p = tmp_path / "scene.nvm"
    p.write_text(content)
    ds = nvm.load_nvm_scene(str(p))
    assert ds.image_names == ["img0.jpg", "img1.jpg"]
    # identity quaternion -> identity R; t = -R C
    np.testing.assert_allclose(ds.R[0], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(ds.t[0], [-1.0, -2.0, -3.0])
    # quaternion w=cos(22.5deg), y=sin(22.5deg): rotation about +y by 45deg
    Rq = ds.R[1]
    np.testing.assert_allclose(Rq @ Rq.T, np.eye(3), atol=1e-7)
    assert ds.wp_lists[0] == [0] and ds.wp_lists[1] == [0]


def test_quat_to_r_matches_formula():
    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = nvm.quat_to_R(*q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)


def test_undistort_identity():
    img = (np.arange(60 * 80, dtype=np.uint8) % 251).reshape(60, 80)
    K = images.make_K(100.0, 80, 60)
    out = images.undistort(img, K, 0.0, 0.0)
    np.testing.assert_array_equal(out, img)


def test_undistort_center_fixed():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (120, 160), np.uint8)
    K = images.make_K(200.0, 160, 120)
    out = images.undistort(img, K, -0.1)
    # the principal point is a fixed point of radial distortion
    assert abs(int(out[60, 80]) - int(img[60, 80])) <= 1


def test_segment_cache_roundtrip(tmp_path):
    path = cache.segment_cache_path(str(tmp_path), 3, 640, 480, True)
    assert "segments_3_640x480_coll1" in path
    segs = np.random.default_rng(0).normal(size=(17, 4)).astype(np.float32)
    cache.save_segments(path, segs)
    out = cache.load_segments(path)
    np.testing.assert_array_equal(out, segs)
    assert cache.load_segments(str(tmp_path / "missing.npz")) is None


def test_gray_matches_reference_weights():
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = [100, 0, 0]    # B
    img[0, 1] = [0, 100, 0]    # G
    img[1, 0] = [0, 0, 100]    # R
    g = images.to_gray(img)
    # reference feeds BGR data through CV_RGB2GRAY (line3D.cc:1814):
    # channel 0 gets the 'R' weight 0.299
    np.testing.assert_allclose(g[0, 0], 29.9, atol=0.1)
    np.testing.assert_allclose(g[0, 1], 58.7, atol=0.1)
    np.testing.assert_allclose(g[1, 0], 11.4, atol=0.1)


def test_undistort_fallback_matches_cv2():
    """The numpy undistort fallback must match cv2.remap BORDER_CONSTANT
    semantics including the border band (taps outside blend with 0)."""
    import cv2
    from line3d_tpu.io import images
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (60, 80), np.uint8)
    K = images.make_K(70.0, 80, 60)
    want = images.undistort(img, K, 0.08, -0.01)        # cv2 path
    images._HAS_CV2 = False
    try:
        got = images.undistort(img, K, 0.08, -0.01)     # numpy fallback
    finally:
        images._HAS_CV2 = True
    diff = np.abs(want.astype(int) - got.astype(int))
    assert diff.max() <= 1, f"max abs diff {diff.max()}"


def test_resize_fallback_float_no_wraparound():
    """PIL fallback must not coerce floats through uint8 (modulo-256
    wraparound for out-of-range values)."""
    from line3d_tpu.io import images
    img = np.array([[256.2, -0.5], [100.0, 300.0]], np.float32)
    images._HAS_CV2 = False
    try:
        out = images.resize(img, 4, 4)
    finally:
        images._HAS_CV2 = True
    assert out.dtype == np.float32
    assert out.max() > 250.0 and out.min() >= -1.0      # no wrap to ~0/255


def test_nvm_wrapped_measurement_lines(tmp_path):
    """NVM point measurement lists may wrap across physical lines (the
    reference parses with stream extraction, main_vsfm.cpp:199-223)."""
    from line3d_tpu.io import nvm
    content = """NVM_V3

2
a.jpg 500 1 0 0 0 0 0 0 0
b.jpg 500 1 0 0 0 1 0 0 0

1
0 0 0 128 128 128 2 0 0
0.0 0.0 1 1
1.0 1.0
"""
    p = tmp_path / "scene.nvm"
    p.write_text(content)
    sc = nvm.load_nvm_scene(str(p))
    assert sc.wp_lists[0] == [0] and sc.wp_lists[1] == [0]


def test_conditioning_degenerate_center_on_centroid():
    """A camera center on the centroid must not NaN the conditioning (the
    reference divides d2/d1 unguarded; we skip d1=0 terms — identical for
    all non-degenerate scenes)."""
    from line3d_tpu.core.conditioning import compute_conditioning
    centers = np.array([[-1.0, 0, 0], [0.0, 0, 0], [1.0, 0, 0]])
    tr = compute_conditioning(centers)
    assert np.isfinite(tr.scale) and tr.scale > 0
    back = tr.inverse_transform_points(
        (np.concatenate([centers, np.ones((3, 1))], axis=1) @ tr.Qinv.T)[:, :3]
        * tr.scale)
    # round trip through the conditioning transform
    np.testing.assert_allclose(back, centers, atol=1e-9)
