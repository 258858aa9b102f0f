"""Unit tests for core geometry against closed forms (SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp

from line3d_tpu.core import geometry as g
from line3d_tpu.core.cameras import CameraSet
from synthetic import make_scene


def test_line_through_and_distance():
    p1 = jnp.array([0.0, 0.0, 1.0])
    p2 = jnp.array([10.0, 0.0, 1.0])
    line = g.line_through(p1, p2)  # the x-axis
    q = jnp.array([5.0, 3.0, 1.0])
    assert np.isclose(float(g.dist_point_line_2d(line, q)), 3.0, atol=1e-5)


def test_normalize_hom():
    p = jnp.array([[4.0, 2.0, 2.0], [1.0, 1.0, 0.0]])
    out, valid = g.normalize_hom(p)
    np.testing.assert_allclose(np.asarray(out[0]), [2.0, 1.0, 1.0], atol=1e-6)
    assert bool(valid[0]) and not bool(valid[1])
    np.testing.assert_allclose(np.asarray(out[1]), 0.0)


def test_angle_between_dirs():
    a = jnp.array([1.0, 0.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    assert np.isclose(float(g.angle_between_dirs_deg(a, b)), 90.0, atol=1e-4)
    c = jnp.array([-1.0, 0.0, 0.0])
    # folded to acute
    assert np.isclose(float(g.angle_between_dirs_deg(a, c)), 0.0, atol=1e-3)


def test_segment_overlap_cases():
    mk = lambda x, y: jnp.array([x, y, 1.0])
    p1, p2 = mk(0, 0), mk(10, 0)
    # both target points inside -> len_tgt/len_src
    ov = g.segment_overlap_2d(p1, p2, mk(2, 0), mk(7, 0))
    assert np.isclose(float(ov), 0.5, atol=1e-5)
    # src inside tgt -> len_src/len_tgt
    ov = g.segment_overlap_2d(p1, p2, mk(-5, 0), mk(15, 0))
    assert np.isclose(float(ov), 0.5, atol=1e-5)
    # disjoint -> 0
    ov = g.segment_overlap_2d(p1, p2, mk(11, 0), mk(20, 0))
    assert float(ov) == 0.0
    # partial overlap: q1 inside src (reference case 3,
    # cudawrapper.cu:227-237): q=(5,0)..(15,0): q1_in true, src_p1 NOT in
    # (q1,q2) -> else-branch: dist(q1, src_p2) / |src_p1 - q2| = 5/15
    ov = g.segment_overlap_2d(p1, p2, mk(5, 0), mk(15, 0))
    assert np.isclose(float(ov), 1.0 / 3.0, atol=1e-5)
    # mirrored: q2 inside src (case 4): q=(-5,0)..(5,0): q2_in, src_p2 not in
    # q -> else-branch: dist(q2, src_p1) / |src_p2 - q1| = 5/15
    ov = g.segment_overlap_2d(p1, p2, mk(-5, 0), mk(5, 0))
    assert np.isclose(float(ov), 1.0 / 3.0, atol=1e-5)


def test_fundamental_epipolar_constraint():
    syn = make_scene(num_views=4)
    cams = syn.cameras
    # project a 3D point into views 0 and 1; epipolar constraint x2^T F x1 = 0
    X = np.array([0.2, -0.1, 0.3])
    def proj(v):
        x = cams.K[v] @ (cams.R[v] @ X + cams.t[v])
        return x / x[2]
    x1, x2 = proj(0), proj(1)
    F = cams.fundamental(0, 1)
    val = x2 @ F @ x1
    scale = np.abs(F).max()
    assert abs(val) / scale < 1e-6


def test_triangulation_depths_exact():
    syn = make_scene(num_views=4)
    cams = syn.cameras
    X = np.array([0.25, 0.1, -0.2])
    def pix(v):
        x = cams.K[v] @ (cams.R[v] @ X + cams.t[v])
        return np.array([x[0] / x[2], x[1] / x[2], 1.0])
    p0, p1 = pix(0), pix(1)
    d0, d1, valid = g.triangulation_depths(
        jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32),
        jnp.asarray(cams.C[0], jnp.float32), jnp.asarray(cams.C[1], jnp.float32),
        jnp.asarray(cams.RtKinv[0], jnp.float32),
        jnp.asarray(cams.RtKinv[1], jnp.float32))
    assert bool(valid)
    # depth along normalized ray = euclidean distance from camera center
    assert np.isclose(float(d0), np.linalg.norm(X - cams.C[0]), rtol=1e-3)
    assert np.isclose(float(d1), np.linalg.norm(X - cams.C[1]), rtol=1e-3)
    # unproject back
    P = g.unproject(jnp.asarray(p0, jnp.float32),
                    jnp.asarray(cams.C[0], jnp.float32), d0,
                    jnp.asarray(cams.RtKinv[0], jnp.float32))
    np.testing.assert_allclose(np.asarray(P), X, atol=1e-3)


def test_project_matches_camera():
    syn = make_scene(num_views=4)
    cams = syn.cameras
    X = np.array([0.1, 0.4, 0.0])
    pix, valid = g.project(jnp.asarray(X, jnp.float32),
                           jnp.asarray(cams.P[2], jnp.float32))
    x = cams.K[2] @ (cams.R[2] @ X + cams.t[2])
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(pix)[:2], (x / x[2])[:2], rtol=1e-4)


# ---------------------------------------------------------------------------
# property tests: invariants over random camera rigs (hypothesis)
# ---------------------------------------------------------------------------
from hypothesis import given, settings, strategies as st


def _random_rig(seed):
    rng = np.random.RandomState(seed)
    f = rng.uniform(300, 2000)
    K = np.array([[f, 0, rng.uniform(200, 1000)],
                  [0, f, rng.uniform(150, 800)],
                  [0, 0, 1.0]])
    def rot():
        q = rng.randn(4); q /= np.linalg.norm(q)
        w, x, y, z = q
        return np.array([
            [1 - 2*(y*y + z*z), 2*(x*y - z*w), 2*(x*z + y*w)],
            [2*(x*y + z*w), 1 - 2*(x*x + z*z), 2*(y*z - x*w)],
            [2*(x*z - y*w), 2*(y*z + x*w), 1 - 2*(x*x + y*y)]])
    R1, R2 = rot(), rot()
    t1, t2 = rng.randn(3), rng.randn(3)
    return K, R1, t1, R2, t2, rng


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10**6))
def test_fundamental_epipolar_property(seed):
    """x2^T F x1 = 0 for every 3D point visible in both random cameras
    (fundamental_from_rt, line3D.cc:1968-1993)."""
    K, R1, t1, R2, t2, rng = _random_rig(seed)
    F = np.asarray(g.fundamental_from_rt(K, R1, t1, K, R2, t2))
    for _ in range(5):
        X = rng.randn(3) * 2
        x1 = K @ (R1 @ X + t1)
        x2 = K @ (R2 @ X + t2)
        if abs(x1[2]) < 1e-3 or abs(x2[2]) < 1e-3:
            continue
        x1 /= x1[2]; x2 /= x2[2]
        # residual is scale-dependent; normalize by the line magnitude
        l = F @ x1
        den = np.hypot(l[0], l[1])
        if den < 1e-9:
            continue
        assert abs(x2 @ l) / den < 1e-6 * max(1, np.abs(x2).max())


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10**6))
def test_unproject_project_roundtrip_property(seed):
    """project(unproject(p, depth)) == p for random pixels and depths."""
    K, R1, t1, _, _, rng = _random_rig(seed)
    RtKinv = R1.T @ np.linalg.inv(K)
    C = -R1.T @ t1
    Pmat = K @ np.concatenate([R1, t1[:, None]], axis=1)
    p = np.array([rng.uniform(0, 1200), rng.uniform(0, 900), 1.0])
    depth = rng.uniform(0.1, 50)
    X = np.asarray(g.unproject(jnp.asarray(p), jnp.asarray(C),
                               jnp.asarray(depth), jnp.asarray(RtKinv)))
    q, ok = g.project(jnp.asarray(X), jnp.asarray(Pmat))
    q = np.asarray(q)
    assert bool(np.asarray(ok))
    np.testing.assert_allclose(q[:2], p[:2], rtol=2e-4, atol=2e-3)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10**6))
def test_triangulation_depth_property(seed):
    """Two rays through the projections of a common 3D point triangulate to
    the true depths (D_get_triangulation_depth, cudawrapper.cu:306-335)."""
    K, R1, t1, R2, t2, rng = _random_rig(seed)
    C1, C2 = -R1.T @ t1, -R2.T @ t2
    if np.linalg.norm(C1 - C2) < 0.3:
        return                        # near-zero baseline: ill-posed
    X = rng.randn(3) * 2
    x1 = K @ (R1 @ X + t1)
    x2 = K @ (R2 @ X + t2)
    if x1[2] < 0.2 or x2[2] < 0.2:
        return                        # behind a camera
    p1 = x1 / x1[2]
    p2 = x2 / x2[2]
    M1 = R1.T @ np.linalg.inv(K)
    M2 = R2.T @ np.linalg.inv(K)
    d1, d2, ok = g.triangulation_depths(
        jnp.asarray(p1, jnp.float32)[None],
        jnp.asarray(p2, jnp.float32)[None],
        jnp.asarray(C1, jnp.float32), jnp.asarray(C2, jnp.float32),
        jnp.asarray(M1, jnp.float32), jnp.asarray(M2, jnp.float32))
    if not bool(np.asarray(ok)[0]):
        return                        # near-parallel rays
    true1 = np.linalg.norm(X - C1)
    true2 = np.linalg.norm(X - C2)
    scale = max(true1, true2, 1.0)
    assert abs(float(d1[0]) - true1) < 2e-2 * scale
    assert abs(float(d2[0]) - true2) < 2e-2 * scale
