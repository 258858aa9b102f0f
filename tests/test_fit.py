"""Line-fitting stage tests: principal-axis fit and the camera-support sweep."""
import numpy as np

from line3d_tpu.fit import lines


def test_fit_line_direction():
    rng = np.random.default_rng(0)
    d = np.array([1.0, 2.0, -0.5])
    d /= np.linalg.norm(d)
    t = rng.uniform(-3, 3, 40)
    pts = t[:, None] * d + rng.normal(0, 1e-4, (40, 3))
    P, dirv = lines.fit_line_direction(pts)
    assert abs(abs(dirv @ d) - 1.0) < 1e-6
    # centroid on the line
    assert np.linalg.norm(np.cross(P - 0, d)) < 1e-3


def test_sweep_basic():
    """Three overlapping collinear segments from 3 cameras -> one
    sub-segment spanning the triple-overlap region."""
    d = np.array([1.0, 0.0, 0.0])
    # segments [0,10], [2,12], [4,8] from cams 0,1,2
    spans = [(0, 10), (2, 12), (4, 8)]
    pts, segid, camid = [], [], []
    for k, (a, b) in enumerate(spans):
        pts += [a * d, b * d]
        segid += [k, k]
        camid += [k, k]
    segs = lines.sweep_cluster(np.array(pts), np.array(segid),
                               np.array(camid), np.zeros(3), d, min_open=3)
    assert len(segs) == 1
    lo = min(s for s, _ in [(4, 8)])
    got = sorted([segs[0][0][0], segs[0][1][0]])
    assert np.allclose(got, [4.0, 8.0])


def test_sweep_two_cameras_insufficient():
    d = np.array([1.0, 0.0, 0.0])
    pts = np.array([[0, 0, 0], [10, 0, 0], [2, 0, 0], [12, 0, 0]], float)
    segid = np.array([0, 0, 1, 1])
    camid = np.array([0, 0, 1, 1])
    segs = lines.sweep_cluster(pts, segid, camid, np.zeros(3), d, min_open=3)
    assert len(segs) == 0


def test_sweep_same_camera_counts_once():
    """Two segments from the SAME camera only open one camera: per-camera
    open counts (projectToLine, line3D.cc:1569-1582)."""
    d = np.array([1.0, 0.0, 0.0])
    spans = [(0, 10), (2, 12), (4, 8)]
    cams = [0, 0, 1]   # only 2 distinct cameras
    pts, segid, camid = [], [], []
    for k, ((a, b), c) in enumerate(zip(spans, cams)):
        pts += [a * d, b * d]
        segid += [k, k]
        camid += [c, c]
    segs = lines.sweep_cluster(np.array(pts, float), np.array(segid),
                               np.array(camid), np.zeros(3), d, min_open=3)
    assert len(segs) == 0


def test_sweep_multiple_intervals():
    """Disjoint triple-overlap regions emit separate sub-segments."""
    d = np.array([1.0, 0.0, 0.0])
    spans = [(0, 4), (1, 3), (2, 5), (10, 14), (11, 13), (12, 15)]
    cams = [0, 1, 2, 0, 1, 2]
    pts, segid, camid = [], [], []
    for k, ((a, b), c) in enumerate(zip(spans, cams)):
        pts += [a * d, b * d]
        segid += [k, k]
        camid += [c, c]
    segs = lines.sweep_cluster(np.array(pts, float), np.array(segid),
                               np.array(camid), np.zeros(3), d, min_open=3)
    assert len(segs) == 2
    # the sweep runs from the far (+dir) extremal point backwards
    # (projectToLine's min_point has the most-negative loc, line3D.cc:1506-1511)
    got = sorted(sorted([s[0][0], s[1][0]]) for s in segs)
    np.testing.assert_allclose(got, [[2, 3], [12, 13]])


def test_sweep_native_matches_python(monkeypatch):
    from line3d_tpu.native import load as native_load
    if native_load.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(2)
    d = np.array([1.0, 0.0, 0.0])
    pts, segid, camid = [], [], []
    for k in range(20):
        a = rng.uniform(0, 20)
        b = a + rng.uniform(0.5, 8)
        pts += [a * d + rng.normal(0, 1e-3, 3), b * d + rng.normal(0, 1e-3, 3)]
        segid += [k, k]
        camid += [int(rng.integers(0, 6))] * 2
    pts = np.array(pts)
    segid = np.array(segid)
    camid = np.array(camid)
    s_native = lines.sweep_cluster(pts, segid, camid, np.zeros(3), d, 3)
    monkeypatch.setattr(native_load, "get_lib", lambda: None)
    s_python = lines.sweep_cluster(pts, segid, camid, np.zeros(3), d, 3)
    np.testing.assert_allclose(s_native, s_python)


def test_batched_process_clusters_matches_loop():
    """The batched formulation must reproduce the per-cluster loop
    (member order, line fits, extremal-point tie-breaks, sweep output)
    on the full synthetic pipeline graph."""
    import dataclasses as dc

    from synthetic import make_scene
    from line3d_tpu.config import L3DConfig
    from line3d_tpu.core.conditioning import compute_conditioning
    from line3d_tpu.cluster import affinity, fh
    from line3d_tpu.match import engine
    from line3d_tpu.scene import view_similarities_from_worldpoints, \
        find_visual_neighbors
    from line3d_tpu.fit import lines as fit_lines
    from line3d_tpu.native import load as native_load

    lib = native_load.get_lib()
    if lib is None or not hasattr(lib, "sweep_events_batched"):
        import pytest
        pytest.skip("native library unavailable")

    syn = make_scene(num_views=10, noise_px=0.6, seed=2)
    cams = syn.cameras
    cfg = L3DConfig()
    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)
    sim, _ = view_similarities_from_worldpoints(syn.wp_lists,
                                                syn.scene.num_views)
    neighbors = find_visual_neighbors(sim, cams.baselines(),
                                      cfg.min_baseline,
                                      cfg.matching_neighbors)
    matches, best, _ = engine.run_matching(syn.scene, cams, neighbors, cfg)
    S = syn.scene.max_segments
    graph = affinity.build_affinity_graph(best, matches, None, cams, cfg, S)
    labels = fh.fh_cluster(graph.edges_i, graph.edges_j, graph.edges_w,
                           graph.num_nodes, cfg.fh_c)

    res_b = fit_lines._process_clusters_batched(
        lib, graph, labels, best, tr, cfg, S)
    res_l = fit_lines._process_clusters_loop(
        graph, labels, best, tr, cfg, S)

    assert len(res_b) == len(res_l) and len(res_b) > 0
    for rb, rl in zip(res_b, res_l):
        np.testing.assert_array_equal(rb.views2d, rl.views2d)
        np.testing.assert_array_equal(rb.segs2d, rl.segs2d)
        np.testing.assert_allclose(rb.segments3d, rl.segments3d,
                                   rtol=1e-9, atol=1e-12)
