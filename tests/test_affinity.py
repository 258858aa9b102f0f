"""Affinity construction: the vectorized no-collinearity fast path must match
the exact traversal-order loop path."""
import numpy as np

from line3d_tpu.config import L3DConfig
from line3d_tpu.core.conditioning import compute_conditioning
from line3d_tpu.cluster import affinity
from line3d_tpu.match import engine
from line3d_tpu.scene import view_similarities_from_worldpoints, \
    find_visual_neighbors
from synthetic import make_scene


def _graph_fingerprint(g):
    return (g.num_nodes,
            g.node_view.tolist(), g.node_seg.tolist(),
            g.edges_i.tolist(), g.edges_j.tolist(),
            np.round(g.edges_w, 6).tolist())


def test_fast_path_matches_loop_path():
    syn = make_scene(num_views=8)
    cams = syn.cameras
    cfg = L3DConfig(use_collinearity=False)
    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)
    sim, _ = view_similarities_from_worldpoints(syn.wp_lists,
                                                syn.scene.num_views)
    neighbors = find_visual_neighbors(sim, cams.baselines(),
                                      cfg.min_baseline,
                                      cfg.matching_neighbors)
    matches, best, _ = engine.run_matching(syn.scene, cams, neighbors, cfg)
    S = syn.scene.max_segments

    g_fast = affinity.build_affinity_graph(best, matches, None, cams, cfg, S)
    # empty collinearity maps force the loop path with identical candidates
    empty_collin = [dict() for _ in range(syn.scene.num_views)]
    # the loop path triggers only when at least one map is non-empty;
    # plant an entry that can never produce a candidate (segment id beyond
    # any best match)
    empty_collin[0][10 ** 6] = {10 ** 6 + 1: 0.9}
    g_loop = affinity.build_affinity_graph(best, matches, empty_collin,
                                           cams, cfg, S, force_loop=True)
    assert _graph_fingerprint(g_fast) == _graph_fingerprint(g_loop)
    assert g_fast.num_nodes > 10


def test_vectorized_collin_path_matches_loop_path():
    """The vectorized collinearity enumeration (flat candidate stream +
    first-occurrence dedup) must reproduce the exact-order loop enumerator
    edge for edge, node id for node id."""
    from line3d_tpu.match.collinearity import collinearity_maps_fast

    syn = make_scene(num_views=8)
    cams = syn.cameras
    cfg = L3DConfig(use_collinearity=True)
    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)
    sim, _ = view_similarities_from_worldpoints(syn.wp_lists,
                                                syn.scene.num_views)
    neighbors = find_visual_neighbors(sim, cams.baselines(),
                                      cfg.min_baseline,
                                      cfg.matching_neighbors)
    matches, best, _ = engine.run_matching(syn.scene, cams, neighbors, cfg)
    S = syn.scene.max_segments

    # the house wireframe has no truly collinear 2D segments, so plant
    # dense synthetic maps over real segment ids — this exercises the
    # A/B/C interleaving and the order-dependent dedup far harder than
    # real geometry (every best segment gets partners, symmetric entries,
    # mixed weights around both thresholds)
    rng = np.random.default_rng(0)
    V = syn.scene.num_views
    collin = []
    for v in range(V):
        ids = np.nonzero(syn.scene.seg_mask[v])[0]
        d = {}
        for i in ids.tolist():
            partners = rng.choice(ids, size=min(3, len(ids)), replace=False)
            d[i] = {int(j): float(rng.uniform(0.05, 1.0))
                    for j in partners if int(j) != i}
        collin.append(d)
    from line3d_tpu.match.collinearity import CollinMaps
    cm = CollinMaps(collin)
    fv, fi, fj, fw = [], [], [], []
    for v, d in enumerate(collin):
        for i in sorted(d):
            for j in sorted(d[i]):
                fv.append(v); fi.append(i); fj.append(j)
                fw.append(d[i][j])
    cm.flat_view = np.asarray(fv, np.int32)
    cm.flat_i = np.asarray(fi, np.int32)
    cm.flat_j = np.asarray(fj, np.int32)
    cm.flat_w = np.asarray(fw, np.float32)
    collin = cm

    g_vec = affinity.build_affinity_graph(best, matches, collin, cams,
                                          cfg, S)
    g_loop = affinity.build_affinity_graph(best, matches, collin, cams,
                                           cfg, S, force_loop=True)
    assert _graph_fingerprint(g_vec) == _graph_fingerprint(g_loop)
    assert g_vec.num_nodes > 10

    # and with plain dicts (no flat arrays attached) through the CSR
    # fallback
    plain = [dict(d) for d in collin]
    g_plain = affinity.build_affinity_graph(best, matches, plain, cams,
                                            cfg, S)
    assert _graph_fingerprint(g_plain) == _graph_fingerprint(g_loop)


def test_native_enumerator_matches_loop_and_vec(monkeypatch):
    """All three enumerators — loop (semantic reference), numpy stream
    (vec), native C++ (production) — must produce the same graph on a
    collinearity-rich scene.  Native vs loop is bit-identical including
    weights (same double math, native/affinity_enum.cpp); vec differs only
    by libm-vs-numpy exp ulps (covered by the rounded fingerprint)."""
    from line3d_tpu.native import load as native_load
    if native_load.get_lib() is None or \
            not hasattr(native_load.get_lib(), "affinity_enumerate_packed"):
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(5)
    syn = make_scene(num_views=8)
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

    # dense random collinearity maps to exercise the B/C paths + dedup
    collin = []
    for v in range(syn.scene.num_views):
        nseg = int(syn.scene.seg_mask[v].sum())
        d = {}
        for i in range(nseg):
            partners = rng.choice(nseg, size=min(3, nseg), replace=False)
            d[i] = {int(j): float(rng.uniform(0.05, 1.0))
                    for j in partners if int(j) != i}
        collin.append(d)

    g_native = affinity.build_affinity_graph(best, matches, collin, cams,
                                             cfg, S)
    g_loop = affinity.build_affinity_graph(best, matches, collin, cams,
                                           cfg, S, force_loop=True)
    monkeypatch.setattr(native_load, "get_lib", lambda: None)
    g_vec = affinity.build_affinity_graph(best, matches, collin, cams,
                                          cfg, S)
    assert _graph_fingerprint(g_native) == _graph_fingerprint(g_loop)
    assert _graph_fingerprint(g_vec) == _graph_fingerprint(g_loop)
    # native vs loop: identical float64 similarity math, so the weights
    # agree exactly, not just to 6 decimals
    np.testing.assert_array_equal(g_native.edges_w, g_loop.edges_w)
    assert g_native.num_nodes > 10


def test_native_finalize_matches_numpy(monkeypatch):
    """The fused native finalize (affinity_finalize) must produce the SAME
    graph — edges, weights, node order — as the numpy tail on the same
    candidate stream.  Production dispatches to it above
    NATIVE_SIM_THRESHOLD; pinned to 0 here."""
    from line3d_tpu.native import load as native_load
    lib = native_load.get_lib()
    if lib is None or not hasattr(lib, "affinity_finalize"):
        import pytest
        pytest.skip("native library unavailable")

    syn = make_scene(num_views=8)
    cams = syn.cameras
    cfg = L3DConfig()
    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)
    sim, _ = view_similarities_from_worldpoints(syn.wp_lists,
                                                syn.scene.num_views)
    neighbors = find_visual_neighbors(sim, cams.baselines(),
                                      cfg.min_baseline,
                                      cfg.matching_neighbors)
    _, best, _ = engine.run_matching(syn.scene, cams, neighbors, cfg)

    B = best.view.size
    rng = np.random.default_rng(3)
    n = 6000
    src = rng.integers(0, B, size=n).astype(np.int64)
    tgt = rng.integers(0, B, size=n).astype(np.int64)
    bad = src == tgt
    tgt[bad] = (tgt[bad] + 1) % B
    kinds = rng.integers(0, 3, size=n).astype(np.int8)
    cws = rng.uniform(0.05, 1.0, size=n)

    monkeypatch.setattr(affinity, "NATIVE_SIM_THRESHOLD", 0)
    g_nat = affinity._finalize_candidates(best, src, tgt, kinds, cws,
                                          cams, cfg, False)
    monkeypatch.setattr(affinity, "NATIVE_SIM_THRESHOLD", 10 ** 12)
    g_np = affinity._finalize_candidates(best, src, tgt, kinds, cws,
                                         cams, cfg, False)
    assert g_nat.num_nodes == g_np.num_nodes
    np.testing.assert_array_equal(g_nat.edges_i, g_np.edges_i)
    np.testing.assert_array_equal(g_nat.edges_j, g_np.edges_j)
    np.testing.assert_allclose(g_nat.edges_w, g_np.edges_w, rtol=0,
                               atol=1e-7)
    np.testing.assert_array_equal(g_nat.node_view, g_np.node_view)
    np.testing.assert_array_equal(g_nat.node_seg, g_np.node_seg)
    assert len(g_nat.edges_w) > 100


def test_native_similarity_kernel_matches_numpy(monkeypatch):
    """The native OpenMP similarity kernel (affinity_similarity,
    native/affinity_enum.cpp) must agree with the numpy twin on the SAME
    rows.  Production only dispatches to it above NATIVE_SIM_THRESHOLD
    (1000-view scale); the threshold is pinned to 0 here so the small
    test scene exercises the C++ path, then compared against the numpy
    body with the native library hidden."""
    from line3d_tpu.native import load as native_load
    lib = native_load.get_lib()
    if lib is None or not hasattr(lib, "affinity_similarity"):
        import pytest
        pytest.skip("native library unavailable")

    syn = make_scene(num_views=8)
    cams = syn.cameras
    cfg = L3DConfig()
    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)
    sim, _ = view_similarities_from_worldpoints(syn.wp_lists,
                                                syn.scene.num_views)
    neighbors = find_visual_neighbors(sim, cams.baselines(),
                                      cfg.min_baseline,
                                      cfg.matching_neighbors)
    _, best, _ = engine.run_matching(syn.scene, cams, neighbors, cfg)

    B = best.view.size
    assert B > 100
    rng = np.random.default_rng(11)
    src = rng.integers(0, B, size=4096).astype(np.int64)
    tgt = rng.integers(0, B, size=4096).astype(np.int64)

    monkeypatch.setattr(affinity, "NATIVE_SIM_THRESHOLD", 0)
    w_native = affinity.similarity_coll3d(cams, best, src, tgt, cfg.sigma_a)
    monkeypatch.setattr(native_load, "get_lib", lambda: None)
    w_numpy = affinity.similarity_coll3d(cams, best, src, tgt, cfg.sigma_a)
    # same double-precision math; exp() may differ by libm-vs-numpy ulps
    np.testing.assert_allclose(w_native, w_numpy, rtol=0, atol=1e-12)
    assert w_native.max() > 0.5  # the batch must contain non-trivial sims


def test_weights_emit_pieces_match_fused(monkeypatch):
    """The split finalize pieces (_candidate_weights_range over two slices
    + _emit_graph) — the building blocks of the multi-host sharded
    finalize — must reproduce the fused native finalize bit-for-bit on the
    same candidate stream."""
    from line3d_tpu.native import load as native_load
    lib = native_load.get_lib()
    if lib is None or not hasattr(lib, "affinity_weights_range"):
        import pytest
        pytest.skip("native library unavailable")

    syn = make_scene(num_views=8)
    cams = syn.cameras
    cfg = L3DConfig()
    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)
    sim, _ = view_similarities_from_worldpoints(syn.wp_lists,
                                                syn.scene.num_views)
    neighbors = find_visual_neighbors(sim, cams.baselines(),
                                      cfg.min_baseline,
                                      cfg.matching_neighbors)
    _, best, _ = engine.run_matching(syn.scene, cams, neighbors, cfg)

    B = best.view.size
    rng = np.random.default_rng(3)
    n = 6000
    src = rng.integers(0, B, size=n).astype(np.int64)
    tgt = rng.integers(0, B, size=n).astype(np.int64)
    bad = src == tgt
    tgt[bad] = (tgt[bad] + 1) % B
    kinds = rng.integers(0, 3, size=n).astype(np.int8)
    cws = rng.uniform(0.05, 1.0, size=n)

    monkeypatch.setattr(affinity, "NATIVE_SIM_THRESHOLD", 0)
    g_ref = affinity._finalize_candidates(best, src, tgt, kinds, cws,
                                          cams, cfg, False)
    m = n // 3
    w = np.concatenate([
        affinity._candidate_weights_range(best, src, tgt, kinds, cws,
                                          cams, cfg, 0, m),
        affinity._candidate_weights_range(best, src, tgt, kinds, cws,
                                          cams, cfg, m, n)])
    g_pieces = affinity._emit_graph(best, src, tgt, w, False)
    assert g_pieces.num_nodes == g_ref.num_nodes
    np.testing.assert_array_equal(g_pieces.edges_i, g_ref.edges_i)
    np.testing.assert_array_equal(g_pieces.edges_j, g_ref.edges_j)
    np.testing.assert_array_equal(g_pieces.edges_w, g_ref.edges_w)
    np.testing.assert_array_equal(g_pieces.node_view, g_ref.node_view)
    np.testing.assert_array_equal(g_pieces.node_seg, g_ref.node_seg)
    assert len(g_ref.edges_i) > 100
