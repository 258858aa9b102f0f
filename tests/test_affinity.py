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
                                           cams, cfg, S)
    assert _graph_fingerprint(g_fast) == _graph_fingerprint(g_loop)
    assert g_fast.num_nodes > 10
