"""Per-cluster 3D line estimation and sub-segment extraction.

Replicates processClusteredSegments / getLineEquation3D / projectToLine
(reference: line3D.cc:1306-1368, 1392-1451, 1479-1597):

  * clusters seen by >= 4 distinct cameras are kept,
  * member hypotheses' 3D endpoints are mapped back to the original
    coordinate frame (inverseTransform),
  * the dominant direction of the endpoint scatter matrix (principal axis
    via SVD) plus the centroid define the cluster's 3D line,
  * endpoints are ordered along the line (distance from the extremal
    projected point) and swept: sub-segments are emitted where >= 3 distinct
    cameras have an open segment.

All host-side float64 (the reference uses Eigen doubles); the sweep loop runs
in the native C++ library when available.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..config import L3DConfig
from ..core.conditioning import SceneTransform
from ..cluster.affinity import AffinityGraph
from ..match.engine import BestMatches
from ..native import load as native_load


@dataclasses.dataclass
class FinalLine3D:
    """One clustered 3D line (L3DFinalLine3D, commons.h:215-238)."""
    segments3d: np.ndarray   # [K, 2, 3] float64 sub-segments along the line
    views2d: np.ndarray      # [B] int32 member 2D segment view ids
    segs2d: np.ndarray       # [B] int32 member 2D segment ids


def fit_line_direction(points: np.ndarray):
    """Centroid + principal axis of an endpoint cloud
    (getLineEquation3D, line3D.cc:1392-1451)."""
    P = points.mean(axis=0)
    X = points - P
    scat = X.T @ X          # = g_points C g_points^T with centering C
    U, S, _ = np.linalg.svd(scat)
    d = U[:, int(np.argmax(S))]
    n = np.linalg.norm(d)
    return P, d / n if n > 0 else np.array([1.0, 0.0, 0.0])


def sweep_cluster(points: np.ndarray, seg_ids: np.ndarray,
                  cam_ids: np.ndarray, line_P: np.ndarray,
                  line_dir: np.ndarray, min_open: int = 3) -> np.ndarray:
    """Order endpoints along the line and emit >=min_open-camera sub-segments.

    points:  [2n, 3] endpoint positions (original, off-line — the reference
             emits the raw endpoints, not their projections,
             line3D.cc:1502-1503,1587-1593)
    seg_ids: [2n] member-segment index of each endpoint
    cam_ids: [2n] camera of each endpoint

    Returns [K, 2, 3] sub-segments.
    """
    dirv = line_dir / np.linalg.norm(line_dir)
    proj = line_P + ((points - line_P) @ dirv)[:, None] * dirv
    loc = (line_P - proj) @ dirv          # signed, as in line3D.cc:1506,1520

    # extremal projected point with most-negative loc; ties -> later event
    # wins (the reference uses <=, line3D.cc:1508-1511), and the initial
    # min_length is 0 so only loc <= 0 candidates can define it
    min_point = np.zeros(3)
    min_len = 0.0
    for e in range(len(points)):
        if loc[e] <= min_len:
            min_len = loc[e]
            min_point = proj[e]

    dist = np.linalg.norm(points - min_point, axis=1)
    order = np.argsort(dist, kind="stable")

    so = seg_ids[order].astype(np.int64)
    co = cam_ids[order].astype(np.int64)

    lib = native_load.get_lib()
    if lib is not None:
        starts = np.zeros(len(order), np.int64)
        ends = np.zeros(len(order), np.int64)
        k = lib.sweep_events(np.ascontiguousarray(so),
                             np.ascontiguousarray(co),
                             len(order), min_open, int(co.max(initial=0)),
                             starts, ends)
        pairs = [(int(starts[i]), int(ends[i])) for i in range(k)]
    else:
        pairs = []
        open_seg: set = set()
        open_cam: dict = {}
        opened = False
        start_e = -1
        for e in range(len(order)):
            s, cam = int(so[e]), int(co[e])
            if s not in open_seg:
                open_seg.add(s)
                open_cam[cam] = open_cam.get(cam, 0) + 1
            else:
                open_seg.discard(s)
                open_cam[cam] -= 1
                if open_cam[cam] == 0:
                    del open_cam[cam]
            if opened and len(open_cam) < min_open:
                pairs.append((start_e, e))
                opened = False
            elif not opened and len(open_cam) >= min_open:
                start_e = e
                opened = True

    pts_sorted = points[order]
    return np.array([[pts_sorted[a], pts_sorted[b]] for a, b in pairs],
                    np.float64).reshape(-1, 2, 3)


def process_clusters(graph: AffinityGraph, labels: np.ndarray,
                     best: BestMatches, transform: SceneTransform,
                     config: L3DConfig, max_segments: int,
                     verbose: bool = False, refine: bool = False,
                     scene_segments: np.ndarray | None = None,
                     P_cond: np.ndarray | None = None) -> list:
    """Turn cluster labels into FinalLine3D results.

    With refine=True (an additive capability beyond the reference), each
    cluster's 3D line is bundle-adjusted against its member 2D segments
    (fit.refine) before the sweep, and the emitted endpoints are snapped
    onto the refined line; requires scene_segments [V,S,4] and the
    conditioned-space projection matrices P_cond [V,3,4] (float64).
    """
    if graph.num_nodes == 0:
        return []

    # best-match row per node
    key_of = best.view.astype(np.int64) * max_segments + best.seg.astype(np.int64)
    row_of = {int(k): r for r, k in enumerate(key_of)}
    node_rows = np.array([row_of[int(v) * max_segments + int(s)]
                          for v, s in zip(graph.node_view, graph.node_seg)],
                         np.int64)

    # group nodes by cluster label, member order = ascending (view, seg)
    # (the reference's maps are ordered by L3DSegment2D, line3D.cc:1311-1321,
    # 1404, 1485)
    order = np.lexsort((graph.node_seg, graph.node_view))
    results = []
    from collections import defaultdict
    members = defaultdict(list)
    for n in order:
        members[int(labels[n])].append(int(n))

    # collect valid clusters (>= min cameras) in label order
    kept = []
    for cl, nodes in sorted(members.items()):
        views = graph.node_view[nodes]
        if len(np.unique(views)) < config.min_cameras_per_cluster:
            continue
        kept.append((np.asarray(nodes), views))

    refined = None
    if refine and kept:
        from . import refine as refine_mod
        # initial fits in CONDITIONED space (better numerics), then
        # batched Gauss-Newton against member 2D segments
        P0s, ds = [], []
        mviews, msegs = [], []
        for nodes, views in kept:
            rows = node_rows[nodes]
            pts_c = np.concatenate([best.P1[rows], best.P2[rows]])
            P0, dv = fit_line_direction(pts_c)
            P0s.append(P0)
            ds.append(dv)
            mviews.append(views)
            msegs.append(graph.node_seg[nodes])
        Pm, p1, p2, mask = refine_mod.build_cluster_member_data(
            mviews, msegs, scene_segments, P_cond)
        P0r, dr, rms_b, rms_a = refine_mod.refine_lines(
            np.stack(P0s), np.stack(ds), Pm, p1, p2, mask)
        if verbose:
            print(f"[L3D] refinement: median rms {np.median(rms_b):.3f} -> "
                  f"{np.median(rms_a):.3f} px over {len(kept)} lines")
        # map refined lines back to the original frame:
        # X = R^T (X'/s - t) => point maps through inverse_transform, and
        # directions map as R^T d (scale cancels under normalization)
        P0r = transform.inverse_transform_points(P0r)
        dr = (dr * transform.scale_inv) @ transform.Rinv.T
        dr /= np.linalg.norm(dr, axis=1, keepdims=True)
        refined = (P0r, dr)

    n_valid = 0
    for ci, (nodes, views) in enumerate(kept):
        # the reference keys members by (view, seg) in a map — duplicates
        # collapse; node ids are unique per (view, seg) already.
        rows = node_rows[nodes]
        P1 = transform.inverse_transform_points(best.P1[rows])
        P2 = transform.inverse_transform_points(best.P2[rows])
        pts = np.empty((2 * len(rows), 3))
        pts[0::2] = P1
        pts[1::2] = P2
        seg_ids = np.repeat(np.arange(len(rows)), 2)
        cam_ids = np.repeat(views, 2)

        if refined is not None:
            lineP, lined = refined[0][ci], refined[1][ci]
            # snap member endpoints onto the refined line before sweeping
            pts = lineP + ((pts - lineP) @ lined)[:, None] * lined
        else:
            lineP, lined = fit_line_direction(pts)
        segs3d = sweep_cluster(pts, seg_ids, cam_ids, lineP, lined,
                               config.min_cameras_open)
        if len(segs3d) > 0:
            results.append(FinalLine3D(
                segments3d=segs3d,
                views2d=views.astype(np.int32),
                segs2d=graph.node_seg[nodes].astype(np.int32)))
            n_valid += 1

    if verbose:
        print(f"[L3D] #clusters_total: {len(members)}  #clusters_valid: {n_valid}")
    return results
