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
                     P_cond: np.ndarray | None = None,
                     mesh=None, cameras=None,
                     out_info: dict | None = None) -> list:
    """Turn cluster labels into FinalLine3D results.

    With refine=True (an additive capability beyond the reference), each
    cluster's 3D line is bundle-adjusted against its member 2D segments
    (fit.refine) before the sweep, and the emitted endpoints are snapped
    onto the refined line; requires scene_segments [V,S,4] and the
    conditioned-space projection matrices P_cond [V,3,4] (float64).

    The default path is the batched formulation (one pass of grouped
    numpy + batched SVD + one native sweep call — ~10x the per-cluster
    loop at 100k-cluster scale); the loop path below is the semantic
    reference, the refine path, and the no-native fallback
    (equivalence: tests/test_fit.py).
    """
    if graph.num_nodes == 0:
        return []
    lib = native_load.get_lib()
    if lib is not None and hasattr(lib, "sweep_events_batched") \
            and not refine:
        return _process_clusters_batched(lib, graph, labels, best,
                                         transform, config, max_segments,
                                         verbose)
    return _process_clusters_loop(graph, labels, best, transform, config,
                                  max_segments, verbose, refine,
                                  scene_segments, P_cond, mesh=mesh,
                                  cameras=cameras, out_info=out_info)


def _process_clusters_loop(graph, labels, best, transform, config,
                           max_segments, verbose=False, refine=False,
                           scene_segments=None, P_cond=None,
                           mesh=None, cameras=None,
                           out_info: dict | None = None) -> list:
    """Per-cluster loop (processClusteredSegments, line3D.cc:1306-1368)."""

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
        if getattr(config, "bundle_adjust_cameras", False) \
                and cameras is not None:
            # joint camera + line BA (fit/bundle.py): line blocks Schur-
            # eliminated, the reduced camera system psum'd over the mesh
            from . import bundle as bundle_mod
            vb, p1b, p2b, mb = bundle_mod.build_bundle_member_data(
                mviews, msegs, scene_segments)
            P0r, dr, Rf, tf, ba_b, ba_a = bundle_mod.bundle_adjust(
                np.stack(P0s), np.stack(ds),
                cameras.K, cameras.R, cameras.t, vb, p1b, p2b, mb,
                iterations=config.bundle_iterations, mesh=mesh)
            if out_info is not None:
                out_info.update(ba_rms_before=float(ba_b),
                                ba_rms_after=float(ba_a),
                                R_cond=Rf, t_cond=tf)
            if verbose:
                print(f"[L3D] bundle adjustment: rms {ba_b:.3f} -> "
                      f"{ba_a:.3f} px over {len(kept)} lines + "
                      f"{len(cameras.K)} cameras")
        else:
            Pm, p1, p2, mask = refine_mod.build_cluster_member_data(
                mviews, msegs, scene_segments, P_cond)
            kw = {}
            refine_fn = refine_mod.refine_lines
            if refine_mod.resolve_backend(config) == "device":
                refine_fn = refine_mod.refine_lines_device
                if mesh is not None:
                    kw["mesh"] = mesh   # shard the cluster axis
            P0r, dr, rms_b, rms_a = refine_fn(
                np.stack(P0s), np.stack(ds), Pm, p1, p2, mask,
                iterations=config.refine_iterations, **kw)
            if verbose:
                print(f"[L3D] refinement: median rms "
                      f"{np.median(rms_b):.3f} -> "
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


def _process_clusters_batched(lib, graph, labels, best, transform, config,
                              max_segments, verbose=False) -> list:
    """Batched twin of _process_clusters_loop: same member ordering
    (ascending (view, seg) within ascending cluster label), same fit, same
    extremal-point and sweep semantics, evaluated with grouped numpy
    reductions, one batched 3x3 SVD, and a single native sweep call."""
    key_node = graph.node_view.astype(np.int64) * max_segments + \
        graph.node_seg.astype(np.int64)
    key_best = best.view.astype(np.int64) * max_segments + \
        best.seg.astype(np.int64)
    lookup = np.full(int(max(key_node.max(), key_best.max())) + 1, -1,
                     np.int64)
    lookup[key_best] = np.arange(best.view.size)
    node_rows = lookup[key_node]

    # sorted member stream: ascending cluster label, then (view, seg)
    order = np.lexsort((graph.node_seg, graph.node_view, labels))
    lab_s = labels[order]
    n = len(order)
    newc = np.empty(n, bool)
    newc[0] = True
    newc[1:] = lab_s[1:] != lab_s[:-1]
    cstart = np.flatnonzero(newc)
    csize = np.diff(np.append(cstart, n))
    num_clusters_total = len(cstart)

    # distinct cameras per cluster: view-change count within the
    # (label, view)-sorted stream (line3D.cc:1334)
    views_s = graph.node_view[order]
    vchange = np.empty(n, bool)
    vchange[0] = True
    vchange[1:] = (views_s[1:] != views_s[:-1]) | newc[1:]
    ncams = np.add.reduceat(vchange.astype(np.int64), cstart)
    keepc = ncams >= config.min_cameras_per_cluster
    if not keepc.any():
        if verbose:
            print(f"[L3D] #clusters_total: {num_clusters_total}  "
                  f"#clusters_valid: 0")
        return []

    members = order[np.repeat(keepc, csize)]
    sizes = csize[keepc]
    C = len(sizes)
    ptr = np.concatenate([[0], np.cumsum(sizes)])
    cid_m = np.repeat(np.arange(C), sizes)

    rows = node_rows[members]
    P1 = transform.inverse_transform_points(best.P1[rows])
    P2 = transform.inverse_transform_points(best.P2[rows])
    n_tot = len(rows)
    pts = np.empty((2 * n_tot, 3))
    pts[0::2] = P1
    pts[1::2] = P2
    cid_e = np.repeat(cid_m, 2)
    eptr = 2 * ptr
    esizes = 2 * sizes
    local_m = np.arange(n_tot) - np.repeat(ptr[:-1], sizes)
    seg_e = np.repeat(local_m, 2)
    cam_e = np.repeat(graph.node_view[members].astype(np.int64), 2)

    # --- per-cluster line fit (getLineEquation3D, line3D.cc:1392-1451) --
    mean = np.add.reduceat(pts, eptr[:-1], axis=0) / esizes[:, None]
    X = pts - mean[cid_e]
    scat = np.empty((C, 3, 3))
    for i in range(3):
        for j in range(i, 3):
            s = np.add.reduceat(X[:, i] * X[:, j], eptr[:-1])
            scat[:, i, j] = s
            scat[:, j, i] = s
    U, S, _ = np.linalg.svd(scat)
    dirv = np.take_along_axis(
        U, np.argmax(S, axis=1)[:, None, None], axis=2)[:, :, 0]
    nrm = np.linalg.norm(dirv, axis=1, keepdims=True)
    dirv = np.where(nrm > 0, dirv / np.where(nrm > 0, nrm, 1.0),
                    np.array([1.0, 0.0, 0.0]))

    # --- extremal point + event order (projectToLine, line3D.cc:1479+) --
    de = dirv[cid_e]
    t = np.einsum("ij,ij->i", pts - mean[cid_e], de)
    proj = mean[cid_e] + t[:, None] * de
    loc = np.einsum("ij,ij->i", mean[cid_e] - proj, de)

    m = np.minimum.reduceat(loc, eptr[:-1])
    has = m <= 0.0                     # initial min_length is 0
    is_min = loc == m[cid_e]
    winner = np.full(C, -1, np.int64)
    idx = np.flatnonzero(is_min)
    np.maximum.at(winner, cid_e[idx], idx)   # ties -> later event wins
    min_point = np.zeros((C, 3))
    min_point[has] = proj[winner[has]]

    dist = np.linalg.norm(pts - min_point[cid_e], axis=1)
    sort_ord = np.lexsort((dist, cid_e))     # stable within cluster

    so = np.ascontiguousarray(seg_e[sort_ord])
    co = np.ascontiguousarray(cam_e[sort_ord])
    cap = 2 * n_tot
    out_s = np.empty(cap, np.int64)
    out_e = np.empty(cap, np.int64)
    out_c = np.empty(cap, np.int64)
    k = lib.sweep_events_batched(so, co, np.ascontiguousarray(eptr), C,
                                 config.min_cameras_open,
                                 int(co.max(initial=0)), out_s, out_e,
                                 out_c)
    pts_sorted = pts[sort_ord]
    seg3d = np.stack([pts_sorted[out_s[:k]], pts_sorted[out_e[:k]]],
                     axis=1)
    counts = np.bincount(out_c[:k], minlength=C)
    pstart = np.cumsum(counts) - counts

    views_m = graph.node_view[members].astype(np.int32)
    segs_m = graph.node_seg[members].astype(np.int32)
    results = []
    for c in np.flatnonzero(counts):
        results.append(FinalLine3D(
            segments3d=seg3d[pstart[c]:pstart[c] + counts[c]],
            views2d=views_m[ptr[c]:ptr[c + 1]],
            segs2d=segs_m[ptr[c]:ptr[c + 1]]))
    if verbose:
        print(f"[L3D] #clusters_total: {num_clusters_total}  "
              f"#clusters_valid: {len(results)}")
    return results
