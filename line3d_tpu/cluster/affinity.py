"""Affinity-graph construction over best-match 2D segments.

Replicates clusterSegments2D's edge enumeration (reference:
line3D.cc:968-1221) including its order-dependent `used` deduplication:

For each source segment src with a best match (ascending (view, seg) order):
  A) every potential correspondent tgt (ascending order): if the unordered
     pair is unseen, mark it seen; if tgt also has a best match, the edge
     weight is w = 0.5 (score_src + score_tgt) * sim3D, kept if w > 0.25
     (L3D_MIN_AFFINITY).
  B) for each A-candidate with a best match: its collinear partners tgtc
     (same view as tgt): unseen-pair gate, weight as in A (no collinearity
     factor), kept if w > 0.01.
  C) src's own collinear partners (same view): unseen-pair gate, weight
     multiplied by the collinearity score, kept if w > 0.01.

The pair is marked seen *before* the threshold test (line3D.cc:1001-1004),
so a failed A-edge is never reconsidered as a C-edge — this ordering is
semantic and preserved here.

The per-pair 3D similarity (similarity_coll3D, line3D.cc:1600-1681) is
evaluated vectorized over all candidate pairs after enumeration.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..config import L3DConfig
from ..core.cameras import CameraSet
from ..match.engine import BestMatches


@dataclasses.dataclass
class AffinityGraph:
    edges_i: np.ndarray       # [E] int32 local node ids (both directions)
    edges_j: np.ndarray       # [E] int32
    edges_w: np.ndarray       # [E] float32
    node_view: np.ndarray     # [B] int32: local id -> view
    node_seg: np.ndarray      # [B] int32: local id -> segment
    num_nodes: int


def similarity_coll3d(cams: CameraSet, best: BestMatches,
                      src_rows: np.ndarray, tgt_rows: np.ndarray,
                      sigma_a: float) -> np.ndarray:
    """Vectorized similarity_coll3D (line3D.cc:1600-1681) over row pairs."""
    def p2l(P1, dirv, X):
        # distance_point2line_3D (line3D.cc:1684-1691)
        proj = P1 + np.sum(dirv * (X - P1), axis=1, keepdims=True) * dirv
        return np.linalg.norm(proj - X, axis=1)

    def endpoint_sims(a_rows, b_rows):
        """Gaussian sims of a's endpoints against b's 3D line."""
        P1b = best.P1[b_rows]; dirb = best.dir[b_rows]
        d1 = p2l(P1b, dirb, best.P1[a_rows])
        d2 = p2l(P1b, dirb, best.P2[a_rows])
        va = best.view[a_rows]
        min1 = cams.lower_uncertainty(va, best.d1[a_rows])
        min2 = cams.lower_uncertainty(va, best.d2[a_rows])
        s1sq = cams.uncertainty_sigma_sq(va, best.d1[a_rows])
        s2sq = cams.uncertainty_sigma_sq(va, best.d2[a_rows])
        with np.errstate(divide="ignore", invalid="ignore"):
            e1 = np.exp(-(d1 - min1) ** 2 / (2.0 * s1sq))
            e2 = np.exp(-(d2 - min2) ** 2 / (2.0 * s2sq))
        sim1 = np.where(d1 < min1, 1.0, e1)
        sim2 = np.where(d2 < min2, 1.0, e2)
        return np.minimum(sim1, sim2)

    w12 = endpoint_sims(src_rows, tgt_rows)
    w34 = endpoint_sims(tgt_rows, src_rows)
    w_d = np.minimum(w12, w34)

    dots = np.clip(np.sum(best.dir[src_rows] * best.dir[tgt_rows], axis=1),
                   -1.0, 1.0)
    ang = np.degrees(np.arccos(dots))
    ang = np.where(ang > 90.0, 180.0 - ang, ang)
    w_a = np.exp(-ang * ang / (2.0 * sigma_a * sigma_a))

    sim = np.minimum(w_d, w_a)
    return np.where(sim <= 0.01, 0.0, sim)


def potential_correspondence_lists(matches: list, num_views: int,
                                   max_segments: int):
    """Symmetric adjacency dict: node key -> sorted partner keys.

    Node key = view * max_segments + seg.  Mirrors
    potential_correspondences_ (line3D.cc:861-865) which is filled from the
    *verified* match lists.
    """
    S = max_segments
    pairs = []
    for vm in matches:
        a = vm.view * S + vm.src_seg.astype(np.int64)
        b = vm.tgt_view.astype(np.int64) * S + vm.tgt_seg.astype(np.int64)
        pairs.append(np.stack([a, b], axis=1))
        pairs.append(np.stack([b, a], axis=1))
    if not pairs:
        return {}
    allp = np.unique(np.concatenate(pairs, axis=0), axis=0)
    adj = {}
    keys, starts = np.unique(allp[:, 0], return_index=True)
    starts = np.append(starts, len(allp))
    for k, s, e in zip(keys, starts[:-1], starts[1:]):
        adj[int(k)] = allp[s:e, 1]
    return adj


def _build_affinity_graph_fast(best, adj, row_of, key_of, cams, config,
                               verbose):
    """Fully-vectorized A-candidate path (no collinearity).

    Without collinear candidates the traversal is src ascending x partner
    ascending, so the first visit of an unordered pair (a, b), a < b, is at
    src = a if a has a best match (all sources do), else at src = b.  Hence
    the `used` dedup reduces to: keep (src, tgt) iff src < tgt or tgt has no
    best match (and pairs without a best-match tgt produce no edge anyway).
    Candidate order, weights, thresholds, and node-id assignment match the
    loop path exactly (covered by tests/test_affinity.py).
    """
    # flatten adjacency into arrays in (src_rank, tgt) order
    order = np.argsort(key_of, kind="stable")
    srcs, tgts = [], []
    for r in order:
        partners = adj.get(int(key_of[r]))
        if partners is None:
            continue
        srcs.append(np.full(len(partners), r, np.int64))
        tgts.append(partners)
    if not srcs:
        return AffinityGraph(np.zeros(0, np.int32), np.zeros(0, np.int32),
                             np.zeros(0, np.float32),
                             np.zeros(0, np.int32), np.zeros(0, np.int32), 0)
    src_rows = np.concatenate(srcs)
    tgt_keys = np.concatenate(tgts)

    # partner -> best row.  Edges require BOTH ends to have best matches;
    # such pairs are first visited at the smaller key, so dedup = src < tgt.
    # (Pairs whose smaller end lacks a best match are first visited at the
    # larger end, but they produce no edge regardless.)
    tgt_rows = np.array([row_of.get(int(k), -1) for k in tgt_keys], np.int64)
    src_keys = key_of[src_rows]
    keep = (tgt_rows >= 0) & (src_keys < tgt_keys)
    src_rows = src_rows[keep]
    tgt_rows = tgt_rows[keep]

    sim = similarity_coll3d(cams, best, src_rows, tgt_rows, config.sigma_a)
    w = 0.5 * (best.score[src_rows].astype(np.float64) +
               best.score[tgt_rows].astype(np.float64)) * sim
    passed = w > config.min_affinity
    src_rows, tgt_rows, w = src_rows[passed], tgt_rows[passed], w[passed]

    # node ids in emission order: first occurrence over the interleaved
    # (src, tgt) sequence
    seq = np.empty(2 * len(src_rows), np.int64)
    seq[0::2] = src_rows
    seq[1::2] = tgt_rows
    uniq, first = np.unique(seq, return_index=True)
    id_order = np.argsort(first, kind="stable")
    node_rows = uniq[id_order]
    node_of = np.full(best.view.size, -1, np.int64)
    node_of[node_rows] = np.arange(len(node_rows))

    a = node_of[src_rows]
    b = node_of[tgt_rows]
    E = len(a)
    ei = np.empty(2 * E, np.int32)
    ej = np.empty(2 * E, np.int32)
    ew = np.empty(2 * E, np.float32)
    ei[0::2] = a; ej[0::2] = b
    ei[1::2] = b; ej[1::2] = a
    ew[0::2] = w; ew[1::2] = w

    if verbose:
        print(f"[L3D] A: #num_entries = {len(ei)}")
        print(f"[L3D] A: #num_rows    = {len(node_rows)}")
    return AffinityGraph(
        edges_i=ei, edges_j=ej, edges_w=ew,
        node_view=best.view[node_rows].astype(np.int32),
        node_seg=best.seg[node_rows].astype(np.int32),
        num_nodes=len(node_rows))


def build_affinity_graph(best: BestMatches, matches: list,
                         collin: list | None, cams: CameraSet,
                         config: L3DConfig, max_segments: int,
                         verbose: bool = False) -> AffinityGraph:
    S = max_segments
    B = best.view.size

    key_of = best.view.astype(np.int64) * S + best.seg.astype(np.int64)
    row_of = {int(k): r for r, k in enumerate(key_of)}
    adj = potential_correspondence_lists(matches, cams.num_views, S)

    def collin_partners(view: int, seg: int):
        if collin is None:
            return ()
        m = collin[view].get(seg)
        if not m:
            return ()
        return sorted(m.items())

    if collin is None or all(not c for c in collin):
        return _build_affinity_graph_fast(best, adj, row_of, key_of, cams,
                                          config, verbose)

    # ---- enumeration (exact reference traversal order) -------------------
    used = set()
    cand_src, cand_tgt, cand_kind, cand_cw = [], [], [], []

    def consider(src_key, src_row, tgt_key, kind, cw=1.0):
        pair = (src_key, tgt_key) if src_key < tgt_key else (tgt_key, src_key)
        if pair in used:
            return False
        used.add(pair)
        trow = row_of.get(tgt_key)
        if trow is None:
            return False
        cand_src.append(src_row)
        cand_tgt.append(trow)
        cand_kind.append(kind)
        cand_cw.append(cw)
        return True

    order = np.argsort(key_of, kind="stable")
    for r in order:
        src_key = int(key_of[r])
        sview = int(best.view[r]); sseg = int(best.seg[r])
        for tgt_key in adj.get(src_key, ()):  # sorted ascending
            tgt_key = int(tgt_key)
            consider(src_key, r, tgt_key, 0)
            # B: collinear partners of tgt — only if tgt has a best match
            # (nested inside the best_match_ check, line3D.cc:1007,1065)
            if tgt_key in row_of:
                tview, tseg = divmod(tgt_key, S)
                for cseg, _cw in collin_partners(tview, tseg):
                    consider(src_key, r, tview * S + int(cseg), 1)
        # C: src's own collinear partners
        for cseg, cw in collin_partners(sview, sseg):
            consider(src_key, r, sview * S + int(cseg), 2, float(cw))

    if not cand_src:
        return AffinityGraph(np.zeros(0, np.int32), np.zeros(0, np.int32),
                             np.zeros(0, np.float32),
                             np.zeros(0, np.int32), np.zeros(0, np.int32), 0)

    src_rows = np.asarray(cand_src, np.int64)
    tgt_rows = np.asarray(cand_tgt, np.int64)
    kinds = np.asarray(cand_kind, np.int8)
    cws = np.asarray(cand_cw, np.float64)

    sim = similarity_coll3d(cams, best, src_rows, tgt_rows, config.sigma_a)
    base = 0.5 * (best.score[src_rows].astype(np.float64) +
                  best.score[tgt_rows].astype(np.float64))
    w = np.where(kinds == 2, cws, 1.0) * base * sim
    thr = np.where(kinds == 0, config.min_affinity, config.collinear_affinity)
    keep = w > thr

    # ---- local id assignment in emission order (line3D.cc:1019-1050) -----
    node_of_row = {}
    node_view, node_seg = [], []
    ei, ej, ew = [], [], []

    def node_id(row):
        nid = node_of_row.get(row)
        if nid is None:
            nid = len(node_view)
            node_of_row[row] = nid
            node_view.append(int(best.view[row]))
            node_seg.append(int(best.seg[row]))
        return nid

    for idx in np.nonzero(keep)[0]:
        a = node_id(int(src_rows[idx]))
        b = node_id(int(tgt_rows[idx]))
        wv = float(w[idx])
        ei.append(a); ej.append(b); ew.append(wv)
        ei.append(b); ej.append(a); ew.append(wv)

    if verbose:
        print(f"[L3D] A: #num_entries = {len(ei)}")
        print(f"[L3D] A: #num_rows    = {len(node_view)}")

    return AffinityGraph(
        edges_i=np.asarray(ei, np.int32), edges_j=np.asarray(ej, np.int32),
        edges_w=np.asarray(ew, np.float32),
        node_view=np.asarray(node_view, np.int32),
        node_seg=np.asarray(node_seg, np.int32),
        num_nodes=len(node_view))
