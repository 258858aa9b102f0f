"""Scene container: fixed-shape, padded segment storage for all views.

The reference keeps per-view std::maps and per-view DataArrays
(line3D.h:104-154, segments.h:48-132); the TPU build replaces those with one
padded tensor per quantity plus validity masks so every stage is a fixed-shape
batched array program.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .config import L3DConfig, DEFAULT_CONFIG
from .core.cameras import CameraSet


def stable_segment_bucket(n: int, config) -> int:
    """Padded segment-axis size under stable shapes: the smallest of
    {cap/4, cap/2, cap} (cap = config.max_num_segments) that holds n.

    One fixed size (the old behavior: always cap) makes every scene pay
    the 3072^2 pair grids even when images carry a few hundred segments;
    three buckets keep executables reusable across scenes of similar
    density while the device work tracks the scene.  Scenes beyond cap
    (library users bypassing the detector cap) keep their actual size.
    """
    cap = config.max_num_segments
    for div in (4, 2, 1):
        b = pad_to(-(-cap // div), config.pad_multiple)
        if n <= b:
            return b
    return n


def pad_to(n: int, multiple: int) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


@dataclasses.dataclass
class Scene:
    """All per-view data in dense padded arrays.

    segments:  [V, S, 4] float32 (x1,y1,x2,y2) in original pixel coords,
               conditioned-space independent (2D only).
    seg_mask:  [V, S] bool — valid segment slots.
    seg_count: [V] int32.
    cameras:   CameraSet (float64 host).
    wp_lists:  list of per-view worldpoint-id arrays (ragged, host only).
    collin:    list of per-view sparse collinearity maps
               (dict seg_id -> dict seg_id -> weight), like
               L3DSegments::collinearities (segments.h:115-117); None if
               collinearity is disabled.
    """
    segments: np.ndarray
    seg_mask: np.ndarray
    seg_count: np.ndarray
    cameras: CameraSet
    wp_lists: list | None = None
    collin: list | None = None
    config: L3DConfig = dataclasses.field(default_factory=lambda: DEFAULT_CONFIG)

    @property
    def num_views(self) -> int:
        return self.segments.shape[0]

    @property
    def max_segments(self) -> int:
        return self.segments.shape[1]

    @staticmethod
    def from_ragged(segment_lists: list, cameras: CameraSet,
                    wp_lists=None, collin=None,
                    config: L3DConfig = DEFAULT_CONFIG,
                    segment_axis: int | None = None) -> "Scene":
        """Build a padded Scene from per-view [S_v, 4] segment arrays.

        `segment_axis` overrides the bucket choice when it holds the data —
        the pipeline passes an already-warm bucket here so a scene never
        pays a fresh device compile just to use a tighter shape."""
        V = len(segment_lists)
        counts = np.array([len(s) for s in segment_lists], np.int32)
        S = int(counts.max()) if V else 1
        if segment_axis is not None and segment_axis >= S:
            S = segment_axis
        elif config.stable_shapes:
            S = stable_segment_bucket(S, config)
        S = pad_to(S, config.pad_multiple)
        segs = np.zeros((V, S, 4), np.float32)
        mask = np.zeros((V, S), bool)
        for v, s in enumerate(segment_lists):
            s = np.asarray(s, np.float32).reshape(-1, 4)
            segs[v, :len(s)] = s
            mask[v, :len(s)] = True
        return Scene(segments=segs, seg_mask=mask, seg_count=counts,
                     cameras=cameras, wp_lists=wp_lists, collin=collin,
                     config=config)


# ----------------------------------------------------------------------
def view_similarities_from_worldpoints(wp_lists: list, num_views: int):
    """Pairwise view similarity from shared worldpoints.

    sim(v, n) = 2 |wps_v ∩ wps_n| / (|wps_v'| + |wps_n'|) where |wps'| counts
    only worldpoints seen by >= 2 other views that share a point with it —
    mirroring processWorldpointList + findVisualNeighbors
    (line3D.cc:1874-1935, 476-501): num_wps_[v] is incremented once per
    worldpoint that already had >= 2 views when v observed it, plus once for
    each of v's points when a third view arrives.

    Returns ([V, V] float64 similarity matrix, [V] effective wp counts).
    The reference's incremental bookkeeping is equivalent to: for each
    worldpoint seen by k >= 3 views (in insertion order v1, v2, ... vk), every
    view in the list gets +1 except... — in fact tracing the code: when the
    3rd view arrives, v1 and v2 each get +1 (the "new 3-view worldpoint"
    branch) and the 3rd gets +1 (the ">=2 existing" branch); every later view
    also gets +1.  So num_wps_[v] = #worldpoints of v seen by >= 3 views
    total.  common_wps_[v][n] counts worldpoints seen by both v and n,
    counted once per (unordered pair, worldpoint) when the *later* of the two
    observes it with >= 2 existing views — i.e. every shared worldpoint that
    is seen by >= 3 views in total, plus shared points where one of the two
    was among the first two observers... Careful: the pair (v1, v2) for a
    2-view point is only counted when a 3rd view arrives.  For a point with
    views v1..vk (k >= 3), every unordered pair among v1..vk is counted
    exactly once.  For k == 2, nothing is counted.  Hence:

        common(v, n) = #worldpoints seen by both v and n and by >= 3 views
        num_wps(v)   = #worldpoints seen by v and by >= 3 views in total

    which is what this function computes directly.
    """
    from collections import defaultdict
    wp_views = defaultdict(list)
    for v in range(num_views):
        if wp_lists[v] is None:
            continue
        seen = set()
        for w in wp_lists[v]:
            # reference uses map<viewID,bool>: duplicates collapse
            if w not in seen:
                seen.add(w)
                wp_views[w].append(v)

    num_wps = np.zeros(num_views, np.int64)
    common = np.zeros((num_views, num_views), np.int64)
    for w, views in wp_views.items():
        if len(views) < 3:
            continue
        views = np.array(sorted(set(views)))
        num_wps[views] += 1
        common[np.ix_(views, views)] += 1
    np.fill_diagonal(common, 0)

    denom = num_wps[:, None] + num_wps[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = np.where(denom > 0, 2.0 * common / denom, 0.0)
    return sim, num_wps


def find_visual_neighbors(sim: np.ndarray, baselines: np.ndarray,
                          min_baseline: float, max_neighbors: int,
                          eps: float = 1e-12, ext_ids=None) -> list:
    """Greedy visual-neighbor selection per view.

    Mirrors findVisualNeighbors (line3D.cc:503-548): iterate candidates in
    ascending view-id order (std::map), accept a candidate iff its baseline to
    the source AND to every previously-accepted neighbor exceeds min_baseline;
    then keep the top `max_neighbors` by similarity (stable sort, list order =
    id order for ties).

    The accept loop and similarity tie-breaks are order-dependent;
    `ext_ids` supplies the external image ids so candidates iterate in
    ascending EXTERNAL id (the reference's std::map order) even when views
    were registered out of id order.  Default: internal order (dense ids).

    Returns per-view sorted (ascending internal id) numpy arrays of
    neighbor ids.
    """
    V = sim.shape[0]
    cand_order = range(V) if ext_ids is None else         np.argsort(np.asarray(ext_ids), kind="stable").tolist()
    out = []
    for v in range(V):
        accepted = []
        for n in cand_order:
            if n == v or sim[v, n] <= eps:
                continue
            if baselines[v, n] <= min_baseline:
                continue
            ok = all(baselines[m, n] > min_baseline for m in accepted)
            if ok:
                accepted.append(n)
        if accepted:
            accepted = np.array(accepted)
            order = np.argsort(-sim[v, accepted], kind="stable")
            accepted = accepted[order]
            if max_neighbors > 0 and len(accepted) > max_neighbors:
                accepted = accepted[:max_neighbors]
            out.append(np.sort(accepted))
        else:
            out.append(np.zeros(0, np.int64))
    return out
