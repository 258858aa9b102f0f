"""Per-view 2D segment collinearity.

TPU-native equivalent of K_collinearity (reference: cudawrapper.cu:476-535)
launched from L3DSegments (segments.h:73-101): for every segment pair in one
view, a mutual max endpoint-to-line distance Gaussian (sigma = 2.0,
commons.h:48), kept if > 0.5 (L3D_COLLIN_AFF_T_G) AND the segments do not
overlap along their common direction (all four mutual endpoint dot products
positive).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core import geometry as g


@functools.partial(jax.jit, static_argnames=())
def collinearity_matrix(segs, mask, coll_sigma_sq):
    """Dense [S, S] collinearity scores for one view (0 where not collinear).

    Args:
      segs: [S, 4] float32; mask: [S] bool; coll_sigma_sq: sigma^2 scalar.
    """
    p1, p2 = g.seg_endpoints(segs)
    line = g.line_through(p1, p2)                   # [S, 3]

    # mutual max endpoint-to-line distances (cudawrapper.cu:509-511)
    d_p_on_q = jnp.maximum(
        g.dist_point_line_2d(line[None, :, :], p1[:, None, :]),
        g.dist_point_line_2d(line[None, :, :], p2[:, None, :]))  # [i, j]: i's pts on j's line
    d = jnp.maximum(d_p_on_q, d_p_on_q.T)
    aff = jnp.exp(-d * d / (2.0 * coll_sigma_sq))

    # no-overlap check (cudawrapper.cu:518-528): all mutual dot products
    # positive -> segments lie outside one another along the line
    a1 = p1[:, None, 0:2]
    a2 = p2[:, None, 0:2]
    b1 = p1[None, :, 0:2]
    b2 = p2[None, :, 0:2]
    dot = lambda u, v: jnp.sum(u * v, axis=-1)
    pos1 = dot(b1 - a1, b2 - a1)
    pos2 = dot(b1 - a2, b2 - a2)
    pos3 = dot(a1 - b1, a2 - b1)
    pos4 = dot(a1 - b2, a2 - b2)
    eps = g.EPS
    no_overlap = (pos1 > -eps) & (pos2 > -eps) & (pos3 > -eps) & (pos4 > -eps)

    keep = (aff > 0.5) & no_overlap & mask[:, None] & mask[None, :]
    keep = keep & ~jnp.eye(segs.shape[0], dtype=bool)
    return jnp.where(keep, aff, 0.0)


def collinearity_maps(scene_segments, scene_mask, coll_sigma: float):
    """Sparse per-view collinearity maps for all views.

    Returns a list (len V) of dicts {seg_i: {seg_j: weight}}, matching
    L3DSegments::collinearities (segments.h:115-117).
    """
    V = scene_segments.shape[0]
    out = []
    sig2 = np.float32(coll_sigma * coll_sigma)
    for v in range(V):
        m = np.asarray(collinearity_matrix(
            jnp.asarray(scene_segments[v]), jnp.asarray(scene_mask[v]), sig2))
        ii, jj = np.nonzero(m > 0.0)
        d: dict = {}
        for i, j in zip(ii.tolist(), jj.tolist()):
            d.setdefault(i, {})[j] = float(m[i, j])
        out.append(d)
    return out
