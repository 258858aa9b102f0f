"""Batched 3D line refinement (line-bundle-adjustment).

An additive capability beyond the reference (BASELINE.json north star): each
clustered 3D line is refined by minimizing the reprojection error of its
member 2D segments — the perpendicular distances of the member segment
endpoints to the projected 3D line in their own views — with a damped
Gauss-Newton loop, batched over all clusters at once.

Parameterization (4 DoF per line): base point offsets in the plane normal
to the direction (2) + direction tangent updates (2); the line is
(P0 + a u1 + b u2,  normalize(d + c u1 + e u2)) with (u1, u2) an
orthonormal basis of d's normal plane.

Runs in float64 numpy (host): clusters are few (thousands) and small
(tens of members), and double precision matters for the normal equations.
All clusters are refined simultaneously via [C, M]-padded arrays.
"""
from __future__ import annotations

import numpy as np


def _orthobasis(d: np.ndarray):
    """[C, 3] unit dirs -> two [C, 3] orthonormal normal-plane vectors."""
    ref = np.where(np.abs(d[:, 0:1]) < 0.9,
                   np.tile([1.0, 0, 0], (len(d), 1)),
                   np.tile([0, 1.0, 0], (len(d), 1)))
    u1 = np.cross(d, ref)
    u1 /= np.linalg.norm(u1, axis=1, keepdims=True)
    u2 = np.cross(d, u1)
    return u1, u2


def _residuals(P0, d, Pm, p1, p2, mask):
    """Perpendicular reprojection residuals.

    P0, d: [C, 3]; Pm: [C, M, 3, 4] member projection matrices;
    p1, p2: [C, M, 2] member 2D endpoints; mask: [C, M].
    Returns [C, M, 2] residuals (distance of each endpoint to the projected
    line) with masked entries zeroed, plus a validity mask.
    """
    Xa = np.concatenate([P0, np.ones((len(P0), 1))], axis=1)       # [C, 4]
    Xb = np.concatenate([P0 + d, np.ones((len(P0), 1))], axis=1)
    xa = np.einsum("cmij,cj->cmi", Pm, Xa)                         # [C, M, 3]
    xb = np.einsum("cmij,cj->cmi", Pm, Xb)
    # projected 2D line through the two image points
    l = np.cross(xa, xb)                                           # [C, M, 3]
    den = np.sqrt(l[..., 0] ** 2 + l[..., 1] ** 2)
    ok = (np.abs(xa[..., 2]) > 1e-12) & (np.abs(xb[..., 2]) > 1e-12) & \
         (den > 1e-12) & mask
    den = np.maximum(den, 1e-12)
    r1 = (l[..., 0] * p1[..., 0] + l[..., 1] * p1[..., 1] + l[..., 2]) / den
    r2 = (l[..., 0] * p2[..., 0] + l[..., 1] * p2[..., 1] + l[..., 2]) / den
    r = np.stack([r1, r2], axis=-1)
    return np.where(ok[..., None], r, 0.0), ok


def refine_lines(P0, d, Pm, p1, p2, mask, iterations: int = 5,
                 huber_delta: float = 2.0, damping: float = 1e-6):
    """Refine [C] lines given padded member data.  Returns (P0', d', rms
    before, rms after)."""
    P0 = np.asarray(P0, np.float64).copy()
    d = np.asarray(d, np.float64).copy()
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    C = len(P0)
    n_res = np.maximum(mask.sum(axis=1) * 2, 1)

    def rms(P0_, d_):
        r, ok = _residuals(P0_, d_, Pm, p1, p2, mask)
        return np.sqrt((r ** 2).sum(axis=(1, 2)) / n_res)

    rms_before = rms(P0, d)

    eps = 1e-6
    for _ in range(iterations):
        u1, u2 = _orthobasis(d)
        r0, ok = _residuals(P0, d, Pm, p1, p2, mask)

        # numeric Jacobian over the 4 tangent parameters
        J = np.zeros(r0.shape + (4,))
        deltas = [(u1, None), (u2, None), (None, u1), (None, u2)]
        for k, (dp, dd) in enumerate(deltas):
            P0p = P0 + eps * dp if dp is not None else P0
            dpn = d + eps * dd if dd is not None else d
            if dd is not None:
                dpn = dpn / np.linalg.norm(dpn, axis=1, keepdims=True)
            rp, _ = _residuals(P0p, dpn, Pm, p1, p2, mask)
            J[..., k] = (rp - r0) / eps

        # Huber weights
        absr = np.abs(r0)
        w = np.where(absr <= huber_delta, 1.0,
                     np.sqrt(huber_delta / np.maximum(absr, 1e-12)))
        w = np.where(ok[..., None], w, 0.0)

        Jw = J * w[..., None]
        rw = r0 * w
        # normal equations per cluster: [C, 4, 4] and [C, 4]
        Jf = Jw.reshape(C, -1, 4)
        rf = rw.reshape(C, -1)
        H = np.einsum("cik,cil->ckl", Jf, Jf)
        g = np.einsum("cik,ci->ck", Jf, rf)
        H += damping * np.eye(4)[None] * \
            np.maximum(np.trace(H, axis1=1, axis2=2), 1.0)[:, None, None]
        try:
            step = np.linalg.solve(H, -g[..., None])[..., 0]
        except np.linalg.LinAlgError:
            break

        P0_new = P0 + step[:, 0:1] * u1 + step[:, 1:2] * u2
        d_new = d + step[:, 2:3] * u1 + step[:, 3:4] * u2
        d_new /= np.linalg.norm(d_new, axis=1, keepdims=True)

        # accept per cluster only if rms improves (r0 was computed at the
        # current (P0, d), so rms_old comes for free)
        rms_old = np.sqrt((r0 ** 2).sum(axis=(1, 2)) / n_res)
        rms_new = rms(P0_new, d_new)
        better = (rms_new < rms_old)[:, None]
        P0 = np.where(better, P0_new, P0)
        d = np.where(better, d_new, d)

    return P0, d, rms_before, rms(P0, d)


def build_cluster_member_data(member_views, member_segs, scene_segments,
                              P_f64):
    """Pad per-cluster member (view, seg) lists into [C, M] arrays.

    member_views/member_segs: list of per-cluster int arrays.
    scene_segments: [V, S, 4]; P_f64: [V, 3, 4] projection matrices
    (conditioned space, float64).
    Returns (Pm [C, M, 3, 4], p1 [C, M, 2], p2 [C, M, 2], mask [C, M]).
    """
    C = len(member_views)
    M = max((len(v) for v in member_views), default=1)
    Pm = np.zeros((C, M, 3, 4))
    p1 = np.zeros((C, M, 2))
    p2 = np.zeros((C, M, 2))
    mask = np.zeros((C, M), bool)
    for c, (vs, ss) in enumerate(zip(member_views, member_segs)):
        k = len(vs)
        Pm[c, :k] = P_f64[vs]
        coords = scene_segments[vs, ss]
        p1[c, :k] = coords[:, 0:2]
        p2[c, :k] = coords[:, 2:4]
        mask[c, :k] = True
    return Pm, p1, p2, mask
