"""Pallas TPU kernel for multi-view support scoring (match verification).

Same semantics as scoring.score_matches (the XLA formulation of the
reference's K_verify_matches, cudawrapper.cu:614-714), fused into one
VMEM-resident program.  The XLA path materializes dozens of [S, M, M]
support planes to HBM and lowers the camera-indexed gathers to one-hot MXU
contractions; both cost ~10x the arithmetic minimum.  Here every [M, M]
plane lives in vregs/VMEM for the lifetime of one source segment and the
gather ``proj[q, m, cam[m2]]`` is an N-step unrolled masked select (N =
#neighbor cameras ~ 10), so the whole scoring pass is VPU-bound.

Layout per source segment s (grid = (S,)):
  pm_row [16, M]  per-match scalars, m on lanes  (row broadcasts)
  pm_col [M, 16]  the same scalars transposed    (column broadcasts)
  proj   [7, N, M] hypothesis projections of every match into every
                   neighbor camera, m on lanes
  out    [1, M]   confidence per match slot

All [M, M] planes are oriented [m2 (sublanes), m (lanes)]: quantities of
the *supporting* match m2 broadcast as columns, quantities of the *scored*
match m as rows, the per-camera max is a sublane reduction, and the
camera-select gather needs no transposes.

Host-visible API: score_matches_pallas, a drop-in replacement for
scoring.score_matches (equivalence-tested in tests/test_pallas.py).

This is the TPU production path (scoring.score_matches_best dispatch):
~13 ms vs ~24 ms for the XLA formulation at production shape.  Input prep
is deliberately layout-native — all [S, M]-minor elementwise planes, the
camera axis unrolled, and the column-broadcast transpose done in-VMEM
inside the kernel (shipping a transposed [S, M, 16] array pays minor-dim
padding on every HBM load; an einsum emitting [S, N, 3, M] costs ~14 ms
per plane in transposed divide fusions — both profiled).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import geometry as g

EPS = g.EPS

# pm plane slots
_D1, _D2, _CAM, _VALID = 0, 1, 2, 3
_TLX, _TLY, _TLZ, _ITDEN = 4, 5, 6, 7
_Q1X, _Q1Y, _Q2X, _Q2Y = 8, 9, 10, 11
_DIRX, _DIRY, _DIRZ = 12, 13, 14
_PM = 16
# proj plane slots.  The projected-line coefficients arrive PRE-NORMALIZED
# (multiplied by 1/|(plx, ply)|) and carry the projection-ok gate folded in:
# when either endpoint's projection has |z| <= EPS, (PLX, PLY, PLZ) =
# (0, 0, 1e9), which forces db = 1e9 -> dist huge -> conf = 0 with no
# cancellation risk (the q-dependence is killed by the zero coefficients).
# This keeps the per-camera gather at 7 planes instead of 9 (the gather is
# an N-step unrolled masked select over [M, M] planes — its cost is linear
# in the plane count).
_PX1, _PY1, _PX2, _PY2 = 0, 1, 2, 3
_PLX, _PLY, _PLZ = 4, 5, 6
_PJ = 7


def _kernel(params_ref, pm_row_ref, proj_ref, out_ref, *,
            num_cams, m_slots):
    M = m_slots
    f32 = jnp.float32
    inv_sig_p2 = params_ref[0, 0]
    inv_sig_a2 = params_ref[0, 1]
    spatial_k = params_ref[0, 2]
    support_threshold = params_ref[0, 3]

    # column broadcasts come from one in-VMEM [16, M] -> [M, 16] transpose
    # (shipping a transposed [S, M, 16] array would pay minor-dim-16 HBM
    # padding on every load)
    pm_colT = jnp.transpose(pm_row_ref[0], (1, 0))   # [M, 16]

    def col(k):                       # [M, 1] — m2 (supporting match) axis
        return pm_colT[:, k:k + 1]

    def row(k):                       # [1, M] — m (scored match) axis
        return pm_row_ref[0, k:k + 1, :]

    cam_col, valid_col = col(_CAM), col(_VALID)
    cam_row, valid_row = row(_CAM), row(_VALID)

    # camera-select gather: G[q][m2, m] = proj[q, cam[m2], m]
    zero = jnp.zeros((M, M), f32)
    G = [zero] * _PJ
    for n in range(num_cams):
        sel = cam_col == f32(n)                       # [M, 1]
        for q in range(_PJ):
            G[q] = jnp.where(sel, proj_ref[0, q, n:n + 1, :], G[q])

    # mutual endpoint-to-line 2D distances (cudawrapper.cu:668-683)
    da1 = jnp.abs(col(_TLX) * G[_PX1] + col(_TLY) * G[_PY1]
                  + col(_TLZ)) * col(_ITDEN)
    da2 = jnp.abs(col(_TLX) * G[_PX2] + col(_TLY) * G[_PY2]
                  + col(_TLZ)) * col(_ITDEN)
    db1 = jnp.abs(G[_PLX] * col(_Q1X) + G[_PLY] * col(_Q1Y) + G[_PLZ])
    db2 = jnp.abs(G[_PLX] * col(_Q2X) + G[_PLY] * col(_Q2Y) + G[_PLZ])
    dist = jnp.maximum(jnp.maximum(da1, da2), jnp.maximum(db1, db2))
    conf_pos = jnp.exp(-dist * dist * inv_sig_p2)

    # 3D angle term (cudawrapper.cu:405-415); K=3 unrolled on the VPU
    dots = (col(_DIRX) * row(_DIRX) + col(_DIRY) * row(_DIRY)
            + col(_DIRZ) * row(_DIRZ))
    # the >90-degree fold (cudawrapper.cu:414) is acos(|dot|); acos/atan2
    # aren't lowered by Mosaic, so use the Abramowitz & Stegun 4.4.46
    # polynomial for acos on [0, 1] (|err| ~ 2e-8 rad, below f32 ulp here)
    xa = jnp.clip(jnp.abs(dots), 0.0, 1.0)
    poly = f32(-0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        poly = poly * xa + f32(c)
    ang = jnp.degrees(jnp.sqrt(jnp.maximum(1.0 - xa, f32(0))) * poly)
    conf_ang = jnp.exp(-ang * ang * inv_sig_a2)

    # spatial gate: shared source rays => depth-delta test
    # (cudawrapper.cu:387-401)
    dd1 = jnp.abs(row(_D1) - col(_D1))
    dd2 = jnp.abs(row(_D2) - col(_D2))
    gate = (dd1 <= spatial_k * row(_D1)) & \
           (dd2 <= spatial_k * row(_D2))

    iota_m2 = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    # the projection-ok gate is folded into the PL* planes (see slot note)
    pair_ok = ((valid_row > 0.5) & (valid_col > 0.5) & gate
               & (iota_m2 != iota_m))

    conf = jnp.minimum(conf_pos, conf_ang)
    conf = jnp.where(pair_ok & (conf > support_threshold), conf, f32(0))

    # per-camera max over m2 (sublanes), summed over cameras != cam[m]
    total = jnp.zeros((1, M), f32)
    for n in range(num_cams):
        cmax = jnp.max(jnp.where(cam_col == f32(n), conf, f32(0)),
                       axis=0, keepdims=True)
        total = total + jnp.where(cam_row == f32(n), f32(0), cmax)

    out_ref[0, 0:1, :] = jnp.where(valid_row > 0.5, total, f32(0))


@functools.partial(jax.jit, static_argnames=("support_threshold",
                                             "interpret"))
def score_matches_pallas(segs_src, mask_src, RtKinv_src, C_src,
                         cam, tgt, depths, valid,
                         P_nb, segs_nb,
                         sigma_p, sigma_a, spatial_k,
                         support_threshold=0.5,
                         interpret: bool = False):
    """Drop-in Pallas replacement for scoring.score_matches.

    M (the match-slot axis) must be a multiple of 128.  sigma_p / sigma_a /
    spatial_k are baked into the kernel as compile-time constants (they are
    config values, constant across a run).
    """
    S, M = cam.shape
    N = P_nb.shape[0]
    St = segs_nb.shape[1]
    assert M % 128 == 0, M
    f32 = jnp.float32

    p1, p2 = g.seg_endpoints(segs_src)              # [S, 3]
    ray1 = g.ray_dir(RtKinv_src, p1)
    ray2 = g.ray_dir(RtKinv_src, p2)

    # target segment coords per match: [S, M, 4] gather, then elementwise
    # [S, M] planes (no [S, M, 3] minor-dim intermediates)
    cam_s = jnp.maximum(cam, 0)
    flat = cam_s * St + jnp.maximum(tgt, 0)
    tcoords = segs_nb.reshape(N * St, 4)[flat.reshape(-1)].reshape(S, M, 4)
    q1x, q1y = tcoords[..., 0], tcoords[..., 1]
    q2x, q2y = tcoords[..., 2], tcoords[..., 3]
    tlx = q1y - q2y
    tly = q2x - q1x
    tlz = q1x * q2y - q1y * q2x
    itden = 1.0 / jnp.maximum(jnp.sqrt(tlx * tlx + tly * tly), EPS)

    d1 = depths[..., 0]
    d2 = depths[..., 1]
    # hypothesis direction: (C + d2 ray2) - (C + d1 ray1), per component
    dirc = [d2 * ray2[:, i:i + 1] - d1 * ray1[:, i:i + 1] for i in range(3)]
    dnorm = jnp.maximum(jnp.sqrt(dirc[0] ** 2 + dirc[1] ** 2
                                 + dirc[2] ** 2), EPS)
    dirn = [c / dnorm for c in dirc]

    def proj_all(d, ray):
        """Project C_src + d*ray into every neighbor camera.

        Fully elementwise in [S, M] minor layout with the tiny camera axis
        unrolled — an einsum emitting [S, N, 3, M] forces transposed
        divide/select fusions that cost ~14 ms per plane at production
        shape (profiled; see CLAUDE.md landmines).
        """
        comp = [C_src[i] + d * ray[:, i:i + 1] for i in range(3)]  # [S,M]x3
        pxs, pys, oks = [], [], []
        for n in range(N):
            Pn = P_nb[n]
            qx = (Pn[0, 0] * comp[0] + Pn[0, 1] * comp[1]
                  + Pn[0, 2] * comp[2] + Pn[0, 3])
            qy = (Pn[1, 0] * comp[0] + Pn[1, 1] * comp[1]
                  + Pn[1, 2] * comp[2] + Pn[1, 3])
            qz = (Pn[2, 0] * comp[0] + Pn[2, 1] * comp[1]
                  + Pn[2, 2] * comp[2] + Pn[2, 3])
            ok = jnp.abs(qz) > EPS
            zs = jnp.where(ok, qz, 1.0)
            pxs.append(qx / zs)
            pys.append(qy / zs)
            oks.append(ok)
        return (jnp.stack(pxs, axis=1), jnp.stack(pys, axis=1),
                jnp.stack(oks, axis=1))              # [S, N, M] each

    px1, py1, ok1 = proj_all(d1, ray1)
    px2, py2, ok2 = proj_all(d2, ray2)
    pok = ok1 & ok2
    plx = py1 - py2
    ply = px2 - px1
    plz = px1 * py2 - py1 * px2
    ipld = 1.0 / jnp.maximum(jnp.sqrt(plx ** 2 + ply ** 2), EPS)
    # pre-normalize the projected line and fold the projection-ok gate in
    # (see the slot-layout note at the top): 7 gather planes instead of 9
    plx = jnp.where(pok, plx * ipld, 0.0)
    ply = jnp.where(pok, ply * ipld, 0.0)
    plz = jnp.where(pok, plz * ipld, f32(1e9))

    proj = jnp.stack([px1, py1, px2, py2, plx, ply, plz],
                     axis=1)                         # [S, 7, N, M]

    # slot order must match the _D1.._DIRZ indices above
    planes = [d1, d2, cam.astype(f32), valid.astype(f32),
              tlx, tly, tlz, itden,
              q1x, q1y, q2x, q2y,
              dirn[0], dirn[1], dirn[2],
              jnp.zeros((S, M), f32)]
    pm_row = jnp.stack(planes, axis=1)               # [S, 16, M]

    params = jnp.stack([
        1.0 / (2.0 * sigma_p * sigma_p),
        1.0 / (2.0 * sigma_a * sigma_a),
        spatial_k,
        jnp.float32(support_threshold),
    ]).astype(f32).reshape(1, 4)

    kernel = functools.partial(_kernel, num_cams=N, m_slots=M)
    conf = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _PM, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _PJ, N, M), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, M), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, 1, M), f32),
        interpret=interpret,
    )(params, pm_row, proj)
    return conf[:, 0, :]
