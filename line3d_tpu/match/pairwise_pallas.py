"""Pallas TPU kernel for dense pairwise line-segment matching.

Same math as pairwise.match_pair_dense (the SoA XLA formulation), fused into
a single VMEM-resident tile program: XLA materializes many [S, S] f32
intermediate planes to HBM (~15 GB of traffic per 3072x3072 pair grid,
~19 ms/view-pair on v5e); this kernel keeps all intermediates in
VMEM/vregs and writes only the 5 output planes.

Grid: (Ss / BS, St / BT).  Per tile, source-segment quantities live in
[BS, 1] columns and target quantities in [1, BT] rows (targets are passed
pre-transposed [4, St] so row slices are natural); every pairwise quantity
is a [BS, BT] VPU plane.

Semantics (identical to the reference CUDA kernel K_pairwise_matches,
cudawrapper.cu:538-611):
  epipolar transfer of both segments' endpoints, mutual 2D overlap gate
  (min > 0.10, max > 0.30), two-ray triangulation of the four endpoint
  correspondences, validity = all four depths positive.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(requested: int, dim: int) -> int:
    """Largest block <= requested that divides dim.

    The segment axis is padded to config.pad_multiple (128 by default but
    configurable), so the padded size is NOT always a multiple of the
    256-row default block — e.g. S in {384, 640, 896} under the default
    config.  gcd keeps the grid exact for any padding choice instead of
    asserting (the crash mode this replaces)."""
    return math.gcd(int(requested), int(dim))

EPS = 1e-12


def _compute(params_ref, segs_src_ref, segs_tgtT_ref, mask_src_ref,
             mask_tgtT_ref, signs_only: bool = False):
    P = params_ref
    # params layout (see match_pair_dense_pallas):
    # 0..8   F (row-major)          9..17  RtKinv_src
    # 18..26 RtKinv_tgt             27..29 C_src
    # 30..32 C_tgt                  33, 34 overlap thresholds
    F = [[P[0, 3 * r + c] for c in range(3)] for r in range(3)]
    Ms = [[P[0, 9 + 3 * r + c] for c in range(3)] for r in range(3)]
    Mt = [[P[0, 18 + 3 * r + c] for c in range(3)] for r in range(3)]
    Cs = [P[0, 27 + k] for k in range(3)]
    Ct = [P[0, 30 + k] for k in range(3)]
    ov_lo = P[0, 33]
    ov_hi = P[0, 34]

    p1x = segs_src_ref[:, 0:1]
    p1y = segs_src_ref[:, 1:2]
    p2x = segs_src_ref[:, 2:3]
    p2y = segs_src_ref[:, 3:4]
    q1x = segs_tgtT_ref[0:1, :]
    q1y = segs_tgtT_ref[1:2, :]
    q2x = segs_tgtT_ref[2:3, :]
    q2y = segs_tgtT_ref[3:4, :]
    m_src = mask_src_ref[:, 0:1]
    m_tgt = mask_tgtT_ref[0:1, :]

    # supporting lines
    l1a = p1y - p2y; l1b = p2x - p1x; l1c = p1x * p2y - p1y * p2x
    l2a = q1y - q2y; l2b = q2x - q1x; l2c = q1x * q2y - q1y * q2x

    def fline(M, x, y):
        return (M[0][0] * x + M[0][1] * y + M[0][2],
                M[1][0] * x + M[1][1] * y + M[1][2],
                M[2][0] * x + M[2][1] * y + M[2][2])

    Ft = [[F[c][r] for c in range(3)] for r in range(3)]
    e1a, e1b, e1c = fline(F, p1x, p1y)
    e2a, e2b, e2c = fline(F, p2x, p2y)
    f1a, f1b, f1c = fline(Ft, q1x, q1y)
    f2a, f2b, f2c = fline(Ft, q2x, q2y)

    def intersect(la, lb, lc, ma, mb, mc):
        ix = lb * mc - lc * mb
        iy = lc * ma - la * mc
        iz = la * mb - lb * ma
        ok = jnp.abs(iz) > EPS
        inv = 1.0 / jnp.where(ok, iz, 1.0)
        return jnp.where(ok, ix * inv, 0.0), jnp.where(ok, iy * inv, 0.0), ok

    a1x, a1y, ok1 = intersect(l2a, l2b, l2c, e1a, e1b, e1c)
    a2x, a2y, ok2 = intersect(l2a, l2b, l2c, e2a, e2b, e2c)
    b1x, b1y, ok3 = intersect(l1a, l1b, l1c, f1a, f1b, f1c)
    b2x, b2y, ok4 = intersect(l1a, l1b, l1c, f2a, f2b, f2c)
    inter_ok = ok1 & ok2 & ok3 & ok4

    # overlap gate on SQUARED distances: every branch of
    # D_segment_overlap_2D is a ratio of point distances, and every
    # comparison is against a non-negative threshold, so the whole gate is
    # monotone under squaring — this removes ~10 [BS, BT]-sized sqrts.
    # The ratio is kept as a (num, den) pair (den > 0) and every threshold
    # test is cross-multiplied (num > t*den), removing 8 more [BS, BT]
    # divides per pair.
    def overlap_sq_nd(ax, ay, bx, by, cx, cy, dx, dy):
        d2 = lambda ux, uy, vx, vy: (ux - vx) ** 2 + (uy - vy) ** 2
        len2_ab = d2(ax, ay, bx, by)
        len2_cd = d2(cx, cy, dx, dy)
        on = lambda px, py, qx, qy, rx, ry: \
            (px - rx) * (qx - rx) + (py - ry) * (qy - ry) < EPS
        c_in = on(ax, ay, bx, by, cx, cy)
        d_in = on(ax, ay, bx, by, dx, dy)
        a_in = on(cx, cy, dx, dy, ax, ay)
        b_in = on(cx, cy, dx, dy, bx, by)
        safe = lambda x: jnp.maximum(x, EPS)
        EPS2 = EPS * EPS
        l31 = d2(bx, by, dx, dy)
        l32 = d2(ax, ay, dx, dy)
        b3 = a_in & (l31 > EPS2)
        n3 = jnp.where(b3, d2(cx, cy, ax, ay),
                       jnp.where(l32 > EPS2, d2(cx, cy, bx, by), 0.0))
        e3 = jnp.where(b3, safe(l31),
                       jnp.where(l32 > EPS2, safe(l32), 1.0))
        l41 = d2(ax, ay, cx, cy)
        l42 = d2(bx, by, cx, cy)
        b4 = b_in & (l41 > EPS2)
        n4 = jnp.where(b4, d2(dx, dy, bx, by),
                       jnp.where(l42 > EPS2, d2(dx, dy, ax, ay), 0.0))
        e4 = jnp.where(b4, safe(l41),
                       jnp.where(l42 > EPS2, safe(l42), 1.0))
        num = jnp.where(c_in & d_in, len2_cd,
                        jnp.where(a_in & b_in, len2_ab,
                                  jnp.where(c_in, n3,
                                            jnp.where(d_in, n4, 0.0))))
        den = jnp.where(c_in & d_in, safe(len2_ab),
                        jnp.where(a_in & b_in, safe(len2_cd),
                                  jnp.where(c_in, e3,
                                            jnp.where(d_in, e4, 1.0))))
        num = jnp.where((len2_ab < 1.0) | (len2_cd < 1.0), 0.0, num)
        return num, den

    n1, e1 = overlap_sq_nd(p1x, p1y, p2x, p2y, b1x, b1y, b2x, b2y)
    n2, e2 = overlap_sq_nd(q1x, q1y, q2x, q2y, a1x, a1y, a2x, a2y)
    lo2 = ov_lo * ov_lo
    hi2 = ov_hi * ov_hi
    # min(ov1,ov2) > lo2  &  max(ov1,ov2) > hi2, cross-multiplied
    ov_ok = ((n1 > lo2 * e1) & (n2 > lo2 * e2) &
             ((n1 > hi2 * e1) | (n2 > hi2 * e2)))

    def ray_n(M, x, y):
        """Normalized viewing ray (segment endpoints AND epipolar transfer
        points).  For transfer points the triangulation depth along ray1
        is invariant to ray2's scale, but the normalization is still
        numerically load-bearing: far epipolar intersections have huge
        coordinates and the unnormalized dot products cancel
        catastrophically in f32."""
        rx = M[0][0] * x + M[0][1] * y + M[0][2]
        ry = M[1][0] * x + M[1][1] * y + M[1][2]
        rz = M[2][0] * x + M[2][1] * y + M[2][2]
        inv = jax.lax.rsqrt(jnp.maximum(rx * rx + ry * ry + rz * rz, EPS))
        return rx * inv, ry * inv, rz * inv

    w0 = (Cs[0] - Ct[0], Cs[1] - Ct[1], Cs[2] - Ct[2])

    def tri(r1, r2, want_first):
        a = r1[0] * r1[0] + r1[1] * r1[1] + r1[2] * r1[2]
        b = r1[0] * r2[0] + r1[1] * r2[1] + r1[2] * r2[2]
        c = r2[0] * r2[0] + r2[1] * r2[1] + r2[2] * r2[2]
        d = r1[0] * w0[0] + r1[1] * w0[1] + r1[2] * w0[2]
        e = r2[0] * w0[0] + r2[1] * w0[1] + r2[2] * w0[2]
        denom = a * c - b * b
        ok = jnp.abs(denom) > EPS
        num = (b * e - c * d) if want_first else (a * e - b * d)
        if signs_only:
            # the valid-only kernel consumes depths through `d > 0` alone:
            # sign(num/denom) == sign(num*denom), no divide needed (rays
            # are unit and the scene is conditioned, so no overflow)
            return num * denom, ok
        inv = 1.0 / jnp.where(ok, denom, 1.0)
        return jnp.where(ok, num * inv, -1.0), ok

    ray_p1 = ray_n(Ms, p1x, p1y)
    ray_p2 = ray_n(Ms, p2x, p2y)
    ray_q1 = ray_n(Mt, q1x, q1y)
    ray_q2 = ray_n(Mt, q2x, q2y)
    ray_a1 = ray_n(Mt, a1x, a1y)
    ray_a2 = ray_n(Mt, a2x, a2y)
    ray_b1 = ray_n(Ms, b1x, b1y)
    ray_b2 = ray_n(Ms, b2x, b2y)

    d_p1, t1 = tri(ray_p1, ray_a1, True)
    d_p2, t2 = tri(ray_p2, ray_a2, True)
    d_q1, t3 = tri(ray_b1, ray_q1, False)
    d_q2, t4 = tri(ray_b2, ray_q2, False)

    pos = (d_p1 > 0.0) & (d_p2 > 0.0) & (d_q1 > 0.0) & (d_q2 > 0.0)
    valid = (inter_ok & ov_ok & pos & t1 & t2 & t3 & t4 &
             (m_src > 0.5) & (m_tgt > 0.5))
    return (d_p1, d_p2, d_q1, d_q2), valid


def _kernel(params_ref, segs_src_ref, segs_tgtT_ref, mask_src_ref,
            mask_tgtT_ref, d1_ref, d2_ref, d3_ref, d4_ref, valid_ref):
    (d_p1, d_p2, d_q1, d_q2), valid = _compute(
        params_ref, segs_src_ref, segs_tgtT_ref, mask_src_ref, mask_tgtT_ref)
    shape = (segs_src_ref.shape[0], segs_tgtT_ref.shape[1])
    bc = lambda x: jnp.broadcast_to(x, shape)
    d1_ref[:, :] = bc(d_p1)
    d2_ref[:, :] = bc(d_p2)
    d3_ref[:, :] = bc(d_q1)
    d4_ref[:, :] = bc(d_q2)
    valid_ref[:, :] = bc(valid).astype(jnp.float32)


def _kernel_valid(params_ref, segs_src_ref, segs_tgtT_ref, mask_src_ref,
                  mask_tgtT_ref, valid_ref):
    """Valid-plane-only variant: skips the 4 depth-plane HBM writes (depths
    are recomputed later at the compacted [S, M] shape, pairwise.py) and
    the 4 triangulation divides (only depth signs feed the valid bit)."""
    _, valid = _compute(
        params_ref, segs_src_ref, segs_tgtT_ref, mask_src_ref, mask_tgtT_ref,
        signs_only=True)
    shape = (segs_src_ref.shape[0], segs_tgtT_ref.shape[1])
    valid_ref[:, :] = jnp.broadcast_to(valid, shape).astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("block_s", "block_t", "interpret"))
def match_pair_dense_pallas(segs_src, segs_tgt, mask_src, mask_tgt,
                            F, RtKinv_src, RtKinv_tgt, C_src, C_tgt,
                            min_overlap_lower=0.10, min_overlap_upper=0.30,
                            block_s: int = 256, block_t: int = 256,
                            interpret: bool = False):
    """Drop-in replacement for pairwise.match_pair_dense on TPU.

    Returns (depth planes tuple, valid bool [Ss, St]).  Block sizes shrink
    to the largest divisor of the padded shape (_pick_block), so any
    pad_multiple works.
    """
    Ss = segs_src.shape[0]
    St = segs_tgt.shape[0]
    block_s = _pick_block(block_s, Ss)
    block_t = _pick_block(block_t, St)

    params = jnp.concatenate([
        jnp.ravel(F), jnp.ravel(RtKinv_src), jnp.ravel(RtKinv_tgt),
        jnp.ravel(C_src), jnp.ravel(C_tgt),
        jnp.array([min_overlap_lower, min_overlap_upper], jnp.float32),
    ]).astype(jnp.float32)[None, :]                       # [1, 35]

    segs_tgtT = segs_tgt.T                                # [4, St]
    mask_srcf = mask_src.astype(jnp.float32)[:, None]     # [Ss, 1]
    mask_tgtf = mask_tgt.astype(jnp.float32)[None, :]     # [1, St]

    grid = (Ss // block_s, St // block_t)
    out_shape = [jax.ShapeDtypeStruct((Ss, St), jnp.float32)] * 5
    out_spec = pl.BlockSpec((block_s, block_t), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)

    d1, d2, d3, d4, validf = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 35), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 5,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=int(Ss) * int(St) * 420,
            bytes_accessed=int(Ss) * int(St) * 4 * 5,
            transcendentals=int(Ss) * int(St) * 12),
        interpret=interpret,
    )(params, segs_src, segs_tgtT, mask_srcf, mask_tgtf)

    return (d1, d2, d3, d4), validf > 0.5


@functools.partial(jax.jit,
                   static_argnames=("block_s", "block_t", "interpret"))
def match_pair_valid_pallas(segs_src, segs_tgt, mask_src, mask_tgt,
                            F, RtKinv_src, RtKinv_tgt, C_src, C_tgt,
                            min_overlap_lower=0.10, min_overlap_upper=0.30,
                            block_s: int = 256, block_t: int = 256,
                            interpret: bool = False):
    """Like match_pair_dense_pallas but emits only the valid plane
    [Ss, St] bool — 1/5 the HBM writes.  Used by the compact-then-recompute
    match path (pairwise.match_view_against_neighbors)."""
    Ss = segs_src.shape[0]
    St = segs_tgt.shape[0]
    block_s = _pick_block(block_s, Ss)
    block_t = _pick_block(block_t, St)

    params = jnp.concatenate([
        jnp.ravel(F), jnp.ravel(RtKinv_src), jnp.ravel(RtKinv_tgt),
        jnp.ravel(C_src), jnp.ravel(C_tgt),
        jnp.array([min_overlap_lower, min_overlap_upper], jnp.float32),
    ]).astype(jnp.float32)[None, :]                       # [1, 35]

    segs_tgtT = segs_tgt.T
    mask_srcf = mask_src.astype(jnp.float32)[:, None]
    mask_tgtf = mask_tgt.astype(jnp.float32)[None, :]

    grid = (Ss // block_s, St // block_t)
    validf = pl.pallas_call(
        _kernel_valid,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 35), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_s, block_t), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ss, St), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(Ss) * int(St) * 420,
            bytes_accessed=int(Ss) * int(St) * 4,
            transcendentals=int(Ss) * int(St) * 12),
        interpret=interpret,
    )(params, segs_src, segs_tgtT, mask_srcf, mask_tgtf)
    return validf > 0.5
