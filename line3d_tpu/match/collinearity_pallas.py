"""Pallas TPU kernel for the dense collinearity keep-plane.

Candidate gate for per-view 2D segment collinearity (reference:
K_collinearity, cudawrapper.cu:476-535): the XLA formulation
(collinearity.collinearity_matrix) materializes several [S, S] f32 planes
to HBM and spends VPU time on sqrt/div/exp per pair (~9.5 ms per
3072x3072 view on v5e); this kernel keeps everything in VMEM and gates on
SQUARED distances so the whole plane needs no sqrt, div, or exp:

    aff = exp(-d^2 / (2 sigma^2)) > 0.5   <=>   d^2 < 2 sigma^2 ln 2

and each point-line distance comparison |n|/sqrt(den) < thr becomes
n^2 < thr^2 * den.  The gate is widened by a tiny relative margin so it is
a SUPERSET of the XLA plane under f32 reassociation; the exact affinity is
recomputed (and re-gated) downstream at the compacted pair list
(collinearity._pair_aff), so borderline extras are dropped there and the
final maps are identical.
"""
from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-12
# relative widening of the squared-distance gate (superset of the XLA
# plane; final regate happens at the compacted shape)
MARGIN = 1e-4


def _kernel(params_ref, segs_ref, segsT_ref, mask_ref, maskT_ref, keep_ref):
    thr_sq = params_ref[0, 0]          # 2 sigma^2 ln2 * (1 + MARGIN)

    p1x = segs_ref[:, 0:1]
    p1y = segs_ref[:, 1:2]
    p2x = segs_ref[:, 2:3]
    p2y = segs_ref[:, 3:4]
    q1x = segsT_ref[0:1, :]
    q1y = segsT_ref[1:2, :]
    q2x = segsT_ref[2:3, :]
    q2y = segsT_ref[3:4, :]
    m_i = mask_ref[:, 0:1]
    m_j = maskT_ref[0:1, :]

    # supporting lines (row side [BS,1], col side [1,BT])
    lia = p1y - p2y; lib = p2x - p1x; lic = p1x * p2y - p1y * p2x
    lja = q1y - q2y; ljb = q2x - q1x; ljc = q1x * q2y - q1y * q2x
    den_i = lia * lia + lib * lib
    den_j = lja * lja + ljb * ljb

    # mutual max endpoint-to-line distances (cudawrapper.cu:509-511) on
    # squared numerators: max(n1^2, n2^2) < thr^2 * den
    n1 = lja * p1x + ljb * p1y + ljc          # i's endpoints on j's line
    n2 = lja * p2x + ljb * p2y + ljc
    m1 = lia * q1x + lib * q1y + lic          # j's endpoints on i's line
    m2 = lia * q2x + lib * q2y + lic
    close_i = jnp.maximum(n1 * n1, n2 * n2) <= thr_sq * den_j
    close_j = jnp.maximum(m1 * m1, m2 * m2) <= thr_sq * den_i
    close = close_i & close_j & (den_i > EPS) & (den_j > EPS)

    # no-overlap check (cudawrapper.cu:518-528): all mutual endpoint dot
    # products positive (exact mults/adds — identical to the XLA plane)
    dot = lambda ux, uy, vx, vy: ux * vx + uy * vy
    pos1 = dot(q1x - p1x, q1y - p1y, q2x - p1x, q2y - p1y)
    pos2 = dot(q1x - p2x, q1y - p2y, q2x - p2x, q2y - p2y)
    pos3 = dot(p1x - q1x, p1y - q1y, p2x - q1x, p2y - q1y)
    pos4 = dot(p1x - q2x, p1y - q2y, p2x - q2x, p2y - q2y)
    no_overlap = (pos1 > -EPS) & (pos2 > -EPS) & \
                 (pos3 > -EPS) & (pos4 > -EPS)

    # exclude the diagonal (i == j)
    bs = segs_ref.shape[0]
    bt = segsT_ref.shape[1]
    ri = pl.program_id(0) * bs + jax.lax.broadcasted_iota(
        jnp.int32, (bs, bt), 0)
    cj = pl.program_id(1) * bt + jax.lax.broadcasted_iota(
        jnp.int32, (bs, bt), 1)

    keep = close & no_overlap & (m_i > 0.5) & (m_j > 0.5) & (ri != cj)
    keep_ref[:, :] = jnp.broadcast_to(keep, (bs, bt)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_s", "block_t",
                                             "interpret", "aff_threshold"))
def collinearity_keep_pallas(segs, mask, coll_sigma_sq,
                             block_s: int = 256, block_t: int = 256,
                             interpret: bool = False,
                             aff_threshold: float = 0.5):
    """Candidate keep-plane [S, S] bool for one view's collinearity.

    Superset of `collinearity_matrix(...) > 0` (see module docstring);
    exactness is restored by the downstream recompute.
    """
    S = segs.shape[0]
    from .pairwise_pallas import _pick_block
    block_s = _pick_block(block_s, S)
    block_t = _pick_block(block_t, S)

    # aff = exp(-d^2 / 2 sigma^2) > T  <=>  d^2 < 2 sigma^2 * (-ln T)
    neg_ln_t = float(-np.log(aff_threshold))
    thr_sq = (2.0 * coll_sigma_sq * neg_ln_t *
              (1.0 + MARGIN)).astype(jnp.float32)
    params = jnp.reshape(thr_sq, (1, 1))

    segsT = segs.T                                     # [4, S]
    maskf = mask.astype(jnp.float32)[:, None]          # [S, 1]
    maskTf = mask.astype(jnp.float32)[None, :]         # [1, S]

    keepf = pl.pallas_call(
        _kernel,
        grid=(S // block_s, S // block_t),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
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
        out_shape=jax.ShapeDtypeStruct((S, S), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(S) * int(S) * 60,
            bytes_accessed=int(S) * int(S) * 4,
            transcendentals=0),
        interpret=interpret,
    )(params, segs, segsT, maskf, maskTf)
    return keepf > 0.5
