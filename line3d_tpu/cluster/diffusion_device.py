"""Device-side replicator-dynamics diffusion (TPU formulation).

TPU-native equivalent of the reference RDD GPU kernels
(K_sparseMat_row_normalization cudawrapper.cu:717-762,
K_sparseMat_diffusion_step cudawrapper.cu:765-829, host driver
replicator_dynamics_diffusion cudawrapper.cu:1131-1191): the host builds a
static index plan once (sorted COO layout, lockstep gather bases, transpose
permutation), then all iterations run inside a single jitted
``lax.fori_loop`` — no host round-trip between iterations, unlike the
reference which launches 2 kernels + syncs per iteration.

Formulation notes:
* The reference's "dot product" walks a P-row and a W-column in
  index-locked steps (cudawrapper.cu:786-800); that lockstep walk is
  reproduced here as K accumulation steps of [E]-vector gathers
  (``pv[rowstart[j]+t] * wv[colstart[i]+t]``), K = max node degree, which
  keeps peak memory at O(E) instead of materializing the [E, K] gather
  matrix in HBM.
* The transpose-position scatter (cudawrapper.cu:812-818) is inverted into
  a gather: ``pv' = newv[order_col]`` where ``order_col`` is the
  (col, row)-sorted enumeration of the (row, col)-sorted entries.
* Row normalization is a sorted ``segment_sum`` + gather
  (cudawrapper.cu:736-760).
* Padded entries live in segment ``num_nodes`` with degree 0 so they decay
  to ``eps`` and never touch real entries.

Sharding: all [E]-shaped arrays may be sharded along a 1-D mesh axis.  The
value vector is both gather source and permutation target across shards,
so XLA inserts one all-gather per iteration over ICI — the O(E) vector,
not the O(E·K) matrix.  Values are float32 on device, matching the
reference kernels (the host path in diffusion.py is float64).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class DiffusionPlan:
    """Static index plan for the lockstep diffusion, padded to E_pad."""
    rw: np.ndarray          # [E_pad] f32 row-sorted values (P's initial W)
    wv_col: np.ndarray      # [E_pad] f32 col-sorted values (W, fixed)
    ri_seg: np.ndarray      # [E_pad] i32 row id; pads -> num_nodes
    rowstart_j: np.ndarray  # [E_pad] i32 row-sorted base of P's row j_e
    colstart_i: np.ndarray  # [E_pad] i32 col-sorted base of W's col i_e
    mindeg: np.ndarray      # [E_pad] i32 min(deg[j_e], deg[i_e]); pads 0
    order_col: np.ndarray   # [E_pad] i32 transpose gather perm; pads self
    ri: np.ndarray          # [E] i64 unpadded row ids, (i, j)-sorted
    rj: np.ndarray          # [E] i64 unpadded col ids
    num_nodes: int
    num_edges: int
    max_degree: int


def build_plan(edges_i, edges_j, edges_w, num_nodes,
               pad_multiple: int = 1024) -> DiffusionPlan:
    """Precompute the gather plan on host (one-time, O(E log E))."""
    E = len(edges_w)
    order_r = np.lexsort((edges_j, edges_i))
    ri, rj = edges_i[order_r], edges_j[order_r]
    rw = edges_w[order_r].astype(np.float32)
    order_c = np.lexsort((edges_i, edges_j))
    wv_col = edges_w[order_c].astype(np.float32)

    deg = np.bincount(ri, minlength=num_nodes)
    rowstart = np.concatenate([[0], np.cumsum(deg)[:-1]]).astype(np.int64)
    # pattern is symmetric (both edge directions present), so the col-sorted
    # layout has the same per-column starts
    # rank of each row-sorted entry under the (col, row) key = row-sorted
    # position of its transpose (sparsematrix.cc:120-191 re-sort semantics)
    order_col = np.empty(E, np.int64)
    order_col[:] = np.lexsort((ri, rj))

    E_pad = max(pad_multiple, int(np.ceil(E / pad_multiple)) * pad_multiple)

    def pad(a, fill):
        out = np.full(E_pad, fill, a.dtype)
        out[:E] = a
        return out

    mindeg = np.minimum(deg[rj], deg[ri])
    plan = DiffusionPlan(
        rw=pad(rw, np.float32(0)),
        wv_col=pad(wv_col, np.float32(0)),
        ri_seg=pad(ri.astype(np.int32), np.int32(num_nodes)),
        rowstart_j=pad(rowstart[rj].astype(np.int32), np.int32(0)),
        colstart_i=pad(rowstart[ri].astype(np.int32), np.int32(0)),
        mindeg=pad(mindeg.astype(np.int32), np.int32(0)),
        order_col=np.concatenate(
            [order_col, np.arange(E, E_pad)]).astype(np.int32),
        ri=ri, rj=rj,
        num_nodes=num_nodes, num_edges=E,
        max_degree=int(deg.max()) if E else 0)
    return plan


@partial(jax.jit,
         static_argnames=("num_nodes", "iterations", "max_degree", "eps"))
def _diffuse_kernel(rw, wv_col, ri_seg, rowstart_j, colstart_i, mindeg,
                    order_col, *, num_nodes, iterations, max_degree,
                    eps=1e-12):
    eps = jnp.float32(eps)

    def row_normalize(pv):
        sums = jax.ops.segment_sum(pv, ri_seg, num_segments=num_nodes + 1,
                                   indices_are_sorted=True)
        sums = jnp.maximum(sums, eps)       # cudawrapper.cu:745-746
        return pv / sums[ri_seg]

    def lockstep_dot(pv):
        def tbody(t, dot):
            pP = pv[rowstart_j + t]         # t-th entry of P's row j_e
            wW = wv_col[colstart_i + t]     # t-th entry of W's col i_e
            return dot + jnp.where(t < mindeg, pP * wW, jnp.float32(0))
        return jax.lax.fori_loop(0, max_degree, tbody,
                                 jnp.zeros_like(pv))

    def body(_, pv):
        pv = row_normalize(pv)
        newv = jnp.maximum(pv * lockstep_dot(pv), eps)  # cudawrapper.cu:805
        return newv[order_col]              # write-to-transpose as a gather

    if iterations == 0:
        # host twin still row-normalizes once before its (empty) loop
        pv = row_normalize(rw)
    else:
        pv = jax.lax.fori_loop(0, iterations, body, rw)
    # min-symmetrize (performDiffusion, line3D.cc:1264-1299)
    return jnp.minimum(pv, pv[order_col])


def diffuse_reference_device(edges_i, edges_j, edges_w, num_nodes,
                             iterations: int = 10, eps: float = 1e-12,
                             mesh=None):
    """Reference-mode RDD on device; returns ((i, j)-sorted edge list).

    With ``mesh`` (a 1-D ``jax.sharding.Mesh``), the [E_pad] arrays are
    sharded over its first axis and the kernel runs as one pjit program.
    """
    E = len(edges_w)
    if E == 0:
        return edges_i, edges_j, edges_w
    plan = build_plan(edges_i, edges_j, edges_w, num_nodes)

    arrays = (plan.rw, plan.wv_col, plan.ri_seg, plan.rowstart_j,
              plan.colstart_i, plan.mindeg, plan.order_col)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from ..parallel import multihost
        axis = mesh.axis_names[0]
        # globalize: works for a single-process mesh (device_put) and a
        # multi-host one (each device reads its slice of the replicated
        # host plan)
        arrays = tuple(multihost.globalize(mesh, P(axis), a)
                       for a in arrays)
    else:
        arrays = tuple(jnp.asarray(a) for a in arrays)

    w_sym = _diffuse_kernel(*arrays, num_nodes=num_nodes,
                            iterations=iterations,
                            max_degree=plan.max_degree, eps=eps)
    if mesh is not None and jax.process_count() > 1:
        from ..parallel import multihost
        w_sym = multihost.replicate(mesh, w_sym)
    w_sym = np.asarray(w_sym)[:E].astype(np.float64)
    return plan.ri, plan.rj, w_sym
