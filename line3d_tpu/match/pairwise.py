"""Batched pairwise line-segment matching between a source view and a stack of
neighbor views.

TPU-native equivalent of K_pairwise_matches (reference: cudawrapper.cu:538-611)
and its host driver loop (cudawrapper.cu:897-944): instead of one CUDA grid
per neighbor plus a host download/sort, the whole [N, S_src, S_tgt] pair
volume is evaluated in one fused XLA program and compacted on-device into a
fixed-width per-source-segment match table.

Semantics per (src segment p, tgt segment q):
  1. epipolar lines of p's endpoints in the target view (l = F p) and of q's
     endpoints in the source view (l = F^T q),
  2. intersect with the opposite segment's supporting line,
  3. 2D overlap gate: min(overlap) > 0.10 and max(overlap) > 0.30
     (cudawrapper.h:45-46),
  4. two-ray triangulation of all four endpoint correspondences; a match is
     kept iff all four depths are positive (cudawrapper.cu:931).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import geometry as g


def match_pair_dense(segs_src, segs_tgt, mask_src, mask_tgt,
                     F, RtKinv_src, RtKinv_tgt, C_src, C_tgt,
                     min_overlap_lower=0.10, min_overlap_upper=0.30):
    """Dense pair matching for one (src, tgt) view pair.

    Args:
      segs_src: [Ss, 4], segs_tgt: [St, 4] float32 segment endpoints.
      mask_src: [Ss], mask_tgt: [St] bool validity.
      F: [3, 3] fundamental (src -> tgt epipolar lines).
      RtKinv_src / RtKinv_tgt: [3, 3]; C_src / C_tgt: [3].

    Returns:
      depths: [Ss, St, 4] float32 = (d_src_p1, d_src_p2, d_tgt_q1, d_tgt_q2)
      valid:  [Ss, St] bool
    """
    p1, p2 = g.seg_endpoints(segs_src)            # [Ss, 3]
    q1, q2 = g.seg_endpoints(segs_tgt)            # [St, 3]

    line1 = g.line_through(p1, p2)[:, None, :]    # src lines   [Ss, 1, 3]
    line2 = g.line_through(q1, q2)[None, :, :]    # tgt lines   [1, St, 3]

    epi_p1 = g.epipolar_line(F, p1)[:, None, :]   # [Ss, 1, 3]
    epi_p2 = g.epipolar_line(F, p2)[:, None, :]
    Ft = F.T
    epi_q1 = g.epipolar_line(Ft, q1)[None, :, :]  # [1, St, 3]
    epi_q2 = g.epipolar_line(Ft, q2)[None, :, :]

    # intersections (cudawrapper.cu:570-573)
    l2_p1, v1 = g.normalize_hom(jnp.cross(line2, epi_p1))
    l2_p2, v2 = g.normalize_hom(jnp.cross(line2, epi_p2))
    l1_q1, v3 = g.normalize_hom(jnp.cross(line1, epi_q1))
    l1_q2, v4 = g.normalize_hom(jnp.cross(line1, epi_q2))
    inter_ok = v1 & v2 & v3 & v4                   # [Ss, St]

    # overlap gate (cudawrapper.cu:584-588)
    p1b = p1[:, None, :]
    p2b = p2[:, None, :]
    q1b = q1[None, :, :]
    q2b = q2[None, :, :]
    overlap1 = g.segment_overlap_2d(p1b, p2b, l1_q1, l1_q2)
    overlap2 = g.segment_overlap_2d(q1b, q2b, l2_p1, l2_p2)
    ov_ok = (jnp.minimum(overlap1, overlap2) > min_overlap_lower) & \
            (jnp.maximum(overlap1, overlap2) > min_overlap_upper)

    # triangulation (cudawrapper.cu:594-601)
    d_p1, _, t1 = g.triangulation_depths(p1b, l2_p1, C_src, C_tgt,
                                         RtKinv_src, RtKinv_tgt)
    d_p2, _, t2 = g.triangulation_depths(p2b, l2_p2, C_src, C_tgt,
                                         RtKinv_src, RtKinv_tgt)
    _, d_q1, t3 = g.triangulation_depths(l1_q1, q1b, C_src, C_tgt,
                                         RtKinv_src, RtKinv_tgt)
    _, d_q2, t4 = g.triangulation_depths(l1_q2, q2b, C_src, C_tgt,
                                         RtKinv_src, RtKinv_tgt)

    depths = jnp.stack([d_p1, d_p2, d_q1, d_q2], axis=-1)
    pos = jnp.all(depths > 0.0, axis=-1)
    valid = (inter_ok & ov_ok & pos & t1 & t2 & t3 & t4 &
             mask_src[:, None] & mask_tgt[None, :])
    return depths, valid


def compact_rows(depths, valid, m_cap):
    """Compact a dense [Ss, St] match grid into per-row fixed-width tables.

    Replaces the host-side sort + offset-table build of the reference
    (cudawrapper.cu:926-1007).  Valid matches are kept in ascending target
    index order (jax.lax.top_k on equal keys is stable, lowest index first),
    which matches the reference's (segID1, camID2, segID2) sort.

    Returns (tgt_idx [Ss, m_cap] int32 (-1 pad), depths_g [Ss, m_cap, 4],
             kept_valid [Ss, m_cap] bool, n_valid [Ss] int32).
    """
    n_valid = jnp.sum(valid, axis=1).astype(jnp.int32)
    key = valid.astype(jnp.int32)
    m_cap = min(m_cap, valid.shape[1])
    _, idx = jax.lax.top_k(key, m_cap)                 # stable: low idx first
    kept_valid = jnp.take_along_axis(valid, idx, axis=1)
    depths_g = jnp.take_along_axis(depths, idx[:, :, None], axis=1)
    tgt_idx = jnp.where(kept_valid, idx, -1).astype(jnp.int32)
    return tgt_idx, depths_g, kept_valid, n_valid


def match_view_against_neighbors(segs_src, mask_src, RtKinv_src, C_src,
                                 segs_nb, mask_nb, F_nb, RtKinv_nb, C_nb,
                                 nb_mask, m_cap,
                                 min_overlap_lower=0.10,
                                 min_overlap_upper=0.30):
    """Match one source view against a padded stack of N neighbor views.

    Scans over the neighbor axis (keeps peak memory at one [Ss, St] grid) and
    emits per-neighbor compacted tables.

    Args:
      segs_nb: [N, St, 4]; mask_nb: [N, St]; F_nb: [N, 3, 3];
      RtKinv_nb: [N, 3, 3]; C_nb: [N, 3]; nb_mask: [N] bool (padding slots).
      m_cap: per-neighbor per-source-segment match cap.

    Returns dict with
      tgt_idx [N, Ss, m_cap], depths [N, Ss, m_cap, 4],
      valid [N, Ss, m_cap], n_valid [N, Ss], overflow [N] (int32 count of
      matches dropped by the cap — reference keeps all, cudawrapper.cu:926).
    """
    def step(carry, nb):
        segs_t, mask_t, F, RtKinv_t, C_t, nbm = nb
        depths, valid = match_pair_dense(
            segs_src, segs_t, mask_src, mask_t & nbm,
            F, RtKinv_src, RtKinv_t, C_src, C_t,
            min_overlap_lower, min_overlap_upper)
        tgt_idx, depths_g, kept, n_valid = compact_rows(depths, valid, m_cap)
        overflow = jnp.sum(jnp.maximum(n_valid - m_cap, 0))
        return carry, (tgt_idx, depths_g, kept, n_valid, overflow)

    nb_mask_b = nb_mask[:, None] & jnp.ones_like(mask_nb)
    _, (tgt_idx, depths_g, kept, n_valid, overflow) = jax.lax.scan(
        step, None,
        (segs_nb, nb_mask_b, F_nb, RtKinv_nb, C_nb, nb_mask))
    return dict(tgt_idx=tgt_idx, depths=depths_g, valid=kept,
                n_valid=n_valid, overflow=overflow)
