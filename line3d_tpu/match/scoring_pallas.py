"""Pallas TPU kernel for multi-view support scoring (match verification).

Same semantics as scoring.score_matches (the XLA formulation of the
reference's K_verify_matches, cudawrapper.cu:614-714), fused into one
VMEM-resident program.  The XLA path materializes dozens of [S, M, M]
support planes to HBM and lowers the camera-indexed gathers to one-hot MXU
contractions; both cost ~10x the arithmetic minimum.  Here every [M, M]
plane lives in vregs/VMEM for the lifetime of one source segment and every
camera-indexed quantity evaluates directly in plane space from per-m2
coefficient columns (see below), so the whole scoring pass is VPU-bound.

Layout per source segment s (grid = (S,)):
  pm_row [16, M]  per-match scalars, m on lanes  (row broadcasts)
  pm_col [M, 16]  the same scalars transposed    (column broadcasts)
  btab   [1, 6N]  P_n[:,:3] @ ray for both rays, per neighbor camera
  atab   [1, 3N]  P_n @ [C_src; 1] per neighbor camera
  out    [1, M]   confidence per match slot

The hypothesis projection of C_src + d*ray into camera n is affine in
the depth d: q = a_n + d * b_{s,n} with a_n = P_n [C_src; 1] and
b_{s,n} = P_n[:,:3] ray (atab / btab).  The camera index of an [m2, m]
element is cam[m2] — constant along the lane (m) axis — so every
projected quantity evaluates DIRECTLY in plane space from per-m2
COEFFICIENT COLUMNS: e.g. q1z[m2, m] = az[cam[m2]] + d1[m] *
bz1[cam[m2]] is one column+row FMA, with the per-camera constants
resolved by an N-step select in [M, 1] column space (cost ~1/M of a
plane op).  An earlier revision instead computed the projections
per-camera on [1, M] rows and gathered them into plane space with 7
masked selects per camera — 7N full [M, M] select ops, ~half the
kernel's issue budget at N = 10.

All [M, M] planes are oriented [m2 (sublanes), m (lanes)]: quantities of
the *supporting* match m2 broadcast as columns, quantities of the *scored*
match m as rows, and the per-camera max is a sublane reduction.

Host-visible API: score_matches_pallas, a drop-in replacement for
scoring.score_matches (equivalence-tested in tests/test_pallas.py).

This is the TPU production path (scoring.score_matches_best dispatch).
Input prep is deliberately layout-native — all [S, M]-minor elementwise
planes, the camera axis unrolled, and the column-broadcast transpose done
in-VMEM inside the kernel (shipping a transposed [S, M, 16] array pays
minor-dim padding on every HBM load; an einsum emitting [S, N, 3, M]
costs ~14 ms per plane in transposed divide fusions — both profiled).
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

# (180/pi)^2 — folds the radians->degrees conversion of the angle into
# the squared-angle Gaussian exponent (see _conf_plane)
_DEG2 = (180.0 / 3.14159265358979323846) ** 2


def _conf_plane(row, pm2, atab, btab, params, t_off, tm_off,
                shape, num_cams):
    """Support-confidence plane conf[m2, m] for one (m2-tile, m-tile);
    returns (conf [T, TM], cam_col [T, 1]).

    Shared body of the untiled and tiled kernels.  `row(k)` gives the
    [1, TM] slices of the scored-match pm table; `pm2` is the supporting
    matches' [16, T] pm block in ROW layout; atab/btab index the
    per-camera projection-affinity scalars (see module docstring).

    All per-m2 coefficients (the camera-constant selects and the U dot
    products below) are built in [1, T] LANE space — a [T, 1] column op
    occupies 1 lane of a (sublanes x 128-lane) vreg, so 90 column-space
    selects would cost ~half a [T, TM] plane op EACH (measured: the
    column-space build erased the entire select-elimination win); the
    finished coefficient rows ride to column space through ONE fused
    [28, T] -> [T, 28] transpose alongside the pm planes.

    The 2D point-line distances follow the reference
    (cudawrapper.cu:668-683) with two algebraic reassociations that keep
    every plane off the select path:
      * point-to-target-line: tl . (qx/qz, qy/qz, 1) =
        ((tl . a) + d (tl . b)) / qz — the numerator coefficients
        (tl . a), (tl . b) are per-m2 columns (U0/U1/U2 below);
      * target-point-to-projected-line: the projected line through the
        two divided endpoints equals (q1 x q2) / (q1z q2z), and the qz
        products cancel between the numerator and the |(plx, ply)|
        normalizer, so the UNDIVIDED homogeneous cross product is used —
        no per-endpoint division at all.
    Invalid m2 slots (cam = -1) match no camera select: their
    coefficient columns stay 0, producing finite-or-NaN garbage planes
    that the valid/ok gates cut before the per-camera max (NaN compares
    false against the support threshold, so it cannot escape the final
    select).

    conf = min(exp(-dist^2/2sp^2), exp(-ang^2/2sa^2)) is computed as one
    exp(-max(...)) — exp is monotone decreasing in the exponent, so the
    min of the exps is the exp of the max exponent (one transcendental
    instead of two).
    """
    T, TM = shape
    f32 = jnp.float32
    inv_sig_p2, inv_sig_a2, spatial_k, support_threshold = params

    def r2(k):                        # [1, T] — m2 quantities, lane space
        return pm2[k:k + 1, :]

    # per-m2 camera-constant coefficients, built as [1, T] ROWS: a (the
    # projection of C_src) and b (projected ray direction) components for
    # both endpoints' rays, then the affine point-to-line numerator
    # coefficients U (m2's target line dotted with its camera's a/b)
    cam_r = r2(_CAM)
    coef = [jnp.zeros((1, T), f32) for _ in range(9)]
    for n in range(num_cams):
        sel = cam_r == f32(n)
        vals = (atab(n * 3 + 0), atab(n * 3 + 1), atab(n * 3 + 2),
                btab(n * 6 + 0), btab(n * 6 + 1), btab(n * 6 + 2),
                btab(n * 6 + 3), btab(n * 6 + 4), btab(n * 6 + 5))
        coef = [jnp.where(sel, v, c) for v, c in zip(vals, coef)]
    axr, ayr, azr, bx1r, by1r, bz1r, bx2r, by2r, bz2r = coef
    tlxr, tlyr, tlzr, itdr = r2(_TLX), r2(_TLY), r2(_TLZ), r2(_ITDEN)
    U0r = (tlxr * axr + tlyr * ayr + tlzr * azr) * itdr
    U1r = (tlxr * bx1r + tlyr * by1r + tlzr * bz1r) * itdr
    U2r = (tlxr * bx2r + tlyr * by2r + tlzr * bz2r) * itdr

    # one transpose carries the pm planes AND the finished coefficient
    # rows to column space
    big = jnp.concatenate(
        [pm2, axr, ayr, azr, bx1r, by1r, bz1r, bx2r, by2r, bz2r,
         U0r, U1r, U2r], axis=0)                     # [28, T]
    colT = jnp.transpose(big, (1, 0))                # [T, 28]

    def col(k):                       # [T, 1] — m2 axis, column space
        return colT[:, k:k + 1]

    _AX = _PM
    (ax, ay, az, bx1, by1, bz1, bx2, by2, bz2,
     U0, U1, U2) = [col(_AX + i) for i in range(12)]
    cam_col = col(_CAM)

    d1_row, d2_row = row(_D1), row(_D2)
    d1_col, d2_col = col(_D1), col(_D2)

    # homogeneous depths of the projected endpoints + projection-ok gate
    Z1 = az + d1_row * bz1
    Z2 = az + d2_row * bz2
    ok = (jnp.abs(Z1) > EPS) & (jnp.abs(Z2) > EPS)

    # point-to-target-line distances: numerator affine in depth
    da1 = jnp.abs((U0 + d1_row * U1) / Z1)
    da2 = jnp.abs((U0 + d2_row * U2) / Z2)

    # target-point-to-projected-line distances via the undivided
    # homogeneous cross product (qz products cancel, see docstring)
    q1x = ax + d1_row * bx1
    q1y = ay + d1_row * by1
    q2x = ax + d2_row * bx2
    q2y = ay + d2_row * by2
    PLx = q1y * Z2 - q2y * Z1
    PLy = q2x * Z1 - q1x * Z2
    PLz = q1x * q2y - q1y * q2x
    rden = jax.lax.rsqrt(jnp.maximum(PLx * PLx + PLy * PLy,
                                     f32(EPS) * f32(EPS)))
    db1 = jnp.abs(PLx * col(_Q1X) + PLy * col(_Q1Y) + PLz) * rden
    db2 = jnp.abs(PLx * col(_Q2X) + PLy * col(_Q2Y) + PLz) * rden

    dist = jnp.maximum(jnp.maximum(da1, da2), jnp.maximum(db1, db2))
    y_pos = dist * dist * inv_sig_p2

    # 3D angle term (cudawrapper.cu:405-415); K=3 unrolled on the VPU.
    # The >90-degree fold (cudawrapper.cu:414) is acos(|dot|); acos isn't
    # lowered by Mosaic, so use the Abramowitz & Stegun 4.4.46 polynomial
    # for acos on [0, 1] (|err| ~ 2e-8 rad, below f32 ulp here).  Only
    # ang^2 is needed, so acos = sqrt(1-x) P(x) enters squared —
    # (1-x) P(x)^2 — and the sqrt disappears.
    dots = (col(_DIRX) * row(_DIRX) + col(_DIRY) * row(_DIRY)
            + col(_DIRZ) * row(_DIRZ))
    xa = jnp.clip(jnp.abs(dots), 0.0, 1.0)
    poly = f32(-0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        poly = poly * xa + f32(c)
    y_ang = (1.0 - xa) * poly * poly * (f32(_DEG2) * inv_sig_a2)

    conf = jnp.exp(-jnp.maximum(y_pos, y_ang))

    # spatial gate: hypotheses share the src rays => depth-delta test
    # (cudawrapper.cu:387-401)
    dd1 = jnp.abs(d1_row - d1_col)
    dd2 = jnp.abs(d2_row - d2_col)
    gate = (dd1 <= spatial_k * d1_row) & (dd2 <= spatial_k * d2_row)

    iota_m2 = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) + t_off
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (1, TM), 1) + tm_off
    pair_ok = ((row(_VALID) > 0.5) & (col(_VALID) > 0.5) & gate & ok
               & (iota_m2 != iota_m))

    conf = jnp.where(pair_ok & (conf > support_threshold), conf, f32(0))
    return conf, cam_col


def _kernel(params_ref, pm_row_ref, btab_ref, atab_ref, out_ref, *,
            num_cams, m_slots):
    M = m_slots
    f32 = jnp.float32
    params = (params_ref[0, 0], params_ref[0, 1], params_ref[0, 2],
              params_ref[0, 3])

    def row(k):                       # [1, M] — m (scored match) axis
        return pm_row_ref[0, k:k + 1, :]

    cam_row, valid_row = row(_CAM), row(_VALID)

    conf, cam_col = _conf_plane(
        row, pm_row_ref[0],
        lambda k: atab_ref[0, k], lambda k: btab_ref[0, 0, k],
        params, 0, 0, (M, M), num_cams)

    # per-camera max over m2 (sublanes), summed over cameras != cam[m]
    total = jnp.zeros((1, M), f32)
    for n in range(num_cams):
        cmax = jnp.max(jnp.where(cam_col == f32(n), conf, f32(0)),
                       axis=0, keepdims=True)
        total = total + jnp.where(cam_row == f32(n), f32(0), cmax)

    out_ref[0, 0:1, :] = jnp.where(valid_row > 0.5, total, f32(0))


def _kernel_tiled(need_ref, camlo_ref, camhi_ref, params_ref, pm_m_ref,
                  pm_hbm_ref, btab_ref, atab_ref, out_ref,
                  buf_ref, acc_ref, sem_ref, *,
                  num_cams, m_slots, m_tile, m2_tile):
    """Adaptively tiled variant of _kernel for M > 256 (the uncapped-exact
    capacities): ~15 [M, M] f32 planes exceed the ~16 MB VMEM at M >= 512,
    so both match axes are tiled.  The grid is (S, M/m_tile) and the m2
    axis is an IN-KERNEL fori_loop whose trip count is the row's live tile
    count ceil(need/T) — the merge packs valid slots first
    (merge_neighbor_tables), so tiles beyond need_ref[s] hold no work.
    The loop manually double-buffers the [16, T] pm blocks HBM -> VMEM
    (make_async_copy, two slots), overlapping each tile's fetch with the
    previous tile's compute.

    A previous revision used a static (S, M/TM, M/T) grid with dead tiles
    predicated out: correct, but every dead tile still cost a grid step
    (~0.35 us) — ~50 ms/view at the stress shape's 41% occupancy, where
    147k of 196k grid steps were dead.  The dynamic inner loop makes the
    cost Sum_s ceil(n_s/T)^2 tile-visits — the reference's own O(R^2)
    per-segment verify cost (cudawrapper.cu:656-706) — with no dead
    visits at all.

    The per-camera maxima accumulate in a [num_cams, m_tile] VMEM scratch
    across the inner loop; the merge orders m2 slots by (camera, target)
    ascending, so one m2 tile spans a narrow camera RANGE (~2-3 of N at
    production density) and the reduction passes outside the prefetched
    [camlo, camhi] of the tile are predicated out.  Semantics identical
    to _kernel (equivalence-tested in tests/test_pallas.py)."""
    M = m_slots
    TM = m_tile
    T = m2_tile
    f32 = jnp.float32
    s = pl.program_id(0)
    tm = pl.program_id(1)
    num_t2 = M // T
    need = need_ref[s]   # scalar-prefetch operand: whole [S] i32 in SMEM
    n_live = (need + (T - 1)) // T
    params = (params_ref[0, 0], params_ref[0, 1], params_ref[0, 2],
              params_ref[0, 3])

    def row(k):                       # [1, TM] — m (scored match) axis
        return pm_m_ref[0, k:k + 1, :]

    acc_ref[...] = jnp.zeros((num_cams, TM), f32)

    def copy_t(t, slot):
        return pltpu.make_async_copy(
            pm_hbm_ref.at[s, :, pl.ds(t * T, T)],
            buf_ref.at[slot],
            sem_ref.at[slot])

    @pl.when(tm * TM < need)
    def _compute_all():
        copy_t(0, 0).start()

        def body(t, carry):
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < n_live)
            def _prefetch():
                copy_t(t + 1, 1 - slot).start()

            copy_t(t, slot).wait()
            conf, cam_col = _conf_plane(
                row, buf_ref[slot],
                lambda k: atab_ref[0, k], lambda k: btab_ref[0, 0, k],
                params, t * T, tm * TM, (T, TM), num_cams)

            cam_lo = camlo_ref[s * num_t2 + t]
            cam_hi = camhi_ref[s * num_t2 + t]
            for n in range(num_cams):
                @pl.when((cam_lo <= n) & (n <= cam_hi))
                def _upd(n=n):
                    cmax = jnp.max(
                        jnp.where(cam_col == f32(n), conf, f32(0)),
                        axis=0, keepdims=True)
                    acc_ref[n:n + 1, :] = jnp.maximum(acc_ref[n:n + 1, :],
                                                      cmax)
            return carry

        jax.lax.fori_loop(0, n_live, body, 0)

    cam_row, valid_row = row(_CAM), row(_VALID)
    total = jnp.zeros((1, TM), f32)
    for n in range(num_cams):
        total = total + jnp.where(cam_row == f32(n), f32(0),
                                  acc_ref[n:n + 1, :])
    out_ref[0, 0:1, :] = jnp.where(valid_row > 0.5, total, f32(0))


def _div_up_to(M: int, cap: int) -> int:
    """Largest power-of-two divisor of M not exceeding cap (M is padded
    to a multiple of 128 upstream)."""
    d = cap
    while d > 8 and M % d:
        d //= 2
    return d


def _tiles_for(M: int) -> tuple:
    """(m_tile, m2_tile) for the tiled kernel: the scored-match (lane) and
    supporting-match (sublane) tile sizes.  M <= 256 runs untiled.

    Swept on real hardware for the r05 dynamic-inner-loop kernel
    (scripts/scoring_tile_bench.py at M=1024 synthetic occupancies,
    scripts/scoring_tile_sweep_m2048.py at the real stress occupancy,
    ms/iter):

      M=1024 mix200_500: 512x256 41.6 / 512x512 41.2 / 512x128 42.0 /
                         256x256 54.3 / 1024x256 67.6
      M=1024 const700:   1024x256 108 / 512x256 124.8 / 256x256 130.4 /
                         512x128 143.2
      M=2048 stress p50~870: 512x128 178.2 / 512x256 181.4 /
                         1024x128 191.9 / 256x256 208.1 / 128x128 346

    With the m2 axis an in-kernel loop, the per-(row, m-tile) grid-step
    cost dominates the overheads, so 512-wide LANE tiles now win across
    every measured occupancy (they halve the grid) — the old
    static-grid sweep that picked 256x256 no longer applies.  512x256
    is within 2% of the per-distribution winner everywhere except the
    adversarial constant-700 case (1024 lanes win there by quantization
    luck) and is the default; the m2 tile stays 256 (128 loses up to
    15% at uniform-high occupancy, bigger loses VMEM headroom).
    """
    if M <= 256:
        return M, M
    return _div_up_to(M, 512), _div_up_to(M, 256)


@functools.partial(jax.jit, static_argnames=("support_threshold",
                                             "interpret"))
def score_matches_pallas(segs_src, mask_src, RtKinv_src, C_src,
                         cam, tgt, depths, valid,
                         P_nb, segs_nb,
                         sigma_p, sigma_a, spatial_k,
                         support_threshold=0.5,
                         interpret: bool = False, tcoords=None):
    """Drop-in Pallas replacement for scoring.score_matches.

    M (the match-slot axis) must be a multiple of 128.  sigma_p / sigma_a /
    spatial_k are baked into the kernel as compile-time constants (they are
    config values, constant across a run).  M > 256 dispatches the m2-tiled
    kernel (grid (S, M/tile, M/tile)) so uncapped-fallback capacities fit
    VMEM.
    """
    S, M = cam.shape
    N = P_nb.shape[0]
    St = segs_nb.shape[1]
    assert M % 128 == 0, M
    f32 = jnp.float32

    p1, p2 = g.seg_endpoints(segs_src)              # [S, 3]
    ray1 = g.ray_dir(RtKinv_src, p1)
    ray2 = g.ray_dir(RtKinv_src, p2)

    # target segment coords per match: [S, M, 4] gather (shared with the
    # depth recompute when provided), then elementwise [S, M] planes (no
    # [S, M, 3] minor-dim intermediates)
    cam_s = jnp.maximum(cam, 0)
    if tcoords is None:
        from .pairwise import gather_target_coords
        tcoords = gather_target_coords(segs_nb, cam, tgt)
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

    # slot order must match the _D1.._DIRZ indices above
    planes = [d1, d2, cam.astype(f32), valid.astype(f32),
              tlx, tly, tlz, itden,
              q1x, q1y, q2x, q2y,
              dirn[0], dirn[1], dirn[2],
              jnp.zeros((S, M), f32)]
    pm_row = jnp.stack(planes, axis=1)               # [S, 16, M]

    # projection-affinity tables (see the kernel comment): the projection
    # of C_src + d*ray into camera n is a_n + d * (P_n[:,:3] ray), so per
    # (segment, camera) only the 3-vector b = P_n[:,:3] ray rides to the
    # kernel (x2 rays), and per camera the constant a_n = P_n [C_src; 1].
    # Explicit elementwise sums — no einsum, so no bf16 truncation risk.
    Pr = P_nb.astype(f32)                            # [N, 3, 4]
    btabs = []
    for ray in (ray1, ray2):
        for r in range(3):
            btabs.append(Pr[None, :, r, 0] * ray[:, None, 0]
                         + Pr[None, :, r, 1] * ray[:, None, 1]
                         + Pr[None, :, r, 2] * ray[:, None, 2])  # [S, N]
    # per-camera layout [n*6 + k]: k = 0..2 ray1 rows, 3..5 ray2 rows
    btab = jnp.stack(btabs, axis=2)                  # [S, N, 6]
    btab = btab.reshape(S, 1, N * 6)
    atab = (Pr[:, :, 0] * C_src[0] + Pr[:, :, 1] * C_src[1]
            + Pr[:, :, 2] * C_src[2] + Pr[:, :, 3])  # [N, 3]
    atab = atab.reshape(1, N * 3)

    params = jnp.stack([
        1.0 / (2.0 * sigma_p * sigma_p),
        1.0 / (2.0 * sigma_a * sigma_a),
        spatial_k,
        jnp.float32(support_threshold),
    ]).astype(f32).reshape(1, 4)

    m_tile, m2_tile = _tiles_for(M)
    if m_tile == M and m2_tile == M:
        kernel = functools.partial(_kernel, num_cams=N, m_slots=M)
        conf = pl.pallas_call(
            kernel,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _PM, M), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, N * 6), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N * 3), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, M), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, 1, M), f32),
            interpret=interpret,
        )(params, pm_row, btab, atab)
        return conf[:, 0, :]

    # adaptive skip bound per row: the merge packs valid slots first, so
    # 1 + (last valid index) bounds the live tile range on both axes (for
    # unpacked inputs this degrades to a conservative bound, never a wrong
    # skip)
    idx = jax.lax.broadcasted_iota(jnp.int32, (S, M), 1)
    need = jnp.max(jnp.where(valid, idx + 1, 0), axis=1) \
        .astype(jnp.int32)                                # [S]
    # per-(row, m2-tile) camera range for the predicated reduce (empty
    # tiles get lo > hi, skipping every pass)
    n_t2 = M // m2_tile
    cam_t = cam_s.reshape(S, n_t2, m2_tile)
    valid_t = valid.reshape(S, n_t2, m2_tile)
    # FLAT [S * n_t2] (2-D SMEM prefetch operands pad to 512 B/row and
    # overflow the 1 MB SMEM at S >= 2048)
    camlo = jnp.min(jnp.where(valid_t, cam_t, N), axis=2) \
        .astype(jnp.int32).reshape(S * n_t2)
    camhi = jnp.max(jnp.where(valid_t, cam_t, -1), axis=2) \
        .astype(jnp.int32).reshape(S * n_t2)

    kernel = functools.partial(_kernel_tiled, num_cams=N, m_slots=M,
                               m_tile=m_tile, m2_tile=m2_tile)
    # need/camlo/camhi ride as scalar-prefetch operands (a plain [S, 1]
    # SMEM input window is padded to 512 B/row by Mosaic and blows the
    # 1 MB SMEM at S >= 2048; flat 1-D arrays are packed tight); the pm
    # table is passed TWICE — once window-fetched for the m (lane) axis,
    # once as a raw HBM ref the kernel's inner loop copies m2 tiles from
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, M // m_tile),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, tm, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _PM, m_tile), lambda i, tm, *_: (i, 0, tm),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, N * 6), lambda i, tm, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N * 3), lambda i, tm, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, m_tile),
                               lambda i, tm, *_: (i, 0, tm),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, _PM, m2_tile), f32),
                        pltpu.VMEM((N, m_tile), f32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    conf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, 1, M), f32),
        interpret=interpret,
    )(need, camlo, camhi, params, pm_row, pm_row, btab, atab)
    return conf[:, 0, :]
