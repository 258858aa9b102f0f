"""Collinearity export-cap correctness: drops must be loud and repairable.

The reference keeps EVERY collinear pair in a per-view sparse map
(segments.h:76-100); line3d_tpu bounds the device->host export by a
per-128-block quota and a flat per-view cap.  The contract under test
(mirrors tests/test_caps.py for the match caps):

  * any drop prints an unconditional warning and is counted in
    CollinMaps.dropped_per_view / Line3D.stats["collinearity_overflow"],
  * apply_collinearity_exact_fallback re-derives exactly the overflowed
    views from the dense [S, S] matrix, restoring reference semantics,
  * end-to-end, a quota-saturating run with the guard equals a run whose
    quota/cap never saturate.
"""
import dataclasses

import numpy as np
import pytest

from line3d_tpu import Line3D, L3DConfig
from line3d_tpu.match import collinearity as coll_mod
from synthetic import make_scene


def _split_collinear(segs: np.ndarray, k: int) -> np.ndarray:
    """Split each [N, 4] segment into k collinear, non-overlapping pieces
    (gaps between pieces so the no-overlap gate passes) — every piece then
    has k-1 collinear partners, saturating small block quotas."""
    p1 = segs[:, :2][:, None, :]
    p2 = segs[:, 2:][:, None, :]
    t0 = (np.arange(k, dtype=np.float32) / k)[None, :, None]
    t1 = t0 + 0.62 / k
    a = p1 + t0 * (p2 - p1)
    b = p1 + t1 * (p2 - p1)
    return np.concatenate([a, b], axis=-1).reshape(-1, 4).astype(np.float32)


def _collinear_row_view(n: int = 16):
    """One view: n collinear pieces along a single image line."""
    base = np.array([[50.0, 60.0, 560.0, 420.0]], np.float32)
    segs = _split_collinear(base, n)
    S = 128
    out = np.zeros((1, S, 4), np.float32)
    mask = np.zeros((1, S), bool)
    out[0, :n] = segs
    mask[0, :n] = True
    return out, mask


def test_drop_warns_unconditionally_and_is_counted(capsys):
    segs, mask = _collinear_row_view(16)
    maps = coll_mod.collinearity_maps_fast(segs, mask, 2.0, quota=1,
                                           pairs_per_seg=1)
    out = capsys.readouterr().out
    assert "WARNING" in out and "collinearity" in out
    assert maps.dropped_total > 0
    assert maps.dropped_per_view[0] > 0


def test_exact_fallback_restores_dense_oracle():
    segs, mask = _collinear_row_view(16)
    maps = coll_mod.collinearity_maps_fast(segs, mask, 2.0, quota=1,
                                           pairs_per_seg=1)
    assert maps.dropped_total > 0
    patched, n = coll_mod.apply_collinearity_exact_fallback(
        maps, segs, mask, 2.0)
    assert n == 1 and patched.dropped_total == 0

    oracle = coll_mod.collinearity_maps(segs, mask, 2.0)
    assert set(patched[0]) == set(oracle[0])
    for i, d in oracle[0].items():
        assert set(patched[0][i]) == set(d)
        for j, w in d.items():
            assert patched[0][i][j] == pytest.approx(w, rel=1e-6)
    # flat arrays rebuilt consistently (sorted by (view, i, j))
    order = np.lexsort((patched.flat_j, patched.flat_i, patched.flat_view))
    np.testing.assert_array_equal(order, np.arange(len(patched.flat_view)))
    assert len(patched.flat_w) == sum(len(d) for d in oracle[0].values())


def test_fallback_splices_only_overflowed_views():
    """Multi-view: only the saturating view is recomputed; other views'
    flat slices and maps are byte-identical to before."""
    segs0, mask0 = _collinear_row_view(16)
    # second view: two far-apart collinear pieces (no saturation)
    segs1 = np.zeros_like(segs0)
    mask1 = np.zeros_like(mask0)
    segs1[0, 0] = [10.0, 10.0, 100.0, 100.0]
    segs1[0, 1] = [150.0, 150.0, 240.0, 240.0]
    mask1[0, :2] = True
    segs = np.concatenate([segs1, segs0, segs1])
    mask = np.concatenate([mask1, mask0, mask1])

    maps = coll_mod.collinearity_maps_fast(segs, mask, 2.0, quota=1,
                                           pairs_per_seg=1)
    assert maps.dropped_per_view[1] > 0
    assert maps.dropped_per_view[0] == 0 and maps.dropped_per_view[2] == 0
    before0, before2 = dict(maps[0]), dict(maps[2])
    patched, n = coll_mod.apply_collinearity_exact_fallback(
        maps, segs, mask, 2.0)
    assert n == 1
    assert patched[0] == before0 and patched[2] == before2
    for v in range(3):
        sel = patched.flat_view == v
        ii, jj = patched.flat_i[sel], patched.flat_j[sel]
        assert {(int(i), int(j)) for i, j in zip(ii, jj)} == \
            {(i, j) for i, d in patched[v].items() for j in d}


def _split_syn(num_views=8, k=6):
    syn = make_scene(num_views=num_views)
    seg_lists = [_split_collinear(syn.scene.segments[v][syn.scene.seg_mask[v]],
                                  k)
                 for v in range(syn.scene.num_views)]
    return syn, seg_lists


def test_pipeline_guard_end_to_end_matches_unsaturated():
    """Full pipeline: a quota-saturating config with the exact fallback must
    produce the SAME final 3D lines as a config whose quota never saturates.
    This is the test that fails when the collinearity cap silently drops
    result-changing pairs."""
    syn, seg_lists = _split_syn()

    def run(cfg):
        l3d = Line3D(config=cfg)
        for v in range(syn.scene.num_views):
            l3d.add_view_segments(
                v, seg_lists[v], syn.cameras.K[v], syn.cameras.R[v],
                syn.cameras.t[v], worldpoint_ids=syn.wp_lists[v],
                width=640, height=480)
        res = l3d.compute_3d_model(perform_diffusion=False)
        return res, l3d.stats

    tiny = dataclasses.replace(L3DConfig(), collinearity_block_quota=1,
                               collinearity_pairs_per_seg=1,
                               collinearity_exact_fallback=True)
    big = dataclasses.replace(L3DConfig(), collinearity_block_quota=128)
    res_t, stats_t = run(tiny)
    res_b, stats_b = run(big)

    assert stats_t["collinearity_overflow"] > 0
    assert stats_t["views_recollin_exact"] > 0
    assert stats_b["collinearity_overflow"] == 0

    def keysets(res):
        return sorted(frozenset(zip(r.views2d.tolist(), r.segs2d.tolist()))
                      for r in res)
    assert keysets(res_t) == keysets(res_b)
    for rt, rb in zip(sorted(res_t, key=lambda r: len(r.segments3d)),
                      sorted(res_b, key=lambda r: len(r.segments3d))):
        np.testing.assert_allclose(rt.segments3d, rb.segments3d, rtol=1e-6)


def test_guard_off_warns_and_counts(capsys):
    syn, seg_lists = _split_syn()
    cfg = dataclasses.replace(L3DConfig(), collinearity_block_quota=1,
                              collinearity_pairs_per_seg=1,
                              collinearity_exact_fallback=False)
    l3d = Line3D(config=cfg)
    for v in range(syn.scene.num_views):
        l3d.add_view_segments(
            v, seg_lists[v], syn.cameras.K[v], syn.cameras.R[v],
            syn.cameras.t[v], worldpoint_ids=syn.wp_lists[v],
            width=640, height=480)
    l3d.compute_3d_model(perform_diffusion=False)
    out = capsys.readouterr().out
    assert "WARNING" in out and "collinearity" in out
    assert l3d.stats["collinearity_overflow"] > 0
    assert l3d.stats["views_recollin_exact"] == 0
