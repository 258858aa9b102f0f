"""Matching + verification tests on the synthetic wireframe scene."""
import numpy as np
import jax.numpy as jnp

from line3d_tpu.config import L3DConfig
from line3d_tpu.core.conditioning import compute_conditioning
from line3d_tpu.match import pairwise, engine
from line3d_tpu.scene import view_similarities_from_worldpoints, \
    find_visual_neighbors
from synthetic import make_scene


def _f32(x):
    return jnp.asarray(np.asarray(x, np.float32))


def test_pairwise_match_recovers_true_depths():
    syn = make_scene(num_views=6)
    cams = syn.cameras
    sc = syn.scene
    v, n = 0, 1

    F = cams.fundamental(v, n).astype(np.float32)
    depth_planes, valid = pairwise.match_pair_dense(
        _f32(sc.segments[v]), _f32(sc.segments[n]),
        jnp.asarray(sc.seg_mask[v]), jnp.asarray(sc.seg_mask[n]),
        jnp.asarray(F), _f32(cams.RtKinv[v]), _f32(cams.RtKinv[n]),
        _f32(cams.C[v]), _f32(cams.C[n]))
    depths = np.stack([np.asarray(d) for d in depth_planes], axis=-1)
    valid = np.asarray(valid)

    # every ground-truth co-visible line must be matched with correct depths
    ids_v = syn.seg_line_id[v]
    ids_n = syn.seg_line_id[n]
    common = set(ids_v) & set(ids_n)
    assert len(common) >= 4
    hits = 0
    for li in common:
        i = int(np.nonzero(ids_v == li)[0][0])
        j = int(np.nonzero(ids_n == li)[0][0])
        if not valid[i, j]:
            continue
        hits += 1
        d = depths[i, j]
        td_v = syn.true_depths[v][i]
        np.testing.assert_allclose(d[0], td_v[0], rtol=2e-2)
        np.testing.assert_allclose(d[1], td_v[1], rtol=2e-2)
        td_n = syn.true_depths[n][j]
        np.testing.assert_allclose(d[2], td_n[0], rtol=2e-2)
        np.testing.assert_allclose(d[3], td_n[1], rtol=2e-2)
    assert hits >= max(2, len(common) // 2)


def test_soa_kernel_matches_reference_formulation():
    """The SoA production kernel must agree with the readable AoS version."""
    syn = make_scene(num_views=6)
    cams = syn.cameras
    sc = syn.scene
    v, n = 2, 4
    F = cams.fundamental(v, n).astype(np.float32)
    args = (_f32(sc.segments[v]), _f32(sc.segments[n]),
            jnp.asarray(sc.seg_mask[v]), jnp.asarray(sc.seg_mask[n]),
            jnp.asarray(F), _f32(cams.RtKinv[v]), _f32(cams.RtKinv[n]),
            _f32(cams.C[v]), _f32(cams.C[n]))
    d_ref, v_ref = pairwise.match_pair_dense_reference(*args)
    d_soa, v_soa = pairwise.match_pair_dense(*args)
    v_ref = np.asarray(v_ref)
    v_soa = np.asarray(v_soa)
    # identical gating except float-rounding borderliners
    assert (v_ref != v_soa).mean() < 1e-3
    both = v_ref & v_soa
    d_ref = np.asarray(d_ref)
    d_soa = np.stack([np.asarray(d) for d in d_soa], axis=-1)
    # the AoS formulation is the LESS precise of the two (its jnp.cross
    # chains lose ~1e-2 relative to float64 through f32 cancellation; the
    # SoA kernel fuses the expanded expressions with FMAs and sits at ~1e-7
    # of the f64 result) — tolerance reflects the AoS error, not the SoA's
    np.testing.assert_allclose(d_ref[both], d_soa[both], rtol=4e-2, atol=1e-3)
    rel = np.abs(d_ref - d_soa)[both] / np.abs(d_ref[both])
    assert np.median(rel) < 5e-3


def test_compact_rows_order_and_overflow():
    valid = np.zeros((3, 8), bool)
    valid[0, [1, 3, 7]] = True
    valid[2, [0, 2, 4, 5, 6]] = True
    depths = np.arange(3 * 8 * 4, dtype=np.float32).reshape(3, 8, 4)
    tgt, dg, kept, n_valid = pairwise.compact_rows(
        jnp.asarray(depths), jnp.asarray(valid), 4)
    tgt = np.asarray(tgt)
    # ascending target order, -1 padded
    assert tgt[0].tolist() == [1, 3, 7, -1]
    assert tgt[1].tolist() == [-1, -1, -1, -1]
    assert tgt[2].tolist() == [0, 2, 4, 5]       # 5th match dropped by cap
    assert np.asarray(n_valid).tolist() == [3, 0, 5]
    np.testing.assert_allclose(np.asarray(dg)[0, 0], depths[0, 1])


def test_full_matching_engine():
    syn = make_scene(num_views=8)
    cams = syn.cameras
    sc = syn.scene
    cfg = L3DConfig(min_baseline=0.25)

    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)

    sim, _ = view_similarities_from_worldpoints(syn.wp_lists, sc.num_views)
    neighbors = find_visual_neighbors(sim, cams.baselines(),
                                      cfg.min_baseline, cfg.matching_neighbors)
    assert all(len(n) > 0 for n in neighbors)

    matches, best, med = engine.run_matching(sc, cams, neighbors, cfg)
    assert len(matches) == sc.num_views
    assert best.view.size > 0

    # verified best matches must correspond to the same ground-truth 3D line
    correct = 0
    total = 0
    for k in range(best.view.size):
        v = int(best.view[k]); s = int(best.seg[k])
        tv = int(best.tgt_view[k]); ts = int(best.tgt_seg[k])
        total += 1
        if syn.seg_line_id[v][s] == syn.seg_line_id[tv][ts]:
            correct += 1
    assert total > 10
    assert correct / total > 0.9, f"{correct}/{total}"

    # unprojected 3D endpoints (conditioned space) must match ground truth
    # after inverse conditioning
    P1 = tr.inverse_transform_points(best.P1)
    P2 = tr.inverse_transform_points(best.P2)
    errs = []
    for k in range(best.view.size):
        v = int(best.view[k]); s = int(best.seg[k])
        li = syn.seg_line_id[v][s]
        A, B = syn.lines3d[li]
        d = B - A
        d = d / np.linalg.norm(d)
        for P in (P1[k], P2[k]):
            err = np.linalg.norm(np.cross(P - A, d))
            errs.append(err)
    assert np.median(errs) < 0.02   # scene scale ~1

    # median depths should be near the camera-to-scene distance (~4)
    assert np.all(med > 0)


def test_blockq_compaction_semantics():
    valid = np.zeros((2, 256), bool)
    valid[0, [1, 3, 130, 131, 255]] = True
    # block 1 has 10 valid entries -> quota 8 drops the two largest
    valid[1, 128 + np.arange(10) * 3] = True
    tgt, kept, n_valid = pairwise.compact_rows_blockq(jnp.asarray(valid), 8)
    tgt = np.asarray(tgt)
    kept = np.asarray(kept)
    # row 0: block 0 -> [1, 3], block 1 -> [130, 131, 255]
    assert tgt[0][kept[0]].tolist() == [1, 3, 130, 131, 255]
    assert tgt[1][kept[1]].tolist() == (128 + np.arange(8) * 3).tolist()
    assert np.asarray(n_valid).tolist() == [5, 10]


def test_blockq_pipeline_matches_dense_path():
    """merge + depths_for_matches must reproduce the dense per-pair depths
    for every kept match (same math evaluated at the compacted shape)."""
    syn = make_scene(num_views=6)
    cams = syn.cameras
    sc = syn.scene
    v = 0
    nb = np.array([1, 2], np.int64)
    S = sc.max_segments
    F_nb = cams.fundamentals_for_pairs(
        np.stack([np.full(len(nb), v), nb], axis=1)).astype(np.float32)
    segs_nb = _f32(sc.segments[nb])
    mask_nb = jnp.asarray(sc.seg_mask[nb])
    RtKinv_nb = _f32(cams.RtKinv[nb])
    C_nb = _f32(cams.C[nb])

    res = pairwise.match_view_against_neighbors(
        _f32(sc.segments[v]), jnp.asarray(sc.seg_mask[v]),
        _f32(cams.RtKinv[v]), _f32(cams.C[v]),
        segs_nb, mask_nb, jnp.asarray(F_nb), RtKinv_nb, C_nb,
        jnp.asarray(np.ones(len(nb), bool)), quota=8, min_capacity=S)
    cam, tgt, valid = pairwise.merge_neighbor_tables(res, 256, S)
    depths = pairwise.depths_for_matches(
        _f32(sc.segments[v]), segs_nb, cam, tgt, valid,
        jnp.asarray(F_nb), _f32(cams.RtKinv[v]), RtKinv_nb,
        _f32(cams.C[v]), C_nb)
    cam, tgt, valid, depths = map(np.asarray, (cam, tgt, valid, depths))

    # dense reference per neighbor
    for slot, n in enumerate(nb):
        dd, vv = pairwise.match_pair_dense(
            _f32(sc.segments[v]), _f32(sc.segments[n]),
            jnp.asarray(sc.seg_mask[v]), jnp.asarray(sc.seg_mask[n]),
            jnp.asarray(F_nb[slot]), _f32(cams.RtKinv[v]),
            _f32(cams.RtKinv[n]), _f32(cams.C[v]), _f32(cams.C[n]))
        vv = np.asarray(vv)
        dd = np.stack([np.asarray(d) for d in dd], axis=-1)
        want = {(s, j) for s, j in zip(*np.nonzero(vv))}
        got = {(s, int(tgt[s, m]))
               for s, m in zip(*np.nonzero(valid & (cam == slot)))}
        assert got == want, f"neighbor {n}: match sets differ"
        for s, m in zip(*np.nonzero(valid & (cam == slot))):
            np.testing.assert_allclose(
                depths[s, m], dd[s, tgt[s, m]], rtol=1e-4, atol=1e-5)

    # merged table ordered by (cam, tgt) ascending within kept slots
    per_row = [row[np.asarray(valid[i], bool)]
               for i, row in enumerate(cam.astype(np.int64) * S + tgt)]
    for row in per_row:
        assert np.all(np.diff(row) > 0)


def test_collinearity_fast_matches_dense():
    """Device-compacted collinearity maps == dense-matrix maps."""
    from line3d_tpu.match import collinearity as col
    rng = np.random.default_rng(0)
    S = 128
    segs = np.zeros((2, S, 4), np.float32)
    mask = np.zeros((2, S), bool)
    for v in range(2):
        k = 0
        # families of collinear, non-overlapping segments + noise segments
        for fam in range(8):
            x0, y0 = rng.uniform(0, 200, 2)
            th = rng.uniform(0, np.pi)
            c, s_ = np.cos(th), np.sin(th)
            t = 0.0
            for piece in range(4):
                L = rng.uniform(15, 40)
                gap = rng.uniform(3, 10)
                segs[v, k] = [x0 + t*c + rng.normal(0, 0.2),
                              y0 + t*s_ + rng.normal(0, 0.2),
                              x0 + (t+L)*c, y0 + (t+L)*s_]
                mask[v, k] = True
                k += 1
                t += L + gap
        for _ in range(30):
            segs[v, k] = rng.uniform(0, 300, 4)
            mask[v, k] = True
            k += 1
    slow = col.collinearity_maps(segs, mask, 2.0)
    fast = col.collinearity_maps_fast(segs, mask, 2.0)
    assert len(slow) == len(fast)
    n_pairs = 0
    for dv_s, dv_f in zip(slow, fast):
        assert dv_s.keys() == dv_f.keys()
        for i in dv_s:
            assert dv_s[i].keys() == dv_f[i].keys()
            for j in dv_s[i]:
                np.testing.assert_allclose(dv_s[i][j], dv_f[i][j],
                                           rtol=1e-5, atol=1e-6)
                n_pairs += 1
    assert n_pairs > 0

    # the flat CSR arrays a CollinMaps carries must agree with its dicts
    # (bulk consumers read the arrays, cluster/affinity._collin_csr)
    assert fast.flat_view is not None
    rebuilt = [dict() for _ in range(len(fast))]
    for v, i, j, wij in zip(fast.flat_view.tolist(), fast.flat_i.tolist(),
                            fast.flat_j.tolist(), fast.flat_w.tolist()):
        rebuilt[v].setdefault(i, {})[j] = wij
    for dv_f, dv_r in zip(fast, rebuilt):
        assert dv_f.keys() == dv_r.keys()
        for i in dv_f:
            assert dv_f[i] == dv_r[i]
    # sorted by (view, i, j) — the order _collin_csr's CSR relies on
    key = (fast.flat_view.astype(np.int64) * S * S
           + fast.flat_i.astype(np.int64) * S + fast.flat_j)
    assert (np.diff(key) > 0).all()


def test_support_threshold_plumbed():
    """config.support_threshold must reach the scoring kernel: raising the
    per-support gate can only lower confidences, and a gate above 1.0
    (support conf is <= 1 per camera before summation) kills all scores."""
    import jax.numpy as jnp
    from line3d_tpu.config import L3DConfig
    from line3d_tpu.core.conditioning import compute_conditioning
    from line3d_tpu.match import engine
    from line3d_tpu.scene import view_similarities_from_worldpoints, \
        find_visual_neighbors
    from synthetic import make_scene

    syn = make_scene(num_views=8)
    cams = syn.cameras
    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)
    sim, _ = view_similarities_from_worldpoints(syn.wp_lists, 8)
    neighbors = find_visual_neighbors(sim, cams.baselines(), 0.25, 4)

    def n_best(support_t):
        cfg = L3DConfig(use_collinearity=False, matching_neighbors=4,
                        support_threshold=support_t)
        _, best, _ = engine.run_matching(syn.scene, cams, neighbors, cfg)
        return best.view.size

    lo = n_best(0.5)
    hi = n_best(0.99)
    assert lo > 0
    assert hi <= lo          # stricter gate cannot add best matches
    assert n_best(1.01) == 0 # gate above the per-camera max kills all
