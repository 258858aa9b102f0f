"""Clustering-stage tests: F-H semantics (native vs python), diffusion."""
import numpy as np

from line3d_tpu.cluster import fh, diffusion
from line3d_tpu.native import load as native_load


def random_graph(n, e, seed):
    rng = np.random.default_rng(seed)
    i = rng.integers(0, n, e).astype(np.int64)
    j = rng.integers(0, n, e).astype(np.int64)
    keep = i != j
    i, j = i[keep], j[keep]
    w = rng.uniform(0.0, 1.0, len(i))
    return i, j, w


def canon(labels):
    """Canonical partition: map labels to first-occurrence ids."""
    seen = {}
    out = np.empty(len(labels), np.int64)
    for k, l in enumerate(labels):
        out[k] = seen.setdefault(int(l), len(seen))
    return out


def test_fh_native_matches_python():
    if native_load.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    for seed in range(5):
        i, j, w = random_graph(50, 300, seed)
        lp = fh.fh_cluster_python(i, j, w, 50, 1.0)
        ln = fh.fh_cluster(i, j, w, 50, 1.0)
        np.testing.assert_array_equal(canon(lp), canon(ln))


def test_fh_merge_semantics():
    # chain 0-1-2 with increasing weights and c=1:
    # edge (0,1,w=0.2): thr=1 both -> join, new thr = 0.2 + 1/2 = 0.7
    # edge (1,2,w=0.5): thr[root01]=0.7, thr[2]=1 -> 0.5 <= both -> join
    # edge (3,4,w=0.9): join (thr 1).  edge (2,3,w=0.95): thr[root012]=
    #   0.5+1/3=0.833 -> 0.95 > 0.833 -> NO join
    i = np.array([0, 1, 3, 2], np.int64)
    j = np.array([1, 2, 4, 3], np.int64)
    w = np.array([0.2, 0.5, 0.9, 0.95])
    labels = canon(fh.fh_cluster_python(i, j, w, 5, 1.0))
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]


def test_fh_stable_tie_order():
    # two equal-weight edges: emission order decides which merges first;
    # with c small enough only one merge happens
    i = np.array([0, 1], np.int64)
    j = np.array([1, 2], np.int64)
    w = np.array([0.6, 0.6])
    labels = canon(fh.fh_cluster_python(i, j, w, 3, 1.0))
    # both joins pass here (thresholds allow), ending in one cluster
    assert labels[0] == labels[1] == labels[2]
    # with c = 0.65: first join -> thr = 0.6+0.65/2 = 0.925, second edge w
    # 0.6 <= 0.925 and <= 0.65 -> joins too; with c = 0.55 second join is
    # blocked only via threshold[b]... construct blocking case:
    labels = canon(fh.fh_cluster_python(
        np.array([0, 1], np.int64), np.array([1, 2], np.int64),
        np.array([0.5, 0.8]), 3, 0.6))
    # second edge: thr[root01] = 0.5 + 0.6/2 = 0.8 -> 0.8 <= 0.8 joins;
    # thr[2] = 0.6 -> 0.8 > 0.6 -> blocked
    assert labels[0] == labels[1] != labels[2]


def _ari(a, b):
    """Adjusted Rand index via a sparse contingency table."""
    _, ia = np.unique(a, return_inverse=True)
    _, ib = np.unique(b, return_inverse=True)
    key = ia.astype(np.int64) * (ib.max() + 1) + ib
    _, cnt = np.unique(key, return_counts=True)

    def c2(x):
        return (x * (x - 1.0) / 2.0).sum()

    sum_ij = c2(cnt)
    sum_a = c2(np.bincount(ia))
    sum_b = c2(np.bincount(ib))
    n = len(a)
    tot = n * (n - 1.0) / 2.0
    exp = sum_a * sum_b / tot
    mx = 0.5 * (sum_a + sum_b)
    return (sum_ij - exp) / (mx - exp) if mx != exp else 1.0


def _identical_cluster_fraction(exact, par):
    """Fraction of exact clusters whose member set is exactly one
    parallel cluster."""
    _, ie = np.unique(exact, return_inverse=True)
    _, ip = np.unique(par, return_inverse=True)
    key = ie.astype(np.int64) * (ip.max() + 1) + ip
    uk, cnt = np.unique(key, return_counts=True)
    se = np.bincount(ie)
    sp = np.bincount(ip)
    ke = (uk // (ip.max() + 1)).astype(int)
    kp = (uk % (ip.max() + 1)).astype(int)
    return ((cnt == se[ke]) & (cnt == sp[kp])).sum() / len(se)


def test_fh_reverse_duplicate_drop_is_exact():
    """fh_cluster drops the second direction of consecutively-emitted
    symmetric edges before sorting (a provable no-op in the scan — see
    _drop_reverse_duplicates); labels must be bit-identical to the
    unfiltered native run on an _emit_graph-style interleaved stream."""
    if native_load.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(9)
    n, e_und = 500, 4000
    a = rng.integers(0, n, e_und)
    b = rng.integers(0, n, e_und)
    k = a != b
    a, b = a[k], b[k]
    w = rng.uniform(0.05, 1.2, len(a))
    # interleave both directions like affinity._emit_graph
    ei = np.empty(2 * len(a), np.int64)
    ej = np.empty(2 * len(a), np.int64)
    ew = np.empty(2 * len(a), np.float64)
    ei[0::2], ej[0::2], ew[0::2] = a, b, w
    ei[1::2], ej[1::2], ew[1::2] = b, a, w
    fi, fj, fw = fh._drop_reverse_duplicates(ei, ej, ew)
    assert len(fw) == len(a)             # exactly halved
    lab_filtered = fh.fh_cluster(ei, ej, ew, n, 0.3)
    lab_python = fh.fh_cluster_python(ei, ej, ew, n, 0.3)  # unfiltered
    assert np.array_equal(canon(lab_filtered), canon(lab_python))


def test_fh_parallel_exact_on_separated_weights():
    """When every admissible merge is weight-separated from its
    neighborhood (two tight blobs joined by a heavy edge), the
    mutual-minimal rounds reproduce the serial merge order exactly."""
    rng = np.random.default_rng(4)
    edges = []
    for base in (0, 10):
        for a in range(10):
            for b in range(a + 1, 10):
                edges.append((base + a, base + b,
                              rng.uniform(0.01, 0.05)))
    edges.append((3, 13, 0.9))       # inter-blob, blocked by thresholds
    i = np.array([e[0] for e in edges], np.int64)
    j = np.array([e[1] for e in edges], np.int64)
    w = np.array([e[2] for e in edges])
    ex = fh.fh_cluster_python(i, j, w, 20, 0.1)
    pa = fh.fh_cluster_parallel(i, j, w, 20, 0.1)
    assert np.array_equal(canon(ex), canon(pa))


def test_fh_parallel_agreement_production_density():
    """SURVEY §7.6 hard part #2 / VERDICT r04 item 4: the round-parallel
    mutual-minimal F-H prototype, measured cluster-for-cluster against
    the exact serial merge order AT PRODUCTION DENSITY (the affinity
    graph the pipeline actually clusters).  Recorded (PARITY.md):
    V=120 production graph (300k nodes, 3.6M edges) ARI 0.9990,
    identical-cluster fraction 0.985; adversarial uniform-weight random
    graphs diverge (ARI ~0.5) through the threshold-raising race the
    prototype's docstring describes — the exact native mode therefore
    stays the default and the parallel mode is the documented scale
    formulation."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from host_stage_scaling import synthesize
    from line3d_tpu.cluster import affinity

    V = 40
    cams, cfg, tr, best, matches, cm, S = synthesize(V)
    graph = affinity.build_affinity_graph(best, matches, cm, cams, cfg, S)
    assert graph.num_nodes > 10000
    ex = fh.fh_cluster(graph.edges_i, graph.edges_j, graph.edges_w,
                       graph.num_nodes, cfg.fh_c)
    pa = fh.fh_cluster_parallel(graph.edges_i, graph.edges_j,
                                graph.edges_w, graph.num_nodes, cfg.fh_c)
    a = _ari(ex, pa)
    f = _identical_cluster_fraction(ex, pa)
    assert a > 0.995, a
    assert f > 0.95, f
    # cluster-count agreement within 1%
    ne, np_ = len(np.unique(ex)), len(np.unique(pa))
    assert abs(ne - np_) < 0.01 * ne + 5, (ne, np_)


def _sym_edges():
    # small symmetric affinity graph (both directions, as the pipeline emits)
    base = [(0, 1, 0.9), (1, 2, 0.8), (2, 3, 0.7), (0, 2, 0.5)]
    i, j, w = [], [], []
    for a, b, x in base:
        i += [a, b]; j += [b, a]; w += [x, x]
    return (np.array(i, np.int64), np.array(j, np.int64),
            np.array(w, np.float64))


def test_diffusion_reference_properties():
    i, j, w = _sym_edges()
    oi, oj, ow = diffusion.diffuse_reference(i, j, w, 4, iterations=3)
    # pattern preserved, symmetric output, sorted by (i, j)
    assert len(ow) == len(w)
    assert np.all(np.diff(oi) >= 0)
    m = {}
    for a, b, x in zip(oi, oj, ow):
        m[(int(a), int(b))] = float(x)
    for (a, b), x in m.items():
        assert np.isclose(m[(b, a)], x), "not symmetric"
    assert np.all(ow >= 0)


def test_diffusion_true_properties():
    i, j, w = _sym_edges()
    oi, oj, ow = diffusion.diffuse_true(i, j, w, 4, iterations=3)
    assert len(ow) == len(w)
    m = {(int(a), int(b)): float(x) for a, b, x in zip(oi, oj, ow)}
    for (a, b), x in m.items():
        assert np.isclose(m[(b, a)], x)


def test_diffusion_strengthens_consistent_edges():
    """RDD should relatively strengthen edges inside a dense clique vs a
    weak bridge (the reason the reference offers it, README.txt:138-146)."""
    # clique {0,1,2} strong, bridge (2,3) weak, pendant (3,4)
    base = [(0, 1, 0.9), (1, 2, 0.9), (0, 2, 0.9), (2, 3, 0.3), (3, 4, 0.9)]
    i, j, w = [], [], []
    for a, b, x in base:
        i += [a, b]; j += [b, a]; w += [x, x]
    i, j, w = (np.array(i, np.int64), np.array(j, np.int64),
               np.array(w, np.float64))
    oi, oj, ow = diffusion.diffuse_true(i, j, w, 5, iterations=5)
    m = {(int(a), int(b)): float(x) for a, b, x in zip(oi, oj, ow)}
    assert m[(0, 1)] > m[(2, 3)]


def _random_sym_graph(n, e_und, seed):
    """Random symmetric COO graph (both directions present, no dups)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, e_und * 2)
    b = rng.integers(0, n, e_und * 2)
    keep = a < b
    pairs = np.unique(np.stack([a[keep], b[keep]], axis=1), axis=0)[:e_und]
    w_und = rng.uniform(0.05, 1.0, len(pairs))
    i = np.concatenate([pairs[:, 0], pairs[:, 1]])
    j = np.concatenate([pairs[:, 1], pairs[:, 0]])
    w = np.concatenate([w_und, w_und])
    return i.astype(np.int64), j.astype(np.int64), w.astype(np.float64)


def test_diffusion_device_matches_host():
    """The jitted device kernel reproduces the host reference-mode RDD
    (float32 vs float64 tolerance)."""
    from line3d_tpu.cluster import diffusion_device
    for seed in (0, 1):
        i, j, w = _random_sym_graph(60, 220, seed)
        hi, hj, hw = diffusion.diffuse_reference(i, j, w, 60, iterations=10)
        di, dj, dw = diffusion_device.diffuse_reference_device(
            i, j, w, 60, iterations=10)
        np.testing.assert_array_equal(hi, di)
        np.testing.assert_array_equal(hj, dj)
        np.testing.assert_allclose(hw, dw, rtol=2e-4, atol=1e-7)


def test_diffusion_device_backend_dispatch():
    from line3d_tpu.config import L3DConfig
    from line3d_tpu.cluster.affinity import AffinityGraph
    i, j, w = _random_sym_graph(20, 40, 3)
    g = AffinityGraph(edges_i=i.astype(np.int32), edges_j=j.astype(np.int32),
                      edges_w=w.astype(np.float32),
                      node_view=np.zeros(20, np.int32),
                      node_seg=np.arange(20, dtype=np.int32), num_nodes=20)
    g2 = AffinityGraph(edges_i=i.astype(np.int32),
                       edges_j=j.astype(np.int32),
                       edges_w=w.astype(np.float32),
                       node_view=np.zeros(20, np.int32),
                       node_seg=np.arange(20, dtype=np.int32), num_nodes=20)
    cfg_h = L3DConfig()
    cfg_d = L3DConfig(diffusion_backend="device")
    diffusion.run_diffusion(g, cfg_h)
    diffusion.run_diffusion(g2, cfg_d)
    np.testing.assert_array_equal(g.edges_i, g2.edges_i)
    np.testing.assert_allclose(g.edges_w, g2.edges_w, rtol=2e-4, atol=1e-6)


def test_diffusion_true_device_matches_host():
    """The merge-walk device kernel reproduces the host "true"-mode RDD
    (scipy SpMM, float64) within f32 tolerance — the published update
    P' = P^T ∘ (P·W), pattern-restricted (VERDICT r3 #8)."""
    from line3d_tpu.cluster import diffusion_device
    for seed in (0, 1):
        i, j, w = _random_sym_graph(60, 220, seed)
        hi, hj, hw = diffusion.diffuse_true(i, j, w, 60, iterations=10)
        di, dj, dw = diffusion_device.diffuse_true_device(
            i, j, w, 60, iterations=10)
        np.testing.assert_array_equal(hi, di)
        np.testing.assert_array_equal(hj, dj)
        np.testing.assert_allclose(hw, dw, rtol=2e-4, atol=1e-7)


def test_diffusion_true_device_sharded_matches_unsharded():
    """Edge-sharded "true"-mode diffusion over the 8-device CPU mesh must
    equal the single-device run (the gathers cross shards; XLA inserts the
    all-gather)."""
    import jax
    from line3d_tpu.cluster import diffusion_device
    from line3d_tpu.parallel import mesh as mesh_mod
    i, j, w = _random_sym_graph(50, 180, 4)
    mesh = mesh_mod.make_view_mesh(jax.devices()[:8])
    ui, uj, uw = diffusion_device.diffuse_true_device(i, j, w, 50,
                                                      iterations=6)
    si, sj, sw = diffusion_device.diffuse_true_device(i, j, w, 50,
                                                      iterations=6,
                                                      mesh=mesh)
    np.testing.assert_array_equal(ui, si)
    np.testing.assert_allclose(uw, sw, rtol=1e-6, atol=1e-9)


def test_diffusion_true_device_backend_dispatch():
    """run_diffusion routes mode="true" to the device kernel when the
    backend resolves to device."""
    from line3d_tpu.config import L3DConfig
    from line3d_tpu.cluster.affinity import AffinityGraph
    i, j, w = _random_sym_graph(20, 40, 5)
    mk = lambda: AffinityGraph(  # noqa: E731
        edges_i=i.astype(np.int32), edges_j=j.astype(np.int32),
        edges_w=w.astype(np.float32), node_view=np.zeros(20, np.int32),
        node_seg=np.arange(20, dtype=np.int32), num_nodes=20)
    g, g2 = mk(), mk()
    diffusion.run_diffusion(g, L3DConfig(diffusion_mode="true"))
    diffusion.run_diffusion(
        g2, L3DConfig(diffusion_mode="true", diffusion_backend="device"))
    np.testing.assert_array_equal(g.edges_i, g2.edges_i)
    np.testing.assert_allclose(g.edges_w, g2.edges_w, rtol=2e-4, atol=1e-6)


def test_diffusion_device_matches_host_zero_iterations():
    """iterations=0 edge case: the host twin still row-normalizes once
    before its (empty) loop; the device kernel must match."""
    from line3d_tpu.cluster import diffusion_device
    i, j, w = _random_sym_graph(40, 140, 2)
    hi, hj, hw = diffusion.diffuse_reference(i, j, w, 40, iterations=0)
    di, dj, dw = diffusion_device.diffuse_reference_device(
        i, j, w, 40, iterations=0)
    np.testing.assert_array_equal(hi, di)
    np.testing.assert_array_equal(hj, dj)
    np.testing.assert_allclose(hw, dw, rtol=2e-4, atol=1e-7)
