"""Multi-host orchestration: 2 real processes, gloo collectives, global mesh.

Validates the pod-slice recipe in parallel/multihost.py end-to-end without
TPU hardware: two OS processes each own 4 CPU devices and a contiguous view
shard, all-gather segments, and run the sharded matching step over the
8-device global mesh with cross-process collectives.  The parent compares
both hosts' replicated outputs against the in-process single-"host" run.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_orchestration(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers steer themselves to CPU via jax.config (sitecustomize
    # overrides env vars); drop the parent's forced device count
    env.pop("XLA_FLAGS", None)

    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_worker.py"),
         str(port), str(pid), "2", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    o0 = dict(np.load(tmp_path / "out_0.npz"))
    o1 = dict(np.load(tmp_path / "out_1.npz"))
    assert o0.keys() == o1.keys()
    for k in o0:
        np.testing.assert_array_equal(o0[k], o1[k]), k

    # compare against the single-process sharded path on the same scene
    from synthetic import make_scene
    from line3d_tpu.config import L3DConfig
    from line3d_tpu.core.conditioning import compute_conditioning
    from line3d_tpu.parallel import mesh as mesh_mod, sharded
    from line3d_tpu.scene import view_similarities_from_worldpoints, \
        find_visual_neighbors

    syn = make_scene(num_views=8)
    scene, cams = syn.scene, syn.cameras
    cfg = L3DConfig()
    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)
    sim, _ = view_similarities_from_worldpoints(syn.wp_lists,
                                                scene.num_views)
    neighbors = find_visual_neighbors(sim, cams.baselines(),
                                      cfg.min_baseline, 4)
    mesh = mesh_mod.make_view_mesh()
    Vp = mesh_mod.pad_views_to_mesh(scene.num_views, mesh)
    segments, seg_mask, stacks, nb_ids = sharded.build_stacks(
        scene, cams, neighbors, cfg, num_pad_views=Vp)
    S = scene.max_segments
    ref = sharded.sharded_match_all_views(
        segments, seg_mask, stacks,
        np.float32(cfg.sigma_p), np.float32(cfg.sigma_a),
        np.float32(cfg.confidence_threshold),
        quota=cfg.match_block_quota,
        m_total=min(cfg.max_matches_per_segment, S),
        row_chunk=min(128, S), k_export=S * 8, mesh=mesh)
    np.testing.assert_array_equal(o0["nb_ids"], nb_ids)
    for k, v in ref.items():
        got, want = o0[k], np.asarray(v)
        if got.dtype.kind == "f":
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(got, want, err_msg=k)


@pytest.mark.slow
def test_two_process_sharded_affinity_finalize(tmp_path):
    """The host-sharded affinity finalize (weight sweep split by candidate
    range across processes, slices allgathered, emission replicated) must
    reproduce the single-host fused native finalize bit-for-bit."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)

    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_affinity_worker.py"),
         str(port), str(pid), "2", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    o0 = dict(np.load(tmp_path / "aff_0.npz"))
    o1 = dict(np.load(tmp_path / "aff_1.npz"))
    assert o0.keys() == o1.keys()
    for k in o0:
        np.testing.assert_array_equal(o0[k], o1[k], err_msg=k)

    # single-host fused native finalize on the identical fixture
    from synthetic import make_scene
    from line3d_tpu.config import L3DConfig
    from line3d_tpu.core.conditioning import compute_conditioning
    from line3d_tpu.cluster import affinity
    from line3d_tpu.match import engine
    from line3d_tpu.scene import view_similarities_from_worldpoints, \
        find_visual_neighbors
    from line3d_tpu.native import load as native_load
    lib = native_load.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    if not (hasattr(lib, "affinity_weights_range")
            and hasattr(lib, "affinity_emit")):
        # A stale .so (affinity_finalize only) would make the workers fall
        # back to the numpy twin while the parent stays native — ulp-level
        # assert flakes instead of a clear signal.  Rebuild required.
        pytest.fail("stale native library: affinity_weights_range/"
                    "affinity_emit missing — run `make -C line3d_tpu/native`")

    syn = make_scene(num_views=8)
    cams = syn.cameras
    cfg = L3DConfig()
    tr = compute_conditioning(cams.C)
    cams.transform(tr.Qinv, tr.scale)
    sim, _ = view_similarities_from_worldpoints(syn.wp_lists,
                                                syn.scene.num_views)
    neighbors = find_visual_neighbors(sim, cams.baselines(),
                                      cfg.min_baseline,
                                      cfg.matching_neighbors)
    _, best, _ = engine.run_matching(syn.scene, cams, neighbors, cfg)

    B = best.view.size
    rng = np.random.default_rng(3)
    n = 6000
    src = rng.integers(0, B, size=n).astype(np.int64)
    tgt = rng.integers(0, B, size=n).astype(np.int64)
    bad = src == tgt
    tgt[bad] = (tgt[bad] + 1) % B
    kinds = rng.integers(0, 3, size=n).astype(np.int8)
    cws = rng.uniform(0.05, 1.0, size=n)

    saved = affinity.NATIVE_SIM_THRESHOLD
    try:
        affinity.NATIVE_SIM_THRESHOLD = 0   # fused native path
        g = affinity._finalize_candidates(best, src, tgt, kinds, cws,
                                          cams, cfg, False)
    finally:
        affinity.NATIVE_SIM_THRESHOLD = saved
    assert int(o0["num_nodes"]) == g.num_nodes
    np.testing.assert_array_equal(o0["edges_i"], g.edges_i)
    np.testing.assert_array_equal(o0["edges_j"], g.edges_j)
    np.testing.assert_array_equal(o0["edges_w"], g.edges_w)
    np.testing.assert_array_equal(o0["node_view"], g.node_view)
    np.testing.assert_array_equal(o0["node_seg"], g.node_seg)
    assert g.num_nodes > 10 and len(g.edges_i) > 100


@pytest.mark.slow
def test_two_process_full_pipeline(tmp_path):
    """The COMPLETE pipeline (collinearity + sharded matching + selection +
    affinity + device diffusion + clustering + fit) over the 2-process
    global mesh must reproduce the single-process model bit-for-bit."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)

    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_pipeline_worker.py"),
         str(port), str(pid), "2", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    o0 = dict(np.load(tmp_path / "pipe_0.npz"))
    o1 = dict(np.load(tmp_path / "pipe_1.npz"))
    for k in o0:
        np.testing.assert_array_equal(o0[k], o1[k], err_msg=k)

    # single-process run of the identical configuration
    import dataclasses
    from synthetic import make_scene
    from line3d_tpu import Line3D, L3DConfig

    syn = make_scene(num_views=8)
    cfg = dataclasses.replace(L3DConfig(use_collinearity=True),
                              perform_diffusion=True,
                              diffusion_backend="device")
    l3d = Line3D(config=cfg)
    for v in range(syn.scene.num_views):
        l3d.add_view_segments(
            v, syn.scene.segments[v][syn.scene.seg_mask[v]],
            syn.cameras.K[v], syn.cameras.R[v], syn.cameras.t[v],
            worldpoint_ids=syn.wp_lists[v],
            width=int(syn.cameras.width[v]),
            height=int(syn.cameras.height[v]))
    result = l3d.compute_3d_model()

    assert int(o0["n_lines"]) == len(result)
    np.testing.assert_array_equal(
        o0["seg_counts"], [len(r.segments3d) for r in result])
    np.testing.assert_array_equal(
        o0["views2d"], np.concatenate([r.views2d for r in result]))
    np.testing.assert_array_equal(
        o0["segs2d"], np.concatenate([r.segs2d for r in result]))
    np.testing.assert_allclose(
        o0["segments3d"],
        np.concatenate([r.segments3d.reshape(-1, 6) for r in result]),
        rtol=1e-5, atol=1e-6)

    # BA leg: both processes' Schur-reduced camera solves (cluster axis
    # sharded ACROSS the processes, reduced system psum'd over gloo) must
    # agree with each other and improve-or-hold the reprojection rms
    b0 = dict(np.load(tmp_path / "ba_0.npz"))
    b1 = dict(np.load(tmp_path / "ba_1.npz"))
    for k in b0:
        np.testing.assert_array_equal(b0[k], b1[k], err_msg=k)
    assert float(b0["rms_after"]) <= float(b0["rms_before"]) + 1e-6
    assert int(b0["n_lines"]) > 0
    V = 8
    assert b0["R"].shape == (V, 3, 3) and b0["t"].shape == (V, 3)
