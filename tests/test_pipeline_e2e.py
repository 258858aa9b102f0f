"""End-to-end pipeline test on the synthetic wireframe scene: the minimum
slice of SURVEY.md §7 (io → graph → match → selection → affinity →
clustering → fit → writers), detector bypassed via precomputed segments."""
import os

import numpy as np
import pytest

from line3d_tpu import Line3D, L3DConfig
from line3d_tpu.io import writers
from synthetic import make_scene, house_wireframe


@pytest.fixture(scope="module")
def pipeline_result(tmp_path_factory):
    syn = make_scene(num_views=10)
    l3d = Line3D(config=L3DConfig(use_collinearity=True))
    for v in range(syn.scene.num_views):
        l3d.add_view_segments(
            v, syn.scene.segments[v][syn.scene.seg_mask[v]],
            syn.cameras.K[v], syn.cameras.R[v], syn.cameras.t[v],
            worldpoint_ids=syn.wp_lists[v],
            width=int(syn.cameras.width[v]),
            height=int(syn.cameras.height[v]))
    result = l3d.compute_3d_model(perform_diffusion=False)
    return syn, l3d, result


def _line_errors(syn, result):
    """Match each recovered 3D line to its nearest ground-truth line; return
    (per-line point-to-gt-line distances, set of recovered gt ids)."""
    errs, recovered = [], set()
    for line in result:
        pts = line.segments3d.reshape(-1, 3)
        best_err, best_id = np.inf, None
        for li, (A, B) in enumerate(syn.lines3d):
            d = B - A
            d = d / np.linalg.norm(d)
            e = np.linalg.norm(np.cross(pts - A, d), axis=1).mean()
            if e < best_err:
                best_err, best_id = e, li
        errs.append(best_err)
        recovered.add(best_id)
    return np.array(errs), recovered


def test_reconstruction_quality(pipeline_result):
    syn, l3d, result = pipeline_result
    assert len(result) >= 8, f"only {len(result)} lines"
    errs, recovered = _line_errors(syn, result)
    # scene scale ~1.5; hypotheses come from f32 triangulation
    assert np.median(errs) < 0.02
    assert np.max(errs) < 0.1
    # most of the wireframe must be recovered (16 gt lines)
    assert len(recovered) >= 10, f"recovered {sorted(recovered)}"


def test_cluster_camera_support(pipeline_result):
    syn, l3d, result = pipeline_result
    for line in result:
        # clusters must be seen by >= 4 distinct cameras (line3D.cc:1334)
        assert len(np.unique(line.views2d)) >= 4


def test_writers_roundtrip(pipeline_result, tmp_path):
    syn, l3d, result = pipeline_result
    txt = tmp_path / "result.txt"
    stl = tmp_path / "result.stl"
    l3d.save_3d_lines_as_txt(result, str(txt))
    l3d.save_3d_lines_as_stl(result, str(stl))

    parsed = writers.load_txt(str(txt))
    assert len(parsed) == len([r for r in result if len(r.segments3d)])
    segs0, res0 = parsed[0]
    np.testing.assert_allclose(segs0, result[0].segments3d, rtol=1e-4)
    assert len(res0) == len(result[0].views2d)
    # residual coords round-trip through the 2D segment lookup
    cam, seg, coords = res0[0]
    v_int = list(l3d._images).index(cam)
    np.testing.assert_allclose(
        coords, l3d.get_segment_2d(v_int, seg), rtol=1e-4)

    stl_text = stl.read_text()
    assert stl_text.startswith("solid lineModel")
    assert stl_text.count("facet normal") == sum(
        len(r.segments3d) for r in result)


def test_pipeline_with_diffusion(pipeline_result):
    syn, l3d, _ = pipeline_result
    res_diff = l3d.compute_3d_model(perform_diffusion=True)
    errs, recovered = _line_errors(syn, res_diff)
    assert len(res_diff) >= 6
    assert np.median(errs) < 0.05


def test_pipeline_device_diffusion_e2e():
    """Diffusion ON with diffusion_backend="device" must run sharded
    end-to-end over the 8-device mesh and reproduce the host backend's
    final 3D model (performDiffusion, line3D.cc:1255-1303; the host path
    is float64, the device path float32 — cluster structure must agree)."""
    import dataclasses

    syn = make_scene(num_views=10)

    def run(backend):
        cfg = dataclasses.replace(
            L3DConfig(use_collinearity=True), perform_diffusion=True,
            diffusion_backend=backend)
        l3d = Line3D(config=cfg)
        for v in range(syn.scene.num_views):
            l3d.add_view_segments(
                v, syn.scene.segments[v][syn.scene.seg_mask[v]],
                syn.cameras.K[v], syn.cameras.R[v], syn.cameras.t[v],
                worldpoint_ids=syn.wp_lists[v],
                width=int(syn.cameras.width[v]),
                height=int(syn.cameras.height[v]))
        return l3d.compute_3d_model()

    res_host = run("host")
    res_dev = run("device")

    assert len(res_dev) == len(res_host)
    # identical cluster structure: the same 2D segments grouped per line
    def keysets(res):
        return sorted(frozenset(zip(r.views2d.tolist(), r.segs2d.tolist()))
                      for r in res)
    assert keysets(res_dev) == keysets(res_host)
    # and the geometry is as good as the host run's
    errs, recovered = _line_errors(syn, res_dev)
    assert np.median(errs) < 0.05
    assert len(recovered) >= 8
