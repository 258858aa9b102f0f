"""Golden-file regression test on the deterministic synthetic house scene.

The reference's only reproducibility mechanism is its disk cache
(SURVEY.md §4: determinism-by-caching, line3D.cc:144-190).  Here the full
pipeline output (TXT writer format, line3D.cc:433-473) is pinned against a
checked-in golden file: integer tokens must match exactly (structure,
camera/segment ids, per-line counts), float tokens to 1e-5 relative (CPU
float drift across XLA versions).

Regenerate after an intentional numerics change with:
    GOLDEN_UPDATE=1 python -m pytest tests/test_golden.py -q
then review the diff and commit the new golden.
"""
import os

import numpy as np
import pytest

from line3d_tpu import Line3D, L3DConfig
from synthetic import make_scene

HERE = os.path.dirname(os.path.abspath(__file__))


def _run_pipeline(tmp_path, diffusion):
    # the diffusion golden uses a noisy scene: on the clean house the RDD
    # reweighting changes no cluster (output identical to diffusion-off),
    # which would pin nothing; at 0.8 px endpoint noise diffusion provably
    # alters the final model (17 -> 16 lines), so this golden covers the
    # diffuse -> symmetrize -> cluster path end-to-end
    syn = make_scene(num_views=10, noise_px=0.8 if diffusion else 0.0,
                     seed=3 if diffusion else 0)
    l3d = Line3D(config=L3DConfig(use_collinearity=True))
    for v in range(syn.scene.num_views):
        l3d.add_view_segments(
            v, syn.scene.segments[v][syn.scene.seg_mask[v]],
            syn.cameras.K[v], syn.cameras.R[v], syn.cameras.t[v],
            worldpoint_ids=syn.wp_lists[v],
            width=int(syn.cameras.width[v]),
            height=int(syn.cameras.height[v]))
    result = l3d.compute_3d_model(perform_diffusion=diffusion)
    out = str(tmp_path / "model.txt")
    l3d.save_3d_lines_as_txt(result, out)
    return out


def _tokens(path):
    with open(path) as f:
        for ln, line in enumerate(f):
            for tok in line.split():
                yield ln, tok


# the diffusion-ON golden is the Castle-P30-config analogue (the reference
# enables RDD via -d for large scenes, performDiffusion line3D.cc:1255-1303);
# it pins the host float64 reference-mode RDD through clustering and fit
@pytest.mark.parametrize("diffusion,golden_name", [
    (False, "house10.txt"),
    (True, "house10_diffusion.txt"),
])
def test_golden_txt(tmp_path, diffusion, golden_name):
    GOLDEN = os.path.join(HERE, "golden", golden_name)
    out = _run_pipeline(tmp_path, diffusion)
    if os.environ.get("GOLDEN_UPDATE") == "1" or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(out) as f:
            data = f.read()
        with open(GOLDEN, "w") as f:
            f.write(data)
        if os.environ.get("GOLDEN_UPDATE") != "1":
            raise AssertionError("golden file was missing; generated "
                                 f"{GOLDEN} — review and commit it")
        return

    got = list(_tokens(out))
    want = list(_tokens(GOLDEN))
    assert len(got) == len(want), \
        f"token count {len(got)} != golden {len(want)}"
    for (ln_g, g), (ln_w, w) in zip(got, want):
        try:
            ig, iw = int(g), int(w)
            assert ig == iw, f"line {ln_g}: int {g} != golden {w}"
        except ValueError:
            np.testing.assert_allclose(
                float(g), float(w), rtol=1e-5, atol=1e-6,
                err_msg=f"line {ln_g}: {g} vs golden {w}")
