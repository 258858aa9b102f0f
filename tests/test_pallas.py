"""Pallas kernel correctness (interpreter mode on the CPU test backend)."""
import numpy as np
import jax.numpy as jnp

from line3d_tpu.match import pairwise, pairwise_pallas
from synthetic import make_scene


def test_pallas_kernel_matches_soa_interpret():
    syn = make_scene(num_views=6)
    cams, sc = syn.cameras, syn.scene
    v, n = 1, 3
    f32 = lambda x: jnp.asarray(np.asarray(x, np.float32))
    args = (f32(sc.segments[v]), f32(sc.segments[n]),
            jnp.asarray(sc.seg_mask[v]), jnp.asarray(sc.seg_mask[n]),
            jnp.asarray(cams.fundamental(v, n).astype(np.float32)),
            f32(cams.RtKinv[v]), f32(cams.RtKinv[n]),
            f32(cams.C[v]), f32(cams.C[n]))
    d_x, v_x = pairwise.match_pair_dense(*args)
    d_p, v_p = pairwise_pallas.match_pair_dense_pallas(
        *args, block_s=64, block_t=128, interpret=True)
    v_x = np.asarray(v_x)
    v_p = np.asarray(v_p)
    # gates may differ only on borderline float rounding (the pallas kernel
    # uses a squared-distance overlap gate)
    assert (v_x != v_p).mean() < 1e-3
    both = v_x & v_p
    assert both.sum() > 20
    for k in range(4):
        a = np.asarray(d_x[k])[both]
        b = np.asarray(d_p[k])[both]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
