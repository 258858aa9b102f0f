"""Worker for the 2-process SHARDED affinity-finalize test.

Launched by tests/test_multihost.py as `python multihost_affinity_worker.py
<port> <pid> <nproc> <outdir>`.  Each process holds the same replicated
candidate stream, computes the weight sweep for its OWN contiguous slice
(native OpenMP kernel), allgathers the slices over gloo, and runs the
sequential emission identically — the graph must come out host-replicated
and bit-identical to the single-host fused finalize (the parent compares).
"""
import os
import sys

port, pid, nproc, outdir = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                            sys.argv[4])

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from synthetic import make_scene  # noqa: E402

from line3d_tpu.config import L3DConfig  # noqa: E402
from line3d_tpu.core.conditioning import compute_conditioning  # noqa: E402
from line3d_tpu.cluster import affinity  # noqa: E402
from line3d_tpu.match import engine  # noqa: E402
from line3d_tpu.scene import view_similarities_from_worldpoints, \
    find_visual_neighbors  # noqa: E402
from line3d_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()

# identical deterministic fixture on every host (and in the parent):
# real best matches from the synthetic scene + a random candidate stream
syn = make_scene(num_views=8)
cams = syn.cameras
cfg = L3DConfig()
tr = compute_conditioning(cams.C)
cams.transform(tr.Qinv, tr.scale)
sim, _ = view_similarities_from_worldpoints(syn.wp_lists,
                                            syn.scene.num_views)
neighbors = find_visual_neighbors(sim, cams.baselines(), cfg.min_baseline,
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

# force the sharded path at this small candidate count, and the native
# weights/emit kernels (bit-identical double math to the parent's fused
# native finalize)
affinity.SHARDED_FINALIZE_MIN = 0
affinity.NATIVE_SIM_THRESHOLD = 0
assert affinity._finalize_num_shards() == nproc
g = affinity._finalize_candidates(best, src, tgt, kinds, cws, cams, cfg,
                                  False)

np.savez(os.path.join(outdir, f"aff_{pid}.npz"),
         num_nodes=np.int64(g.num_nodes),
         edges_i=g.edges_i, edges_j=g.edges_j, edges_w=g.edges_w,
         node_view=g.node_view, node_seg=g.node_seg)
print(f"[worker {pid}] sharded finalize ok: {g.num_nodes} nodes, "
      f"{len(g.edges_i)} edge entries")
