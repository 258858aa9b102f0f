"""Worker process for the 2-process multi-host orchestration test.

Launched by tests/test_multihost.py as `python multihost_worker.py
<port> <pid> <nproc> <outdir>`.  Each process plays one "host" of a pod
slice: it owns a contiguous view shard (detection split), all-gathers the
replicated segment tensor, then joins the global device mesh and runs the
sharded matching step with cross-process collectives (the DCN analogue is
gloo on localhost).  Results are dumped per host for the parent test to
compare against the single-process path.
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
from line3d_tpu.parallel import mesh as mesh_mod, multihost, \
    sharded  # noqa: E402
from line3d_tpu.scene import view_similarities_from_worldpoints, \
    find_visual_neighbors  # noqa: E402

multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc

# Every host loads the tiny scene metadata; segments are "detected" only
# for the local view shard and all-gathered (multihost.py recipe step 2).
syn = make_scene(num_views=8)
scene, cams = syn.scene, syn.cameras
cfg = L3DConfig()
tr = compute_conditioning(cams.C)
cams.transform(tr.Qinv, tr.scale)
sim, _ = view_similarities_from_worldpoints(syn.wp_lists, scene.num_views)
neighbors = find_visual_neighbors(sim, cams.baselines(), cfg.min_baseline, 4)

start, end = multihost.my_view_range(scene.num_views, pid, nproc)
segs_all, mask_all = multihost.allgather_segments(
    scene.segments[start:end], scene.seg_mask[start:end],
    start, scene.num_views)
assert np.allclose(segs_all, scene.segments), "allgather segments mismatch"
assert (mask_all == scene.seg_mask).all(), "allgather mask mismatch"

# hosts that detect independently pad to DIFFERENT local maxima; the
# gather must agree on the global segment axis first (+pid makes the
# local S genuinely differ between the two hosts)
smax_local = max(int(scene.seg_mask[start:end].sum(axis=1).max()), 1) + pid
segs2, mask2 = multihost.allgather_segments(
    scene.segments[start:end, :smax_local],
    scene.seg_mask[start:end, :smax_local], start, scene.num_views)
Sg = segs2.shape[1]
assert Sg >= smax_local and np.allclose(segs2, scene.segments[:, :Sg]) \
    and (mask2 == scene.seg_mask[:, :Sg]).all() \
    and not scene.seg_mask[:, Sg:].any(), "tight-S allgather mismatch"

# Global mesh over both hosts' devices; stacks ride the view axis, so each
# host contributes its addressable block (multihost.py recipe step 3).
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

mesh = mesh_mod.make_view_mesh()
Vp = mesh_mod.pad_views_to_mesh(scene.num_views, mesh)
segments, seg_mask, stacks, nb_ids = sharded.build_stacks(
    scene, cams, neighbors, cfg, num_pad_views=Vp)

blk = Vp // nproc
stacks_g = {
    k: multihost_utils.host_local_array_to_global_array(
        v[pid * blk:(pid + 1) * blk], mesh,
        P("views", *([None] * (v.ndim - 1))))
    for k, v in stacks.items()}
segments_g = multihost_utils.host_local_array_to_global_array(
    segments, mesh, P())
seg_mask_g = multihost_utils.host_local_array_to_global_array(
    seg_mask, mesh, P())

S = scene.max_segments
out = sharded.sharded_match_all_views(
    segments_g, seg_mask_g, stacks_g,
    np.float32(cfg.sigma_p), np.float32(cfg.sigma_a),
    np.float32(cfg.confidence_threshold),
    quota=cfg.match_block_quota,
    m_total=min(cfg.max_matches_per_segment, S),
    row_chunk=min(128, S), k_export=S * 8, mesh=mesh)

# Replicate outputs so every host can materialize the full result
# (recipe step 4: clustering inputs gathered to host 0).
repl = NamedSharding(mesh, P())
gather = jax.jit(lambda t: t, out_shardings={k: repl for k in out})
out_full = {k: np.asarray(v) for k, v in gather(out).items()}

np.savez(os.path.join(outdir, f"out_{pid}.npz"),
         nb_ids=nb_ids, **out_full)
print(f"[multihost_worker {pid}] OK", flush=True)
