"""Worker process for the 2-process FULL-pipeline multi-host test.

Launched by tests/test_multihost.py as `python multihost_pipeline_worker.py
<port> <pid> <nproc> <outdir>`.  Each process joins the global 8-device
mesh and runs the COMPLETE Line3D pipeline — collinearity, sharded
matching, selection, affinity, edge-sharded device diffusion, clustering,
line fit — with cross-process gloo collectives standing in for DCN.  The
final 3D lines are dumped per host for the parent to compare against a
single-process run.
"""
import dataclasses
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

from line3d_tpu import Line3D, L3DConfig  # noqa: E402
from line3d_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()

# every host holds the full (host-replicated) scene — the detect-locally +
# allgather leg is covered by multihost_worker.py; here the subject is the
# device pipeline over the global mesh
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
        width=int(syn.cameras.width[v]), height=int(syn.cameras.height[v]))
result = l3d.compute_3d_model()

# flatten the final model for comparison: per line, its 3D sub-segments
# and the member (view, seg) ids
np.savez(os.path.join(outdir, f"pipe_{pid}.npz"),
         n_lines=np.int32(len(result)),
         seg_counts=np.array([len(r.segments3d) for r in result], np.int32),
         segments3d=np.concatenate(
             [r.segments3d.reshape(-1, 6) for r in result])
         if result else np.zeros((0, 6)),
         views2d=np.concatenate([r.views2d for r in result])
         if result else np.zeros(0, np.int32),
         segs2d=np.concatenate([r.segs2d for r in result])
         if result else np.zeros(0, np.int32))
print(f"[multihost_pipeline_worker {pid}] OK {len(result)} lines",
      flush=True)

# second leg: joint camera+line bundle adjustment over the SAME global
# mesh — the cluster axis shards across both processes and the reduced
# [6V, 6V] camera system arrives by psum over gloo (the north star's
# Schur-complement reduction, here over the DCN stand-in)
cfg_ba = dataclasses.replace(cfg, perform_diffusion=False,
                             use_collinearity=False,
                             bundle_adjust_cameras=True,
                             bundle_iterations=2,
                             refine_backend="device")
l3d_ba = Line3D(config=cfg_ba)
for v in range(syn.scene.num_views):
    l3d_ba.add_view_segments(
        v, syn.scene.segments[v][syn.scene.seg_mask[v]],
        syn.cameras.K[v].copy(), syn.cameras.R[v].copy(),
        syn.cameras.t[v].copy(), worldpoint_ids=syn.wp_lists[v],
        width=int(syn.cameras.width[v]), height=int(syn.cameras.height[v]))
res_ba = l3d_ba.compute_3d_model()
assert l3d_ba.refined_poses is not None
Rf, tf = l3d_ba.refined_poses
np.savez(os.path.join(outdir, f"ba_{pid}.npz"),
         n_lines=np.int32(len(res_ba)),
         R=Rf, t=tf,
         rms_before=np.float64(l3d_ba.stats["ba_rms_before"]),
         rms_after=np.float64(l3d_ba.stats["ba_rms_after"]))
print(f"[multihost_pipeline_worker {pid}] BA OK "
      f"rms {l3d_ba.stats['ba_rms_before']:.3f} -> "
      f"{l3d_ba.stats['ba_rms_after']:.3f}", flush=True)
