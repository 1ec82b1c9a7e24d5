"""The reference's flagship workflow, end to end: partition a scene,
train per-partition vis/depth proxy nets on their real geometry, deploy
them stacked, and render distributed with neural routing — then compare
against the exact (full-migration) render.

This is the runnable-example form of tests/test_neural_end_to_end.py
(reference pipeline: trainingcode/main.py offline training +
src/render/renderer.cpp:1407-1452 secondaryRayModuleBasedNN serving).

Usage:
  # virtual 8-device CPU mesh (no TPU needed):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/neural_two_rooms.py [out_dir] [size] [parts]
  # or on the real chip with parts=1.
"""
import os
import sys

import numpy as np
import jax

# the host sitecustomize force-registers the TPU platform and ignores the
# JAX_PLATFORMS env var — honor it here BEFORE first backend use (same
# pattern as __graft_entry__.dryrun_multichip and tests/conftest.py)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.models import stack_params
from pg2024_dprt_tpu.models.mlp import MLPConfig
from pg2024_dprt_tpu.models.proxy import ProxyModels
from pg2024_dprt_tpu.parallel import make_mesh, render_image_distributed
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.scene import build_partitioned_scene, two_room_scene
from pg2024_dprt_tpu.scene.geometry import device_scene_from_meshes
from pg2024_dprt_tpu.scene.lights import EnvironmentMap
from pg2024_dprt_tpu.scene.partition import partition_meshes
from pg2024_dprt_tpu.train import (
    TrainConfig, balance_vis, depth_only, fit, generate_proxy_dataset)
from pg2024_dprt_tpu.utils.png import write_png


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/neural_rooms"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    meshes, lights = two_room_scene(num_rooms=parts, tris_per_room=160)
    part = build_partitioned_scene(meshes, parts)
    mesh = make_mesh(parts)
    env = EnvironmentMap.constant((0.25, 0.25, 0.3))
    camera = Camera.look_at([1.25, 1.2, 5.0], [1.25, 0.8, 0.5], [0, 1, 0],
                            50.0, size, size)

    # --- offline stage: train vis+depth proxies per partition ---
    assignment = partition_meshes(meshes, parts)
    vis_cfg = depth_cfg = MLPConfig(width=64, depth=2)
    vis_list, depth_list = [], []
    for p, idxs in enumerate(assignment):
        sub = device_scene_from_meshes([meshes[i] for i in idxs])
        lo = np.asarray(part.proxies.aabb_min[p])
        hi = np.asarray(part.proxies.aabb_max[p])
        feats, depth = generate_proxy_dataset(sub, lo, hi, 30_000,
                                              seed=100 + p)
        xv, yv = balance_vis(feats, depth)
        vp, hist = fit(xv, yv, vis_cfg,
                       TrainConfig(nn_type="vis", epochs=25, batch=4096,
                                   learn_rate=5e-3))
        print(f"partition {p}: vis loss {hist['test_loss'][-1]:.4f}", flush=True)
        xd, yd = depth_only(feats, depth)
        if xd.shape[0] < 256:
            xd, yd = feats, depth
        dp, hist = fit(xd, yd, depth_cfg,
                       TrainConfig(nn_type="depth", epochs=25, batch=4096,
                                   learn_rate=5e-3))
        print(f"partition {p}: depth loss {hist['test_loss'][-1]:.4f}", flush=True)
        vis_list.append(vp)
        depth_list.append(dp)
    models = ProxyModels(
        vis_params=stack_params(vis_list),
        depth_params=stack_params(depth_list),
        num_objects=parts, vis_cfg=vis_cfg, depth_cfg=depth_cfg)

    # --- serving stage: exact vs neural distributed renders ---
    mk = lambda nn: RenderConfig(width=size, height=size, spp=4, bounces=2,
                                 use_neural_proxies=nn)
    exact = np.asarray(render_image_distributed(
        part, models, lights, env, camera, mk(False), mesh))
    neural = np.asarray(render_image_distributed(
        part, models, lights, env, camera, mk(True), mesh))

    tm = lambda x: x / (1.0 + x)
    err = np.abs(tm(neural) - tm(exact)).mean()
    # with well-trained proxies the two renders should nearly coincide
    # (the flagship A-B test tolerates 0.08 mean tone-mapped error)
    print(f"mean tone-mapped |neural - exact|: {err:.6f}")

    os.makedirs(out, exist_ok=True)
    for name, img in (("exact", exact), ("neural", neural)):
        path = os.path.join(out, f"{name}.png")
        write_png(path, (np.clip(tm(img), 0, 1) * 255).astype(np.uint8)
                  .reshape(size, size, 3))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
