"""Tracked P=8 distributed-path benchmark on the virtual CPU mesh
(VERDICT r4 'missing' #6: real multi-chip runs are impossible here, but
round-over-round regressions in the DISTRIBUTED PATH itself — migration
rounds, exchange volume, per-sample wall-clock — need a committed number).

Rows (all exact mode, 8-device CPU mesh):
  * rooms_p8      — 8-room scene, mesh-partitioned, full migration loop
  * instanced_p8  — two-level instanced scene, instance-partitioned
  * rooms_p8_grids— visibility grids on (tracks the cull count too)

Each row records median-of-3 per-sample wall seconds (CPU wall time is
load-sensitive — treat >2x moves as signal, not noise), the migration
stats (truncation must be 0; overflow-waits and grid-culls are workload
fingerprints), and the mean relative error vs the 1-device render (must be
~fp-exact).

Run: JAX_PLATFORMS=cpu python scripts/bench_distributed_cpu8.py
(the script re-execs itself with the CPU platform + 8 virtual devices)
"""
import json
import os
import subprocess
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pg2024_dprt_tpu.core import Camera
    from pg2024_dprt_tpu.models import random_proxy_models
    from pg2024_dprt_tpu.parallel import make_mesh, render_image_distributed
    from pg2024_dprt_tpu.render import RenderConfig, render_image
    from pg2024_dprt_tpu.scene import (
        build_partitioned_scene, build_partitioned_scene_instanced,
        device_scene_from_meshes, two_room_scene, random_tri_soup)
    from pg2024_dprt_tpu.scene.geometry import device_scene_from_instances
    from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable

    mesh = make_mesh(8)
    models = random_proxy_models(jax.random.PRNGKey(0), 8)
    rows = []

    def measure(name, part, single_scene, lights, env, camera, cfg):
        want = np.asarray(render_image(single_scene, lights, env, camera,
                                       cfg))
        img, stats = render_image_distributed(
            part, models, lights, env, camera, cfg, mesh, return_stats=True)
        rel = np.abs(np.asarray(img) - want) / np.maximum(np.abs(want), 1e-3)
        ts = []
        for s in range(3):
            t0 = time.time()
            render_image_distributed(part, models, lights, env, camera, cfg,
                                     mesh, base_sample=10 + s)
            ts.append(time.time() - t0)
        row = {"name": name, "wall_s_median": round(sorted(ts)[1], 3),
               "wall_s_best": round(min(ts), 3),
               "stats": stats, "mean_rel_vs_single": float(rel.mean()),
               "pass": bool(rel.mean() < 1e-3
                            and stats["migration_truncated"] == 0)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # --- rooms P=8 ---
    meshes, lights = two_room_scene(num_rooms=8, tris_per_room=128, seed=2)
    env = EnvironmentMap.constant((0.25, 0.25, 0.3))
    cx = 8 * 0.625
    camera = Camera.look_at([cx, 1.4, 6.0], [cx, 0.8, 0.5], [0, 1, 0],
                            60.0, 32, 32)
    cfg = RenderConfig(width=32, height=32, spp=1, bounces=3)
    part = build_partitioned_scene(meshes, 8)
    single = device_scene_from_meshes(meshes)
    measure("rooms_p8", part, single, lights, env, camera, cfg)

    part_g = build_partitioned_scene(meshes, 8, visibility_grids=True)
    cfg_g = RenderConfig(width=32, height=32, spp=1, bounces=3,
                         use_visibility_grids=True)
    measure("rooms_p8_grids", part_g, single, lights, env, camera, cfg_g)

    # --- instanced P=8 ---
    base = random_tri_soup(2048, seed=4)
    rng = np.random.RandomState(11)
    ni = 8
    tf = np.zeros((ni, 3, 4), np.float32)
    for i in range(ni):
        q, _ = np.linalg.qr(rng.randn(3, 3))
        tf[i, :, :3] = q.astype(np.float32)
        tf[i, :, 3] = [2.0 * i, 0.0, 0.0]
    ipart = build_partitioned_scene_instanced([base], tf, 8)
    isingle = device_scene_from_instances([base], tf)
    quad = np.asarray(
        [[[0, 3.0, -1], [16, 3.0, -1], [16, 3.0, 1]],
         [[0, 3.0, -1], [16, 3.0, 1], [0, 3.0, 1]]], np.float32)
    ilights = LightTable.from_arrays(quad, np.full((2, 3), 12.0, np.float32))
    icam = Camera.look_at([7, 2.0, 5.0], [7, 0.0, 0.0], [0, 1, 0],
                          55.0, 32, 32)
    icfg = RenderConfig(width=32, height=32, spp=1, bounces=2)
    measure("instanced_p8", ipart, isingle, ilights, env, icam, icfg)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/bench_distributed_cpu8.json", "w") as f:
        json.dump({"ts": time.time(), "devices": 8, "rows": rows}, f,
                  indent=1)
    assert all(r["pass"] for r in rows)
    print("BENCH_DISTRIBUTED_CPU8 PASS")


if __name__ == "__main__":
    if os.environ.get("_CPU8_CHILD") != "1":
        env = dict(os.environ)
        env["_CPU8_CHILD"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        env["PYTHONPATH"] = os.pathsep.join(
            [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
            + [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))])
        sys.exit(subprocess.run([sys.executable,
                                 os.path.abspath(__file__)],
                                env=env).returncode)
    main()
