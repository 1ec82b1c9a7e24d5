"""Distributed render program on the REAL chip (VERDICT r2 #8).

Runs the full shard_map sample program (path gen -> migration loop with
bucketed all_to_all + psum termination -> shade -> ppermute shadow ring /
neural proxies -> psum image) on a 1-device mesh of the real TPU — the
first compile+execute of parallel/ against the actual Mosaic+shard_map
toolchain (everything before this ran on the virtual CPU mesh only) — and
checks the image against the single-device render_image on the same chip.

Writes artifacts/bench_distributed.json.
Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_distributed.py
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.models import random_proxy_models
from pg2024_dprt_tpu.parallel import make_mesh
from pg2024_dprt_tpu.parallel.distributed import render_sample_distributed
from pg2024_dprt_tpu.render import RenderConfig, render_image
from pg2024_dprt_tpu.scene import (
    build_partitioned_scene, cornell_box, device_scene_from_meshes)
from pg2024_dprt_tpu.scene.lights import EnvironmentMap


def main():
    assert jax.default_backend() != "cpu", "must run on the TPU backend"
    meshes, lights = cornell_box()
    env = EnvironmentMap.constant((0.15, 0.2, 0.3))
    side = 128
    camera = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                            40.0, side, side)
    cfg = RenderConfig(width=side, height=side, spp=1, bounces=2,
                       fused_frame="off")
    part = build_partitioned_scene(meshes, 1)
    mesh = make_mesh(1)
    models = random_proxy_models(jax.random.PRNGKey(0), 1)

    def sample(s):
        d, e, st = render_sample_distributed(
            part.stacked, part.proxies, models, lights, env, camera, s, cfg,
            mesh)
        return d + e

    # warm/compile, then best-of over distinct samples (distinct inputs so
    # the relay cannot memoize; a full sample program is far above tunnel
    # RTT noise so per-call timing is honest here)
    img0 = np.asarray(sample(0))
    best = float("inf")
    for s in range(1, 6):
        t0 = time.time()
        out = np.asarray(sample(s))
        best = min(best, time.time() - t0)

    # equivalence: 1-partition distributed == single-device composed render
    scene = device_scene_from_meshes(meshes)
    ref = np.asarray(render_image(scene, lights, env, camera, cfg))
    got = img0.reshape(side, side, 3)
    denom = np.maximum(np.abs(ref), 1e-3)
    rel = np.abs(got - ref) / denom
    row = {
        "name": "render_sample_distributed",
        "value": best * 1e3,
        "unit": "ms",
        "detail": f"{side}x{side} 1spp {cfg.bounces} bounces, 1-device mesh "
                  "on the real chip (shard_map + all_to_all + ppermute ring "
                  "+ psum), full migration loop",
        "mean_rel_vs_single": float(rel.mean()),
        "pass": bool(rel.mean() < 1e-3),
    }
    print(json.dumps(row))

    # neural-proxy mode: compiles the fused routing megakernel INSIDE
    # shard_map against the real Mosaic toolchain (the reference's
    # production secondaryRayModuleBasedNN mode).  With one partition no
    # remote proxy is allowed, so every routing decision is local/env and
    # the image must still match the exact single-device render.
    import dataclasses

    cfg_nn = dataclasses.replace(cfg, use_neural_proxies=True)

    def sample_nn(s):
        d, e, st = render_sample_distributed(
            part.stacked, part.proxies, models, lights, env, camera, s,
            cfg_nn, mesh)
        return d + e

    img_nn = np.asarray(sample_nn(0))
    best_nn = float("inf")
    for s in range(1, 6):
        t0 = time.time()
        np.asarray(sample_nn(s))
        best_nn = min(best_nn, time.time() - t0)
    rel_nn = np.abs(img_nn.reshape(side, side, 3) - ref) / denom
    row_nn = {
        "name": "render_sample_distributed_neural",
        "value": best_nn * 1e3,
        "unit": "ms",
        "detail": f"{side}x{side} 1spp {cfg.bounces} bounces, neural-proxy "
                  "routing (fused route megakernel inside shard_map) on the "
                  "real chip, 1 partition",
        "mean_rel_vs_single": float(rel_nn.mean()),
        "pass": bool(rel_nn.mean() < 1e-3),
    }
    print(json.dumps(row_nn))

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/bench_distributed.json", "w") as f:
        json.dump({"ts": time.time(), "rows": [row, row_nn]}, f, indent=1)
    assert row["pass"], "distributed != single-device"
    assert row_nn["pass"], "neural distributed != single-device"
    print("BENCH_DISTRIBUTED PASS")


if __name__ == "__main__":
    main()
