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

    rows = [row, row_nn]

    # --- TRAINED-proxy neural row (VERDICT r4 #2): same program, but the
    # vis/depth nets are the PROD w256·d4 statue checkpoints trained to
    # reference-class loss (artifacts/proxy_quality.json) instead of random
    # weights — the kernel's NN work is identical, the row documents that
    # the on-chip neural path runs trained production nets end-to-end. ---
    import glob

    from pg2024_dprt_tpu.models import stack_params
    from pg2024_dprt_tpu.models.proxy import ProxyModels
    from pg2024_dprt_tpu.scene.procedural import statue_mesh
    from pg2024_dprt_tpu.train.loop import load_checkpoint

    vis_ck = sorted(glob.glob("artifacts/proxies/vis_prod-loss=*.npz"))
    dep_ck = sorted(glob.glob("artifacts/proxies/depth_prod-loss=*.npz"))
    if vis_ck and dep_ck:
        vis_p = load_checkpoint(vis_ck[0][:-4])
        dep_p = load_checkpoint(dep_ck[0][:-4])
        models_tr = ProxyModels(stack_params([vis_p]), stack_params([dep_p]),
                                1)
        smesh = statue_mesh(48, seed=0)
        part_s = build_partitioned_scene([smesh], 1)
        cam_s = Camera.look_at([0.5, 0.7, 2.2], [0.5, 0.5, 0.5], [0, 1, 0],
                               45.0, side, side)

        def sample_tr(s):
            d, e, st = render_sample_distributed(
                part_s.stacked, part_s.proxies, models_tr, lights, env,
                cam_s, s, cfg_nn, mesh)
            return d + e

        img_tr = np.asarray(sample_tr(0))
        best_tr = float("inf")
        for s in range(1, 6):
            t0 = time.time()
            np.asarray(sample_tr(s))
            best_tr = min(best_tr, time.time() - t0)
        scene_s = device_scene_from_meshes([smesh])
        ref_s = np.asarray(render_image(scene_s, lights, env, cam_s, cfg))
        rel_tr = np.abs(img_tr.reshape(side, side, 3) - ref_s) / \
            np.maximum(np.abs(ref_s), 1e-3)
        rows.append({
            "name": "render_sample_distributed_neural_TRAINED",
            "value": best_tr * 1e3,
            "unit": "ms",
            "detail": f"{side}x{side} statue scene, PROD w256·d4 nets "
                      f"TRAINED to reference-class loss "
                      f"({os.path.basename(vis_ck[0])}), neural routing on "
                      "the real chip",
            "mean_rel_vs_single": float(rel_tr.mean()),
            "pass": bool(rel_tr.mean() < 1e-3),
        })
        print(json.dumps(rows[-1]))

    # --- distributed TWO-LEVEL INSTANCED row (VERDICT r4 #1): the
    # instance-partitioned program compiled+run on the real chip ---
    from pg2024_dprt_tpu.scene import build_partitioned_scene_instanced
    from pg2024_dprt_tpu.scene.geometry import device_scene_from_instances
    from pg2024_dprt_tpu.scene.procedural import random_tri_soup

    base = random_tri_soup(65536, seed=9)
    ni = 8
    tf = np.zeros((ni, 3, 4), np.float32)
    for i in range(ni):
        tf[i, :, :3] = np.eye(3, dtype=np.float32)
        tf[i, :, 3] = [2.2 * (i % 4), 0.0, 2.2 * (i // 4)]
    ipart = build_partitioned_scene_instanced([base], tf, 1)
    cam_i = Camera.look_at([3.3, 2.5, 8.0], [3.3, 0.5, 1.0], [0, 1, 0],
                           55.0, side, side)

    def sample_inst(s):
        d, e, st = render_sample_distributed(
            ipart.stacked, ipart.proxies, models, lights, env, cam_i, s,
            cfg, mesh)
        return d + e

    img_i = np.asarray(sample_inst(0))
    best_i = float("inf")
    for s in range(1, 6):
        t0 = time.time()
        np.asarray(sample_inst(s))
        best_i = min(best_i, time.time() - t0)
    scene_i = device_scene_from_instances([base], tf)
    ref_i = np.asarray(render_image(scene_i, lights, env, cam_i, cfg))
    rel_i = np.abs(img_i.reshape(side, side, 3) - ref_i) / \
        np.maximum(np.abs(ref_i), 1e-3)
    rows.append({
        "name": "render_sample_distributed_instanced",
        "value": best_i * 1e3,
        "unit": "ms",
        "detail": f"{side}x{side} two-level instanced scene (8 x 64k base "
                  "= 524k effective tris) through the instance-partitioned "
                  "distributed program on the real chip",
        "mean_rel_vs_single": float(rel_i.mean()),
        "pass": bool(rel_i.mean() < 1e-3),
    })
    print(json.dumps(rows[-1]))

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/bench_distributed.json", "w") as f:
        json.dump({"ts": time.time(), "rows": rows}, f, indent=1)
    for r in rows:
        assert r["pass"], f"{r['name']} failed its equivalence gate"
    print("BENCH_DISTRIBUTED PASS")


if __name__ == "__main__":
    main()
