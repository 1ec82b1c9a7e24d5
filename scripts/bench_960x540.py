"""Full frames at the reference's evaluation resolution (960x540 — the
nnVis.py eval grid, /root/reference/trainingcode/nnVis.py:115-122; the
reference renders/evaluates its neural-proxy images at exactly this size).

Renders through the production engine path (fused megakernel, RIS NEE) on
the real chip with the honest chained-slope methodology (CLAUDE.md):
64k-tri soup exact, the same frame under Russian roulette, and cornell.
Writes artifacts/frame_960x540.json.
"""
import dataclasses
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.render.engine import render_sample
from pg2024_dprt_tpu.scene import (cornell_box, device_scene_from_meshes,
                                   random_tri_soup)
from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable

W, H = 960, 540


def frame_slope(frame_fn, short, long, reps=2):
    """Chained, bit-changing seed fold (utils/benchmarking.py rationale)."""
    @jax.jit
    def chain(s0, nc):
        def step(i, carry):
            s, acc = carry
            v = frame_fn(s)
            bump = (jnp.clip(v, -1.0, 1.0) + 1.001)[0] * (
                1.0 + i.astype(jnp.float32))
            return s + bump, acc + v[0]
        _, acc = jax.lax.fori_loop(0, nc, step, (s0, jnp.float32(0)))
        return acc

    s0 = jnp.asarray([7.0], jnp.float32)
    float(np.asarray(chain(s0, 1)))
    ts = {}
    for nc in (short, long):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(np.asarray(chain(s0 + np.random.rand(), nc)))
            best = min(best, time.time() - t0)
        ts[nc] = best
    return (ts[long] - ts[short]) / (long - short)


def main():
    rows = []

    def row(name, ms, detail):
        r = {"name": name, "value": round(ms, 2), "unit": "ms",
             "detail": detail}
        rows.append(r)
        print(json.dumps(r), flush=True)

    # 64k-tri soup, the suite's frame_exact scene at eval resolution
    scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                     tris_per_cluster=512)
    light_tris = np.asarray(
        [[[0.3, 2.0, 0.3], [0.7, 2.0, 0.3], [0.7, 2.0, 0.7]]], np.float32)
    lights = LightTable.from_arrays(
        light_tris, np.asarray([[60.0, 60.0, 60.0]], np.float32))
    env = EnvironmentMap.constant((0.4, 0.5, 0.7))
    camera = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0],
                            45.0, W, H)
    cfg = RenderConfig(width=W, height=H, spp=1, bounces=4)

    def frame(seed_f, cfg=cfg, sc=scene, li=lights, en=env, cam=camera):
        direct, env_img, _diag = render_sample(
            sc, li, en, cam, seed_f[0].astype(jnp.int32), cfg)
        return jnp.sum(direct + env_img).reshape(1)

    per = frame_slope(frame, 1, 4)
    npix = W * H
    rays = npix * cfg.bounces * 2   # closest + RIS occlusion per bounce
    row("frame_960x540_exact", per * 1e3,
        f"960x540 1spp 4 bounces incl RIS NEE, 64k tris "
        f"({rays/per/1e6:.1f} Mrays/s eq)")

    cfg_rr = dataclasses.replace(cfg, russian_roulette=1)

    def frame_rr(seed_f):
        return frame(seed_f, cfg=cfg_rr)

    per = frame_slope(frame_rr, 1, 4)
    row("frame_960x540_rr1", per * 1e3,
        "same frame, russian_roulette=1")

    # cornell (BASELINE-scale scene) at eval resolution
    c_meshes, c_lights = cornell_box()
    scene_c = device_scene_from_meshes(c_meshes, tris_per_cluster=128)
    cam_c = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                           40.0, W, H)
    env_c = EnvironmentMap.constant((0.0, 0.0, 0.0))

    def frame_c(seed_f):
        return frame(seed_f, sc=scene_c, li=c_lights, en=env_c, cam=cam_c)

    per = frame_slope(frame_c, 2, 8)
    row("frame_960x540_cornell", per * 1e3,
        "960x540 1spp 4 bounces, cornell scene (transposed tiny-scene "
        "frame path)")

    with open("artifacts/frame_960x540.json", "w") as f:
        json.dump({"ts": time.time(), "resolution": [W, H],
                   "reference": "trainingcode/nnVis.py:115-122 (960x540 "
                   "eval images)", "rows": rows}, f, indent=1)
    print("wrote artifacts/frame_960x540.json")


if __name__ == "__main__":
    main()
