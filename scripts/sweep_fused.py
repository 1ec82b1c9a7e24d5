"""Ablation sweep of the whole-sample frame megakernel on the real chip.

Usage: PYTHONPATH=. python scripts/sweep_fused.py "b=4,s=4" "b=4,s=0" ...
Each spec compiles its own kernel (minutes); results print incrementally.
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.ops.pallas_frame import render_frame_fused
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable


def main():
    size = 256
    mesh = random_tri_soup(65536, seed=0)
    scene = device_scene_from_meshes([mesh], tris_per_cluster=512)
    light_tris = np.asarray(
        [[[0.3, 2.0, 0.3], [0.7, 2.0, 0.3], [0.7, 2.0, 0.7]]], np.float32)
    lights = LightTable.from_arrays(
        light_tris, np.asarray([[60.0, 60.0, 60.0]], np.float32))
    env = EnvironmentMap.constant((0.4, 0.5, 0.7))
    camera = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0],
                            45.0, size, size)

    specs = sys.argv[1:] or ["b=4,s=4"]
    for spec in specs:
        kv = dict(p.split("=") for p in spec.split(","))
        b = int(kv.get("b", 4))
        s = int(kv.get("s", 4))
        tm = int(kv.get("tm", 128))
        rc = int(kv.get("rc", 8))
        oc = int(kv.get("oc", 8))
        spp = int(kv.get("spp", 1))
        ss = kv.get("ss")
        ss = int(ss) if ss is not None else None
        cs = kv.get("cs")
        cs = int(cs) if cs is not None else None
        rr = int(kv.get("rr", 0))
        nee = kv.get("nee", "ris")
        cfg = RenderConfig(width=size, height=size, spp=spp, bounces=b,
                           shadow_path_count=s, russian_roulette=rr,
                           nee_mode=nee)
        fn = jax.jit(lambda sc, smp, cfg=cfg, tm=tm, rc=rc, oc=oc, spp=spp,
                     ss=ss, cs=cs:
                     render_frame_fused(sc, lights, env, camera, smp, cfg,
                                        spp=spp, tile_rays=tm,
                                        recull=rc, orecull=oc, ssub=ss,
                                        csub=cs))
        t0 = time.time()
        try:
            out = fn(scene, 0)
        except Exception as e:
            print(f"{spec:16s} FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        iters = 5
        dt = float("inf")
        for rep in range(4):
            t0 = time.time()
            for i in range(iters):
                out = fn(scene, rep * iters + i + 1)
            jax.block_until_ready(out)
            dt = min(dt, (time.time() - t0) / iters)
        print(f"{spec:16s} compile {compile_s:5.0f}s  frame {dt*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
