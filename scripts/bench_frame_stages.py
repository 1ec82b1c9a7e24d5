"""Frame stage breakdown on the real chip: where do the 256x256 1spp
4-bounce frame's milliseconds go?

Chained-times each stage in isolation on REAL wavefronts (the actual paths
the engine produces at that bounce), so the sum over stages x bounces
approximates the measured frame time and the dominant stage is identifiable.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_frame_stages.py
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.trace_api import trace_closest_cutout, trace_occlusion_cutout
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.render.pathgen import generate_camera_paths
from pg2024_dprt_tpu.render.shade import shade
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable
from pg2024_dprt_tpu.utils.benchmarking import chained_time


def main():
    size = 256
    cfg = RenderConfig(width=size, height=size, spp=1, bounces=4)
    mesh = random_tri_soup(65536, seed=0)
    scene = device_scene_from_meshes([mesh], tris_per_cluster=512)
    light_tris = np.asarray(
        [[[0.3, 2.0, 0.3], [0.7, 2.0, 0.3], [0.7, 2.0, 0.7]]], np.float32)
    lights = LightTable.from_arrays(
        light_tris, np.asarray([[60.0, 60.0, 60.0]], np.float32))
    env = EnvironmentMap.constant((0.4, 0.5, 0.7))
    camera = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0],
                            45.0, size, size)
    npix = cfg.frame_buffer_size

    # --- materialize the real per-bounce wavefronts once ---
    waves = []          # (bounce, paths, hits, shadow_paths)
    paths = generate_camera_paths(camera, 0)
    for b in range(cfg.bounces):
        hits, _ = trace_closest_cutout(
            scene, paths.origin, paths.direction, cfg.t_epsilon, paths.tmax,
            paths.is_valid, tracer=cfg.tracer, sort_rays=b >= 1)
        nxt, sp, _ = shade(scene, lights, env, paths, hits, 0, b,
                           cfg.shadow_path_count, npix)
        waves.append((b, paths, hits, sp))
        paths = nxt
    for b, p, h, sp in waves:
        print(f"bounce {b}: live {int(jnp.sum(p.is_valid))} "
              f"shadow-valid {int(jnp.sum(sp.is_valid))}", flush=True)

    # --- stage timings ---
    total = 0.0
    for b, p, h, sp in waves:
        srt = b >= 1

        def t_closest(o, d, tmx, act, srt=srt):
            return trace_closest_cutout(scene, o, d, cfg.t_epsilon, tmx, act,
                                        tracer=cfg.tracer, sort_rays=srt)[0].t

        per = chained_time(t_closest, p.origin, p.direction, p.tmax,
                           p.is_valid, short=1, long=5, reps=2)
        print(f"b{b} closest  ({'sorted' if srt else 'camera'}): "
              f"{per*1e3:7.2f} ms", flush=True)
        total += per

        def t_shade(o, p=p, h=h, b=b):
            pp = p._replace(origin=o)
            nxt, sp2, env_add = shade(scene, lights, env, pp, h, 0,
                                      jnp.int32(b), cfg.shadow_path_count,
                                      npix)
            return nxt.throughput[:, 0] + sp2.throughput[::4, 0] + env_add[:, 0][:65536]

        per = chained_time(t_shade, p.origin, short=1, long=5, reps=2)
        print(f"b{b} shade                : {per*1e3:7.2f} ms", flush=True)
        total += per

        def t_occl(o, d, tmx, act, srt=srt):
            return trace_occlusion_cutout(
                scene, o, d, cfg.t_epsilon, tmx * (1.0 - 1e-3), act,
                tracer=cfg.tracer, sort_rays=srt)[0].astype(jnp.float32)

        per = chained_time(t_occl, sp.origin, sp.direction, sp.tmax,
                           sp.is_valid, short=1, long=5, reps=2)
        print(f"b{b} occl 256k ({'sorted' if srt else 'unsorted'}): "
              f"{per*1e3:7.2f} ms", flush=True)
        total += per

    print(f"\nsum of stages: {total*1e3:.1f} ms (frame_exact measured ~170)",
          flush=True)


if __name__ == "__main__":
    main()
