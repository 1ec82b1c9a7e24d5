"""NEE occlusion tuning on the real chip: the b1 shadow wavefront (256k
rays, ~62k valid) is the frame's dominant stage (bench_frame_stages: ~24 ms
x 3 bounces).  Sweep re-cull round length, tile size, cluster size, and
sortedness on the REAL wavefront.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_occl.py
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.ops.trace_api import trace_closest_cutout
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
    scenes = {
        512: device_scene_from_meshes([mesh], tris_per_cluster=512),
        128: device_scene_from_meshes([mesh], tris_per_cluster=128),
    }
    light_tris = np.asarray(
        [[[0.3, 2.0, 0.3], [0.7, 2.0, 0.3], [0.7, 2.0, 0.7]]], np.float32)
    lights = LightTable.from_arrays(
        light_tris, np.asarray([[60.0, 60.0, 60.0]], np.float32))
    env = EnvironmentMap.constant((0.4, 0.5, 0.7))
    camera = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0],
                            45.0, size, size)
    npix = cfg.frame_buffer_size

    # real bounce-1 shadow wavefront
    scene = scenes[512]
    paths = generate_camera_paths(camera, 0)
    for b in range(2):
        hits, _ = trace_closest_cutout(
            scene, paths.origin, paths.direction, cfg.t_epsilon, paths.tmax,
            paths.is_valid, tracer=cfg.tracer, sort_rays=b >= 1)
        nxt, sp, _ = shade(scene, lights, env, paths, hits, 0, b,
                           cfg.shadow_path_count, npix)
        if b == 1:
            break
        paths = nxt
    tmx = sp.tmax * (1.0 - 1e-3)
    occ0, _ = trace_resident(scenes[512], sp.origin, sp.direction, 1e-3, tmx,
                             sp.is_valid, any_hit=True, sort_rays=True)
    print(f"valid {int(jnp.sum(sp.is_valid))} occluded {int(jnp.sum(occ0))}",
          flush=True)

    for tpc in (512, 128):
        sc = scenes[tpc]
        for tm, rc, srt in ((128, 8, True), (128, 2, True), (128, 16, True),
                            (128, 0, True), (256, 8, True), (128, 8, False)):
            def f(o, d, tmx, act, sc=sc, tm=tm, rc=rc, srt=srt):
                return trace_resident(sc, o, d, 1e-3, tmx, act, tile_rays=tm,
                                      any_hit=True, sort_rays=srt,
                                      exact_cull=True,
                                      recull=rc)[0].astype(jnp.float32)
            per = chained_time(f, sp.origin, sp.direction, tmx, sp.is_valid,
                               short=1, long=4, reps=2)
            print(f"occl tpc={tpc} tm={tm} rc={rc:2d} sorted={int(srt)}: "
                  f"{per*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
