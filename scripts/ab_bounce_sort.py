"""Does the morton sort pay for itself on the REAL bounce wavefronts?

sweep_occl showed the sort is a 2.5x LOSS for NEE shadow rays (pixel order
inherits the parents' frustum coherence).  This A/Bs the bounce-1/2 CLOSEST
wavefronts (BSDF-scattered directions, pixel-coherent origins) and the
bounce-1 shadow wavefront at both cluster sizes, plus the pure random-soup
wavefront (the incoherent_64k benchmark shape) as the control where sorting
is known to win.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_bounce_sort.py
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
    scene = device_scene_from_meshes([mesh], tris_per_cluster=512)
    light_tris = np.asarray(
        [[[0.3, 2.0, 0.3], [0.7, 2.0, 0.3], [0.7, 2.0, 0.7]]], np.float32)
    lights = LightTable.from_arrays(
        light_tris, np.asarray([[60.0, 60.0, 60.0]], np.float32))
    env = EnvironmentMap.constant((0.4, 0.5, 0.7))
    camera = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0],
                            45.0, size, size)
    npix = cfg.frame_buffer_size

    waves = []
    paths = generate_camera_paths(camera, 0)
    for b in range(3):
        hits, _ = trace_closest_cutout(
            scene, paths.origin, paths.direction, cfg.t_epsilon, paths.tmax,
            paths.is_valid, tracer=cfg.tracer, sort_rays=b >= 1)
        nxt, sp, _ = shade(scene, lights, env, paths, hits, 0, b,
                           cfg.shadow_path_count, npix)
        waves.append((b, paths, sp))
        paths = nxt

    for b, p, _sp in waves[1:]:
        for srt in (True, False):
            def f(o, d, tmx, act, srt=srt):
                return trace_resident(scene, o, d, 1e-3, tmx, act,
                                      sort_rays=srt, exact_cull=True)[0].t
            per = chained_time(f, p.origin, p.direction, p.tmax, p.is_valid,
                               short=1, long=5, reps=2)
            print(f"b{b} closest sorted={int(srt)}: {per*1e3:7.2f} ms "
                  f"(live {int(jnp.sum(p.is_valid))})", flush=True)

    # control: pure random wavefront, sorting should win big here
    n = 65536
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)
    for srt in (True, False):
        def f(o, d, tmx, act, srt=srt):
            return trace_resident(scene, o, d, 1e-3, tmx, act,
                                  sort_rays=srt, exact_cull=True)[0].t
        per = chained_time(f, ro, rd, tmx, act, short=1, long=4, reps=2)
        print(f"random-soup closest sorted={int(srt)}: {per*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
