"""End-to-end frame benchmark on real TPU: 1spp multi-bounce frame time
(the BASELINE.md second metric).

Usage: python scripts/bench_frame.py [size] [bounces] [n_tris]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.render.engine import render_sample
from pg2024_dprt_tpu.scene import cornell_box, device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    bounces = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_tris = int(sys.argv[3]) if len(sys.argv) > 3 else 65536

    # soup scene + an area light above it
    mesh = random_tri_soup(n_tris, seed=0)
    scene = device_scene_from_meshes([mesh], tris_per_cluster=512)
    light_tris = np.asarray([[[0.3, 2.0, 0.3], [0.7, 2.0, 0.3], [0.7, 2.0, 0.7]]], np.float32)
    lights = LightTable.from_arrays(light_tris, np.asarray([[60.0, 60.0, 60.0]], np.float32))
    env = EnvironmentMap.constant((0.4, 0.5, 0.7))
    camera = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0], 45.0, size, size)
    cfg = RenderConfig(width=size, height=size, spp=1, bounces=bounces)

    fn = jax.jit(lambda scene, s: render_sample(scene, lights, env, camera, s, cfg))
    t0 = time.time()
    out = fn(scene, 0)
    jax.block_until_ready(out)
    print(f"compile+first: {time.time()-t0:.0f}s")

    iters = 5
    dt = float("inf")
    for b in range(4):
        t0 = time.time()
        for i in range(iters):
            out = fn(scene, b * iters + i + 1)
        jax.block_until_ready(out)
        dt = min(dt, (time.time() - t0) / iters)
    rays = size * size * bounces * (1 + cfg.shadow_path_count)
    print(f"frame {size}x{size} 1spp {bounces} bounces: {dt*1e3:.1f} ms "
          f"({rays/dt/1e6:.2f} Mrays/s incl shadows)")


if __name__ == "__main__":
    main()
