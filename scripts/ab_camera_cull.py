"""Decide the camera-tile cull default at moderate K: interval vs exact vs
exact+recull, several independent chained measurements each (tunnel variance
is ~2x; only >3x single-shot effects are decidable, so repeat).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_camera_cull.py
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.utils.benchmarking import chained_time


def main():
    n = 65536
    side = 256
    scene = device_scene_from_meshes(
        [random_tri_soup(65536, seed=0)], tris_per_cluster=128)
    print("clusters:", scene.num_clusters, flush=True)
    cam = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0],
                         45.0, side, side)
    bs = 16
    ids = np.arange(n)
    by, bx = ids // (side * bs), ids % (side * bs)
    blk, inner = bx // (bs * bs), bx % (bs * bs)
    pix = jnp.asarray(((by * bs + inner // bs) * side
                       + (blk * bs + inner % bs)).astype(np.int32))
    co, cd = cam.generate_rays(pix // side, pix % side,
                               jnp.zeros(n), jnp.zeros(n))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)

    cfgs = [("interval", False, 0), ("exact", True, 0), ("exact+rc8", True, 8)]
    for trial in range(3):
        for name, ec, rc in cfgs:
            def f(o, d, tmx, act, ec=ec, rc=rc):
                return trace_resident(scene, o, d, 1e-3, tmx, act,
                                      tile_rays=128, sort_rays=False,
                                      exact_cull=ec, recull=rc)[0].t
            per = chained_time(f, co, cd, tmx, act)
            print(f"trial {trial} camera {name:10s}: {per*1e3:6.2f} ms "
                  f"({n/per/1e6:5.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
