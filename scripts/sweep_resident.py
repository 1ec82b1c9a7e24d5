"""Resident-tracer design sweep on the real chip: tris_per_cluster x
tile_rays x pixel-block order, camera (unsorted, interval cull) and
incoherent (sorted, exact cull) wavefronts.

The dispatch-waste model (why this sweep): a ray needs ~30 true triangle
tests given a good BVH; the tile-union design tests
visited_clusters(tile) * C per ray.  Smaller tiles and smaller clusters
shrink the union at the cost of per-tile fixed work (cull, selection
extracts) and lane padding (C < 128 pads to the 128-lane VPU tile).  This
script measures where the trade lands on real hardware.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_resident.py [quick]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.utils.benchmarking import chained_time


def camera_rays(n, side, bs):
    cam = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0], 45.0, side, side)
    ids = np.arange(n)
    by, bx = ids // (side * bs), ids % (side * bs)
    blk, inner = bx // (bs * bs), bx % (bs * bs)
    pix = jnp.asarray(((by * bs + inner // bs) * side + (blk * bs + inner % bs)).astype(np.int32))
    return cam.generate_rays(pix // side, pix % side, jnp.zeros(n), jnp.zeros(n))


def main():
    n = 65536
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    tpcs = (128,) if quick else (64, 128)
    tms = (32, 64, 128, 256)

    for tpc in tpcs:
        scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                         tris_per_cluster=tpc)
        print(f"== tpc={tpc}: {scene.num_clusters} clusters ==", flush=True)
        for tm in tms:
            bs = {32: 4, 64: 8, 128: 8, 256: 16}[tm]
            co, cd = camera_rays(n, 256, bs)

            def cam_t(o, d, tmx, act, tm=tm):
                return trace_resident(scene, o, d, 1e-3, tmx, act,
                                      tile_rays=tm, sort_rays=False)[0].t

            def inc_t(o, d, tmx, act, tm=tm):
                return trace_resident(scene, o, d, 1e-3, tmx, act,
                                      tile_rays=tm, sort_rays=True)[0].t

            per = chained_time(cam_t, co, cd, tmx, act, short=2, long=8, reps=2)
            print(f"  camera tm={tm} bs={bs}: {n/per/1e6:7.2f} Mrays/s "
                  f"({per*1e3:.2f} ms)", flush=True)
            per = chained_time(inc_t, ro, rd, tmx, act, short=2, long=8, reps=2)
            print(f"  incoh  tm={tm}:       {n/per/1e6:7.2f} Mrays/s "
                  f"({per*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
