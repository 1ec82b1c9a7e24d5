"""Tune the re-cull round length and tile size on the real chip.

Rows: sorted-incoherent (the re-cull target) over (recull, tile_rays);
camera with exact-cull + re-cull (does the per-ray horizon pay for the
TM x cull cost on coherent tiles?).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_recull.py
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
    scene = device_scene_from_meshes(
        [random_tri_soup(65536, seed=0)], tris_per_cluster=128)
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    for tm, rc in ((128, 4), (128, 16), (64, 8), (256, 8)):
        def f(o, d, tmx, act, tm=tm, rc=rc):
            return trace_resident(scene, o, d, 1e-3, tmx, act, tile_rays=tm,
                                  sort_rays=True, recull=rc)[0].t
        per = chained_time(f, ro, rd, tmx, act, short=2, long=8, reps=2)
        print(f"incoherent tm={tm} recull={rc}: {per*1e3:7.2f} ms "
              f"({n/per/1e6:.2f} Mrays/s)", flush=True)

    side = 256
    cam = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0], 45.0, side, side)
    bs = 16
    ids = np.arange(n)
    by, bx = ids // (side * bs), ids % (side * bs)
    blk, inner = bx // (bs * bs), bx % (bs * bs)
    pix = jnp.asarray(((by * bs + inner // bs) * side + (blk * bs + inner % bs)).astype(np.int32))
    co, cd = cam.generate_rays(pix // side, pix % side, jnp.zeros(n), jnp.zeros(n))

    for ec, rc in ((True, 8), (True, 0)):
        def f(o, d, tmx, act, ec=ec, rc=rc):
            return trace_resident(scene, o, d, 1e-3, tmx, act, tile_rays=128,
                                  sort_rays=False, exact_cull=ec, recull=rc)[0].t
        per = chained_time(f, co, cd, tmx, act, short=2, long=8, reps=2)
        print(f"camera exact={ec} recull={rc}: {per*1e3:7.2f} ms "
              f"({n/per/1e6:.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
