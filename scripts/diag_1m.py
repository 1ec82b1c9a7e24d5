"""1M-triangle scene: decide the (exact_cull, recull) defaults at giant K.

Measured (K=11437, tm=128, 64k rays, honest chained fold):
  incoherent sorted  recull=0 : 1016 ms   recull=8 : 94 ms   (10.8x)
  soup-unsorted      interval : 5614 ms   exact rc=0 : 1905 ms
This run adds REAL camera wavefronts at 1M and recull round-length variants.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/diag_1m.py
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
        [random_tri_soup(1_000_000, seed=7)], tris_per_cluster=128)
    print("clusters:", scene.num_clusters, flush=True)
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    for rc in (8, 16, 32):
        def f(o, d, tmx, act, scn, rc=rc):
            # scene rides *args: a closure would embed the 1M-tri tables as
            # HLO constants and overflow the relay's compile-request limit
            return trace_resident(scn, o, d, 1e-3, tmx, act, tile_rays=128,
                                  sort_rays=True, exact_cull=True,
                                  recull=rc)[0].t
        per = chained_time(f, ro, rd, tmx, act, scene, short=1, long=3, reps=2)
        print(f"incoherent_1m recull={rc}: {per*1e3:8.2f} ms "
              f"({n/per/1e6:.3f} Mrays/s)", flush=True)

    # real camera wavefront, 16x16 pixel-block order (the engine's layout)
    side = 256
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

    for ec, rc in ((False, 0), (True, 0), (True, 8)):
        def f(o, d, tmx, act, scn, ec=ec, rc=rc):
            return trace_resident(scn, o, d, 1e-3, tmx, act, tile_rays=128,
                                  sort_rays=False, exact_cull=ec,
                                  recull=rc)[0].t
        per = chained_time(f, co, cd, tmx, act, scene, short=1, long=3, reps=2)
        print(f"camera_1m exact={ec} recull={rc}: {per*1e3:8.2f} ms "
              f"({n/per/1e6:.3f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
