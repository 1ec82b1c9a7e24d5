"""Tracer micro-benchmark (TPU): camera vs random wavefronts.

Usage: python scripts/bench_tracer.py [n_tris] [n_rays] [pairs_per_tile]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_tracer import trace_pallas
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    ppt = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    tm = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    pp = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    tpc = int(sys.argv[6]) if len(sys.argv) > 6 else 128

    scene = device_scene_from_meshes([random_tri_soup(n_tris, seed=0)], tris_per_cluster=tpc)
    print(f"scene: {n_tris} tris, {scene.num_clusters} clusters")

    tmv = tm
    fn = jax.jit(
        lambda scene, o, d, tm, act: trace_pallas(
            scene, o, d, 1e-3, tm, act, region=ppt, tile_rays=tmv, pairs_per_step=pp
        )
    )

    side = int(np.sqrt(n))
    cam = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0], 45.0, side, side)
    # tiled pixel order: 16x16 blocks (coherent ray tiles)
    bs = 16
    ids = np.arange(n)
    by, bx = (ids // (side * bs)), (ids % (side * bs))
    blk, inner = bx // (bs * bs), bx % (bs * bs)
    row = by * bs + inner // bs
    colp = blk * bs + inner % bs
    pix = jnp.asarray((row * side + colp).astype(np.int32))
    co, cd = cam.generate_rays(pix // side, pix % side, jnp.zeros(n), jnp.zeros(n))

    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    tm = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)

    for name, o, d in [("camera", co, cd), ("random", ro, rd)]:
        t0 = time.time()
        h, dropped = fn(scene, o, d, tm, act)
        jax.block_until_ready(h)
        print(f"{name}: first(+compile) {time.time()-t0:.0f}s hits {int(h.is_hit.sum())} dropped {int(dropped)}")
        iters = 10
        best = float("inf")
        for b in range(5):
            t0 = time.time()
            for i in range(iters):
                h, _ = fn(scene, o + 1e-6 * (b * iters + i), d, tm, act)
            jax.block_until_ready(h)
            best = min(best, (time.time() - t0) / iters)
        print(f"{name}: {n/best/1e6:.2f} Mrays/s  ({best*1e3:.1f} ms, best of 5 batches)")


if __name__ == "__main__":
    main()
