"""Headline benchmark: BVH traversal throughput (Mrays/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 100 Mrays/s/chip north star
(/root/repo/BASELINE.json). Runs on whatever platform jax selects (real TPU
under the driver; CPU if forced).

Scene: 64k-triangle random soup (BVH depth ~16); rays: one full camera
wavefront from inside the soup, re-traced with fresh jitter per iteration.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pg2024_dprt_tpu.ops.traversal import traverse_bvh
    from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup

    n_tris = 65536
    n_rays = 1 << 20

    scene = device_scene_from_meshes([random_tri_soup(n_tris, seed=0)])

    rng = np.random.RandomState(1)
    origin = jnp.asarray(rng.rand(n_rays, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n_rays, 3).astype(np.float32)
    direction = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.full((n_rays,), 3.4e38, jnp.float32)
    active = jnp.ones((n_rays,), bool)

    fn = jax.jit(lambda o: traverse_bvh(scene, o, direction, 1e-3, tmax, active))

    hits = fn(origin)
    jax.block_until_ready(hits)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        hits = fn(origin)
    jax.block_until_ready(hits)
    dt = time.perf_counter() - t0

    mrays = n_rays * iters / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "bvh_traversal_throughput",
                "value": round(mrays, 3),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
