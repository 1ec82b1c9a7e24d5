"""Headline benchmark: closest-hit trace throughput (Mrays/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 100 Mrays/s/chip north star
(/root/repo/BASELINE.json). Runs on whatever platform jax selects (real TPU
under the driver).

Workload: a full camera wavefront (primary rays, the renderer's hottest
launch) over a 64k-triangle scene, traced by the production Pallas megakernel
tracer (ops/pallas_tracer.py).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    from pg2024_dprt_tpu.core import Camera
    from pg2024_dprt_tpu.ops.trace_api import trace_closest
    from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup

    n_tris = 65536
    n = 65536
    side = 256

    scene = device_scene_from_meshes(
        [random_tri_soup(n_tris, seed=0)], tris_per_cluster=512
    )
    cam = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0], 45.0, side, side)
    # tiled pixel order: 16x16 blocks -> spatially coherent ray tiles
    bs = 16
    ids = np.arange(n)
    by, bx = ids // (side * bs), ids % (side * bs)
    blk, inner = bx // (bs * bs), bx % (bs * bs)
    rows = by * bs + inner // bs
    cols = blk * bs + inner % bs
    pix = jnp.asarray((rows * side + cols).astype(np.int32))
    origin, direction = cam.generate_rays(pix // side, pix % side, jnp.zeros(n), jnp.zeros(n))
    tmax = jnp.full((n,), 3.4e38, jnp.float32)
    active = jnp.ones((n,), bool)

    from pg2024_dprt_tpu.ops.pallas_tracer import trace_pallas

    fn = jax.jit(
        lambda scene, o, d, tm, act: trace_pallas(
            scene, o, d, 1e-3, tm, act, tile_rays=256, region=24, pairs_per_step=4
        )[0]
    )

    # correctness gate: the benchmarked configuration must not drop pairs
    _, dropped = jax.jit(
        lambda scene, o, d, tm, act: trace_pallas(
            scene, o, d, 1e-3, tm, act, tile_rays=256, region=24, pairs_per_step=4
        )
    )(scene, origin, direction, tmax, active)
    assert int(dropped) == 0, f"benchmark config drops {int(dropped)} pairs"

    hits = fn(scene, origin, direction, tmax, active)
    jax.block_until_ready(hits)

    # the tunnel to the device has high run-to-run variance; report the best
    # of several batches (least external interference)
    iters = 10
    best_dt = float("inf")
    for batch in range(5):
        t0 = time.perf_counter()
        for i in range(iters):
            hits = fn(scene, origin + 1e-6 * (batch * iters + i), direction, tmax, active)
        jax.block_until_ready(hits)
        best_dt = min(best_dt, time.perf_counter() - t0)

    mrays = n * iters / best_dt / 1e6
    print(
        json.dumps(
            {
                "metric": "primary_ray_trace_throughput",
                "value": round(mrays, 3),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
