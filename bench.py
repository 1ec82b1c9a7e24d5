"""Headline benchmark: closest-hit trace throughput (Mrays/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 100 Mrays/s/chip north star
(/root/repo/BASELINE.json). Runs on whatever platform jax selects (real TPU
under the driver).

Workload: the BASELINE.json traversal config — "single-node 1-bounce
primary-ray trace + BVH traversal (Cornell-box-scale scene)" — as a full
256x256 camera wavefront over the cornell test scene, traced by the
production resident-table Pallas tracer (ops/pallas_resident.py, the
trace_api "auto" selection).  Harder workloads (64k/1M-triangle soups,
sorted-incoherent bounce distributions, any-hit, whole frames, neural
routing) are recorded separately in artifacts/bench_suite.json
(scripts/bench_suite.py).

Methodology (see CLAUDE.md): the axon relay defers/merges unfetched work, so
throughput is measured as the slope of a chained sequence of traces (each
trace's input depends on the previous trace's output) with a host fetch of
the final value — utils/benchmarking.chained_time.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    from pg2024_dprt_tpu.core import Camera
    from pg2024_dprt_tpu.ops.trace_api import trace_closest_checked
    from pg2024_dprt_tpu.scene import cornell_box, device_scene_from_meshes
    from pg2024_dprt_tpu.utils.benchmarking import chained_time

    n = 65536
    side = 256

    meshes, _ = cornell_box()
    scene = device_scene_from_meshes(meshes, tris_per_cluster=128)
    cam = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0], 40.0, side, side)
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

    # sort_rays=False is the engine's own bounce-0 policy: camera wavefronts
    # arrive pixel-block coherent, the morton sort is pure fixed cost there
    # (render/engine.py)
    # correctness gate: the benchmarked configuration must not drop anything
    hits, diag = trace_closest_checked(scene, origin, direction, 1e-3, tmax, active,
                                       sort_rays=False)
    assert int(diag) == 0, f"benchmark config diag={int(diag)}"
    assert int(hits.is_hit.sum()) > 0

    def trace_t(o, d, tmx, act):
        h, _ = trace_closest_checked(scene, o, d, 1e-3, tmx, act, sort_rays=False)
        return h.t

    # best-of-batches across independent chained measurements: the tunnel
    # has ~2-10x run-to-run variance (CLAUDE.md); each measurement is
    # itself an honest chained slope.  Chain lengths 10/110: the transposed
    # single-cluster kernel runs this wavefront in ~0.09 ms, far below the
    # tunnel's ms-scale RTT noise — the default 2/12 chain slope is
    # noise-dominated there (measured negative slopes), while 100 chained
    # calls put ~9 ms of real dependent work between the two fetches.
    per_call = min(
        chained_time(trace_t, origin, direction, tmax, active,
                     short=10, long=110)
        for _ in range(3)
    )
    mrays = n / per_call / 1e6

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
