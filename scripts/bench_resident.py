"""Resident-table tracer micro-benchmark (TPU): sweep tile/cluster sizes.

Measurement methodology (IMPORTANT, see CLAUDE.md): the axon relay defers,
memoizes, and can merge in-flight work whose results are never fetched —
block_until_ready alone does NOT force execution, so naive batch timing
reads absurdly fast.  We therefore time a CHAIN of traces inside one jit
where each trace's input depends on the previous trace's output (forcing
real sequential execution), fetch the final value to host, and report the
slope between a short and a long chain (cancelling the fixed tunnel
latency).

Usage: python scripts/bench_resident.py [n_tris] [n_rays] [tpc] [tile_rays]
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_resident import trace_resident, resident_table_bytes
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup


def chained_mrays(trace_fn, o, d, tmx, act, n):
    """Slope-timed chained throughput in Mrays/s via the HONEST bounded
    bit-changing fold (utils/benchmarking.chained_time — the local naive
    `t*1e-30` fold this replaces read ~10x fast, see CLAUDE.md)."""
    from pg2024_dprt_tpu.utils.benchmarking import chained_time

    per_call = chained_time(trace_fn, o, d, tmx, act)
    return n / per_call / 1e6, per_call


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    tpc = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    tm_rays = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    scene = device_scene_from_meshes([random_tri_soup(n_tris, seed=0)], tris_per_cluster=tpc)
    print(f"scene: {n_tris} tris, {scene.num_clusters} clusters of {scene.tris_per_cluster}, "
          f"resident table {resident_table_bytes(scene)/2**20:.1f} MiB")

    def trace_t(o, d, tmx, act):
        h, _ = trace_resident(scene, o, d, 1e-3, tmx, act, tile_rays=tm_rays)
        return h.t

    side = int(np.sqrt(n))
    cam = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0], 45.0, side, side)
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

    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)

    # correctness sample
    h, dropped = trace_resident(scene, co, cd, 1e-3, tmx, act, tile_rays=tm_rays)
    print(f"camera hits {int(h.is_hit.sum())} dropped {int(dropped)}")

    for name, o, d in [("camera", co, cd), ("random", ro, rd)]:
        mrays, per_call = chained_mrays(trace_t, o, d, tmx, act, n)
        print(f"{name}: {mrays:.2f} Mrays/s  ({per_call*1e3:.1f} ms/wavefront, chained)")


if __name__ == "__main__":
    main()
