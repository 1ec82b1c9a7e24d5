"""CPU study: how much tile-union waste would per-sub-tile selection recover?

For each tile of TM rays the resident kernel visits the UNION of clusters any
ray in the tile enters (bounded by each ray's true hit distance — the per-ray
horizon re-cull approximates this).  Splitting a 128-ray tile into S sub-tiles
that each run their own selection shrinks the per-iteration work to
max_s |union(sub_s)| visits of S x (TM/S, C) lanes — this script computes the
visit counts (sum over tiles of union / max-sub-union) for camera and
morton-sorted incoherent wavefronts, horizon-bounded, at sub-tile sizes
128/64/32/16.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:$PYTHONPATH python scripts/study_subtile.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_resident import _morton_key
from pg2024_dprt_tpu.ops.traversal import traverse_bvh
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup


def enters(o, d, tmax, lo, hi):
    """(N, K) bool: ray i enters cluster k before tmax_i (exact slab)."""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, np.where(d >= 0, 1e-12, -1e-12), d)
    t0 = (lo[None] - o[:, None]) * inv[:, None]   # (N, K, 3)
    t1 = (hi[None] - o[:, None]) * inv[:, None]
    en = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
    ex = np.maximum(t0, t1).min(-1)
    return (en <= ex) & (ex > 0) & (en < tmax[:, None])


def stats(name, o, d, tmax, lo, hi, tm=128):
    e = enters(o, d, tmax, lo, hi)
    n = o.shape[0]
    print(f"-- {name}: mean per-ray entered clusters "
          f"{e.sum(1).mean():.1f}")
    for sub in (128, 64, 32, 16):
        visits = 0
        for t0_ in range(0, n, tm):
            tile = e[t0_:t0_ + tm]
            m = 0
            for s0 in range(0, tm, sub):
                m = max(m, tile[s0:s0 + sub].any(0).sum())
            visits += m
        lanes = visits * tm * 128          # C = 128 tris per visit row-block
        print(f"   sub={sub:4d}: horizon-bounded visits/tile "
              f"{visits/(n//tm):6.1f}  lane-tests/ray {lanes/n:7.0f}")


def main():
    n = 16384
    ntri = 65536
    scene = device_scene_from_meshes([random_tri_soup(ntri, seed=0)],
                                     tris_per_cluster=128)
    k = scene.num_clusters
    lo = np.asarray(scene.cl_aabb_min)
    hi = np.asarray(scene.cl_aabb_max)
    cnt = np.asarray(scene.cl_count)
    lo = np.where(cnt[:, None] > 0, lo, 1e30)
    hi = np.where(cnt[:, None] > 0, hi, 1e30)
    print(f"clusters: {k}")

    side = 128
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
    act = jnp.ones((n,), bool)
    big = jnp.full((n,), 3.4e38, jnp.float32)
    hits = traverse_bvh(scene, co, cd, 1e-3, big, act)
    # horizon: each ray's true hit t (its re-culled endpoint) + small guard
    tmax = np.where(np.asarray(hits.is_hit),
                    np.asarray(hits.t) * 1.01 + 1e-4, 3.4e38)
    stats("camera", np.asarray(co), np.asarray(cd), tmax, lo, hi)

    rng = np.random.RandomState(1)
    ro = rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    key = np.asarray(_morton_key(scene, jnp.asarray(ro), jnp.asarray(rd)))
    order = np.argsort(key)
    ro, rd = ro[order], rd[order]
    hits = traverse_bvh(scene, jnp.asarray(ro), jnp.asarray(rd), 1e-3, big, act)
    tmax = np.where(np.asarray(hits.is_hit),
                    np.asarray(hits.t) * 1.01 + 1e-4, 3.4e38)
    stats("incoherent-sorted", ro, rd, tmax, lo, hi)


if __name__ == "__main__":
    main()
