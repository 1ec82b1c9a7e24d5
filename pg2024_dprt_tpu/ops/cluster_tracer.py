"""TPU production tracer: dense cull -> block dispatch -> tiled intersection.

Why not per-ray BVH stepping: on TPU every traversal step is a data-dependent
gather plus a lockstep `while` iteration — both near-worst-case for a
lane-oriented machine (measured ~0.01 Mrays/s for ops/traversal.py on v5e).
This tracer restructures `optixTrace` into three bulk phases with static
shapes and no per-step gathers:

  1. CULL   (ray x cluster): slab-test every ray against every cluster AABB
             (scene/clusters.py). Dense (m, K) VPU work.
  2. DISPATCH: pack surviving (ray, cluster) pairs into fixed-size work
             blocks of BR rays sharing one cluster. Per-cluster ranks come
             from one cumsum; block ids from one cumsum over per-cluster
             block counts — the MoE-dispatch pattern, and the TPU replacement
             for the reference's per-destination prefix-scan compaction
             (/root/reference/src/cuda/cuda_compaction.cu:352-439). Skewed
             distributions (every ray in one cluster) just produce more
             blocks of that cluster — nothing overflows a per-cluster
             capacity.
  3. INTERSECT: an unrolled sequence of block groups, each Moller-Trumboring
             its BR rays against the cluster's C contiguous cluster-major
             triangles — dense (GB, BR, C) elementwise work — followed by one
             final min-scatter closest-hit reduction.

NOTE: this XLA formulation is kept as a mid-generation tracer (and the
dispatch pattern documentation); production tracing uses the single-kernel
ops/pallas_tracer.py, which subsumes it. Matches ops/traversal.py (the oracle) on hit distances up to fp
reassociation; returns canonical triangle indices via `cl_tri_map` so shading
is tracer-agnostic.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import HitRecord
from ..scene.geometry import DeviceScene

_F32_MAX = np.float32(3.402823466e38)  # np scalar: module-level jax Arrays become hoisted jaxpr consts
_INT_MISS = np.uint32(0xFFFFFFFF)  # np scalar: module-level jax Arrays become hoisted jaxpr consts

GROUP_BLOCKS = 32  # blocks intersected per loop step (bounds peak memory)


def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)


def _enc_t(t):
    """Monotone uint32 encoding of non-negative floats (for min-scatter)."""
    return jax.lax.bitcast_convert_type(t, jnp.uint32)


def _chunk_trace(scene: DeviceScene, o, d, t_min, t_max, active,
                 block_rays: int, block_budget: int, any_hit: bool):
    """Trace one ray chunk (m rays).

    Layout note: every hot array here is 2-D with a 128-aligned minor dim
    ((m, K) or (gb*br, C)); vectors are kept as separate x/y/z component
    arrays. A trailing xyz dim of 3 would waste 125/128 VPU lanes."""
    m = o.shape[0]
    k = scene.num_clusters
    c = scene.tris_per_cluster
    br = block_rays

    # ---- 1. cull (component-wise slab test, (m, K) arrays) ----
    inv = _safe_inv(d)
    enter = jnp.full((m, k), -_F32_MAX)
    exit_ = jnp.full((m, k), _F32_MAX)
    for ax in range(3):
        lo = (scene.cl_aabb_min[None, :, ax] - o[:, None, ax]) * inv[:, None, ax]
        hi = (scene.cl_aabb_max[None, :, ax] - o[:, None, ax]) * inv[:, None, ax]
        enter = jnp.maximum(enter, jnp.minimum(lo, hi))
        exit_ = jnp.minimum(exit_, jnp.maximum(lo, hi))
    hit_box = (
        active[:, None]
        & (scene.cl_count[None, :] > 0)
        & (exit_ >= enter)
        & (exit_ > t_min[:, None])
        & (enter < t_max[:, None])
    )

    # ---- 2. dispatch ----
    rank = jnp.cumsum(hit_box.astype(jnp.int32), axis=0) - 1       # (m, K)
    counts = jnp.sum(hit_box.astype(jnp.int32), axis=0)            # (K,)
    nblocks = -(-counts // br)
    block_off = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(nblocks)[:-1]])
    total_blocks = jnp.sum(nblocks)

    block_id = block_off[None, :] + rank // br
    row_id = rank % br
    in_budget = hit_box & (block_id < block_budget)
    slot = jnp.where(in_budget, block_id * br + row_id, block_budget * br)

    ray_ids = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[:, None], (m, k))
    bucket_ray = (
        jnp.full((block_budget * br + 1,), -1, jnp.int32)
        .at[slot.reshape(-1)]
        .set(ray_ids.reshape(-1), mode="drop")[:-1]
        .reshape(block_budget, br)
    )
    dropped = jnp.sum((hit_box & (~in_budget)).astype(jnp.int32))

    block_end = jnp.cumsum(nblocks)
    # searchsorted via dense compare-sum (binary-search gathers are slow on
    # this backend): block b belongs to cluster #{ends <= b}
    block_cluster = jnp.sum(
        (block_end[None, :] <= jnp.arange(block_budget, dtype=jnp.int32)[:, None]).astype(jnp.int32),
        axis=-1,
    )
    block_cluster = jnp.minimum(block_cluster, k - 1).astype(jnp.int32)
    block_live = jnp.arange(block_budget) < total_blocks

    # ---- 3. intersect ----
    # Backend note: dependent kernel launches cost ~0.5 ms latency each on
    # this TPU path, so the phase is organized as (a) bulk hoisted gathers,
    # (b) an INDEPENDENT map over block groups (iterations pipeline), and
    # (c) one final reduction — instead of a carried scatter chain.
    gb = min(GROUP_BLOCKS, block_budget)
    groups = -(-block_budget // gb)
    pad_b = groups * gb - block_budget

    def padb(a, fill):
        if pad_b == 0:
            return a
        return jnp.concatenate(
            [a, jnp.full((pad_b,) + a.shape[1:], fill, a.dtype)], axis=0
        )

    g_ray = padb(bucket_ray, -1)                      # (G*gb, br)
    g_cluster = padb(block_cluster, 0)                # (G*gb,)
    g_live = padb(block_live, False)

    # hoisted bulk ray gathers (large-index gathers are fast; small are not)
    flat_ray = jnp.maximum(g_ray, 0).reshape(-1)
    all_bo = jnp.take(o, flat_ray, axis=0).reshape(groups, gb, br, 3)
    all_bd = jnp.take(d, flat_ray, axis=0).reshape(groups, gb, br, 3)
    all_tmin = jnp.take(t_min, flat_ray).reshape(groups, gb, br)
    all_tmax = jnp.take(t_max, flat_ray).reshape(groups, gb, br)
    all_valid = ((g_ray >= 0) & g_live[:, None]).reshape(groups, gb, br)

    # hoisted tri tiles via ONE one-hot MXU matmul (few-index row gathers
    # lower to serial slice loops on this backend; one-hot matmuls do not)
    onehot = (g_cluster[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    all_tiles = jnp.dot(onehot, scene.cl_tri_table, preferred_element_type=jnp.float32)
    all_tiles = all_tiles.reshape(groups, gb, 10 * c)

    def group(xs):
        bo, bd, btmin, btmax, bvalid, tile = xs
        comp = lambda j: tile[:, j * c : (j + 1) * c]      # (gb, C)
        btm = jnp.round(comp(9)).astype(jnp.int32)          # (gb, C)

        # component-wise Moller-Trumbore: (gb, br, C) arrays, minor dim = C
        rc = lambda a, ax: a[:, :, ax][:, :, None]
        tc_ = lambda j: comp(j)[:, None, :]                 # (gb, 1, C)
        e1x, e1y, e1z = (tc_(3 + i) - tc_(i) for i in range(3))
        e2x, e2y, e2z = (tc_(6 + i) - tc_(i) for i in range(3))
        dx, dy, dz = (rc(bd, i) for i in range(3))
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > 1e-12
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        tx = rc(bo, 0) - tc_(0)
        ty = rc(bo, 1) - tc_(1)
        tz = rc(bo, 2) - tc_(2)
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        tri_ok = (
            ok
            & (btm[:, None, :] >= 0)
            & bvalid[:, :, None]
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > btmin[:, :, None])
            & (t < btmax[:, :, None])
        )

        if any_hit:
            return jnp.any(tri_ok, axis=-1)  # (gb, br)

        t_masked = jnp.where(tri_ok, t, _F32_MAX)
        best_c = jnp.argmin(t_masked, axis=-1)
        take2 = lambda a: jnp.take_along_axis(a, best_c[:, :, None], axis=-1)[:, :, 0]
        pair_t = take2(t_masked)
        pair_hit = pair_t < _F32_MAX
        t_enc = jnp.where(pair_hit, _enc_t(pair_t), _INT_MISS)
        pair_tri = take2(jnp.broadcast_to(btm[:, None, :], (gb, br, c)))
        return t_enc, pair_tri, take2(u), take2(v)

    xs = (all_bo, all_bd, all_tmin, all_tmax, all_valid, all_tiles)

    def unrolled_map(f, xs):
        # python-unrolled: group computations are independent, so their
        # kernel chains pipeline (lax.map = sequential while_loop would
        # serialize every ~0.5ms-latency launch on this backend)
        outs = [f(jax.tree.map(lambda a: a[g], xs)) for g in range(groups)]
        return jax.tree.map(lambda *ys: jnp.stack(ys), *outs)

    if any_hit:
        occ_pair = unrolled_map(group, xs)             # (G, gb, br)
        tgt = jnp.where(all_valid, g_ray.reshape(groups, gb, br), m).reshape(-1)
        occ = (
            jnp.zeros((m + 1,), jnp.int32)
            .at[tgt]
            .max(occ_pair.astype(jnp.int32).reshape(-1), mode="drop")
        )
        return occ[:m].astype(bool)

    t_enc, pair_tri, pair_u, pair_v = unrolled_map(group, xs)
    t_enc = t_enc.reshape(-1)
    pair_hit = t_enc != _INT_MISS
    tgt = jnp.where(
        all_valid.reshape(-1) & pair_hit, g_ray.reshape(-1), m
    )

    # single final reduction: min-scatter then winner attribution
    best_enc = (
        jnp.full((m + 1,), _INT_MISS, jnp.uint32).at[tgt].min(t_enc, mode="drop")
    )
    winner = pair_hit & (t_enc == jnp.take(best_enc, tgt))
    wslot = jnp.where(winner, tgt, m)
    out_tri = (
        jnp.full((m + 1,), -1, jnp.int32)
        .at[wslot].set(pair_tri.reshape(-1), mode="drop")[:m]
    )
    out_u = jnp.zeros((m + 1,), jnp.float32).at[wslot].set(pair_u.reshape(-1), mode="drop")[:m]
    out_v = jnp.zeros((m + 1,), jnp.float32).at[wslot].set(pair_v.reshape(-1), mode="drop")[:m]
    best_enc = best_enc[:m]
    out_hit = (best_enc != _INT_MISS) & (out_tri >= 0)
    out_t = jnp.where(
        out_hit, jax.lax.bitcast_convert_type(best_enc, jnp.float32), _F32_MAX
    )
    return out_t, out_tri, out_u, out_v, out_hit, dropped


def _pad_and_chunk(n, chunk, arrays_fills):
    pad = (-n) % chunk
    out = []
    for a, fill in arrays_fills:
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
            )
        out.append(a.reshape((-1, chunk) + a.shape[1:]))
    return out


@partial(jax.jit, static_argnames=("block_rays", "block_budget", "chunk"))
def traverse_clusters(
    scene: DeviceScene,
    origin, direction, t_min, t_max, active,
    block_rays: int = 1024,
    block_budget: int = 0,
    chunk: int = 65536,
) -> HitRecord:
    """Closest-hit trace via the cluster dispatch pipeline. Drop-in
    replacement for ops.traversal.traverse_bvh."""
    n = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    chunk = min(chunk, max(n, 1))
    budget = block_budget or _default_budget(scene, chunk, block_rays)

    o, d, tmin, tmax, act = _pad_and_chunk(
        n, chunk,
        [(origin, 0.0), (direction, 1.0), (t_min, 0.0), (t_max, 0.0), (active, False)],
    )

    def body(args):
        t, tri, u, v, hit, _dropped = _chunk_trace(
            scene, *args, block_rays, budget, any_hit=False
        )
        return t, tri, u, v, hit

    t, tri, u, v, hit = jax.lax.map(body, (o, d, tmin, tmax, act))
    flat = lambda a: a.reshape(-1)[:n]
    return HitRecord(
        t=flat(t), tri_index=flat(tri), u=flat(u), v=flat(v), is_hit=flat(hit)
    )


@partial(jax.jit, static_argnames=("block_rays", "block_budget", "chunk"))
def occlusion_clusters(
    scene: DeviceScene,
    origin, direction, t_min, t_max, active,
    block_rays: int = 1024,
    block_budget: int = 0,
    chunk: int = 65536,
):
    """Any-hit (shadow) trace: returns (n,) bool occluded."""
    n = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    chunk = min(chunk, max(n, 1))
    budget = block_budget or _default_budget(scene, chunk, block_rays)

    o, d, tmin, tmax, act = _pad_and_chunk(
        n, chunk,
        [(origin, 0.0), (direction, 1.0), (t_min, 0.0), (t_max, 0.0), (active, False)],
    )

    def body(args):
        return _chunk_trace(scene, *args, block_rays, budget, any_hit=True)

    occ = jax.lax.map(body, (o, d, tmin, tmax, act))
    return occ.reshape(-1)[:n]


def _default_budget(scene: DeviceScene, chunk: int, block_rays: int) -> int:
    """Block budget: exact worst case (every ray in every cluster) capped by
    an average of 32 candidate clusters per ray. Overflow beyond the budget
    is counted per chunk (and shows up as oracle mismatch in tests)."""
    k = scene.num_clusters
    worst = k * ((chunk + block_rays - 1) // block_rays)
    avg = k + (32 * chunk) // block_rays
    return max(GROUP_BLOCKS, min(worst, avg))
