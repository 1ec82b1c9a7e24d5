"""Wavefront BVH traversal — the TPU replacement for `optixTrace`.

Design: every ray in the wavefront carries a single `node` cursor into the
threaded BVH (scene/bvh.py). One `lax.while_loop` advances all rays in
lockstep; each iteration is

    gather node AABBs  ->  vectorized slab test  ->  masked leaf
    triangle tests (fixed MAX_LEAF unroll, Moller-Trumbore)  ->
    cursor update (descend / skip)

so the inner loop is pure VPU work over (N,)-shaped arrays with no
data-dependent shapes — the XLA-friendly equivalent of the reference's
per-thread hardware traversal (/root/reference/optix/kernel.cu:386-413). Rays
that finish early idle at cursor -1 until the whole wavefront converges;
upstream sorting of rays (the wavefront compaction step) keeps convergence
tight.

`intersect_brute_force` is the all-triangles oracle used by the tests
(generalizing the reference's `scanCPU` oracle pattern,
/root/reference/src/cuda/cuda_compaction.cu:298-304).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import HitRecord
from ..scene.bvh import MAX_LEAF
from ..scene.geometry import DeviceScene

_F32_MAX = np.float32(3.402823466e38)  # np scalar: module-level jax Arrays become hoisted jaxpr consts


def _moller_trumbore(o, d, p0, p1, p2, t_min, t_max):
    """Vectorized triangle intersection. Returns (hit, t, u, v)."""
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    # two-sided; reject near-parallel
    valid = jnp.abs(det) > 1e-12
    inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
    tvec = o - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        valid
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, t, u, v


@jax.jit
def traverse_bvh(
    scene: DeviceScene,
    origin: jnp.ndarray,     # (N,3)
    direction: jnp.ndarray,  # (N,3)
    t_min,                   # scalar or (N,)
    t_max,                   # (N,) initial upper bound (e.g. path.tmax)
    active,                  # (N,) bool — rays to trace at all
) -> HitRecord:
    """Closest-hit traversal of one partition's BVH."""
    n = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    best_t = jnp.where(active, jnp.asarray(t_max, jnp.float32), 0.0)
    inv_dir = 1.0 / jnp.where(jnp.abs(direction) < 1e-12,
                              jnp.where(direction >= 0, 1e-12, -1e-12),
                              direction)

    node0 = jnp.where(active, 0, -1).astype(jnp.int32)

    state = dict(
        node=node0,
        t=best_t,
        tri=jnp.full((n,), -1, jnp.int32),
        u=jnp.zeros((n,), jnp.float32),
        v=jnp.zeros((n,), jnp.float32),
    )

    nmin = scene.node_min
    nmax = scene.node_max
    nfirst = scene.node_first
    ncount = scene.node_count
    nskip = scene.node_skip

    def cond(s):
        return jnp.any(s["node"] >= 0)

    def body(s):
        node = jnp.maximum(s["node"], 0)  # safe gather index for idle lanes
        live = s["node"] >= 0

        bmin = jnp.take(nmin, node, axis=0)
        bmax = jnp.take(nmax, node, axis=0)
        first = jnp.take(nfirst, node, axis=0)
        count = jnp.take(ncount, node, axis=0)
        skip = jnp.take(nskip, node, axis=0)

        # slab test against current best t
        t0 = (bmin - origin) * inv_dir
        t1 = (bmax - origin) * inv_dir
        near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), t_min)
        far = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), s["t"])
        box_hit = live & (near <= far)

        is_leaf = count > 0
        do_leaf = box_hit & is_leaf

        t_best, tri_best, u_best, v_best = s["t"], s["tri"], s["u"], s["v"]
        for k in range(MAX_LEAF):
            tri_idx = jnp.minimum(first + k, scene.num_triangles - 1)
            lane = do_leaf & (k < count)
            p0 = jnp.take(scene.v0, tri_idx, axis=0)
            p1 = jnp.take(scene.v1, tri_idx, axis=0)
            p2 = jnp.take(scene.v2, tri_idx, axis=0)
            tv = jnp.take(scene.tri_valid, tri_idx, axis=0)
            hit, t, u, v = _moller_trumbore(origin, direction, p0, p1, p2, t_min, t_best)
            hit = hit & lane & tv
            t_best = jnp.where(hit, t, t_best)
            tri_best = jnp.where(hit, tri_idx.astype(jnp.int32), tri_best)
            u_best = jnp.where(hit, u, u_best)
            v_best = jnp.where(hit, v, v_best)

        descend = box_hit & (~is_leaf)
        nxt = jnp.where(descend, node + 1, skip)
        nxt = jnp.where(live, nxt, -1)

        return dict(node=nxt, t=t_best, tri=tri_best, u=u_best, v=v_best)

    state = jax.lax.while_loop(cond, body, state)

    is_hit = state["tri"] >= 0
    return HitRecord(
        t=jnp.where(is_hit, state["t"], _F32_MAX),
        tri_index=state["tri"],
        u=state["u"],
        v=state["v"],
        is_hit=is_hit,
    )


@jax.jit
def intersect_brute_force(scene: DeviceScene, origin, direction, t_min, t_max, active) -> HitRecord:
    """O(N*T) oracle: test every ray against every triangle. Test-only."""
    n = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    def per_ray(o, d, tmin, tmax, act):
        hit, t, u, v = _moller_trumbore(
            o[None, :], d[None, :], scene.v0, scene.v1, scene.v2, tmin, tmax
        )
        hit = hit & scene.tri_valid & act
        t = jnp.where(hit, t, _F32_MAX)
        i = jnp.argmin(t)
        return t[i], jnp.where(hit[i], i, -1).astype(jnp.int32), u[i], v[i], hit[i]

    t, tri, u, v, is_hit = jax.vmap(per_ray)(origin, direction, t_min, t_max, active)
    return HitRecord(t=t, tri_index=tri, u=u, v=v, is_hit=is_hit)
