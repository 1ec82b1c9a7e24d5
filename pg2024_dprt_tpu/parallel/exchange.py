"""On-device path migration — the ICI replacement for the reference's
host-staged MPI exchange.

The reference compacts per destination with GPU scans, copies to the host, and
calls `MPI_Alltoall` + `MPI_Alltoallv`
(/root/reference/src/render/renderer.cpp:1230-1315). Here the whole round trip
stays in HBM: one stable sort groups migrating paths by destination
(ops/compaction.py), rows scatter into fixed-capacity per-destination buckets,
and a single `lax.all_to_all` moves them over ICI. Variable-size sends become
capacity+mask, with a demand/allowance handshake (the device-resident
analogue of the reference's `MPI_Alltoall(sendCounts)`,
/root/reference/src/render/renderer.cpp:1272): each sender posts its
per-destination demand, each receiver grants allowances bounded by its free
buffer capacity, and only granted rows ship. Paths denied by bucket capacity
OR by receiver back-pressure stay valid locally and retry next wavefront
iteration, so no path is ever dropped — the merge provably fits (inflow <=
free slots) — and the loop's `psum` termination test keeps running until the
wavefront drains.

`ring_shadow_occlusion` is the exact (non-neural) distributed shadow test the
reference lacks: rotate the shadow buffer around the ring with `ppermute`,
OR-ing in each partition's local occlusion. It doubles as the oracle for the
neural shadow path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import PathState
from ..ops.compaction import compact_by_key, counts_per_key, segment_offsets
from ..ops.trace_api import trace_occlusion_cutout as trace_occlusion
from .mesh import NODES_AXIS


def _tree_all_to_all(tree, axis_name):
    """all_to_all over leading (P, B, ...) leaves; bools ride as uint8."""

    def one(a):
        is_bool = a.dtype == jnp.bool_
        x = a.astype(jnp.uint8) if is_bool else a
        y = jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=0, tiled=False)
        return y.astype(jnp.bool_) if is_bool else y

    return jax.tree.map(one, tree)


def exchange_paths(
    paths: PathState,
    my_id,
    bucket_size: int = 0,
    axis_name: str = NODES_AXIS,
):
    """One migration round. Returns (merged_paths, moved_now, still_waiting).

    moved_now / still_waiting are local scalar counts: paths shipped this
    round and paths that wanted to move but overflowed their bucket."""
    n = paths.capacity
    p = jax.lax.axis_size(axis_name)
    b = bucket_size or -(-n // p)

    target = paths.target_node
    want_move = paths.is_valid & (target >= 0) & (target != my_id)

    # group by destination: one stable sort replaces the per-rank scan family
    perm, sorted_key, moving = compact_by_key(target, want_move)
    sorted_paths = paths.gather(perm)

    counts = counts_per_key(target, want_move, p)
    offsets = segment_offsets(counts)
    dest = jnp.where(moving, sorted_key, 0)
    idx_in_seg = jnp.arange(n, dtype=jnp.int32) - jnp.take(offsets, dest)

    # demand/allowance handshake: receivers grant at most their free capacity
    # (conservatively not counting their own departures this round), so the
    # post-exchange merge can never overflow the fixed buffer.
    demand = jnp.minimum(counts, b)  # (p,) what I would ship per destination
    demand_from = jax.lax.all_to_all(
        demand.reshape(p, 1), axis_name, split_axis=0, concat_axis=0
    ).reshape(p)  # row s = sender s's demand on me
    free = jnp.maximum(n - jnp.sum(paths.is_valid.astype(jnp.int32)), 0)
    before = jnp.cumsum(demand_from) - demand_from  # exclusive prefix
    grant_to = jnp.clip(free - before, 0, demand_from)  # grant per sender
    allow = jax.lax.all_to_all(
        grant_to.reshape(p, 1), axis_name, split_axis=0, concat_axis=0
    ).reshape(p)  # allow[d] = my granted send count to destination d

    send_ok = moving & (idx_in_seg < jnp.take(allow, dest))
    slot = jnp.where(send_ok, dest * b + idx_in_seg, p * b)  # overflow -> pad row

    def scatter(leaf):
        buf = jnp.zeros((p * b + 1,) + leaf.shape[1:], leaf.dtype)
        return buf.at[slot].set(leaf, mode="drop")[: p * b]

    send = jax.tree.map(scatter, sorted_paths)
    send_valid = (
        jnp.zeros((p * b + 1,), jnp.bool_).at[slot].set(send_ok, mode="drop")[: p * b]
    )
    send = send._replace(is_valid=send.is_valid & send_valid)

    recv = _tree_all_to_all(
        jax.tree.map(lambda a: a.reshape((p, b) + a.shape[1:]), send), axis_name
    )
    recv = jax.tree.map(lambda a: a.reshape((p * b,) + a.shape[2:]), recv)

    # rows that left this device become invalid locally
    sent_orig = jnp.zeros((n,), jnp.bool_).at[perm].set(send_ok)
    stay = paths._replace(is_valid=paths.is_valid & (~sent_orig))

    # merge stay + received into the fixed-capacity buffer (valid rows first)
    merged = jax.tree.map(lambda a, c: jnp.concatenate([a, c], axis=0), stay, recv)
    mperm, _, _ = compact_by_key(jnp.zeros((n + p * b,), jnp.int32), merged.is_valid)
    merged = jax.tree.map(lambda a: jnp.take(a, mperm[:n], axis=0), merged)

    moved_now = jnp.sum(send_ok.astype(jnp.int32))
    still_waiting = jnp.sum((want_move & ~sent_orig).astype(jnp.int32))
    arrivals = jnp.sum(recv.is_valid.astype(jnp.int32))
    return merged, moved_now, still_waiting, arrivals


def ring_shadow_occlusion(
    scene,
    shadow_paths: PathState,
    eps: float,
    axis_name: str = NODES_AXIS,
    tracer: str = "auto",
    proxies=None,
):
    """Exact distributed occlusion: rotate (rays, flags) around the ring;
    every partition ORs in its local test. After P-1 hops each buffer has been
    tested everywhere; contributions are added wherever the buffer ends up
    (the direct-light image is psum-reduced anyway).

    When `proxies` carries conservative visibility grids
    (ProxyTable.vis_grid), each hop pre-filters rays whose segment misses the
    hosting partition's AABB or whose grid entry bin is provably empty —
    exact culling of the per-hop occlusion trace (reference role:
    bvh_intersection.cu:234-310 consulting the grid inside the kernel).

    Returns (resident_shadow_paths, occluded_flags, diag, grid_culled)."""
    p = jax.lax.axis_size(axis_name)
    use_grids = proxies is not None and proxies.vis_grid is not None
    my_id = jax.lax.axis_index(axis_name).astype(jnp.int32)

    def local_test(sp):
        active = sp.is_valid
        culled = jnp.int32(0)
        if use_grids:
            from ..scene.visibility_grid import query_conservative_grids

            lo = jnp.take(proxies.aabb_min, my_id, axis=0)  # (3,)
            hi = jnp.take(proxies.aabb_max, my_id, axis=0)
            inv = 1.0 / jnp.where(
                jnp.abs(sp.direction) < 1e-12,
                jnp.where(sp.direction >= 0, 1e-12, -1e-12), sp.direction)
            t0 = (lo[None] - sp.origin) * inv
            t1 = (hi[None] - sp.origin) * inv
            t_near = jnp.minimum(t0, t1)          # (N, 3)
            t_enter = jnp.max(t_near, axis=-1)
            t_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)
            seg_hit = (t_exit >= jnp.maximum(t_enter, eps)) & (t_enter < sp.tmax)
            vis = query_conservative_grids(
                jnp.take(proxies.vis_grid, my_id[None], axis=0), lo[None], hi[None],
                sp.origin, sp.direction, t_enter[:, None], t_near[:, None, :],
            )[:, 0]
            mask = seg_hit & (vis | (t_enter <= eps))
            culled = jnp.sum((sp.is_valid & ~mask).astype(jnp.int32))
            active = active & mask
        occ, d = trace_occlusion(
            scene, sp.origin, sp.direction, eps, sp.tmax * (1.0 - 1e-3), active,
            tracer=tracer,
        )
        return occ & active, d, culled

    occ, diag, grid_culled = local_test(shadow_paths)
    sp = shadow_paths
    perm = [(i, (i + 1) % p) for i in range(p)]
    bool_fields = {i for i, a in enumerate(sp) if a.dtype == jnp.bool_}
    for _ in range(p - 1):
        packed = jax.tree.map(
            lambda a: a.astype(jnp.uint8) if a.dtype == jnp.bool_ else a, (sp, occ)
        )
        sp_u8, occ_u8 = jax.lax.ppermute(packed, axis_name, perm)
        sp = type(sp)(*[
            a.astype(jnp.bool_) if i in bool_fields else a
            for i, a in enumerate(sp_u8)
        ])
        local_occ, d, c = local_test(sp)
        occ = occ_u8.astype(jnp.bool_) | local_occ
        diag = diag + d
        grid_culled = grid_culled + c
    return sp, occ, diag, grid_culled
