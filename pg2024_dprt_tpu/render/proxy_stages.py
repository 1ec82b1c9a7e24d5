"""Neural-proxy stages: AABB marching, query featurization, and prediction
consumption for secondary and shadow rays.

Ports (TPU-vectorized, fully masked):
  * proxy marching loop  — /root/reference/optix/secondary_ray_kernel.cu:230-363
                           and /root/reference/optix/shadow_ray_kernel.cu:205-350
  * secondary routing    — `Target_Node_Update`
                           (/root/reference/src/cuda/frame_buffer_update.cu:222-324)
  * shadow visibility    — `Frame_Buffer_Update` / `Depth_Buffer_Update`
                           (/root/reference/src/cuda/frame_buffer_update.cu:31-215)

Marching semantics (mirrors the OptiX AABB custom-primitive behavior the
reference relies on): a hit inside interval (t_lo, t_cap) is the AABB entry
point when the segment start is outside the box, else the exit point with
`is_inside` set; inside-hits of an already-recorded box advance the march
without emitting a query (the reference's (hitAABBID, instanceID) dedup,
secondary_ray_kernel.cu:310-316).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as cmath
from ..core.types import NNQuery, PathState
from ..models.proxy import ProxyModels, apply_grouped
from ..ops.trace_api import trace_closest_cutout as trace_closest, trace_occlusion_cutout as trace_occlusion
from ..scene.geometry import DeviceScene, ProxyTable

# np scalar, not jnp: a module-level jax Array becomes a hoisted
# jaxpr CONSTANT of every traced program that closes over it (extra
# hidden executable params; breaks AOT Compiled calls)
_F32_MAX = np.float32(3.402823466e38)


def march_proxies_xla(
    proxies: ProxyTable,
    origin: jnp.ndarray,     # (N,3)
    direction: jnp.ndarray,  # (N,3)
    t_cap: jnp.ndarray,      # (N,) current local-hit distance (upper bound)
    active: jnp.ndarray,     # (N,) bool
    my_node,                 # scalar i32 — own partition is never a proxy
    max_hits: int,
    eps: float,
) -> NNQuery:
    """March up to `max_hits` proxy-AABB hits per ray. Returns a flattened
    NNQuery with Q = N * max_hits rows (row n*max_hits+k = ray n's k-th hit).
    Also usable to detect 'no proxy hit at all' via per-ray any(valid)."""
    n = origin.shape[0]
    p = proxies.num_partitions

    inv_dir = 1.0 / jnp.where(
        jnp.abs(direction) < 1e-12,
        jnp.where(direction >= 0, 1e-12, -1e-12),
        direction,
    )

    # (N, P) slab tests once; marching only moves the interval.  Broadcast
    # operands are materialized at (N, P, 3) explicitly (house rule on this
    # backend: never leave (1,P,3)x(N,1,3) lazy-broadcast chains to the
    # fuser — see CLAUDE.md backend quirks).
    Bp = lambda a: jnp.broadcast_to(a[None, :, :], (n, p, 3))
    Br = lambda a: jnp.broadcast_to(a[:, None, :], (n, p, 3))
    o_b, i_b = Br(origin), Br(inv_dir)
    t0 = (Bp(proxies.aabb_min) - o_b) * i_b
    t1 = (Bp(proxies.aabb_max) - o_b) * i_b
    t_enter = jnp.max(jnp.minimum(t0, t1), axis=-1)  # (N, P)
    t_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)
    # own-partition exclusion: by OWNING NODE when instanced (an instance
    # hosted by my partition is local geometry, not a proxy)
    row_node = (proxies.node_id if proxies.node_id is not None
                else jnp.arange(p, dtype=jnp.int32))
    row_obj = (proxies.obj_id if proxies.obj_id is not None
               else jnp.arange(p, dtype=jnp.int32))
    box_ok = (
        (t_exit >= t_enter)
        & (row_node[None, :] != my_node)
        & active[:, None]
        # exclude empty partitions (inverted-infinity AABBs)
        & (proxies.max_length > 0.0)[None, :]
    )

    box_span = jnp.maximum(proxies.aabb_max - proxies.aabb_min, 1e-12)  # (P,3)

    t_lo = jnp.zeros((n,), jnp.float32)
    seen = jnp.zeros((n,), jnp.uint32)  # bitmask of recorded boxes (dedup)
    slot = jnp.zeros((n,), jnp.int32)   # next output slot per ray

    out_feat = jnp.zeros((n, max_hits, 5), jnp.float32)
    out_aabb = jnp.full((n, max_hits), -1, jnp.int32)
    out_inside = jnp.zeros((n, max_hits), bool)
    out_valid = jnp.zeros((n, max_hits), bool)
    out_t = jnp.zeros((n, max_hits), jnp.float32)
    out_seq = jnp.zeros((n, max_hits), jnp.int32)
    out_ratio = jnp.ones((n, max_hits), jnp.float32)

    live = active
    for _ in range(max_hits):
        lo = t_lo[:, None] + eps
        inside = t_enter <= lo  # segment start inside this box
        cand = jnp.where(inside, t_exit, t_enter)
        ok = box_ok & live[:, None] & (cand > lo) & (cand < t_cap[:, None])
        cand_masked = jnp.where(ok, cand, _F32_MAX)
        best = jnp.argmin(cand_masked, axis=-1)  # (N,)
        best_t = jnp.take_along_axis(cand_masked, best[:, None], axis=-1)[:, 0]
        found = best_t < _F32_MAX
        best_inside = jnp.take_along_axis(inside, best[:, None], axis=-1)[:, 0] & found

        dup = best_inside & ((seen >> best.astype(jnp.uint32)) & jnp.uint32(1)).astype(bool)
        record = found & (~dup)

        point = origin + best_t[:, None] * direction
        if proxies.instanced:
            # object-space features + world/object depth scale (reference
            # originLocal/pointLocal/directionLocal + tMax/|oL-pL| ratio,
            # secondary_ray_kernel.cu:289-303).  For an affine instance the
            # ratio is constant along the ray: 1 / |M_lin d| (d unit).
            M = jnp.take(proxies.world_to_obj, best, axis=0)   # (N, 3, 4)
            lin = M[:, :, :3]
            p_l = jnp.einsum("nij,nj->ni", lin, point) + M[:, :, 3]
            d_l = jnp.einsum("nij,nj->ni", lin, direction)
            ratio = 1.0 / jnp.maximum(
                jnp.sqrt(jnp.sum(d_l * d_l, axis=-1)), 1e-12)
            bmin = jnp.take(proxies.obj_min, best, axis=0)
            span = jnp.maximum(jnp.take(proxies.obj_span, best, axis=0), 1e-12)
            local = (p_l - bmin) / span
            feat_dir = jnp.where(best_inside[:, None], -d_l, d_l)
        else:
            ratio = jnp.ones((n,), jnp.float32)
            bmin = jnp.take(proxies.aabb_min, best, axis=0)
            span = jnp.take(box_span, best, axis=0)
            local = (point - bmin) / span
            feat_dir = jnp.where(best_inside[:, None], -direction, direction)
        phi, theta = cmath.spherical_for_train(cmath.normalize(feat_dir))
        feats = jnp.concatenate(
            [local, (phi / (2.0 * jnp.pi))[:, None], (theta / jnp.pi)[:, None]],
            axis=-1,
        )

        write = record
        k = jnp.where(write, slot, 0)
        row = jnp.arange(n)
        out_feat = out_feat.at[row, k].set(
            jnp.where(write[:, None], feats, out_feat[row, k])
        )
        out_aabb = out_aabb.at[row, k].set(jnp.where(write, best.astype(jnp.int32), out_aabb[row, k]))
        out_inside = out_inside.at[row, k].set(jnp.where(write, best_inside, out_inside[row, k]))
        out_valid = out_valid.at[row, k].set(out_valid[row, k] | write)
        out_t = out_t.at[row, k].set(jnp.where(write, best_t, out_t[row, k]))
        out_seq = out_seq.at[row, k].set(jnp.where(write, slot, out_seq[row, k]))
        out_ratio = out_ratio.at[row, k].set(
            jnp.where(write, ratio, out_ratio[row, k]))

        seen = jnp.where(record, seen | (jnp.uint32(1) << best.astype(jnp.uint32)), seen)
        slot = jnp.where(record, slot + 1, slot)
        t_lo = jnp.where(found, best_t, t_lo)
        live = live & found & (slot < max_hits)

    def flat(a):
        return a.reshape((n * max_hits,) + a.shape[2:])

    rows_safe = jnp.maximum(flat(out_aabb), 0)
    ml = jnp.take(proxies.max_length, rows_safe, axis=0)
    ratio_f = flat(out_ratio)
    valid_f = flat(out_valid)
    return NNQuery(
        features=flat(out_feat),
        # NN grouping key = OBJECT id (instances share their object's net)
        aabb_id=jnp.where(valid_f, jnp.take(row_obj, rows_safe), -1),
        pixel_index=jnp.zeros((n * max_hits,), jnp.int32),  # filled by caller
        shadow_path_id=jnp.zeros((n * max_hits,), jnp.int32),
        hit_sequence=flat(out_seq),
        is_inside=flat(out_inside),
        is_valid=valid_f,
        path_index=jnp.repeat(jnp.arange(n, dtype=jnp.int32), max_hits),
        aabb_t=flat(out_t),
        max_length=ml,
        # world-t / object-t scale (1 without instancing; reference
        # tMax/|originLocal-pointLocal|, secondary_ray_kernel.cu:292)
        t_ratio=ratio_f,
        # object-space entry depth for the inside-hit comparison
        normalized_t=flat(out_t) / jnp.maximum(ratio_f * ml, 1e-12),
        # routing target = owning partition of the hit instance
        node_id=jnp.where(valid_f, jnp.take(row_node, rows_safe), -1),
    )


def march_proxies(
    proxies: ProxyTable,
    origin, direction, t_cap, active, my_node,
    max_hits: int,
    eps: float,
) -> NNQuery:
    """Backend dispatch for the proxy march: the Pallas kernel on
    accelerators (ops/pallas_march.py — the XLA formulation is ~15x slower
    whenever it shares a jit module with a Mosaic tracer kernel, see that
    module's docstring), the XLA reference implementation on CPU (also the
    test oracle)."""
    import jax as _jax

    if _jax.default_backend() == "cpu":
        return march_proxies_xla(proxies, origin, direction, t_cap, active,
                                 my_node, max_hits, eps)
    from ..ops.pallas_march import march_proxies_pallas

    return march_proxies_pallas(proxies, origin, direction, t_cap, active,
                                my_node, max_hits, eps)


def _use_fused_route(scene, models: ProxyModels, tracer: str) -> bool:
    """True when the one-kernel routing megakernel (ops/pallas_route.py)
    applies: accelerator backend with the resident tracer family,
    no-cutout scene, architecturally identical vis/depth nets whose stacked
    weights fit the VMEM budget."""
    if models.combined:
        return False  # SEPARATEDNN=0 runs the composed path (the reference
        # itself only implements combined consumption for shadows)
    if jax.default_backend() == "cpu" or tracer not in ("auto", "resident"):
        return False
    if getattr(scene, "cl_xf", None) is not None:
        return False  # instanced LOCAL geometry: route kernel's in-kernel
        # trace has no object-space stage (instanced PROXIES are supported)
    tex = scene.albedo_textures
    if tex is not None and tex.count > 0 and tex.has_cutout:
        return False
    c_v, c_d = models.vis_cfg, models.depth_cfg
    if (c_v.width, c_v.depth, c_v.in_features, c_v.head_hidden) != \
            (c_d.width, c_d.depth, c_d.in_features, c_d.head_hidden):
        return False
    from ..ops.pallas_mlp import DENSE_WEIGHT_LIMIT, _param_bytes

    return (_param_bytes(models.vis_params)
            + _param_bytes(models.depth_params)) <= DENSE_WEIGHT_LIMIT


def _nn_pair(models: ProxyModels, feats, obj_id, valid):
    """vis + depth inference for one query batch: the fused Pallas pair
    kernel on accelerators (one dispatch + one launch, ops/pallas_mlp.py),
    two XLA grouped sweeps on CPU / mismatched architectures (the oracle).
    Depth is computed wherever vis is; consumers mask inside-hits
    themselves (frame_buffer_update.cu:31-72 reads depth only when
    isInside)."""
    c_v, c_d = models.vis_cfg, models.depth_cfg
    if models.combined:
        # SEPARATEDNN=0 (renderer.cpp:35): ONE double-output grouped sweep
        # yields both predictions (channel 0 = vis, 1 = depth;
        # frame_buffer_update.cu:64-70).  The reference only consumes the
        # combined net on the shadow path (the secondary #else branch is a
        # stub, frame_buffer_update.cu:254-256); here the secondary tMax
        # consumption reads the same channels symmetrically.
        from ..models.proxy import apply_grouped_all

        out = apply_grouped_all(models.vis_params, c_v, feats, obj_id, valid,
                                models.num_objects)
        return out[:, 0], out[:, 1]
    if models.multi_geo:
        # one shared 6-feature net for every object (reference
        # MultiGeoNeuralVisNetwork): no grouping, one dense pass per net
        from ..models.proxy import apply_multigeo

        vis = apply_multigeo(models.vis_params, c_v, feats, obj_id, valid)
        depth = apply_multigeo(models.depth_params, c_d, feats, obj_id, valid)
        return vis, depth
    same_arch = (c_v.width, c_v.depth, c_v.in_features, c_v.head_hidden) == \
                (c_d.width, c_d.depth, c_d.in_features, c_d.head_hidden)
    if jax.default_backend() != "cpu" and same_arch:
        from ..ops.pallas_mlp import (
            DENSE_WEIGHT_LIMIT, _param_bytes, grouped_mlp_dense,
            grouped_mlp_pair,
        )

        if (_param_bytes(models.vis_params)
                + _param_bytes(models.depth_params)) <= DENSE_WEIGHT_LIMIT:
            # dispatch-free dense kernel: O x the MXU FLOPs (cheap) for a
            # sort/scatter-free surrounding graph (the expensive part here)
            return grouped_mlp_dense(models.vis_params, models.depth_params,
                                     c_v, c_d, feats, obj_id, valid,
                                     models.num_objects)
        return grouped_mlp_pair(models.vis_params, models.depth_params,
                                c_v, c_d, feats, obj_id, valid,
                                models.num_objects)
    vis = apply_grouped(models.vis_params, c_v, feats, obj_id, valid,
                        models.num_objects)
    depth = apply_grouped(models.depth_params, c_d, feats, obj_id, valid,
                          models.num_objects)
    return vis, depth


def secondary_route(
    scene: DeviceScene,
    proxies: ProxyTable,
    models: ProxyModels,
    env,
    paths: PathState,
    my_id,
    max_hits: int,
    eps: float,
    frame_buffer_size: int,
    tracer: str = "auto",
):
    """`secondaryRayModuleBasedNN` port (/root/reference/src/render/
    renderer.cpp:1407-1452): local closest hit + proxy march + vis/depth nets
    -> per-path routing decision (target_node / tmax / is_hit). Returns
    (updated paths, env_image_add, diag)."""
    n = paths.capacity
    live = paths.is_valid & (~paths.is_shadow)

    if _use_fused_route(scene, models, tracer):
        from ..ops.pallas_route import route_fused

        dec = route_fused(
            scene, proxies, models,
            paths.origin, paths.direction, eps, paths.tmax, live, my_id,
            max_hits, eps,
        )
        env_radiance = env.sample(paths.direction)
        env_add = jax.ops.segment_sum(
            jnp.where(dec["env_miss"][:, None], paths.throughput * env_radiance, 0.0),
            paths.pixel_index,
            num_segments=frame_buffer_size,
        )
        has_node = dec["has_node"]
        no_route = dec["no_route"]
        node = jnp.where(has_node, dec["settled_node"],
                         jnp.where(no_route, jnp.asarray(my_id, jnp.int32),
                                   paths.current_node)).astype(jnp.int32)
        tnode = jnp.where(has_node, dec["settled_node"],
                          jnp.where(no_route, jnp.asarray(my_id, jnp.int32),
                                    paths.target_node)).astype(jnp.int32)
        new_paths = paths._replace(
            tmax=jnp.where(live, jnp.where(has_node, dec["new_t"], 0.0), paths.tmax),
            current_node=node,
            target_node=tnode,
            is_hit=jnp.where(live, has_node, paths.is_hit),
            is_valid=paths.is_valid & (~dec["env_miss"]),
            visited_mask=jnp.where(live, jnp.uint32(0xFFFFFFFF), paths.visited_mask),
        )
        return new_paths, env_add, jnp.int32(0)

    hits, diag = trace_closest(scene, paths.origin, paths.direction, eps, paths.tmax, live, tracer=tracer)
    local_hit = live & hits.is_hit
    local_t = jnp.where(local_hit, hits.t, paths.tmax)

    q = march_proxies(
        proxies, paths.origin, paths.direction, local_t, live, my_id, max_hits, eps
    )

    vis, depth = _nn_pair(models, q.features, q.aabb_id, q.is_valid)

    # tMaxFloatTypeKernel (frame_buffer_update.cu:222-257)
    pred_hit = q.is_valid & (vis > 0.5)
    pred_len = q.t_ratio * q.max_length * depth
    pred_t = jnp.where(
        q.is_inside,
        jnp.where(pred_len > q.aabb_t, 0.0, q.aabb_t - pred_len),
        q.aabb_t + pred_len,
    )
    pred_t = jnp.where(pred_hit & (pred_t > jnp.finfo(jnp.float32).eps), pred_t, _F32_MAX)

    # targetNodeKernelFloatType (frame_buffer_update.cu:259-324).
    # max_hits is static, so the per-ray argmin over hits unrolls into a
    # strided-slice min chain of 1-D arrays — (n, max_hits) 2-D forms (tiny
    # lane dim) bait XLA's layout assignment into transpose-copy storms
    # next to the Pallas kernels (see ops/pallas_march.py docstring).
    # routing target = OWNING NODE of the winning proxy (== aabb_id unless
    # instanced; reference NNPathData.pathIndex semantics)
    q_node = q.node_id if q.node_id is not None else q.aabb_id
    best_pred_t = pred_t[0::max_hits]
    best_pred_node = q_node[0::max_hits]
    any_query = q.is_valid[0::max_hits]
    for k in range(1, max_hits):
        t_k = pred_t[k::max_hits]
        better = t_k < best_pred_t
        best_pred_node = jnp.where(better, q_node[k::max_hits], best_pred_node)
        best_pred_t = jnp.where(better, t_k, best_pred_t)
        any_query = any_query | q.is_valid[k::max_hits]

    use_pred = live & (best_pred_t < local_t)
    settled_node = jnp.where(
        use_pred, best_pred_node, jnp.where(local_hit, my_id, -1)
    )
    new_t = jnp.where(use_pred, best_pred_t, local_t)

    has_node = settled_node >= 0
    # env fallback: no local hit, no proxy hit at all -> environment + kill
    # (secondary_ray_kernel.cu:355-362)
    env_miss = live & (~local_hit) & (~any_query) & (~has_node)
    env_radiance = env.sample(paths.direction)
    env_add = jax.ops.segment_sum(
        jnp.where(env_miss[:, None], paths.throughput * env_radiance, 0.0),
        paths.pixel_index,
        num_segments=frame_buffer_size,
    )

    # no-route quirk (frame_buffer_update.cu:292-296): stay local with tmax=0;
    # the shade-stage re-trace then resolves env for the remaining misses.
    no_route = live & (~has_node) & (~env_miss)

    new_paths = paths._replace(
        tmax=jnp.where(live, jnp.where(has_node, new_t, 0.0), paths.tmax),
        current_node=jnp.where(has_node, settled_node, jnp.where(no_route, my_id, paths.current_node)).astype(jnp.int32),
        target_node=jnp.where(has_node, settled_node, jnp.where(no_route, my_id, paths.target_node)).astype(jnp.int32),
        is_hit=jnp.where(live, has_node, paths.is_hit),
        is_valid=paths.is_valid & (~env_miss),
        # all partitions marked visited: routing is fully decided here, the
        # migration loop only transports (secondary_ray_kernel.cu:192)
        visited_mask=jnp.where(live, jnp.uint32(0xFFFFFFFF), paths.visited_mask),
    )
    return new_paths, env_add, diag


def shadow_direct_light_nn(
    scene: DeviceScene,
    proxies: ProxyTable,
    models: ProxyModels,
    shadow_paths: PathState,
    my_id,
    max_hits: int,
    eps: float,
    shadow_path_count: int,
    frame_buffer_size: int,
    tracer: str = "auto",
):
    """`shadowRayModuleBasedNN` port (/root/reference/src/render/
    renderer.cpp:1349-1404): local occlusion kill, proxy march, vis nets (+
    depth nets for inside-hits), max-occlusion blend, direct-light image add.
    Returns (direct-light increment (npix, 3), diag)."""
    valid = shadow_paths.is_valid

    if _use_fused_route(scene, models, tracer):
        # one-kernel form (ops/pallas_route.py shadow_route_fused): local
        # occlusion + march + vis/depth nets + max-occlusion blend fused —
        # same launch-count law as the secondary route above
        from ..ops.pallas_route import shadow_route_fused

        dec = shadow_route_fused(
            scene, proxies, models,
            shadow_paths.origin, shadow_paths.direction, eps,
            shadow_paths.tmax * (1.0 - 1e-3), valid, my_id, max_hits, eps)
        contrib = (shadow_paths.throughput * dec["weight"][:, None]
                   / shadow_path_count)
        return jax.ops.segment_sum(
            contrib, shadow_paths.pixel_index,
            num_segments=frame_buffer_size), jnp.int32(0)

    occluded_local, diag = trace_occlusion(
        scene,
        shadow_paths.origin,
        shadow_paths.direction,
        eps,
        shadow_paths.tmax * (1.0 - 1e-3),
        valid,
        tracer=tracer,
    )
    survives = valid & (~occluded_local)

    q = march_proxies(
        proxies,
        shadow_paths.origin,
        shadow_paths.direction,
        shadow_paths.tmax * (1.0 - 1e-3),
        survives,
        my_id,
        max_hits,
        eps,
    )

    # depth nets only consulted for inside-hits (renderer.cpp:1381-1391);
    # the fused pair computes depth wherever vis is and the consumer below
    # masks by isInside, matching the reference's read pattern
    vis, depth = _nn_pair(models, q.features, q.aabb_id, q.is_valid)

    # shadowOcclusionFloatTypeKernel + predDepthUpdateKernel
    # (frame_buffer_update.cu:31-72, 172-192); SEPARATEDNN=0 adds the
    # reference's +0.1 depth slack in the inside-hit compare
    # (frame_buffer_update.cu:68-70: occluded iff pred+0.1 <= normalizedT)
    depth_slack = 0.1 if models.combined else 0.0
    occluded_q = q.is_valid & (vis > 0.5) & (
        (~q.is_inside) | (depth + depth_slack <= q.normalized_t)
    )
    n = shadow_paths.capacity
    # strided 1-D max over the static hit count (layout-safe form, see the
    # targetNode comment in secondary_route)
    max_occ = occluded_q[0::max_hits]
    for k in range(1, max_hits):
        max_occ = max_occ | occluded_q[k::max_hits]
    max_occ = max_occ.astype(jnp.float32)

    # contributionKernelFloatType (frame_buffer_update.cu:95-127)
    contrib = jnp.where(
        survives[:, None],
        shadow_paths.throughput * (1.0 - max_occ)[:, None] / shadow_path_count,
        0.0,
    )
    return jax.ops.segment_sum(
        contrib, shadow_paths.pixel_index, num_segments=frame_buffer_size
    ), diag
