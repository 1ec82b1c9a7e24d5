"""Distributed wavefront render engine over a device mesh.

Port of the reference's multi-rank control flow
(/root/reference/src/render/renderer.cpp:1212-1318, 1457-1570, 2031-2059) as
one shard_map program per sample:

  * path gen on partition 0 only (renderer.cpp:1514-1527)
  * per bounce:
      - bounce >= 1 with neural proxies: `secondary_route` decides every
        path's destination from local hits + vis/depth nets (renderer.cpp:1548)
      - wavefront migration loop: distributed traversal (TraRay) -> sort by
        target -> bucketed `lax.all_to_all` -> `psum` termination test
        (replaces the MPI_Alltoallv / MPI_Allreduce(LAND) loop,
        renderer.cpp:1230-1315)
      - shade at the settled partition (fresh local re-trace, exactly like the
        reference MainRay relaunch, optix/kernel.cu:382-413)
      - shadows: neural proxies (shadowRayModuleBasedNN) or the exact
        ppermute ring (oracle / non-neural mode)
  * final image `psum` across the mesh (replaces MPI_Reduce,
    renderer.cpp:2052)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..core.types import PathState
from ..models.proxy import ProxyModels
from ..ops.trace_api import trace_closest_cutout as trace_closest
from ..render.config import RenderConfig
from ..render.pathgen import generate_camera_paths
from ..render.proxy_stages import secondary_route, shadow_direct_light_nn
from ..render.shade import shade
from ..scene.geometry import DeviceScene, ProxyTable
from .exchange import exchange_paths, ring_shadow_occlusion
from .mesh import NODES_AXIS

# np scalar, not jnp: a module-level jax Array becomes a hoisted
# jaxpr CONSTANT of every traced program that closes over it (extra
# hidden executable params; breaks AOT Compiled calls)
_F32_MAX = np.float32(3.402823466e38)


def _trace_and_route(scene, proxies, env, paths, my_id, eps, npix, tracer="auto",
                     sort_rays=True, use_grids=False):
    """Distributed traversal kernel ("TraRay") port
    (/root/reference/optix/distributed_traversal_kernel.cu:215-339):
    local closest hit honoring visitedMask, own bit set, nearest-unvisited
    proxy pick -> target_node, env + kill on global miss."""
    live = paths.is_valid & (~paths.is_shadow)
    my_bit = ((paths.visited_mask >> my_id.astype(jnp.uint32)) & jnp.uint32(1)).astype(bool)
    do_local = live & (~my_bit)

    hits, diag = trace_closest(scene, paths.origin, paths.direction, eps, paths.tmax,
                               do_local, tracer=tracer, sort_rays=sort_rays)
    new_tmax = jnp.where(hits.is_hit, hits.t, paths.tmax)
    current = jnp.where(do_local & hits.is_hit, my_id, paths.current_node).astype(jnp.int32)
    is_hit = paths.is_hit | (do_local & hits.is_hit)

    visited = jnp.where(
        live, paths.visited_mask | (jnp.uint32(1) << my_id.astype(jnp.uint32)), paths.visited_mask
    )

    # nearest unvisited remote proxy in (eps, tmax)
    p = proxies.num_partitions
    inv_dir = 1.0 / jnp.where(
        jnp.abs(paths.direction) < 1e-12,
        jnp.where(paths.direction >= 0, 1e-12, -1e-12),
        paths.direction,
    )
    t0 = (proxies.aabb_min[None] - paths.origin[:, None, :]) * inv_dir[:, None, :]
    t1 = (proxies.aabb_max[None] - paths.origin[:, None, :]) * inv_dir[:, None, :]
    t_enter = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)
    part_ids = jnp.arange(p, dtype=jnp.uint32)[None, :]
    unvisited = ((visited[:, None] >> part_ids) & jnp.uint32(1)) == 0
    # a segment starting inside the box can hit remote geometry arbitrarily
    # close, so its routing distance is ~eps (visited first)
    cand = jnp.maximum(t_enter, eps * 1.5)
    # empty partitions carry inverted-infinity AABBs whose slab test looks
    # like an infinite box — exclude them explicitly
    nonempty = (proxies.max_length > 0.0)[None, :]
    ok = (
        live[:, None]
        & unvisited
        & nonempty
        & (jnp.arange(p)[None, :] != my_id)
        & (t_exit >= t_enter)
        & (t_exit > eps)
        & (cand < new_tmax[:, None])
    )
    grid_culled = jnp.int32(0)
    if use_grids and proxies.vis_grid is not None:
        # conservative visibility-grid pre-filter: a candidate partition
        # whose grid says "nothing reachable through this entry bin" cannot
        # produce a hit, so dropping it keeps the image exact while cutting
        # migrations (reference role: bvh_intersection.cu:234-310)
        from ..scene.visibility_grid import query_conservative_grids

        vis = query_conservative_grids(
            proxies.vis_grid, proxies.aabb_min, proxies.aabb_max,
            paths.origin, paths.direction, t_enter, jnp.minimum(t0, t1),
        )
        grid_ok = vis | (t_enter <= eps)  # origin inside/at the box: no gate
        grid_culled = jnp.sum((ok & ~grid_ok).astype(jnp.int32))
        ok = ok & grid_ok
    cand = jnp.where(ok, cand, _F32_MAX)
    best = jnp.argmin(cand, axis=-1)
    found = jnp.take_along_axis(cand, best[:, None], axis=-1)[:, 0] < _F32_MAX

    target = jnp.where(live & found, best.astype(jnp.int32), current)

    # global miss: nothing local anywhere visited, no unvisited proxy left
    env_miss = live & (~found) & (~is_hit)
    env_radiance = env.sample(paths.direction)
    env_add = jax.ops.segment_sum(
        jnp.where(env_miss[:, None], paths.throughput * env_radiance, 0.0),
        paths.pixel_index,
        num_segments=npix,
    )

    # carry the winning-hit payload (replaces the reference's MainRay
    # settle relaunch, optix/kernel.cu:382-413): a bounded-trace hit is by
    # construction nearer than every previously recorded one
    upd = do_local & hits.is_hit
    new_paths = paths._replace(
        tmax=jnp.where(live, new_tmax, paths.tmax),
        current_node=current,
        target_node=jnp.where(live, target, paths.target_node),
        visited_mask=visited,
        is_hit=is_hit,
        is_valid=paths.is_valid & (~env_miss),
        hit_tri=jnp.where(upd, hits.tri_index, paths.hit_tri),
        hit_u=jnp.where(upd, hits.u, paths.hit_u),
        hit_v=jnp.where(upd, hits.v, paths.hit_v),
    )
    return new_paths, env_add, diag, grid_culled


def _migration_loop(scene, proxies, env, paths, env_img, my_id, cfg: RenderConfig,
                    sort_rays=True):
    """The primaryRayModule while-loop (renderer.cpp:1230-1315).

    Returns (paths, env_img, diag, truncated, overflow): `truncated` counts
    paths still wanting to migrate when the `max_migrations` safety bound
    trips — they get shaded at the wrong partition, so the count is surfaced
    instead of silently accepted (the reference's 2x-buffer assert analogue,
    renderer.cpp:1562).  `overflow` counts path-rounds denied by bucket
    capacity or receiver back-pressure (each retried next round) — a
    diagnostic that the small-bucket regime was actually exercised."""
    npix = cfg.frame_buffer_size
    bucket = max(1, int(paths.capacity * cfg.bucket_fraction) // max(1, proxies.num_partitions))

    def body(carry):
        paths, env_img, _pending, it, diag, ovf, culled = carry
        paths, env_add, d, gc = _trace_and_route(
            scene, proxies, env, paths, my_id, cfg.t_epsilon, npix, cfg.tracer,
            sort_rays, use_grids=cfg.use_visibility_grids)
        paths, moved, waiting, arrivals = exchange_paths(paths, my_id, bucket_size=bucket)
        pending = jax.lax.psum(waiting + arrivals, NODES_AXIS)
        return (paths, env_img + env_add, pending, it + 1, diag + d,
                ovf + waiting, culled + gc)

    def cond(carry):
        _, _, pending, it, _, _, _ = carry
        return (pending > 0) & (it < cfg.max_migrations)

    paths, env_img, _, _, diag, overflow, culled = jax.lax.while_loop(
        cond, body,
        (paths, env_img, jnp.int32(1), jnp.int32(0), jnp.int32(0),
         jnp.int32(0), jnp.int32(0))
    )
    still_migrating = paths.is_valid & (paths.target_node >= 0) & (paths.target_node != my_id)
    truncated = jnp.sum(still_migrating.astype(jnp.int32))
    return paths, env_img, diag, truncated, overflow, culled


def _sample_program(scene_block, proxies, nn_proxies, models, lights, env,
                    camera, sample_count, cfg: RenderConfig):
    """Per-device body (inside shard_map) for one spp."""
    scene = jax.tree.map(lambda a: a[0], scene_block)  # (1, ...) block -> local
    my_id = jax.lax.axis_index(NODES_AXIS).astype(jnp.int32)
    npix = cfg.frame_buffer_size

    paths = generate_camera_paths(camera, sample_count)
    paths = paths._replace(is_valid=paths.is_valid & (my_id == 0))
    # neural stages consult INSTANCE-level proxy rows when the scene is
    # instance-partitioned (nets selected by obj_id, routed to node_id);
    # the migration loop below always uses the partition-level table
    nn_prox = nn_proxies if nn_proxies is not None else proxies

    direct = jnp.zeros((npix, 3), jnp.float32)
    env_img = jnp.zeros((npix, 3), jnp.float32)
    diag = jnp.int32(0)
    truncated = jnp.int32(0)
    overflow = jnp.int32(0)
    grid_culled = jnp.int32(0)

    for bounce in range(cfg.bounces):
        if bounce > 0 and cfg.use_neural_proxies:
            paths, env_add, d = secondary_route(
                scene, nn_prox, models, env, paths, my_id,
                cfg.max_proxy_hits, cfg.t_epsilon, npix, tracer=cfg.tracer,
            )
            env_img = env_img + env_add
            diag = diag + d

        # bounce-0 wavefronts are camera/pixel-block coherent: the morton
        # sort's fixed launch cost is pure loss there (see render/engine.py)
        sort = bounce >= 1
        paths, env_img, d, tr, ov, gc = _migration_loop(scene, proxies, env, paths,
                                                        env_img, my_id, cfg,
                                                        sort_rays=sort)
        diag = diag + d
        truncated = truncated + tr
        overflow = overflow + ov
        grid_culled = grid_culled + gc

        live = paths.is_valid & (~paths.is_shadow)
        if cfg.use_neural_proxies and bounce > 0:
            # neural routing only decided WHERE to settle (the vis/depth
            # prediction is approximate and the migration loop was
            # transport-only, visited=ALL) — the local re-trace at the
            # destination is the real closest hit, exactly the reference's
            # MainRay relaunch (optix/kernel.cu:382-413); it also resolves
            # the no-route quirk's env misses (frame_buffer_update.cu:292)
            hits, d = trace_closest(
                scene, paths.origin, paths.direction, cfg.t_epsilon,
                jnp.full((paths.capacity,), _F32_MAX), live,
                tracer=cfg.tracer, sort_rays=sort,
            )
            diag = diag + d
        else:
            # exact mode: settle + shade from the CARRIED hit payload — the
            # migration loop's bounded traces already found the nearest
            # hit, so the MainRay relaunch (a full extra closest trace per
            # bounce) is unnecessary: tri/u/v rode the all_to_all with the
            # path.  A truncated path parked at the wrong partition
            # (counted in `truncated`) shades as a miss here — its carried
            # tri id indexes another partition's soup.
            from ..core.types import HitRecord

            settled_here = live & paths.is_hit & (paths.current_node == my_id)
            hits = HitRecord(
                t=paths.tmax,
                tri_index=jnp.where(settled_here, paths.hit_tri, -1),
                u=paths.hit_u, v=paths.hit_v,
                is_hit=settled_here,
            )
        rr = bool(cfg.russian_roulette) and \
            cfg.russian_roulette <= bounce + 1 < cfg.bounces
        next_paths, shadow_paths, env_add = shade(
            scene, lights, env, paths, hits, sample_count, bounce,
            cfg.shadow_path_count, npix, nee_mode=cfg.nee_mode, rr=rr,
        )
        env_img = env_img + env_add

        if cfg.use_neural_proxies:
            direct_add, d = shadow_direct_light_nn(
                scene, nn_prox, models, shadow_paths, my_id,
                cfg.max_proxy_hits, cfg.t_epsilon, cfg.shadow_path_count, npix,
                tracer=cfg.tracer,
            )
            direct = direct + direct_add
            diag = diag + d
        else:
            sp, occ, d, gc = ring_shadow_occlusion(
                scene, shadow_paths, cfg.t_epsilon, tracer=cfg.tracer,
                proxies=proxies if cfg.use_visibility_grids else None,
            )
            diag = diag + d
            grid_culled = grid_culled + gc
            contrib = jnp.where(
                (sp.is_valid & (~occ))[:, None],
                sp.throughput / cfg.shadow_path_count,
                0.0,
            )
            direct = direct + jax.ops.segment_sum(
                contrib, sp.pixel_index, num_segments=npix
            )

        paths = next_paths

    # image reduce across partitions (MPI_Reduce equivalent)
    direct = jax.lax.psum(direct, NODES_AXIS)
    env_img = jax.lax.psum(env_img, NODES_AXIS)
    # stats: [tracer diag, migration truncations, bucket-overflow retries,
    # visibility-grid culled candidate/hop count] psum'd over the mesh
    stats = jax.lax.psum(jnp.stack([diag, truncated, overflow, grid_culled]),
                         NODES_AXIS)
    return direct, env_img, stats


def _render_sample_distributed_impl(
    stacked_scene: DeviceScene,
    proxies: ProxyTable,
    nn_proxies,
    models: ProxyModels,
    lights,
    env,
    camera,
    sample_count,
    cfg: RenderConfig,
    mesh,
):
    fn = shard_map(
        partial(_sample_program, cfg=cfg),
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(NODES_AXIS), stacked_scene),
            jax.tree.map(lambda _: P(), proxies),
            jax.tree.map(lambda _: P(), nn_proxies),
            jax.tree.map(lambda _: P(), models),
            jax.tree.map(lambda _: P(), lights),
            jax.tree.map(lambda _: P(), env),
            jax.tree.map(lambda _: P(), camera),
            P(),
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(stacked_scene, proxies, nn_proxies, models, lights, env,
              camera, jnp.asarray(sample_count, jnp.int32))


_DISTRIBUTED_JIT_CACHE = {}


def render_sample_distributed(
    stacked_scene: DeviceScene,
    proxies: ProxyTable,
    models: ProxyModels,
    lights,
    env,
    camera,
    sample_count,
    cfg: RenderConfig,
    mesh,
    nn_proxies: ProxyTable = None,
):
    """One spp over the mesh. `stacked_scene` leaves have leading dim P
    (sharded over the nodes axis); everything else is replicated.

    jax-0.9 fast-path corruption guard: with hoisted jaxpr CONSTS in the
    program, the jit fast path was observed mis-associating a cached
    executable's records with a fresh but structurally identical arg pytree
    ('Execution supplied 61 buffers but compiled program expected 66',
    rank-mismatched recorded shardings — the 5-buffer delta was exactly the
    hidden const params; repro: fresh builds of a curve scene after a
    single-device render of the same assets).  Defense in depth: (a) the
    traced program is CONST-FREE (no module-level jnp constants, traced
    pixel-order arithmetic — keep `make_jaxpr(...).consts == []`!), (b)
    every input is explicitly placed with its intended NamedSharding
    (no-op when already placed; `place_distributed_inputs` hoists this per
    frame), and (c) one jit wrapper per (structure, shapes, cfg, mesh)
    signature, each wrapping a FRESH closure so no pjit-level cache state
    is shared across signatures.  A full AOT .lower().compile() bypass was
    measured ~20 ms/call slower (python arg processing) and is not used."""
    args = place_distributed_inputs(stacked_scene, proxies, models, lights,
                                    env, camera, mesh, nn_proxies)
    sample = jnp.asarray(sample_count, jnp.int32)
    leaves, treedef = jax.tree.flatten(args)
    key = (treedef,
           tuple((l.shape, str(l.dtype)) for l in leaves),
           cfg,
           tuple(d.id for d in mesh.devices.flat), mesh.axis_names)
    fn = _DISTRIBUTED_JIT_CACHE.get(key)
    if fn is None:
        def _impl(stacked_scene, proxies, models, lights, env, camera,
                  nn_proxies, sample_count, cfg, mesh):
            return _render_sample_distributed_impl(
                stacked_scene, proxies, nn_proxies, models, lights, env,
                camera, sample_count, cfg, mesh)

        fn = jax.jit(_impl, static_argnames=("cfg", "mesh"))
        _DISTRIBUTED_JIT_CACHE[key] = fn
    return fn(*args, sample, cfg, mesh)


_PLACE_MEMO = {}


def place_distributed_inputs(stacked_scene, proxies, models, lights, env,
                             camera, mesh, nn_proxies=None):
    """device_put every input with its intended sharding (scene sharded
    over the nodes axis, everything else replicated).  Idempotent — and a
    one-slot identity memo skips even the ~4 ms of python device_put
    no-op calls when the same objects are passed per sample (the
    production frame loop's shape).  The memo holds strong refs to the
    keyed objects, so the ids it compares cannot be recycled."""
    from jax.sharding import NamedSharding

    srcs = (stacked_scene, proxies, models, lights, env, camera, mesh,
            nn_proxies)
    key = tuple(map(id, srcs))
    hit = _PLACE_MEMO.get(key)
    if hit is not None and all(a is b for a, b in zip(hit[0], srcs)):
        return hit[1]
    sharded = NamedSharding(mesh, P(NODES_AXIS))
    replicated = NamedSharding(mesh, P())
    put = lambda tree, s: jax.tree.map(lambda a: jax.device_put(a, s), tree)
    placed = (put(stacked_scene, sharded), put(proxies, replicated),
              put(models, replicated), put(lights, replicated),
              put(env, replicated), put(camera, replicated),
              put(nn_proxies, replicated))
    _PLACE_MEMO.clear()
    _PLACE_MEMO[key] = (srcs, placed)
    return placed


def render_image_distributed(
    partitioned, models, lights, env, camera, cfg: RenderConfig, mesh,
    base_sample: int = 0, return_stats: bool = False,
):
    """Full frame over the mesh; returns (H, W, 3), or (image, stats) with
    stats = {"tracer_diag", "migration_truncated", "migration_overflow_waits"}
    when return_stats."""
    npix = cfg.frame_buffer_size
    direct = jnp.zeros((npix, 3), jnp.float32)
    env_img = jnp.zeros((npix, 3), jnp.float32)
    stats = jnp.zeros((4,), jnp.int32)
    # place once; per-sample placement inside render_sample_distributed is
    # then a no-op
    stacked, proxies, models, lights, env, camera, nn_prox = \
        place_distributed_inputs(
            partitioned.stacked, partitioned.proxies, models, lights, env,
            camera, mesh, getattr(partitioned, "nn_proxies", None))
    for s in range(cfg.spp):
        d, e, st = render_sample_distributed(
            stacked, proxies, models, lights, env,
            camera, base_sample + s, cfg, mesh, nn_proxies=nn_prox,
        )
        direct = direct + d
        env_img = env_img + e
        stats = stats + st
    img = ((direct + env_img) / cfg.spp).reshape(cfg.height, cfg.width, 3)
    if return_stats:
        return img, {
            "tracer_diag": int(stats[0]),
            "migration_truncated": int(stats[1]),
            "migration_overflow_waits": int(stats[2]),
            "grid_culled": int(stats[3]),
        }
    return img
