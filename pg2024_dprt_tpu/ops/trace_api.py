"""Tracer selection: one closest-hit/occlusion API over three backends.

  * "stackless" — ops/traversal.py: per-ray threaded-BVH stepping. Exact
    oracle; fast on CPU, pathological on TPU (gather-per-step).
  * "cluster"   — ops/cluster_tracer.py: XLA bulk cull/dispatch/intersect.
  * "resident"  — ops/pallas_resident.py: resident-table kernel with
    in-kernel dispatch (the TPU production path; tables above ~8 MiB stream
    from HBM through a double-buffered in-kernel DMA).
  * "auto"      — resident on accelerators, stackless on CPU.

The round-1 streaming tile tracer (ops/pallas_tracer.py) is RETIRED from
this API: its tile-interval cull misses corner-edge rays that its drop
diagnostics cannot see (artifacts of round-2 on-chip verification), so it
is no longer user-selectable — the module stays as an internal study file
with its own unit tests.

No silent truncation (mirrors the reference's never-drop anyhit semantics,
/root/reference/optix/kernel.cu:349-355): the resident path has no static
pair budget at all (nothing can be dropped), and every production entry
point returns a `diag` count of rays whose result may still be affected
(cutout re-trace residue).  Callers surface it; tests assert zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .cluster_tracer import occlusion_clusters, traverse_clusters
from .pallas_resident import resident_table_bytes, trace_resident
from .pallas_tracer import REGION, trace_pallas
from .traversal import traverse_bvh

# resident-table kernel budget: triangle + AABB tables must leave room for
# ray/out blocks and compiler scratch in ~16 MB of VMEM
RESIDENT_TABLE_LIMIT = 8 * 2**20


_TRACERS = ("stackless", "cluster", "resident")


def resolve_tracer(name: str, scene=None) -> str:
    if scene is not None and getattr(scene, "cl_xf", None) is not None:
        # two-level instanced scenes: only the resident kernel family has
        # the per-cluster object-space transform (scene/geometry.py
        # device_scene_from_instances) — the stackless/cluster backends
        # would trace the BASE geometry only
        if name in ("stackless", "cluster"):
            raise ValueError(
                f"tracer {name!r} does not support instanced scenes; use "
                "'resident' (interpret mode on CPU)")
        return "resident"
    if name == "auto":
        # any accelerator backend (tpu / axon tunnel) -> the resident-table
        # kernel family; tables above VMEM budget stream from HBM inside the
        # kernel (trace_resident hbm_table auto).
        if jax.default_backend() == "cpu":
            return "stackless"
        return "resident"
    if name not in _TRACERS:
        raise ValueError(
            f"unknown tracer {name!r}; valid: {('auto',) + _TRACERS}. "
            "(The round-1 streaming tracer 'pallas' was retired: its "
            "tile-interval cull fails on-chip verification — see "
            "ops/pallas_tracer.py.)")
    return name


def _pallas_escalating(scene, origin, direction, t_min, t_max, active,
                       any_hit: bool = False, region: int = REGION,
                       sort_rays: bool = True):
    """Pallas trace that never silently force-misses: if the static pair
    budget dropped any (tile, cluster) pair, cond-retrace the whole wavefront
    at 4x, then 16x budget (same Mosaic kernel, larger grid — only the taken
    branches execute at runtime). Returns (result, residual_dropped_pairs);
    any residue after 16x is surfaced to the caller, never hidden."""
    def at(r):
        return lambda _: trace_pallas(
            scene, origin, direction, t_min, t_max, active,
            region=r, any_hit=any_hit, sort_rays=sort_rays,
        )

    res = at(region)(None)

    def escalate(_):
        r4 = at(region * 4)(None)
        return jax.lax.cond(r4[1] > 0, at(region * 16), lambda _: r4, None)

    return jax.lax.cond(res[1] > 0, escalate, lambda _: res, None)


def _merge_curve_hits(scene, origin, direction, t_min, t_max, active, res):
    """Composite the triangle closest hit with the scene's curve primitives
    (round cubic-B-spline hair, scene.curves) — the TPU counterpart of the
    reference pipeline enabling OptiX's builtin ROUND_CUBIC_BSPLINE
    intersector next to its triangle programs
    (/root/reference/src/render/pipeline_helper.cpp:57,116).  Curve winners
    encode tri_index = -2 - piece (piece = flattened swept-sphere cone
    index); shading decodes it in render/shade.surface_attributes."""
    if scene.curves is None:
        return res
    from .curve_intersect import intersect_curves

    hits, diag = res
    ch = intersect_curves(scene.curves, origin, direction, t_min, t_max,
                          active, with_normal=False)
    closer = ch.is_hit & ((~hits.is_hit) | (ch.t < hits.t))
    merged = hits._replace(
        t=jnp.where(closer, ch.t, hits.t),
        tri_index=jnp.where(closer, -2 - ch.piece, hits.tri_index),
        u=jnp.where(closer, 0.0, hits.u),
        v=jnp.where(closer, 0.0, hits.v),
        is_hit=hits.is_hit | closer,
    )
    return merged, diag


def trace_closest_checked(scene, origin, direction, t_min, t_max, active,
                          tracer: str = "auto", sort_rays: bool = True):
    """Closest hit. Returns (HitRecord, diag) — diag counts pairs still
    dropped after escalation (0 for the exact backends).

    sort_rays morton-orders the wavefront (origin-cell-major) inside the
    Pallas backends.  Measured policy (scripts/ab_bounce_sort.py): sort
    only genuinely UNSTRUCTURED wavefronts (random control 20 vs 74 ms;
    e.g. migrated arrivals in the distributed loop).  Path-traced
    wavefronts keep pixel order at every bounce — their tiles inherit the
    parents' frustum coherence and the sort is a measured loss (b1 closest
    7.6 -> 5.8 ms, b1 NEE shadow 25 -> 9.6 ms; render/engine.py)."""
    tracer = resolve_tracer(tracer, scene)
    if tracer == "stackless":
        res = traverse_bvh(scene, origin, direction, t_min, t_max, active), jnp.int32(0)
    elif tracer == "cluster":
        res = traverse_clusters(scene, origin, direction, t_min, t_max, active), jnp.int32(0)
    else:  # "resident" — resolve_tracer already validated the name
        res = trace_resident(scene, origin, direction, t_min, t_max, active,
                             sort_rays=sort_rays)
    return _merge_curve_hits(scene, origin, direction, t_min, t_max, active, res)


def trace_occlusion_checked(scene, origin, direction, t_min, t_max, active,
                            tracer: str = "auto", sort_rays: bool = True):
    """Any-hit test. Returns ((n,) bool occluded, diag)."""
    tracer = resolve_tracer(tracer, scene)
    if tracer == "stackless":
        occ, diag = traverse_bvh(scene, origin, direction, t_min, t_max, active).is_hit, jnp.int32(0)
    elif tracer == "cluster":
        occ, diag = occlusion_clusters(scene, origin, direction, t_min, t_max, active), jnp.int32(0)
    else:  # "resident" — resolve_tracer already validated the name
        occ, diag = trace_resident(scene, origin, direction, t_min, t_max, active,
                                   any_hit=True, sort_rays=sort_rays)
    if scene.curves is not None:
        from .curve_intersect import occlude_curves

        occ = occ | occlude_curves(scene.curves, origin, direction,
                                   t_min, t_max, active)
    return occ, diag


def trace_closest(scene, origin, direction, t_min, t_max, active, tracer: str = "auto"):
    return trace_closest_checked(scene, origin, direction, t_min, t_max, active, tracer)[0]


def trace_occlusion(scene, origin, direction, t_min, t_max, active, tracer: str = "auto"):
    """Any-hit test; returns (n,) bool occluded."""
    return trace_occlusion_checked(scene, origin, direction, t_min, t_max, active, tracer)[0]


def _hit_alpha(scene, hits):
    """Opacity at a hit (texture alpha channel); 1.0 when untextured."""
    from ..scene.textures import sample_textures

    tri = jnp.maximum(hits.tri_index, 0)
    u = hits.u[:, None]
    v = hits.v[:, None]
    w = 1.0 - u - v
    if scene.tri_shade is not None:
        # one wide row gather (layout: scene/geometry.py DeviceScene)
        row = jnp.take(scene.tri_shade, tri, axis=0)
        tex = row[:, 19].astype(jnp.int32)
        uv = w * row[:, 9:11] + u * row[:, 11:13] + v * row[:, 13:15]
    else:
        mesh = jnp.take(scene.tri_mesh_id, tri, axis=0)
        tex = jnp.take(scene.mesh_texture_index, mesh, axis=0)
        uv = (
            w * jnp.take(scene.uv0, tri, axis=0)
            + u * jnp.take(scene.uv1, tri, axis=0)
            + v * jnp.take(scene.uv2, tri, axis=0)
        )
    rgba = sample_textures(scene.albedo_textures, tex, uv[:, 0], uv[:, 1])
    return jnp.where(tex >= 0, rgba[:, 3], 1.0)


def trace_closest_cutout(scene, origin, direction, t_min, t_max, active,
                         tracer: str = "auto", max_hops: int = 4,
                         alpha_threshold: float = 0.05, sort_rays: bool = True):
    """Closest hit honoring cutout opacity — the reference anyhit programs'
    `opacity < 0.05 -> optixIgnoreIntersection()` semantics
    (/root/reference/optix/kernel.cu:311-359), implemented tracer-agnostically
    by re-tracing past transparent hits (static `max_hops` unroll).

    Returns (HitRecord, diag). Rays still on a transparent hit after
    `max_hops` re-traces report MISS (the reference anyhit never accepts a
    transparent surface) and are counted in diag together with any pallas
    escalation residue."""
    if (scene.albedo_textures is None or scene.albedo_textures.count == 0
            or not scene.albedo_textures.has_cutout):
        return trace_closest_checked(scene, origin, direction, t_min, t_max, active,
                                     tracer, sort_rays=sort_rays)

    n = origin.shape[0]
    t_lo = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    pending = active
    final = None
    diag = jnp.int32(0)
    for _ in range(max_hops):
        hits, d = trace_closest_checked(scene, origin, direction, t_lo, t_max, pending,
                                        tracer, sort_rays=sort_rays)
        diag = diag + d
        alpha = _hit_alpha(scene, hits)
        # curve winners (tri_index <= -2) are always opaque — their lanes'
        # gathered triangle-0 alpha is meaningless
        transparent = hits.is_hit & (hits.tri_index >= 0) & (alpha < alpha_threshold)
        settled = pending & (~transparent)
        if final is None:
            final = hits
        else:
            final = type(hits)(*(
                jnp.where(settled, h, f) for h, f in zip(hits, final)
            ))
        t_lo = jnp.where(transparent, hits.t + 1e-4, t_lo)
        pending = pending & transparent
    # residue: still transparent after max_hops -> miss, surfaced in diag
    residue = pending
    final = final._replace(
        is_hit=final.is_hit & (~residue),
        tri_index=jnp.where(residue, -1, final.tri_index),
        t=jnp.where(residue, jnp.float32(3.402823466e38), final.t),
    )
    diag = diag + jnp.sum(residue.astype(jnp.int32))
    return final, diag


def trace_occlusion_cutout(scene, origin, direction, t_min, t_max, active,
                           tracer: str = "auto", max_hops: int = 4,
                           alpha_threshold: float = 0.05, sort_rays: bool = True):
    """Occlusion honoring cutout opacity: blocked only by opaque hits.
    Returns (occluded, diag).

    Texture-free scenes take the dedicated any-hit kernel (no winner
    attribution, occluded-tile early exit); only scenes with cutout
    textures need the closest-hit re-trace loop (a transparent occluder
    must be skipped, which requires knowing WHERE the hit was)."""
    if (scene.albedo_textures is None or scene.albedo_textures.count == 0
            or not scene.albedo_textures.has_cutout):
        return trace_occlusion_checked(scene, origin, direction, t_min, t_max, active,
                                       tracer, sort_rays=sort_rays)
    hits, diag = trace_closest_cutout(
        scene, origin, direction, t_min, t_max, active, tracer, max_hops,
        alpha_threshold, sort_rays=sort_rays,
    )
    return hits.is_hit, diag
