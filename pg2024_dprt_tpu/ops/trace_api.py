"""Tracer selection: one closest-hit/occlusion API over three backends.

  * "stackless" — ops/traversal.py: per-ray threaded-BVH stepping. Exact
    oracle; fast on CPU, pathological on TPU (gather-per-step).
  * "cluster"   — ops/cluster_tracer.py: XLA bulk cull/dispatch/intersect.
  * "pallas"    — ops/pallas_tracer.py: single-kernel tile tracer (TPU
    production path).
  * "auto"      — pallas on TPU, stackless elsewhere.
"""
from __future__ import annotations

import jax

from .cluster_tracer import occlusion_clusters, traverse_clusters
from .pallas_tracer import trace_pallas
from .traversal import traverse_bvh


def resolve_tracer(name: str) -> str:
    if name == "auto":
        # any accelerator backend (tpu / axon tunnel) -> pallas
        return "stackless" if jax.default_backend() == "cpu" else "pallas"
    return name


def trace_closest(scene, origin, direction, t_min, t_max, active, tracer: str = "auto"):
    tracer = resolve_tracer(tracer)
    if tracer == "stackless":
        return traverse_bvh(scene, origin, direction, t_min, t_max, active)
    if tracer == "cluster":
        return traverse_clusters(scene, origin, direction, t_min, t_max, active)
    hits, _dropped = trace_pallas(scene, origin, direction, t_min, t_max, active)
    return hits


def trace_occlusion(scene, origin, direction, t_min, t_max, active, tracer: str = "auto"):
    """Any-hit test; returns (n,) bool occluded."""
    tracer = resolve_tracer(tracer)
    if tracer == "stackless":
        return traverse_bvh(scene, origin, direction, t_min, t_max, active).is_hit
    if tracer == "cluster":
        return occlusion_clusters(scene, origin, direction, t_min, t_max, active)
    occ, _ = trace_pallas(scene, origin, direction, t_min, t_max, active, any_hit=True)
    return occ


def _hit_alpha(scene, hits):
    """Opacity at a hit (texture alpha channel); 1.0 when untextured."""
    import jax.numpy as jnp

    from ..scene.textures import sample_atlas

    tri = jnp.maximum(hits.tri_index, 0)
    mesh = jnp.take(scene.tri_mesh_id, tri, axis=0)
    tex = jnp.take(scene.mesh_texture_index, mesh, axis=0)
    u = hits.u[:, None]
    v = hits.v[:, None]
    w = 1.0 - u - v
    uv = (
        w * jnp.take(scene.uv0, tri, axis=0)
        + u * jnp.take(scene.uv1, tri, axis=0)
        + v * jnp.take(scene.uv2, tri, axis=0)
    )
    rgba = sample_atlas(scene.albedo_textures, tex, uv[:, 0], uv[:, 1])
    return jnp.where(tex >= 0, rgba[:, 3], 1.0)


def trace_closest_cutout(scene, origin, direction, t_min, t_max, active,
                         tracer: str = "auto", max_hops: int = 4,
                         alpha_threshold: float = 0.05):
    """Closest hit honoring cutout opacity — the reference anyhit programs'
    `opacity < 0.05 -> optixIgnoreIntersection()` semantics
    (/root/reference/optix/kernel.cu:311-359), implemented tracer-agnostically
    by re-tracing past transparent hits (static `max_hops` unroll)."""
    import jax.numpy as jnp

    if scene.albedo_textures is None or scene.albedo_textures.shape[0] == 0:
        return trace_closest(scene, origin, direction, t_min, t_max, active, tracer)

    n = origin.shape[0]
    t_lo = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    pending = active
    final = None
    for _ in range(max_hops):
        hits = trace_closest(scene, origin, direction, t_lo, t_max, pending, tracer)
        alpha = _hit_alpha(scene, hits)
        transparent = hits.is_hit & (alpha < alpha_threshold)
        settled = pending & (~transparent)
        if final is None:
            final = hits
        else:
            final = type(hits)(*(
                jnp.where(settled, h, f) for h, f in zip(hits, final)
            ))
        t_lo = jnp.where(transparent, hits.t + 1e-4, t_lo)
        pending = pending & transparent
    return final


def trace_occlusion_cutout(scene, origin, direction, t_min, t_max, active,
                           tracer: str = "auto", max_hops: int = 4,
                           alpha_threshold: float = 0.05):
    """Occlusion honoring cutout opacity: blocked only by opaque hits."""
    hits = trace_closest_cutout(
        scene, origin, direction, t_min, t_max, active, tracer, max_hops, alpha_threshold
    )
    return hits.is_hit
