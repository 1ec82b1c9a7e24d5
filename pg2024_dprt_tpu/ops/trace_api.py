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
    hits, _ = trace_pallas(scene, origin, direction, t_min, t_max, active)
    return hits.is_hit
