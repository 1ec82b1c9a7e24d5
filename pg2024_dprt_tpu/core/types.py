"""SoA wavefront data types.

`PathState` is the TPU-native mirror of the reference's AoS `WavefrontPathData`
(fields inferred from /root/reference/optix/kernel.cu:115-129 and
/root/reference/optix/path_gen_kernel.cu:78-89). We keep one fixed-capacity
structure-of-arrays buffer per device; dynamic path counts become validity
masks (XLA requires static shapes).

`NNQuery` mirrors the reference's `NNPathData` record emitted by the proxy
marching loops (/root/reference/optix/secondary_ray_kernel.cu:289-303,
/root/reference/optix/shadow_ray_kernel.cu:284-341).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# BSDF type tags (reference: moana::BSDFType consumed at
# /root/reference/optix/kernel.cu:58-63).
BSDF_DIFFUSE = 0
BSDF_WATER = 1


class PathState(NamedTuple):
    """Fixed-capacity SoA path buffer. All arrays share leading dim N."""

    origin: jax.Array        # (N, 3) f32
    direction: jax.Array     # (N, 3) f32
    tmax: jax.Array          # (N,)   f32
    throughput: jax.Array    # (N, 3) f32  (shadow paths carry NEE contribution)
    pixel_index: jax.Array   # (N,)   i32
    shadow_path_id: jax.Array  # (N,) i32  (-1 for camera/bounce paths)
    visited_mask: jax.Array  # (N,)   u32  (bit i = partition i already traced)
    current_node: jax.Array  # (N,)   i32
    target_node: jax.Array   # (N,)   i32
    is_shadow: jax.Array     # (N,)   bool
    is_delta: jax.Array      # (N,)   bool
    is_valid: jax.Array      # (N,)   bool
    is_hit: jax.Array        # (N,)   bool
    # carried winning-hit payload (tri id + barycentrics at the partition
    # that owns the nearest hit, i.e. current_node): lets the distributed
    # settle stage shade WITHOUT the reference's MainRay relaunch re-trace
    # (optix/kernel.cu:382-413) — the hit was already computed by the
    # migration loop's bounded traces and rides the all_to_all with the rest
    # of the path. t is paths.tmax.
    hit_tri: jax.Array = None   # (N,) i32 (-1 = none)
    hit_u: jax.Array = None     # (N,) f32
    hit_v: jax.Array = None     # (N,) f32

    @property
    def capacity(self) -> int:
        return self.origin.shape[0]

    @staticmethod
    def empty(n: int) -> "PathState":
        return PathState(
            origin=jnp.zeros((n, 3), jnp.float32),
            direction=jnp.zeros((n, 3), jnp.float32),
            tmax=jnp.zeros((n,), jnp.float32),
            throughput=jnp.zeros((n, 3), jnp.float32),
            pixel_index=jnp.zeros((n,), jnp.int32),
            shadow_path_id=jnp.full((n,), -1, jnp.int32),
            visited_mask=jnp.zeros((n,), jnp.uint32),
            current_node=jnp.full((n,), -1, jnp.int32),
            target_node=jnp.full((n,), -1, jnp.int32),
            is_shadow=jnp.zeros((n,), bool),
            is_delta=jnp.zeros((n,), bool),
            is_valid=jnp.zeros((n,), bool),
            is_hit=jnp.zeros((n,), bool),
            hit_tri=jnp.full((n,), -1, jnp.int32),
            hit_u=jnp.zeros((n,), jnp.float32),
            hit_v=jnp.zeros((n,), jnp.float32),
        )

    def gather(self, idx: jax.Array) -> "PathState":
        """Reorder/compact by index array (rows may repeat; mask separately)."""
        return jax.tree.map(lambda a: jnp.take(a, idx, axis=0), self)

    def where(self, mask: jax.Array, other: "PathState") -> "PathState":
        """Per-row select: mask ? self : other."""

        def sel(a, b):
            m = mask.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(m, a, b)

        return jax.tree.map(sel, self, other)


class HitRecord(NamedTuple):
    """Closest-hit payload: TPU-native subset of the reference `PerRayData`
    (/root/reference/optix/ray_data.hpp:8-28) that downstream shading actually
    consumes. Geometry attributes (normal, uv, material) are derived from
    `tri_index` by gathers in the shade stage instead of being written by a
    hit program."""

    t: jax.Array          # (N,) f32  hit distance (inf on miss)
    tri_index: jax.Array  # (N,) i32  index into the partition triangle soup
    u: jax.Array          # (N,) f32  barycentric
    v: jax.Array          # (N,) f32  barycentric
    is_hit: jax.Array     # (N,) bool


class NNQuery(NamedTuple):
    """Neural-proxy query record. `features` are the 5 fp16 network inputs
    (normalized AABB-local hit point + normalized spherical direction,
    reference /root/reference/optix/secondary_ray_kernel.cu:283-287)."""

    features: jax.Array      # (Q, 5) f32 (cast to bf16 at the MLP boundary)
    aabb_id: jax.Array       # (Q,) i32  proxy object id (0-based; -1 invalid)
    pixel_index: jax.Array   # (Q,) i32
    shadow_path_id: jax.Array  # (Q,) i32
    hit_sequence: jax.Array  # (Q,) i32  which of the maxCount marched hits
    is_inside: jax.Array     # (Q,) bool origin was inside the proxy AABB
    is_valid: jax.Array      # (Q,) bool
    path_index: jax.Array    # (Q,) i32  row in the emitting path buffer
    aabb_t: jax.Array        # (Q,) f32  tMax at the proxy AABB hit
    max_length: jax.Array    # (Q,) f32  AABB diagonal (depth denormalization)
    t_ratio: jax.Array       # (Q,) f32  world-t / local-t scale factor
    normalized_t: jax.Array  # (Q,) f32  inside-hit depth for comparison
    # owning partition of the hit proxy (reference NNPathData.pathIndex =
    # accelerationStructures[hitAABBIndex].nodeID); None = aabb_id (the
    # non-instanced case, where object == partition)
    node_id: jax.Array = None
