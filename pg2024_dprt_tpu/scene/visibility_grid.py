"""Binary visibility-grid proxies — the legacy (pre-neural) cross-partition
culling path.

Port of the reference's software AABB/visibility-grid tracer
(/root/reference/src/cuda/bvh_intersection.cu:13-393): a proxy AABB carries a
6-face x (width x height) x angle binary grid; a ray entering the box maps to
(enter face, face cell, azimuth bin) and the grid answers "can anything be
hit through this entry?". The reference superseded this with neural proxies
but keeps the machinery (and its `aabbRecord.width/height/angle` parameter
conventions, which this port preserves). Here the grid is built by ray
casting the real geometry (same sampler as the MLP datasets) and looked up
with pure vectorized index math — usable as a cheap non-neural fallback for
shadow-ray culling.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as cmath
from ..ops.traversal import traverse_bvh


class VisibilityGrid(NamedTuple):
    """One object's grid. Layout matches the reference indexing
    (bvh_intersection.cu:101-152): index = face*(W*H*A) + cell*A + angle."""

    grid: jnp.ndarray       # (6 * W * H * A,) bool
    aabb_min: jnp.ndarray   # (3,)
    aabb_max: jnp.ndarray   # (3,)
    width: int
    height: int
    angle: int


def _face_and_cell(aabb_min, aabb_max, point, direction, width, height, angle):
    """Map an AABB surface point + direction to (face, cell, angle-bin).

    Face ids: 0/1 = -x/+x, 2/3 = -y/+y, 4/5 = -z/+z (enter-face
    classification of bvh_intersection.cu:33-99); the cell is the 2D
    coordinate on that face; the angle bin comes from the azimuth of the
    direction re-oriented so the dominant axis points forward
    (cartesianToSphericalForAABB convention)."""
    span = jnp.maximum(aabb_max - aabb_min, 1e-12)
    rel = (point - aabb_min) / span  # in [0,1]^3

    # distance to each face plane: the entry face is the closest one
    d_face = jnp.stack(
        [rel[:, 0], 1 - rel[:, 0], rel[:, 1], 1 - rel[:, 1], rel[:, 2], 1 - rel[:, 2]],
        axis=-1,
    )
    face = jnp.argmin(d_face, axis=-1).astype(jnp.int32)
    axis = face // 2

    # face-local (row, col) per the reference's per-face conventions
    col = jnp.where(axis == 0, rel[:, 1], jnp.where(axis == 1, 1 - rel[:, 0], rel[:, 1]))
    row = jnp.where(axis == 2, rel[:, 0], 1 - rel[:, 2])
    ci = jnp.clip((col * width).astype(jnp.int32), 0, width - 1)
    ri = jnp.clip((row * height).astype(jnp.int32), 0, height - 1)
    cell = ri * width + ci

    # reorient direction so the dominant axis leads, then azimuth bin
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
    sgn = lambda c: jnp.where(c > 0, 1.0, -1.0)
    du = jnp.where(axis == 0, sgn(dx) * dy, jnp.where(axis == 1, sgn(dy) * dz, sgn(dz) * dx))
    dv = jnp.where(axis == 0, sgn(dx) * dz, jnp.where(axis == 1, sgn(dy) * dx, sgn(dz) * dy))
    phi = jnp.arctan2(dv, du)
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    ab = jnp.clip((phi / (2 * jnp.pi) * angle).astype(jnp.int32), 0, angle - 1)

    return face * (width * height * angle) + cell * angle + ab


def build_visibility_grid(
    scene, aabb_min, aabb_max,
    width: int = 16, height: int = 16, angle: int = 8,
    samples: int = 200_000, seed: int = 0,
) -> VisibilityGrid:
    """Ray-cast the object's geometry; mark grid cells whose rays hit."""
    from ..train.datagen import _sample_entry_rays

    lo = jnp.asarray(aabb_min, jnp.float32)
    hi = jnp.asarray(aabb_max, jnp.float32)
    key = jax.random.PRNGKey(seed)
    o, d = _sample_entry_rays(key, lo, hi, samples)
    hits = traverse_bvh(
        scene, o, d, 1e-4, jnp.full((samples,), 3.4e38, jnp.float32),
        jnp.ones((samples,), bool),
    )
    idx = _face_and_cell(lo, hi, o, d, width, height, angle)
    size = 6 * width * height * angle
    grid = (
        jnp.zeros((size,), jnp.int32)
        .at[idx].max(hits.is_hit.astype(jnp.int32))
        .astype(bool)
    )
    return VisibilityGrid(grid, lo, hi, width, height, angle)


def query_visibility(vg: VisibilityGrid, origin, direction, t_enter):
    """For rays entering the AABB at parameter t_enter: True = something may
    be hit (conservative only up to grid resolution/sampling, like the
    reference's precomputed grids). Vectorized over (N,) rays."""
    point = origin + t_enter[:, None] * direction
    idx = _face_and_cell(vg.aabb_min, vg.aabb_max, point, direction,
                         vg.width, vg.height, vg.angle)
    return jnp.take(vg.grid, idx)
