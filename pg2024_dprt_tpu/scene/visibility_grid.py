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


# ---------------------------------------------------------------------------
# Conservative grids — the production cross-partition culling path.
#
# The sampled builder above can read "empty" for a cell some unsampled ray
# would hit, so it cannot gate an EXACT render. The conservative builder
# instead rasterizes the partition's content boxes (triangle or cluster
# AABBs) analytically: a (face, cell, azimuth-bin) is marked when ANY ray
# entering the partition AABB through that cell rectangle with that azimuth
# can reach ANY content box. Every real hit's entry maps into a marked bin
# by construction, so culling on an unmarked bin is exact — this is what
# lets the grid pre-filter migration candidates and ring-shadow hops in
# exact mode (reference role: /root/reference/src/cuda/bvh_intersection.cu:
# 234-310, where the grid culls bounce/shadow rays inside the trace loop).
# ---------------------------------------------------------------------------


def _face_frames():
    """Per face f (0..5): (axis, sign, u_axis, v_axis, u_neg?, v_neg?) for the
    du/dv azimuth frame of `_face_and_cell` (du = sgn(d_axis)*d_u etc.)."""
    # axis 0 (x faces): du = s*dy, dv = s*dz; axis 1: du = s*dz, dv = s*dx;
    # axis 2: du = s*dx, dv = s*dy.  s = +1 entering the -side (d_axis > 0).
    return [
        (0, +1.0, 1, 2), (0, -1.0, 1, 2),
        (1, +1.0, 2, 0), (1, -1.0, 2, 0),
        (2, +1.0, 0, 1), (2, -1.0, 0, 1),
    ]


def _cell_rects(face: int, width: int, height: int):
    """Rel-space [0,1]^3 interval box of every (ri, ci) cell rectangle on
    `face`, matching `_face_and_cell`'s col/row conventions. Returns
    (lo, hi) arrays of shape (H*W, 3)."""
    axis = face // 2
    ci = np.arange(width)[None, :].repeat(height, 0).reshape(-1)
    ri = np.arange(height)[:, None].repeat(width, 1).reshape(-1)
    col_lo, col_hi = ci / width, (ci + 1) / width
    row_lo, row_hi = ri / height, (ri + 1) / height
    lo = np.zeros((height * width, 3))
    hi = np.zeros((height * width, 3))
    if axis == 0:      # col = rel_y, row = 1 - rel_z
        lo[:, 1], hi[:, 1] = col_lo, col_hi
        lo[:, 2], hi[:, 2] = 1 - row_hi, 1 - row_lo
    elif axis == 1:    # col = 1 - rel_x, row = 1 - rel_z
        lo[:, 0], hi[:, 0] = 1 - col_hi, 1 - col_lo
        lo[:, 2], hi[:, 2] = 1 - row_hi, 1 - row_lo
    else:              # col = rel_y, row = rel_x
        lo[:, 1], hi[:, 1] = col_lo, col_hi
        lo[:, 0], hi[:, 0] = row_lo, row_hi
    fc = 0.0 if face % 2 == 0 else 1.0
    lo[:, axis] = fc
    hi[:, axis] = fc
    return lo, hi


def build_conservative_grid(
    content_min,
    content_max,
    aabb_min,
    aabb_max,
    width: int = 16,
    height: int = 16,
    angle: int = 16,
    pad: float = 1e-3,
    rel_pad: float = 1e-5,
    chunk: int = 4096,
) -> np.ndarray:
    """Analytic conservative visibility grid.

    content_min/max: (T, 3) world-space boxes bounding the partition's
    geometry (triangle or cluster AABBs). Returns a (6, H, W, A) bool numpy
    grid: True = some entering ray through this (face, cell, azimuth bin)
    may hit content. `pad` dilates azimuth arcs (radians) against fp
    rounding at interval endpoints; `rel_pad` dilates each cell rectangle
    in-plane (rel units) so an entry point that f32-rounds exactly onto a
    cell or face boundary still lands in a marked bin (an edge entry is
    inside the dilated edge cell of BOTH adjacent faces, so either entry-
    face classification is safe).

    The azimuth interval is computed from WORLD-space deltas (rel deltas
    scaled back by the AABB span per axis) to match
    `query_conservative_grids`, which bins the azimuth of the raw world
    direction — with rel-space deltas an anisotropic AABB shears the angles
    and hitting rays land in unmarked bins (round-4 advisor finding)."""
    aabb_min = np.asarray(aabb_min, np.float64)
    aabb_max = np.asarray(aabb_max, np.float64)
    span = np.maximum(aabb_max - aabb_min, 1e-12)
    t_lo = (np.asarray(content_min, np.float64) - aabb_min) / span  # (T,3)
    t_hi = (np.asarray(content_max, np.float64) - aabb_min) / span
    t_lo, t_hi = np.minimum(t_lo, t_hi), np.maximum(t_lo, t_hi)
    T = t_lo.shape[0]
    grid = np.zeros((6, height * width, angle), bool)
    if T == 0:
        return grid.reshape(6, height, width, angle)
    bins = np.arange(angle)

    for face, (axis, s, ua, va) in enumerate(_face_frames()):
        c_lo, c_hi = _cell_rects(face, width, height)  # (C, 3)
        pad_vec = np.full(3, rel_pad)
        pad_vec[axis] = 0.0  # the face-plane coordinate stays exact
        c_lo, c_hi = c_lo - pad_vec, c_hi + pad_vec
        for start in range(0, T, chunk):
            tl, th = t_lo[start:start + chunk], t_hi[start:start + chunk]
            # interval Δ = content - cell, per axis, scaled to WORLD units
            # so azimuths match the query's world-direction binning: (C,Tc,3)
            d_lo = (tl[None, :, :] - c_hi[:, None, :]) * span[None, None, :]
            d_hi = (th[None, :, :] - c_lo[:, None, :]) * span[None, None, :]
            # feasibility: direction's face-axis component has sign s
            feas = (s * d_hi[:, :, axis] if s > 0 else -d_lo[:, :, axis]) \
                >= -1e-9 * span[axis]
            # du/dv interval box (sign flip swaps endpoints)
            if s > 0:
                du_lo, du_hi = d_lo[:, :, ua], d_hi[:, :, ua]
                dv_lo, dv_hi = d_lo[:, :, va], d_hi[:, :, va]
            else:
                du_lo, du_hi = -d_hi[:, :, ua], -d_lo[:, :, ua]
                dv_lo, dv_hi = -d_hi[:, :, va], -d_lo[:, :, va]
            full = (du_lo <= 0) & (0 <= du_hi) & (dv_lo <= 0) & (0 <= dv_hi)
            # corner azimuths; arc = complement of the largest circular gap
            cu = np.stack([du_lo, du_hi, du_lo, du_hi], -1)
            cv = np.stack([dv_lo, dv_lo, dv_hi, dv_hi], -1)
            th4 = np.arctan2(cv, cu)
            th4 = np.where(th4 < 0, th4 + 2 * np.pi, th4)
            th4 = np.sort(th4, axis=-1)
            gaps = np.diff(th4, axis=-1)
            wrap = (th4[..., 0] + 2 * np.pi - th4[..., 3])[..., None]
            gaps = np.concatenate([gaps, wrap], axis=-1)  # gap i = th[i]->th[i+1]
            gi = np.argmax(gaps, axis=-1)
            arc_lo = np.take_along_axis(
                th4, ((gi + 1) % 4)[..., None], axis=-1)[..., 0] - pad
            arc_len = 2 * np.pi - np.take_along_axis(
                gaps, gi[..., None], axis=-1)[..., 0] + 2 * pad
            arc_len = np.where(full, 2 * np.pi, arc_len)
            # mark bins overlapping [arc_lo, arc_lo + arc_len] (circular)
            scale = angle / (2 * np.pi)
            b_lo = np.floor(arc_lo * scale).astype(np.int64)
            nb = np.minimum(
                np.ceil((arc_lo + arc_len) * scale).astype(np.int64) - b_lo + 1,
                angle,
            )
            mark = ((bins[None, None, :] - b_lo[..., None]) % angle
                    < nb[..., None]) & feas[..., None]
            grid[face] |= mark.any(axis=1)
    return grid.reshape(6, height, width, angle)


def query_conservative_grids(vis_grid, aabb_min, aabb_max, origin, direction,
                             t_enter, t_near):
    """Batched (N rays × P partitions) conservative grid lookup.

    vis_grid: (P, 6, H, W, A) bool; aabb_min/max: (P, 3); origin/direction:
    (N, 3); t_enter: (N, P) slab entry parameter; t_near: (N, P, 3) per-axis
    near-plane parameter (so the entry face is derived from the slab test
    itself — exact, unlike nearest-plane classification at corners).
    Returns (N, P) bool: True = the partition may produce a hit."""
    P, _, H, W, A = vis_grid.shape
    entry = origin[:, None, :] + t_enter[..., None] * direction[:, None, :]
    span = jnp.maximum(aabb_max - aabb_min, 1e-12)[None]
    rel = jnp.clip((entry - aabb_min[None]) / span, 0.0, 1.0)  # (N,P,3)

    axis = jnp.argmax(t_near, axis=-1).astype(jnp.int32)       # (N,P)
    d = direction[:, None, :]
    d_axis = jnp.take_along_axis(
        jnp.broadcast_to(d, rel.shape), axis[..., None], axis=-1)[..., 0]
    face = axis * 2 + (d_axis < 0).astype(jnp.int32)

    rx, ry, rz = rel[..., 0], rel[..., 1], rel[..., 2]
    col = jnp.where(axis == 0, ry, jnp.where(axis == 1, 1 - rx, ry))
    row = jnp.where(axis == 2, rx, 1 - rz)
    ci = jnp.clip((col * W).astype(jnp.int32), 0, W - 1)
    ri = jnp.clip((row * H).astype(jnp.int32), 0, H - 1)

    sgn = jnp.where(d_axis >= 0, 1.0, -1.0)
    dx = jnp.broadcast_to(d[..., 0], face.shape)
    dy = jnp.broadcast_to(d[..., 1], face.shape)
    dz = jnp.broadcast_to(d[..., 2], face.shape)
    du = sgn * jnp.where(axis == 0, dy, jnp.where(axis == 1, dz, dx))
    dv = sgn * jnp.where(axis == 0, dz, jnp.where(axis == 1, dx, dy))
    phi = jnp.arctan2(dv, du)
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    ab = jnp.clip((phi / (2 * jnp.pi) * A).astype(jnp.int32), 0, A - 1)

    pidx = jnp.arange(P, dtype=jnp.int32)[None, :]
    flat = (((pidx * 6 + face) * H + ri) * W + ci) * A + ab
    return jnp.take(vis_grid.reshape(-1), flat)
