"""Analytic ray / round-cone (swept-sphere) intersection for curve primitives.

TPU-native replacement for OptiX's builtin ROUND_CUBIC_BSPLINE intersection
program (/root/reference/src/render/pipeline_helper.cpp:116): curves are
flattened to round-cone pieces at build time (scene/curves.py) and a whole
ray wavefront is intersected against the piece table with dense closed-form
math — no per-ray control flow (branch-free select over the side-surface and
the two spherical caps), so it vectorizes cleanly on the VPU.

Geometry: the convex hull of two spheres (p0, r0), (p1, r1).  Side-surface
quadratic after projecting out the axis; cap hits accepted only in the
regions the cone side does not cover.  (Closed form follows the standard
rounded-cone construction, e.g. Quilez's; re-derived here for the
branch-free wavefront setting.)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..scene.curves import CurveSet

_F32_MAX = np.float32(3.402823466e38)  # np scalar: module-level jax Arrays become hoisted jaxpr consts


class CurveHit(NamedTuple):
    t: jnp.ndarray        # (N,) f32
    piece: jnp.ndarray    # (N,) i32 flattened piece index (-1 = miss)
    seg: jnp.ndarray      # (N,) i32 source B-spline segment (-1 = miss)
    normal: jnp.ndarray   # (N,3) f32 outward surface normal at hit
    is_hit: jnp.ndarray   # (N,) bool


def _ray_round_cone(o, d, pa, pb, ra, rb, t_lo, t_hi):
    """Dense (N, M) entry distance of rays into round cones.  Returns
    (t (N,M) f32 with +inf misses, y (N,M) axial coordinate for normals)."""
    ba = pb[None, :, :] - pa[None, :, :]                      # (1,M,3)
    oa = o[:, None, :] - pa[None, :, :]                       # (N,M,3)
    ob = o[:, None, :] - pb[None, :, :]
    dd = d[:, None, :]
    rr = (ra - rb)[None, :]                                   # (1,M)

    dot = lambda a, b: jnp.sum(a * b, axis=-1)
    m0 = dot(ba, ba)                                          # (1,M)
    m1 = dot(ba, oa)                                          # (N,M)
    m2 = dot(ba, dd)
    m3 = dot(dd, oa)
    m5 = dot(oa, oa)
    m6 = dot(ob, dd)
    m7 = dot(ob, ob)

    raB = ra[None, :]
    rbB = rb[None, :]
    d2 = m0 - rr * rr                                         # (1,M) > 0 for valid cones
    k2 = d2 - m2 * m2
    k1 = d2 * m3 - m1 * m2 + m2 * rr * raB
    k0 = d2 * m5 - m1 * m1 + 2.0 * m1 * rr * raB - m0 * raB * raB

    h = k1 * k1 - k0 * k2
    k2_safe = jnp.where(jnp.abs(k2) > 1e-12, k2, 1e-12)
    t_side = (-jnp.sqrt(jnp.maximum(h, 0.0)) - k1) / k2_safe
    y = m1 + t_side * m2
    side_ok = (h >= 0.0) & (k2 > 1e-12) & (y > 0.0) & (y < d2)

    # spherical caps (entry roots); accepted only where the side surface
    # does not cover the hit direction
    ha = m3 * m3 - m5 + raB * raB
    hb = m6 * m6 - m7 + rbB * rbB
    t_a = -m3 - jnp.sqrt(jnp.maximum(ha, 0.0))
    t_b = -m6 - jnp.sqrt(jnp.maximum(hb, 0.0))
    ya = m1 + t_a * m2
    yb = m1 + t_b * m2
    a_ok = (ha >= 0.0) & (ya <= 0.0)
    b_ok = (hb >= 0.0) & (yb >= d2)

    inf = jnp.float32(float("inf"))
    lo = t_lo[:, None]
    hi = t_hi[:, None]
    pick = lambda ok, t: jnp.where(ok & (t > lo) & (t < hi), t, inf)
    t_best = jnp.minimum(
        pick(side_ok, t_side), jnp.minimum(pick(a_ok, t_a), pick(b_ok, t_b))
    )
    y_best = m1 + t_best * m2
    return t_best, jnp.where(jnp.isfinite(t_best), y_best, 0.0)


def intersect_curves(curves: CurveSet, origin, direction, t_min, t_max,
                     active, with_normal: bool = True) -> CurveHit:
    """Closest curve hit for a wavefront: dense rays x pieces (curve tables
    are small next to triangle meshes; chunk the piece axis if needed).

    with_normal=False skips the surface-normal derivation (4 gathers + the
    cap/side selection) and returns zeros in `normal` — the trace_api
    composite path uses this: HitRecord carries no normal, so shading
    re-derives it from the winning piece (render/shade.py)."""
    n = origin.shape[0]
    t_lo = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_hi = jnp.where(active, jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)), 0.0)

    t_all, y_all = _ray_round_cone(
        origin, direction, curves.p0, curves.p1, curves.r0, curves.r1, t_lo, t_hi
    )                                                          # (N, M)
    t = jnp.min(t_all, axis=1)
    piece = jnp.argmin(t_all, axis=1).astype(jnp.int32)
    is_hit = jnp.isfinite(t) & active

    seg = jnp.take(curves.seg_id, piece)
    if not with_normal:
        return CurveHit(
            t=jnp.where(is_hit, t, _F32_MAX),
            piece=jnp.where(is_hit, piece, -1),
            seg=jnp.where(is_hit, seg, -1),
            normal=jnp.zeros((n, 3), jnp.float32),
            is_hit=is_hit,
        )

    # normal: side surface -> gradient of the cone distance; caps -> sphere
    pa = jnp.take(curves.p0, piece, axis=0)
    pb = jnp.take(curves.p1, piece, axis=0)
    ra = jnp.take(curves.r0, piece)
    rb = jnp.take(curves.r1, piece)
    t_s = jnp.where(is_hit, t, 0.0)
    pos = origin + t_s[:, None] * direction
    ba = pb - pa
    m0 = jnp.sum(ba * ba, axis=-1)
    y = jnp.take_along_axis(y_all, piece[:, None], axis=1)[:, 0]
    rr = ra - rb
    d2 = m0 - rr * rr
    oa = pos - pa
    on_a = y <= 0.0
    on_b = y >= d2
    n_side = d2[:, None] * oa - ba * y[:, None]
    n_a = oa
    n_b = pos - pb
    nrm = jnp.where(on_a[:, None], n_a, jnp.where(on_b[:, None], n_b, n_side))
    ln = jnp.sqrt(jnp.maximum(jnp.sum(nrm * nrm, axis=-1, keepdims=True), 1e-20))
    nrm = nrm / ln

    return CurveHit(
        t=jnp.where(is_hit, t, _F32_MAX),
        piece=jnp.where(is_hit, piece, -1),
        seg=jnp.where(is_hit, seg, -1),
        normal=jnp.where(is_hit[:, None], nrm, 0.0),
        is_hit=is_hit,
    )


def occlude_curves(curves: CurveSet, origin, direction, t_min, t_max, active):
    """Any-hit against the curve table: (N,) bool occluded."""
    n = origin.shape[0]
    t_lo = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_hi = jnp.where(active, jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)), 0.0)
    t_all, _ = _ray_round_cone(
        origin, direction, curves.p0, curves.p1, curves.r0, curves.r1, t_lo, t_hi
    )
    return jnp.isfinite(t_all).any(axis=1) & active
