"""Exact round cubic B-spline intersection (the canal / swept-sphere
surface the reference's builtin OptiX intersector defines,
/root/reference/src/render/pipeline_helper.cpp:57,116
OPTIX_PRIMITIVE_TYPE_ROUND_CUBIC_BSPLINE).

The production curve path flattens segments into round cones
(scene/curves.py) — fast, dense, TPU-friendly — and, with
`from_bspline(tolerance=...)`, carries a DERIVED surface-deviation bound
(chord + radius linearization error <= (max|C''| + max|r''|) / (8 L^2) for L
pieces, standard interpolation-error analysis on the cubic basis).  This
module supplies the EXACT intersector that validates that bound and serves
precision queries: sphere tracing against the distance field

    d(x) = min_u |x - C(u)| - r(u),   u in [0, 1]

which is an exact (signed up to the thin-radius regime) distance to the
union-of-spheres volume whose boundary is the round-curve surface.  The
inner minimization runs a fixed dense u-scan + Newton polish; the outer
march is a fixed-iteration sphere trace — everything straight-line
vectorized over (rays x segments), no data-dependent control flow, XLA- and
TPU-clean by construction.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..scene.curves import _BSPLINE

_B = jnp.asarray(_BSPLINE, jnp.float32)          # (4, 4) power -> control
# derivative operators in the power basis: d/du [1,u,u^2,u^3]
_D1 = np.zeros((4, 4)); _D1[1, 0] = 1; _D1[2, 1] = 2; _D1[3, 2] = 3
_D2 = np.zeros((4, 4)); _D2[2, 0] = 2; _D2[3, 1] = 6


def _basis(u):
    """u (...) -> B-spline weights and first/second derivative weights,
    each (..., 4)."""
    pw = jnp.stack([jnp.ones_like(u), u, u * u, u ** 3], axis=-1)
    w = pw @ _B
    w1 = pw @ (jnp.asarray(_D1, jnp.float32) @ _B)
    w2 = pw @ (jnp.asarray(_D2, jnp.float32) @ _B)
    return w, w1, w2


def _closest_u(cp, rad, x, n_scan: int = 16, newton: int = 3):
    """argmin_u |x - C(u)| - r(u) per (ray, segment) pair.

    cp (S,4,3) control points, rad (S,4) radii, x (N,S,3) query points.
    Dense scan over n_scan parameters + Newton polish on the stationarity
    of f(u) = |x-C|^2 - penalized toward [0,1]. Returns (u (N,S), dist
    (N,S)) with dist = |x-C(u)| - r(u)."""
    us = jnp.linspace(0.0, 1.0, n_scan, dtype=jnp.float32)      # (U,)
    w, _, _ = _basis(us)                                        # (U,4)
    c = jnp.einsum("uc,scd->sud", w, cp)                        # (S,U,3)
    r = jnp.einsum("uc,sc->su", w, rad)                         # (S,U)
    d2 = jnp.sum((x[:, :, None, :] - c[None]) ** 2, axis=-1)    # (N,S,U)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-20)) - r[None]           # (N,S,U)
    k = jnp.argmin(dist, axis=-1)                               # (N,S)
    u = jnp.take(us, k)

    for _ in range(newton):
        w, w1, w2 = _basis(u)                                   # (N,S,4)
        cu = jnp.einsum("nsc,scd->nsd", w, cp)
        c1 = jnp.einsum("nsc,scd->nsd", w1, cp)
        c2 = jnp.einsum("nsc,scd->nsd", w2, cp)
        ru = jnp.einsum("nsc,sc->ns", w, rad)
        r1 = jnp.einsum("nsc,sc->ns", w1, rad)
        dx = x - cu                                             # (N,S,3)
        nrm = jnp.sqrt(jnp.maximum(jnp.sum(dx * dx, -1), 1e-20))
        # g(u) = d/du (|x-C| - r) = -(dx·C')/|dx| - r'
        g = -jnp.sum(dx * c1, -1) / nrm - r1
        gp = (jnp.sum(c1 * c1, -1) - jnp.sum(dx * c2, -1)) / nrm \
            - (jnp.sum(dx * c1, -1) ** 2) / (nrm ** 3)
        step = jnp.where(jnp.abs(gp) > 1e-12, -g / gp, 0.0)
        u = jnp.clip(u + jnp.clip(step, -0.25, 0.25), 0.0, 1.0)

    w, _, _ = _basis(u)
    cu = jnp.einsum("nsc,scd->nsd", w, cp)
    ru = jnp.einsum("nsc,sc->ns", w, rad)
    dx = x - cu
    dist_n = jnp.sqrt(jnp.maximum(jnp.sum(dx * dx, -1), 1e-20)) - ru
    # Newton may wander off the global minimum — keep the better of the two
    dist_scan = jnp.min(dist, axis=-1)
    use_n = dist_n <= dist_scan
    u_scan = jnp.take(us, k)
    return jnp.where(use_n, u, u_scan), jnp.minimum(dist_n, dist_scan)


def scan_count_for(control_points, radii, hit_eps: float = 1e-4) -> int:
    """Certified u-scan density: the scan's distance estimate overshoots the
    true distance by at most L_u * h/2 (L_u = a Lipschitz bound on
    u -> |x-C(u)| - r(u), h = scan spacing), because some sample lies within
    h/2 of the global minimizer.  Choosing h so L_u*h/2 <= hit_eps/2 makes
    `_closest_u`'s scan minimum a certified distance up to hit_eps/2 even if
    Newton diverges.  L_u <= max|C'| + max|r'| <= sum of power-basis
    derivative coefficient norms over u in [0,1]."""
    cp = np.asarray(control_points, np.float64)
    rr = np.asarray(radii, np.float64)
    d1 = _D1 @ _BSPLINE
    ac = np.einsum("jc,scd->sjd", d1.T, cp)   # (S,4,3) power coeffs of C'
    ar = np.einsum("jc,sc->sj", d1.T, rr)     # (S,4)  power coeffs of r'
    lip = np.linalg.norm(ac, axis=-1).sum(-1) + np.abs(ar).sum(-1)
    h = hit_eps / np.maximum(lip.max(), 1e-12)
    return int(np.clip(np.ceil(1.0 / h) + 1, 16, 4096))


def intersect_bspline_exact(
    control_points, radii, origin, direction, t_min, t_max,
    steps: int = 64, hit_eps: float = 1e-4, step_scale: float = 0.75,
    n_scan: int = 16,
):
    """Closest hit of (N,) rays against (S,) round cubic B-spline segments.

    control_points (S,4,3), radii (S,4) — the same windows
    `CurveSet.from_bspline` consumes.  Returns dict(t (N,), seg (N,) i32,
    u (N,), is_hit (N,)) — the nearest surface crossing along each ray,
    found by sphere tracing per (ray, segment) and reducing over segments.

    Exactness: each march step advances by `step_scale` x the estimated
    distance to the union-of-spheres volume.  The estimate comes from an
    `n_scan`-point u-scan + Newton polish; if the global minimizer falls
    between scan samples outside Newton's basin it can OVERSHOOT by up to
    L_u/(2(n_scan-1)) (L_u = per-segment u-Lipschitz bound), so the
    default `step_scale < 1` absorbs moderate overshoot but the no-step-
    across guarantee is strict only when n_scan >= scan_count_for(...)
    (round-4 advisor finding).  Default n_scan=16 + step_scale=0.75 is the
    empirically-validated production setting (tests gate it against dense
    sphere sampling); precision queries should pass the certified scan
    count."""
    cp = jnp.asarray(control_points, jnp.float32)
    rad = jnp.asarray(radii, jnp.float32)
    o = jnp.asarray(origin, jnp.float32)
    d = jnp.asarray(direction, jnp.float32)
    n, s = o.shape[0], cp.shape[0]

    # conservative per-segment AABB (control hull +max radius) entry point
    lo = cp.min(axis=1) - rad.max(axis=1)[:, None]   # (S,3)
    hi = cp.max(axis=1) + rad.max(axis=1)[:, None]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d >= 0, 1e-12, -1e-12), d)
    t0 = (lo[None] - o[:, None]) * inv[:, None]      # (N,S,3)
    t1 = (hi[None] - o[:, None]) * inv[:, None]
    t_enter = jnp.max(jnp.minimum(t0, t1), -1)
    t_exit = jnp.min(jnp.maximum(t0, t1), -1)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))[:, None]
    alive0 = (t_exit >= jnp.maximum(t_enter, t_min)) & (t_enter <= t_max)

    t = jnp.maximum(t_enter, t_min)                  # (N,S)
    hit = jnp.zeros((n, s), bool)
    u_hit = jnp.zeros((n, s), jnp.float32)
    alive = alive0
    for _ in range(steps):
        x = o[:, None, :] + t[..., None] * d[:, None, :]
        u, dist = _closest_u(cp, rad, x, n_scan=n_scan)
        new_hit = alive & (dist < hit_eps)
        hit = hit | new_hit
        u_hit = jnp.where(new_hit & (u_hit == 0.0), u, u_hit)
        alive = alive & (~new_hit)
        t = jnp.where(alive,
                      t + jnp.maximum(dist * step_scale, hit_eps * 0.5), t)
        alive = alive & (t <= jnp.minimum(t_exit, t_max))

    t = jnp.where(hit, t, jnp.float32(3.4e38))
    best = jnp.argmin(t, axis=-1).astype(jnp.int32)  # (N,)
    tb = jnp.take_along_axis(t, best[:, None], -1)[:, 0]
    ub = jnp.take_along_axis(u_hit, best[:, None], -1)[:, 0]
    any_hit = jnp.take_along_axis(hit, best[:, None], -1)[:, 0]
    return dict(t=tb, seg=best, u=ub, is_hit=any_hit)


def tessellation_error_bound(control_points, radii, pieces_per_segment: int):
    """Upper bound on the surface deviation between the L-piece round-cone
    linearization and the exact round B-spline: per segment,
    (max|C''| + max|r''|) / (8 L^2) (chord + radius interpolation error of
    piecewise-linear sampling at spacing 1/L; both second derivatives are
    LINEAR in u for a cubic, so the max is attained at an endpoint).
    Returns (S,) numpy bounds."""
    cp = np.asarray(control_points, np.float64)
    rr = np.asarray(radii, np.float64)
    d2 = _D2 @ _BSPLINE                    # power-basis second derivative
    w2_0 = np.array([1.0, 0.0, 0.0, 0.0]) @ d2
    w2_1 = np.array([1.0, 1.0, 1.0, 1.0]) @ d2
    c2_0 = np.linalg.norm(np.einsum("c,scd->sd", w2_0, cp), axis=-1)
    c2_1 = np.linalg.norm(np.einsum("c,scd->sd", w2_1, cp), axis=-1)
    r2_0 = np.abs(np.einsum("c,sc->s", w2_0, rr))
    r2_1 = np.abs(np.einsum("c,sc->s", w2_1, rr))
    m = np.maximum(c2_0, c2_1) + np.maximum(r2_0, r2_1)
    return m / (8.0 * pieces_per_segment ** 2)


def pieces_for_tolerance(control_points, radii, tolerance: float,
                         min_pieces: int = 2, max_pieces: int = 64) -> int:
    """Smallest uniform piece count whose tessellation_error_bound is below
    `tolerance` for every segment."""
    m = tessellation_error_bound(control_points, radii, 1) * 8.0  # = max M
    worst = float(m.max()) if m.size else 0.0
    if worst <= 0.0:
        return min_pieces
    l = int(np.ceil(np.sqrt(worst / (8.0 * tolerance))))
    return int(np.clip(l, min_pieces, max_pieces))
