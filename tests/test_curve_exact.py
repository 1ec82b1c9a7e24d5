"""Exact round-cubic-B-spline intersection + tessellation error bound
(VERDICT r3 missing #4: the cone flattening previously had no error bound).

Oracle chain: dense union-of-spheres sampling (ground truth by construction
of the canal surface) validates the sphere-traced exact intersector
(ops/curve_exact.py); the exact intersector then validates the derived
tessellation bound that `CurveSet.from_bspline(tolerance=...)` enforces."""
import numpy as np
import jax
import jax.numpy as jnp

from pg2024_dprt_tpu.ops.curve_exact import (
    intersect_bspline_exact,
    pieces_for_tolerance,
    tessellation_error_bound,
    _closest_u,
)
from pg2024_dprt_tpu.ops.curve_intersect import intersect_curves
from pg2024_dprt_tpu.scene.curves import CurveSet, _BSPLINE


def _curly_strand(n_pts=8, seed=0):
    """A curved strand with varying radius (stress for both bounds)."""
    t = np.linspace(0, 1.5 * np.pi, n_pts)
    pts = np.stack([np.cos(t) * 0.4, t * 0.15, np.sin(t) * 0.4], axis=-1)
    rad = 0.06 + 0.03 * np.sin(t * 2.0)
    windows = np.stack([pts[i:i + 4] for i in range(n_pts - 3)])
    rwin = np.stack([rad[i:i + 4] for i in range(n_pts - 3)])
    return windows, rwin


def _aim_rays(windows, rwin, n, seed=1):
    """Rays from a sphere around the strand aimed at random spline points."""
    rng = np.random.RandomState(seed)
    s = windows.shape[0]
    u = rng.rand(n)
    seg = rng.randint(0, s, n)
    w = np.stack([np.ones_like(u), u, u * u, u ** 3], -1) @ _BSPLINE
    target = np.einsum("nc,ncd->nd", w, windows[seg])
    phi = rng.rand(n) * 2 * np.pi
    cz = rng.rand(n) * 2 - 1
    sz = np.sqrt(1 - cz ** 2)
    o = target + 2.0 * np.stack([sz * np.cos(phi), cz, sz * np.sin(phi)], -1)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def test_exact_intersector_vs_union_of_spheres():
    """Ground truth: the round curve IS the union of spheres over u — a very
    dense sphere sweep bounds the true closest hit from both sides."""
    windows, rwin = _curly_strand()
    o, d = _aim_rays(windows, rwin, 128)
    n = o.shape[0]
    res = intersect_bspline_exact(windows, rwin, o, d, 1e-3,
                                  np.full(n, 100.0, np.float32))

    # dense sphere sampling (1024 u values per segment)
    us = np.linspace(0, 1, 1024)
    w = np.stack([np.ones_like(us), us, us * us, us ** 3], -1) @ _BSPLINE
    centers = np.einsum("uc,scd->sud", w, windows).reshape(-1, 3)   # (S*U,3)
    radii = np.einsum("uc,sc->su", w, rwin).reshape(-1)
    oc = o[:, None, :] - centers[None]                               # (N,M,3)
    b = np.einsum("nmd,nd->nm", oc, d)
    c = np.sum(oc * oc, -1) - radii[None] ** 2
    disc = b * b - c
    t_sph = np.where(disc >= 0, -b - np.sqrt(np.maximum(disc, 0)), np.inf)
    t_sph = np.where(t_sph > 1e-3, t_sph, np.inf)
    t_true = t_sph.min(axis=1)
    hit_true = np.isfinite(t_true)

    got_hit = np.asarray(res["is_hit"])
    got_t = np.asarray(res["t"])
    # agreement on hit/miss (rays are aimed AT the strand: sampling gaps are
    # the only source of disagreement, and the march can't tunnel)
    assert (got_hit == hit_true).mean() > 0.98
    both = got_hit & hit_true
    assert both.sum() > 64
    np.testing.assert_allclose(got_t[both], t_true[both], rtol=0, atol=5e-3)


def test_tessellation_bound_holds():
    """Every cone-path hit point lies within the derived bound of the exact
    surface (|min_u |x-C(u)| - r(u)| <= bound + eps)."""
    windows, rwin = _curly_strand()
    for L in (2, 4, 8):
        curves = CurveSet.from_bspline(windows, rwin, pieces_per_segment=L)
        bound = float(tessellation_error_bound(windows, rwin, L).max())
        o, d = _aim_rays(windows, rwin, 96, seed=L)
        n = o.shape[0]
        hit = intersect_curves(
            curves, jnp.asarray(o), jnp.asarray(d),
            jnp.full((n,), 1e-3, jnp.float32),
            jnp.full((n,), 100.0, jnp.float32),
            jnp.ones((n,), bool),
        )
        x = o + np.asarray(hit.t)[:, None] * d
        _, dist = _closest_u(jnp.asarray(windows, jnp.float32),
                             jnp.asarray(rwin, jnp.float32),
                             jnp.asarray(x, jnp.float32)[:, None, :]
                             .repeat(windows.shape[0], 1))
        sd = np.asarray(dist).min(axis=1)
        ok = np.asarray(hit.is_hit)
        assert ok.sum() > 32
        assert np.abs(sd[ok]).max() <= bound + 1e-3, (
            f"L={L}: deviation {np.abs(sd[ok]).max():.4g} > bound {bound:.4g}")


def test_pieces_for_tolerance():
    windows, rwin = _curly_strand()
    l_coarse = pieces_for_tolerance(windows, rwin, 1e-2)
    l_fine = pieces_for_tolerance(windows, rwin, 1e-4)
    assert l_fine > l_coarse >= 2
    # the bound at the chosen piece count meets the tolerance
    assert tessellation_error_bound(windows, rwin, l_fine).max() <= 1e-4 or \
        l_fine == 64  # unless capped
    cs = CurveSet.from_bspline(windows, rwin, tolerance=1e-3)
    assert cs.num_pieces == windows.shape[0] * pieces_for_tolerance(
        windows, rwin, 1e-3)
