"""Round cubic B-spline curve primitives (hair/fur geometry).

The reference enables OptiX's builtin ROUND_CUBIC_BSPLINE intersector in its
pipeline (/root/reference/src/render/pipeline_helper.cpp:57,116) — curves are
a first-class primitive type of its ray pipeline.  TPU-native counterpart:

  * `CurveSet.from_bspline` flattens each uniform cubic B-spline segment
    (4 control points + per-control radii) into L round-cone (swept-sphere)
    pieces at BUILD time — the standard linearization used by production
    hair tracers; OptiX's builtin IS itself subdivides for its bounds.
  * `ops/curve_intersect.py` intersects ray wavefronts against the flattened
    cone table analytically (closed-form quadratic, fully vectorized — no
    per-ray control flow, TPU-friendly dense math).

Curves carry a material color per strand set; hits report the curve segment
id, axial parameter and surface normal for shading.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# uniform cubic B-spline basis (rows: 1, u, u^2, u^3)
_BSPLINE = np.asarray(
    [[1, 4, 1, 0],
     [-3, 0, 3, 0],
     [3, -6, 3, 0],
     [-1, 3, -3, 1]], np.float64
) / 6.0


def kernel_table(curves: "CurveSet") -> np.ndarray:
    """Pack-time transposed piece table for the frame megakernel's in-kernel
    round-cone test (ops/pallas_frame.py): pieces ride the SUBLANE dim
    (8-padded), ray-independent derived terms precomputed per piece.
    Row lanes: [pa(0:3), ba(3:6), ra(6), rr(7), d2(8), m0(9), valid(10),
    rb(11), pad(12:16)].  Padding rows carry valid = 0."""
    m = curves.num_pieces
    mp = -(-max(m, 1) // 8) * 8
    tab = np.zeros((mp, 16), np.float32)
    pa = np.asarray(curves.p0, np.float32)
    pb = np.asarray(curves.p1, np.float32)
    ra = np.asarray(curves.r0, np.float32)
    rb = np.asarray(curves.r1, np.float32)
    ba = pb - pa
    rr = ra - rb
    m0 = (ba * ba).sum(-1)
    tab[:m, 0:3] = pa
    tab[:m, 3:6] = ba
    tab[:m, 6] = ra
    tab[:m, 7] = rr
    tab[:m, 8] = m0 - rr * rr
    tab[:m, 9] = m0
    tab[:m, 10] = 1.0
    tab[:m, 11] = rb
    return tab


class CurveSet(NamedTuple):
    """Flattened swept-sphere pieces of all curve segments (a jax pytree).

    p0/p1 (M,3) piece endpoints, r0/r1 (M,) endpoint radii, seg_id (M,) i32
    source B-spline segment, color (3,) strand albedo."""

    p0: jnp.ndarray
    p1: jnp.ndarray
    r0: jnp.ndarray
    r1: jnp.ndarray
    seg_id: jnp.ndarray
    color: jnp.ndarray

    @property
    def num_pieces(self) -> int:
        return self.p0.shape[0]

    def aabb(self):
        lo = jnp.minimum(self.p0 - self.r0[:, None], self.p1 - self.r1[:, None])
        hi = jnp.maximum(self.p0 + self.r0[:, None], self.p1 + self.r1[:, None])
        return lo, hi

    @staticmethod
    def from_bspline(control_points, radii, pieces_per_segment: int = 8,
                     color=(0.4, 0.3, 0.2), tolerance: float = None) -> "CurveSet":
        """control_points: (S, 4, 3) — one row of 4 control points per cubic
        B-spline segment (overlapping windows of a strand's control polygon,
        exactly OptiX's vertex-window convention); radii: (S, 4).

        `tolerance` (world units) picks pieces_per_segment from the derived
        surface-deviation bound (ops/curve_exact.py::pieces_for_tolerance):
        the cone surface is then provably within `tolerance` of the exact
        round-B-spline canal surface, validated against the exact
        sphere-traced intersector (tests/test_curve_exact.py)."""
        cp = np.asarray(control_points, np.float64)
        rr = np.asarray(radii, np.float64)
        if tolerance is not None:
            from ..ops.curve_exact import pieces_for_tolerance

            pieces_per_segment = pieces_for_tolerance(cp, rr, tolerance)
        s = cp.shape[0]
        l = pieces_per_segment
        u = np.linspace(0.0, 1.0, l + 1)
        powers = np.stack([np.ones_like(u), u, u * u, u ** 3], axis=-1)  # (L+1,4)
        w = powers @ _BSPLINE                                            # (L+1,4)
        pts = np.einsum("lc,scd->sld", w, cp)                            # (S,L+1,3)
        rad = np.einsum("lc,sc->sl", w, rr)                              # (S,L+1)
        p0 = pts[:, :-1].reshape(s * l, 3)
        p1 = pts[:, 1:].reshape(s * l, 3)
        r0 = rad[:, :-1].reshape(s * l)
        r1 = rad[:, 1:].reshape(s * l)
        seg = np.repeat(np.arange(s, dtype=np.int32), l)
        return CurveSet(
            p0=jnp.asarray(p0.astype(np.float32)),
            p1=jnp.asarray(p1.astype(np.float32)),
            r0=jnp.asarray(np.maximum(r0, 1e-6).astype(np.float32)),
            r1=jnp.asarray(np.maximum(r1, 1e-6).astype(np.float32)),
            seg_id=jnp.asarray(seg),
            color=jnp.asarray(np.asarray(color, np.float32)),
        )

    @staticmethod
    def from_strand(points, radius, pieces_per_segment: int = 8,
                    color=(0.4, 0.3, 0.2)) -> "CurveSet":
        """Build from one strand polyline: points (P,3) control polygon with
        constant or per-point radius; emits P-3 overlapping B-spline windows."""
        pts = np.asarray(points, np.float64)
        p = pts.shape[0]
        assert p >= 4, "a cubic B-spline strand needs >= 4 control points"
        rad = np.broadcast_to(np.asarray(radius, np.float64), (p,))
        windows = np.stack([pts[i:i + 4] for i in range(p - 3)])
        rwin = np.stack([rad[i:i + 4] for i in range(p - 3)])
        return CurveSet.from_bspline(windows, rwin, pieces_per_segment, color)
