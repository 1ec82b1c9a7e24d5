"""Curve primitives: analytic round-cone intersector vs an SDF sphere-tracing
oracle, plus B-spline flattening sanity."""
import numpy as np
import jax.numpy as jnp

from pg2024_dprt_tpu.ops.curve_intersect import intersect_curves, occlude_curves
from pg2024_dprt_tpu.scene.curves import CurveSet


def sd_round_cone(p, a, b, r1, r2):
    """Exact rounded-cone SDF (standard construction)."""
    ba = b - a
    l2 = float(np.dot(ba, ba))
    rr = r1 - r2
    a2 = l2 - rr * rr
    il2 = 1.0 / l2
    pa = p - a
    y = float(np.dot(pa, ba))
    z = y - l2
    xv = pa * l2 - ba * y
    x2 = float(np.dot(xv, xv))
    y2 = y * y * l2
    z2 = z * z * l2
    k = np.sign(rr) * rr * rr * x2
    if np.sign(z) * a2 * z2 > k:
        return np.sqrt(x2 + z2) * il2 - r2
    if np.sign(y) * a2 * y2 < k:
        return np.sqrt(x2 + y2) * il2 - r1
    return (np.sqrt(x2 * a2 * il2) + y * rr) * il2 - r1


def sphere_trace(o, d, a, b, r1, r2, t_max=20.0):
    t = 0.0
    for _ in range(256):
        dist = sd_round_cone(o + t * d, a, b, r1, r2)
        if dist < 1e-5:
            return t
        t += dist
        if t > t_max:
            return np.inf
    return np.inf


def _pieces_as_curveset(a, b, r1, r2):
    return CurveSet(
        p0=jnp.asarray(a[None, :].astype(np.float32)),
        p1=jnp.asarray(b[None, :].astype(np.float32)),
        r0=jnp.asarray(np.asarray([r1], np.float32)),
        r1=jnp.asarray(np.asarray([r2], np.float32)),
        seg_id=jnp.zeros((1,), jnp.int32),
        color=jnp.asarray([0.5, 0.5, 0.5], jnp.float32),
    )


def test_round_cone_vs_sdf_oracle():
    rng = np.random.RandomState(3)
    a = np.asarray([0.0, 0.0, 0.0])
    b = np.asarray([0.6, 0.8, 0.2])
    r1, r2 = 0.25, 0.1
    curves = _pieces_as_curveset(a, b, r1, r2)

    n = 128
    o = rng.randn(n, 3)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0 + (a + b) / 2
    target = (a + b) / 2 + rng.randn(n, 3) * 0.25
    d = target - o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)

    hit = intersect_curves(
        curves, jnp.asarray(o.astype(np.float32)), jnp.asarray(d.astype(np.float32)),
        1e-3, jnp.full((n,), 1e30, jnp.float32), jnp.ones((n,), bool),
    )
    got_t = np.asarray(hit.t)
    got_hit = np.asarray(hit.is_hit)
    nrm = np.asarray(hit.normal)

    want = np.asarray([sphere_trace(o[i], d[i], a, b, r1, r2) for i in range(n)])
    want_hit = np.isfinite(want)
    # sphere tracing converges from outside; allow a tiny boundary band
    agree = got_hit == want_hit
    assert agree.mean() > 0.97, f"hit agreement {agree.mean()}"
    both = got_hit & want_hit & agree
    assert both.sum() > 20
    np.testing.assert_allclose(got_t[both], want[both], atol=2e-3)
    # entry normals: unit length, facing the ray
    ln = np.linalg.norm(nrm[both], axis=-1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-4)
    assert (np.sum(nrm[both] * d[both], axis=-1) < 1e-3).all()


def test_round_cone_respects_tmax_and_active():
    a = np.asarray([0.0, 0.0, 0.0]); b = np.asarray([1.0, 0.0, 0.0])
    curves = _pieces_as_curveset(a, b, 0.2, 0.2)
    o = jnp.asarray([[-2.0, 0.0, 0.0], [-2.0, 0.0, 0.0], [-2.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]] * 3)
    tmax = jnp.asarray([10.0, 1.0, 10.0])   # second ray's tmax stops short
    act = jnp.asarray([True, True, False])
    hit = intersect_curves(curves, o, d, 1e-3, tmax, act)
    assert bool(hit.is_hit[0]) and not bool(hit.is_hit[1]) and not bool(hit.is_hit[2])
    np.testing.assert_allclose(float(hit.t[0]), 1.8, atol=1e-4)
    occ = occlude_curves(curves, o, d, 1e-3, tmax, act)
    assert bool(occ[0]) and not bool(occ[1]) and not bool(occ[2])


def test_bspline_flattening_continuity():
    """Flattened pieces chain head-to-tail and follow the analytic spline."""
    rng = np.random.RandomState(11)
    pts = np.cumsum(rng.randn(7, 3) * 0.3, axis=0)
    cs = CurveSet.from_strand(pts, radius=0.05, pieces_per_segment=8)
    assert cs.num_pieces == (7 - 3) * 8
    p0 = np.asarray(cs.p0); p1 = np.asarray(cs.p1)
    # within a segment, pieces chain exactly
    seg = np.asarray(cs.seg_id)
    for s in range(4):
        rows = np.where(seg == s)[0]
        np.testing.assert_allclose(p1[rows[:-1]], p0[rows[1:]], atol=1e-6)
    # consecutive windows join C2-continuously: segment s end == s+1 start
    ends = p1[seg == 0][-1]
    starts = p0[seg == 1][0]
    np.testing.assert_allclose(ends, starts, atol=1e-5)
    # midpoint of segment 0 matches the analytic B-spline at u=0.5
    B = np.asarray([[1, 4, 1, 0], [-3, 0, 3, 0], [3, -6, 3, 0], [-1, 3, -3, 1]]) / 6.0
    u = 0.5
    w = np.asarray([1, u, u * u, u ** 3]) @ B
    mid_true = w @ pts[0:4]
    np.testing.assert_allclose(p1[seg == 0][3], mid_true, atol=1e-6)


def test_curve_and_triangle_composition():
    """Curves compose with the triangle tracer: nearest-of-both semantics."""
    from pg2024_dprt_tpu.ops.trace_api import trace_closest
    from pg2024_dprt_tpu.scene import device_scene_from_meshes
    from pg2024_dprt_tpu.scene.geometry import MeshGeometry
    from pg2024_dprt_tpu.scene.procedural import _quad

    # a wall at z=0, a thick straight curve in front of it at z=1
    v0, v1, v2 = _quad([-5, -5, 0], [5, -5, 0], [5, 5, 0], [-5, 5, 0])
    wall = MeshGeometry(v0=v0, v1=v1, v2=v2)
    scene = device_scene_from_meshes([wall])
    curves = CurveSet.from_strand(
        np.asarray([[-3.0, 0, 1], [-1, 0, 1], [1, 0, 1], [3, 0, 1]]), radius=0.3
    )
    n = 3
    o = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 3.0, 3.0], [0.0, 0.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    tmax = jnp.full((n,), 1e30, jnp.float32)
    act = jnp.ones((n,), bool)
    tri_hits = trace_closest(scene, o, d, 1e-3, tmax, act)
    cur_hits = intersect_curves(curves, o, d, 1e-3, tmax, act)
    # ray 0 hits the curve first (t=1.7) then would hit the wall (t=3)
    assert bool(cur_hits.is_hit[0]) and float(cur_hits.t[0]) < float(tri_hits.t[0])
    # ray 1 misses the curve, hits the wall
    assert not bool(cur_hits.is_hit[1]) and bool(tri_hits.is_hit[1])
    # ray 2 misses both
    assert not bool(cur_hits.is_hit[2]) and not bool(tri_hits.is_hit[2])


def test_curves_in_scene_composite_trace():
    """Curves packed INTO the DeviceScene (scene.curves) composite inside
    trace_api: closest = nearest of triangles and curves (curve winners
    encode tri_index = -2 - piece), occlusion ORs the curve any-hit."""
    from pg2024_dprt_tpu.ops.trace_api import (
        trace_closest_checked, trace_occlusion_checked)
    from pg2024_dprt_tpu.scene import device_scene_from_meshes
    from pg2024_dprt_tpu.scene.geometry import MeshGeometry
    from pg2024_dprt_tpu.scene.procedural import _quad

    v0, v1, v2 = _quad([-5, -5, 0], [5, -5, 0], [5, 5, 0], [-5, 5, 0])
    wall = MeshGeometry(v0=v0, v1=v1, v2=v2)
    curves = CurveSet.from_strand(
        np.asarray([[-3.0, 0, 1], [-1, 0, 1], [1, 0, 1], [3, 0, 1]]), radius=0.3
    )
    scene = device_scene_from_meshes([wall], curves=curves)
    n = 3
    o = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 3.0, 3.0], [0.0, 0.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    tmax = jnp.full((n,), 1e30, jnp.float32)
    act = jnp.ones((n,), bool)

    hits, diag = trace_closest_checked(scene, o, d, 1e-3, tmax, act)
    assert int(diag) == 0
    # ray 0: the curve (z=1, r=0.3) is in front of the wall (z=0)
    assert bool(hits.is_hit[0]) and int(hits.tri_index[0]) <= -2
    np.testing.assert_allclose(float(hits.t[0]), 1.7, atol=2e-2)
    # ray 1: misses the curve, hits the wall (a real triangle index)
    assert bool(hits.is_hit[1]) and int(hits.tri_index[1]) >= 0
    # ray 2: misses both
    assert not bool(hits.is_hit[2])

    # occlusion: within tmax=2.5 ray 0 is blocked by the CURVE only
    occ, diag = trace_occlusion_checked(
        scene, o, d, 1e-3, jnp.full((n,), 2.5, jnp.float32), act)
    assert int(diag) == 0
    assert bool(occ[0]) and not bool(occ[1]) and not bool(occ[2])


def test_curves_render_end_to_end():
    """A strand over a floor renders through the full engine: the curve
    occludes/colors pixels (image differs from the curveless render in the
    strand's footprint), shading stays finite, tracer diag stays 0."""
    from pg2024_dprt_tpu.core import Camera
    from pg2024_dprt_tpu.render import RenderConfig
    from pg2024_dprt_tpu.render.engine import render_image
    from pg2024_dprt_tpu.scene import device_scene_from_meshes
    from pg2024_dprt_tpu.scene.geometry import MeshGeometry
    from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable
    from pg2024_dprt_tpu.scene.procedural import _quad

    v0, v1, v2 = _quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2])
    floor = MeshGeometry(v0=v0, v1=v1, v2=v2, base_color=(0.7, 0.7, 0.7))
    curves = CurveSet.from_strand(
        np.asarray([[-1.2, 0.5, 0], [-0.4, 0.7, 0], [0.4, 0.7, 0], [1.2, 0.5, 0]]),
        radius=0.15, color=(0.8, 0.2, 0.1),
    )
    lt = np.asarray([[[-0.5, 2.5, -0.5], [0.5, 2.5, -0.5], [0.0, 2.5, 0.5]]],
                    np.float32)
    lights = LightTable.from_arrays(lt, np.asarray([[40.0, 40.0, 40.0]], np.float32))
    env = EnvironmentMap.constant((0.2, 0.25, 0.3))
    cam = Camera.look_at([0, 1.2, 3.0], [0, 0.5, 0], [0, 1, 0], 45.0, 48, 48)
    cfg = RenderConfig(width=48, height=48, spp=1, bounces=2)

    base = device_scene_from_meshes([floor])
    with_curves = device_scene_from_meshes([floor], curves=curves)
    img0, st0 = render_image(base, lights, env, cam, cfg, return_stats=True)
    img1, st1 = render_image(with_curves, lights, env, cam, cfg, return_stats=True)
    assert st0["tracer_diag"] == 0 and st1["tracer_diag"] == 0
    assert np.isfinite(np.asarray(img1)).all()
    diffpix = (np.abs(np.asarray(img1) - np.asarray(img0)).sum(-1) > 1e-3).sum()
    assert int(diffpix) > 40  # the strand's footprint is visibly rendered
