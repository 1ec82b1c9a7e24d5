"""Pallas proxy-AABB marching kernel.

The proxy march (render/proxy_stages.py:march_proxies — the OptiX
AABB-custom-primitive marching loop of the reference,
/root/reference/optix/secondary_ray_kernel.cu:230-363) is a 3-iteration
data-dependent selection loop over a handful of proxy boxes.  As XLA ops it
is fast in isolation (~6 ms / 64k rays) but pathological whenever it shares
one jit module with a Mosaic tracer kernel (~95 ms measured, independent of
formulation: argmin or packed-key, gathers or one-hot, scattered or reduced
outputs — the dependent small-reduce loop next to a Pallas custom call is
what triggers it).  Moving the loop into its own Pallas kernel sidesteps
the pathology and is the natural TPU design anyway: per ray tile the whole
march is a few (TM, P) vector ops.

Contract parity with the XLA reference implementation is tested in
tests/test_pallas_march.py (tolerances only where f32 angle identities
differ: phi(-d) == phi(d)+pi mod 2pi up to ulps).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import NNQuery

_F32_MAX = np.float32(3.402823466e38)  # np scalar: module-level jax Arrays become hoisted jaxpr consts
_PI = 3.14159265358979


def _lane_bits(p: int) -> int:
    b = 1
    while (1 << b) < p:
        b += 1
    return b


def _march_kernel(rays_ref, boxes_ref, *refs, p: int, tm: int,
                  max_hits: int, eps: float, instanced: bool = False):
    """One ray tile: slab-test all P proxy boxes, then `max_hits` unrolled
    front-to-back selection steps with (hitAABBID) inside-dedup.

    rays cols: [o(3), d(3), t_cap, active, phi, theta, inv(3), pad(2)]
    boxes rows: [minx miny minz maxx maxy maxz allowed pad]  (8, P)
    instanced adds pxf (24, P): rows 0-8 world_to_obj linear (row-major),
    9-11 translation, 12-14 obj_min, 15-17 obj_span (the route megakernel's
    layout, ops/pallas_route.py) — featurization then runs in OBJECT space
    with the in-kernel Cephes atan/acos (reference originLocal /
    directionLocal + tMax ratio, secondary_ray_kernel.cu:289-303).
    out cols per hit i (16 each): [local(3), phi_n, theta_n, lane|-1,
    inside, t, ratio, pad(7)]."""
    rays = rays_ref[:]
    boxes = boxes_ref[:]
    pxf = refs[0][:] if instanced else None
    out_ref = refs[-1]
    cb = _lane_bits(p)
    cmask = jnp.int32((1 << cb) - 1)
    SAT = jnp.int32(0x7FFFFFFF)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tm, p), 1)
    B = lambda a: jnp.broadcast_to(a, (tm, p))

    tcap = rays[:, 6:7]
    act = rays[:, 7:8] > 0.5
    phi = rays[:, 8:9]
    theta = rays[:, 9:10]

    te = jnp.full((tm, p), -3.402823466e38)
    tx = jnp.full((tm, p), 3.402823466e38)
    for ax in range(3):
        o = B(rays[:, ax:ax + 1])
        iv = B(rays[:, 10 + ax:11 + ax])
        t0 = (B(boxes[ax:ax + 1, :]) - o) * iv
        t1 = (B(boxes[3 + ax:4 + ax, :]) - o) * iv
        te = jnp.maximum(te, jnp.minimum(t0, t1))
        tx = jnp.minimum(tx, jnp.maximum(t0, t1))
    box_ok = (B(boxes[6:7, :]) > 0.0) & B(act) & (tx >= te)

    t_lo = jnp.zeros((tm, 1), jnp.float32)
    seen = jnp.zeros((tm, 1), jnp.int32)

    for i in range(max_hits):
        lo = t_lo + eps
        inside = te <= B(lo)
        cand = jnp.where(inside, tx, te)
        ok = box_ok & (cand > B(lo)) & (cand < B(tcap))
        kb = jax.lax.bitcast_convert_type(jnp.maximum(cand, 0.0), jnp.int32)
        key = jnp.where(ok, (kb & ~cmask) | lanes, SAT)
        kmin = jnp.min(key, axis=1, keepdims=True)          # (TM, 1)
        found = kmin < SAT
        best = kmin & cmask
        # exact winner t / inside via one-hot (the packed key's low mantissa
        # bits were spent on the lane index)
        oh = ((lanes == B(best)) & ok).astype(jnp.float32)
        best_t = jnp.sum(oh * cand, axis=1, keepdims=True)
        best_inside = jnp.sum(oh * inside.astype(jnp.float32), axis=1,
                              keepdims=True) > 0.5
        dup = best_inside & (((seen >> best) & 1) > 0)
        record = found & (~dup)

        base = i * 16
        if instanced:
            from .pallas_frame import _acos, _atan2

            ext = lambda r: jnp.sum(oh * B(pxf[r:r + 1, :]), axis=1,
                                    keepdims=True)
            pt = [rays[:, ax:ax + 1] + best_t * rays[:, 3 + ax:4 + ax]
                  for ax in range(3)]
            dw = [rays[:, 3 + ax:4 + ax] for ax in range(3)]
            p_l, d_l = [], []
            for r in range(3):
                li = [ext(3 * r + j) for j in range(3)]
                p_l.append(li[0] * pt[0] + li[1] * pt[1] + li[2] * pt[2]
                           + ext(9 + r))
                d_l.append(li[0] * dw[0] + li[1] * dw[1] + li[2] * dw[2])
            # world-t / object-t scale: constant along the ray for an
            # affine instance (d unit in world space)
            ratio = 1.0 / jnp.maximum(
                jnp.sqrt(d_l[0] * d_l[0] + d_l[1] * d_l[1]
                         + d_l[2] * d_l[2]), 1e-12)
            for ax in range(3):
                local = ((p_l[ax] - ext(12 + ax))
                         / jnp.maximum(ext(15 + ax), 1e-12))
                out_ref[:, base + ax:base + ax + 1] = jnp.where(
                    record, local, 0.0)
            sgn = jnp.where(best_inside, -ratio, ratio)
            dn = [d_l[ax] * sgn for ax in range(3)]
            theta_n = _acos(dn[1])
            phi_n = _atan2(dn[2], dn[0])
            phi_n = jnp.where(phi_n < 0.0, phi_n + 2.0 * _PI, phi_n)
        else:
            ratio = jnp.ones((tm, 1), jnp.float32)
            phi_n = jnp.where(best_inside, phi + _PI, phi)
            phi_n = jnp.where(phi_n >= 2.0 * _PI, phi_n - 2.0 * _PI, phi_n)
            theta_n = jnp.where(best_inside, _PI - theta, theta)
            for ax in range(3):
                bmin = jnp.sum(oh * B(boxes[ax:ax + 1, :]), axis=1, keepdims=True)
                bmax = jnp.sum(oh * B(boxes[3 + ax:4 + ax, :]), axis=1, keepdims=True)
                span = jnp.maximum(bmax - bmin, 1e-12)
                point = rays[:, ax:ax + 1] + best_t * rays[:, 3 + ax:4 + ax]
                out_ref[:, base + ax:base + ax + 1] = jnp.where(
                    record, (point - bmin) / span, 0.0)
        out_ref[:, base + 3:base + 4] = jnp.where(record, phi_n / (2.0 * _PI), 0.0)
        out_ref[:, base + 4:base + 5] = jnp.where(record, theta_n / _PI, 0.0)
        out_ref[:, base + 5:base + 6] = jnp.where(
            record, best.astype(jnp.float32), -1.0)
        out_ref[:, base + 6:base + 7] = jnp.where(
            record & best_inside, 1.0, 0.0)
        out_ref[:, base + 7:base + 8] = jnp.where(record, best_t, 0.0)
        out_ref[:, base + 8:base + 9] = jnp.where(record, ratio, 1.0)
        out_ref[:, base + 9:base + 16] = jnp.zeros((tm, 7), jnp.float32)

        seen = jnp.where(record, seen | (jnp.int32(1) << best), seen)
        t_lo = jnp.where(found, best_t, t_lo)


@partial(jax.jit, static_argnames=("max_hits", "eps", "tile_rays", "interpret"))
def march_proxies_pallas(
    proxies,
    origin, direction, t_cap, active, my_node,
    max_hits: int, eps: float,
    tile_rays: int = 512,
    interpret: bool = None,
) -> NNQuery:
    """Drop-in Pallas replacement for proxy_stages.march_proxies (same
    NNQuery contract; see that docstring for marching semantics and
    reference citations)."""
    n = origin.shape[0]
    p = proxies.num_partitions
    tm = min(tile_rays, max(n, 8))
    pad = (-n) % tm
    mp = n + pad

    inv = 1.0 / jnp.where(
        jnp.abs(direction) < 1e-12,
        jnp.where(direction >= 0, 1e-12, -1e-12),
        direction,
    )
    # direction angles precomputed once (loop-free XLA is safe next to the
    # kernels; the inside-hit negation identities are applied in-kernel)
    from ..core import math as cmath

    phi, theta = cmath.spherical_for_train(cmath.normalize(direction))

    def pad1(a, fill):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])

    rays = jnp.concatenate(
        [
            pad1(origin, 0.0),
            pad1(direction, 1.0),
            pad1(t_cap.astype(jnp.float32), 0.0)[:, None],
            pad1(active, False).astype(jnp.float32)[:, None],
            pad1(phi.astype(jnp.float32), 0.0)[:, None],
            pad1(theta.astype(jnp.float32), 0.0)[:, None],
            pad1(inv, 1.0),
            jnp.zeros((mp, 3), jnp.float32),
        ],
        axis=-1,
    )  # (mp, 16)

    # own-partition exclusion: by OWNING NODE when instanced (an instance
    # hosted by my partition is local geometry, not a proxy)
    row_node = (proxies.node_id if proxies.node_id is not None
                else jnp.arange(p, dtype=jnp.int32))
    allowed = (
        (row_node != jnp.asarray(my_node, jnp.int32))
        & (proxies.max_length > 0.0)
    ).astype(jnp.float32)
    # empty partitions carry inverted-infinity AABBs; zero them so the slab
    # products stay finite (their allowed row already excludes them)
    bmin = jnp.where(jnp.isfinite(proxies.aabb_min), proxies.aabb_min, 0.0)
    bmax = jnp.where(jnp.isfinite(proxies.aabb_max), proxies.aabb_max, 0.0)
    boxes = jnp.concatenate(
        [bmin.T, bmax.T, allowed[None, :], jnp.zeros((1, p), jnp.float32)],
        axis=0,
    )  # (8, P)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    instanced = proxies.instanced
    extra = []
    if instanced:
        # route-megakernel pxf layout (ops/pallas_route.py): affine rows +
        # object AABB, column per instance
        lin = jnp.transpose(
            proxies.world_to_obj[:, :, :3].reshape(p, 9), (1, 0))   # (9, P)
        trans = jnp.transpose(proxies.world_to_obj[:, :, 3], (1, 0))
        pxf = jnp.concatenate(
            [lin, trans, proxies.obj_min.T, proxies.obj_span.T,
             jnp.zeros((6, p), jnp.float32)], axis=0)               # (24, P)
        extra = [pxf]

    (out,) = pl.pallas_call(
        partial(_march_kernel, p=p, tm=tm, max_hits=max_hits, eps=eps,
                instanced=instanced),
        grid=(mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra),
        out_specs=[pl.BlockSpec((tm, max_hits * 16), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((mp, max_hits * 16), jnp.float32)],
        interpret=interpret,
    )(rays, boxes, *extra)

    out = out[:n].reshape(n, max_hits, 16)
    feats = out[:, :, 0:5].reshape(n * max_hits, 5)
    lane = jnp.round(out[:, :, 5]).astype(jnp.int32)
    valid = lane >= 0
    seq = jnp.maximum(jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1, 0)
    is_inside = out[:, :, 6] > 0.5
    t = out[:, :, 7]
    ratio = out[:, :, 8]

    flat = lambda a: a.reshape(n * max_hits)
    lane_f = flat(lane)
    rows_safe = jnp.maximum(lane_f, 0)
    valid_f = flat(valid)
    ml = jnp.take(proxies.max_length, rows_safe, axis=0)
    row_obj = (proxies.obj_id if proxies.obj_id is not None
               else jnp.arange(p, dtype=jnp.int32))
    ratio_f = flat(ratio)
    return NNQuery(
        features=feats,
        # NN grouping key = OBJECT id (instances share their object's net)
        aabb_id=jnp.where(valid_f, jnp.take(row_obj, rows_safe), -1),
        pixel_index=jnp.zeros((n * max_hits,), jnp.int32),
        shadow_path_id=jnp.zeros((n * max_hits,), jnp.int32),
        hit_sequence=flat(seq),
        is_inside=flat(is_inside),
        is_valid=valid_f,
        path_index=jnp.repeat(jnp.arange(n, dtype=jnp.int32), max_hits),
        aabb_t=flat(t),
        max_length=ml,
        # world-t / object-t scale (1 without instancing)
        t_ratio=ratio_f,
        normalized_t=flat(t) / jnp.maximum(ratio_f * ml, 1e-12),
        # routing target = owning partition of the hit instance
        node_id=jnp.where(valid_f, jnp.take(row_node, rows_safe), -1),
    )
