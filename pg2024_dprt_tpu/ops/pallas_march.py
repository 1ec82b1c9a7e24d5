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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import NNQuery

_F32_MAX = jnp.float32(3.402823466e38)
_PI = 3.14159265358979


def _lane_bits(p: int) -> int:
    b = 1
    while (1 << b) < p:
        b += 1
    return b


def _march_kernel(rays_ref, boxes_ref, out_ref, *, p: int, tm: int,
                  max_hits: int, eps: float):
    """One ray tile: slab-test all P proxy boxes, then `max_hits` unrolled
    front-to-back selection steps with (hitAABBID) inside-dedup.

    rays cols: [o(3), d(3), t_cap, active, phi, theta, inv(3), pad(2)]
    boxes rows: [minx miny minz maxx maxy maxz allowed pad]  (8, P)
    out cols per hit i (8 each): [local(3), phi_n, theta_n, aabb|-1,
    inside, t]."""
    rays = rays_ref[:]
    boxes = boxes_ref[:]
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

        phi_n = jnp.where(best_inside, phi + _PI, phi)
        phi_n = jnp.where(phi_n >= 2.0 * _PI, phi_n - 2.0 * _PI, phi_n)
        theta_n = jnp.where(best_inside, _PI - theta, theta)

        base = i * 8
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

    ids = jnp.arange(p, dtype=jnp.int32)
    allowed = (
        (ids != jnp.asarray(my_node, jnp.int32))
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

    (out,) = pl.pallas_call(
        partial(_march_kernel, p=p, tm=tm, max_hits=max_hits, eps=eps),
        grid=(mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((tm, max_hits * 8), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((mp, max_hits * 8), jnp.float32)],
        interpret=interpret,
    )(rays, boxes)

    out = out[:n].reshape(n, max_hits, 8)
    feats = out[:, :, 0:5].reshape(n * max_hits, 5)
    aabb = jnp.round(out[:, :, 5]).astype(jnp.int32)
    valid = aabb >= 0
    seq = jnp.maximum(jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1, 0)
    is_inside = out[:, :, 6] > 0.5
    t = out[:, :, 7]

    flat = lambda a: a.reshape(n * max_hits)
    aabb_f = flat(aabb)
    ml = jnp.take(proxies.max_length, jnp.maximum(aabb_f, 0), axis=0)
    return NNQuery(
        features=feats,
        aabb_id=aabb_f,
        pixel_index=jnp.zeros((n * max_hits,), jnp.int32),
        shadow_path_id=jnp.zeros((n * max_hits,), jnp.int32),
        hit_sequence=flat(seq),
        is_inside=flat(is_inside),
        is_valid=flat(valid),
        path_index=jnp.repeat(jnp.arange(n, dtype=jnp.int32), max_hits),
        aabb_t=flat(t),
        max_length=ml,
        t_ratio=jnp.ones((n * max_hits,), jnp.float32),
        normalized_t=flat(t) / jnp.maximum(ml, 1e-12),
    )
