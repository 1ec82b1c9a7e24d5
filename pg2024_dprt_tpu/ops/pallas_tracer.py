"""Pallas TPU megakernel tracer — the production `optixTrace` replacement.

Pipeline:
  0. (optional) rays sort by direction octant + origin Morton code so tiles
     of TM consecutive rays are spatially coherent; the engine instead emits
     camera wavefronts in 16x16 pixel-block order, which is cheaper.
  1. XLA prep (small arrays): a conservative interval-arithmetic slab test
     culls (tile, cluster) pairs; survivors form a GLOBAL-POOL pair list —
     each tile owns a contiguous pp-aligned region sized to its candidate
     count, ordered front-to-back by conservative enter distance. Tiles that
     do not fit the static budget are reported and forced to miss; nothing
     is silently wrong (dropped-pair count is returned).
  2. ONE `pallas_call`, grid = budget/pp: each step processes pp pairs of
     one tile. The per-pair triangle tiles (component-planar rows of
     scene.cl_tri_table) are selected by scalar-prefetched cluster ids, so
     Pallas streams them through VMEM with automatic double-buffering. The
     body is a dense (TM, C) exact-f32 Moller-Trumbore on the VPU updating
     the running closest hit held in the revisited output blocks, with an
     early-termination horizon: once every ray's best t is below a pair's
     enter distance, the tile's remaining (front-to-back) pairs are skipped.
     `any_hit=True` selects a cheaper occlusion body (no winner attribution,
     fully-occluded tiles stop early). A Woop-transform MXU body exists
     behind `woop=True` but is off by default: fast-precision MXU transforms
     lose grazing hits (t = -o'z/d'z divides two tiny bf16 values) and at
     HIGHEST precision the VPU MT body is faster.

Backend findings that shaped this design (measured, see CLAUDE.md): lazy
broadcasts in Mosaic are ~1000x slower than explicit `broadcast_to`; per-ray
BVH stepping costs a data-dependent gather per step (~0.01 Mrays/s);
dependent XLA launches cost ~0.5 ms; small-index gathers lower to serial
slice loops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import HitRecord
from ..scene.geometry import DeviceScene

_F32_MAX = np.float32(3.402823466e38)  # np scalar: module-level jax Arrays become hoisted jaxpr consts

TILE_RAYS = 512     # rays per tile (TM)
REGION = 32         # pair slots per tile (S), multiple of PP; slot 0 = init
PAIRS_PER_STEP = 4  # PP


def _woop_kernel(tile_ref, cl_ref, fl_ref, en_ref,       # scalar prefetch
                 rays, rays_mm,                           # (TM, 8) x2
                 *rest, c: int, pp: int):
    """MXU triangle test: rays_mm (TM,8)=[o,1,d,0] @ woop row (8,7C) yields
    per-triangle unit-space ray [o' d' tmap]; epilogue is ~1/4 the VPU work
    of Moller-Trumbore."""
    wtabs = rest[:pp]
    out = rest[pp]                                        # (TM, 4): t,tri,u,v

    p = pl.program_id(0)
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    tmin, tmax = rays[:, 6:7], rays[:, 7:8]

    @pl.when((fl_ref[p * pp] & 1) == 1)
    def _():
        out[:, 0:1] = tmax
        out[:, 1:2] = jnp.full_like(tmax, -1.0)
        out[:, 2:4] = jnp.zeros_like(rays[:, 0:2])

    tm = rays.shape[0]
    worst_vec = jnp.max(out[:, 0:1], axis=0, keepdims=True)
    worst_bits = jax.lax.bitcast_convert_type(worst_vec, jnp.int32)[0, 0]
    B = lambda a: jnp.broadcast_to(a, (tm, c))
    for j in range(pp):
        @pl.when(((fl_ref[p * pp + j] & 2) == 2) & (en_ref[p * pp + j] < worst_bits))
        def _(wtab=wtabs[j]):
            w = wtab[0]                                    # (4, 4C)
            # HIGHEST matmul precision is required: grazing hits divide two
            # tiny z-components (t = -o'z/d'z), so bf16-grade transforms lose
            # ~40% of hits on shallow geometry and ring-band the rest
            mo = jnp.dot(rays_mm[:, 0:4], w, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            md = jnp.dot(rays_mm[:, 4:8], w, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            blk = lambda m, q: m[:, q * c : (q + 1) * c]
            opz, dpz = blk(mo, 2), blk(md, 2)
            dz_ok = jnp.abs(dpz) > 1e-12
            inv_dz = jnp.where(dz_ok, 1.0 / jnp.where(dz_ok, dpz, 1.0), 0.0)
            t = -opz * inv_dz
            u = blk(mo, 0) + t * blk(md, 0)
            v = blk(mo, 1) + t * blk(md, 1)
            tmap = blk(mo, 3)
            # small tolerance so unit-space edges of adjacent triangles do
            # not open seams (double-hits resolve via the closest-t min)
            eps = 1e-5
            tri_ok = (
                dz_ok
                & (tmap >= 0.0)
                & (u >= -eps)
                & (v >= -eps)
                & (u + v <= 1.0 + eps)
                & (t > B(tmin))
                & (t < B(out[:, 0:1]))
            )
            t_masked = jnp.where(tri_ok, t, 3.402823466e38)
            best = jnp.min(t_masked, axis=1, keepdims=True)
            improved = best < out[:, 0:1]
            lane = jax.lax.broadcasted_iota(jnp.int32, t_masked.shape, 1)
            at_min = (t_masked == B(best)) & tri_ok
            win_lane = jnp.min(
                jnp.where(at_min, lane, t_masked.shape[1]), axis=1, keepdims=True
            )
            sel = at_min & (lane == jnp.broadcast_to(win_lane, lane.shape))
            pick = lambda a: jnp.sum(jnp.where(sel, a, 0.0), axis=1, keepdims=True)
            out[:, 0:1] = jnp.where(improved, best, out[:, 0:1])
            out[:, 1:2] = jnp.where(improved, pick(tmap), out[:, 1:2])
            out[:, 2:3] = jnp.where(improved, pick(u), out[:, 2:3])
            out[:, 3:4] = jnp.where(improved, pick(v), out[:, 3:4])


def _occl_kernel(tile_ref, cl_ref, fl_ref, en_ref,       # scalar prefetch
                 rays,                                    # (TM, 8) packed
                 *rest, c: int, pp: int):
    """Any-hit (occlusion) variant of the MT kernel: no winner attribution;
    a tile's pairs stop contributing once every ray is occluded."""
    tris = rest[:pp]
    out = rest[pp]                                        # (TM, 1): occluded

    p = pl.program_id(0)
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    tmin, tmax = rays[:, 6:7], rays[:, 7:8]

    @pl.when((fl_ref[p * pp] & 1) == 1)
    def _():
        out[:] = jnp.zeros_like(out[:])

    tm = rays.shape[0]
    # skip once every ray is already occluded
    any_open = jnp.max(jnp.where(out[:] > 0.5, 0.0, 1.0))
    for j in range(pp):
        @pl.when(((fl_ref[p * pp + j] & 2) == 2) & (any_open > 0.5))
        def _(tri=tris[j]):
            B = lambda a: jnp.broadcast_to(a, (tm, c))
            comp = lambda q: B(tri[0, :, q * c : (q + 1) * c])
            t0x, t0y, t0z = comp(0), comp(1), comp(2)
            e1x = comp(3) - t0x
            e1y = comp(4) - t0y
            e1z = comp(5) - t0z
            e2x = comp(6) - t0x
            e2y = comp(7) - t0y
            e2z = comp(8) - t0z
            tmap = comp(9)
            rdx, rdy, rdz = B(dx), B(dy), B(dz)
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) > 1e-12
            inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            tx = B(ox) - t0x
            ty = B(oy) - t0y
            tz = B(oz) - t0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            tri_ok = (
                ok
                & (tmap >= 0.0)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > B(tmin))
                & (t < B(tmax))
            )
            hit = jnp.max(jnp.where(tri_ok, 1.0, 0.0), axis=1, keepdims=True)
            out[:] = jnp.maximum(out[:], hit)


def _kernel(tile_ref, cl_ref, fl_ref, en_ref,            # scalar prefetch
            rays,                                         # (TM, 8) packed
            *rest, c: int, pp: int):
    tris = rest[:pp]
    out = rest[pp]                                        # (TM, 4): t,tri,u,v

    p = pl.program_id(0)
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    tmin, tmax = rays[:, 6:7], rays[:, 7:8]

    # flags bit 0 on a region's first slot initializes the tile's outputs
    @pl.when((fl_ref[p * pp] & 1) == 1)
    def _():
        out[:, 0:1] = tmax
        out[:, 1:2] = jnp.full_like(tmax, -1.0)
        out[:, 2:4] = jnp.zeros_like(rays[:, 0:2])

    tm = rays.shape[0]
    # early termination: pairs are front-to-back per tile, so once every
    # ray's running best t is below a pair's conservative enter distance the
    # rest of the tile's pairs cannot improve anything
    # compare in monotone float-bit integer domain (scalar bitcasts don't
    # lower in Mosaic; vector bitcast + element extract does)
    worst_vec = jnp.max(out[:, 0:1], axis=0, keepdims=True)        # (1,1) f32
    worst_bits = jax.lax.bitcast_convert_type(worst_vec, jnp.int32)[0, 0]
    for j in range(pp):
        @pl.when(((fl_ref[p * pp + j] & 2) == 2) & (en_ref[p * pp + j] < worst_bits))
        def _(tri=tris[j]):
            # CRITICAL (this backend): materialize every operand at (TM, C)
            # ONCE — Mosaic re-evaluates lazy (TM,1)x(1,C) broadcasts per op,
            # which measured ~1000x slower than explicit broadcast_to.
            B = lambda a: jnp.broadcast_to(a, (tm, c))
            comp = lambda q: B(tri[0, :, q * c : (q + 1) * c])  # (TM, C)
            t0x, t0y, t0z = comp(0), comp(1), comp(2)
            e1x = comp(3) - t0x
            e1y = comp(4) - t0y
            e1z = comp(5) - t0z
            e2x = comp(6) - t0x
            e2y = comp(7) - t0y
            e2z = comp(8) - t0z
            tmap = comp(9)

            rdx, rdy, rdz = B(dx), B(dy), B(dz)
            px = rdy * e2z - rdz * e2y                    # (TM, C)
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) > 1e-12
            inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            tx = B(ox) - t0x
            ty = B(oy) - t0y
            tz = B(oz) - t0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

            tri_ok = (
                ok
                & (tmap >= 0.0)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > B(tmin))
                & (t < B(out[:, 0:1]))
            )
            t_masked = jnp.where(tri_ok, t, 3.402823466e38)
            best = jnp.min(t_masked, axis=1, keepdims=True)   # (TM, 1)
            improved = best < out[:, 0:1]

            # one-hot winner without argmin (min + lowest-lane tie break);
            # all comparisons on explicitly materialized (TM, C) operands
            lane = jax.lax.broadcasted_iota(jnp.int32, t_masked.shape, 1)
            at_min = (t_masked == B(best)) & tri_ok
            win_lane = jnp.min(
                jnp.where(at_min, lane, t_masked.shape[1]), axis=1, keepdims=True
            )
            sel = at_min & (lane == jnp.broadcast_to(win_lane, lane.shape))
            pick = lambda a: jnp.sum(jnp.where(sel, a, 0.0), axis=1, keepdims=True)

            out[:, 0:1] = jnp.where(improved, best, out[:, 0:1])
            out[:, 1:2] = jnp.where(improved, pick(tmap), out[:, 1:2])
            out[:, 2:3] = jnp.where(improved, pick(u), out[:, 2:3])
            out[:, 3:4] = jnp.where(improved, pick(v), out[:, 3:4])


def _interval_cull(scene: DeviceScene, o, d, t_max, active, tiles: int, tile_rays: int):
    """Conservative tile x cluster slab test: never culls a possible hit."""
    k = scene.num_clusters

    def tr(a, f):
        return f(a.reshape(tiles, tile_rays), axis=1)

    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    act_any = tr(active, jnp.any)
    tmax_hi = tr(jnp.where(active, t_max, 0.0), jnp.max)

    enter_lo = jnp.zeros((tiles, k), jnp.float32)
    exit_hi = jnp.full((tiles, k), _F32_MAX)
    # materialize every (T,1)/(1,K) operand at (T,K) ONCE: XLA's broadcast
    # chains don't fuse on this backend (measured ~100x — see CLAUDE.md)
    Bt = lambda a: jnp.broadcast_to(a[:, None], (tiles, k))
    Bk = lambda a: jnp.broadcast_to(a[None, :], (tiles, k))
    for ax in range(3):
        o_l = Bt(tr(o[:, ax], jnp.min))
        o_h = Bt(tr(o[:, ax], jnp.max))
        i_l = Bt(tr(inv[:, ax], jnp.min))
        i_h = Bt(tr(inv[:, ax], jnp.max))
        cmin = Bk(scene.cl_aabb_min[:, ax])
        cmax = Bk(scene.cl_aabb_max[:, ax])
        prods = []
        for b_l, b_h in ((cmin - o_h, cmin - o_l), (cmax - o_h, cmax - o_l)):
            for iv in (i_l, i_h):
                prods.append(b_l * iv)
                prods.append(b_h * iv)
        lo_all = prods[0]
        hi_all = prods[0]
        for q in prods[1:]:
            lo_all = jnp.minimum(lo_all, q)
            hi_all = jnp.maximum(hi_all, q)
        enter_lo = jnp.maximum(enter_lo, lo_all)
        exit_hi = jnp.minimum(exit_hi, hi_all)

    possible = (
        Bt(act_any)
        & Bk(scene.cl_count > 0)
        & (enter_lo <= exit_hi)
        & (exit_hi > 0.0)
        & (enter_lo < Bt(tmax_hi))
    )
    return possible, enter_lo


def _prep_pairs(possible, enter_lo, tiles: int, budget: int, pp: int):
    """Global-pool pair list: each tile owns a contiguous, pp-aligned region
    sized to its actual candidate count (>= pp so every tile has an init
    slot). Tiles whose region does not fit the static budget are reported in
    `tile_fit` (their outputs are overwritten with 'miss' by the caller).

    Returns (pair_tile, pair_cluster, pair_flags, tile_fit, dropped)."""
    k = possible.shape[1]
    counts = jnp.sum(possible.astype(jnp.int32), axis=1)          # (T,)
    region = pp * jnp.maximum(-(-counts // pp), 1)                # per tile
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(region)[:-1]]
    )
    tile_fit = offsets + pp <= budget                              # init fits

    # front-to-back ordering within each tile: rank clusters by conservative
    # enter distance so the kernel's early-termination check can skip the
    # tail once every ray in the tile has a closer hit
    enter_key = jnp.where(possible, enter_lo, _F32_MAX)
    order = jnp.argsort(enter_key, axis=1)
    rank = jnp.argsort(order, axis=1)                              # rank of each cluster
    slot = jnp.where(possible, offsets[:, None] + rank, budget)
    slot = jnp.minimum(slot, budget)                               # clamp

    cl_idx = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :], (tiles, k))
    pair_cluster = (
        jnp.zeros((budget + 1,), jnp.int32)
        .at[slot.reshape(-1)].set(cl_idx.reshape(-1), mode="drop")[:-1]
    )
    pair_flags = (
        jnp.zeros((budget + 1,), jnp.int32)
        .at[slot.reshape(-1)].set(2, mode="drop")[:-1]
    )
    # conservative enter per pair as monotone int bits (floats >= 0)
    enter_clamped = jnp.maximum(enter_lo, 0.0)
    pair_enter = (
        jnp.zeros((budget + 1,), jnp.int32)
        .at[slot.reshape(-1)]
        .set(
            jax.lax.bitcast_convert_type(enter_clamped, jnp.uint32)
            .astype(jnp.int32)
            .reshape(-1),
            mode="drop",
        )[:-1]
    )
    # init bit on each fitting tile's first slot
    init_slot = jnp.where(tile_fit, offsets, budget)
    pair_flags = (
        jnp.concatenate([pair_flags, jnp.zeros((1,), jnp.int32)])
        .at[init_slot].add(1, mode="drop")[:-1]
    )

    # slot -> tile id via compare-sum over region ends (searchsorted is slow)
    ends = offsets + region
    pair_tile = jnp.sum(
        (ends[None, :] <= jnp.arange(budget, dtype=jnp.int32)[:, None]).astype(jnp.int32),
        axis=-1,
    )
    pair_tile = jnp.minimum(pair_tile, tiles - 1).astype(jnp.int32)

    dropped = jnp.sum((possible & (slot >= budget)).astype(jnp.int32))
    return pair_tile, pair_cluster, pair_flags, pair_enter, tile_fit, dropped


def _morton_key(scene: DeviceScene, o, d):
    """24-bit sort key: interleaved 6-bit/axis origin cells (major) +
    interleaved 2-bit/axis direction bins (minor).

    POSITION-major, not direction-major: an octant-major key scatters
    spatially-near rays into 8 groups while directions within an octant
    still diverge, so per-tile cluster unions stay wide.  Measured on the
    64k incoherent wavefront (scripts/study_sort_keys.py): position-major
    cuts the mean per-tile union 1.6x (91.9 -> 57.4 clusters at TM=128)
    vs the octant-major key; finer direction bins are strictly worse."""
    valid = scene.cl_count > 0
    lo = jnp.min(jnp.where(valid[:, None], scene.cl_aabb_min, _F32_MAX), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], scene.cl_aabb_max, -_F32_MAX), axis=0)
    span = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((o - lo) / span) * 63.0, 0.0, 63.0).astype(jnp.uint32)
    dq = jnp.clip((d * 0.5 + 0.5) * 3.0, 0.0, 3.0).astype(jnp.uint32)

    def spread(x):  # up to 8 bits -> every 3rd bit
        x = (x | (x << 8)) & jnp.uint32(0x00F00F)
        x = (x | (x << 4)) & jnp.uint32(0x0C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x249249)
        return x

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    dmorton = spread(dq[:, 0]) | (spread(dq[:, 1]) << 1) | (spread(dq[:, 2]) << 2)
    return (morton << 6) | dmorton


@partial(
    jax.jit,
    static_argnames=("tile_rays", "region", "pairs_per_step", "sort_rays", "woop", "any_hit", "interpret"),
)
def trace_pallas(
    scene: DeviceScene,
    origin, direction, t_min, t_max, active,
    tile_rays: int = TILE_RAYS,
    region: int = REGION,          # AVERAGE pair budget per tile (global pool)
    pairs_per_step: int = PAIRS_PER_STEP,
    sort_rays: bool = False,
    woop: bool = False,            # True = MXU unit-triangle test at HIGHEST
                                   # precision (slower than the exact VPU MT
                                   # path on this backend; kept for study)
    any_hit: bool = False,         # occlusion-only kernel (returns bool mask)
    interpret: bool = None,
):
    """Closest-hit trace. Returns (HitRecord, dropped_pair_count), or
    (occluded_mask, dropped) when any_hit=True."""
    if any_hit:
        woop = False  # the occlusion kernel is MT-based
    n = origin.shape[0]
    tm = tile_rays
    pad = (-n) % tm
    mp = n + pad
    pp = pairs_per_step

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    if sort_rays:
        key = _morton_key(scene, origin, direction)
        key = jnp.where(active, key, jnp.uint32(0xFFFFFFFF))
        _, perm = jax.lax.sort((key, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        take = lambda a: jnp.take(a, perm, axis=0)
        origin, direction = take(origin), take(direction)
        t_min, t_max, active = take(t_min), take(t_max), take(active)

    def pad1(a, fill):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])

    o = pad1(origin, 0.0)
    d = pad1(direction, 1.0)
    tmin_p = pad1(t_min, 0.0)
    tmax_p = pad1(t_max, 0.0)
    act = pad1(active, False)

    tiles = mp // tm
    c = scene.tris_per_cluster

    budget = -(-(tiles * region) // pp) * pp
    steps = budget // pp

    possible, enter_lo = _interval_cull(scene, o, d, tmax_p, act, tiles, tm)
    pair_tile, pair_cluster, pair_flags, pair_enter, tile_fit, dropped = _prep_pairs(
        possible, enter_lo, tiles, budget, pp
    )

    # cap each ray's bound at its scene-AABB exit: no hit can lie beyond it,
    # and it keeps escaping rays from pinning the early-termination horizon
    # at +inf for their whole tile
    s_valid = scene.cl_count > 0
    s_lo = jnp.min(jnp.where(s_valid[:, None], scene.cl_aabb_min, _F32_MAX), axis=0)
    s_hi = jnp.max(jnp.where(s_valid[:, None], scene.cl_aabb_max, -_F32_MAX), axis=0)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    tt0 = (s_lo[None] - o) * inv_d
    tt1 = (s_hi[None] - o) * inv_d
    scene_exit = jnp.min(jnp.maximum(tt0, tt1), axis=-1)
    tmax_eff = jnp.minimum(tmax_p, jnp.maximum(scene_exit, 0.0) * 1.001 + 1e-4)

    rays_packed = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         jnp.where(act, tmin_p, _F32_MAX), jnp.where(act, tmax_eff, 0.0)],
        axis=-1,
    )  # (mp, 8)

    ray_spec = pl.BlockSpec(
        (tm, 8), lambda p, tile_ref, cl_ref, fl_ref, en_ref: (tile_ref[p * pp], 0),
        memory_space=pltpu.VMEM,
    )
    tri_block = (1, 4, 4 * c) if woop else (1, 1, 10 * c)
    tri_specs = [
        pl.BlockSpec(
            tri_block,
            partial(lambda p, tile_ref, cl_ref, fl_ref, en_ref, j=0: (cl_ref[p * pp + j], 0, 0), j=j),
            memory_space=pltpu.VMEM,
        )
        for j in range(pp)
    ]
    out_cols = 1 if any_hit else 4
    out_spec = pl.BlockSpec(
        (tm, out_cols), lambda p, tile_ref, cl_ref, fl_ref, en_ref: (tile_ref[p * pp], 0),
        memory_space=pltpu.VMEM,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(steps,),
        in_specs=([ray_spec, ray_spec] if woop else [ray_spec]) + tri_specs,
        out_specs=[out_spec],
    )

    out_shapes = [jax.ShapeDtypeStruct((mp, out_cols), jnp.float32)]

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    if woop:
        rays_mm = jnp.stack(
            [o[:, 0], o[:, 1], o[:, 2], jnp.ones((mp,), jnp.float32),
             d[:, 0], d[:, 1], d[:, 2], jnp.zeros((mp,), jnp.float32)],
            axis=-1,
        )
        wtab = scene.cl_woop_table.reshape(scene.num_clusters, 4, 4 * c)
        (packed_out,) = pl.pallas_call(
            partial(_woop_kernel, c=c, pp=pp),
            grid_spec=grid_spec,
            out_shape=out_shapes,
            interpret=interpret,
        )(pair_tile, pair_cluster, pair_flags, pair_enter,
          rays_packed, rays_mm, *([wtab] * pp))
    else:
        tri_tbl = scene.cl_tri_table.reshape(scene.num_clusters, 1, 10 * c)
        kern = _occl_kernel if any_hit else _kernel
        (packed_out,) = pl.pallas_call(
            partial(kern, c=c, pp=pp),
            grid_spec=grid_spec,
            out_shape=out_shapes,
            interpret=interpret,
        )(pair_tile, pair_cluster, pair_flags, pair_enter, rays_packed, *([tri_tbl] * pp))

    # tiles that didn't fit the pool were never initialized -> force miss
    ray_fit = jnp.repeat(tile_fit, tm)
    miss_row = jnp.zeros((out_cols,)) if any_hit else jnp.asarray([0.0, -1.0, 0.0, 0.0])
    packed_out = jnp.where(ray_fit[:, None], packed_out, miss_row)

    if any_hit:
        occ = (packed_out[:n, 0] > 0.5) & active[:n]
        if sort_rays:
            inv_perm = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
            occ = jnp.take(occ, inv_perm, axis=0)
        return occ, dropped

    t = packed_out[:n, 0]
    tri = jnp.round(packed_out[:n, 1]).astype(jnp.int32)
    is_hit = (tri >= 0) & active[:n]
    hits = HitRecord(
        t=jnp.where(is_hit, t, _F32_MAX),
        tri_index=jnp.where(is_hit, tri, -1),
        u=packed_out[:n, 2],
        v=packed_out[:n, 3],
        is_hit=is_hit,
    )

    if sort_rays:
        inv_perm = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
        hits = HitRecord(*(jnp.take(a, inv_perm, axis=0) for a in hits))

    return hits, dropped
