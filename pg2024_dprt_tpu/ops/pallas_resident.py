"""Resident-table Pallas tracer — v2 of the TPU `optixTrace` replacement.

The round-1 streaming tracer (ops/pallas_tracer.py) is VPU-compute-bound and
wastes ~4x of its triangle tests on tile padding; its XLA-side dispatch
(cull + argsort + scatter) costs several dependent-launch latencies
(~0.5 ms each on this backend).  This kernel eliminates both:

  * The ENTIRE cluster triangle table (scene.cl_tri_table as (K, 10, C)) and
    a planar cluster-AABB table (8, K) stay resident in VMEM for the whole
    launch — no per-pair streaming, fits scenes up to ~100k triangles (the
    streaming kernel remains the production path above that;
    ops/trace_api.py selects).
  * There is NO host/XLA dispatch at all.  The grid runs over SMALL ray
    blocks (TM=128..256); each step computes its own conservative
    interval-arithmetic slab test against every cluster IN-KERNEL ((1, K)
    vector ops — a few hundred lanes, negligible next to the (TM, C)
    triangle test), then runs an on-demand selection sort: every `while_loop`
    iteration argmins the remaining enter distances, intersects that
    cluster, and terminates once the nearest remaining enter exceeds the
    block's worst committed hit.  Exact front-to-back, exact early
    termination, and no static pair budget — nothing can ever be dropped
    (the streaming tracer's budget-escalation machinery is unnecessary
    here).
  * The winner epilogue is a packed-key argmin: key = (t_bits & ~lane_mask)
    | lane.  One int min-reduce replaces the one-hot pick; exact t/u/v are
    recomputed afterwards in XLA from the winning triangle (large-index
    gathers are fast on this backend).

Role parity: the per-thread `optixTrace` hot loop of the reference
(/root/reference/optix/distributed_traversal_kernel.cu:215-339, kernel.cu),
re-designed as a block-wavefront TPU kernel rather than a per-thread BVH
walk (per-ray stepping measured 0.01 Mrays/s on TPU — see CLAUDE.md).
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
from .pallas_tracer import _morton_key

_F32_MAX = np.float32(3.402823466e38)  # np scalar: module-level jax Arrays become hoisted jaxpr consts

TILE_RAYS = 128  # best on-chip with the HONEST chained fold (sweep_resident:
                 # camera 4.63 ms @128 vs 6.50 @256; incoherent 52 vs 94)


def _lane_bits(c: int) -> int:
    b = 1
    while (1 << b) < c:
        b += 1
    return b


def _cluster_enters(rays, boxes, k: int, tm: int, exact: bool = True,
                    keep_rows: bool = False):
    """In-kernel slab test of this ray block against every cluster,
    min-reduced over the block.  boxes rows: [minx miny minz maxx maxy maxz
    count pad].  Returns (1, K) f32: entry k = a lower bound on the enter
    distance of any ray in the block that may enter cluster k (+inf when
    provably none does).

    Two conservative modes, selected statically per wavefront kind:

      * exact=True — per-ray slab test, (TM, K) work.  Essential for
        SCATTERED (sorted bounce/shadow) wavefronts: within one direction
        octant 1/d spans [1, inf), so the interval mode below degenerates —
        nearly every cluster "enters" at ~0, no culling, no front-to-back
        horizon, a full-scene sweep per tile (measured 5.5x).  Chunked over
        K to bound the working set; comparisons carry a few-ulp guard band
        so f32 rounding can never cull a boundary hit the oracle accepts.
      * exact=False — interval arithmetic over the block's origin and
        1/direction RANGES, (1, K) work.  For COHERENT camera tiles (a
        16x16 pixel frustum) the interval bound is nearly as tight as the
        exact union at ~TM x less cull work (measured ~25% whole-wavefront
        win at TM=256, K=512).

    keep_rows=True (exact mode only) returns the full per-ray (TM, K)
    enter matrix instead of the block min — the re-cull loop's input."""
    inf = jnp.float32(float("inf"))
    assert not (keep_rows and not exact)
    if not exact:
        d = rays[:, 3:6]
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
        tmax_hi = jnp.max(rays[:, 7:8])                      # inactive rays: 0
        enter = jnp.zeros((1, k), jnp.float32)
        exit_ = jnp.full((1, k), inf)
        for ax in range(3):
            o_l = jnp.min(rays[:, ax:ax + 1])
            o_h = jnp.max(rays[:, ax:ax + 1])
            i_l = jnp.min(inv[:, ax:ax + 1])
            i_h = jnp.max(inv[:, ax:ax + 1])
            cmin = boxes[ax:ax + 1, :]                       # (1, K)
            cmax = boxes[3 + ax:4 + ax, :]
            lo = None
            hi = None
            for b in (cmin - o_h, cmin - o_l, cmax - o_h, cmax - o_l):
                for iv in (i_l, i_h):
                    q = b * iv
                    lo = q if lo is None else jnp.minimum(lo, q)
                    hi = q if hi is None else jnp.maximum(hi, q)
            enter = jnp.maximum(enter, lo)
            exit_ = jnp.minimum(exit_, hi)
        ok = (
            (boxes[6:7, :] > 0.0)          # non-empty cluster (padding rows
            & (enter <= exit_)             # carry zeroed AABBs)
            & (exit_ > 0.0)
            & (enter < tmax_hi)
        )
        return jnp.where(ok, jnp.maximum(enter, 0.0), inf)
    d = rays[:, 3:6]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    tmax = rays[:, 7:8]                                      # (TM, 1); 0 when inactive

    chunk = max(128, min(k, 262144 // tm))
    outs = []
    for c0 in range(0, k, chunk):
        w = min(c0 + chunk, k) - c0
        B = lambda a: jnp.broadcast_to(a, (tm, w))
        enter = jnp.zeros((tm, w), jnp.float32)
        exit_ = jnp.full((tm, w), inf)
        for ax in range(3):
            o = B(rays[:, ax:ax + 1])
            iv = B(inv[:, ax:ax + 1])
            t0 = (B(boxes[ax:ax + 1, c0:c0 + w]) - o) * iv
            t1 = (B(boxes[3 + ax:4 + ax, c0:c0 + w]) - o) * iv
            enter = jnp.maximum(enter, jnp.minimum(t0, t1))
            exit_ = jnp.minimum(exit_, jnp.maximum(t0, t1))
        exit_g = exit_ * (1.0 + 4e-7) + 1e-7                 # rounding guard
        ok = (
            (B(boxes[6:7, c0:c0 + w]) > 0.0)   # non-empty cluster (padding
            & (enter <= exit_g)                # rows carry zeroed AABBs)
            & (exit_g > 0.0)
            & (enter < B(tmax))
        )
        per_ray = jnp.where(ok, jnp.maximum(enter, 0.0), inf)
        outs.append(per_ray if keep_rows
                    else jnp.min(per_ray, axis=0, keepdims=True))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _selection_keys(en, k: int, cb: int):
    """Pack enter-distance bits with the cluster index so each selection-sort
    step needs exactly ONE vector->scalar extract (the dominant per-pair
    overhead): key = (enter_bits & ~cmask) | cluster.  Enter distances are
    non-negative (clamped) so their bits compare monotonically; masking the
    low bits rounds enter DOWN — conservative for the horizon test."""
    cmask = jnp.int32((1 << cb) - 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    bits = jax.lax.bitcast_convert_type(en, jnp.int32)
    # +inf enters (culled clusters) become saturated keys
    return jnp.where(
        jnp.isfinite(en), (bits & ~cmask) | lanes, jnp.int32(0x7FFFFFFF)
    )


def _next_cluster(keys):
    """Selection-sort step on packed keys: (scalar key, keys with the winner
    masked out).  key == 0x7FFFFFFF means no cluster remains."""
    kv = jnp.min(keys, axis=1, keepdims=True)                # (1, 1)
    keys = jnp.where(keys == jnp.broadcast_to(kv, keys.shape),
                     jnp.int32(0x7FFFFFFF), keys)
    return kv[0, 0], keys


def _mt_body(rays, tri, c: int, tm: int):
    """Dense triple-product Moller-Trumbore of the block against one cluster
    slice (tri rows: v0 xyz, e1 xyz, e2 xyz, n=e1xe2 xyz).  With m = s x d:
    u_raw = e2.m, v_raw = -e1.m, t_raw = n.s, det = -n.d — one cross product
    instead of two, and no per-lane u/v scaling (the winner's exact u/v are
    recomputed in the XLA epilogue).  Padding/degenerate triangles have
    n = 0 -> det = 0 -> rejected; no tmap mask needed.

    Returns ((TM,C) f32 t, (TM,C) bool accept).  CRITICAL on this backend:
    materialize every operand at (TM, C) once — Mosaic re-evaluates lazy
    broadcasts per op (measured ~1000x)."""
    B = lambda a: jnp.broadcast_to(a, (tm, c))
    comp = lambda q: B(tri[q:q + 1, :])
    v0x, v0y, v0z = comp(0), comp(1), comp(2)
    e1x, e1y, e1z = comp(3), comp(4), comp(5)
    e2x, e2y, e2z = comp(6), comp(7), comp(8)
    nx, ny, nz = comp(9), comp(10), comp(11)

    rdx, rdy, rdz = B(rays[:, 3:4]), B(rays[:, 4:5]), B(rays[:, 5:6])
    sx = B(rays[:, 0:1]) - v0x
    sy = B(rays[:, 1:2]) - v0y
    sz = B(rays[:, 2:3]) - v0z
    mx = sy * rdz - sz * rdy
    my = sz * rdx - sx * rdz
    mz = sx * rdy - sy * rdx
    det = -(rdx * nx + rdy * ny + rdz * nz)
    u = e2x * mx + e2y * my + e2z * mz
    v = -(e1x * mx + e1y * my + e1z * mz)
    t_raw = nx * sx + ny * sy + nz * sz

    adet = jnp.abs(det)
    ok = adet > 1e-12
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    t = t_raw * inv_det
    neg = det < 0.0
    su = jnp.where(neg, -u, u)
    sv = jnp.where(neg, -v, v)
    tri_ok = (
        ok
        & (su >= 0.0)
        & (sv >= 0.0)
        & (su + sv <= adet)
        & (t > B(rays[:, 6:7]))
    )
    return t, tri_ok


def _xform_visit(rays, xf_ref, cid, kb: int, tm: int):
    """Two-level instancing: transform the ray block into the visited
    cluster's OBJECT space.  xf_ref is PER-INSTANCE ((I, 1, 16),
    scene/geometry.py cl_xf layout — lanes 0-8 world_to_obj linear, 9-11
    translation); the instance of cluster `cid` is cid // kb and its base
    cluster rem(cid, kb).  The direction stays UNNORMALIZED, so the
    object-space MT parameter equals the world-space t exactly:
    o_l + t*d_l = M(o + t*d) + b.  Returns (rays_t (TM, 8), base_cluster
    scalar i32)."""
    kb_i = jnp.int32(kb)
    xfr = xf_ref[jnp.minimum(jax.lax.div(cid, kb_i),
                             xf_ref.shape[0] - 1)]           # (1, 16)
    e = lambda j: xfr[0, j]
    o = [rays[:, ax:ax + 1] for ax in range(3)]
    d = [rays[:, 3 + ax:4 + ax] for ax in range(3)]
    o_l, d_l = [], []
    for i in range(3):
        m0, m1, m2 = e(3 * i), e(3 * i + 1), e(3 * i + 2)
        o_l.append(o[0] * m0 + o[1] * m1 + o[2] * m2 + e(9 + i))
        d_l.append(d[0] * m0 + d[1] * m1 + d[2] * m2)
    rays_t = jnp.concatenate(o_l + d_l + [rays[:, 6:8]], axis=-1)
    return rays_t, jax.lax.rem(cid, kb_i)


def _load_ray_rows(rays_ref, boxes_ref, tm: int):
    """Load one ray block from the row-major (8, TM) input and apply the
    scene-exit horizon cap IN-KERNEL (rows: o xyz, d xyz, tmin, tmax).

    The cap (each ray's tmax clamped to its scene-AABB exit so escaping
    rays cannot pin the early-termination horizon at +inf) used to be an
    XLA prologue reduce fusion per trace; entry-op launches dominate this
    backend, so it moves here: the scene AABB is the masked min/max over
    the resident cluster/group box table (6 (1, K) reduces), the per-ray
    exit one slab test in row layout.  Returns the capped (8, TM) rows."""
    rows = rays_ref[:]                                       # (8, TM)
    boxes = boxes_ref[:]
    ok = boxes[6:7, :] > 0.0
    ex = jnp.full((1, tm), 3.402823466e38, jnp.float32)
    for ax in range(3):
        lo = jnp.min(jnp.where(ok, boxes[ax:ax + 1, :], 3.402823466e38))
        hi = jnp.max(jnp.where(ok, boxes[3 + ax:4 + ax, :], -3.402823466e38))
        dv = rows[3 + ax:4 + ax, :]
        inv = 1.0 / jnp.where(jnp.abs(dv) < 1e-12,
                              jnp.where(dv >= 0, 1e-12, -1e-12), dv)
        t0 = (lo - rows[ax:ax + 1, :]) * inv
        t1 = (hi - rows[ax:ax + 1, :]) * inv
        ex = jnp.minimum(ex, jnp.maximum(t0, t1))
    cap = jnp.maximum(ex, 0.0) * 1.001 + 1e-4
    tmax_r = jnp.minimum(rows[7:8, :], cap)
    return jnp.concatenate([rows[0:7, :], tmax_r], axis=0)


def _load_rays(rays_ref, boxes_ref, tm: int):
    """_load_ray_rows transposed to the (TM, 8) column-major block every
    selection/MT loop consumes."""
    return jnp.transpose(_load_ray_rows(rays_ref, boxes_ref, tm), (1, 0))


def _refine_winners(rays, s_slot, out_ref, fetch, *, c: int, tm: int):
    """In-kernel winner refinement: for each DISTINCT winning cluster of the
    block (coherent tiles have 1-5), fetch its (16, C) table slice and
    extract every winning ray's MT components + canonical triangle index
    with ONE one-hot MXU matmul at HIGHEST precision (exact — bf16 splits
    of 0/1; same pattern as the frame megakernel's attribute fetch,
    ops/pallas_frame.py), then recompute the exact Moller-Trumbore t/u/v in
    row-major (1, TM) layout.

    This kills the ENTIRE per-trace XLA epilogue (2 gathers + cross-product
    custom calls + refinement fusion + un-pad remap) — which DOMINATES
    small/medium traces on this backend (launch count, CLAUDE.md; measured:
    cornell-scale closest 2.44 ms vs 0.67 ms for the same kernel work with
    a bare epilogue).

    s_slot encodes the winner as (cluster << lane_bits(C)) | lane, -1 on
    miss.  fetch(cur) -> the (16, C) table slice of cluster `cur` (rows:
    v0 xyz, e1 xyz, e2 xyz, n xyz, canon, pad x3).

    out_ref rows (8, TM): 0 = exact t (F32_MAX miss), 1 = u, 2 = v,
    3 = canonical triangle index (f32, -1 miss), 4 = hit flag,
    5 = fetched/done scratch mask, 6..7 = zero."""
    SATK = jnp.int32(0x7FFFFFFF)
    lb = _lane_bits(c)
    lane_mask = jnp.int32((1 << lb) - 1)

    hit_col = s_slot >= 0                                    # (TM, 1)
    # (no i1 transposes on Mosaic: the miss/done row is built from an f32
    # transpose instead)
    hitf_row = jnp.transpose(hit_col.astype(jnp.float32), (1, 0))
    cl_r = jnp.transpose(
        jnp.where(hit_col, s_slot >> lb, SATK), (1, 0))      # (1, TM)
    ln_r = jnp.transpose(s_slot & lane_mask, (1, 0))
    rows8 = jnp.transpose(rays, (1, 0))                      # (8, TM)
    o_r = rows8[0:3, :]
    d_r = rows8[3:6, :]
    sub_c = jax.lax.broadcasted_iota(jnp.int32, (c, tm), 0)

    def crossr(a, b):
        return jnp.concatenate([
            a[1:2] * b[2:3] - a[2:3] * b[1:2],
            a[2:3] * b[0:1] - a[0:1] * b[2:3],
            a[0:1] * b[1:2] - a[1:2] * b[0:1]], axis=0)

    def dotr(a, b):
        return jnp.sum(a * b, axis=0, keepdims=True)

    zero = jnp.zeros((1, tm), jnp.float32)
    out_ref[:] = jnp.concatenate(
        [jnp.full((1, tm), 3.402823466e38, jnp.float32), zero, zero,
         jnp.full((1, tm), -1.0, jnp.float32), zero,
         1.0 - hitf_row,
         zero, zero], axis=0)

    def next_cur():
        return jnp.min(jnp.where(out_ref[5:6, :] > 0.0, SATK, cl_r),
                       axis=1, keepdims=True)[0, 0]

    def cond(cur):
        return cur < SATK

    def body(cur):
        tri = fetch(cur)                                     # (16, C)
        sel_r = cl_r == cur                                  # (1, TM)
        oh = ((sub_c == jnp.broadcast_to(ln_r, (c, tm)))
              & jnp.broadcast_to(sel_r, (c, tm))).astype(jnp.float32)
        ext = jnp.dot(tri, oh,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)    # (16, TM)
        v0 = ext[0:3]
        e1 = ext[3:6]
        e2 = ext[6:9]
        canon = ext[12:13]
        tv = o_r - v0
        pv = crossr(d_r, e2)
        det = dotr(e1, pv)
        ok = jnp.abs(det) > 1e-12
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        qv = crossr(tv, e1)
        good = sel_r & ok
        out_ref[0:1, :] = jnp.where(good, dotr(e2, qv) * inv, out_ref[0:1, :])
        out_ref[1:2, :] = jnp.where(good, dotr(tv, pv) * inv, out_ref[1:2, :])
        out_ref[2:3, :] = jnp.where(good, dotr(d_r, qv) * inv, out_ref[2:3, :])
        out_ref[3:4, :] = jnp.where(good, canon, out_ref[3:4, :])
        out_ref[4:5, :] = jnp.where(good, 1.0, out_ref[4:5, :])
        out_ref[5:6, :] = jnp.where(sel_r, 1.0, out_ref[5:6, :])
        return next_cur()

    jax.lax.while_loop(cond, body, next_cur())


def _recull_loop(rays, boxes, table_ref, hbm_refs, scr, *, c: int,
                 tm: int, k: int, recull: int, t_scr=None, ssub: int = 1,
                 xf_ref=None):
    """Selection loop in rounds of `recull` visits with PER-RAY horizon
    re-culling between rounds (see _kernel docstring).  table_ref is the
    VMEM (K, 12, C) table when hbm_refs is None, else the HBM ref with
    hbm_refs = (tbuf, sem) the double-buffered scratch.

    scr = (skb_scr (TM,1) i32, slot_scr (TM,1) i32, vis_scr (1,K) i32,
    keys_scr (1,K) i32): VMEM scratch that carries all round-crossing
    VECTOR state — the outer while carries only scalars.  (Vector values
    crossing the outer loop boundary hit a Mosaic scf.yield layout
    legalization conflict: round-start values are ref reads / fresh
    reduces, round-end values are remasked carries.)

    ssub > 1 runs the selection as `ssub` INDEPENDENT sub-blocks of
    TM/ssub rays sharing one (TM, K) cull: a sub-block's cluster union is
    far tighter than the whole tile's on scattered wavefronts (measured
    16.9 clusters per 32 rays vs 38.2 per 128 under the cluster-schedule
    sort, scripts/study_perray.py), and each visit's triangle test shrinks
    to (TM/ssub, C) rows — the same in-kernel retiling that won the frame
    megakernel's shadow pass (ops/pallas_frame.py ssub).  Selection
    machinery runs per sub-block (x ssub), so coherent camera tiles keep
    ssub=1.

    Returns (s_kb, s_slot, kb0): per-ray packed best keys, winning table
    slots (-1 = miss), and the tmax-init keys (s_kb < kb0 iff hit).  When
    t_scr (a (TM, 1) f32 VMEM scratch) is given, the loop additionally
    tracks each ray's EXACT winner t there — for callers with no XLA
    refinement epilogue (ops/pallas_route.py)."""
    skb_scr, slot_scr, vis_scr, keys_scr = scr
    SAT = jnp.int32(0x7FFFFFFF)
    inf = jnp.float32(float("inf"))
    tmax = rays[:, 7:8]
    lb = _lane_bits(c)
    cb = _lane_bits(k)
    lane_mask = jnp.int32((1 << lb) - 1)
    cmask = jnp.int32((1 << cb) - 1)
    lanes_k = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    assert tm % ssub == 0 and (tm // ssub) % 8 == 0
    sm = tm // ssub
    lanes = jax.lax.broadcasted_iota(jnp.int32, (sm, c), 1)

    en_pr_full = _cluster_enters(rays, boxes, k, tm, exact=True,
                                 keep_rows=True)

    kb0_full = (
        jax.lax.bitcast_convert_type(jnp.maximum(tmax, 0.0), jnp.int32)
        & ~lane_mask
    ) | lane_mask

    if hbm_refs is not None:
        tbuf, sem = hbm_refs
        kb_tab = table_ref.shape[0]

        def dma(idx, slot):
            if xf_ref is not None:
                idx = jax.lax.rem(idx, jnp.int32(kb_tab))
            safe = jnp.minimum(idx, kb_tab - 1)
            return pltpu.make_async_copy(
                table_ref.at[safe], tbuf.at[slot], sem.at[slot])

    if t_scr is not None:
        t_scr[:] = jnp.broadcast_to(tmax, (tm, 1))

    skb_scr[:] = kb0_full
    slot_scr[:] = jnp.full((tm, 1), -1, jnp.int32)

    for s in range(ssub):
        r0, r1 = s * sm, (s + 1) * sm
        rays_s = rays[r0:r1]
        en_pr = en_pr_full[r0:r1]
        kb0 = kb0_full[r0:r1]

        def rekeys(s_kb):
            # each ray's committed t, rounded DOWN by the lane bits the
            # packed key spends -> guard band so pruning can never drop a
            # cluster a ray could still improve on beyond the accepted blur
            t_best = jax.lax.bitcast_convert_type(
                s_kb & ~lane_mask, jnp.float32)
            t_g = t_best * (1.0 + 1e-4) + 1e-7
            en_eff = jnp.where(
                en_pr <= jnp.broadcast_to(t_g, (sm, k)), en_pr, inf)
            en_min = jnp.min(en_eff, axis=0, keepdims=True)
            return jnp.where(vis_scr[:] > 0, SAT,
                             _selection_keys(en_min, k, cb))

        vis_scr[:] = jnp.zeros((1, k), jnp.int32)
        sel0, keys0 = _next_cluster(rekeys(kb0))
        keys_scr[:] = keys0
        worst0 = jnp.max(kb0, axis=0, keepdims=True)[0, 0]

        def outer_cond(carry):
            j, sel, worst = carry
            return (sel & ~cmask) < worst

        def outer_body(carry):
            j0, sel_in, worst_in = carry
            keys_in = keys_scr[:]
            s_kb_in = skb_scr[r0:r1]
            s_slot_in = slot_scr[r0:r1]
            # depth-2 pipelining (see _kernel): the carry holds the indices
            # of the current AND next visit so each extract->dynamic-slice
            # chain gets ~two triangle bodies of slack; HBM prefetches ride
            # a TRIPLE-buffered scratch (two DMAs in flight)
            sel_b0, keys_in2 = _next_cluster(keys_in)
            if hbm_refs is not None:
                # outer_cond held, so sel_in is viable: start this chain
                dma(sel_in & cmask, jax.lax.rem(j0, 3)).start()
                dma(sel_b0 & cmask, jax.lax.rem(j0 + 1, 3)).start()

            def inner_cond(c2):
                j, sel, sel_b, keys, s_kb, worst, s_slot = c2
                return (j - j0 < recull) & ((sel & ~cmask) < worst)

            def inner_body(c2):
                j, sel, sel_b, keys, s_kb, worst, s_slot = c2
                sel2, keys2 = _next_cluster(keys)       # visit after next
                worst2 = jnp.max(s_kb, axis=0, keepdims=True)[0, 0]
                idx = sel & cmask
                vis_scr[:] = vis_scr[:] | (lanes_k == idx).astype(jnp.int32)
                if xf_ref is not None:
                    rays_v, bidx = _xform_visit(rays_s, xf_ref, idx,
                                                table_ref.shape[0], sm)
                else:
                    rays_v, bidx = rays_s, idx
                if hbm_refs is not None:
                    slot = jax.lax.rem(j, 3)
                    dma(sel2 & cmask, jax.lax.rem(j + 2, 3)).start()
                    dma(idx, slot).wait()
                    tri = tbuf[slot]
                else:
                    tri = table_ref[bidx]
                t, tri_ok = _mt_body(rays_v, tri, c, sm)
                tb = jax.lax.bitcast_convert_type(
                    jnp.where(tri_ok, jnp.maximum(t, 0.0), 3.402823466e38),
                    jnp.int32,
                )
                key = (tb & ~lane_mask) | lanes
                kmin = jnp.min(key, axis=1, keepdims=True)
                improved = kmin < s_kb
                slot_w = (idx << lb) | (kmin & lane_mask)
                if t_scr is not None:
                    win = (lanes == jnp.broadcast_to(
                        kmin & lane_mask, (sm, c))) & tri_ok
                    t_exact = jnp.min(jnp.where(win, t, 3.402823466e38),
                                      axis=1, keepdims=True)
                    t_scr[r0:r1] = jnp.where(improved, t_exact,
                                             t_scr[r0:r1])
                s_kb = jnp.where(improved, kmin, s_kb)
                s_slot = jnp.where(improved, slot_w, s_slot)
                return j + 1, sel_b, sel2, keys2, s_kb, worst2, s_slot

            j_end, _, _, _, s_kb, _, s_slot = jax.lax.while_loop(
                inner_cond, inner_body,
                (j0, sel_in, sel_b0, keys_in2, s_kb_in, worst_in, s_slot_in))

            if hbm_refs is not None:
                # drain the two outstanding prefetches of this round
                dma(jnp.int32(0), jax.lax.rem(j_end, 3)).wait()
                dma(jnp.int32(0), jax.lax.rem(j_end + 1, 3)).wait()

            skb_scr[r0:r1] = s_kb
            slot_scr[r0:r1] = s_slot
            sel3, keys3 = _next_cluster(rekeys(s_kb))
            keys_scr[:] = keys3
            worst3 = jnp.max(s_kb, axis=0, keepdims=True)[0, 0]
            return j_end, sel3, worst3

        jax.lax.while_loop(outer_cond, outer_body,
                           (jnp.int32(0), sel0, worst0))
    return skb_scr[:], slot_scr[:], kb0_full


def _next_member(mkeys):
    """Column-layout selection-sort step on (G, 1) packed member keys."""
    kv = jnp.min(mkeys, axis=0, keepdims=True)               # (1, 1)
    mkeys = jnp.where(mkeys == jnp.broadcast_to(kv, mkeys.shape),
                      jnp.int32(0x7FFFFFFF), mkeys)
    return kv[0, 0], mkeys


def _member_enters(rows8, inv_rows, tmax_row, mb, g: int, tm: int):
    """(G, TM) exact slab enters of the ray block against ONE group's member
    clusters, in the row-major (members on sublanes, rays on lanes) layout —
    every op is ~1 VREG.  rows8 = the transposed (8, TM) ray block; mb =
    (G, 8) member boxes [minx..z, maxx..z, count, pad].  +inf where a ray
    provably does not enter a member before its tmax."""
    inf = jnp.float32(float("inf"))
    B = lambda a: jnp.broadcast_to(a, (g, tm))
    en = jnp.zeros((g, tm), jnp.float32)
    ex = jnp.full((g, tm), inf)
    for ax in range(3):
        lo = B(mb[:, ax:ax + 1])
        hi = B(mb[:, 3 + ax:4 + ax])
        o = B(rows8[ax:ax + 1, :])
        iv = B(inv_rows[ax:ax + 1, :])
        t0 = (lo - o) * iv
        t1 = (hi - o) * iv
        en = jnp.maximum(en, jnp.minimum(t0, t1))
        ex = jnp.minimum(ex, jnp.maximum(t0, t1))
    exg = ex * (1.0 + 4e-7) + 1e-7                           # rounding guard
    ok = ((B(mb[:, 6:7]) > 0.0) & (en <= exg) & (exg > 0.0)
          & (en < B(tmax_row)))
    return jnp.where(ok, jnp.maximum(en, 0.0), inf)


def _grouped_recull_loop(rays, gboxes, mboxes_ref, table_ref, hbm_refs, scr,
                         xf_ref=None, kb: int = 0,
                         *, c: int, tm: int, k: int, kg: int, g: int,
                         recull: int, gcull_exact: bool = True, t_scr=None):
    """Two-level (group -> member cluster) selection loop with per-ray
    horizon re-culling at GROUP granularity.

    The flat exact cull is (TM, K) work and dominates coherent tiles
    (~2.9 us of a 7.5 us camera tile at K=735; scripts/ablate_visit_cost.py
    puts the whole per-visit machinery at ~free and the triangle test at
    ~0.35 us/visit — the cull is the remaining term).  Grouping CL_GROUP
    SAH-consecutive clusters cuts the per-ray cull and every rekeys round
    to (TM, Kg): the outer selection walks GROUPS front-to-back by exact
    per-ray group enters; each selected group refines its members with one
    (G, TM) row-major slab test (~30 single-VREG ops) and an inner
    selection visits members front-to-back with the standard dense MT
    body.  Same conservative horizon guarantees as _recull_loop: group
    enter lower-bounds member enters, the block worst is stale by at most
    one visit, and a member skipped against the current worst can never
    become viable again (worst only decreases).

    HBM mode streams ONE WHOLE GROUP per DMA (table reshaped
    (Kg, G, 16, C); (G*16, C) contiguous slice) into a double-buffered
    scratch — 8x fewer, 8x larger transfers than the flat loop.

    gcull_exact=False builds the group selection keys from the ~free
    INTERVAL group cull instead of the exact per-ray (TM, Kg) matrix and
    runs without rekeys rounds (the masked key chain persists) — the
    member gate stays exact per-ray (t_row masking), so only the group
    VISIT ORDER loosens.  For coherent camera tiles the interval group
    bound is nearly as tight as the exact union at ~zero cull cost.

    scr = (skb (TM,1), slot (TM,1), vis (1,Kg), keys (1,Kg)) i32 VMEM.

    xf_ref/kb (two-level instancing): groups are built per instance over
    the BASE cluster order (scene/geometry.py device_scene_from_instances),
    mboxes[g][0, 7] carries the group's first member's INSTANCE-cluster id
    (cid0; members are cid0..cid0+G-1), the ray block is transformed into
    the group's instance frame ONCE per group visit (_xform_visit — all
    members share it), and the table DMA/VMEM index is the BASE group
    rem(cid0, kb) // G."""
    skb_scr, slot_scr, vis_scr, keys_scr = scr
    per_ray = gcull_exact
    if not per_ray:
        recull = kg + g                    # a single round, no rekeys
    SAT = jnp.int32(0x7FFFFFFF)
    inf = jnp.float32(float("inf"))
    tmax = rays[:, 7:8]
    lb = _lane_bits(c)
    gb = _lane_bits(kg)
    mb_bits = _lane_bits(g)
    lane_mask = jnp.int32((1 << lb) - 1)
    gmask = jnp.int32((1 << gb) - 1)
    mmask = jnp.int32((1 << mb_bits) - 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tm, c), 1)
    lanes_kg = jax.lax.broadcasted_iota(jnp.int32, (1, kg), 1)
    miota = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)

    if per_ray:
        en_pr = _cluster_enters(rays, gboxes, kg, tm, exact=True,
                                keep_rows=True)
    else:
        en_blk = _cluster_enters(rays, gboxes, kg, tm, exact=False)

    # row-major ray views for the in-group member cull
    rows8 = jnp.transpose(rays, (1, 0))                      # (8, TM)
    d_rows = rows8[3:6, :]
    inv_rows = 1.0 / jnp.where(
        jnp.abs(d_rows) < 1e-12,
        jnp.where(d_rows >= 0, 1e-12, -1e-12), d_rows)
    tmax_row = rows8[7:8, :]

    kb0 = (
        jax.lax.bitcast_convert_type(jnp.maximum(tmax, 0.0), jnp.int32)
        & ~lane_mask
    ) | lane_mask

    def rekeys(s_kb):
        t_best = jax.lax.bitcast_convert_type(s_kb & ~lane_mask, jnp.float32)
        t_g = t_best * (1.0 + 1e-4) + 1e-7
        en_eff = jnp.where(en_pr <= jnp.broadcast_to(t_g, (tm, kg)),
                           en_pr, inf)
        en_min = jnp.min(en_eff, axis=0, keepdims=True)
        return jnp.where(vis_scr[:] > 0, SAT,
                         _selection_keys(en_min, kg, gb))

    if hbm_refs is not None:
        gbuf, sem = hbm_refs

        def dma(gidx, slot):
            safe = jnp.minimum(gidx, kg - 1)
            if xf_ref is not None:
                cid = jnp.round(mboxes_ref[safe][0, 7]).astype(jnp.int32)
                safe = jnp.minimum(
                    jax.lax.rem(cid, jnp.int32(kb)) // jnp.int32(g),
                    table_ref.shape[0] - 1)
            return pltpu.make_async_copy(
                table_ref.at[safe], gbuf.at[slot], sem.at[slot])

    if t_scr is not None:
        t_scr[:] = jnp.broadcast_to(tmax, (tm, 1))

    skb_scr[:] = kb0
    slot_scr[:] = jnp.full((tm, 1), -1, jnp.int32)
    vis_scr[:] = jnp.zeros((1, kg), jnp.int32)
    keys00 = (rekeys(kb0) if per_ray
              else _selection_keys(en_blk, kg, gb))
    sel0, keys0 = _next_cluster(keys00)
    keys_scr[:] = keys0
    worst0 = jnp.max(kb0, axis=0, keepdims=True)[0, 0]

    def outer_cond(carry):
        j, sel, worst = carry
        return (sel & ~gmask) < worst

    def outer_body(carry):
        j0, sel_in, worst_in = carry
        keys_in = keys_scr[:]
        s_kb_in = skb_scr[:]
        s_slot_in = slot_scr[:]
        t_in = t_scr[:] if t_scr is not None else jnp.zeros((1, 1))
        if hbm_refs is not None:
            dma(sel_in & gmask, jax.lax.rem(j0, 2)).start()

        def inner_cond(c2):
            j, sel, keys, s_kb, worst, s_slot, t_c = c2
            return (j - j0 < recull) & ((sel & ~gmask) < worst)

        def inner_body(c2):
            j, sel, keys, s_kb, worst, s_slot, t_c = c2
            sel2, keys2 = _next_cluster(keys)
            gidx = sel & gmask
            if per_ray:
                vis_scr[:] = (vis_scr[:]
                              | (lanes_kg == gidx).astype(jnp.int32))
            if hbm_refs is not None:
                slot = jax.lax.rem(j, 2)
                dma(sel2 & gmask, 1 - slot).start()
                dma(gidx, slot).wait()

            # member refinement: one (G, TM) slab test, then front-to-back
            # member visits with the standard dense MT body.  Member enters
            # are masked by each ray's CURRENT committed t (one (TM,1) ->
            # (1,TM) transpose per group visit) — without this the member
            # gate only prunes at block granularity and the extra visits
            # eat the cull saving (measured: camera 64k wash).
            mbx = mboxes_ref[gidx]                           # (G, 8)
            if xf_ref is not None:
                cid0 = jnp.round(mbx[0, 7]).astype(jnp.int32)
                rays_mt, _ = _xform_visit(
                    rays, xf_ref, jnp.minimum(cid0, k - 1), kb, tm)
            else:
                cid0 = gidx * g
                rays_mt = rays
            en_m = _member_enters(rows8, inv_rows, tmax_row, mbx, g, tm)
            t_best = jax.lax.bitcast_convert_type(
                s_kb & ~lane_mask, jnp.float32)              # (TM, 1)
            t_row = jnp.transpose(t_best, (1, 0)) * (1.0 + 1e-4) + 1e-7
            en_m = jnp.where(en_m <= jnp.broadcast_to(t_row, (g, tm)),
                             en_m, inf)
            en_col = jnp.min(en_m, axis=1, keepdims=True)    # (G, 1)
            mbits = jax.lax.bitcast_convert_type(en_col, jnp.int32)
            mkeys0 = jnp.where(
                jnp.isfinite(en_col), (mbits & ~mmask) | miota, SAT)
            msel0, mkeys1 = _next_member(mkeys0)

            def mcond(mc):
                msel, _, _, worst_m, _, _ = mc
                return (msel & ~mmask) < worst_m

            def mbody(mc):
                msel, mkeys, s_kb_m, worst_m, s_slot_m, t_m = mc
                msel2, mkeys2 = _next_member(mkeys)
                worst_m2 = jnp.max(s_kb_m, axis=0, keepdims=True)[0, 0]
                midx = msel & mmask
                idx = jnp.minimum(cid0 + midx, k - 1)
                if hbm_refs is not None:
                    tri = gbuf[slot, midx][0:12, :]
                elif xf_ref is not None:
                    tri = table_ref[jax.lax.rem(idx, jnp.int32(kb))]
                else:
                    tri = table_ref[idx]
                t, tri_ok = _mt_body(rays_mt, tri, c, tm)
                tb = jax.lax.bitcast_convert_type(
                    jnp.where(tri_ok, jnp.maximum(t, 0.0), 3.402823466e38),
                    jnp.int32,
                )
                key = (tb & ~lane_mask) | lanes
                kmin = jnp.min(key, axis=1, keepdims=True)
                improved = kmin < s_kb_m
                slot_w = (idx << lb) | (kmin & lane_mask)
                if t_scr is not None:
                    win = (lanes == jnp.broadcast_to(kmin & lane_mask,
                                                     (tm, c))) & tri_ok
                    t_exact = jnp.min(jnp.where(win, t, 3.402823466e38),
                                      axis=1, keepdims=True)
                    t_m = jnp.where(improved, t_exact, t_m)
                s_kb_m = jnp.where(improved, kmin, s_kb_m)
                s_slot_m = jnp.where(improved, slot_w, s_slot_m)
                return msel2, mkeys2, s_kb_m, worst_m2, s_slot_m, t_m

            _, _, s_kb, worst2, s_slot, t_c = jax.lax.while_loop(
                mcond, mbody, (msel0, mkeys1, s_kb, worst, s_slot, t_c))
            return j + 1, sel2, keys2, s_kb, worst2, s_slot, t_c

        j_end, _, keys_out, s_kb, _, s_slot, t_c = jax.lax.while_loop(
            inner_cond, inner_body,
            (j0, sel_in, keys_in, s_kb_in, worst_in, s_slot_in, t_in))

        if hbm_refs is not None:
            dma(jnp.int32(0), jax.lax.rem(j_end, 2)).wait()

        skb_scr[:] = s_kb
        slot_scr[:] = s_slot
        if t_scr is not None:
            t_scr[:] = t_c
        sel3, keys3 = _next_cluster(rekeys(s_kb) if per_ray else keys_out)
        keys_scr[:] = keys3
        worst3 = jnp.max(s_kb, axis=0, keepdims=True)[0, 0]
        return j_end, sel3, worst3

    jax.lax.while_loop(outer_cond, outer_body,
                       (jnp.int32(0), sel0, worst0))
    return skb_scr[:], slot_scr[:], kb0


def _occl_recull_loop(rays, boxes, table_ref, hbm_refs, scr, *, c: int,
                      tm: int, k: int, recull: int, xf_ref=None):
    """Any-hit selection loop in rounds of `recull` visits with per-ray
    RE-CULLING of settled (occluded) rays between rounds.

    The plain any-hit kernels build their selection keys ONCE from the
    block-min enter distances of every ray — so as long as ONE ray stays
    open within the horizon, the block keeps visiting the union of ALL 128
    rays' clusters, even though most rays occlude within their first visit
    or two (dense-scene NEE shadow storms: measured 24 ms per 256k-shadow
    bounce on the 65k soup frame).  Re-masking the (TM, K) per-ray enter
    matrix against the CURRENT occlusion mask every `recull` visits drops
    every cluster that only still-settled rays wanted.

    scr = (occ_scr (TM,1) i32, vis_scr (1,K) i32, keys_scr (1,K) i32):
    round-crossing vector state lives in VMEM scratch — the outer while
    carries only scalars (Mosaic scf.yield layout constraint, see
    _recull_loop).  Returns the (TM, 1) i32 occlusion mask."""
    occ_scr, vis_scr, keys_scr = scr
    SAT = jnp.int32(0x7FFFFFFF)
    inf = jnp.float32(float("inf"))
    tmax = rays[:, 7:8]
    cb = _lane_bits(k)
    cmask = jnp.int32((1 << cb) - 1)
    lanes_k = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    en_pr = _cluster_enters(rays, boxes, k, tm, exact=True, keep_rows=True)
    tmax_bits = jax.lax.bitcast_convert_type(jnp.maximum(tmax, 0.0), jnp.int32)

    def rekeys(occ):
        en_eff = jnp.where(jnp.broadcast_to(occ > 0, (tm, k)), inf, en_pr)
        en_min = jnp.min(en_eff, axis=0, keepdims=True)
        return jnp.where(vis_scr[:] > 0, SAT, _selection_keys(en_min, k, cb))

    if hbm_refs is not None:
        tbuf, sem = hbm_refs
        kb_tab = table_ref.shape[0]

        def dma(idx, slot):
            if xf_ref is not None:
                idx = jax.lax.rem(idx, jnp.int32(kb_tab))
            safe = jnp.minimum(idx, kb_tab - 1)
            return pltpu.make_async_copy(
                table_ref.at[safe], tbuf.at[slot], sem.at[slot])

    occ0 = jnp.zeros((tm, 1), jnp.int32)
    occ_scr[:] = occ0
    vis_scr[:] = jnp.zeros((1, k), jnp.int32)
    sel0, keys0 = _next_cluster(rekeys(occ0))
    keys_scr[:] = keys0
    worst0 = jnp.max(tmax_bits, axis=0, keepdims=True)[0, 0]

    def outer_cond(carry):
        j, sel, worst = carry
        return (sel & ~cmask) < worst

    def outer_body(carry):
        j0, sel_in, worst_in = carry
        keys_in = keys_scr[:]
        occ_in = occ_scr[:]
        # depth-2 pipelining + triple-buffered HBM prefetch (see
        # _recull_loop)
        sel_b0, keys_in2 = _next_cluster(keys_in)
        if hbm_refs is not None:
            dma(sel_in & cmask, jax.lax.rem(j0, 3)).start()
            dma(sel_b0 & cmask, jax.lax.rem(j0 + 1, 3)).start()

        def inner_cond(c2):
            j, sel, sel_b, keys, occ, worst = c2
            return (j - j0 < recull) & ((sel & ~cmask) < worst)

        def inner_body(c2):
            j, sel, sel_b, keys, occ, _ = c2
            sel2, keys2 = _next_cluster(keys)       # visit after next
            worst2 = jnp.max(
                jnp.where(occ > 0, 0, tmax_bits), axis=0, keepdims=True
            )[0, 0]
            idx = sel & cmask
            vis_scr[:] = vis_scr[:] | (lanes_k == idx).astype(jnp.int32)
            if xf_ref is not None:
                rays_v, bidx = _xform_visit(rays, xf_ref, idx,
                                            table_ref.shape[0], tm)
            else:
                rays_v, bidx = rays, idx
            if hbm_refs is not None:
                slot = jax.lax.rem(j, 3)
                dma(sel2 & cmask, jax.lax.rem(j + 2, 3)).start()
                dma(idx, slot).wait()
                tri = tbuf[slot]
            else:
                tri = table_ref[bidx]
            t, tri_ok = _mt_body(rays_v, tri, c, tm)
            tri_ok = tri_ok & (t < jnp.broadcast_to(tmax, t.shape))
            hit = jnp.max(jnp.where(tri_ok, 1, 0), axis=1, keepdims=True)
            occ = jnp.maximum(occ, hit)
            return j + 1, sel_b, sel2, keys2, occ, worst2

        j_end, _, _, _, occ, _ = jax.lax.while_loop(
            inner_cond, inner_body,
            (j0, sel_in, sel_b0, keys_in2, occ_in, worst_in))

        if hbm_refs is not None:
            dma(jnp.int32(0), jax.lax.rem(j_end, 3)).wait()
            dma(jnp.int32(0), jax.lax.rem(j_end + 1, 3)).wait()

        occ_scr[:] = occ
        # re-keys: occluded rays' enter rows masked out, visited clusters
        # excluded (vis_scr) so nothing is ever processed twice
        sel3, keys3 = _next_cluster(rekeys(occ))
        keys_scr[:] = keys3
        worst3 = jnp.max(
            jnp.where(occ > 0, 0, tmax_bits), axis=0, keepdims=True
        )[0, 0]
        return j_end, sel3, worst3

    jax.lax.while_loop(outer_cond, outer_body, (jnp.int32(0), sel0, worst0))
    return occ_scr[:]


def _grouped_occl_loop(rays, gboxes, mboxes_ref, table_ref, hbm_refs, scr,
                       xf_ref=None, kb: int = 0,
                       *, c: int, tm: int, k: int, kg: int, g: int,
                       recull: int):
    """Any-hit variant of _grouped_recull_loop: two-level group -> member
    selection with per-ray OCCLUSION re-culling at group granularity.
    Returns the (TM, 1) i32 occlusion mask.

    scr = (occ (TM,1), vis (1,Kg), keys (1,Kg)) i32 VMEM."""
    occ_scr, vis_scr, keys_scr = scr
    SAT = jnp.int32(0x7FFFFFFF)
    inf = jnp.float32(float("inf"))
    tmax = rays[:, 7:8]
    gb = _lane_bits(kg)
    mb_bits = _lane_bits(g)
    gmask = jnp.int32((1 << gb) - 1)
    mmask = jnp.int32((1 << mb_bits) - 1)
    lanes_kg = jax.lax.broadcasted_iota(jnp.int32, (1, kg), 1)
    miota = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)

    en_pr = _cluster_enters(rays, gboxes, kg, tm, exact=True, keep_rows=True)
    rows8 = jnp.transpose(rays, (1, 0))
    d_rows = rows8[3:6, :]
    inv_rows = 1.0 / jnp.where(
        jnp.abs(d_rows) < 1e-12,
        jnp.where(d_rows >= 0, 1e-12, -1e-12), d_rows)
    tmax_row = rows8[7:8, :]
    tmax_bits = jax.lax.bitcast_convert_type(jnp.maximum(tmax, 0.0), jnp.int32)

    def rekeys(occ):
        en_eff = jnp.where(jnp.broadcast_to(occ > 0, (tm, kg)), inf, en_pr)
        en_min = jnp.min(en_eff, axis=0, keepdims=True)
        return jnp.where(vis_scr[:] > 0, SAT,
                         _selection_keys(en_min, kg, gb))

    if hbm_refs is not None:
        gbuf, sem = hbm_refs

        def dma(gidx, slot):
            safe = jnp.minimum(gidx, kg - 1)
            if xf_ref is not None:
                cid = jnp.round(mboxes_ref[safe][0, 7]).astype(jnp.int32)
                safe = jnp.minimum(
                    jax.lax.rem(cid, jnp.int32(kb)) // jnp.int32(g),
                    table_ref.shape[0] - 1)
            return pltpu.make_async_copy(
                table_ref.at[safe], gbuf.at[slot], sem.at[slot])

    occ0 = jnp.zeros((tm, 1), jnp.int32)
    occ_scr[:] = occ0
    vis_scr[:] = jnp.zeros((1, kg), jnp.int32)
    sel0, keys0 = _next_cluster(rekeys(occ0))
    keys_scr[:] = keys0
    worst0 = jnp.max(tmax_bits, axis=0, keepdims=True)[0, 0]

    def outer_cond(carry):
        j, sel, worst = carry
        return (sel & ~gmask) < worst

    def outer_body(carry):
        j0, sel_in, worst_in = carry
        keys_in = keys_scr[:]
        occ_in = occ_scr[:]
        if hbm_refs is not None:
            dma(sel_in & gmask, jax.lax.rem(j0, 2)).start()

        def inner_cond(c2):
            j, sel, keys, occ, worst = c2
            return (j - j0 < recull) & ((sel & ~gmask) < worst)

        def inner_body(c2):
            j, sel, keys, occ, worst = c2
            sel2, keys2 = _next_cluster(keys)
            gidx = sel & gmask
            vis_scr[:] = vis_scr[:] | (lanes_kg == gidx).astype(jnp.int32)
            if hbm_refs is not None:
                slot = jax.lax.rem(j, 2)
                dma(sel2 & gmask, 1 - slot).start()
                dma(gidx, slot).wait()

            mbx = mboxes_ref[gidx]                           # (G, 8)
            if xf_ref is not None:
                cid0 = jnp.round(mbx[0, 7]).astype(jnp.int32)
                rays_mt, _ = _xform_visit(
                    rays, xf_ref, jnp.minimum(cid0, k - 1), kb, tm)
            else:
                cid0 = gidx * g
                rays_mt = rays
            en_m = _member_enters(rows8, inv_rows, tmax_row, mbx, g, tm)
            # mask already-occluded rays out of the member gate (the
            # any-hit analogue of the per-ray t-row masking above)
            occ_row = jnp.transpose(occ, (1, 0))             # (1, TM)
            en_m = jnp.where(jnp.broadcast_to(occ_row > 0, (g, tm)),
                             inf, en_m)
            en_col = jnp.min(en_m, axis=1, keepdims=True)
            mbits2 = jax.lax.bitcast_convert_type(en_col, jnp.int32)
            mkeys0 = jnp.where(
                jnp.isfinite(en_col), (mbits2 & ~mmask) | miota, SAT)
            msel0, mkeys1 = _next_member(mkeys0)

            def mcond(mc):
                msel, _, _, worst_m = mc
                return (msel & ~mmask) < worst_m

            def mbody(mc):
                msel, mkeys, occ_m, _ = mc
                msel2, mkeys2 = _next_member(mkeys)
                worst_m2 = jnp.max(
                    jnp.where(occ_m > 0, 0, tmax_bits), axis=0, keepdims=True
                )[0, 0]
                midx = msel & mmask
                idx = jnp.minimum(cid0 + midx, k - 1)
                if hbm_refs is not None:
                    tri = gbuf[slot, midx][0:12, :]
                elif xf_ref is not None:
                    tri = table_ref[jax.lax.rem(idx, jnp.int32(kb))]
                else:
                    tri = table_ref[idx]
                t, tri_ok = _mt_body(rays_mt, tri, c, tm)
                tri_ok = tri_ok & (t < jnp.broadcast_to(tmax, t.shape))
                hit = jnp.max(jnp.where(tri_ok, 1, 0), axis=1, keepdims=True)
                occ_m = jnp.maximum(occ_m, hit)
                return msel2, mkeys2, occ_m, worst_m2

            _, _, occ, worst2 = jax.lax.while_loop(
                mcond, mbody, (msel0, mkeys1, occ, worst))
            return j + 1, sel2, keys2, occ, worst2

        j_end, _, _, occ, _ = jax.lax.while_loop(
            inner_cond, inner_body,
            (j0, sel_in, keys_in, occ_in, worst_in))

        if hbm_refs is not None:
            dma(jnp.int32(0), jax.lax.rem(j_end, 2)).wait()

        occ_scr[:] = occ
        sel3, keys3 = _next_cluster(rekeys(occ))
        keys_scr[:] = keys3
        worst3 = jnp.max(
            jnp.where(occ > 0, 0, tmax_bits), axis=0, keepdims=True
        )[0, 0]
        return j_end, sel3, worst3

    jax.lax.while_loop(outer_cond, outer_body, (jnp.int32(0), sel0, worst0))
    return occ_scr[:]


def _occl_kernel_grouped(rays_ref, gboxes_ref, mboxes_ref, table_ref,
                         *rest, c: int, tm: int, k: int, kg: int,
                         g: int, recull: int, instanced: bool = False,
                         kb: int = 0):
    """Any-hit via the two-level grouped loop (VMEM table)."""
    if instanced:
        xf_ref, out_ref, *scr = rest
    else:
        xf_ref = None
        out_ref, *scr = rest
    occ = _grouped_occl_loop(_load_rays(rays_ref, gboxes_ref, tm),
                             gboxes_ref[:], mboxes_ref,
                             table_ref, None, scr, xf_ref, kb,
                             c=c, tm=tm, k=k, kg=kg,
                             g=g, recull=recull)
    out_ref[:, 0:1] = occ.astype(jnp.float32)


def _occl_kernel_grouped_hbm(rays_ref, gboxes_ref, mboxes_ref, table_hbm,
                             *rest, c: int, tm: int,
                             k: int, kg: int, g: int, recull: int,
                             instanced: bool = False, kb: int = 0):
    """Any-hit grouped loop with whole-group HBM streaming."""
    if instanced:
        xf_ref, out_ref, gbuf, sem, *scr = rest
    else:
        xf_ref = None
        out_ref, gbuf, sem, *scr = rest
    occ = _grouped_occl_loop(_load_rays(rays_ref, gboxes_ref, tm),
                             gboxes_ref[:], mboxes_ref,
                             table_hbm, (gbuf, sem), scr, xf_ref, kb,
                             c=c, tm=tm, k=k,
                             kg=kg, g=g, recull=recull)
    out_ref[:, 0:1] = occ.astype(jnp.float32)


# scenes with at most this many clusters take the straight-line kernels
# below: no cull, no selection sort, no while_loop.  Measured on the cornell
# headline config (K=1, C=128, tm=512): the selection/cull machinery costs
# +0.23 ms per 64k wavefront on top of a 0.60 ms load+MT+refine floor
# (scripts/ablate_cornell_step.py) — pure waste when every cluster is
# visited anyway.  Unconditional visits cost ~0.56 ms per cluster per 64k
# wavefront, so the break-even vs culled selection is ~K<=2..4.
TINY_K = 4


def _kernel_tiny(rays_ref, boxes_ref, table_ref, out_ref, *, c: int,
                 tm: int, k: int, rich: bool = False):
    """Closest hit for tiny scenes (k <= TINY_K): visit EVERY cluster in a
    statically unrolled straight line.  Correctness needs no cull: padding
    triangles have n = 0 -> det = 0 -> rejected, the tmax test rides the
    packed-key init, inactive rays carry tmin = +inf.  The headline
    cornell trace (bench.py) runs here: 0.79 -> 0.61 ms per 64k wavefront."""
    rays = _load_rays(rays_ref, boxes_ref, tm)
    tmax = rays[:, 7:8]
    lb = _lane_bits(c)
    lane_mask = jnp.int32((1 << lb) - 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tm, c), 1)

    s_kb = (
        jax.lax.bitcast_convert_type(jnp.maximum(tmax, 0.0), jnp.int32)
        & ~lane_mask
    ) | lane_mask
    s_slot = jnp.full((tm, 1), -1, jnp.int32)
    for idx in range(k):
        t, tri_ok = _mt_body(rays, table_ref[idx], c, tm)
        tb = jax.lax.bitcast_convert_type(
            jnp.where(tri_ok, jnp.maximum(t, 0.0), 3.402823466e38), jnp.int32)
        key = (tb & ~lane_mask) | lanes
        kmin = jnp.min(key, axis=1, keepdims=True)
        improved = kmin < s_kb
        s_kb = jnp.where(improved, kmin, s_kb)
        s_slot = jnp.where(improved, (idx << lb) | (kmin & lane_mask), s_slot)
    if rich:
        _refine_winners(rays, s_slot, out_ref,
                        lambda cur: table_ref[cur], c=c, tm=tm)
        return
    out_ref[:, 0:1] = jax.lax.bitcast_convert_type(
        s_kb & ~lane_mask, jnp.float32)
    out_ref[:, 1:2] = jax.lax.bitcast_convert_type(
        s_slot, jnp.float32)  # BITCAST, not astype: slots (cluster<<lb)|lane
    # exceed 2^24 at K*c > 16M and f32 rounding then decodes the WRONG
    # winner (measured: false closer hits at 64x512k instanced, c=2048)


def _occl_kernel_tiny(rays_ref, boxes_ref, table_ref, out_ref, *, c: int,
                      tm: int, k: int):
    """Any-hit for tiny scenes: statically unrolled unconditional visits."""
    rays = _load_rays(rays_ref, boxes_ref, tm)
    tmax = rays[:, 7:8]
    occ = jnp.zeros((tm, 1), jnp.int32)
    for idx in range(k):
        t, tri_ok = _mt_body(rays, table_ref[idx], c, tm)
        tri_ok = tri_ok & (t < jnp.broadcast_to(tmax, t.shape))
        occ = jnp.maximum(occ, jnp.max(jnp.where(tri_ok, 1, 0),
                                       axis=1, keepdims=True))
    out_ref[:, 0:1] = occ.astype(jnp.float32)


def _sched_kernel(rays_ref, boxes_ref, out_ref, *, k: int, tm: int):
    """Schedule-key prepass: each ray's FIRST and SECOND entered cluster
    (by exact front-to-back slab enter distance), packed into one sortable
    i32 key = (first << 12) | second.

    Why: incoherent (bounce/migrated) wavefronts sorted by origin-morton
    still union ~60 clusters per 128-ray tile while each ray NEEDS only
    ~2.15 visits (scripts/study_perray.py).  Sorting by the rays' own
    front-to-back cluster ids instead puts rays that want the same tables
    in the same tile: measured union 59.7 -> 38.2 at TM=128, and it keeps
    falling with smaller tiles (16.9 at TM=32) because the key aligns the
    VISIT ORDER, not just the origin cell.  The reference has no analogue
    (per-thread OptiX traversal needs no wavefront coherence); this is the
    TPU-native substitute for per-ray scheduling.

    Saturated keys (no entered cluster, or inactive rays: tmax = 0 kills
    every slab test) sort to the end, exactly like the morton path's
    0xFFFFFFFF."""
    rays = _load_rays(rays_ref, boxes_ref, tm)
    boxes = boxes_ref[:]
    en = _cluster_enters(rays, boxes, k, tm, exact=True, keep_rows=True)
    cb = 12
    cmask = jnp.int32((1 << cb) - 1)
    lanes_k = jax.lax.broadcasted_iota(jnp.int32, (tm, k), 1)
    inf_bits = jnp.int32(0x7F800000)

    def min_key(en):
        bits = jax.lax.bitcast_convert_type(en, jnp.int32)
        key = jnp.where(jnp.isfinite(en), (bits & ~cmask) | lanes_k,
                        jnp.int32(0x7FFFFFFF))
        return jnp.min(key, axis=1, keepdims=True)          # (TM, 1)

    k1 = min_key(en)
    first = jnp.where(k1 < inf_bits, k1 & cmask, cmask)
    en2 = jnp.where(lanes_k == jnp.broadcast_to(first, (tm, k)),
                    jnp.float32(float("inf")), en)
    k2 = min_key(en2)
    second = jnp.where(k2 < inf_bits, k2 & cmask, cmask)
    out_ref[:, 0:1] = (first << cb) | second


def schedule_keys(boxes, rays_packed, tm: int = 256, interpret: bool = None):
    """(8, K) cluster boxes + (8, mp) packed rays -> (mp,) i32 cluster-
    schedule sort keys (see _sched_kernel).  Requires k < 4096 and an
    affordable (tm, k) cull matrix — callers fall back to the morton key
    otherwise."""
    mp = rays_packed.shape[1]
    k = boxes.shape[1]
    if mp % tm:
        tm = 128 if mp % 128 == 0 else 32
    while tm * k * 4 > 4 * 2**20 and tm > 32:
        tm //= 2
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    (keys,) = pl.pallas_call(
        partial(_sched_kernel, k=k, tm=tm),
        grid=(mp // tm,),
        in_specs=[pl.BlockSpec((8, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((mp, 1), jnp.int32)],
        interpret=interpret,
    )(rays_packed, boxes)
    return keys[:, 0]


def _mt_body_t(rows8, tri_t, ct: int, tm: int):
    """TRANSPOSED dense Moller-Trumbore: triangles in SUBLANES (ct rows),
    rays in LANES — the layout for single-cluster scenes where the whole
    scene's triangles fit the sublane dim.  Same math as _mt_body (m = s x d
    triple products), but the work matrix is (CT, TM) with CT = the scene's
    real (8-padded) triangle count instead of (TM, C) with C = the 128-lane
    cluster width: at cornell scale (36 tris -> CT=40 vs C=128) that is
    ~3.2x less VPU work, and every stage stays in the fast row-major layout
    (no column state, no load transpose — see the frame-kernel lesson,
    CLAUDE.md).  rows8: the (8, TM) capped ray rows; tri_t: (CT, 16)
    per-triangle component columns (v0 xyz, e1, e2, n = e1 x e2, canon at
    12; padding rows all-zero -> n = 0 -> det = 0 -> rejected).

    Returns ((CT, TM) f32 t, (CT, TM) bool accept)."""
    B = lambda a: jnp.broadcast_to(a, (ct, tm))
    comp = lambda q: B(tri_t[:, q:q + 1])
    ray = lambda r: B(rows8[r:r + 1, :])
    v0x, v0y, v0z = comp(0), comp(1), comp(2)
    e1x, e1y, e1z = comp(3), comp(4), comp(5)
    e2x, e2y, e2z = comp(6), comp(7), comp(8)
    nx, ny, nz = comp(9), comp(10), comp(11)

    rdx, rdy, rdz = ray(3), ray(4), ray(5)
    sx = ray(0) - v0x
    sy = ray(1) - v0y
    sz = ray(2) - v0z
    mx = sy * rdz - sz * rdy
    my = sz * rdx - sx * rdz
    mz = sx * rdy - sy * rdx
    det = -(rdx * nx + rdy * ny + rdz * nz)
    u = e2x * mx + e2y * my + e2z * mz
    v = -(e1x * mx + e1y * my + e1z * mz)
    t_raw = nx * sx + ny * sy + nz * sz

    adet = jnp.abs(det)
    ok = adet > 1e-12
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    t = t_raw * inv_det
    neg = det < 0.0
    su = jnp.where(neg, -u, u)
    sv = jnp.where(neg, -v, v)
    tri_ok = (
        ok
        & (su >= 0.0)
        & (sv >= 0.0)
        & (su + sv <= adet)
        & (t > ray(6))
    )
    return t, tri_ok


def _kernel_tiny_t(rays_ref, boxes_ref, table_ref, out_ref, *, ct: int,
                   tm: int):
    """Closest hit for small scenes, fully row-major: one transposed MT
    visit over the whole (CT, TM) concatenated-triangle table, per-ray min
    over the sublane (triangle) dim, then a loop-free one-hot MXU
    refinement (the per-distinct-cluster while_loop of _refine_winners
    degenerates to exactly one body here).  Replaces the straight-line
    (TM, C) kernels below TINY_T_ROWS triangles: those padded cornell's 36
    triangles to 128 MT lanes AND paid a (TM, 8) load transpose +
    column-major selection (headline: 0.55 -> 0.049 ms per 64k wavefront).

    ALWAYS rich: the winner slot is a row of the concatenated valid-
    triangle table, which the shared classic epilogue's cluster-major
    decode cannot interpret — and the refine here is one matmul, so the
    classic form has no upside either."""
    rows8 = _load_ray_rows(rays_ref, boxes_ref, tm)
    tri_t = table_ref[:]
    tmax_r = rows8[7:8, :]
    t, tri_ok = _mt_body_t(rows8, tri_t, ct, tm)

    tb = _lane_bits(ct)
    tmask = jnp.int32((1 << tb) - 1)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (ct, tm), 0)
    keys = (jax.lax.bitcast_convert_type(
        jnp.where(tri_ok, jnp.maximum(t, 0.0), 3.402823466e38), jnp.int32)
        & ~tmask) | rows_i
    kmin = jnp.min(keys, axis=0, keepdims=True)              # (1, TM)
    init = (jax.lax.bitcast_convert_type(
        jnp.maximum(tmax_r, 0.0), jnp.int32) & ~tmask) | tmask
    hit_r = kmin < init                                      # (1, TM)
    win_r = kmin & tmask                                     # (1, TM)

    # one-hot MXU extraction of the winner rows at HIGHEST (exact), then
    # the exact MT recompute — all in (., TM) rows; output contract
    # identical to _refine_winners (out rows: t, u, v, canon, hit, done,
    # 0, 0)
    oh = ((rows_i == jnp.broadcast_to(win_r, (ct, tm)))
          & jnp.broadcast_to(hit_r, (ct, tm))).astype(jnp.float32)
    ext = jax.lax.dot_general(
        tri_t, oh, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                  # (16, TM)

    def crossr(a, b):
        return jnp.concatenate([
            a[1:2] * b[2:3] - a[2:3] * b[1:2],
            a[2:3] * b[0:1] - a[0:1] * b[2:3],
            a[0:1] * b[1:2] - a[1:2] * b[0:1]], axis=0)

    def dotr(a, b):
        return jnp.sum(a * b, axis=0, keepdims=True)

    v0 = ext[0:3]
    e1 = ext[3:6]
    e2 = ext[6:9]
    canon = ext[12:13]
    o_r = rows8[0:3, :]
    d_r = rows8[3:6, :]
    tv = o_r - v0
    pv = crossr(d_r, e2)
    det = dotr(e1, pv)
    ok = jnp.abs(det) > 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    qv = crossr(tv, e1)
    good = hit_r & ok
    zero = jnp.zeros((1, tm), jnp.float32)
    out_ref[:] = jnp.concatenate([
        jnp.where(good, dotr(e2, qv) * inv,
                  jnp.full((1, tm), 3.402823466e38, jnp.float32)),
        jnp.where(good, dotr(tv, pv) * inv, zero),
        jnp.where(good, dotr(d_r, qv) * inv, zero),
        jnp.where(good, canon, jnp.full((1, tm), -1.0, jnp.float32)),
        jnp.where(good, 1.0, zero),
        jnp.ones((1, tm), jnp.float32),
        zero, zero], axis=0)


def _occl_kernel_tiny_t(rays_ref, boxes_ref, table_ref, out_ref, *, ct: int,
                        tm: int):
    """Any-hit for small scenes: one transposed MT visit, max over the
    sublane (triangle) dim."""
    rows8 = _load_ray_rows(rays_ref, boxes_ref, tm)
    t, tri_ok = _mt_body_t(rows8, table_ref[:], ct, tm)
    tri_ok = tri_ok & (t < jnp.broadcast_to(rows8[7:8, :], t.shape))
    occ = jnp.max(jnp.where(tri_ok, 1.0, 0.0), axis=0, keepdims=True)
    out_ref[:] = jnp.transpose(occ, (1, 0))


def _kernel(rays_ref, boxes_ref, table_ref, *rest, c: int, tm: int,
            k: int, exact: bool, recull: int = 0, rich: bool = False,
            ssub: int = 1, instanced: bool = False):
    """Closest hit over one ray block.  Carries the per-ray best as a packed
    (t_bits | lane) key; out = [t_approx, table_slot] per ray, or the
    refined row-major record (_refine_winners) when rich=True.

    recull > 0 (exact mode only): PER-RAY horizon.  The block-min selection
    keys prune a cluster only when NO ray's committed t allows it — but the
    block min is pinned by the slowest ray, so the loop visits ~U_all
    clusters (measured 250+/tile on sorted-incoherent wavefronts) where the
    per-ray union U is ~57 (scripts/study_sort_keys.py).  With recull=R the
    loop runs in rounds: every R visits the (TM, K) per-ray enter matrix is
    re-masked against each ray's CURRENT committed t (+ a rounding guard for
    the lane bits the packed key spends) and re-min-reduced, so clusters no
    live ray can improve on drop out of the selection.

    instanced: an extra (I, 1, 16) per-instance cl_xf input follows the table — each
    visit transforms the ray block into the cluster's object space and
    fetches the cluster's BASE table slice (_xform_visit)."""
    if instanced:
        xf_ref, out_ref, *scr = rest
    else:
        xf_ref = None
        out_ref, *scr = rest
    rays = _load_rays(rays_ref, boxes_ref, tm)
    tmax = rays[:, 7:8]

    lb = _lane_bits(c)
    cb = _lane_bits(k)
    lane_mask = jnp.int32((1 << lb) - 1)
    cmask = jnp.int32((1 << cb) - 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tm, c), 1)

    if recull and exact:
        s_kb, s_slot, _ = _recull_loop(rays, boxes_ref[:], table_ref, None,
                                       scr, c=c, tm=tm, k=k, recull=recull,
                                       ssub=ssub, xf_ref=xf_ref)
        if rich:
            _refine_winners(rays, s_slot, out_ref,
                            lambda cur: table_ref[cur], c=c, tm=tm)
            return
        lb = _lane_bits(c)
        lane_mask = jnp.int32((1 << lb) - 1)
        out_ref[:, 0:1] = jax.lax.bitcast_convert_type(
            s_kb & ~lane_mask, jnp.float32)
        out_ref[:, 1:2] = jax.lax.bitcast_convert_type(
        s_slot, jnp.float32)  # BITCAST, not astype: slots (cluster<<lb)|lane
    # exceed 2^24 at K*c > 16M and f32 rounding then decodes the WRONG
    # winner (measured: false closer hits at 64x512k instanced, c=2048)
        return

    en0 = _cluster_enters(rays, boxes_ref[:], k, tm, exact=exact)
    keys0 = _selection_keys(en0, k, cb)
    # init: key = bits(tmax) with lane bits saturated (monotone upper bound —
    # any accepted hit with t < tmax beats it); slot = -1 (miss)
    kb0 = (
        jax.lax.bitcast_convert_type(jnp.maximum(tmax, 0.0), jnp.int32)
        & ~lane_mask
    ) | lane_mask
    worst0 = jnp.max(kb0, axis=0, keepdims=True)[0, 0]
    sel0, keys1 = _next_cluster(keys0)
    sel1, keys2_init = _next_cluster(keys1)

    # Software pipelining, DEPTH 2: the dominant per-visit overhead is the
    # dependent chain vector-min -> scalar extract -> dynamic VMEM slice
    # address (measured ~0.9 us/visit vs ~0.6 us for the triangle test:
    # scripts/ablate_visit_cost.py).  The carry therefore holds the indices
    # of the CURRENT visit and the next one, and the body extracts the
    # visit-after-next — every extract gets ~two triangle-test bodies of
    # slack before its address is consumed.  The horizon stays stale by
    # one (stale worst is only larger -> conservative, never skips a
    # viable cluster); termination checks the actually-visited index, so
    # the lookahead adds NO extra visits.
    def cond(carry):
        sel, _, _, _, worst, _ = carry
        return (sel & ~cmask) < worst

    def body(carry):
        sel, sel_b, keys, s_kb, worst, s_slot = carry
        sel2, keys2 = _next_cluster(keys)         # for the visit after next
        worst2 = jnp.max(s_kb, axis=0, keepdims=True)[0, 0]  # stale by one
        idx = sel & cmask
        if xf_ref is not None:
            rays_v, bidx = _xform_visit(rays, xf_ref, idx,
                                        table_ref.shape[0], tm)
        else:
            rays_v, bidx = rays, idx
        tri = table_ref[bidx]                        # (12, C) resident slice
        t, tri_ok = _mt_body(rays_v, tri, c, tm)

        # packed argmin: positive-float bits are monotone; the t-vs-running-
        # best and t-vs-tmax tests ride the key comparison (s_kb started at
        # bits(tmax)); low mantissa bits lost to the lane field only blur
        # ties within 2^-(23-lb) relative t — either winner is a valid hit
        tb = jax.lax.bitcast_convert_type(
            jnp.where(tri_ok, jnp.maximum(t, 0.0), 3.402823466e38), jnp.int32
        )
        key = (tb & ~lane_mask) | lanes
        kmin = jnp.min(key, axis=1, keepdims=True)   # (TM, 1)
        improved = kmin < s_kb
        slot_w = (idx << lb) | (kmin & lane_mask)
        s_kb = jnp.where(improved, kmin, s_kb)
        s_slot = jnp.where(improved, slot_w, s_slot)
        return sel_b, sel2, keys2, s_kb, worst2, s_slot

    _, _, _, s_kb, _, s_slot = jax.lax.while_loop(
        cond, body,
        (sel0, sel1, keys2_init, kb0, worst0,
         jnp.full((tm, 1), -1, jnp.int32)),
    )
    if rich:
        _refine_winners(rays, s_slot, out_ref,
                        lambda cur: table_ref[cur], c=c, tm=tm)
        return
    t_approx = jax.lax.bitcast_convert_type(s_kb & ~lane_mask, jnp.float32)
    out_ref[:, 0:1] = t_approx
    out_ref[:, 1:2] = jax.lax.bitcast_convert_type(
        s_slot, jnp.float32)  # BITCAST, not astype: slots (cluster<<lb)|lane
    # exceed 2^24 at K*c > 16M and f32 rounding then decodes the WRONG
    # winner (measured: false closer hits at 64x512k instanced, c=2048)


def _kernel_hbm(rays_ref, boxes_ref, table_hbm, *rest,
                c: int, tm: int, k: int, exact: bool, recull: int = 0,
                rich: bool = False, ssub: int = 1, instanced: bool = False):
    """Closest hit with the cluster table in HBM (scenes too big for a
    VMEM-resident table).  Same in-kernel selection dispatch as _kernel; the
    one-iteration lookahead that software-pipelines the selection extracts
    also provides the NEXT cluster index early, so its (12, C) slice is
    DMA'd into a triple-buffered VMEM scratch while the current cluster's
    triangle test runs (depth-2 lookahead -> two prefetches in flight) —
    the DMA latency hides under the VPU body.

    Semaphore hygiene: every iteration starts exactly one prefetch and
    waits exactly one; the two outstanding prefetches are drained after
    the loop (scratch and semaphores persist across sequential grid
    steps).

    recull > 0 (exact mode only): per-ray horizon rounds — see _kernel."""
    if instanced:
        xf_ref, out_ref, tbuf, sem, *scr = rest
    else:
        xf_ref = None
        out_ref, tbuf, sem, *scr = rest
    rays = _load_rays(rays_ref, boxes_ref, tm)
    tmax = rays[:, 7:8]
    kb_tab = table_hbm.shape[0]

    def fetch_hbm(cur):
        cp = pltpu.make_async_copy(
            table_hbm.at[jnp.minimum(cur, kb_tab - 1)], tbuf.at[0],
            sem.at[0])
        cp.start()
        cp.wait()
        return tbuf[0]

    if recull and exact:
        s_kb, s_slot, _ = _recull_loop(rays, boxes_ref[:], table_hbm,
                                       (tbuf, sem), scr, c=c, tm=tm, k=k,
                                       recull=recull, ssub=ssub,
                                       xf_ref=xf_ref)
        if rich:
            _refine_winners(rays, s_slot, out_ref, fetch_hbm, c=c, tm=tm)
            return
        lb = _lane_bits(c)
        lane_mask = jnp.int32((1 << lb) - 1)
        out_ref[:, 0:1] = jax.lax.bitcast_convert_type(
            s_kb & ~lane_mask, jnp.float32)
        out_ref[:, 1:2] = jax.lax.bitcast_convert_type(
        s_slot, jnp.float32)  # BITCAST, not astype: slots (cluster<<lb)|lane
    # exceed 2^24 at K*c > 16M and f32 rounding then decodes the WRONG
    # winner (measured: false closer hits at 64x512k instanced, c=2048)
        return

    lb = _lane_bits(c)
    cb = _lane_bits(k)
    lane_mask = jnp.int32((1 << lb) - 1)
    cmask = jnp.int32((1 << cb) - 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tm, c), 1)

    en0 = _cluster_enters(rays, boxes_ref[:], k, tm, exact=exact)
    keys0 = _selection_keys(en0, k, cb)
    kb0 = (
        jax.lax.bitcast_convert_type(jnp.maximum(tmax, 0.0), jnp.int32)
        & ~lane_mask
    ) | lane_mask
    worst0 = jnp.max(kb0, axis=0, keepdims=True)[0, 0]
    sel0, keys1 = _next_cluster(keys0)
    sel1, keys2_init = _next_cluster(keys1)

    def dma(idx, slot):
        if xf_ref is not None:
            idx = jax.lax.rem(idx, jnp.int32(kb_tab))
        safe = jnp.minimum(idx, kb_tab - 1)
        return pltpu.make_async_copy(table_hbm.at[safe], tbuf.at[slot], sem.at[slot])

    # depth-2 pipelining + triple-buffered prefetch (see _kernel): both
    # preamble DMAs start unconditionally (safe index) and are drained
    # unconditionally after the loop — starts and waits stay balanced on
    # every path
    dma(sel0 & cmask, 0).start()
    dma(sel1 & cmask, 1).start()

    def cond(carry):
        j, sel, sel_b, keys, s_kb, worst, s_slot = carry
        return (sel & ~cmask) < worst

    def body(carry):
        j, sel, sel_b, keys, s_kb, worst, s_slot = carry
        sel2, keys2 = _next_cluster(keys)       # visit after next
        worst2 = jnp.max(s_kb, axis=0, keepdims=True)[0, 0]
        slot = jax.lax.rem(j, 3)
        dma(sel2 & cmask, jax.lax.rem(j + 2, 3)).start()
        idx = sel & cmask
        if xf_ref is not None:
            rays_v, _ = _xform_visit(rays, xf_ref, idx, kb_tab, tm)
        else:
            rays_v = rays
        dma(idx, slot).wait()
        tri = tbuf[slot]
        t, tri_ok = _mt_body(rays_v, tri, c, tm)
        tb = jax.lax.bitcast_convert_type(
            jnp.where(tri_ok, jnp.maximum(t, 0.0), 3.402823466e38), jnp.int32
        )
        key = (tb & ~lane_mask) | lanes
        kmin = jnp.min(key, axis=1, keepdims=True)
        improved = kmin < s_kb
        slot_w = (idx << lb) | (kmin & lane_mask)
        s_kb = jnp.where(improved, kmin, s_kb)
        s_slot = jnp.where(improved, slot_w, s_slot)
        return j + 1, sel_b, sel2, keys2, s_kb, worst2, s_slot

    j_end, _, _, _, s_kb, _, s_slot = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), sel0, sel1, keys2_init, kb0, worst0,
         jnp.full((tm, 1), -1, jnp.int32)),
    )

    # drain the two outstanding prefetches
    dma(jnp.int32(0), jax.lax.rem(j_end, 3)).wait()
    dma(jnp.int32(0), jax.lax.rem(j_end + 1, 3)).wait()

    if rich:
        _refine_winners(rays, s_slot, out_ref, fetch_hbm, c=c, tm=tm)
        return
    t_approx = jax.lax.bitcast_convert_type(s_kb & ~lane_mask, jnp.float32)
    out_ref[:, 0:1] = t_approx
    out_ref[:, 1:2] = jax.lax.bitcast_convert_type(
        s_slot, jnp.float32)  # BITCAST, not astype: slots (cluster<<lb)|lane
    # exceed 2^24 at K*c > 16M and f32 rounding then decodes the WRONG
    # winner (measured: false closer hits at 64x512k instanced, c=2048)


def _kernel_grouped(rays_ref, gboxes_ref, mboxes_ref, table_ref, *rest,
                    c: int, tm: int, k: int, kg: int, g: int,
                    recull: int, gcull_exact: bool = True,
                    rich: bool = False, instanced: bool = False,
                    kb: int = 0):
    """Closest hit via the two-level grouped selection loop (VMEM table)."""
    if instanced:
        xf_ref, out_ref, *scr = rest
    else:
        xf_ref = None
        out_ref, *scr = rest
    lb = _lane_bits(c)
    lane_mask = jnp.int32((1 << lb) - 1)
    rays = _load_rays(rays_ref, gboxes_ref, tm)
    s_kb, s_slot, _ = _grouped_recull_loop(
        rays, gboxes_ref[:], mboxes_ref, table_ref, None, scr,
        xf_ref, kb,
        c=c, tm=tm, k=k, kg=kg, g=g, recull=recull,
        gcull_exact=gcull_exact)
    if rich:
        _refine_winners(rays, s_slot, out_ref,
                        lambda cur: table_ref[cur], c=c, tm=tm)
        return
    out_ref[:, 0:1] = jax.lax.bitcast_convert_type(
        s_kb & ~lane_mask, jnp.float32)
    out_ref[:, 1:2] = jax.lax.bitcast_convert_type(
        s_slot, jnp.float32)  # BITCAST, not astype: slots (cluster<<lb)|lane
    # exceed 2^24 at K*c > 16M and f32 rounding then decodes the WRONG
    # winner (measured: false closer hits at 64x512k instanced, c=2048)


def _kernel_grouped_hbm(rays_ref, gboxes_ref, mboxes_ref, table_hbm, *rest,
                        c: int, tm: int, k: int, kg: int,
                        g: int, recull: int, gcull_exact: bool = True,
                        rich: bool = False, instanced: bool = False,
                        kb: int = 0):
    """Closest hit via the grouped loop with whole-group HBM streaming
    (table reshaped (Kg, G, 16, C) — (BASE groups, G, 16, C) when
    instanced; one (G*16, C) DMA per group visit)."""
    if instanced:
        xf_ref, out_ref, gbuf, sem, *scr = rest
    else:
        xf_ref = None
        out_ref, gbuf, sem, *scr = rest
    lb = _lane_bits(c)
    lane_mask = jnp.int32((1 << lb) - 1)
    rays = _load_rays(rays_ref, gboxes_ref, tm)
    s_kb, s_slot, _ = _grouped_recull_loop(
        rays, gboxes_ref[:], mboxes_ref, table_hbm, (gbuf, sem), scr,
        xf_ref, kb,
        c=c, tm=tm, k=k, kg=kg, g=g, recull=recull,
        gcull_exact=gcull_exact)
    if rich:
        def fetch(cur):
            cp = pltpu.make_async_copy(
                table_hbm.at[jax.lax.div(cur, jnp.int32(g)),
                             jax.lax.rem(cur, jnp.int32(g))],
                gbuf.at[0, 0], sem.at[0])
            cp.start()
            cp.wait()
            return gbuf[0, 0]

        _refine_winners(rays, s_slot, out_ref, fetch, c=c, tm=tm)
        return
    out_ref[:, 0:1] = jax.lax.bitcast_convert_type(
        s_kb & ~lane_mask, jnp.float32)
    out_ref[:, 1:2] = jax.lax.bitcast_convert_type(
        s_slot, jnp.float32)  # BITCAST, not astype: slots (cluster<<lb)|lane
    # exceed 2^24 at K*c > 16M and f32 rounding then decodes the WRONG
    # winner (measured: false closer hits at 64x512k instanced, c=2048)


def _occl_kernel_hbm(rays_ref, boxes_ref, table_hbm, *rest,
                     c: int, tm: int, k: int, exact: bool,
                     recull: int = 0, instanced: bool = False):
    """Any-hit variant of _kernel_hbm (same DMA pipeline)."""
    if instanced:
        xf_ref, out_ref, tbuf, sem, *scr = rest
    else:
        xf_ref = None
        out_ref, tbuf, sem, *scr = rest
    rays = _load_rays(rays_ref, boxes_ref, tm)
    tmax = rays[:, 7:8]
    cb = _lane_bits(k)
    cmask = jnp.int32((1 << cb) - 1)
    kb_tab = table_hbm.shape[0]

    if recull and exact:
        occ = _occl_recull_loop(rays, boxes_ref[:], table_hbm, (tbuf, sem),
                                scr, c=c, tm=tm, k=k, recull=recull,
                                xf_ref=xf_ref)
        out_ref[:, 0:1] = occ.astype(jnp.float32)
        return

    tmax_bits = jax.lax.bitcast_convert_type(jnp.maximum(tmax, 0.0), jnp.int32)
    en0 = _cluster_enters(rays, boxes_ref[:], k, tm, exact=exact)
    keys0 = _selection_keys(en0, k, cb)
    sel0, keys1 = _next_cluster(keys0)
    sel1, keys2_init = _next_cluster(keys1)
    worst0 = jnp.max(tmax_bits, axis=0, keepdims=True)[0, 0]

    def dma(idx, slot):
        if xf_ref is not None:
            idx = jax.lax.rem(idx, jnp.int32(kb_tab))
        safe = jnp.minimum(idx, kb_tab - 1)
        return pltpu.make_async_copy(table_hbm.at[safe], tbuf.at[slot], sem.at[slot])

    dma(sel0 & cmask, 0).start()
    dma(sel1 & cmask, 1).start()

    def cond(carry):
        j, sel, sel_b, keys, occ, worst = carry
        return (sel & ~cmask) < worst

    def body(carry):
        j, sel, sel_b, keys, occ, _ = carry
        sel2, keys2 = _next_cluster(keys)       # visit after next
        worst2 = jnp.max(
            jnp.where(occ > 0, 0, tmax_bits), axis=0, keepdims=True
        )[0, 0]
        slot = jax.lax.rem(j, 3)
        dma(sel2 & cmask, jax.lax.rem(j + 2, 3)).start()
        idx = sel & cmask
        if xf_ref is not None:
            rays_v, _ = _xform_visit(rays, xf_ref, idx, kb_tab, tm)
        else:
            rays_v = rays
        dma(idx, slot).wait()
        tri = tbuf[slot]
        t, tri_ok = _mt_body(rays_v, tri, c, tm)
        tri_ok = tri_ok & (t < jnp.broadcast_to(tmax, t.shape))
        hit = jnp.max(jnp.where(tri_ok, 1, 0), axis=1, keepdims=True)
        occ = jnp.maximum(occ, hit)
        return j + 1, sel_b, sel2, keys2, occ, worst2

    j_end, _, _, _, occ, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), sel0, sel1, keys2_init,
         jnp.zeros((tm, 1), jnp.int32), worst0)
    )

    dma(jnp.int32(0), jax.lax.rem(j_end, 3)).wait()
    dma(jnp.int32(0), jax.lax.rem(j_end + 1, 3)).wait()

    out_ref[:, 0:1] = occ.astype(jnp.float32)


def _occl_kernel(rays_ref, boxes_ref, table_ref, *rest, c: int,
                 tm: int, k: int, exact: bool, recull: int = 0,
                 instanced: bool = False):
    """Any-hit variant: a cluster is processed only while some unoccluded ray
    could still be blocked; terminates when every ray is occluded (the
    running horizon is the max tmax-bits over OPEN rays)."""
    if instanced:
        xf_ref, out_ref, *scr = rest
    else:
        xf_ref = None
        out_ref, *scr = rest
    rays = _load_rays(rays_ref, boxes_ref, tm)
    tmax = rays[:, 7:8]
    cb = _lane_bits(k)
    cmask = jnp.int32((1 << cb) - 1)

    if recull and exact:
        occ = _occl_recull_loop(rays, boxes_ref[:], table_ref, None,
                                scr, c=c, tm=tm, k=k, recull=recull,
                                xf_ref=xf_ref)
        out_ref[:, 0:1] = occ.astype(jnp.float32)
        return

    tmax_bits = jax.lax.bitcast_convert_type(jnp.maximum(tmax, 0.0), jnp.int32)
    en0 = _cluster_enters(rays, boxes_ref[:], k, tm, exact=exact)
    keys0 = _selection_keys(en0, k, cb)
    sel0, keys1 = _next_cluster(keys0)
    sel1, keys2_init = _next_cluster(keys1)
    worst0 = jnp.max(tmax_bits, axis=0, keepdims=True)[0, 0]

    def cond(carry):
        sel, _, _, _, worst = carry
        return (sel & ~cmask) < worst

    def body(carry):
        sel, sel_b, keys, occ, _ = carry
        # depth-2 software pipelining, same scheme as _kernel
        sel2, keys2 = _next_cluster(keys)
        worst2 = jnp.max(
            jnp.where(occ > 0, 0, tmax_bits), axis=0, keepdims=True
        )[0, 0]
        idx = sel & cmask
        if xf_ref is not None:
            rays_v, bidx = _xform_visit(rays, xf_ref, idx,
                                        table_ref.shape[0], tm)
        else:
            rays_v, bidx = rays, idx
        tri = table_ref[bidx]
        t, tri_ok = _mt_body(rays_v, tri, c, tm)
        tri_ok = tri_ok & (t < jnp.broadcast_to(tmax, t.shape))
        hit = jnp.max(jnp.where(tri_ok, 1, 0), axis=1, keepdims=True)
        occ = jnp.maximum(occ, hit)
        return sel_b, sel2, keys2, occ, worst2

    _, _, _, occ, _ = jax.lax.while_loop(
        cond, body,
        (sel0, sel1, keys2_init, jnp.zeros((tm, 1), jnp.int32), worst0)
    )
    out_ref[:, 0:1] = occ.astype(jnp.float32)


def resident_table_bytes(scene: DeviceScene) -> int:
    """VMEM footprint of the resident triangle table (10 comps pad to 16
    sublanes per cluster under the f32 (8,128) tiling).  Instanced scenes
    count BASE clusters only — the table is shared across instances."""
    c = scene.tris_per_cluster
    pad_c = -(-c // 128) * 128
    if scene.cl_xf is not None:
        kb = (scene.cl_mt_table.shape[0] if scene.cl_mt_table is not None
              else scene.cl_tri_table.shape[0])
    else:
        kb = scene.num_clusters
    return kb * 16 * pad_c * 4


# tables above this stream from HBM through a double-buffered scratch
# (leaves room for ray/out blocks and compiler scratch in ~16 MB of VMEM)
VMEM_TABLE_LIMIT = 8 * 2**20


_TRACE_STATICS = ("tile_rays", "sort_rays", "any_hit", "hbm_table",
                  "exact_cull", "recull", "grouped", "rich", "interpret",
                  "sort_mode", "ssub")
# signatures that hit the Mosaic scoped-VMEM ceiling under the default
# 16 MiB carve-out (probe_k100k.py: quantized compiler-spill growth at
# K ~ 80k, or the c=2048 giant-cluster regime) -> AOT-compiled with a
# raised limit; None = failed once, compile in progress
_SCOPED_FALLBACK = {}
_SCOPED_VMEM_KIB = 24576


def trace_resident(scene, origin, direction, t_min, t_max, active, **kw):
    """Public entry: the jitted kernel below, with a self-healing AOT
    fallback — when a signature's Mosaic compile dies with a scoped-VMEM
    stack OOM (giant-K / c=2048 scenes; see probe_k100k.py), the same
    program is lowered once with `xla_tpu_scoped_vmem_limit_kib` raised
    and the Compiled is cached, so e.g. 33.5M-effective-tri frames render
    out of the box.  Only reachable when called OUTSIDE an enclosing jit
    (the composed engine path); traced callers compile their own programs
    and gate these regimes themselves."""
    import jax.core as _core

    if any(isinstance(x, _core.Tracer)
           for x in jax.tree.leaves((scene, origin, direction, t_min,
                                     t_max, active))):
        return _trace_resident_jit(scene, origin, direction, t_min, t_max,
                                   active, **kw)
    key = (scene.num_clusters, scene.tris_per_cluster,
           getattr(scene, "cl_xf", None) is not None,
           int(origin.shape[0]), tuple(sorted(kw.items())))
    fb = _SCOPED_FALLBACK.get(key)
    if fb is not None:
        try:
            return fb(scene, origin, direction, t_min, t_max, active)
        except TypeError:
            pass  # aval mismatch vs the recorded lowering — recompile
    try:
        return _trace_resident_jit(scene, origin, direction, t_min, t_max,
                                   active, **kw)
    except Exception as e:  # pragma: no cover (chip-compiler path)
        msg = str(e)
        # the scoped-OOM often surfaces masked as a bare compile-helper
        # crash ('HTTP 500: tpu_compile_helper subprocess exit code 1'),
        # so any remote-compile failure earns ONE raised-limit retry; a
        # genuinely broken program just fails again and we re-raise the
        # original error
        if not ("Scoped allocation" in msg or "scoped vmem" in msg
                or ("remote_compile" in msg and "500" in msg)):
            raise
        # the relay rotates over several compile-helper endpoints and the
        # borderline programs compile nondeterministically across them —
        # retry the raised-limit AOT a few times before giving up
        import time as _time

        lowered = _trace_resident_jit.lower(
            scene, origin, direction, t_min, t_max, active, **kw)
        for attempt in range(3):
            try:
                compiled = lowered.compile(compiler_options={
                    "xla_tpu_scoped_vmem_limit_kib": _SCOPED_VMEM_KIB})
                break
            except Exception:
                if attempt == 2:
                    raise e
                _time.sleep(2.0)
        _SCOPED_FALLBACK[key] = compiled
        return compiled(scene, origin, direction, t_min, t_max, active)


@partial(
    jax.jit,
    static_argnames=_TRACE_STATICS,
)
def _trace_resident_jit(
    scene: DeviceScene,
    origin, direction, t_min, t_max, active,
    tile_rays: int = None,
    sort_rays: bool = False,
    any_hit: bool = False,
    hbm_table: bool = None,
    exact_cull: bool = None,
    recull: int = None,
    grouped: bool = None,
    rich: bool = None,
    interpret: bool = None,
    sort_mode: str = "auto",
    ssub: int = None,
):
    """Closest-hit trace with the resident-table kernel.  Same contract as
    pallas_tracer.trace_pallas: (HitRecord, dropped_pair_count), or
    (occluded_mask, dropped) when any_hit=True — dropped is structurally 0
    here (no static pair budget exists).

    hbm_table=None auto-selects: small scenes keep the whole triangle table
    VMEM-resident; larger ones stream each selected cluster from HBM through
    a double-buffered scratch (_kernel_hbm).

    sort_mode (with sort_rays=True): "cluster" sorts by each ray's own
    first/second entered cluster (_sched_kernel — tighter tile unions than
    origin-morton on scattered wavefronts), "morton" by origin cell;
    "auto" = cluster when the schedule prepass is affordable."""
    n = origin.shape[0]
    # two-level instanced dispatch (scene/geometry.py
    # device_scene_from_instances): cluster arrays are instance-level, the
    # triangle table base-level; visits transform the ray per cluster
    # (_xform_visit).  Only the flat/hbm selection kernels are
    # instance-aware — transposed/grouped/tiny paths gate off.
    instanced = scene.cl_xf is not None
    # dense transposed kernel (small scenes, pack-time cl_mt_table_t):
    # decided up front, from statics only — it shapes the tile policy, the
    # sort policy, and the rich default below.  Forced hbm_table/grouped
    # still take their own paths.
    will_transpose = (
        scene.cl_mt_table_t is not None
        and not instanced
        and hbm_table is not True
        and grouped is not True
    )
    if tile_rays is None:
        # tiny scenes (a handful of clusters) are bound by per-grid-step
        # overhead, not by tile-union MT waste — run 4x wider tiles there
        # (measured: cornell rich closest 0.94 ms @128 -> 0.80 @512; 64k+
        # tri scenes: tm=128 optimal, sweep_resident)
        if will_transpose:
            # transposed kernel: per-grid-step overhead dominates — the
            # widest tile whose (CT, TM) work matrices stay comfortably in
            # VMEM (cornell sweep: 512 -> 0.095 ms, 2048 -> 0.049 ms per
            # 64k wavefront; 4096/8192 no better)
            ct_rows = scene.cl_mt_table_t.shape[0]
            tile_rays = int(max(512, min(
                2048, (1 << 18) // max(ct_rows, 8) // 128 * 128)))
        elif scene.num_clusters <= 4:
            tile_rays = 512
        else:
            tile_rays = TILE_RAYS
    tm = tile_rays
    pad = (-n) % tm
    mp = n + pad

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    # the dense transposed kernel visits every triangle row for every tile
    # regardless of ray order — a morton sort buys nothing there (no cull,
    # no tile-union locality) and costs ~2.5 ms flat (sort + 2 gathers of
    # dependent-launch latency)
    if sort_rays and will_transpose:
        sort_rays = False

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
    k = scene.num_clusters

    # rays ship ROW-MAJOR (8, mp) — the natural output layout of the stack
    # fusion (no XLA layout copy into the kernel) — and the scene-exit
    # horizon cap (escaping rays must not pin the early-termination horizon
    # at +inf) is applied IN-KERNEL from the resident box table
    # (_load_rays): the whole trace prologue is ONE elementwise fusion.
    rays_packed = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         jnp.where(act, tmin_p, _F32_MAX), jnp.where(act, tmax_p, 0.0)],
        axis=0,
    )  # (8, mp)

    # planar cluster-AABB + count table and the derived component-planar MT
    # table (rows v0 xyz, e1 xyz, e2 xyz, n = e1 x e2; padding tris all-zero
    # -> n = 0 -> det = 0 -> rejected in-kernel).  Precomputed at scene-pack
    # time (scene/geometry.py) — the in-call fallback below serves only
    # hand-assembled scenes and is bit-identical.
    if scene.cl_boxes is not None:
        boxes = scene.cl_boxes
    else:
        boxes = jnp.concatenate(
            [
                scene.cl_aabb_min.T,                # rows 0..2
                scene.cl_aabb_max.T,                # rows 3..5
                (scene.cl_count > 0).astype(jnp.float32)[None, :],
                jnp.zeros((1, k), jnp.float32),
            ],
            axis=0,
        )  # (8, K); zero non-finite (empty-cluster) AABBs so interval
        # arithmetic never produces NaNs (count row already excludes them)
        boxes = jnp.where(jnp.isfinite(boxes), boxes, 0.0)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # wavefront sort: one key, one sort, ONE (8, mp) gather of the packed
    # rays (saturated keys put inactive and padding rays last; jax.lax.sort
    # is stable, so padding stays behind real rays within ties)
    perm = None
    if sort_rays:
        mode = sort_mode
        if mode == "auto":
            # the schedule prepass needs the flat (tile, K) cull matrix and
            # a 12-bit cluster index (see _sched_kernel); measured a >=1.5x
            # tile-union win over morton wherever it applies
            mode = "cluster" if k < 4096 else "morton"
        if mode == "cluster" and k < 4096:
            key = schedule_keys(boxes, rays_packed, interpret=interpret)
            key = jnp.where(rays_packed[7, :] > 0.0, key, jnp.int32(0x7FFFFFFF))
        else:
            key = _morton_key(scene, o, d)
            key = jnp.where(rays_packed[7, :] > 0.0, key, jnp.uint32(0xFFFFFFFF))
        _, perm = jax.lax.sort(
            (key, jnp.arange(mp, dtype=jnp.int32)), num_keys=1)
        rays_packed = jnp.take(rays_packed, perm, axis=1)
        act = rays_packed[7, :] > 0.0

    kb = (scene.cl_mt_table.shape[0] if scene.cl_mt_table is not None
          else scene.cl_tri_table.shape[0]) if instanced else k
    if scene.cl_mt_table is not None:
        table = scene.cl_mt_table.reshape(kb, 16, c)
    else:
        src = scene.cl_tri_table.reshape(kb, 10, c)
        v0 = src[:, 0:3]
        e1 = src[:, 3:6] - v0
        e2 = src[:, 6:9] - v0
        table = jnp.concatenate(
            [v0, e1, e2, jnp.cross(e1, e2, axis=1),
             scene.cl_tri_map.astype(jnp.float32).reshape(k, 1, c),
             jnp.zeros((k, 3, c), jnp.float32)], axis=1
        )  # (K, 16, C): MT rows, canon row 12, pad rows 13..15

    if hbm_table is None:
        hbm_table = resident_table_bytes(scene) > VMEM_TABLE_LIMIT
        # NOTE the K ~ 80k compile wall (round-4's 'K~100k Mosaic limit')
        # is NOT a table/VMEM budget: probe_k100k.py measured the scoped-
        # VMEM stack OOM at 40.97M with the table streamed from HBM and an
        # interval (1, K) cull — compiler spill/temporary stack growth in
        # the selection machinery, quantized (kg 9752 compiles at <16M,
        # kg 10396 blows to 41M in every table/cull mode).  Streaming the
        # table earlier does not move it; the split-scene driver
        # workaround (probe_k100k.py) does.
    if will_transpose:
        # the transposed kernel reads ONLY the (CT8, 16) transposed table
        # (<= 32 KB at the 512-tri cap) — never the (K, 16, C) cluster
        # table, whose bytes can exceed the VMEM budget purely through
        # cluster-capacity PADDING (partitioned scenes pad K to the max
        # across partitions).  Auto hbm/grouped resolution must not pull a
        # transposed scene onto the streaming/grouped kernels.
        hbm_table = False
    if rich is None:
        # in-kernel winner refinement kills the XLA epilogue chain — a
        # measured 2.6x on cornell-scale and 1.6x on 64k camera wavefronts.
        # Morton-SORTED (scattered) wavefronts are the one case where the
        # per-distinct-winner refinement loop costs about what the epilogue
        # saves (18.1 -> 19.7 ms at 64k incoherent): keep the classic
        # epilogue there.
        rich = not sort_rays
    if instanced:
        # the in-kernel refine has no object-space stage; the classic XLA
        # epilogue transforms per-winner below
        rich = False
    if will_transpose:
        # the transposed kernel's winner slot is a row of the CONCATENATED
        # valid-triangle table — the classic epilogue's cluster-major slot
        # decode doesn't apply, and the transposed refine is loop-free (one
        # one-hot MXU matmul), so rich is strictly better here anyway
        rich = True
    rich = rich and not any_hit
    # the HBM kernel's per-cluster DMA slices the table's lane dim, which
    # Mosaic requires 128-aligned; pad with degenerate triangles (zero
    # normal -> rejected in-kernel), epilogue remaps the winner slot.
    # The 16-row layout (12 MT rows + canon + pad) keeps the DMA slice
    # sublane-8-aligned at pack time.
    c_k = c
    if hbm_table and c % 128:
        c_k = -(-c // 128) * 128
        table = jnp.pad(table, ((0, 0), (0, 0), (0, c_k - c)))
    # two-level grouped dispatch: the exact per-ray cull and the rekeys
    # rounds run over GROUPS of CL_GROUP SAH-consecutive clusters — (TM, Kg)
    # instead of (TM, K) work — with a cheap (G, TM) member refinement per
    # selected group.  Measured policy (this file's git history): grouping
    # WINS exactly where the flat (TM, K) cull is unaffordable (camera at
    # 1M tris: 11.3 ms interval -> 7.4 ms grouped) and LOSES where flat
    # per-cluster per-ray re-culling fits (sorted incoherent 64k: 18 ms
    # flat vs 45 ms grouped — group-level pruning is too coarse; camera
    # 64k: wash).  So: grouped only when the flat exact matrix exceeds its
    # footprint cap.
    can_group = scene.cl_gboxes is not None
    kg = scene.cl_gboxes.shape[1] if can_group else k
    grp = scene.cl_mboxes.shape[1] if can_group else 1
    flat_exact_ok = tm * k * 4 <= 2 * 2**20
    flat_recull_ok = tm * k * 4 <= 8 * 2**20
    group_ok = can_group and tm * kg * 4 <= 8 * 2**20

    if grouped is None:
        grouped = group_ok and (
            (not sort_rays and not flat_exact_ok)   # camera-like, giant K
            or (sort_rays and not flat_recull_ok)   # scattered, enormous K
        )
    # instanced scenes group per instance over BASE cluster order
    # (device_scene_from_instances builds cl_gboxes/cl_mboxes with the
    # group->cid0 indirection in mboxes lane 7)
    grouped = grouped and can_group and not will_transpose
    # the grouped EXACT (TM, Kg) matrix build materializes unchunked
    # (TM, Kg, 3) slab temporaries (~8x the matrix; measured scoped-VMEM
    # OOM at kg=11904: 47.2M vs the 16M cap) — beyond this, grouped
    # closest falls back to interval group keys (no per-ray matrix, scales
    # to any Kg; the member gate stays exact per-ray) and grouped any-hit
    # (whose loop always builds the exact matrix) falls back to flat
    exact_group_ok = tm * kg * 4 <= 1 * 2**20
    if exact_cull is None:
        # scattered (sorted) wavefronts need the per-ray cull at ANY K —
        # the interval bound degenerates to a full-scene sweep for them
        # (diag_1m, K=11437: 5.6 s vs 1.9 s even without the horizon work).
        # For coherent camera tiles exact wins when the per-tile cull
        # matrix is affordable (flat or grouped).
        exact_cull = sort_rays or flat_exact_ok or (grouped and exact_group_ok)
    if grouped and not exact_group_ok:
        if any_hit:
            grouped = False
        else:
            exact_cull = False
    if recull is None:
        # per-ray horizon rounds need the (TM, Kcull) enter matrix resident
        # in VMEM (chunk-built, but kept live across the loop).  Re-culling
        # is THE lever on scattered wavefronts at scale — diag_1m at 1M
        # tris: 94 ms vs 1016 ms, flat in the round length over 8..32.
        # Any-hit re-culls the OCCLUSION mask (_occl_recull_loop): dense-
        # scene NEE blocks otherwise keep visiting every cluster the block's
        # last open ray allows (measured 24 ms -> see bench_frame_stages).
        kx = kg if grouped else k
        recull = 8 if (exact_cull and tm * kx * 4 <= 8 * 2**20) else 0
    if not exact_cull:
        recull = 0
    # grouped modes: exact group cull + per-ray rekeys rounds (needs
    # recull), or interval group keys when exact_cull=False (closest hit
    # only — the member gate stays exact per-ray either way)
    if grouped and exact_cull and not recull:
        recull = 8
    if any_hit and not exact_cull:
        grouped = False
    grouped = grouped and (exact_cull or not any_hit)

    if ssub is None:
        # in-kernel sub-block retiling (see _recull_loop).  MEASURED
        # (sweep_sched ssub, 64k incoherent cluster-sorted): splitting a
        # 128-ray tile into narrower selection loops LOSES (ssub=2 12.96 ms
        # = baseline, 4 -> 15.5, 8 -> 19.9): closest-hit visits are
        # LATENCY-bound (~0.19 us fixed + ~0.3 us x rows/128), so sub-
        # blocks raise the visit count (4 x 16.9 unions vs 38.2) faster
        # than they shrink per-visit cost.  Default stays 1; the knob
        # exists for width>128 tiles (sub-blocks of 128 rays: same unions,
        # fewer grid steps) and future occlusion-style loops.
        ssub = 1
    if any_hit or grouped or not recull or tm % ssub or (tm // ssub) % 8:
        ssub = 1

    import os as _os
    if _os.environ.get("PG2024_TRACE_POLICY"):
        print(f"[trace_resident policy] tm={tm} k={k} kg={kg} grp={grp} "
              f"c={c_k} grouped={grouped} exact_cull={exact_cull} "
              f"recull={recull} hbm={hbm_table} rich={rich} "
              f"instanced={instanced} sort={sort_rays}", flush=True)
    ray_spec = pl.BlockSpec((8, tm), lambda i: (0, i), memory_space=pltpu.VMEM)
    boxes_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(
        memory_space=pl.ANY if hbm_table else pltpu.VMEM
    )
    if rich:
        # row-major refined record (t/u/v/canon/hit rows; _refine_winners)
        out_spec = pl.BlockSpec((8, tm), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        out_struct = jax.ShapeDtypeStruct((8, mp), jnp.float32)
    else:
        out_cols = 1 if any_hit else 2
        out_spec = pl.BlockSpec((tm, out_cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_struct = jax.ShapeDtypeStruct((mp, out_cols), jnp.float32)

    if grouped:
        if hbm_table:
            # whole-group streaming: (Kg, G, 16, C) — pad K to full groups.
            # Instanced: the table is BASE-sized and shared; reshape it to
            # (base groups, G, 16, C) — kernels address it by
            # rem(cid0, kb) // G.
            rows = -(-table.shape[0] // grp) * grp
            table = jnp.pad(table, ((0, rows - table.shape[0]), (0, 0), (0, 0)))
            table = table.reshape(rows // grp, grp, 16, c_k)
            kern = _occl_kernel_grouped_hbm if any_hit else _kernel_grouped_hbm
            scratch = [
                pltpu.VMEM((2, grp, 16, c_k), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            kern = _occl_kernel_grouped if any_hit else _kernel_grouped
            scratch = []
        if any_hit:
            scratch = scratch + [
                pltpu.VMEM((tm, 1), jnp.int32),
                pltpu.VMEM((1, kg), jnp.int32),
                pltpu.VMEM((1, kg), jnp.int32),
            ]
        else:
            scratch = scratch + [
                pltpu.VMEM((tm, 1), jnp.int32),
                pltpu.VMEM((tm, 1), jnp.int32),
                pltpu.VMEM((1, kg), jnp.int32),
                pltpu.VMEM((1, kg), jnp.int32),
            ]
        if not any_hit:
            kern = partial(kern, gcull_exact=exact_cull, rich=rich)
        extra_in = [scene.cl_xf] if instanced else []
        (packed_out,) = pl.pallas_call(
            partial(kern, c=c_k, tm=tm, k=k, kg=kg, g=grp, recull=recull,
                    instanced=instanced, kb=kb),
            grid=(tiles,),
            in_specs=[ray_spec, boxes_spec, boxes_spec, table_spec]
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra_in),
            out_specs=[out_spec],
            out_shape=[out_struct],
            scratch_shapes=scratch,
            interpret=interpret,
        )(rays_packed, scene.cl_gboxes, scene.cl_mboxes, table, *extra_in)
    elif will_transpose:
        # small scenes: fully row-major TRANSPOSED kernel — the scene's
        # valid triangles (all clusters concatenated) ride the sublane dim
        # at their real (8-padded) count instead of padding to the 128-lane
        # cluster width, and the load transpose / column-major selection
        # disappear (cornell headline: 0.55 -> 0.049 ms per 64k wavefront;
        # vs the culled selection kernels: 6.8x at 128 tris, 3.1x at 256,
        # 1.4x at the 512-tri TINY_T_ROWS cap)
        ct = scene.cl_mt_table_t.shape[0]
        kern = _occl_kernel_tiny_t if any_hit else _kernel_tiny_t
        (packed_out,) = pl.pallas_call(
            partial(kern, ct=ct, tm=tm),
            grid=(tiles,),
            in_specs=[ray_spec, boxes_spec,
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[out_spec],
            out_shape=[out_struct],
            interpret=interpret,
        )(rays_packed, boxes, scene.cl_mt_table_t)
    elif not hbm_table and k <= TINY_K and not instanced:
        # straight-line tiny-scene kernels: no cull/selection machinery
        kern = _occl_kernel_tiny if any_hit else _kernel_tiny
        if not any_hit:
            kern = partial(kern, rich=rich)
        (packed_out,) = pl.pallas_call(
            partial(kern, c=c_k, tm=tm, k=k),
            grid=(tiles,),
            in_specs=[ray_spec, boxes_spec, table_spec],
            out_specs=[out_spec],
            out_shape=[out_struct],
            interpret=interpret,
        )(rays_packed, boxes, table)
    else:
        if hbm_table:
            kern = _occl_kernel_hbm if any_hit else _kernel_hbm
            scratch = [
                # TRIPLE-buffered cluster stream: depth-2 pipelining keeps
                # two prefetches in flight
                pltpu.VMEM((3, 16, c_k), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ]
        else:
            kern = _occl_kernel if any_hit else _kernel
            scratch = []
        kern = partial(kern, recull=recull, instanced=instanced)
        if not any_hit:
            kern = partial(kern, rich=rich, ssub=ssub)
        if recull:
            # round-crossing vector state of the re-cull loops (see
            # _recull_loop / _occl_recull_loop: the outer while carries only
            # scalars)
            if any_hit:
                scratch = scratch + [
                    pltpu.VMEM((tm, 1), jnp.int32),
                    pltpu.VMEM((1, k), jnp.int32),
                    pltpu.VMEM((1, k), jnp.int32),
                ]
            else:
                scratch = scratch + [
                    pltpu.VMEM((tm, 1), jnp.int32),
                    pltpu.VMEM((tm, 1), jnp.int32),
                    pltpu.VMEM((1, k), jnp.int32),
                    pltpu.VMEM((1, k), jnp.int32),
                ]
        extra_in = [scene.cl_xf] if instanced else []
        (packed_out,) = pl.pallas_call(
            partial(kern, c=c_k, tm=tm, k=k, exact=exact_cull),
            grid=(tiles,),
            in_specs=[ray_spec, boxes_spec, table_spec]
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra_in),
            out_specs=[out_spec],
            out_shape=[out_struct],
            scratch_shapes=scratch,
            interpret=interpret,
        )(rays_packed, boxes, table, *extra_in)

    dropped = jnp.int32(0)

    # un-sort selector: maps original ray i -> its row in the sorted+padded
    # kernel domain (mp); identity slice when unsorted
    if perm is not None:
        inv_n = jnp.zeros((mp,), jnp.int32).at[perm].set(
            jnp.arange(mp, dtype=jnp.int32))[:n]
        unsel = lambda a: jnp.take(a, inv_n, axis=0)
    else:
        unsel = lambda a: a[:n]

    if any_hit:
        occ = unsel((packed_out[:, 0] > 0.5) & act) & active
        return occ, dropped

    if rich:
        # the kernel already refined the winner (exact t/u/v + canonical
        # index, _refine_winners): one slice/select fusion and we're done —
        # no gathers, no un-pad remap, no XLA recompute
        is_hit = unsel((packed_out[4, :] > 0.5) & act) & active
        hits = HitRecord(
            t=jnp.where(is_hit, unsel(packed_out[0, :]), _F32_MAX),
            tri_index=jnp.where(is_hit,
                                unsel(packed_out[3, :]).astype(jnp.int32), -1),
            u=jnp.where(is_hit, unsel(packed_out[1, :]), 0.0),
            v=jnp.where(is_hit, unsel(packed_out[2, :]), 0.0),
            is_hit=is_hit,
        )
        return hits, dropped

    slot_packed = unsel(jax.lax.bitcast_convert_type(packed_out[:, 1],
                                                     jnp.int32))
    # decode the packed (cluster << lane_bits) | lane winner slot into the
    # canonical cluster-major index (padding lanes never win: zero normal
    # -> det 0 -> rejected)
    lbk = _lane_bits(c_k)
    win_cluster = jnp.maximum(slot_packed, 0) >> lbk
    slot = jnp.where(
        slot_packed >= 0,
        win_cluster * c + jnp.minimum(slot_packed & ((1 << lbk) - 1), c - 1),
        slot_packed,
    )
    is_hit = (slot >= 0) & active

    # XLA refinement: recompute exact t/u/v for each ray's winning triangle
    # (one MT per ray on gathered canonical vertices — also restores the
    # mantissa bits the packed key spent on the lane field); runs in the
    # ORIGINAL ray order (slot was un-sorted above), so o/d are the inputs
    canon = jnp.take(scene.cl_tri_map, jnp.clip(slot, 0, scene.cl_tri_map.shape[0] - 1))
    canon = jnp.where(is_hit, canon, -1)
    safe = jnp.maximum(canon, 0)
    if scene.tri_verts is not None:
        # one wide row gather instead of three (launch count, CLAUDE.md)
        vrow = jnp.take(scene.tri_verts, safe, axis=0)
        va, vb, vc = vrow[:, 0:3], vrow[:, 3:6], vrow[:, 6:9]
    else:
        va = jnp.take(scene.v0, safe, axis=0)
        vb = jnp.take(scene.v1, safe, axis=0)
        vc = jnp.take(scene.v2, safe, axis=0)
    e1 = vb - va
    e2 = vc - va
    if instanced:
        # winner vertices live in OBJECT space: transform the rays into the
        # winning instance's frame (UNNORMALIZED direction -> the MT t
        # below is the world t exactly, see _xform_visit) and offset the
        # canonical id into the virtual per-instance triangle id space
        xf = jnp.take(scene.cl_xf.reshape(-1, 16), win_cluster // kb, axis=0)
        lin = xf[:, 0:9].reshape(-1, 3, 3)
        on = jnp.einsum("nij,nj->ni", lin, origin) + xf[:, 9:12]
        dn = jnp.einsum("nij,nj->ni", lin, direction)
        inst = jnp.round(xf[:, 13]).astype(jnp.int32)
        tb_count = scene.num_base_tris
        canon = jnp.where(canon >= 0, inst * tb_count + canon, canon)
    else:
        dn = direction
        on = origin
    pv = jnp.cross(dn, e2)
    det = jnp.sum(e1 * pv, axis=-1)
    ok = jnp.abs(det) > 1e-12
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tv = on - va
    u = jnp.sum(tv * pv, axis=-1) * inv_det
    qv = jnp.cross(tv, e1)
    v = jnp.sum(dn * qv, axis=-1) * inv_det
    t = jnp.sum(e2 * qv, axis=-1) * inv_det
    is_hit = is_hit & ok
    # re-validate the recomputed hit against the barycentric/interval
    # bounds (small slack for row-major-vs-kernel fp drift): a corrupted
    # winner decode must resolve to a MISS, never a phantom closer hit
    slack = jnp.float32(1e-5)
    is_hit = is_hit & (u >= -slack) & (v >= -slack) & (u + v <= 1 + 2 * slack) \
        & (t > 0.0)

    hits = HitRecord(
        t=jnp.where(is_hit, t, _F32_MAX),
        tri_index=jnp.where(is_hit, canon, -1),
        u=jnp.where(is_hit, u, 0.0),
        v=jnp.where(is_hit, v, 0.0),
        is_hit=is_hit,
    )
    return hits, dropped
