"""Fused neural-routing megakernel: trace + proxy march + vis/depth nets +
prediction consumption in ONE Pallas program.

Why: on this backend cost is per-LAUNCH, and a module mixing Pallas kernels
with rich XLA stages collects ~130 layout/MSA copies (secondary_route
measured ~110 ms at 64k paths with every stage individually kernelized —
see CLAUDE.md).  The only structural fix is to keep the whole per-ray
pipeline inside one kernel so the XLA surface shrinks to path bookkeeping.

Per ray tile the kernel runs:
  1. closest-hit trace — the resident-table loop of ops/pallas_resident.py
     (exact per-ray cull, front-to-back selection; VMEM-resident table for
     small scenes, double-buffered HBM cluster streaming above the limit),
     extended to carry the EXACT winner t in a VMEM scratch (one extra
     one-hot reduce per cluster) since there is no XLA refinement epilogue;
  2. proxy-AABB march — ops/pallas_march.py semantics with
     t_cap = local hit t (or the caller's uncapped tmax on miss);
  3. vis + depth inference — ALL objects in ONE matmul per layer: weights
     ride concatenated along the OUT dim ((in, p*out) bf16) and each row's
     result is narrowed to its own object's block after every layer
     (_forward_all_objects — the stage is layer-latency-bound at small
     widths, so the dependent-step count matters); at production widths
     the concat matmuls turn FLOP-bound, so the valid query rows are
     rank-compacted in-kernel and the nets run per pl.when-gated tm-row
     chunk (nn_compact — bit-identical, measured 27.9 -> 21.6 ms at
     PROD w256 d4, p=8, max_hits=3);
  4. consumption — tMax/targetNode/env-miss decisions
     (render/proxy_stages.py consumption block; reference
     frame_buffer_update.cu:222-324).

Secondary wavefronts are scattered by construction, so the wrapper
Morton-sorts rays by default (engine sort policy for bounce >= 1) and
inverse-permutes the per-ray decisions on the way out.

`my_id` stays traced (shard_map axis_index): own-partition exclusion rides
the proxy `allowed` row built in XLA, and "settle local" is emitted as the
sentinel node -2 that the XLA epilogue rewrites to my_id.

Role parity: the reference's secondaryRayModuleBasedNN pipeline
(/root/reference/src/render/renderer.cpp:1407-1452) as one device program.
Scope: untextured (no-cutout) scenes, architecturally identical vis/depth
nets, stacked weights within the VMEM budget — the composed per-stage path
remains for everything else (render/proxy_stages.py dispatches).  Instanced
proxy tables are supported in-kernel (`instanced`): per-hit object-space
featurization via the winning instance's world_to_obj affine, net selection
by obj_id, routing by node_id, and the world/object depth scale t_ratio in
consumption (reference instanceID semantics,
/root/reference/optix/secondary_ray_kernel.cu:289-316).  Multi-geo models
(ONE shared 6-feature net, reference MultiGeoNeuralVisNetwork,
trainingcode/module.py:531-582) run in-kernel as a pn=1 forward with the
instanceID/INSTANCE_DIVISOR column appended to the features.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.mlp import LEAKY_SLOPE, MLPConfig, _bias_name, net_forward
from .pallas_compact import chunk_onehot, lane_cumsum_exclusive
from .pallas_frame import _acos, _atan2
from .pallas_mlp import _param_names
from .pallas_resident import (
    VMEM_TABLE_LIMIT, _cluster_enters, _lane_bits, _mt_body, _next_cluster,
    _recull_loop, _selection_keys, resident_table_bytes,
)
from .pallas_tracer import _morton_key

_PI = 3.14159265358979
_FMAX = 3.402823466e38


def _leaky(x):
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def _forward_all_objects(x, refs, p: int, cfg: MLPConfig,
                         final_activation: str, sel_cols):
    """One net's forward over (Q, F) rows for ALL p objects in ONE matmul
    per layer.  Weight refs hold every object's layer concatenated along
    the OUT dim ((in, p*out) bf16, biases (1, p*out) f32 — see the wrapper
    prep); after each layer the per-row result is narrowed back to the
    row's OWN object's block with a static-slice select tree (sel_cols[o]
    is the (Q, 1) f32 membership column).

    Why this shape: the per-object loop (even over COMPACTED rows,
    ops/pallas_compact.py) is LAYER-LATENCY-bound — p objects x ~26
    dependent small matmuls dominate regardless of row count (measured
    25.2 -> 21.1 ms only after a 6x row cut).  One concatenated matmul per
    layer costs p x the MXU FLOPs (cheap at these widths) but collapses
    the dependent-step count by p.  Structure comes from the shared
    models.mlp.net_forward (incl. the global out1+out2 skip)."""
    def dot(h, wn, out_w: int):
        full = (
            jnp.dot(h.astype(jnp.bfloat16), refs[wn][0],
                    preferred_element_type=jnp.float32)
            + refs[_bias_name(wn)][0]
        )                                                # (Q, p*out)
        acc = full[:, 0:out_w] * sel_cols[0]
        for o in range(1, p):
            acc = acc + full[:, o * out_w:(o + 1) * out_w] * sel_cols[o]
        return acc                                       # (Q, out)

    return net_forward(x, dot, cfg, final_activation)    # (Q, 1)


def _trace_exact_t(rays, boxes, table_ref, tbuf, sem, t_scr, rc_scr, *, c,
                   tm, k, hbm: bool, recull: int = 0, ssub: int = 1):
    """pallas_resident's selection loop (_kernel / _kernel_hbm), additionally
    tracking the exact winner t per ray in a VMEM scratch (a loop-carried
    value hits a Mosaic vector-layout legalization conflict: the init is a
    lane-offset column slice, the body value a reduce output).  Returns
    (exact_t|tmax_eff (TM,1), hit (TM,1)).

    recull > 0 delegates to pallas_resident._recull_loop (per-ray horizon
    rounds) with exact-t tracking through the same scratch."""
    if recull:
        hbm_refs = (tbuf, sem) if hbm else None
        s_kb, _, kb0 = _recull_loop(rays, boxes, table_ref, hbm_refs,
                                    rc_scr, c=c, tm=tm, k=k, recull=recull,
                                    t_scr=t_scr, ssub=ssub)
        return t_scr[:], s_kb < kb0
    tmax = rays[:, 7:8]
    lb = _lane_bits(c)
    cb = _lane_bits(k)
    lane_mask = jnp.int32((1 << lb) - 1)
    cmask = jnp.int32((1 << cb) - 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tm, c), 1)

    en0 = _cluster_enters(rays, boxes, k, tm, exact=True)
    keys0 = _selection_keys(en0, k, cb)
    kb0 = (
        jax.lax.bitcast_convert_type(jnp.maximum(tmax, 0.0), jnp.int32)
        & ~lane_mask
    ) | lane_mask
    worst0 = jnp.max(kb0, axis=0, keepdims=True)[0, 0]
    sel0, keys1 = _next_cluster(keys0)

    if hbm:
        def dma(idx, slot):
            safe = jnp.minimum(idx, k - 1)
            return pltpu.make_async_copy(
                table_ref.at[safe], tbuf.at[slot], sem.at[slot])

        @pl.when((sel0 & ~cmask) < worst0)
        def _():
            dma(sel0 & cmask, 0).start()

    t_scr[:] = jnp.broadcast_to(tmax, (tm, 1))

    def cond(carry):
        j, sel, keys, s_kb, worst = carry
        return (sel & ~cmask) < worst

    def body(carry):
        j, sel, keys, s_kb, worst = carry
        sel2, keys2 = _next_cluster(keys)
        worst2 = jnp.max(s_kb, axis=0, keepdims=True)[0, 0]
        idx = sel & cmask
        if hbm:
            slot = jax.lax.rem(j, 2)
            dma(sel2 & cmask, 1 - slot).start()
            dma(idx, slot).wait()
            tri = tbuf[slot]
        else:
            tri = table_ref[idx]
        t, tri_ok = _mt_body(rays, tri, c, tm)
        tb = jax.lax.bitcast_convert_type(
            jnp.where(tri_ok, jnp.maximum(t, 0.0), _FMAX), jnp.int32
        )
        key = (tb & ~lane_mask) | lanes
        kmin = jnp.min(key, axis=1, keepdims=True)
        improved = kmin < s_kb
        win = (lanes == jnp.broadcast_to(kmin & lane_mask, (tm, c))) & tri_ok
        t_exact = jnp.min(jnp.where(win, t, _FMAX), axis=1, keepdims=True)
        t_scr[:] = jnp.where(improved, t_exact, t_scr[:])
        s_kb = jnp.where(improved, kmin, s_kb)
        return j + 1, sel2, keys2, s_kb, worst2

    j_end, _, _, s_kb, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), sel0, keys1, kb0, worst0)
    )

    if hbm:
        @pl.when(j_end > 0)
        def _():
            dma(jnp.int32(0), jax.lax.rem(j_end, 2)).wait()

    # any improvement strictly reduced the packed key below its tmax init
    return t_scr[:], s_kb < kb0


def _route_kernel(rays_ref, boxes_ref, pboxes_ref, pdiag_ref, pxf_ref,
                  table_ref, *rest, c: int, tm: int, k: int, p: int,
                  pn: int, max_hits: int, eps: float, cfg: MLPConfig,
                  vis_final: str, depth_final: str, n_params: int,
                  hbm: bool, recull: int = 0, ssub: int = 1,
                  nn_chunk: int = 0, instanced: bool = False,
                  multi_geo: bool = False, inst_div: float = 1.0,
                  shadow: bool = False):
    """rays cols (16): [o(3), d(3), tmin|FMAX, tmax_eff|0, phi, theta,
    inv(3), act, tmax_raw, pad]; pboxes rows (8, P): [min(3), max(3),
    allowed, pad]; pdiag (1, P): proxy max_length (object-space diagonal
    when instanced).  pxf (24, P), read only when `instanced`:
    [world_to_obj lin row-major (9), trans (3), obj_min (3), obj_span (3),
    obj_id, node_id, pad (4)] — instanced rows carry the object-space
    feature transform + net/partition indirection (reference instanceID
    semantics, secondary_ray_kernel.cu:289-316).  `pn` = number of NETS
    (== p unless instanced; 1 when `multi_geo` — ONE shared 6-feature net,
    instanceID/INSTANCE_DIVISOR appended as the 6th input column,
    models/proxy.py apply_multigeo parity).  out cols (8): [settled node
    (-2=local), new_t, has_node, env_miss, no_route, local_hit, 0, 0].

    `shadow` switches the program to the shadowRayModuleBasedNN semantics
    (render/proxy_stages.py shadow_direct_light_nn; reference
    renderer.cpp:1349-1404 + frame_buffer_update.cu:31-127): locally
    occluded rays die, survivors march with the full shadow tmax (no
    local-t cap), vis>0.5 plus the inside-hit depth-vs-normalized-entry
    comparison sets per-hit occlusion, and the output is the max-occlusion
    light weight.  out cols (8): [weight = survives*(1-max_occ),
    occluded_local, survives, 0, 0, 0, 0, 0]."""
    names = _param_names(cfg)
    vis_refs = dict(zip(names, rest[:n_params]))
    depth_refs = dict(zip(names, rest[n_params:2 * n_params]))
    out_ref = rest[2 * n_params]
    scr = rest[2 * n_params + 1:]
    if hbm:
        tbuf, sem = scr[:2]
        scr = scr[2:]
    else:
        tbuf = sem = None
    t_scr = scr[0]
    rc_scr = scr[1:5] if recull else None
    y_scr = scr[-1] if nn_chunk else None

    rays = rays_ref[:]
    act = rays[:, 13:14] > 0.5
    tmax_raw = rays[:, 14:15]

    # ---- 1. local closest hit (tmax_eff is scene-exit capped) ----
    local_t, local_hit = _trace_exact_t(
        rays, boxes_ref[:], table_ref, tbuf, sem, t_scr, rc_scr, c=c,
        tm=tm, k=k, hbm=hbm, recull=recull, ssub=ssub)
    local_hit = local_hit & act
    if shadow:
        # occlusion semantics: a local hit kills the shadow ray outright;
        # survivors march against the full shadow tmax (composed path:
        # march_proxies(cap=tmax, active=survives))
        march_act = act & (~local_hit)
        cmp_t = tmax_raw
    else:
        # proxies live OUTSIDE the local scene: the march/routing bound on
        # a local miss is the caller's UNCAPPED tmax, not the scene-exit cap
        march_act = act
        cmp_t = jnp.where(local_hit, local_t, tmax_raw)

    # ---- 2. proxy march (ops/pallas_march.py semantics) ----
    pboxes = pboxes_ref[:]
    pdiag = pdiag_ref[:]
    pxf = pxf_ref[:] if instanced else None
    cb = _lane_bits(p)
    cmask = jnp.int32((1 << cb) - 1)
    SAT = jnp.int32(0x7FFFFFFF)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tm, p), 1)
    B = lambda a: jnp.broadcast_to(a, (tm, p))
    phi = rays[:, 8:9]
    theta = rays[:, 9:10]

    te = jnp.full((tm, p), -_FMAX)
    tx = jnp.full((tm, p), _FMAX)
    for ax in range(3):
        o = B(rays[:, ax:ax + 1])
        iv = B(rays[:, 10 + ax:11 + ax])
        t0 = (B(pboxes[ax:ax + 1, :]) - o) * iv
        t1 = (B(pboxes[3 + ax:4 + ax, :]) - o) * iv
        te = jnp.maximum(te, jnp.minimum(t0, t1))
        tx = jnp.minimum(tx, jnp.maximum(t0, t1))
    box_ok = (B(pboxes[6:7, :]) > 0.0) & B(march_act) & (tx >= te)

    t_lo = jnp.zeros((tm, 1), jnp.float32)
    seen = jnp.zeros((tm, 1), jnp.int32)
    # per hit: (x (tm,5), obj|-1 f32 net-select, node|-1 i32 routing
    # target, inside, t, ml, ratio) — obj == node == lane unless instanced
    hits_feat = []
    for _ in range(max_hits):
        lo = t_lo + eps
        inside = te <= B(lo)
        cand = jnp.where(inside, tx, te)
        ok = box_ok & (cand > B(lo)) & (cand < B(cmp_t))
        kb = jax.lax.bitcast_convert_type(jnp.maximum(cand, 0.0), jnp.int32)
        key = jnp.where(ok, (kb & ~cmask) | lanes, SAT)
        kmin = jnp.min(key, axis=1, keepdims=True)
        found = kmin < SAT
        best = kmin & cmask
        oh = ((lanes == B(best)) & ok).astype(jnp.float32)
        best_t = jnp.sum(oh * cand, axis=1, keepdims=True)
        best_inside = jnp.sum(oh * inside.astype(jnp.float32), axis=1,
                              keepdims=True) > 0.5
        dup = best_inside & (((seen >> best) & 1) > 0)
        record = found & (~dup)

        if instanced:
            # object-space featurization (march_proxies_xla parity,
            # reference originLocal/directionLocal + tMax ratio,
            # secondary_ray_kernel.cu:289-303): one-hot extract the
            # winning instance's affine rows from pxf, transform the hit
            # point + direction, spherical via the in-kernel Cephes
            # atan/acos (pallas_frame._atan2/_acos)
            ext = lambda r: jnp.sum(oh * B(pxf[r:r + 1, :]), axis=1,
                                    keepdims=True)
            pt = [rays[:, ax:ax + 1] + best_t * rays[:, 3 + ax:4 + ax]
                  for ax in range(3)]
            dw = [rays[:, 3 + ax:4 + ax] for ax in range(3)]
            p_l, d_l = [], []
            for i in range(3):
                li = [ext(3 * i + j) for j in range(3)]
                p_l.append(li[0] * pt[0] + li[1] * pt[1] + li[2] * pt[2]
                           + ext(9 + i))
                d_l.append(li[0] * dw[0] + li[1] * dw[1] + li[2] * dw[2])
            # world-t / object-t scale: constant along the ray for an
            # affine instance (d unit in world space)
            ratio = 1.0 / jnp.maximum(
                jnp.sqrt(d_l[0] * d_l[0] + d_l[1] * d_l[1]
                         + d_l[2] * d_l[2]), 1e-12)
            cols = [(p_l[i] - ext(12 + i))
                    / jnp.maximum(ext(15 + i), 1e-12) for i in range(3)]
            sgn = jnp.where(best_inside, -ratio, ratio)
            dn = [d_l[i] * sgn for i in range(3)]
            theta_n = _acos(dn[1])
            phi_n = _atan2(dn[2], dn[0])
            phi_n = jnp.where(phi_n < 0.0, phi_n + 2.0 * _PI, phi_n)
            obj_f = ext(18)
            node_i = ext(19).astype(jnp.int32)
        else:
            phi_n = jnp.where(best_inside, phi + _PI, phi)
            phi_n = jnp.where(phi_n >= 2.0 * _PI, phi_n - 2.0 * _PI, phi_n)
            theta_n = jnp.where(best_inside, _PI - theta, theta)
            cols = []
            for ax in range(3):
                bmin = jnp.sum(oh * B(pboxes[ax:ax + 1, :]), axis=1,
                               keepdims=True)
                bmax = jnp.sum(oh * B(pboxes[3 + ax:4 + ax, :]), axis=1,
                               keepdims=True)
                span = jnp.maximum(bmax - bmin, 1e-12)
                point = rays[:, ax:ax + 1] + best_t * rays[:, 3 + ax:4 + ax]
                cols.append((point - bmin) / span)
            ratio = jnp.ones((tm, 1), jnp.float32)
            obj_f = best.astype(jnp.float32)
            node_i = best
        feat_cols = cols + [phi_n / (2.0 * _PI), theta_n / _PI]
        if multi_geo:
            feat_cols.append(obj_f / inst_div)
        nf = cfg.in_features
        x = jnp.concatenate(feat_cols, axis=-1)                 # (tm, nf)
        x = jnp.where(jnp.broadcast_to(record, (tm, nf)), x, 0.0)
        ml = jnp.sum(oh * B(pdiag), axis=1, keepdims=True)
        hits_feat.append(
            (x, jnp.where(record, obj_f, -1.0),
             jnp.where(record, node_i, -1), best_inside & record,
             best_t, ml, ratio)
        )
        seen = jnp.where(record, seen | (jnp.int32(1) << best), seen)
        t_lo = jnp.where(found, best_t, t_lo)

    # ---- 3. all-objects-in-one-matmul vis/depth inference ----
    # Two rejected forms, both measured on-chip: (a) presence-gated — each
    # PRESENT object's nets over ALL mh*tm rows (~25.2 ms whole-kernel:
    # scattered wavefronts touch every proxy per tile, the pl.when gate
    # never skipped); (b) object-compacted (ops/pallas_compact.py, the
    # reference's Work_Efficient_Scan_For_NN grouping in-kernel) — a 6x
    # row cut bought only ~4 ms because the stage is LAYER-LATENCY-bound:
    # p objects x 26 dependent matmuls dominate at any row count.  The
    # winning form runs ONE concatenated matmul per layer for all objects
    # (_forward_all_objects).
    xs = jnp.concatenate([h[0] for h in hits_feat], axis=0)      # (mh*tm, nf)
    objs_f = jnp.concatenate([h[1] for h in hits_feat], axis=0)  # (mh*tm, 1)
    valid_col = jnp.where(objs_f >= 0.0, 1.0, 0.0)
    if nn_chunk:
        # Valid-row chunking: most rows of the (mh*tm) stack are ZEROED
        # (rays with a local hit record no proxy queries), yet the dense
        # concatenated matmuls pay for every row.  Rank-compact the valid
        # rows (lane prefix sum, ops/pallas_compact.py) and run the nets
        # chunk-by-chunk of `nn_chunk` rows, each chunk pl.when-gated on
        # `count > chunk_base` — query-empty tiles skip the NN entirely and
        # the common sparse tile runs ONE chunk instead of mh.  One-hot
        # gather/scatter rides the MXU at HIGHEST (exact for 0/1), and
        # matmul rows are independent, so the outputs are BIT-IDENTICAL to
        # the unchunked form (tests/test_pallas_route.py).
        hp = jax.lax.Precision.HIGHEST
        q = max_hits * tm
        v_row = jnp.transpose(valid_col, (1, 0))                 # (1, q)
        rank_row = lane_cumsum_exclusive(v_row, q)               # (1, q)
        count = jnp.sum(v_row, axis=1, keepdims=True)[0, 0]
        rank_col = jnp.transpose(rank_row, (1, 0))               # (q, 1)
        lane_g = jax.lax.broadcasted_iota(
            jnp.int32, (nn_chunk, q), 0).astype(jnp.float32)
        y_scr[...] = jnp.zeros((q, 2), jnp.float32)
        for j in range(-(-q // nn_chunk)):
            @pl.when(count > float(j * nn_chunk))
            def _(j=j):
                base = float(j * nn_chunk)
                rr = jnp.broadcast_to(rank_row, (nn_chunk, q)) - base
                vv = jnp.broadcast_to(v_row, (nn_chunk, q))
                g = jnp.where((rr == lane_g) & (vv > 0.5), 1.0, 0.0)
                xs_c = jnp.dot(g, xs, precision=hp)              # (CH, nf)
                obj_c = jnp.dot(g, objs_f, precision=hp)         # (CH, 1)
                val_c = jnp.dot(g, valid_col, precision=hp)      # (CH, 1)
                if multi_geo:
                    sel_c = [jnp.where(val_c > 0.5, 1.0, 0.0)]
                else:
                    sel_c = [jnp.where((obj_c == o) & (val_c > 0.5),
                                       1.0, 0.0) for o in range(pn)]
                vis_c = _forward_all_objects(
                    xs_c, vis_refs, pn, cfg, vis_final, sel_c) * val_c
                dep_c = _forward_all_objects(
                    xs_c, depth_refs, pn, cfg, depth_final, sel_c) * val_c
                gt = chunk_onehot(rank_col, valid_col, base, nn_chunk)
                y_scr[...] += jnp.dot(
                    gt, jnp.concatenate([vis_c, dep_c], axis=1), precision=hp)
        vis = y_scr[:, 0:1]
        depth = y_scr[:, 1:2]
    else:
        if multi_geo:
            sel_cols = [valid_col]
        else:
            sel_cols = [jnp.where(objs_f == o, 1.0, 0.0) for o in range(pn)]
        vis = _forward_all_objects(xs, vis_refs, pn, cfg, vis_final,
                                   sel_cols) * valid_col
        depth = _forward_all_objects(xs, depth_refs, pn, cfg, depth_final,
                                     sel_cols) * valid_col

    if shadow:
        # ---- 4'. shadow occlusion blend (frame_buffer_update.cu:31-127):
        # per-hit occluded = vis>0.5, inside-hits additionally require
        # depth <= object-space normalized entry t; weight = 1 - max ----
        max_occ = jnp.zeros((tm, 1), jnp.float32)
        for h in range(max_hits):
            _, _, node_h, inside_h, t_h, ml_h, ratio_h = hits_feat[h]
            valid_h = node_h >= 0
            vis_h = vis[h * tm:(h + 1) * tm]
            dep_h = depth[h * tm:(h + 1) * tm]
            norm_t = t_h / jnp.maximum(ratio_h * ml_h, 1e-12)
            occ_h = valid_h & (vis_h > 0.5) & (
                (~inside_h) | (dep_h <= norm_t))
            max_occ = jnp.maximum(max_occ, occ_h.astype(jnp.float32))
        survives = march_act
        w = jnp.where(survives, 1.0 - max_occ, 0.0)
        out_ref[:, 0:1] = w
        out_ref[:, 1:2] = local_hit.astype(jnp.float32)
        out_ref[:, 2:3] = survives.astype(jnp.float32)
        out_ref[:, 3:8] = jnp.zeros((tm, 5), jnp.float32)
        return

    # ---- 4. consumption (frame_buffer_update.cu:222-324) ----
    best_pred_t = jnp.full((tm, 1), _FMAX)
    best_pred_node = jnp.full((tm, 1), -1, jnp.int32)
    any_query = jnp.zeros((tm, 1), bool)
    for h in range(max_hits):
        _, _, node_h, inside_h, t_h, ml_h, ratio_h = hits_feat[h]
        valid_h = node_h >= 0
        vis_h = vis[h * tm:(h + 1) * tm]
        dep_h = depth[h * tm:(h + 1) * tm]
        pred_hit = valid_h & (vis_h > 0.5)
        # world length = t_ratio * maxLength * depth (tMaxFloatTypeKernel,
        # frame_buffer_update.cu:222-257; ratio == 1 unless instanced)
        pred_len = ratio_h * ml_h * dep_h
        pred_t = jnp.where(
            inside_h,
            jnp.where(pred_len > t_h, 0.0, t_h - pred_len),
            t_h + pred_len,
        )
        pred_t = jnp.where(pred_hit & (pred_t > 1.1920929e-7), pred_t, _FMAX)
        better = pred_t < best_pred_t
        best_pred_node = jnp.where(better, node_h, best_pred_node)
        best_pred_t = jnp.where(better, pred_t, best_pred_t)
        any_query = any_query | valid_h
    use_pred = act & (best_pred_t < cmp_t)
    settled = jnp.where(use_pred, best_pred_node,
                        jnp.where(local_hit, jnp.int32(-2), jnp.int32(-1)))
    new_t = jnp.where(use_pred, best_pred_t, cmp_t)
    has_node = settled != -1                              # -2 == local
    env_miss = act & (~local_hit) & (~any_query) & (~has_node)
    no_route = act & (~has_node) & (~env_miss)

    out_ref[:, 0:1] = settled.astype(jnp.float32)
    out_ref[:, 1:2] = jnp.where(has_node, new_t, 0.0)
    out_ref[:, 2:3] = has_node.astype(jnp.float32)
    out_ref[:, 3:4] = env_miss.astype(jnp.float32)
    out_ref[:, 4:5] = no_route.astype(jnp.float32)
    out_ref[:, 5:6] = local_hit.astype(jnp.float32)
    out_ref[:, 6:8] = jnp.zeros((tm, 2), jnp.float32)


def _fused_impl(
    scene, proxies, models,
    origin, direction, t_min, t_max, active, my_id,
    max_hits: int, eps: float,
    tile_rays: int = 128,
    sort_rays: bool = True,
    hbm_table: bool = None,
    interpret: bool = None,
    sort_mode: str = "auto",
    nn_compact: bool = True,
    shadow: bool = False,
):
    """Shared body of route_fused / shadow_route_fused (one traced+jitted
    entry each below): pack rays, build proxy/instance/weight tables, run
    _route_kernel, inverse-permute and decode the per-ray decision rows."""
    n = origin.shape[0]
    tm = min(tile_rays, max(n, 8))
    pad = (-n) % tm
    mp = n + pad
    c = scene.tris_per_cluster
    k = scene.num_clusters
    p = proxies.num_partitions
    cfg = models.vis_cfg

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    def pad1(a, fill):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])

    o = pad1(origin, 0.0)
    d = pad1(direction, 1.0)
    tmin_p = pad1(t_min, 0.0)
    tmax_p = pad1(t_max, 0.0)
    act = pad1(active, False)

    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    from ..core import math as cmath

    phi, theta = cmath.spherical_for_train(cmath.normalize(d))

    # scene-exit cap for the TRACE only (pallas_resident.py convention)
    s_valid = scene.cl_count > 0
    s_lo = jnp.min(jnp.where(s_valid[:, None], scene.cl_aabb_min, _FMAX), axis=0)
    s_hi = jnp.max(jnp.where(s_valid[:, None], scene.cl_aabb_max, -_FMAX), axis=0)
    tt0 = (s_lo[None] - o) * inv
    tt1 = (s_hi[None] - o) * inv
    scene_exit = jnp.min(jnp.maximum(tt0, tt1), axis=-1)
    tmax_eff = jnp.minimum(tmax_p, jnp.maximum(scene_exit, 0.0) * 1.001 + 1e-4)

    rays = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         jnp.where(act, tmin_p, _FMAX), jnp.where(act, tmax_eff, 0.0),
         phi.astype(jnp.float32), theta.astype(jnp.float32),
         inv[:, 0], inv[:, 1], inv[:, 2],
         act.astype(jnp.float32), tmax_p, jnp.zeros((mp,), jnp.float32)],
        axis=-1,
    )  # (mp, 16)

    # scene cluster boxes (pallas_resident.py convention; precomputed at
    # scene-pack time, in-call fallback for hand-assembled scenes)
    if scene.cl_boxes is not None:
        boxes = scene.cl_boxes
    else:
        boxes = jnp.concatenate(
            [scene.cl_aabb_min.T, scene.cl_aabb_max.T,
             (scene.cl_count > 0).astype(jnp.float32)[None, :],
             jnp.zeros((1, k), jnp.float32)],
            axis=0,
        )
        boxes = jnp.where(jnp.isfinite(boxes), boxes, 0.0)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # wavefront sort: one key, one sort, ONE (mp, 16) gather of the packed
    # rays (saturated keys put inactive/padding rays last; stable sort)
    perm = None
    if sort_rays:
        mode = sort_mode
        if mode == "auto":
            mode = "cluster" if k < 4096 else "morton"
        if mode == "cluster" and k < 4096:
            from .pallas_resident import schedule_keys

            prepass = jnp.stack(
                [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                 jnp.where(act, tmin_p, _FMAX),
                 jnp.where(act, tmax_eff, 0.0)], axis=0)      # (8, mp)
            key = schedule_keys(boxes, prepass, interpret=interpret)
            key = jnp.where(act, key, jnp.int32(0x7FFFFFFF))
        else:
            key = _morton_key(scene, o, d)
            key = jnp.where(act, key, jnp.uint32(0xFFFFFFFF))
        _, perm = jax.lax.sort(
            (key, jnp.arange(mp, dtype=jnp.int32)), num_keys=1)
        rays = jnp.take(rays, perm, axis=0)

    # proxy boxes + allowed row (own partition and empties excluded).
    # Exclusion is by OWNING NODE when instanced: an instance hosted by my
    # partition is local geometry, not a proxy (march_proxies_xla parity).
    row_node = (proxies.node_id if proxies.node_id is not None
                else jnp.arange(p, dtype=jnp.int32))
    allowed = (
        (row_node != jnp.asarray(my_id, jnp.int32))
        & (proxies.max_length > 0.0)
    ).astype(jnp.float32)
    pbmin = jnp.where(jnp.isfinite(proxies.aabb_min), proxies.aabb_min, 0.0)
    pbmax = jnp.where(jnp.isfinite(proxies.aabb_max), proxies.aabb_max, 0.0)
    pboxes = jnp.concatenate(
        [pbmin.T, pbmax.T, allowed[None, :], jnp.zeros((1, p), jnp.float32)],
        axis=0,
    )
    pdiag = proxies.max_length[None, :]

    # instance transform table (see _route_kernel docstring): world_to_obj
    # affine rows + object AABB + obj/node indirection, column per instance
    instanced = proxies.instanced
    if instanced:
        lin = jnp.transpose(
            proxies.world_to_obj[:, :, :3].reshape(p, 9), (1, 0))  # (9, P)
        trans = jnp.transpose(proxies.world_to_obj[:, :, 3], (1, 0))
        pxf = jnp.concatenate(
            [lin, trans, proxies.obj_min.T, proxies.obj_span.T,
             proxies.obj_id.astype(jnp.float32)[None, :],
             row_node.astype(jnp.float32)[None, :],
             jnp.zeros((4, p), jnp.float32)], axis=0)              # (24, P)
        pn = (1 if models.multi_geo
              else next(iter(models.vis_params.values())).shape[0])
    else:
        pxf = jnp.zeros((24, p), jnp.float32)
        pn = 1 if models.multi_geo else p

    # triangle table (lane-padded when HBM-streamed; pallas_resident.py
    # convention, precomputed at scene-pack time)
    if scene.cl_mt_table is not None:
        table = scene.cl_mt_table.reshape(k, 16, c)
    else:
        src = scene.cl_tri_table.reshape(k, 10, c)
        v0 = src[:, 0:3]
        e1 = src[:, 3:6] - v0
        e2 = src[:, 6:9] - v0
        # 16-row layout (12 MT rows + canon + pad: pallas_resident
        # convention; sublane-aligned HBM DMA slices)
        table = jnp.concatenate(
            [v0, e1, e2, jnp.cross(e1, e2, axis=1),
             scene.cl_tri_map.astype(jnp.float32).reshape(k, 1, c),
             jnp.zeros((k, 3, c), jnp.float32)], axis=1)
    if hbm_table is None:
        # unlike the trace-only kernels, this kernel ALSO keeps both nets'
        # stacked weights VMEM-resident — budget them against the ~16 MiB
        # scoped-vmem limit (a 6 MiB table + 8.6 MiB of production-width
        # weights measured 17.67 MiB > 16 at 64k/735 clusters)
        from .pallas_mlp import _param_bytes

        w_bytes = _param_bytes(models.vis_params) + _param_bytes(
            models.depth_params)
        hbm_table = (resident_table_bytes(scene) > VMEM_TABLE_LIMIT
                     or resident_table_bytes(scene) + w_bytes > 11 * 2**20)
    c_k = c
    if hbm_table and c % 128:
        c_k = -(-c // 128) * 128
        table = jnp.pad(table, ((0, 0), (0, 0), (0, c_k - c)))

    names = _param_names(cfg)

    # per-call casts/reshapes sit in ENTRY and CSE across the unrolled
    # bounce loop — measured negligible under the chained slope, so no
    # precast caching (a cached copy goes stale when callers replace
    # params).  Layout: every object's layer concatenated along OUT
    # ((1, in, p*out) bf16 / (1, 1, p*out) f32 biases) so the kernel runs
    # one matmul per layer for all objects (_forward_all_objects).
    def prep(params):
        arrs = []
        for nm in names:
            a = params[nm]
            if models.multi_geo:                # single shared net: O == 1
                a = a[None]
            if a.ndim == 3:                     # (O, in, out)
                arrs.append(jnp.transpose(a, (1, 0, 2))
                            .reshape(1, a.shape[1], -1).astype(jnp.bfloat16))
            else:                               # bias (O, out)
                arrs.append(a.reshape(1, 1, -1).astype(jnp.float32))
        return arrs

    wv = prep(models.vis_params)
    wd = prep(models.depth_params)

    from ..train.datasets import INSTANCE_DIVISOR

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((tm, 16), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tm, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(
        memory_space=pl.ANY if hbm_table else pltpu.VMEM)

    # per-ray horizon rounds when the (TM, K) enter matrix fits beside the
    # resident NN weights (2 MiB cap; the composed budget in
    # pallas_resident gives trace-only kernels 4 MiB)
    recull = 8 if tm * k * 4 <= 2 * 2**20 else 0
    # sub-block retiling measured a LOSS for closest-hit selection loops
    # (pallas_resident ssub policy note) — keep 1; the knob stays plumbed
    # for width>128 tiles
    ssub = 1

    # valid-row NN chunking (see _route_kernel): chunk = one ray tile of
    # rows; the pl.when gates make sparse tiles run 1 chunk and empty
    # tiles 0 instead of the full mh*tm row stack
    nn_chunk = tm if nn_compact else 0

    scratch = []
    if hbm_table:
        scratch += [
            pltpu.VMEM((3, 16, c_k), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ]
    scratch += [
        pltpu.VMEM((tm, 1), jnp.float32),
    ]
    if recull:
        # round-crossing vector state of the re-cull trace loop
        scratch += [
            pltpu.VMEM((tm, 1), jnp.int32),
            pltpu.VMEM((tm, 1), jnp.int32),
            pltpu.VMEM((1, k), jnp.int32),
            pltpu.VMEM((1, k), jnp.int32),
        ]
    if nn_chunk:
        scratch += [pltpu.VMEM((max_hits * tm, 2), jnp.float32)]

    (out,) = pl.pallas_call(
        partial(_route_kernel, c=c_k, tm=tm, k=k, p=p, pn=pn,
                max_hits=max_hits,
                eps=eps, cfg=cfg, vis_final=models.vis_cfg.final_activation,
                depth_final=models.depth_cfg.final_activation,
                n_params=len(names), hbm=hbm_table, recull=recull,
                ssub=ssub, nn_chunk=nn_chunk, instanced=instanced,
                multi_geo=models.multi_geo,
                inst_div=float(INSTANCE_DIVISOR), shadow=shadow),
        grid=(mp // tm,),
        in_specs=[ray_spec, vmem, vmem, vmem, vmem, table_spec]
                 + [vmem] * (2 * len(names)),
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((mp, 8), jnp.float32)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(rays, boxes, pboxes, pdiag, pxf, table, *wv, *wd)

    if perm is not None:
        # ONE inverse-permutation gather on the packed (n, 8) decision rows
        # (six per-field takes would pay six entry ops); perm lives in the
        # padded domain, padding rows sort last (stable) and are dropped
        inv_n = jnp.zeros((mp,), jnp.int32).at[perm].set(
            jnp.arange(mp, dtype=jnp.int32))[:n]
        out = jnp.take(out, inv_n, axis=0)
    else:
        out = out[:n]
    if shadow:
        return dict(
            weight=out[:, 0],
            occluded_local=out[:, 1] > 0.5,
            survives=out[:, 2] > 0.5,
        )
    settled = jnp.round(out[:, 0]).astype(jnp.int32)
    settled = jnp.where(settled == -2, jnp.asarray(my_id, jnp.int32), settled)
    return dict(
        settled_node=settled,
        new_t=out[:, 1],
        has_node=out[:, 2] > 0.5,
        env_miss=out[:, 3] > 0.5,
        no_route=out[:, 4] > 0.5,
        local_hit=out[:, 5] > 0.5,
    )


@partial(jax.jit, static_argnames=(
    "max_hits", "eps", "tile_rays", "sort_rays", "hbm_table", "interpret",
    "sort_mode", "nn_compact"))
def route_fused(
    scene, proxies, models,
    origin, direction, t_min, t_max, active, my_id,
    max_hits: int, eps: float,
    tile_rays: int = 128,
    sort_rays: bool = True,
    hbm_table: bool = None,
    interpret: bool = None,
    sort_mode: str = "auto",
    nn_compact: bool = True,
):
    """One-kernel secondary routing.  Returns a dict of per-ray decisions:
    settled_node (my_id substituted for the local sentinel), new_t,
    has_node, env_miss, no_route, local_hit — the caller applies them to
    the PathState and accumulates the env image (proxy_stages.py).

    sort_mode: same policy as pallas_resident.trace_resident — secondary
    wavefronts are scattered by construction, and the in-kernel trace loop
    dominates this kernel, so the cluster-schedule sort (_sched_kernel)
    pays off identically (measured 18.5 -> 13.0 ms on the bare trace)."""
    return _fused_impl(scene, proxies, models, origin, direction, t_min,
                       t_max, active, my_id, max_hits, eps, tile_rays,
                       sort_rays, hbm_table, interpret, sort_mode,
                       nn_compact, shadow=False)


@partial(jax.jit, static_argnames=(
    "max_hits", "eps", "tile_rays", "sort_rays", "hbm_table", "interpret",
    "sort_mode", "nn_compact"))
def shadow_route_fused(
    scene, proxies, models,
    origin, direction, t_min, t_max, active, my_id,
    max_hits: int, eps: float,
    tile_rays: int = 128,
    sort_rays: bool = False,
    hbm_table: bool = None,
    interpret: bool = None,
    sort_mode: str = "auto",
    nn_compact: bool = True,
):
    """One-kernel neural shadow visibility (shadowRayModuleBasedNN,
    reference renderer.cpp:1349-1404): local occlusion kill + proxy march +
    vis/depth nets + max-occlusion blend in ONE Pallas program.  Returns
    per-ray `weight` = survives * (1 - max_occlusion) — the caller
    multiplies throughput/shadow_path_count and segment-sums into the
    direct-light image (render/proxy_stages.py shadow_direct_light_nn).

    Pass t_max already scaled by the caller's occlusion margin.  Default
    UNSORTED: NEE shadow wavefronts keep pixel order (engine sort policy —
    morton sorting measured ~3x slower for one-light shadow fans)."""
    return _fused_impl(scene, proxies, models, origin, direction, t_min,
                       t_max, active, my_id, max_hits, eps, tile_rays,
                       sort_rays, hbm_table, interpret, sort_mode,
                       nn_compact, shadow=True)
