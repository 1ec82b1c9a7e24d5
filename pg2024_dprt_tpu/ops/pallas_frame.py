"""Whole-sample frame megakernel: every bounce's closest-hit trace, surface
shading, NEE shadow generation, shadow occlusion, and env-miss accumulation
for one path-traced sample run in ONE Pallas program.

Why: on this backend cost is per-LAUNCH (~0.4 ms per entry-computation op —
fusion, copy, or custom call alike; CLAUDE.md).  The composed frame
(render/engine.py: trace kernel + XLA shade + occlusion kernel per bounce)
compiles to ~295 paid entry ops = ~125 ms at 256x256 regardless of how fast
each stage is.  Keeping the whole sample device-resident in one kernel
shrinks the XLA surface to camera-path generation + one kernel + one
pixel-order gather (<10 ops), so frame time approaches pure trace compute.

Structure per ray tile (grid over tiles of TM rays, bounce loop unrolled
in-kernel, pixel-order wavefronts — the measured-best policy for path-traced
wavefronts, see trace_api.trace_closest_checked):

  1. closest hit — pallas_resident._recull_loop (exact per-ray cull,
     front-to-back selection, per-ray horizon re-culling; VMEM-resident
     triangle table or double-buffered HBM streaming);
  2. winner-attribute fetch — for each DISTINCT winning cluster of the tile
     (coherent tiles hit 1-5), load its MT + shade slices ((12,C) resident
     or DMA, (24,C) always DMA from scene.cl_shade_table) and one-hot-matmul
     the winners' 36-wide attribute rows onto the rays (MXU);
  3. exact t/u/v refinement — per-ray Moller-Trumbore on the fetched
     v0/e1/e2 (restores the mantissa bits the packed selection key spends);
  4. shade — smooth-normal interpolation, BSDF sample (Lambertian
     hemisphere / Water Fresnel, render/shade.py math), bit-exact TEA/LCG
     RNG re-implemented on int32 (logical shifts), next-path update;
  5. env on miss — in-kernel lat-long bilinear lookup via a one-hot MXU
     gather over the flattened env image (small maps; the engine falls back
     to the composed path for maps above _ENV_ROWS_LIMIT);
  6. NEE — shadow_path_count light samples per shading point
     (kernel.cu:444-465 contribution formula), traced as ONE (S*TM)-row
     any-hit block by pallas_resident._occl_recull_loop, unoccluded
     contributions accumulated in-register.

Role parity: the reference's per-sample launch sequence PathGen -> [Traverse
-> MainRay -> ShadowRay]*bounces (/root/reference/src/render/renderer.cpp:
1530-1570, optix/kernel.cu:362-466) as a single device program.

Scope (render/engine.py gates; everything else takes the composed path):
textured or untextured triangle scenes (in-kernel bilinear albedo fetch +
alpha cutout over the packed texture pool), env maps <= _ENV_ROWS_LIMIT
pixels, light tables <= _LIGHT_ROWS_LIMIT, cluster counts small enough for
the per-ray re-cull matrices; curve scenes take the composed path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import BSDF_WATER
from .pallas_resident import (
    VMEM_TABLE_LIMIT, _grouped_occl_loop, _grouped_recull_loop, _lane_bits,
    _mt_body_t, _occl_recull_loop, _recull_loop, resident_table_bytes,
)

_FMAX = 3.402823466e38
_PI = 3.14159265358979
_EPS = 1e-8          # core/math.py EPS

TILE_RAYS = 128
_ENV_ROWS_LIMIT = 2048
_LIGHT_ROWS_LIMIT = 64
# per-ray re-cull enter matrices must fit in VMEM: (TM, K) for the closest
# loop + (S*TM, K) for the occlusion loop (they are live in DISJOINT phases,
# so the budget is on the larger of the two plus working temporaries)
_RECULL_BYTES_LIMIT = 8 * 2**20


def _i32c(x):
    return jnp.int32(np.int32(np.uint32(x)))


def _atan_poly(z):
    """atan for z in [0, 1] (Cephes atanf: minimax poly + the tan(pi/8)
    range reduction — without it the bare poly is ~5e-3 off near 1, which
    visibly shifts env-map texel lookups).  Mosaic has no atan2 primitive
    (scripts/probe_mosaic_ops.py)."""
    big = z > jnp.float32(0.41421356)
    zr = jnp.where(big, (z - 1.0) / (z + 1.0), z)
    z2 = zr * zr
    p = jnp.float32(8.05374449538e-2)
    p = p * z2 - jnp.float32(1.38776856032e-1)
    p = p * z2 + jnp.float32(1.99777106478e-1)
    p = p * z2 - jnp.float32(3.33329491539e-1)
    a = p * z2 * zr + zr
    return jnp.where(big, a + jnp.float32(0.25 * _PI), a)


def _atan2(y, x):
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.maximum(jnp.where(swap, ay, ax), 1e-30)
    a = _atan_poly(num / den)
    a = jnp.where(swap, jnp.float32(0.5 * _PI) - a, a)
    a = jnp.where(x < 0.0, jnp.float32(_PI) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _acos(t):
    t = jnp.clip(t, -1.0, 1.0)
    return _atan2(jnp.sqrt(jnp.maximum(0.0, (1.0 - t) * (1.0 + t))), t)


def _tea_i32(v0, v1, rounds: int = 4):
    """core/rng.py tea() on int32 vectors (logical right shifts keep the
    uint32 bit pattern; add/xor/shl wrap identically)."""
    srl = jax.lax.shift_right_logical
    s0 = jnp.int32(0)
    for _ in range(rounds):
        s0 = s0 + _i32c(0x9E3779B9)
        v0 = v0 + ((((v1 << 4) + _i32c(0xA341316C)) ^ (v1 + s0))
                   ^ (srl(v1, 5) + _i32c(0xC8013EA4)))
        v1 = v1 + ((((v0 << 4) + _i32c(0xAD90777D)) ^ (v0 + s0))
                   ^ (srl(v0, 5) + _i32c(0x7E95761E)))
    return v0


def _rnd_i32(seed):
    """core/rng.py rnd() on int32: returns (new_seed, f32 in [0,1))."""
    nxt = _i32c(1664525) * seed + _i32c(1013904223)
    bits = nxt & _i32c(0x00FFFFFF)
    return nxt, bits.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


# ---- (TM,1)-column vec3 helpers (explicit shapes; Mosaic re-evaluates lazy
# broadcasts per op, so everything stays (TM,1)) ----

def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _mul3(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def _where3(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]),
            jnp.where(m, a[2], b[2]))


def _norm3(a):
    n = jnp.sqrt(_dot3(a, a))
    inv = 1.0 / jnp.maximum(n, _EPS)
    return _scale3(a, inv)


def _frame3(n):
    """core/math.py make_frame (Duff et al. branchless basis)."""
    nx, ny, nz = n
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = (1.0 + sign * nx * nx * a, sign * b, -sign * nx)
    bt = (b, sign + ny * ny * a, -ny)
    return t, bt


def _to_world3(n, w):
    t, b = _frame3(n)
    return _add3(_add3(_scale3(t, w[0]), _scale3(b, w[1])), _scale3(n, w[2]))


def _to_local3(n, w):
    t, b = _frame3(n)
    return (_dot3(w, t), _dot3(w, b), _dot3(w, n))


def _row(a, i):
    return a[i:i + 1, :]


def _vecr(a, i):
    return (_row(a, i), _row(a, i + 1), _row(a, i + 2))


def _pack_rays_rows(o, d, act, tmin_r, tmax_r):
    """(N, 8) ray block in the pallas_resident convention ([o(3), d(3),
    tmin | FMAX, tmax | 0]) from row-major (1, N) state — ONE transpose at
    the shade/trace seam."""
    rows = jnp.concatenate(
        [o[0], o[1], o[2], d[0], d[1], d[2],
         jnp.where(act, tmin_r, jnp.float32(_FMAX)),
         jnp.where(act, tmax_r, 0.0)], axis=0)             # (8, N)
    return jnp.transpose(rows, (1, 0))


def _scene_exit_cap(o, d, lo, hi, tmax_raw):
    """pallas_resident tmax_eff: cap each ray at its scene-AABB exit."""
    exit_t = None
    for ax in range(3):
        dv = d[ax]
        inv = 1.0 / jnp.where(jnp.abs(dv) < 1e-12,
                              jnp.where(dv >= 0, 1e-12, -1e-12), dv)
        t0 = (lo[ax] - o[ax]) * inv
        t1 = (hi[ax] - o[ax]) * inv
        mx = jnp.maximum(t0, t1)
        exit_t = mx if exit_t is None else jnp.minimum(exit_t, mx)
    return jnp.minimum(tmax_raw, jnp.maximum(exit_t, 0.0) * 1.001 + 1e-4)


def _frame_kernel(pix_ref, boxes_ref, gboxes_ref, mboxes_ref, table_ref,
                  shade_ref, tt_ref, st_ref, ltab_ref,
                  env_ref, tpool_ref, tmeta_ref, meta_i_ref, meta_f_ref,
                  out_ref, *scr,
                  c: int, tm: int, k: int, kg: int, grp: int,
                  grouped: bool, s: int, bounces: int, lp: int,
                  l_count: int, ep: int, eh: int, ew: int, eps: float,
                  hbm: bool, recull: int, orecull: int,
                  width: int, height: int, tiny: bool = False, ct: int = 8,
                  textured: bool = False, tr: int = 8, twm: int = 8,
                  ntp: int = 8, ssub: int = 1, csub: int = 1,
                  ris: bool = False, rr_start: int = 0):
    """One (ray tile, sample) grid step, all bounces.  The grid is
    (tiles, spp) with spp innermost: consecutive sample steps revisit the
    same out block, accumulating in place (the matmul-k reduction pattern)
    — a whole multi-spp frame is ONE kernel launch.

    pix (1, TM) i32: tiled pixel ids (-1 = padding lane); camera rays are
    generated IN-KERNEL (pathgen.py math) from meta_f.  meta_i (SPP, 32)
    i32: cols 0..7 per-bounce TEA salts, col 8 the sample id, cols 16..23
    per-bounce RIS u-draw salts, cols 24..31 RR survival-draw salts.  meta_f
    (1, 24) f32: [scene_lo(3), scene_hi(3), env_rotation, pad, cam_origin
    (3), forward(3), right(3), up(3), tan_half_fov, tan_half_fov*aspect,
    pad2].  out ROWS (8, TM): [direct(3), env(3), 0, 0] summed over spp.

    Layout: ALL per-ray shade state is row-major (1, TM) — lanes carry
    rays, so each op is ~1 VREG.  The first kernel draft used (TM, 1)
    columns, which tile to 16 VREGs with one live lane each (~16x VPU
    waste measured as ~40 ms of a 107 ms frame).  The trace loops
    (pallas_resident) are column-major internally; the seams are 4
    explicit transposes per bounce."""
    if hbm:
        tbuf, sem = scr[0], scr[1]
        scr = scr[2:]
        hbm_refs = (tbuf, sem)
    else:
        tbuf = sem = hbm_refs = None
    sbuf, ssem = scr[0], scr[1]
    skb_scr, slot_scr, vis_scr, keys_scr, occ_scr = scr[2:7]
    attr_scr, fetch_scr = scr[7], scr[8]
    socc_scr = scr[9] if ssub > 1 else None   # shadow-subgroup occ state

    s_idx = pl.program_id(1)

    lo = tuple(meta_f_ref[0, ax] for ax in range(3))
    hi = tuple(meta_f_ref[0, 3 + ax] for ax in range(3))
    env_rot = meta_f_ref[0, 6]

    # ---- 0. in-kernel camera path generation (render/pathgen.py) ----
    pix = pix_ref[:]                                       # (1, TM) i32
    act = pix >= 0
    pixc = jnp.maximum(pix, 0)
    sample_id = meta_i_ref[s_idx, 8]
    rows_p = jax.lax.div(pixc, jnp.int32(width))
    cols_p = pixc - rows_p * jnp.int32(width)
    cseed = _tea_i32(pixc, jnp.full((1, tm), sample_id, jnp.int32))
    cseed, cx1 = _rnd_i32(cseed)
    cseed, cx2 = _rnd_i32(cseed)
    px = (cols_p.astype(jnp.float32) + cx1) * jnp.float32(2.0 / width) - 1.0
    py = 1.0 - (rows_p.astype(jnp.float32) + cx2) * jnp.float32(2.0 / height)
    cam_o = tuple(meta_f_ref[0, 8 + ax] for ax in range(3))
    fwd = tuple(meta_f_ref[0, 11 + ax] for ax in range(3))
    rgt = tuple(meta_f_ref[0, 14 + ax] for ax in range(3))
    upv = tuple(meta_f_ref[0, 17 + ax] for ax in range(3))
    thf = meta_f_ref[0, 20]
    thf_a = meta_f_ref[0, 21]
    d = _norm3(tuple(
        fwd[ax] + px * (thf_a * rgt[ax]) + py * (thf * upv[ax])
        for ax in range(3)))
    o = tuple(jnp.full((1, tm), 0.0) + cam_o[ax] for ax in range(3))
    tp = tuple(jnp.ones((1, tm), jnp.float32) for _ in range(3))

    direct = tuple(jnp.zeros((1, tm), jnp.float32) for _ in range(3))
    env_acc = tuple(jnp.zeros((1, tm), jnp.float32) for _ in range(3))

    stm = max(s, 1) * tm
    eps_row = jnp.full((1, tm), jnp.float32(eps))
    fmax_row = jnp.full((1, tm), jnp.float32(_FMAX))
    eps_srow = jnp.full((1, stm), jnp.float32(eps))

    def tile_s(x):
        """(1, TM) -> (1, S*TM), sample-major (row j*TM+i = sample j of
        ray i — matches the shadow block concat order).  Mosaic can't
        reshape i1 vectors; bools round-trip through i32."""
        if x.dtype == jnp.bool_:
            return tile_s(x.astype(jnp.int32)) > 0
        return jnp.broadcast_to(x, (s, tm)).reshape(1, stm)

    for b in range(bounces):
        salt = meta_i_ref[s_idx, b]

        # ---- 1. closest hit ----
        tmax_eff = _scene_exit_cap(o, d, lo, hi, fmax_row)
        if tiny:
            # small scenes: TRANSPOSED dense trace (pallas_resident
            # _kernel_tiny_t design) — triangles in sublanes at their real
            # 8-padded count, rays stay in the row-major lanes this kernel
            # already uses (no transposes, no selection loops), and the
            # winner's MT + shade attributes arrive as TWO one-hot MXU
            # matmuls against the pack-time transposed tables (replaces the
            # per-distinct-cluster fetch while_loop).
            rows8_t = jnp.concatenate([
                o[0], o[1], o[2], d[0], d[1], d[2],
                jnp.where(act, eps_row, fmax_row),
                jnp.where(act, tmax_eff, jnp.zeros((1, tm), jnp.float32)),
            ], axis=0)                                     # (8, TM)
            tt = tt_ref[:]
            t_mt, ok_mt = _mt_body_t(rows8_t, tt, ct, tm)
            tb_t = _lane_bits(ct)
            tmask_t = jnp.int32((1 << tb_t) - 1)
            rows_it = jax.lax.broadcasted_iota(jnp.int32, (ct, tm), 0)
            keys_t = (jax.lax.bitcast_convert_type(
                jnp.where(ok_mt, jnp.maximum(t_mt, 0.0), jnp.float32(_FMAX)),
                jnp.int32) & ~tmask_t) | rows_it
            kmin_t = jnp.min(keys_t, axis=0, keepdims=True)  # (1, TM)
            init_t = (jax.lax.bitcast_convert_type(
                jnp.maximum(tmax_eff, 0.0), jnp.int32) & ~tmask_t) | tmask_t
            hit = (kmin_t < init_t) & act
            win_t = kmin_t & tmask_t
            oh_t = ((rows_it == jnp.broadcast_to(win_t, (ct, tm)))
                    & jnp.broadcast_to(hit, (ct, tm))).astype(jnp.float32)
            ext_mt = jax.lax.dot_general(
                tt, oh_t, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)          # (16, TM)
            ext_sh = jax.lax.dot_general(
                st_ref[:], oh_t, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)          # (24, TM)
            attr = jnp.concatenate([ext_mt[0:12], ext_sh], axis=0)
        else:
            rays8 = _pack_rays_rows(o, d, act, eps_row, tmax_eff)
            if grouped:
                # two-level group dispatch at giant K (pallas_resident; cull +
                # selection at (TM, Kg), whole-group HBM DMAs)
                _, s_slot, _ = _grouped_recull_loop(
                    rays8, gboxes_ref[:], mboxes_ref, table_ref, hbm_refs,
                    (skb_scr, slot_scr, vis_scr, keys_scr),
                    c=c, tm=tm, k=k, kg=kg, g=grp, recull=recull)
            else:
                # bounce>=1 rays are pixel-ordered but directionally
                # scattered: sub-blocked selection (csub subgroups of
                # tm/csub pixels, pallas_resident._recull_loop ssub) bounds
                # each selection union to its subgroup — the same in-kernel
                # retiling as the NEE ssub below.  Camera rays (b=0) are
                # coherent; their tile union is already tight (keep 1).
                _, s_slot, _ = _recull_loop(
                    rays8, boxes_ref[:], table_ref, hbm_refs,
                    (skb_scr, slot_scr, vis_scr, keys_scr),
                    c=c, tm=tm, k=k, recull=recull,
                    ssub=csub if b >= 1 else 1)
            slot_r = jnp.transpose(s_slot, (1, 0))             # (1, TM)
            hit = (slot_r >= 0) & act

            # ---- 2. winner-attribute fetch (distinct clusters of the tile) ----
            # slot encoding: (cluster << lane_bits(C)) | lane (pallas_resident)
            lbw = _lane_bits(c)
            w_cl = jnp.where(hit, slot_r >> lbw, jnp.int32(k))
            w_ln = jnp.where(hit, slot_r & jnp.int32((1 << lbw) - 1), jnp.int32(0))
            attr_scr[:] = jnp.zeros((40, tm), jnp.float32)
            sub_c = jax.lax.broadcasted_iota(jnp.int32, (c, tm), 0)

            # round-crossing vector state (the fetched mask) lives in VMEM
            # scratch — the loop carries only the scalar target cluster (Mosaic
            # scf.yield layout legalization, see pallas_resident._recull_loop)
            def fetch_cond(cur):
                return cur < k

            def fetch_body(cur):
                safe = jnp.minimum(cur, k - 1)
                if hbm:
                    if grouped:
                        # table is (Kg, G, 16, C); one member slice
                        src_t = table_ref.at[safe // grp, jax.lax.rem(safe, grp)]
                        dst_t = tbuf.at[0, 0]
                        sem_t = sem.at[0]
                    else:
                        src_t = table_ref.at[safe]
                        dst_t = tbuf.at[0]
                        sem_t = sem.at[0]
                    pltpu.make_async_copy(src_t, dst_t, sem_t).start()
                pltpu.make_async_copy(
                    shade_ref.at[safe], sbuf.at[0],
                    ssem.at[0]).start()
                if hbm:
                    pltpu.make_async_copy(src_t, dst_t, sem_t).wait()
                    # rows 12..15 are DMA-alignment pad
                    mt = (tbuf[0, 0][0:12, :] if grouped
                          else tbuf[0][0:12, :])
                else:
                    mt = table_ref[cur][0:12, :]
                pltpu.make_async_copy(
                    shade_ref.at[jnp.minimum(cur, k - 1)], sbuf.at[0],
                    ssem.at[0]).wait()
                sh = sbuf[0]
                sel = w_cl == cur                               # (1, TM)
                oh = ((sub_c == jnp.broadcast_to(w_ln, (c, tm)))
                      & jnp.broadcast_to(sel, (c, tm))).astype(jnp.float32)
                # HIGHEST precision makes the one-hot extraction EXACT (bf16
                # splits of 0/1 are exact; probe dotT_hi err == 0.0)
                a_mt = jnp.dot(mt, oh,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)  # (12, TM)
                a_sh = jnp.dot(sh, oh,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)  # (24, TM)
                attr_scr[0:12, :] = attr_scr[0:12, :] + a_mt
                attr_scr[12:36, :] = attr_scr[12:36, :] + a_sh
                fetch_scr[:] = fetch_scr[:] | sel.astype(jnp.int32)
                cur2 = jnp.min(
                    jnp.where(fetch_scr[:] > 0, jnp.int32(k), w_cl),
                    axis=1, keepdims=True)[0, 0]
                return cur2

            fetch_scr[:] = (~hit).astype(jnp.int32)
            cur0 = jnp.min(
                jnp.where(fetch_scr[:] > 0, jnp.int32(k), w_cl),
                axis=1, keepdims=True)[0, 0]
            jax.lax.while_loop(fetch_cond, fetch_body, cur0)
            attr = attr_scr[:]

        # ---- 3. exact t/u/v refinement (pallas_resident epilogue math) ----
        v0 = _vecr(attr, 0)
        e1 = _vecr(attr, 3)
        e2 = _vecr(attr, 6)
        pv = _cross3(d, e2)
        det = _dot3(e1, pv)
        ok = jnp.abs(det) > 1e-12
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        tv = _sub3(o, v0)
        u = _dot3(tv, pv) * inv_det
        qv = _cross3(tv, e1)
        v = _dot3(d, qv) * inv_det
        t = _dot3(e2, qv) * inv_det
        hit = hit & ok
        t_hit = jnp.where(hit, t, 0.0)
        point = _add3(o, _scale3(d, t_hit))

        # ---- 4. shade (render/shade.py math) ----
        w_bar = 1.0 - u - v
        n0 = _vecr(attr, 12)
        n1 = _vecr(attr, 15)
        n2 = _vecr(attr, 18)
        normal = _norm3(_add3(_add3(_scale3(n0, w_bar), _scale3(n1, u)),
                              _scale3(n2, v)))
        albedo = _vecr(attr, 27)
        if textured:
            # ---- albedo-texture fetch (reference __closesthit__ch texture
            # read, /root/reference/optix/kernel.cu:256-283; exact
            # scene/textures.py sample_textures math: bilinear + wrap + the
            # stbi v flip) as a SEPARABLE one-hot bilinear — an fy-weighted
            # two-hot MXU row extraction from the scanline pool, then an
            # fx-weighted two-tap column mix on the VPU.  Same pattern as
            # the env gather; two steps keep the one-hot at (R, TM) +
            # (Wmax, TM) instead of (R*Wmax, TM).
            ti = _row(attr, 31)
            has_tex = hit & (ti >= 0.0)
            ti_i = jnp.maximum(ti.astype(jnp.int32), 0)
            sub_nt = jax.lax.broadcasted_iota(jnp.int32, (ntp, tm), 0)
            oh_nt = (sub_nt == jnp.broadcast_to(ti_i, (ntp, tm))).astype(
                jnp.float32)
            mrow = jnp.dot(tmeta_ref[:], oh_nt,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)    # (8, TM)
            roff = _row(mrow, 0)
            hf = jnp.maximum(_row(mrow, 1), 1.0)
            wf = jnp.maximum(_row(mrow, 2), 1.0)
            uu = w_bar * _row(attr, 21) + u * _row(attr, 23) + v * _row(attr, 25)
            vv = w_bar * _row(attr, 22) + u * _row(attr, 24) + v * _row(attr, 26)
            x = uu * wf - 0.5
            y = (1.0 - vv) * hf - 0.5
            x0f = jnp.floor(x)
            y0f = jnp.floor(y)
            fx = x - x0f
            fy = y - y0f
            # wrap addressing in f32 (exact for in-range integer values;
            # Mosaic integer rem is scalar-divisor only)
            xm = x0f - jnp.floor(x0f / wf) * wf
            ym = y0f - jnp.floor(y0f / hf) * hf
            x1m = xm + 1.0
            x1m = jnp.where(x1m >= wf, x1m - wf, x1m)
            y1m = ym + 1.0
            y1m = jnp.where(y1m >= hf, y1m - hf, y1m)
            r0 = (roff + ym).astype(jnp.int32)
            r1 = (roff + y1m).astype(jnp.int32)
            sub_r = jax.lax.broadcasted_iota(jnp.int32, (tr, tm), 0)
            ohm = ((sub_r == jnp.broadcast_to(r0, (tr, tm))).astype(
                       jnp.float32)
                   * jnp.broadcast_to(1.0 - fy, (tr, tm))
                   + (sub_r == jnp.broadcast_to(r1, (tr, tm))).astype(
                       jnp.float32)
                   * jnp.broadcast_to(fy, (tr, tm)))
            mixed = jax.lax.dot_general(
                tpool_ref[:], ohm, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)           # (3*twm, TM)
            x0i = xm.astype(jnp.int32)
            x1i = x1m.astype(jnp.int32)
            sub_w = jax.lax.broadcasted_iota(jnp.int32, (twm, tm), 0)
            ohc = ((sub_w == jnp.broadcast_to(x0i, (twm, tm))).astype(
                       jnp.float32)
                   * jnp.broadcast_to(1.0 - fx, (twm, tm))
                   + (sub_w == jnp.broadcast_to(x1i, (twm, tm))).astype(
                       jnp.float32)
                   * jnp.broadcast_to(fx, (twm, tm)))
            texel = tuple(
                jnp.sum(mixed[cch * twm:(cch + 1) * twm, :] * ohc,
                        axis=0, keepdims=True)
                for cch in range(3))
            albedo = _where3(has_tex, texel, albedo)
        is_water = jnp.abs(_row(attr, 30) - jnp.float32(BSDF_WATER)) < 0.5

        wo = _scale3(d, jnp.full((1, tm), -1.0))
        cosw = _dot3(normal, wo)
        is_inside = cosw < 0.0
        normal = _where3(is_inside, _scale3(normal, jnp.full((1, tm), -1.0)),
                         normal)

        seed = _tea_i32(pix, jnp.full((1, tm), salt, jnp.int32))
        seed, xi1 = _rnd_i32(seed)
        seed, xi2 = _rnd_i32(seed)

        # Lambertian: uniform hemisphere, weight 2
        z_h = xi1
        r_h = jnp.sqrt(jnp.maximum(0.0, 1.0 - z_h * z_h))
        phi_h = (2.0 * _PI) * xi2
        wi_diff = (r_h * jnp.cos(phi_h), r_h * jnp.sin(phi_h), z_h)

        # Water: Fresnel dielectric (render/shade.py bsdf_sample)
        wol = _to_local3(normal, wo)
        eta_i = jnp.where(is_inside, 1.33, 1.0)
        eta_t = jnp.where(is_inside, 1.0, 1.33)
        eta = eta_i / eta_t
        cos_i_r = jnp.abs(wol[2])
        sin2_i = jnp.maximum(0.0, 1.0 - cos_i_r * cos_i_r)
        sin2_t = eta * eta * sin2_i
        cos_t_r = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
        sgn = jnp.where(wol[2] >= 0.0, 1.0, -1.0)
        wi_refr = (-eta * wol[0], -eta * wol[1], -sgn * cos_t_r)
        # dielectric_reflectance (core/math.py)
        cos_i_c = jnp.clip(jnp.abs(wol[2]), 0.0, 1.0)
        s2i = jnp.maximum(0.0, 1.0 - cos_i_c * cos_i_c)
        s2t = eta * eta * s2i
        tir = s2t >= 1.0
        c_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - s2t))
        r_parl = (eta_t * cos_i_c - eta_i * c_t) / jnp.maximum(
            eta_t * cos_i_c + eta_i * c_t, _EPS)
        r_perp = (eta_i * cos_i_c - eta_t * c_t) / jnp.maximum(
            eta_i * cos_i_c + eta_t * c_t, _EPS)
        fres = jnp.where(tir, 1.0, 0.5 * (r_parl * r_parl + r_perp * r_perp))
        reflecting = xi1 < fres
        wi_refl = (-wol[0], -wol[1], wol[2])
        wi_water = _where3(reflecting, wi_refl, wi_refr)
        cos_wi_w = jnp.abs(wi_water[2])
        safe_cos = jnp.maximum(cos_wi_w, 1e-12)
        eta_corr = (eta_i / eta_t) ** 2
        w_water = jnp.where(reflecting, 1.0 / safe_cos, eta_corr / safe_cos)
        w_water = jnp.where(cos_wi_w == 0.0, 0.0, w_water)

        wi_local = _where3(is_water, wi_water, wi_diff)
        weight = jnp.where(is_water, w_water, jnp.full((1, tm), 2.0))
        is_delta = is_water
        wi_world = _norm3(_to_world3(normal, wi_local))
        cos_theta = jnp.abs(wi_local[2])

        # ---- 5. env on miss (lat-long bilinear via one-hot MXU gather) ----
        miss = act & (~hit)
        theta_e = _acos(d[1])
        phi_e = _atan2(d[2], d[0])
        phi_e = jnp.where(phi_e < 0.0, phi_e + 2.0 * _PI, phi_e)
        phi_e = phi_e + env_rot
        phi_e = jnp.where(phi_e > 2.0 * _PI, phi_e - 2.0 * _PI, phi_e)
        ue = phi_e * jnp.float32(1.0 / (2.0 * _PI))
        ve = theta_e * jnp.float32(1.0 / _PI)
        xe = ue * ew - 0.5
        ye = ve * eh - 0.5
        x0f = jnp.floor(xe)
        y0f = jnp.floor(ye)
        fx = xe - x0f
        fy = ye - y0f
        x0i = x0f.astype(jnp.int32)
        y0i = y0f.astype(jnp.int32)
        x0i = jax.lax.rem(x0i, jnp.int32(ew))
        x0i = jnp.where(x0i < 0, x0i + ew, x0i)
        x1i = jax.lax.rem(x0i + 1, jnp.int32(ew))
        y0i = jnp.clip(y0i, 0, eh - 1)
        y1i = jnp.clip(y0i + 1, 0, eh - 1)
        sub_e = jax.lax.broadcasted_iota(jnp.int32, (ep, tm), 0)
        Wm = None
        for (yy, xx, ww) in ((y0i, x0i, (1 - fx) * (1 - fy)),
                             (y0i, x1i, fx * (1 - fy)),
                             (y1i, x0i, (1 - fx) * fy),
                             (y1i, x1i, fx * fy)):
            idx = yy * ew + xx
            oh_e = (sub_e == jnp.broadcast_to(idx, (ep, tm))).astype(
                jnp.float32) * jnp.broadcast_to(ww, (ep, tm))
            Wm = oh_e if Wm is None else Wm + oh_e
        env_rgb = jnp.dot(env_ref[:], Wm,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)   # (4, TM)
        env_w = jnp.where(miss, 1.0, 0.0)
        env_acc = _add3(env_acc, _mul3(tp, _scale3(_vecr(env_rgb, 0), env_w)))

        # ---- 6. NEE shadow paths: ALL s samples batched as (1, S*TM) rows
        # (sample-major: row-block j holds every ray's j-th sample) ----
        if s > 0:
            shadow_valid = hit & (~is_delta)
            pix_s = (jnp.broadcast_to(pix * jnp.int32(s), (s, tm))
                     + jax.lax.broadcasted_iota(jnp.int32, (s, tm), 0)
                     ).reshape(1, stm)
            sseed = _tea_i32(pix_s, jnp.full((1, stm), salt, jnp.int32))
            sseed, sx1 = _rnd_i32(sseed)
            sseed, sx2 = _rnd_i32(sseed)
            sseed, sx3 = _rnd_i32(sseed)
            if l_count == 1:
                B1 = lambda r: jnp.broadcast_to(
                    ltab_ref[r:r + 1, 0:1], (1, stm))
                lp0 = (B1(0), B1(1), B1(2))
                lp1 = (B1(3), B1(4), B1(5))
                lp2 = (B1(6), B1(7), B1(8))
                le = (B1(9), B1(10), B1(11))
            else:
                li = jnp.minimum(
                    jnp.floor(sx1 * l_count).astype(jnp.int32),
                    jnp.int32(l_count - 1))
                sub_l = jax.lax.broadcasted_iota(jnp.int32, (lp, stm), 0)
                oh_l = (sub_l == jnp.broadcast_to(li, (lp, stm))).astype(
                    jnp.float32)
                lrow = jnp.dot(ltab_ref[:], oh_l,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)  # (16,STM)
                lp0 = _vecr(lrow, 0)
                lp1 = _vecr(lrow, 3)
                lp2 = _vecr(lrow, 6)
                le = _vecr(lrow, 9)
            # uniform_sample_triangle (core/math.py)
            su = jnp.sqrt(sx2)
            b0 = 1.0 - su
            b1 = sx3 * su
            lpnt = _add3(lp0, _add3(_scale3(_sub3(lp1, lp0), b0),
                                    _scale3(_sub3(lp2, lp0), b1)))
            cr = _cross3(_sub3(lp1, lp0), _sub3(lp2, lp0))
            area = 0.5 * jnp.sqrt(_dot3(cr, cr))
            lnorm = _scale3(cr, 1.0 / jnp.maximum(2.0 * area, _EPS))
            area_pdf = 1.0 / jnp.maximum(area, _EPS) / l_count

            point_s = tuple(tile_s(q) for q in point)
            normal_s = tuple(tile_s(q) for q in normal)
            to_l = _sub3(lpnt, point_s)
            dist = jnp.sqrt(_dot3(to_l, to_l))
            wi_s = _scale3(to_l, 1.0 / jnp.maximum(dist, 1e-12))
            contrib_s = (
                jnp.maximum(0.0, -_dot3(lnorm, wi_s))
                * jnp.maximum(0.0, _dot3(wi_s, normal_s))
                / area_pdf
                / jnp.maximum(dist * dist, 1e-12)
                * jnp.float32(1.0 / _PI))
            beta = _mul3(tp, albedo)
            beta_s = tuple(tile_s(q) for q in beta)
            contrib = _mul3(_mul3(le, beta_s),
                            (contrib_s, contrib_s, contrib_s))

            # zero-contribution samples (light behind the surface, surface
            # behind the light) need no occlusion test — deactivating them
            # here skips ~half the shadow-trace work on unstructured scenes
            # with identical output
            valid_s = (tile_s(shadow_valid) & (contrib_s > 0.0)
                       & ((beta_s[0] + beta_s[1] + beta_s[2]) > 0.0))

            def occl_rows(point_t, wi_t, valid_t, dist_t, sn):
                """Occlusion bits (1, sn*TM) for sn sample rows per pixel
                (sample-major)."""
                n_r = sn * tm
                eps_r = jnp.full((1, n_r), jnp.float32(eps))
                if tiny:
                    # transposed dense any-hit, directly in shadow-row
                    # layout (no pack transpose, no selection loops)
                    rows8s = jnp.concatenate([
                        point_t[0], point_t[1], point_t[2],
                        wi_t[0], wi_t[1], wi_t[2],
                        jnp.where(valid_t, eps_r,
                                  jnp.full((1, n_r), jnp.float32(_FMAX))),
                        jnp.where(valid_t, dist_t * (1.0 - 1e-3),
                                  jnp.zeros((1, n_r), jnp.float32)),
                    ], axis=0)                               # (8, sn*TM)
                    t_o, ok_o = _mt_body_t(rows8s, tt_ref[:], ct, n_r)
                    ok_o = ok_o & (t_o < jnp.broadcast_to(rows8s[7:8, :],
                                                          t_o.shape))
                    return jnp.max(jnp.where(ok_o, 1, 0),
                                   axis=0, keepdims=True)    # (1, sn*TM)
                srays = _pack_rays_rows(point_t, wi_t, valid_t, eps_r,
                                        dist_t * (1.0 - 1e-3))  # (sn*TM, 8)
                if grouped:
                    occ = _grouped_occl_loop(
                        srays, gboxes_ref[:], mboxes_ref, table_ref, hbm_refs,
                        (occ_scr, vis_scr, keys_scr),
                        c=c, tm=n_r, k=k, kg=kg, g=grp,
                        recull=orecull)                      # (sn*TM, 1)
                    return jnp.transpose(occ, (1, 0))        # (1, sn*TM)
                if ssub > 1:
                    # IN-KERNEL SHADOW RETILING: the occlusion union toward
                    # the light grows with the tile's PIXEL footprint (the
                    # composed path's 32-pixel shadow tiles measured a
                    # large win over 128-pixel blocks).  Trace the sn*TM
                    # shadow rows as `ssub` subgroups of tm/ssub pixels
                    # (x their sn samples): static row slices of the
                    # sample-major block, one occl loop each, lanes
                    # reassembled sample-major.  Visits are never more than
                    # the single-block form (per-subgroup unions are
                    # subsets) and each visit costs 1/ssub the rows.
                    gsz = tm // ssub
                    parts = []
                    for p_i in range(ssub):
                        blk = jnp.concatenate(
                            [srays[j * tm + p_i * gsz:
                                   j * tm + p_i * gsz + gsz]
                             for j in range(sn)], axis=0)    # (sn*gsz, 8)
                        occ_p = _occl_recull_loop(
                            blk, boxes_ref[:], table_ref, hbm_refs,
                            (socc_scr, vis_scr, keys_scr),
                            c=c, tm=sn * gsz, k=k, recull=orecull)
                        parts.append(jnp.transpose(occ_p, (1, 0)))
                    return jnp.concatenate(
                        [parts[p_i][:, j * gsz:(j + 1) * gsz]
                         for j in range(sn) for p_i in range(ssub)],
                        axis=1)                              # (1, sn*TM)
                occ = _occl_recull_loop(
                    srays, boxes_ref[:], table_ref, hbm_refs,
                    (occ_scr, vis_scr, keys_scr),
                    c=c, tm=n_r, k=k, recull=orecull)        # (sn*TM, 1)
                return jnp.transpose(occ, (1, 0))            # (1, sn*TM)

            if ris and s > 1:
                # ---- RIS NEE (cfg.nee_mode="ris", streaming weighted
                # reservoir, Talbot et al. 2005): S light candidates, ONE
                # occlusion ray — pick j with p_j = w_j/W (w = unshadowed
                # contribution luminance), estimate c_j*V_j*W/(w_j*S); same
                # expectation as the S-ray sum at 1/S the shadow-trace
                # cost.  Selection order and the u draw bit-match
                # render/shade.py (the TEA i32 re-derivation). ----
                w_row = jnp.where(
                    valid_s, contrib[0] + contrib[1] + contrib[2], 0.0)
                cums, accw = [], None
                for j in range(s):
                    wj = w_row[:, j * tm:(j + 1) * tm]
                    accw = wj if accw is None else accw + wj
                    cums.append(accw)
                w_tot = accw                                 # (1, TM)
                u_salt = meta_i_ref[s_idx, 16 + b]
                useed = _tea_i32(pixc, jnp.full((1, tm), u_salt, jnp.int32))
                useed, u_draw = _rnd_i32(useed)
                thresh = u_draw * w_tot
                picked = jnp.zeros((1, tm), jnp.bool_)
                sel = []
                for j in range(s):
                    gt = cums[j] > thresh
                    sel.append(gt & (~picked))
                    picked = picked | gt

                def pick_row(x):                             # (1,S*TM)->(1,TM)
                    acc = jnp.zeros((1, tm), x.dtype)
                    for j in range(s):
                        acc = jnp.where(sel[j],
                                        x[:, j * tm:(j + 1) * tm], acc)
                    return acc

                wi_1 = tuple(pick_row(wi_s[ax]) for ax in range(3))
                dist_1 = pick_row(dist)
                c_1 = tuple(pick_row(contrib[comp]) for comp in range(3))
                w_1 = pick_row(w_row)
                valid_1 = picked                              # implies W>0
                scale_1 = w_tot / jnp.maximum(w_1, jnp.float32(1e-30))
                occ_r = occl_rows(point, wi_1, valid_1, dist_1, 1)
                wgt = jnp.where(valid_1 & (occ_r == 0),
                                scale_1 * jnp.float32(1.0 / s), 0.0)
                direct = tuple(direct[comp] + c_1[comp] * wgt
                               for comp in range(3))
            else:
                occ_r = occl_rows(point_s, wi_s, valid_s, dist, s)
                wgt = jnp.where(valid_s & (occ_r == 0),
                                jnp.float32(1.0 / s), 0.0)
                direct = tuple(
                    direct[comp] + jnp.sum(
                        (contrib[comp] * wgt).reshape(s, tm),
                        axis=0, keepdims=True)
                    for comp in range(3))

        # ---- next bounce state ----
        tp = _mul3(tp, _scale3(albedo, weight * cos_theta))
        tp = tuple(jnp.where(hit, q, 0.0) for q in tp)
        o = point
        d = wi_world
        act = hit
        if rr_start and rr_start <= b + 1 < bounces:
            # Russian roulette on paths entering bounce b+1 — bit-identical
            # to the composed form (render/shade.py RR_SALT stream): one
            # survival draw, p = clip(max throughput channel, RR_FLOOR, 1),
            # survivors compensate by 1/p
            rr_salt = meta_i_ref[s_idx, 24 + b]
            rseed = _tea_i32(pix, jnp.full((1, tm), rr_salt, jnp.int32))
            rseed, u_rr = _rnd_i32(rseed)
            p_rr = jnp.clip(jnp.maximum(tp[0], jnp.maximum(tp[1], tp[2])),
                            jnp.float32(0.05), jnp.float32(1.0))
            survive = u_rr < p_rr
            act = hit & survive
            tp = tuple(jnp.where(survive, q / p_rr, 0.0) for q in tp)

    # spp accumulation: the innermost grid dim revisits this out block
    @pl.when(s_idx == 0)
    def _():
        out_ref[:] = jnp.zeros((8, tm), jnp.float32)

    acc = jnp.concatenate(
        [direct[0], direct[1], direct[2],
         env_acc[0], env_acc[1], env_acc[2],
         jnp.zeros((2, tm), jnp.float32)], axis=0)
    out_ref[:] = out_ref[:] + acc


def fused_frame_supported(scene, lights, env, cfg) -> bool:
    """Static gate for the megakernel path (shapes only — no traced values)."""
    tex = scene.albedo_textures
    if tex is not None and tex.count > 0:
        # in-kernel texture fetch needs the pack-time scanline pool and
        # closest-hit-only semantics (alpha-cutout re-traces stay composed)
        if tex.has_cutout or tex.pool is None:
            return False
    if scene.curves is not None:
        # curve primitives composite in trace_api (composed pipeline only)
        return False
    if getattr(scene, "cl_xf", None) is not None:
        # instanced local geometry runs the composed pipeline (the frame
        # kernel's trace/attr-fetch has no object-space stage yet)
        return False
    if scene.cl_shade_table is None or scene.cl_mt_table is None:
        return False
    ehw = env.image.shape[0] * env.image.shape[1]
    if ehw > _ENV_ROWS_LIMIT:
        return False
    if lights.count < 1 or lights.count > _LIGHT_ROWS_LIMIT:
        return False
    if cfg.bounces > 8:
        return False
    k = scene.num_clusters
    s = cfg.shadow_path_count
    # grouped dispatch shrinks the per-ray matrices to (., Kg) at giant K
    # (same gate as render_frame_fused)
    if scene.cl_gboxes is not None and (1 + s) * TILE_RAYS * k * 4 > 4 * 2**20:
        k = scene.cl_gboxes.shape[1]
    recull_b = (1 + s) * TILE_RAYS * k * 4
    if recull_b > _RECULL_BYTES_LIMIT:
        return False
    if tex is not None and tex.count > 0:
        # combined VMEM budget (~16 MiB/core): texture pool + resident
        # trace table (0 when HBM-streamed or on the tiny transposed path)
        # + the per-ray recull matrices must coexist
        tab_b = resident_table_bytes(scene)
        if scene.cl_mt_table_t is not None or tab_b > VMEM_TABLE_LIMIT:
            tab_b = 0
        if tex.pool.size * 4 + tab_b + recull_b > 14 * 2**20:
            return False
    return True


@partial(jax.jit, static_argnames=("cfg", "spp", "tile_rays", "interpret",
                                   "recull", "orecull", "grouped", "ssub",
                                   "csub"))
def render_frame_fused(scene, lights, env, camera, base_sample, cfg,
                       spp: int = 1,
                       tile_rays: int = TILE_RAYS, interpret: bool = None,
                       recull: int = 8, orecull: int = 8,
                       grouped: bool = None, ssub: int = None,
                       csub: int = None):
    """`spp` samples of the whole-frame megakernel in ONE kernel launch
    (grid (tiles, spp), sample accumulation in the revisited out block).
    Returns summed (direct (npix,3), env (npix,3), diag) — divide by spp
    for the frame average.  Camera paths are generated in-kernel."""
    from ..render.pathgen import tiled_pixel_order_np
    from ..core.rng import tea

    tm = tile_rays
    npix = cfg.frame_buffer_size
    n = npix
    pad = (-n) % tm
    mp = n + pad

    order = tiled_pixel_order_np(cfg.width, cfg.height)
    pix_ids = jnp.asarray(
        np.concatenate([order, np.full((pad,), -1, np.int32)])[None, :])

    c = scene.tris_per_cluster
    k = scene.num_clusters
    s = cfg.shadow_path_count
    bounces = cfg.bounces

    # per-(sample, bounce) TEA salts (render/shade.py bounce_salt) + the
    # sample id for in-kernel camera jitter + per-bounce RIS u-draw salts
    # (render/shade.py RIS_SALT stream) + RR survival-draw salts (RR_SALT
    # stream): (SPP, 32) i32, cols 0-7 bounce salts, 8 sample id,
    # 16-23 RIS salts, 24-31 RR salts
    from ..render.shade import RIS_SALT, RR_SALT

    sample_ids = jnp.asarray(base_sample, jnp.int32) + jnp.arange(
        spp, dtype=jnp.int32)
    b_salts = [tea(sample_ids.astype(jnp.uint32), jnp.uint32(b))
               for b in range(bounces)]
    salts = jnp.stack(
        [bs.astype(jnp.int32) for bs in b_salts]
        + [jnp.zeros((spp,), jnp.int32)] * (8 - bounces)
        + [sample_ids]
        + [jnp.zeros((spp,), jnp.int32)] * 7
        + [tea(bs, jnp.uint32(RIS_SALT)).astype(jnp.int32) for bs in b_salts]
        + [jnp.zeros((spp,), jnp.int32)] * (8 - bounces)
        + [tea(bs, jnp.uint32(RR_SALT)).astype(jnp.int32) for bs in b_salts]
        + [jnp.zeros((spp,), jnp.int32)] * (8 - bounces), axis=1)  # (SPP, 32)

    aspect = jnp.float32(cfg.width / cfg.height)
    meta_f = jnp.concatenate(
        [scene.scene_aabb[0], scene.scene_aabb[1],
         jnp.asarray(env.rotation_offset, jnp.float32)[None],
         jnp.zeros((1,), jnp.float32),
         camera.origin, camera.forward, camera.right, camera.up,
         jnp.asarray(camera.tan_half_fov, jnp.float32)[None],
         (jnp.asarray(camera.tan_half_fov, jnp.float32) * aspect)[None],
         jnp.zeros((2,), jnp.float32)])[None, :]              # (1, 24) f32

    # light table rows [p0, p1, p2, radiance, pad4]
    l_count = lights.count
    lp = max(8, -(-l_count // 8) * 8)
    ltab = jnp.concatenate(
        [lights.p0, lights.p1, lights.p2, lights.radiance,
         jnp.zeros((l_count, 4), jnp.float32)], axis=1)
    ltab = jnp.pad(ltab, ((0, lp - l_count), (0, 0))).T       # (16, lp)

    # flattened env image, components as sublane rows: (4, ep)
    eh, ew = env.image.shape[0], env.image.shape[1]
    ehw = eh * ew
    ep = max(8, -(-ehw // 8) * 8)
    env_flat = jnp.concatenate(
        [env.image.reshape(ehw, 3).T, jnp.zeros((1, ehw), jnp.float32)],
        axis=0)
    env_flat = jnp.pad(env_flat, ((0, 0), (0, ep - ehw)))     # (4, ep)

    boxes = scene.cl_boxes
    table = scene.cl_mt_table.reshape(k, 16, c)
    shade_t = scene.cl_shade_table.reshape(k, 24, c)

    # two-level grouped dispatch at giant K (pallas_resident policy): the
    # flat (., K) cull/rekeys matrices of the trace and occlusion loops
    # dominate large scenes; grouped runs them at (., Kg)
    # RIS NEE (cfg.nee_mode): one reservoir-selected occlusion ray per
    # shading point — the occlusion loops then run at TM rows, not S*TM
    ris = cfg.nee_mode == "ris" and s > 1
    s_occ = 1 if ris else max(s, 1)
    can_group = scene.cl_gboxes is not None
    if grouped is None:
        # the binding matrix is the OCCLUSION loop's ((1+s_occ)*TM, K)
        # per-ray enter/rekeys state, not the closest loop's (TM, K)
        grouped = can_group and (1 + s_occ) * tm * k * 4 > 4 * 2**20
    grouped = grouped and can_group
    kg = scene.cl_gboxes.shape[1] if can_group else k
    grp = scene.cl_mboxes.shape[1] if can_group else 1
    gboxes = scene.cl_gboxes if can_group else boxes
    mboxes = scene.cl_mboxes if can_group else jnp.zeros((1, 1, 8), jnp.float32)
    k_scr = kg if grouped else k

    hbm = resident_table_bytes(scene) > VMEM_TABLE_LIMIT
    # small scenes (pack-time transposed tables): the in-kernel trace +
    # attribute fetch + occlusion all run the transposed dense form — no
    # selection loops, no per-distinct-cluster DMA fetch
    tiny = (scene.cl_mt_table_t is not None
            and scene.cl_shade_table_t is not None)
    if tiny:
        hbm = False
        grouped = False
        tt_tab = scene.cl_mt_table_t
        st_tab = scene.cl_shade_table_t
        ct = tt_tab.shape[0]
    else:
        tt_tab = jnp.zeros((8, 16), jnp.float32)
        st_tab = jnp.zeros((8, 24), jnp.float32)
        ct = 8
    c_k = c
    if c % 128:
        # both the HBM trace DMA and the attr-fetch DMA slice the lane dim
        c_k = -(-c // 128) * 128
        table = jnp.pad(table, ((0, 0), (0, 0), (0, c_k - c)))
        shade_t = jnp.pad(shade_t, ((0, 0), (0, 0), (0, c_k - c)))
    if hbm:
        # 16-row pack-time layout keeps the HBM DMA slices sublane-aligned
        # (shade's 24 rows are already aligned)
        if grouped:
            # whole-group streaming layout (Kg, G, 16, C)
            table = jnp.pad(table, ((0, kg * grp - k), (0, 0), (0, 0)))
            table = table.reshape(kg, grp, 16, c_k)

    # in-kernel texture fetch (see PackedTextures.pool)
    tex = scene.albedo_textures
    textured = (tex is not None and tex.count > 0 and tex.pool is not None
                and not tex.has_cutout)
    if textured:
        tpool, tmeta = tex.pool, tex.pool_meta
        tr, twm, ntp = tpool.shape[0], tpool.shape[1] // 3, tmeta.shape[1]
    else:
        tpool = jnp.zeros((8, 384), jnp.float32)
        tmeta = jnp.zeros((8, 8), jnp.float32)
        tr, twm, ntp = 8, 128, 8

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # grid (tiles, spp), spp innermost: consecutive sample steps see the
    # SAME pix/out block (the out revisit accumulates)
    pix_spec = pl.BlockSpec((1, tm), lambda i, si: (0, i),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((8, tm), lambda i, si: (0, i),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pl.ANY if hbm else pltpu.VMEM)
    shade_spec = pl.BlockSpec(memory_space=pl.ANY)

    scratch = []
    if hbm:
        if grouped:
            scratch += [pltpu.VMEM((2, grp, 16, c_k), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))]
        else:
            scratch += [pltpu.VMEM((3, 16, c_k), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))]
    # in-kernel shadow retiling (see _frame_kernel NEE block): subgroups of
    # tm/ssub pixels bound the occlusion union toward the light.  Auto-on
    # for the selection-loop paths; the tiny transposed any-hit is dense
    # (no unions) and the grouped loop keeps its own stm-row state.
    if ssub is None:
        ssub = 4 if (not tiny and not grouped and s > 0
                     and tm % 4 == 0 and (s_occ * tm) // 4 % 8 == 0) else 1
    if tiny or grouped or s == 0:
        ssub = 1
    # sub-blocked BOUNCE closest traces (csub subgroups of tm/csub pixels):
    # default off until measured — set explicitly or via the sweep knobs
    if csub is None:
        csub = 1
    if tiny or grouped or bounces < 2 or tm % csub or (tm // csub) % 8:
        csub = 1
    scratch += [
        pltpu.VMEM((1, 24, c_k), jnp.float32),
        pltpu.SemaphoreType.DMA((1,)),
        pltpu.VMEM((tm, 1), jnp.int32),       # skb
        pltpu.VMEM((tm, 1), jnp.int32),       # slot
        pltpu.VMEM((1, k_scr), jnp.int32),    # vis
        pltpu.VMEM((1, k_scr), jnp.int32),    # keys
        pltpu.VMEM((s_occ * tm, 1), jnp.int32),       # occ
        pltpu.VMEM((40, tm), jnp.float32),    # attr rows
        pltpu.VMEM((1, tm), jnp.int32),       # attr-fetch done mask
    ]
    if ssub > 1:
        scratch += [pltpu.VMEM((s_occ * (tm // ssub), 1), jnp.int32)]  # socc

    (out,) = pl.pallas_call(
        partial(_frame_kernel, c=c_k, tm=tm, k=k, kg=kg, grp=grp,
                grouped=grouped, s=s, bounces=bounces,
                lp=lp, l_count=l_count, ep=ep, eh=eh, ew=ew,
                eps=cfg.t_epsilon, hbm=hbm, recull=recull, orecull=orecull,
                width=cfg.width, height=cfg.height, tiny=tiny, ct=ct,
                textured=textured, tr=tr, twm=twm, ntp=ntp, ssub=ssub,
                csub=csub, ris=ris, rr_start=cfg.russian_roulette),
        grid=(mp // tm, spp),
        in_specs=[pix_spec, vmem, vmem, vmem, table_spec, shade_spec,
                  vmem, vmem, vmem, vmem, vmem, vmem, smem, smem],
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((8, mp), jnp.float32)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(pix_ids, boxes, gboxes, mboxes, table, shade_t, tt_tab, st_tab,
      ltab, env_flat, tpool, tmeta, salts, meta_f)

    # ray order -> pixel order (tiled_pixel_order is a static permutation)
    inv = np.zeros((npix,), np.int32)
    inv[order] = np.arange(npix, dtype=np.int32)
    out = jnp.take(out[:, :n].T, jnp.asarray(inv), axis=0)
    direct = out[:, 0:3]
    env_img = out[:, 3:6]
    return direct, env_img, jnp.int32(0)


def render_sample_fused(scene, lights, env, camera, sample_count, cfg,
                        tile_rays: int = TILE_RAYS, interpret: bool = None,
                        recull: int = 8, orecull: int = 8, ssub: int = None,
                        csub: int = None):
    """One spp — same contract as render/engine.py render_sample:
    (direct (npix,3), env (npix,3), diag)."""
    return render_frame_fused(scene, lights, env, camera, sample_count, cfg,
                              spp=1, tile_rays=tile_rays, interpret=interpret,
                              recull=recull, orecull=orecull, ssub=ssub,
                              csub=csub)
