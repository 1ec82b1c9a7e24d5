"""Shading stage — TPU port of the reference "MainRay" kernel
(/root/reference/optix/kernel.cu:362-466): given settled closest hits, sample
the BSDF, emit the next bounce path, and emit `shadow_path_count` NEE shadow
paths carrying their full unoccluded contribution in `throughput`.

Everything is masked vector math over the whole wavefront; per-triangle
attributes (smooth normals, uv, material) are gathered from the reordered
triangle soup instead of being produced by hit programs
(/root/reference/optix/kernel.cu:171-300).

RNG note: the reference seeds BSDF/light sampling with
tea(pixelIndex, sampleCount) only (/root/reference/optix/kernel.cu:54,75),
which replays identical random numbers at every bounce of a sample. We fold
the bounce index into the seed (documented, deliberate divergence — removes
bounce-to-bounce correlation; per-primitive RNG remains bit-exact TEA/LCG).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as cmath
from ..core.rng import rnd, rnd2, rnd3, tea
from ..core.types import BSDF_DIFFUSE, BSDF_WATER, PathState
from ..scene.geometry import DeviceScene
from ..scene.lights import EnvironmentMap, LightTable

# np scalar, not jnp: a module-level jax Array becomes a hoisted
# jaxpr CONSTANT of every traced program that closes over it (extra
# hidden executable params; breaks AOT Compiled calls)
_F32_MAX = np.float32(3.402823466e38)
# TEA stream id for the RIS reservoir u draw ("RIS1") — shared with the
# in-kernel form (ops/pallas_frame.py) so both paths select identically
RIS_SALT = 0x52495331
# TEA stream id for the Russian-roulette survival draw ("RR01"); shared with
# the in-kernel form for bit-identical composed-vs-fused roulette decisions
RR_SALT = 0x52523031
# survival-probability floor: bounds the 1/p compensation (variance) and
# guarantees bright paths are never rouletted (p = 1 when throughput >= 1)
RR_FLOOR = 0.05


class SurfaceAttributes(NamedTuple):
    point: jax.Array      # (N,3) hit position
    normal: jax.Array     # (N,3) shading normal, flipped toward wo
    albedo: jax.Array     # (N,3)
    bsdf_type: jax.Array  # (N,) i32
    is_inside: jax.Array  # (N,) bool


def surface_attributes(scene: DeviceScene, origin, direction, hits) -> SurfaceAttributes:
    """Gather + interpolate hit attributes (reference __closesthit__ch,
    /root/reference/optix/kernel.cu:171-300)."""
    tri = jnp.maximum(hits.tri_index, 0)
    inst_lin = None
    if scene.instanced:
        # virtual id = instance * num_base_tris + base canonical id
        # (ops/pallas_resident.py instanced epilogue); attribute tables are
        # BASE-level, normals need the instance rotation
        tb_count = scene.num_base_tris
        inst = tri // tb_count
        tri = tri - inst * tb_count
        xf = jnp.take(scene.cl_xf.reshape(-1, 16), inst, axis=0)
        inst_lin = xf[:, 0:9].reshape(-1, 3, 3)   # world_to_obj = M^-1
    u = hits.u[:, None]
    v = hits.v[:, None]
    w = 1.0 - u - v

    if scene.tri_shade is not None:
        # ONE wide row gather per ray (launch count dominates this backend;
        # layout in scene/geometry.py DeviceScene docstring)
        row = jnp.take(scene.tri_shade, tri, axis=0)  # (N, 24)
        n0, n1, n2 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
        uv0, uv1, uv2 = row[:, 9:11], row[:, 11:13], row[:, 13:15]
        albedo = row[:, 15:18]
        bsdf_type = row[:, 18].astype(jnp.int32)
        tex_idx = row[:, 19].astype(jnp.int32)
    else:
        n0 = jnp.take(scene.n0, tri, axis=0)
        n1 = jnp.take(scene.n1, tri, axis=0)
        n2 = jnp.take(scene.n2, tri, axis=0)
        uv0 = jnp.take(scene.uv0, tri, axis=0)
        uv1 = jnp.take(scene.uv1, tri, axis=0)
        uv2 = jnp.take(scene.uv2, tri, axis=0)
        mesh = jnp.take(scene.tri_mesh_id, tri, axis=0)
        albedo = jnp.take(scene.mesh_base_color, mesh, axis=0)
        bsdf_type = jnp.take(scene.mesh_bsdf_type, mesh, axis=0)
        tex_idx = jnp.take(scene.mesh_texture_index, mesh, axis=0)

    # barycentric convention: alpha=u weights n1, beta=v weights n2
    # (reference kernel.cu:243-245)
    normal = w * n0 + u * n1 + v * n2
    if inst_lin is not None:
        # object->world normal transform: n_w ∝ (M^-1)^T n_o = lin^T n_o
        normal = jnp.einsum("nji,nj->ni", inst_lin, normal)
    normal = cmath.normalize(normal)

    # albedo-texture fetch at interpolated uv (kernel.cu:256-283)
    if scene.albedo_textures is not None and scene.albedo_textures.count > 0:
        from ..scene.textures import sample_textures

        uv = w * uv0 + u * uv1 + v * uv2
        rgba = sample_textures(scene.albedo_textures, tex_idx, uv[:, 0], uv[:, 1])
        albedo = jnp.where((tex_idx >= 0)[:, None], rgba[:, :3], albedo)

    t = jnp.where(hits.is_hit, hits.t, 0.0)
    point = origin + t[:, None] * direction

    if scene.curves is not None:
        # curve winners (trace_api composite): tri_index = -2 - piece.
        # Recompute the round-cone surface normal at the hit point (the
        # axial coordinate y = dot(pos - pa, ba) matches the intersector's,
        # ops/curve_intersect.py) and shade diffuse in the strand color —
        # the reference's hair shading path.
        is_curve = hits.tri_index <= -2
        piece = jnp.where(is_curve, -2 - hits.tri_index, 0)
        cs = scene.curves
        pa = jnp.take(cs.p0, piece, axis=0)
        pb = jnp.take(cs.p1, piece, axis=0)
        ba = pb - pa
        oa = point - pa
        y = jnp.sum(oa * ba, axis=-1)
        rr = jnp.take(cs.r0, piece) - jnp.take(cs.r1, piece)
        d2 = jnp.sum(ba * ba, axis=-1) - rr * rr
        n_side = d2[:, None] * oa - ba * y[:, None]
        n_curve = jnp.where((y <= 0.0)[:, None], oa,
                            jnp.where((y >= d2)[:, None], point - pb, n_side))
        n_curve = cmath.normalize(n_curve)
        normal = jnp.where(is_curve[:, None], n_curve, normal)
        albedo = jnp.where(is_curve[:, None], cs.color[None, :], albedo)
        bsdf_type = jnp.where(is_curve, BSDF_DIFFUSE, bsdf_type)

    wo = -direction
    cos = jnp.sum(normal * wo, axis=-1)
    is_inside = cos < 0.0
    normal = jnp.where(is_inside[:, None], -normal, normal)

    return SurfaceAttributes(point, normal, albedo, bsdf_type, is_inside)


def bsdf_sample(xi1, xi2, attrs: SurfaceAttributes, wo_world):
    """Vectorized Lambertian + Water sampling, selected per lane by material
    (reference /root/reference/optix/bsdfs/{lambertian,water}.hpp)."""
    # Lambertian: uniform hemisphere, weight 2 (lambertian.hpp:17-19).
    wi_diffuse = cmath.uniform_hemisphere(xi1, xi2)
    weight_diffuse = jnp.full_like(xi1, 2.0)

    # Water: Fresnel dielectric eta 1.0/1.33 (water.hpp:12-94).
    wo = cmath.to_local(attrs.normal, wo_world)
    eta_i = jnp.where(attrs.is_inside, 1.33, 1.0)
    eta_t = jnp.where(attrs.is_inside, 1.0, 1.33)
    wi_refract, _ = cmath.refract_z(wo, eta_i, eta_t)
    fresnel = cmath.dielectric_reflectance(jnp.abs(wo[..., 2]), eta_i, eta_t)
    reflecting = xi1 < fresnel
    wi_reflect = cmath.reflect_z(wo)
    wi_water = jnp.where(reflecting[:, None], wi_reflect, wi_refract)
    cos_wi = jnp.abs(wi_water[..., 2])
    safe_cos = jnp.maximum(cos_wi, 1e-12)
    # reflect: (F/cos)/F = 1/cos; refract: ((1-F)/cos)*(etaI/etaT)^2/(1-F)
    eta_corr = (eta_i / eta_t) ** 2
    weight_water = jnp.where(reflecting, 1.0 / safe_cos, eta_corr / safe_cos)
    weight_water = jnp.where(cos_wi == 0.0, 0.0, weight_water)

    is_water = attrs.bsdf_type == BSDF_WATER
    wi_local = jnp.where(is_water[:, None], wi_water, wi_diffuse)
    weight = jnp.where(is_water, weight_water, weight_diffuse)
    is_delta = is_water
    return wi_local, weight, is_delta


def shade(
    scene: DeviceScene,
    lights: LightTable,
    env: EnvironmentMap,
    paths: PathState,
    hits,
    sample_count,
    bounce,
    shadow_path_count: int,
    frame_buffer_size: int,
    nee_mode: str = "sum",
    rr: bool = False,
):
    """One shade pass. Returns (next_paths, shadow_paths, env_image_add).

    rr=True applies Russian roulette to the paths this call emits for the
    NEXT bounce (caller gates it by RenderConfig.russian_roulette): survival
    probability p = clip(max channel of the next throughput, RR_FLOOR, 1);
    survivors divide by p, so the estimator expectation is unchanged while
    dim paths stop feeding the (dominant) bounce-closest traces.  The
    reference has no RR (optix/kernel.cu:424-439) — this is a deliberate
    beyond-parity estimator lever.

    nee_mode="ris" emits ONE reservoir-selected shadow path per shading
    point instead of shadow_path_count (RenderConfig.nee_mode docs);
    consumers' contract is unchanged (contribution = throughput /
    shadow_path_count when unoccluded).

    * misses: accumulate throughput * env(direction) into the env image and
      invalidate (kernel.cu:415-422)
    * hits: next path with throughput *= weight * |wi_local.z| * albedo
      (kernel.cu:424-437) and shadow_path_count NEE paths whose throughput
      carries the full contribution Le*beta*albedo*G/areaPDF/d^2/pi
      (kernel.cu:444-465)."""
    n = paths.capacity
    attrs = surface_attributes(scene, paths.origin, paths.direction, hits)
    wo_world = -paths.direction

    live = paths.is_valid & (~paths.is_shadow)
    hit = live & hits.is_hit
    miss = live & (~hits.is_hit)

    # --- environment on miss ---
    env_radiance = env.sample(paths.direction)
    env_contrib = jnp.where(miss[:, None], paths.throughput * env_radiance, 0.0)
    env_image_add = jax.ops.segment_sum(
        env_contrib, paths.pixel_index, num_segments=frame_buffer_size
    )

    # --- BSDF sample ---
    bounce_salt = tea(jnp.uint32(sample_count), jnp.uint32(bounce))
    seed = tea(paths.pixel_index.astype(jnp.uint32), bounce_salt)
    _, xi1, xi2 = rnd2(seed)
    wi_local, weight, is_delta = bsdf_sample(xi1, xi2, attrs, wo_world)
    wi_world = cmath.normalize(cmath.to_world(attrs.normal, wi_local))
    cos_theta = jnp.abs(wi_local[..., 2])

    next_throughput = paths.throughput * (weight * cos_theta)[:, None] * attrs.albedo
    next_live = hit
    if rr:
        rseed = tea(paths.pixel_index.astype(jnp.uint32),
                    tea(bounce_salt, jnp.uint32(RR_SALT)))
        _, u_rr = rnd(rseed)
        p = jnp.clip(
            jnp.maximum(next_throughput[:, 0],
                        jnp.maximum(next_throughput[:, 1],
                                    next_throughput[:, 2])),
            jnp.float32(RR_FLOOR), jnp.float32(1.0))
        survive = u_rr < p
        next_live = hit & survive
        next_throughput = next_throughput / p[:, None]
    next_paths = PathState(
        origin=attrs.point,
        direction=wi_world,
        tmax=jnp.full((n,), _F32_MAX),
        throughput=jnp.where(next_live[:, None], next_throughput, 0.0),
        pixel_index=paths.pixel_index,
        shadow_path_id=jnp.full((n,), -1, jnp.int32),
        visited_mask=jnp.zeros((n,), jnp.uint32),
        current_node=jnp.full((n,), -1, jnp.int32),
        target_node=jnp.full((n,), -1, jnp.int32),
        is_shadow=jnp.zeros((n,), bool),
        is_delta=is_delta & next_live,
        is_valid=next_live,
        is_hit=jnp.zeros((n,), bool),
        hit_tri=jnp.full((n,), -1, jnp.int32),
        hit_u=jnp.zeros((n,), jnp.float32),
        hit_v=jnp.zeros((n,), jnp.float32),
    )

    # --- NEE shadow paths: S per shading point ---
    s = shadow_path_count
    pix = jnp.repeat(paths.pixel_index, s)  # (N*S,)
    spid = jnp.tile(jnp.arange(s, dtype=jnp.int32), (n,))
    sseed = tea(
        (pix * s + spid).astype(jnp.uint32),
        bounce_salt,
    )
    _, sx1, sx2, sx3 = rnd3(sseed)

    light_index = jnp.minimum(
        jnp.floor(sx1 * lights.count).astype(jnp.int32), lights.count - 1
    )
    lp0 = jnp.take(lights.p0, light_index, axis=0)
    lp1 = jnp.take(lights.p1, light_index, axis=0)
    lp2 = jnp.take(lights.p2, light_index, axis=0)
    le = jnp.take(lights.radiance, light_index, axis=0)
    light_point, light_normal, area_pdf = cmath.uniform_sample_triangle(lp0, lp1, lp2, sx2, sx3)
    area_pdf = area_pdf / lights.count  # lightChoicePDF (kernel.cu:98-99)

    rep = lambda a: jnp.repeat(a, s, axis=0)
    origin_s = rep(attrs.point)
    to_light = light_point - origin_s
    dist = jnp.linalg.norm(to_light, axis=-1)
    wi = to_light / jnp.maximum(dist[:, None], 1e-12)

    contribution = (
        le
        * rep(paths.throughput)
        * rep(attrs.albedo)
        * jnp.maximum(0.0, jnp.sum(light_normal * (-wi), axis=-1))[:, None]
        * jnp.maximum(0.0, jnp.sum(wi * rep(attrs.normal), axis=-1))[:, None]
        / area_pdf[:, None]
        / jnp.maximum(dist * dist, 1e-12)[:, None]
        / jnp.pi
    )

    # zero-contribution samples (light behind the surface / surface behind
    # the light / black throughput) need no occlusion trace — all factors
    # are nonnegative, so a zero sum means the add is zero either way
    shadow_valid = rep(hit & (~is_delta)) & (jnp.sum(contribution, axis=-1) > 0.0)

    if nee_mode == "ris" and s > 1:
        # ---- RIS NEE (streaming weighted reservoir, Talbot et al. 2005):
        # keep the S light candidates but trace ONE occlusion ray, chosen
        # with probability w_j/W (w = unshadowed contribution luminance);
        # throughput carries c_j * W / w_j so consumers' /shadow_path_count
        # yields the unbiased estimate c_j*V_j*W/(w_j*S) — same expectation
        # as the reference's S-ray sum (kernel.cu:444-465) at 1/S the
        # shadow-trace cost.  Weight-sum order and the u draw bit-match the
        # in-kernel form (ops/pallas_frame.py RIS block). ----
        w_all = jnp.where(
            shadow_valid,
            contribution[:, 0] + contribution[:, 1] + contribution[:, 2],
            0.0).reshape(n, s)
        cums, accw = [], None
        for j in range(s):
            accw = w_all[:, j] if accw is None else accw + w_all[:, j]
            cums.append(accw)
        cum = jnp.stack(cums, axis=1)                        # (n, s)
        w_tot = cums[-1]                                     # (n,)
        useed = tea(paths.pixel_index.astype(jnp.uint32),
                    tea(bounce_salt, jnp.uint32(RIS_SALT)))
        _, u_draw = rnd(useed)
        thresh = u_draw * w_tot
        pick = jnp.argmax(cum > thresh[:, None], axis=1)     # first True
        row = jnp.arange(n, dtype=jnp.int32) * s + pick.astype(jnp.int32)
        sel = lambda a: jnp.take(a, row, axis=0)
        w_sel = jnp.take(w_all.reshape(n * s), row)
        valid_1 = (w_tot > 0.0) & hit & (~is_delta)
        scale = jnp.where(valid_1, w_tot / jnp.maximum(w_sel, 1e-30), 0.0)
        shadow_paths = PathState(
            origin=attrs.point,
            direction=sel(wi),
            tmax=sel(dist),
            throughput=jnp.where(valid_1[:, None],
                                 sel(contribution) * scale[:, None], 0.0),
            pixel_index=paths.pixel_index,
            shadow_path_id=jnp.zeros((n,), jnp.int32),
            visited_mask=jnp.zeros((n,), jnp.uint32),
            current_node=jnp.full((n,), -1, jnp.int32),
            target_node=jnp.full((n,), -1, jnp.int32),
            is_shadow=jnp.ones((n,), bool),
            is_delta=jnp.zeros((n,), bool),
            is_valid=valid_1,
            is_hit=jnp.zeros((n,), bool),
            hit_tri=jnp.full((n,), -1, jnp.int32),
            hit_u=jnp.zeros((n,), jnp.float32),
            hit_v=jnp.zeros((n,), jnp.float32),
        )
        return next_paths, shadow_paths, env_image_add

    shadow_paths = PathState(
        origin=origin_s,
        direction=wi,
        tmax=dist,
        throughput=jnp.where(shadow_valid[:, None], contribution, 0.0),
        pixel_index=pix,
        shadow_path_id=spid,
        visited_mask=jnp.zeros((n * s,), jnp.uint32),
        current_node=jnp.full((n * s,), -1, jnp.int32),
        target_node=jnp.full((n * s,), -1, jnp.int32),
        is_shadow=jnp.ones((n * s,), bool),
        is_delta=jnp.zeros((n * s,), bool),
        is_valid=shadow_valid,
        is_hit=jnp.zeros((n * s,), bool),
        hit_tri=jnp.full((n * s,), -1, jnp.int32),
        hit_u=jnp.zeros((n * s,), jnp.float32),
        hit_v=jnp.zeros((n * s,), jnp.float32),
    )

    return next_paths, shadow_paths, env_image_add
