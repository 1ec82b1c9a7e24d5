"""Vectorized geometry/sampling math.

Replaces the reference's header-only device math (`moana/core/{vec3,frame,
coordinates}.hpp` — not in the snapshot, conventions reconstructed from call
sites) and the sampling/Fresnel helpers (/root/reference/optix/sample.hpp:7-36,
/root/reference/optix/bsdfs/water.hpp:12-94). Everything operates on
(..., 3) arrays so it vectorizes over a whole wavefront.

Conventions (documented because the base headers are absent upstream):
  * y-up world; spherical: theta = acos(y) in [0, pi], phi = atan2(z, x)
    wrapped to [0, 2pi).
  * Local shading frames have the normal on +z (matches `wiLocal.z` use at
    /root/reference/optix/kernel.cu:433).
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), EPS)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cartesian_to_spherical(d):
    """Direction -> (phi in [0,2pi), theta in [0,pi]). y-up."""
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    return phi, theta


def spherical_for_train(d):
    """Spherical parameterization used for proxy-MLP inputs
    (reference `cartesianToSphericalForTrain`, call sites at
    /root/reference/optix/secondary_ray_kernel.cu:279,320). Same convention as
    `cartesian_to_spherical`; kept separate so the training-data and inference
    featurizations stay in lockstep by construction."""
    return cartesian_to_spherical(d)


def make_frame(n):
    """Branchless orthonormal basis around normal n (Duff et al. 2017).
    Returns (t, b): tangent/bitangent with n as +z."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    bt = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t, bt


def to_world(n, w_local):
    """Local (z=normal) -> world."""
    t, b = make_frame(n)
    return (
        w_local[..., 0:1] * t + w_local[..., 1:2] * b + w_local[..., 2:3] * n
    )


def to_local(n, w_world):
    """World -> local (z=normal)."""
    t, b = make_frame(n)
    return jnp.stack([dot(w_world, t), dot(w_world, b), dot(w_world, n)], axis=-1)


def uniform_hemisphere(xi1, xi2):
    """Uniform hemisphere sample around +z
    (reference /root/reference/optix/sample.hpp:7-17: z = xi1)."""
    z = xi1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * xi2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sample_triangle(p0, p1, p2, xi1, xi2):
    """Uniform area sample of a triangle; returns (point, normal, area_pdf).
    Replaces `Triangle::sample` (base repo, call site
    /root/reference/optix/kernel.cu:96)."""
    su = jnp.sqrt(xi1)
    b0 = 1.0 - su
    b1 = xi2 * su
    point = p0 + b0[..., None] * (p1 - p0) + b1[..., None] * (p2 - p0)
    cr = jnp.cross(p1 - p0, p2 - p0)
    area = 0.5 * jnp.linalg.norm(cr, axis=-1)
    normal = cr / jnp.maximum(2.0 * area[..., None], EPS)
    return point, normal, 1.0 / jnp.maximum(area, EPS)


def reflect_z(w):
    """Reflect about the local +z axis."""
    return jnp.stack([-w[..., 0], -w[..., 1], w[..., 2]], axis=-1)


def refract_z(wo, eta_incident, eta_transmitted):
    """Snell refraction in the local frame (normal = +z). Returns
    (wi, total_internal_reflection_mask). Matches `Snell::refract` semantics
    used by the Water BSDF (/root/reference/optix/bsdfs/water.hpp:31-36)."""
    eta = eta_incident / eta_transmitted
    cos_i = jnp.abs(wo[..., 2])
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    sign = jnp.where(wo[..., 2] >= 0.0, 1.0, -1.0)
    wi = jnp.stack(
        [
            -eta * wo[..., 0],
            -eta * wo[..., 1],
            -sign * cos_t,
        ],
        axis=-1,
    )
    return wi, tir


def dielectric_reflectance(cos_theta_i, eta_incident, eta_transmitted):
    """Exact Fresnel reflectance for a dielectric (unpolarized).
    Replaces `Fresnel::dielectricReflectance` (call site
    /root/reference/optix/bsdfs/water.hpp:38-42)."""
    cos_i = jnp.clip(cos_theta_i, 0.0, 1.0)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    eta = eta_incident / eta_transmitted
    sin2_t = eta * eta * sin2_i
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    r_parl = (eta_transmitted * cos_i - eta_incident * cos_t) / jnp.maximum(
        eta_transmitted * cos_i + eta_incident * cos_t, EPS
    )
    r_perp = (eta_incident * cos_i - eta_transmitted * cos_t) / jnp.maximum(
        eta_incident * cos_i + eta_transmitted * cos_t, EPS
    )
    f = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def ray_aabb(origin, inv_dir, t_min, t_max, box_min, box_max):
    """Slab test; returns (hit_mask, t_enter, t_exit). Reference math:
    /root/reference/src/cuda/bvh_intersection.cu:33-99. Broadcasts over any
    leading dims."""
    t0 = (box_min - origin) * inv_dir
    t1 = (box_max - origin) * inv_dir
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    t_enter = jnp.maximum(jnp.max(near, axis=-1), t_min)
    t_exit = jnp.minimum(jnp.min(far, axis=-1), t_max)
    return t_enter <= t_exit, t_enter, t_exit
