"""Proxy-MLP training-data generation by ray casting real geometry.

Port of the reference's offline precompute kernels
(/root/reference/optix/vis_ray_kernel.cu:98-161 and
/root/reference/optix/precom_ray_kernel.cu:193-299): rays are cast at one
object; each sample records the 5 network input features (normalized
AABB-local entry point + normalized spherical direction) and the label
(normalized depth from the AABB entry to the real hit; 1.0 on miss). Reuses
the production traversal op, so the training distribution matches inference
featurization by construction (same code path as render/proxy_stages.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as cmath
from ..ops.traversal import traverse_bvh
from ..scene.geometry import DeviceScene


def _sample_entry_rays(key, aabb_min, aabb_max, n):
    """Random rays guaranteed to enter the AABB: origin on a random face,
    direction toward a random interior point (the data distribution the
    proxies see at render time: rays crossing the box)."""
    k1, k2, k3 = jax.random.split(key, 3)
    span = aabb_max - aabb_min

    face = jax.random.randint(k1, (n,), 0, 6)
    uv = jax.random.uniform(k2, (n, 3))
    p = aabb_min + uv * span
    axis = face // 2
    hi = (face % 2).astype(jnp.float32)
    face_coord = aabb_min[None, :] + hi[:, None] * span[None, :]  # (n, 3)
    p = jnp.where(jnp.arange(3)[None, :] == axis[:, None], face_coord, p)

    interior = aabb_min + jax.random.uniform(k3, (n, 3)) * span
    d = cmath.normalize(interior - p)
    return p, d


def generate_proxy_dataset(
    scene: DeviceScene,
    aabb_min,
    aabb_max,
    num_samples: int,
    seed: int = 0,
    eps: float = 1e-4,
    batch: int = 65536,
):
    """Cast rays at one partition's geometry. Returns (features (N,5) f32,
    depth_labels (N,) f32 in [0,1], 1.0 = miss).

    Labels follow precom_ray_kernel.cu:193-299: depth normalized by the AABB
    diagonal, measured from the AABB entry point."""
    aabb_min = jnp.asarray(aabb_min, jnp.float32)
    aabb_max = jnp.asarray(aabb_max, jnp.float32)
    span = jnp.maximum(aabb_max - aabb_min, 1e-12)
    max_length = jnp.linalg.norm(aabb_max - aabb_min)

    feats_out, labels_out = [], []
    key = jax.random.PRNGKey(seed)
    done = 0
    while done < num_samples:
        n = min(batch, num_samples - done)
        key, sub = jax.random.split(key)
        origin, direction = _sample_entry_rays(sub, aabb_min, aabb_max, n)

        hits = traverse_bvh(
            scene, origin, direction, eps,
            jnp.full((n,), 3.4e38, jnp.float32), jnp.ones((n,), bool),
        )
        depth = jnp.where(hits.is_hit, hits.t / max_length, 1.0)
        depth = jnp.minimum(depth, 1.0)

        local = (origin - aabb_min) / span
        phi, theta = cmath.spherical_for_train(direction)
        feats = jnp.concatenate(
            [local, (phi / (2 * jnp.pi))[:, None], (theta / jnp.pi)[:, None]], axis=-1
        )
        feats_out.append(np.asarray(feats))
        labels_out.append(np.asarray(depth))
        done += n

    return np.concatenate(feats_out), np.concatenate(labels_out)


def generate_multigeo_dataset(scenes, aabb_mins, aabb_maxs, num_samples: int,
                              seed: int = 0, eps: float = 1e-4):
    """Instance-ID datagen mode: one call of generate_proxy_dataset per
    object, combined into the 6-feature multi-geo layout (reference
    MultiGeoNeuralVisNetwork input, trainingcode/module.py:572-582 +
    loadMultiDatasets).  Returns (features (N, 6), depth_labels (N,))."""
    from .datasets import multi_geo_features

    feats, labels = [], []
    for i, (sc, lo, hi) in enumerate(zip(scenes, aabb_mins, aabb_maxs)):
        f, l = generate_proxy_dataset(sc, lo, hi, num_samples,
                                      seed=seed + 7919 * i, eps=eps)
        feats.append(np.asarray(f))
        labels.append(np.asarray(l))
    return multi_geo_features(feats, labels)
