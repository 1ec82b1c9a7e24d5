"""Path compaction / routing by key.

The reference runs a 3-level Blelloch prefix-scan *per destination rank* to
compact migrating paths (/root/reference/src/cuda/cuda_compaction.cu:352-439)
and a per-object variant to group NN queries
(/root/reference/src/cuda/cuda_compaction.cu:441-530). On TPU a single stable
key sort replaces the whole kernel family: sort once by destination/object
key, and per-key segments fall out contiguously. `jax.lax.sort` lowers to an
efficient on-device sorting network, and invalid rows are pushed to the end by
keying them with a sentinel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = np.int32(0x7FFFFFFF)  # np scalar: module-level jax Arrays become hoisted jaxpr consts


def compact_by_key(key: jnp.ndarray, valid: jnp.ndarray):
    """Stable-sort row indices by (valid ? key : SENTINEL).

    Returns (perm, sorted_key, sorted_valid): apply `perm` (via
    PathState.gather / jnp.take) to move rows into contiguous per-key
    segments with invalid rows at the tail."""
    n = key.shape[0]
    k = jnp.where(valid, key.astype(jnp.int32), SENTINEL)
    idx = jnp.arange(n, dtype=jnp.int32)
    sorted_key, perm = jax.lax.sort((k, idx), num_keys=1, is_stable=True)
    return perm, sorted_key, sorted_key != SENTINEL


def counts_per_key(key: jnp.ndarray, valid: jnp.ndarray, num_keys: int) -> jnp.ndarray:
    """Histogram of valid rows per key in [0, num_keys). TPU-native stand-in
    for the reference's per-rank `sendCount` computation
    (/root/reference/src/render/renderer.cpp:1264-1270)."""
    k = jnp.where(valid, key.astype(jnp.int32), num_keys)
    one_hot = jax.nn.one_hot(k, num_keys + 1, dtype=jnp.int32)
    return jnp.sum(one_hot, axis=0)[:num_keys]


def segment_offsets(counts: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix sum of per-key counts -> segment start offsets
    (the `sceneOffset` array of the reference NN packing,
    /root/reference/src/cuda/cuda_compaction.cu:441-530)."""
    return jnp.concatenate([jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]])
