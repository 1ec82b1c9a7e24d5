"""Grouped neural-proxy inference engine.

The reference loads one TorchScript module per object and runs a Python loop
of per-object batched forwards over a packed query buffer
(/root/reference/src/render/renderer.cpp:768-1159). Here every object's params
are stacked into one pytree with leading dim O and inference is one jitted
sweep: a static loop over objects applies each object's weights to the full
query batch under a mask (correct and fusion-friendly; a Pallas grouped-GEMM
over sorted segments is the planned fast path — see ops/grouped_mlp TODO).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .mlp import MLPConfig, PROD_DEPTH, PROD_VIS, apply_mlp, init_mlp, stack_params


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProxyModels:
    """Stacked vis + depth nets for all O partition proxies (replicated on
    every device, as in the reference renderer.cpp:1884-1905)."""

    vis_params: dict    # leaves (O, ...)
    depth_params: dict  # leaves (O, ...)
    num_objects: int = dataclasses.field(metadata=dict(static=True), default=0)
    vis_cfg: MLPConfig = dataclasses.field(metadata=dict(static=True), default=PROD_VIS)
    depth_cfg: MLPConfig = dataclasses.field(metadata=dict(static=True), default=PROD_DEPTH)


def random_proxy_models(key, num_objects: int,
                        vis_cfg: MLPConfig = PROD_VIS,
                        depth_cfg: MLPConfig = PROD_DEPTH) -> ProxyModels:
    keys = jax.random.split(key, 2 * num_objects)
    vis = stack_params([init_mlp(keys[i], vis_cfg) for i in range(num_objects)])
    depth = stack_params(
        [init_mlp(keys[num_objects + i], depth_cfg) for i in range(num_objects)]
    )
    return ProxyModels(vis, depth, num_objects, vis_cfg, depth_cfg)


def apply_grouped(stacked_params: dict, cfg: MLPConfig, features: jnp.ndarray,
                  obj_id: jnp.ndarray, valid: jnp.ndarray,
                  num_objects: int, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Evaluate per-object MLPs: features (Q, F), obj_id (Q,) in [0, O).

    Returns (Q,) predictions (0 where invalid)."""
    out = jnp.zeros(features.shape[:-1], jnp.float32)
    for o in range(num_objects):
        params_o = jax.tree.map(lambda a: a[o], stacked_params)
        pred = apply_mlp(params_o, features, cfg, compute_dtype=compute_dtype)
        out = jnp.where((obj_id == o) & valid, pred, out)
    return out
