"""Grouped neural-proxy inference engine.

The reference loads one TorchScript module per object and runs a Python loop
of per-object batched forwards over a packed query buffer
(/root/reference/src/render/renderer.cpp:768-1159). Here every object's params
are stacked into one pytree with leading dim O and inference is one jitted
sweep: a static loop over objects applies each object's weights to the full
query batch under a mask (correct and fusion-friendly); the fast path is the
fused Pallas grouped-GEMM over sorted segments in ops/pallas_mlp.py.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .mlp import (MLPConfig, PROD_DEPTH, PROD_VIS, _bias_name, apply_mlp,
                  init_mlp, net_forward, stack_params)


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
    # multi-geo mode (reference MultiGeoNeuralVisNetwork,
    # /root/reference/trainingcode/module.py:531-582): ONE net serves every
    # object, with instanceID/INSTANCE_DIVISOR fed to the dedicated
    # instance-ID encoder branch as the 6th input column.
    # vis_params/depth_params are then SINGLE-net dicts (no leading O dim)
    # with cfg.multi_geo == True.
    multi_geo: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # SEPARATEDNN=0 (renderer.cpp:35): ONE double-output net per object
    # (vis_cfg.out_features == 2, channel 0 = vis / 1 = depth); vis_params
    # holds its stacked weights and depth_params is empty.  Consumers add
    # the reference's +0.1 depth slack in the inside-hit occlusion compare
    # (frame_buffer_update.cu:68-70).
    combined: bool = dataclasses.field(metadata=dict(static=True), default=False)


def multigeo_proxy_models(vis_params: dict, depth_params: dict,
                          num_objects: int, vis_cfg: MLPConfig,
                          depth_cfg: MLPConfig) -> ProxyModels:
    """Wrap one 6-feature net pair as the proxy model table for N objects."""
    assert vis_cfg.multi_geo and depth_cfg.multi_geo
    assert vis_cfg.in_features == 6 and depth_cfg.in_features == 6
    return ProxyModels(vis_params, depth_params, num_objects,
                       vis_cfg, depth_cfg, multi_geo=True)


def apply_multigeo(params: dict, cfg: MLPConfig, features, obj_id, valid,
                   compute_dtype=jnp.bfloat16):
    """Multi-geo inference: append instanceID/INSTANCE_DIVISOR as the 6th
    column (routed to the dedicated instance-ID encoder inside apply_mlp,
    reference module.py:572-582) and run the ONE shared net over the whole
    batch (replaces the grouped per-object dispatch — no grouping needed
    when one net serves every object)."""
    from ..train.datasets import INSTANCE_DIVISOR

    iid = (jnp.maximum(obj_id, 0).astype(jnp.float32)
           / jnp.float32(INSTANCE_DIVISOR))[:, None]
    x = jnp.concatenate([features, iid], axis=-1)
    out = apply_mlp(params, x, cfg, compute_dtype=compute_dtype)
    return jnp.where(valid, out, 0.0)


def random_proxy_models(key, num_objects: int,
                        vis_cfg: MLPConfig = PROD_VIS,
                        depth_cfg: MLPConfig = PROD_DEPTH) -> ProxyModels:
    keys = jax.random.split(key, 2 * num_objects)
    vis = stack_params([init_mlp(keys[i], vis_cfg) for i in range(num_objects)])
    depth = stack_params(
        [init_mlp(keys[num_objects + i], depth_cfg) for i in range(num_objects)]
    )
    return ProxyModels(vis, depth, num_objects, vis_cfg, depth_cfg)


def combined_proxy_models(stacked_params: dict, num_objects: int,
                          cfg: MLPConfig) -> ProxyModels:
    """Wrap stacked double-output nets as a SEPARATEDNN=0 model table."""
    assert cfg.out_features == 2, "combined mode needs a 2-channel head"
    return ProxyModels(stacked_params, {}, num_objects, cfg, cfg,
                       combined=True)


def random_combined_proxy_models(key, num_objects: int,
                                 cfg: MLPConfig = None) -> ProxyModels:
    from .mlp import COMBINED_VISDEPTH

    cfg = cfg or COMBINED_VISDEPTH
    keys = jax.random.split(key, num_objects)
    nets = stack_params([init_mlp(k, cfg) for k in keys])
    return combined_proxy_models(nets, num_objects, cfg)


def apply_grouped_reference(stacked_params: dict, cfg: MLPConfig, features: jnp.ndarray,
                            obj_id: jnp.ndarray, valid: jnp.ndarray,
                            num_objects: int, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Oracle implementation: O masked full-batch passes (O x FLOPs)."""
    out = jnp.zeros(features.shape[:-1], jnp.float32)
    for o in range(num_objects):
        params_o = jax.tree.map(lambda a: a[o], stacked_params)
        pred = apply_mlp(params_o, features, cfg, compute_dtype=compute_dtype)
        out = jnp.where((obj_id == o) & valid, pred, out)
    return out


def _dispatch(features: jnp.ndarray, obj_id: jnp.ndarray, valid: jnp.ndarray,
              num_objects: int, block: int = 1024):
    """MoE-style grouped dispatch: one stable sort groups queries by object
    into block-aligned segments (budget Q + O*block is static and always
    sufficient — nothing is dropped).  Returns (x (budget, F) scattered
    features, block_obj (NB,) per-block object id, slot (Q,) sorted-query ->
    x row (budget for invalid), perm (Q,) sort permutation, budget, NB, BQ).
    Shared by the XLA grouped engine below and the fused Pallas kernel
    (ops/pallas_mlp.py)."""
    q = features.shape[0]
    o_count = num_objects
    bq = min(block, max(q, 8))

    key = jnp.where(valid, obj_id.astype(jnp.int32), o_count)
    idx = jnp.arange(q, dtype=jnp.int32)
    sorted_key, perm = jax.lax.sort((key, idx), num_keys=1, is_stable=True)

    counts = jnp.sum(
        jax.nn.one_hot(key, o_count + 1, dtype=jnp.int32), axis=0
    )[:o_count]
    region = bq * -(-counts // bq)                       # per-object, aligned
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(region)[:-1]])
    budget = q + o_count * bq - (q % bq if q % bq else 0)
    budget = bq * -(-budget // bq)
    nb = budget // bq

    # slot of each sorted query: object segment start + rank within object
    seg_start = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    srt_obj = jnp.minimum(sorted_key, o_count - 1)
    rank = jnp.arange(q, dtype=jnp.int32) - jnp.take(seg_start, srt_obj)
    slot = jnp.where(sorted_key < o_count, jnp.take(offsets, srt_obj) + rank, budget)

    x = (
        jnp.zeros((budget + 1, features.shape[1]), features.dtype)
        .at[slot].set(jnp.take(features, perm, axis=0), mode="drop")[:budget]
    )

    ends = offsets + region
    block_obj = jnp.sum(
        (ends[None, :] <= (jnp.arange(nb, dtype=jnp.int32) * bq)[:, None]).astype(jnp.int32),
        axis=-1,
    )
    block_obj = jnp.minimum(block_obj, o_count - 1)
    return x, block_obj, slot, perm, budget, nb, bq


def apply_grouped(stacked_params: dict, cfg: MLPConfig, features: jnp.ndarray,
                  obj_id: jnp.ndarray, valid: jnp.ndarray,
                  num_objects: int, compute_dtype=jnp.bfloat16,
                  block: int = 1024) -> jnp.ndarray:
    """Production grouped inference: MoE-style dispatch (_dispatch), then
    every layer is ONE batched matmul over (num_blocks, block, width) with
    per-block weights selected by one-hot MXU gathers. Replaces the
    reference's per-object TorchScript loop
    (/root/reference/src/render/renderer.cpp:879-922) without its O(objects)
    serialization."""
    q = features.shape[0]
    o_count = num_objects
    x, block_obj, slot, perm, budget, nb, bq = _dispatch(
        features, obj_id, valid, num_objects, block
    )
    x = x.reshape(nb, bq, features.shape[1])
    onehot = jax.nn.one_hot(block_obj, o_count, dtype=jnp.float32)  # (NB, O)

    def pick_w(name):
        w = stacked_params[name]                          # (O, in, out) or (O, out)
        flat = w.reshape(o_count, -1)
        g = jnp.dot(onehot, flat, preferred_element_type=jnp.float32)
        return g.reshape((nb,) + w.shape[1:])

    def dot(h, wname, out_w):
        w = pick_w(wname).astype(compute_dtype)
        b = pick_w(_bias_name(wname))
        y = jnp.einsum(
            "nqi,nio->nqo", h.astype(compute_dtype), w,
            preferred_element_type=jnp.float32,
        )
        return y + b[:, None, :]

    pred = net_forward(x, dot, cfg, cfg.final_activation)[..., 0]  # (NB, BQ)

    # unscatter: sorted query i lives at slot[i]
    pred_flat = jnp.concatenate([pred.reshape(-1), jnp.zeros((1,), pred.dtype)])
    pred_sorted = jnp.take(pred_flat, slot)
    out = jnp.zeros((q,), jnp.float32).at[perm].set(pred_sorted.astype(jnp.float32))
    return jnp.where(valid, out, 0.0)


def apply_grouped_all(stacked_params: dict, cfg: MLPConfig, features: jnp.ndarray,
                      obj_id: jnp.ndarray, valid: jnp.ndarray,
                      num_objects: int, compute_dtype=jnp.bfloat16,
                      block: int = 1024) -> jnp.ndarray:
    """apply_grouped keeping every head channel: (Q, out_features). One
    grouped sweep serves both predictions of the SEPARATEDNN=0 double-output
    net — half the NN cost of the separated pair, which is the mode's point
    (/root/reference/src/render/renderer.cpp:35 `#else` branches)."""
    q = features.shape[0]
    o_count = num_objects
    x, block_obj, slot, perm, budget, nb, bq = _dispatch(
        features, obj_id, valid, num_objects, block
    )
    x = x.reshape(nb, bq, features.shape[1])
    onehot = jax.nn.one_hot(block_obj, o_count, dtype=jnp.float32)

    def pick_w(name):
        w = stacked_params[name]
        flat = w.reshape(o_count, -1)
        g = jnp.dot(onehot, flat, preferred_element_type=jnp.float32)
        return g.reshape((nb,) + w.shape[1:])

    def dot(h, wname, out_w):
        w = pick_w(wname).astype(compute_dtype)
        b = pick_w(_bias_name(wname))
        y = jnp.einsum(
            "nqi,nio->nqo", h.astype(compute_dtype), w,
            preferred_element_type=jnp.float32,
        )
        return y + b[:, None, :]

    pred = net_forward(x, dot, cfg, cfg.final_activation)   # (NB, BQ, C)
    c = pred.shape[-1]
    pred_flat = jnp.concatenate(
        [pred.reshape(-1, c), jnp.zeros((1, c), pred.dtype)], axis=0)
    pred_sorted = jnp.take(pred_flat, slot, axis=0)
    out = jnp.zeros((q, c), jnp.float32).at[perm].set(
        pred_sorted.astype(jnp.float32))
    return jnp.where(valid[:, None], out, 0.0)
