"""Fused grouped-MLP Pallas kernel: vis + depth nets in ONE launch.

The XLA grouped path (models/proxy.py:apply_grouped) is a ~20-op dependent
chain per net; on this backend per-op dispatch latency (~0.5 ms) makes two
196k-query sweeps cost ~21 ms when the real MXU work is < 1 ms.  This
kernel keeps the MoE-style dispatch (one sort groups queries into
block-aligned per-object segments — models/proxy.py:_dispatch) but runs
EVERY layer of BOTH nets for a block in one Pallas program: the grid walks
the query blocks, a scalar-prefetched block->object table drives the
BlockSpec index maps that DMA each block's weight set (the embedding-lookup
pattern; consecutive blocks usually share an object, so the pipeline
re-uses the resident copy).

Role parity: the per-object TorchScript batched forwards of the reference
(/root/reference/src/render/renderer.cpp:879-922) — vis and depth module
sweeps fused into one device program.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.mlp import (LEAKY_SLOPE, MLPConfig, _bias_name, net_forward,
                          param_names as _param_names)


def _leaky(x):
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def _forward(x, refs, cfg: MLPConfig, final_activation: str):
    """One net's forward over a (BQ, F) block; refs is a name->ref dict of
    (1, ...) weight blocks.  bf16 dots with f32 accumulation (the
    reference's fp16 inference mode, renderer.cpp:801).  Structure comes
    from the shared models.mlp.net_forward (incl. the global out1+out2
    skip, module.py:793)."""

    def dot(h, wn, out_w):
        return (
            jnp.dot(h.astype(jnp.bfloat16), refs[wn][0],
                    preferred_element_type=jnp.float32)
            + refs[_bias_name(wn)][0]
        )

    return net_forward(x, dot, cfg, final_activation)  # (BQ, 1)


def _pair_kernel(block_obj_ref, x_ref, *refs, cfg: MLPConfig,
                 vis_final: str, depth_final: str, n_params: int):
    out_ref = refs[-1]
    names = _param_names(cfg)
    vis_refs = dict(zip(names, refs[:n_params]))
    depth_refs = dict(zip(names, refs[n_params:2 * n_params]))
    x = x_ref[:]
    out_ref[:, 0:1] = _forward(x, vis_refs, cfg, vis_final)
    out_ref[:, 1:2] = _forward(x, depth_refs, cfg, depth_final)


def grouped_mlp_pair(vis_params: dict, depth_params: dict,
                     vis_cfg: MLPConfig, depth_cfg: MLPConfig,
                     features, obj_id, valid, num_objects: int,
                     block: int = 1024, interpret: bool = None):
    """(vis_pred, depth_pred) for every query, each net applied with its
    object's weights.  Same contract as two models/proxy.apply_grouped
    calls (the CPU/test oracle), one sort + one kernel instead of two
    ~20-op XLA chains."""
    from ..models.proxy import _dispatch

    assert (vis_cfg.width, vis_cfg.depth, vis_cfg.in_features, vis_cfg.head_hidden) == \
           (depth_cfg.width, depth_cfg.depth, depth_cfg.in_features, depth_cfg.head_hidden), \
        "pair kernel requires architecturally identical vis/depth nets"
    cfg = vis_cfg
    q = features.shape[0]
    f = features.shape[1]
    x, block_obj, slot, perm, budget, nb, bq = _dispatch(
        features, obj_id, valid, num_objects, block
    )

    names = _param_names(cfg)

    def prep(params):
        arrs = []
        for name in names:
            a = params[name]
            if a.ndim == 2:                       # bias (O, W) -> (O, 1, W)
                arrs.append(a[:, None, :].astype(jnp.float32))
            else:
                arrs.append(a.astype(jnp.bfloat16))
        return arrs

    weight_arrays = prep(vis_params) + prep(depth_params)
    w_specs = [
        pl.BlockSpec((1,) + a.shape[1:], lambda i, ob: (ob[i], 0, 0),
                     memory_space=pltpu.VMEM)
        for a in weight_arrays
    ]
    x_spec = pl.BlockSpec((bq, f), lambda i, ob: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bq, 8), lambda i, ob: (i, 0), memory_space=pltpu.VMEM)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[x_spec] + w_specs,
        out_specs=[out_spec],
    )
    (out,) = pl.pallas_call(
        partial(_pair_kernel, cfg=cfg, vis_final=vis_cfg.final_activation,
                depth_final=depth_cfg.final_activation, n_params=len(names)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((budget, 8), jnp.float32)],
        interpret=interpret,
    )(block_obj, x, *weight_arrays)

    # unscatter: sorted query i lives at slot[i] (invalid -> row `budget`)
    flat = jnp.concatenate([out[:, 0:2], jnp.zeros((1, 2), out.dtype)], axis=0)
    pred_sorted = jnp.take(flat, jnp.minimum(slot, budget), axis=0)
    res = jnp.zeros((q, 2), jnp.float32).at[perm].set(pred_sorted)
    res = jnp.where(valid[:, None], res, 0.0)
    return res[:, 0], res[:, 1]


def _dense_kernel(x_ref, obj_ref, *refs, cfg: MLPConfig, o_count: int,
                  vis_final: str, depth_final: str, n_params: int):
    """All-objects dense variant: run BOTH nets for EVERY object on the
    block and one-hot select per query.  O x the MXU FLOPs of the dispatched
    kernel, but the block needs no dispatch at all — queries stay in ray
    order, so the surrounding XLA graph has no sort / scatter / unscatter
    (each a ~1 ms launch on this backend; see module docstring)."""
    out_ref = refs[-1]
    names = _param_names(cfg)
    x = x_ref[:]
    obj = obj_ref[:]                                   # (BQ, 1) i32
    vis = jnp.zeros(obj.shape, jnp.float32)
    depth = jnp.zeros(obj.shape, jnp.float32)
    for o in range(o_count):
        vrefs = {nm: refs[o * 2 * n_params + i]
                 for i, nm in enumerate(names)}
        drefs = {nm: refs[o * 2 * n_params + n_params + i]
                 for i, nm in enumerate(names)}
        sel = obj == o
        vis = jnp.where(sel, _forward(x, vrefs, cfg, vis_final), vis)
        depth = jnp.where(sel, _forward(x, drefs, cfg, depth_final), depth)
    out_ref[:, 0:1] = vis
    out_ref[:, 1:2] = depth


# dense path weight budget: all objects' bf16 weights must stay VMEM-resident
DENSE_WEIGHT_LIMIT = 10 * 2**20


def _param_bytes(params) -> int:
    import numpy as _np

    return sum(int(_np.prod(a.shape)) * 2 for a in params.values())


def grouped_mlp_dense(vis_params: dict, depth_params: dict,
                      vis_cfg: MLPConfig, depth_cfg: MLPConfig,
                      features, obj_id, valid, num_objects: int,
                      block: int = 512, interpret: bool = None):
    """Dispatch-free (vis, depth) inference: every object's weights resident
    in VMEM, each query block computes all objects and selects.  Correct for
    any object mix; preferred below DENSE_WEIGHT_LIMIT total weights."""
    q = features.shape[0]
    f = features.shape[1]
    cfg = vis_cfg
    bq = min(block, max(q, 8))
    pad = (-q) % bq
    qp = q + pad

    x = jnp.pad(features, ((0, pad), (0, 0)))
    obj = jnp.where(valid, obj_id.astype(jnp.int32), -1)
    obj = jnp.pad(obj, (0, pad), constant_values=-1)[:, None]

    # leading unit axis so the shared _forward's ref[0] yields (in, out) /
    # (1, W) exactly as in the dispatched pair kernel
    names = _param_names(cfg)
    weight_arrays = []
    for o in range(num_objects):
        for params in (vis_params, depth_params):
            for nm in names:
                a = params[nm][o]
                if a.ndim == 1:                        # bias (W,) -> (1, 1, W)
                    weight_arrays.append(a[None, None, :].astype(jnp.float32))
                else:                                  # weight -> (1, in, out)
                    weight_arrays.append(a[None].astype(jnp.bfloat16))

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_arrays]
    x_spec = pl.BlockSpec((bq, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    obj_spec = pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bq, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    (out,) = pl.pallas_call(
        partial(_dense_kernel, cfg=cfg, o_count=num_objects,
                vis_final=vis_cfg.final_activation,
                depth_final=depth_cfg.final_activation, n_params=len(names)),
        grid=(qp // bq,),
        in_specs=[x_spec, obj_spec] + w_specs,
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((qp, 8), jnp.float32)],
        interpret=interpret,
    )(x, obj, *weight_arrays)

    vis = jnp.where(valid, out[:q, 0], 0.0)
    depth = jnp.where(valid, out[:q, 1], 0.0)
    return vis, depth
