"""Neural proxy MLP zoo — pure-JAX port of the reference model family
(/root/reference/trainingcode/module.py).

Production architecture (`NeuralVisNetworkWith{D}Res{W}SingleOutput`,
module.py:755-794 for D=4 W=256): split encoders origin(3) -> w/8 -> w/2 and
direction(2) -> w/8 -> w/2 (LeakyReLU), concat to width w, D residual blocks
x = leaky_relu(x + Linear(w, w) x) (ResBlock, module.py:24-57), head
w -> 64 -> 1. The checkpointed production nets end in LeakyReLU (vis trained
as 0/1 MSE regression); Sigmoid variants exist (module.py:880-960) so the head
activation is configurable.

Params are plain dicts of arrays — trivially stacked across objects for the
grouped inference engine (models/proxy.py) and checkpointed with orbax.
Inference runs in bfloat16 on the MXU (the reference exports fp16 TorchScript,
/root/reference/trainingcode/utils/exportHalfModule.py).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

LEAKY_SLOPE = 0.01  # torch F.leaky_relu default


@dataclass(frozen=True)
class MLPConfig:
    width: int = 256
    depth: int = 4              # number of residual blocks
    in_features: int = 5        # 6 for the multi-geo (instance-id) variant
    head_hidden: int = 64
    final_activation: str = "leaky_relu"  # "leaky_relu" | "sigmoid" | "none"

    @property
    def enc_hidden(self) -> int:
        return self.width // 8

    @property
    def enc_out(self) -> int:
        return self.width // 2


# the production configs used by the renderer (SURVEY.md #23)
PROD_VIS = MLPConfig(width=256, depth=4, final_activation="leaky_relu")
PROD_DEPTH = MLPConfig(width=256, depth=4, final_activation="leaky_relu")


def _linear_init(key, fan_in, fan_out):
    # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / jnp.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return w, b


def init_mlp(key, cfg: MLPConfig = PROD_VIS) -> Dict[str, jnp.ndarray]:
    params = {}
    keys = jax.random.split(key, 6 + cfg.depth)
    origin_in = cfg.in_features - 2
    params["enc_o_w0"], params["enc_o_b0"] = _linear_init(keys[0], origin_in, cfg.enc_hidden)
    params["enc_o_w1"], params["enc_o_b1"] = _linear_init(keys[1], cfg.enc_hidden, cfg.enc_out)
    params["enc_d_w0"], params["enc_d_b0"] = _linear_init(keys[2], 2, cfg.enc_hidden)
    params["enc_d_w1"], params["enc_d_b1"] = _linear_init(keys[3], cfg.enc_hidden, cfg.enc_out)
    for i in range(cfg.depth):
        params[f"res_w{i}"], params[f"res_b{i}"] = _linear_init(keys[4 + i], cfg.width, cfg.width)
    params["head_w0"], params["head_b0"] = _linear_init(keys[4 + cfg.depth], cfg.width, cfg.head_hidden)
    params["head_w1"], params["head_b1"] = _linear_init(keys[5 + cfg.depth], cfg.head_hidden, 1)
    return params


def _leaky(x):
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def apply_mlp(params: Dict, x: jnp.ndarray, cfg: MLPConfig = PROD_VIS,
              compute_dtype=jnp.float32) -> jnp.ndarray:
    """Forward pass: x (..., in_features) -> (...,) prediction.

    `compute_dtype=jnp.bfloat16` selects MXU-friendly reduced precision
    (the fp16 inference mode of the reference, renderer.cpp:801)."""

    def dot(h, w, b):
        return (
            jnp.dot(h, w.astype(compute_dtype), preferred_element_type=jnp.float32)
            + b
        )

    x = x.astype(compute_dtype)
    origin = x[..., : cfg.in_features - 2]
    direction = x[..., cfg.in_features - 2 :]

    o = _leaky(dot(origin, params["enc_o_w0"], params["enc_o_b0"]))
    o = _leaky(dot(o.astype(compute_dtype), params["enc_o_w1"], params["enc_o_b1"]))
    d = _leaky(dot(direction, params["enc_d_w0"], params["enc_d_b0"]))
    d = _leaky(dot(d.astype(compute_dtype), params["enc_d_w1"], params["enc_d_b1"]))
    h = jnp.concatenate([o, d], axis=-1)

    for i in range(cfg.depth):
        h = _leaky(h + dot(h.astype(compute_dtype), params[f"res_w{i}"], params[f"res_b{i}"]))

    h = _leaky(dot(h.astype(compute_dtype), params["head_w0"], params["head_b0"]))
    out = dot(h.astype(compute_dtype), params["head_w1"], params["head_b1"])[..., 0]

    if cfg.final_activation == "leaky_relu":
        out = _leaky(out)
    elif cfg.final_activation == "sigmoid":
        out = jax.nn.sigmoid(out)
    return out.astype(jnp.float32)


def stack_params(params_list) -> Dict[str, jnp.ndarray]:
    """Stack per-object param dicts along a new leading axis (the grouped
    inference engine's weight layout)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *params_list)


def to_bf16(params: Dict) -> Dict:
    """Half-precision deployment weights — the reference's fp16 TorchScript
    export (/root/reference/trainingcode/utils/exportHalfModule.py,
    Float2Half.py). Inference already computes in bf16 on the MXU; this
    additionally halves weight memory."""
    return jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)


def half_vs_full_error(params: Dict, x, cfg: MLPConfig = PROD_VIS) -> float:
    """fp32-vs-bf16 prediction MSE (the exportHalfModule comparison,
    exportHalfModule.py:80-88)."""
    full = apply_mlp(params, x, cfg, compute_dtype=jnp.float32)
    half = apply_mlp(to_bf16(params), x, cfg, compute_dtype=jnp.bfloat16)
    return float(jnp.mean((full - half) ** 2))
