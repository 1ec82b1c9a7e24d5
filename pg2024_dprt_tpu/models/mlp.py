"""Neural proxy MLP zoo — pure-JAX port of the reference model family
(/root/reference/trainingcode/module.py).

Production architecture (`NeuralVisNetworkWith{D}Res{W}SingleOutput`,
module.py:755-794 for D=4 W=256): split encoders origin(3) -> w/8 -> w/2 and
direction(2) -> w/8 -> w/2 (LeakyReLU), concat to width w = out1, D residual
blocks x = leaky_relu(x + Linear(w, w) x) (ResBlock, module.py:24-57) = out2,
head post_block(out1 + out2): w -> 64 -> 1.  The GLOBAL skip (encoder concat
added back onto the residual-stack output before the head, module.py:793) is
part of every production net.  The checkpointed production nets end in
LeakyReLU (vis trained as 0/1 MSE regression); Sigmoid variants exist
(module.py:880-960) so the head activation is configurable.

Multi-geo architecture (`MultiGeoNeuralVisNetwork`, module.py:531-582): a
dedicated instance-ID encoder 1 -> w/8 -> w/2 beside the feature encoder
5 -> w/8 -> w/2 (reference w=512: 1->64->256 and 5->64->256), concat = out1,
pre_block Linear(w, w)+LeakyReLU, res_block = Linear(w, w)+LeakyReLU then
`depth` ResBlocks then a trailing Linear(w, w) with NO activation = out2,
head post_block(out1 + out2): w -> w/2 -> 64 -> 1 (+ Sigmoid in the
reference; configurable here so the same architecture can serve the depth
regressor, which the reference does not define a multi-geo variant of).

EVERY implementation site (the plain XLA forward here, the grouped MoE
engine in models/proxy.py, the fused pair kernel in ops/pallas_mlp.py and
the in-route concatenated-matmul forward in ops/pallas_route.py) calls ONE
shared `net_forward` with a site-specific `dot` closure, so the network
structure lives in exactly one place and is parity-tested against a literal
torch transcription of the reference modules (tests/test_mlp_parity.py).

Params are plain dicts of arrays — trivially stacked across objects for the
grouped inference engine (models/proxy.py) and checkpointed with orbax.
Inference runs in bfloat16 on the MXU (the reference exports fp16 TorchScript,
/root/reference/trainingcode/utils/exportHalfModule.py).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict

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
    # Head output channels. 1 = the production SEPARATEDNN=1 nets; 2 = the
    # combined vis+depth double-output family (SEPARATEDNN=0,
    # /root/reference/src/render/renderer.cpp:35;
    # NeuralVisNetworkWith4Res256AndEncoderDoubleOutput, module.py:264-302:
    # identical trunk + global skip, head 256 -> 64 -> 2 with Sigmoid;
    # channel 0 = vis, channel 1 = depth).
    out_features: int = 1
    # MultiGeoNeuralVisNetwork (module.py:531-582): dedicated instance-ID
    # encoder, pre_block, Linear-wrapped res stack, 3-layer head.
    multi_geo: bool = False

    @property
    def enc_hidden(self) -> int:
        return self.width // 8

    @property
    def enc_out(self) -> int:
        return self.width // 2


# the production configs used by the renderer (SURVEY.md #23)
PROD_VIS = MLPConfig(width=256, depth=4, final_activation="leaky_relu")
PROD_DEPTH = MLPConfig(width=256, depth=4, final_activation="leaky_relu")
# reference MultiGeoNeuralVisNetwork: w=512, 3 ResBlocks, Sigmoid vis head
MULTIGEO_VIS = MLPConfig(width=512, depth=3, in_features=6,
                         final_activation="sigmoid", multi_geo=True)
MULTIGEO_DEPTH = MLPConfig(width=512, depth=3, in_features=6,
                           final_activation="leaky_relu", multi_geo=True)
# SEPARATEDNN=0: one double-output vis+depth net
# (NeuralVisNetworkWith4Res256AndEncoderDoubleOutput, module.py:264-302)
COMBINED_VISDEPTH = MLPConfig(width=256, depth=4, out_features=2,
                              final_activation="sigmoid")


def param_shapes(cfg: MLPConfig):
    """Ordered (name, fan_in, fan_out) for every Linear in the net."""
    shapes = []
    if cfg.multi_geo:
        feat_in = cfg.in_features - 1
        shapes += [("enc_f_w0", feat_in, cfg.enc_hidden),
                   ("enc_f_w1", cfg.enc_hidden, cfg.enc_out),
                   ("enc_i_w0", 1, cfg.enc_hidden),
                   ("enc_i_w1", cfg.enc_hidden, cfg.enc_out),
                   ("pre_w", cfg.width, cfg.width),
                   ("rbin_w", cfg.width, cfg.width)]
        shapes += [(f"res_w{i}", cfg.width, cfg.width)
                   for i in range(cfg.depth)]
        shapes += [("rbout_w", cfg.width, cfg.width),
                   ("head_w0", cfg.width, cfg.width // 2),
                   ("head_w1", cfg.width // 2, cfg.head_hidden),
                   ("head_w2", cfg.head_hidden, cfg.out_features)]
    else:
        origin_in = cfg.in_features - 2
        shapes += [("enc_o_w0", origin_in, cfg.enc_hidden),
                   ("enc_o_w1", cfg.enc_hidden, cfg.enc_out),
                   ("enc_d_w0", 2, cfg.enc_hidden),
                   ("enc_d_w1", cfg.enc_hidden, cfg.enc_out)]
        shapes += [(f"res_w{i}", cfg.width, cfg.width)
                   for i in range(cfg.depth)]
        shapes += [("head_w0", cfg.width, cfg.head_hidden),
                   ("head_w1", cfg.head_hidden, cfg.out_features)]
    return shapes


def param_names(cfg: MLPConfig):
    """Flat ordered weight/bias name list (the kernel wrappers' layout)."""
    names = []
    for wn, _, _ in param_shapes(cfg):
        names += [wn, wn.replace("_w", "_b") if "_w" in wn else wn + "_b"]
    return names


def _bias_name(wn: str) -> str:
    return wn.replace("_w", "_b") if "_w" in wn else wn + "_b"


def _linear_init(key, fan_in, fan_out):
    # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / jnp.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return w, b


def init_mlp(key, cfg: MLPConfig = PROD_VIS) -> Dict[str, jnp.ndarray]:
    shapes = param_shapes(cfg)
    keys = jax.random.split(key, len(shapes))
    params = {}
    for k, (wn, fi, fo) in zip(keys, shapes):
        params[wn], params[_bias_name(wn)] = _linear_init(k, fi, fo)
    return params


def _leaky(x):
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def net_forward(x, dot: Callable, cfg: MLPConfig, final_activation: str):
    """The ONE place the network structure is written down.

    `dot(h, w_name, out_width)` computes h @ W + b for the named Linear
    (bias name derived); each implementation site supplies its own closure
    (plain matmul, grouped einsum, Pallas-ref matmul, concatenated-out-dim
    matmul).  Returns the (…, 1) head output after `final_activation`.

    Structure parity: NeuralVisNetworkWith4Res256SingleOutput forward
    (module.py:786-794) and MultiGeoNeuralVisNetwork forward
    (module.py:572-582) — including the global `post_block(out1 + out2)`
    skip both share.
    """
    if cfg.multi_geo:
        feat = x[..., : cfg.in_features - 1]
        iid = x[..., cfg.in_features - 1:]
        hf = _leaky(dot(feat, "enc_f_w0", cfg.enc_hidden))
        hf = _leaky(dot(hf, "enc_f_w1", cfg.enc_out))
        hi = _leaky(dot(iid, "enc_i_w0", cfg.enc_hidden))
        hi = _leaky(dot(hi, "enc_i_w1", cfg.enc_out))
        out1 = jnp.concatenate([hf, hi], axis=-1)            # (…, width)
        h = _leaky(dot(out1, "pre_w", cfg.width))            # pre_block
        h = _leaky(dot(h, "rbin_w", cfg.width))              # res_block lead
        for i in range(cfg.depth):
            h = _leaky(h + dot(h, f"res_w{i}", cfg.width))
        h = dot(h, "rbout_w", cfg.width)                     # trail, no act
        h = out1 + h                                         # global skip
        h = _leaky(dot(h, "head_w0", cfg.width // 2))
        h = _leaky(dot(h, "head_w1", cfg.head_hidden))
        out = dot(h, "head_w2", cfg.out_features)
    else:
        origin = x[..., : cfg.in_features - 2]
        direction = x[..., cfg.in_features - 2:]
        ho = _leaky(dot(origin, "enc_o_w0", cfg.enc_hidden))
        ho = _leaky(dot(ho, "enc_o_w1", cfg.enc_out))
        hd = _leaky(dot(direction, "enc_d_w0", cfg.enc_hidden))
        hd = _leaky(dot(hd, "enc_d_w1", cfg.enc_out))
        out1 = jnp.concatenate([ho, hd], axis=-1)            # (…, width)
        h = out1
        for i in range(cfg.depth):
            h = _leaky(h + dot(h, f"res_w{i}", cfg.width))
        h = out1 + h                                         # global skip
        h = _leaky(dot(h, "head_w0", cfg.head_hidden))
        out = dot(h, "head_w1", cfg.out_features)
    if final_activation == "leaky_relu":
        out = _leaky(out)
    elif final_activation == "sigmoid":
        out = jax.nn.sigmoid(out)
    return out


def apply_mlp(params: Dict, x: jnp.ndarray, cfg: MLPConfig = PROD_VIS,
              compute_dtype=jnp.float32) -> jnp.ndarray:
    """Forward pass: x (..., in_features) -> (...,) prediction.

    `compute_dtype=jnp.bfloat16` selects MXU-friendly reduced precision
    (the fp16 inference mode of the reference, renderer.cpp:801)."""

    def dot(h, wn, out_w):
        return (
            jnp.dot(h.astype(compute_dtype),
                    params[wn].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
            + params[_bias_name(wn)]
        )

    out = net_forward(x.astype(compute_dtype), dot, cfg, cfg.final_activation)
    return out[..., 0].astype(jnp.float32)


def apply_mlp_all(params: Dict, x: jnp.ndarray, cfg: MLPConfig,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """Forward pass keeping every head channel: (..., out_features). The
    SEPARATEDNN=0 consumer reads channel 0 = vis, channel 1 = depth
    (frame_buffer_update.cu:64-70)."""

    def dot(h, wn, out_w):
        return (
            jnp.dot(h.astype(compute_dtype),
                    params[wn].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
            + params[_bias_name(wn)]
        )

    out = net_forward(x.astype(compute_dtype), dot, cfg, cfg.final_activation)
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
