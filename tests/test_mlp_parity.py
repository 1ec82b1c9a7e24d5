"""Numeric parity of the JAX proxy nets against a literal torch
transcription of the reference architectures
(/root/reference/trainingcode/module.py):

- NeuralVisNetworkWith4Res256SingleOutput (module.py:755-794) — the
  production vis/depth net (PROD_VIS/PROD_DEPTH), including the global
  `post_block(out1 + out2)` skip.
- MultiGeoNeuralVisNetwork (module.py:531-582) — dedicated instance-ID
  encoder, pre_block, Linear-wrapped residual stack, 3-layer Sigmoid head.

Weights are copied torch -> jax (transposed: torch Linear stores (out, in))
and outputs compared at fp32.  This is the architecture-fidelity gate the
RNG already had (tests/test_core.py TEA parity) and the net lacked.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

torch = pytest.importorskip("torch")
from torch import nn
import torch.nn.functional as F

from pg2024_dprt_tpu.models.mlp import (
    MLPConfig, MULTIGEO_VIS, PROD_VIS, apply_mlp, param_names)


# ---- literal transcriptions of the reference modules (test-local) ----

class _ResBlock(nn.Module):
    def __init__(self, w):
        super().__init__()
        self.block = nn.Sequential(nn.Linear(w, w))

    def forward(self, x):
        return F.leaky_relu(x + self.block(x))


class _Ref4Res256SingleOutput(nn.Module):
    """module.py:755-794 (NeuralVisNetworkWith4Res256SingleOutput)."""

    def __init__(self):
        super().__init__()
        self.encoding3to64 = nn.Sequential(
            nn.Linear(3, 32), nn.LeakyReLU(),
            nn.Linear(32, 128), nn.LeakyReLU())
        self.encoding2to64 = nn.Sequential(
            nn.Linear(2, 32), nn.LeakyReLU(),
            nn.Linear(32, 128), nn.LeakyReLU())
        self.res_block = nn.Sequential(
            _ResBlock(256), _ResBlock(256), _ResBlock(256), _ResBlock(256))
        self.post_block = nn.Sequential(
            nn.Linear(256, 64), nn.LeakyReLU(),
            nn.Linear(64, 1), nn.LeakyReLU())

    def forward(self, x):
        origin = x[:, 0:3]
        direction = x[:, 3:5]
        out1 = torch.cat([self.encoding3to64(origin),
                          self.encoding2to64(direction)], dim=1)
        out2 = self.res_block(out1)
        return self.post_block(out1 + out2)


class _RefMultiGeo(nn.Module):
    """module.py:531-582 (MultiGeoNeuralVisNetwork)."""

    def __init__(self):
        super().__init__()
        self.encoding1to256 = nn.Sequential(
            nn.Linear(1, 64), nn.LeakyReLU(),
            nn.Linear(64, 256), nn.LeakyReLU())
        self.encoding5to256 = nn.Sequential(
            nn.Linear(5, 64), nn.LeakyReLU(),
            nn.Linear(64, 256), nn.LeakyReLU())
        self.pre_block = nn.Sequential(nn.Linear(512, 512), nn.LeakyReLU())
        self.res_block = nn.Sequential(
            nn.Linear(512, 512), nn.LeakyReLU(),
            _ResBlock(512), _ResBlock(512), _ResBlock(512),
            nn.Linear(512, 512))
        self.post_block = nn.Sequential(
            nn.Linear(512, 256), nn.LeakyReLU(),
            nn.Linear(256, 64), nn.LeakyReLU(),
            nn.Linear(64, 1), nn.Sigmoid())

    def forward(self, x):
        feature = x[:, 0:5]
        instance_id = x[:, 5:]
        out1 = torch.cat([self.encoding5to256(feature),
                          self.encoding1to256(instance_id)], dim=1)
        out2 = self.res_block(self.pre_block(out1))
        return self.post_block(out1 + out2)


def _copy(lin: nn.Linear):
    w = jnp.asarray(lin.weight.detach().numpy().T)   # (in, out)
    b = jnp.asarray(lin.bias.detach().numpy())
    return w, b


def _params_from_prod(net: _Ref4Res256SingleOutput):
    p = {}
    p["enc_o_w0"], p["enc_o_b0"] = _copy(net.encoding3to64[0])
    p["enc_o_w1"], p["enc_o_b1"] = _copy(net.encoding3to64[2])
    p["enc_d_w0"], p["enc_d_b0"] = _copy(net.encoding2to64[0])
    p["enc_d_w1"], p["enc_d_b1"] = _copy(net.encoding2to64[2])
    for i in range(4):
        p[f"res_w{i}"], p[f"res_b{i}"] = _copy(net.res_block[i].block[0])
    p["head_w0"], p["head_b0"] = _copy(net.post_block[0])
    p["head_w1"], p["head_b1"] = _copy(net.post_block[2])
    return p


def _params_from_multigeo(net: _RefMultiGeo):
    p = {}
    p["enc_f_w0"], p["enc_f_b0"] = _copy(net.encoding5to256[0])
    p["enc_f_w1"], p["enc_f_b1"] = _copy(net.encoding5to256[2])
    p["enc_i_w0"], p["enc_i_b0"] = _copy(net.encoding1to256[0])
    p["enc_i_w1"], p["enc_i_b1"] = _copy(net.encoding1to256[2])
    p["pre_w"], p["pre_b"] = _copy(net.pre_block[0])
    p["rbin_w"], p["rbin_b"] = _copy(net.res_block[0])
    for i in range(3):
        p[f"res_w{i}"], p[f"res_b{i}"] = _copy(net.res_block[2 + i].block[0])
    p["rbout_w"], p["rbout_b"] = _copy(net.res_block[5])
    p["head_w0"], p["head_b0"] = _copy(net.post_block[0])
    p["head_w1"], p["head_b1"] = _copy(net.post_block[2])
    p["head_w2"], p["head_b2"] = _copy(net.post_block[4])
    return p


def test_prod_net_matches_reference():
    torch.manual_seed(0)
    net = _Ref4Res256SingleOutput().eval()
    params = _params_from_prod(net)
    assert set(params) == set(param_names(PROD_VIS))
    x = np.random.RandomState(1).randn(257, 5).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()[:, 0]
    got = np.asarray(apply_mlp(params, jnp.asarray(x), PROD_VIS))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_multigeo_net_matches_reference():
    torch.manual_seed(7)
    net = _RefMultiGeo().eval()
    params = _params_from_multigeo(net)
    assert set(params) == set(param_names(MULTIGEO_VIS))
    rng = np.random.RandomState(2)
    x = np.concatenate(
        [rng.rand(193, 5), (rng.randint(0, 8, (193, 1)) / 4.0)],
        axis=1).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()[:, 0]
    got = np.asarray(apply_mlp(params, jnp.asarray(x), MULTIGEO_VIS))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_all_sites_agree_with_apply_mlp():
    """The grouped engine, the fused pair kernel and the route kernel's
    concatenated-matmul forward all run the SAME structure as apply_mlp
    (they share models.mlp.net_forward) — checked numerically here for the
    grouped + pallas pair sites at fp32-ish tolerance (bf16 dots)."""
    from pg2024_dprt_tpu.models.mlp import init_mlp, stack_params
    from pg2024_dprt_tpu.models.proxy import apply_grouped
    from pg2024_dprt_tpu.ops.pallas_mlp import grouped_mlp_pair

    cfg = MLPConfig(width=64, depth=2)
    key = jax.random.PRNGKey(3)
    o = 3
    plist = [init_mlp(jax.random.fold_in(key, i), cfg) for i in range(o)]
    stacked = stack_params(plist)
    rng = np.random.RandomState(4)
    q = 300
    x = jnp.asarray(rng.rand(q, 5).astype(np.float32))
    obj = jnp.asarray(rng.randint(0, o, q).astype(np.int32))
    valid = jnp.asarray(rng.rand(q) > 0.2)

    want = np.zeros(q, np.float32)
    for i in range(o):
        pred = np.asarray(apply_mlp(plist[i], x, cfg,
                                    compute_dtype=jnp.bfloat16))
        sel = (np.asarray(obj) == i) & np.asarray(valid)
        want[sel] = pred[sel]

    got = np.asarray(apply_grouped(stacked, cfg, x, obj, valid, o))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-3)

    v2, _ = grouped_mlp_pair(stacked, stacked, cfg, cfg, x, obj, valid, o,
                             block=128)
    np.testing.assert_allclose(np.asarray(v2), want, rtol=3e-2, atol=3e-3)


class _Ref4Res256DoubleOutput(nn.Module):
    """module.py:264-302 (NeuralVisNetworkWith4Res256AndEncoderDoubleOutput)
    — the SEPARATEDNN=0 combined vis+depth net: same trunk + global skip,
    head 256 -> 64 -> 2 with Sigmoid."""

    def __init__(self):
        super().__init__()
        self.encoding3to64 = nn.Sequential(
            nn.Linear(3, 32), nn.LeakyReLU(),
            nn.Linear(32, 128), nn.LeakyReLU())
        self.encoding2to64 = nn.Sequential(
            nn.Linear(2, 32), nn.LeakyReLU(),
            nn.Linear(32, 128), nn.LeakyReLU())
        self.res_block = nn.Sequential(
            _ResBlock(256), _ResBlock(256), _ResBlock(256), _ResBlock(256))
        self.post_block = nn.Sequential(
            nn.Linear(256, 64), nn.LeakyReLU(),
            nn.Linear(64, 2), nn.Sigmoid())

    def forward(self, x):
        origin = x[:, 0:3]
        direction = x[:, 3:5]
        out1 = torch.cat([self.encoding3to64(origin),
                          self.encoding2to64(direction)], dim=1)
        out2 = self.res_block(out1)
        return self.post_block(out1 + out2)


def test_combined_double_output_matches_reference():
    from pg2024_dprt_tpu.models.mlp import COMBINED_VISDEPTH, apply_mlp_all

    torch.manual_seed(11)
    net = _Ref4Res256DoubleOutput().eval()
    params = _params_from_prod(net)  # same weight names; head_w1 is (64, 2)
    assert set(params) == set(param_names(COMBINED_VISDEPTH))
    x = np.random.RandomState(5).randn(211, 5).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = np.asarray(apply_mlp_all(params, jnp.asarray(x), COMBINED_VISDEPTH))
    assert got.shape == (211, 2)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_grouped_all_matches_per_object():
    from pg2024_dprt_tpu.models.mlp import apply_mlp_all, init_mlp, stack_params
    from pg2024_dprt_tpu.models.proxy import apply_grouped_all

    cfg = MLPConfig(width=64, depth=2, out_features=2,
                    final_activation="sigmoid")
    key = jax.random.PRNGKey(9)
    o = 3
    plist = [init_mlp(jax.random.fold_in(key, i), cfg) for i in range(o)]
    stacked = stack_params(plist)
    rng = np.random.RandomState(6)
    q = 300
    x = jnp.asarray(rng.rand(q, 5).astype(np.float32))
    obj = jnp.asarray(rng.randint(0, o, q).astype(np.int32))
    valid = jnp.asarray(rng.rand(q) > 0.2)

    want = np.zeros((q, 2), np.float32)
    for i in range(o):
        pred = np.asarray(apply_mlp_all(plist[i], x, cfg,
                                        compute_dtype=jnp.bfloat16))
        sel = (np.asarray(obj) == i) & np.asarray(valid)
        want[sel] = pred[sel]

    got = np.asarray(apply_grouped_all(stacked, cfg, x, obj, valid, o))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-3)
