"""Fused grouped-MLP pair kernel vs the XLA grouped engine (interpret mode).

Both compute in bf16 with f32 accumulation; accumulation tiling differs
between the Mosaic dots and the XLA einsum, so comparison is tolerance-
based (same class of error the fp32-vs-bf16 parity check bounds)."""
import numpy as np
import jax
import jax.numpy as jnp

from pg2024_dprt_tpu.models.mlp import MLPConfig
from pg2024_dprt_tpu.models.proxy import apply_grouped, random_proxy_models
from pg2024_dprt_tpu.ops.pallas_mlp import grouped_mlp_pair


def _case(q, o_count, cfg, seed, block=256):
    m = random_proxy_models(jax.random.PRNGKey(seed), o_count, cfg, cfg)
    rng = np.random.RandomState(seed + 1)
    feats = jnp.asarray(rng.rand(q, cfg.in_features).astype(np.float32))
    obj = jnp.asarray(rng.randint(0, o_count, q).astype(np.int32))
    valid = jnp.asarray(rng.rand(q) > 0.35)
    vis, depth = grouped_mlp_pair(
        m.vis_params, m.depth_params, cfg, cfg, feats, obj, valid, o_count,
        block=block,
    )
    want_v = apply_grouped(m.vis_params, cfg, feats, obj, valid, o_count)
    want_d = apply_grouped(m.depth_params, cfg, feats, obj, valid, o_count)
    np.testing.assert_allclose(np.asarray(vis), np.asarray(want_v),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(want_d),
                               rtol=2e-2, atol=2e-2)
    # invalid queries must be exactly zero
    assert (np.asarray(vis)[~np.asarray(valid)] == 0).all()


def test_pair_kernel_small_nets():
    _case(1500, 4, MLPConfig(width=64, depth=2), seed=0)


def test_pair_kernel_prod_arch():
    _case(700, 3, MLPConfig(width=256, depth=4), seed=2)


def test_pair_kernel_single_object_unaligned():
    _case(130, 1, MLPConfig(width=64, depth=2), seed=4, block=64)


def test_dense_kernel_matches_grouped():
    from pg2024_dprt_tpu.ops.pallas_mlp import grouped_mlp_dense

    cfg = MLPConfig(width=64, depth=2)
    o_count = 4
    m = random_proxy_models(jax.random.PRNGKey(7), o_count, cfg, cfg)
    rng = np.random.RandomState(8)
    q = 900
    feats = jnp.asarray(rng.rand(q, cfg.in_features).astype(np.float32))
    obj = jnp.asarray(rng.randint(0, o_count, q).astype(np.int32))
    valid = jnp.asarray(rng.rand(q) > 0.35)
    vis, depth = grouped_mlp_dense(m.vis_params, m.depth_params, cfg, cfg,
                                   feats, obj, valid, o_count, block=256)
    want_v = apply_grouped(m.vis_params, cfg, feats, obj, valid, o_count)
    want_d = apply_grouped(m.depth_params, cfg, feats, obj, valid, o_count)
    np.testing.assert_allclose(np.asarray(vis), np.asarray(want_v), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(want_d), rtol=2e-2, atol=2e-2)
    assert (np.asarray(vis)[~np.asarray(valid)] == 0).all()
