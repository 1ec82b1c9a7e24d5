"""Proxy training pipeline tests: data generation oracle properties, loaders,
a real (small) training run that must learn, checkpoint round-trip."""
import numpy as np
import jax.numpy as jnp

from pg2024_dprt_tpu.models.mlp import MLPConfig, apply_mlp
from pg2024_dprt_tpu.scene import MeshGeometry, device_scene_from_meshes
from pg2024_dprt_tpu.scene.procedural import _box
from pg2024_dprt_tpu.train import (
    TrainConfig,
    balance_vis,
    depth_only,
    fit,
    generate_proxy_dataset,
    split_train_test,
)
from pg2024_dprt_tpu.train.loop import load_checkpoint, save_checkpoint
from pg2024_dprt_tpu.train.datasets import export_exr_pair, load_exr_pair


def _box_scene():
    v0, v1, v2 = _box([0.3, 0.3, 0.3], [0.7, 0.7, 0.7])
    mesh = MeshGeometry(v0=v0, v1=v1, v2=v2, name="box")
    return device_scene_from_meshes([mesh])


def test_datagen_properties():
    scene = _box_scene()
    feats, depth = generate_proxy_dataset(scene, [0, 0, 0], [1, 1, 1], 20_000, seed=1)
    assert feats.shape == (20_000, 5)
    assert np.isfinite(feats).all()
    # features normalized to [0,1]
    assert feats.min() >= -1e-5 and feats.max() <= 1 + 1e-5
    assert (depth >= 0).all() and (depth <= 1).all()
    hit_frac = (depth < 1.0).mean()
    # an inner box covering 40% of each axis: plenty of hits and misses
    assert 0.05 < hit_frac < 0.95


def test_balance_and_depth_filters():
    feats = np.random.RandomState(0).rand(1000, 5).astype(np.float32)
    depth = np.ones(1000, np.float32)
    depth[:200] = 0.5  # 200 hits
    x, y = balance_vis(feats, depth, ratio=1.5)
    assert set(np.unique(y)) <= {0.0, 1.0}
    assert (y == 1.0).sum() == 200
    assert (y == 0.0).sum() == 300  # 1.5x hits

    xd, yd = depth_only(feats, depth)
    assert xd.shape[0] == 200 and (yd == 0.5).all()


def test_training_learns_visibility():
    """A small vis net must beat 85% accuracy on box visibility — the
    fit-for-purpose bar for proxy routing."""
    scene = _box_scene()
    feats, depth = generate_proxy_dataset(scene, [0, 0, 0], [1, 1, 1], 40_000, seed=2)
    x, y = balance_vis(feats, depth)
    cfg = MLPConfig(width=128, depth=2)
    params, hist = fit(
        x, y, cfg, TrainConfig(nn_type="vis", epochs=60, batch=4096, learn_rate=5e-3)
    )
    assert hist["test_loss"][-1] < hist["test_loss"][0]

    _, _, tx, ty = split_train_test(x, y, seed=123)
    pred = np.asarray(apply_mlp(params, jnp.asarray(tx[:5000]), cfg))
    acc = ((pred > 0.5) == (ty[:5000] > 0.5)).mean()
    assert acc > 0.85, f"vis accuracy {acc}"


def test_checkpoint_roundtrip(tmp_path):
    from pg2024_dprt_tpu.models.mlp import init_mlp
    import jax

    cfg = MLPConfig(width=64, depth=2)
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, params)
    back = load_checkpoint(p)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(params[k]))


def test_exr_dataset_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    feats = rng.rand(1000, 5).astype(np.float32)
    labels = rng.rand(1000).astype(np.float32)
    op, dp = str(tmp_path / "o.exr"), str(tmp_path / "d.exr")
    export_exr_pair(op, dp, feats, labels, width=128)
    f2, l2 = load_exr_pair(op, dp)
    np.testing.assert_allclose(f2[:1000], feats, atol=0)
    np.testing.assert_allclose(l2[:1000], labels, atol=0)


def test_grouped_inference_matches_reference():
    """MoE-dispatch grouped MLP == per-object masked loop (all valid rows)."""
    import jax
    from pg2024_dprt_tpu.models.proxy import (
        apply_grouped, apply_grouped_reference, random_proxy_models,
    )

    o = 5
    models = random_proxy_models(jax.random.PRNGKey(3), o, MLPConfig(width=64, depth=2),
                                 MLPConfig(width=64, depth=2))
    rng = np.random.RandomState(4)
    q = 3000
    feats = jnp.asarray(rng.rand(q, 5).astype(np.float32))
    obj = jnp.asarray(rng.randint(0, o, q).astype(np.int32))
    valid = jnp.asarray(rng.rand(q) > 0.3)

    want = np.asarray(apply_grouped_reference(
        models.vis_params, models.vis_cfg, feats, obj, valid, o,
        compute_dtype=jnp.float32))
    got = np.asarray(apply_grouped(
        models.vis_params, models.vis_cfg, feats, obj, valid, o,
        compute_dtype=jnp.float32, block=256))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # invalid rows are zero
    assert (got[~np.asarray(valid)] == 0).all()


def test_bf16_export_parity():
    import jax
    from pg2024_dprt_tpu.models.mlp import half_vs_full_error, init_mlp, to_bf16

    cfg = MLPConfig(width=128, depth=2)
    params = init_mlp(jax.random.PRNGKey(7), cfg)
    x = jnp.asarray(np.random.RandomState(8).rand(512, 5).astype(np.float32))
    err = half_vs_full_error(params, x, cfg)
    assert err < 1e-3
    assert all(a.dtype == jnp.bfloat16 for a in to_bf16(params).values())


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax
    from pg2024_dprt_tpu.models.mlp import init_mlp
    from pg2024_dprt_tpu.train.loop import load_checkpoint_orbax, save_checkpoint_orbax

    cfg = MLPConfig(width=64, depth=2)
    params = init_mlp(jax.random.PRNGKey(9), cfg)
    p = str(tmp_path / "ck")
    save_checkpoint_orbax(p, params)
    back = load_checkpoint_orbax(p, like=params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(params[k]))
