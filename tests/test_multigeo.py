"""Multi-geo proxies end-to-end (reference MultiGeoNeuralVisNetwork +
loadMultiDatasets, /root/reference/trainingcode/module.py:531-582 and
datasets.py:228-268): one instance-ID-conditioned net replaces N
single-object nets."""
import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from pg2024_dprt_tpu.models.mlp import MLPConfig, apply_mlp, init_mlp
from pg2024_dprt_tpu.models.proxy import apply_multigeo, multigeo_proxy_models
from pg2024_dprt_tpu.scene import MeshGeometry, device_scene_from_meshes
from pg2024_dprt_tpu.scene.procedural import _quad
from pg2024_dprt_tpu.train.datagen import generate_multigeo_dataset, generate_proxy_dataset
from pg2024_dprt_tpu.train.datasets import (
    INSTANCE_DIVISOR, balance_vis, multi_geo_features, split_train_test)
from pg2024_dprt_tpu.train.loop import TrainConfig, fit


def _wall_object(axis: int, offset: float):
    """A simple object in [0,1]^3: an axis-aligned half-space-ish wall —
    very learnable visibility structure."""
    if axis == 0:
        v0, v1, v2 = _quad([offset, 0, 0], [offset, 1, 0], [offset, 1, 1],
                           [offset, 0, 1])
    else:
        v0, v1, v2 = _quad([0, offset, 0], [1, offset, 0], [1, offset, 1],
                           [0, offset, 1])
    return device_scene_from_meshes([MeshGeometry(v0=v0, v1=v1, v2=v2,
                                                  name=f"wall{axis}")])


def _acc(params, cfg, x, y):
    pred = np.asarray(apply_mlp(params, jnp.asarray(x), cfg))
    return ((pred > 0.5) == (y > 0.5)).mean()


def test_multigeo_net_replaces_singles():
    """A-B: one 6-feature multi-geo vis net reaches accuracy parity with two
    per-object 5-feature nets on their own held-out sets."""
    lo = np.zeros(3, np.float32)
    hi = np.ones(3, np.float32)
    scenes = [_wall_object(0, 0.5), _wall_object(1, 0.35)]
    n = 8192
    # sigmoid+MSE plateaus at the base rate below this capacity/step count
    # (width-64/60-epoch runs stick at constant predictions)
    cfg5 = MLPConfig(width=128, depth=2, in_features=5, head_hidden=32,
                     final_activation="sigmoid")
    cfg6 = MLPConfig(width=128, depth=2, in_features=6, head_hidden=32,
                     final_activation="sigmoid", multi_geo=True)
    tcfg = TrainConfig(nn_type="vis", batch=256, epochs=120, seed=11)

    single_accs, tests = [], []
    feats_l, vis_l = [], []
    for i, sc in enumerate(scenes):
        f, depth = generate_proxy_dataset(sc, lo, hi, n, seed=13 + i)
        x, y = balance_vis(np.asarray(f), np.asarray(depth), seed=i)
        feats_l.append(x)
        vis_l.append(y)
        tr_x, tr_y, te_x, te_y = split_train_test(x, y, seed=3)
        params, _ = fit(tr_x, tr_y, cfg5, tcfg)
        single_accs.append(_acc(params, cfg5, te_x, te_y))
        tests.append((te_x, te_y, i))

    mx, my = multi_geo_features(feats_l, vis_l)
    tr_x, tr_y, _, _ = split_train_test(mx, my, seed=3)
    mparams, _ = fit(tr_x, tr_y, cfg6, tcfg)

    multi_accs = []
    for te_x, te_y, i in tests:
        iid = np.full((te_x.shape[0], 1), np.float32(i / INSTANCE_DIVISOR))
        te6 = np.concatenate([te_x, iid], axis=1)
        multi_accs.append(_acc(mparams, cfg6, te6, te_y))

    for sa, ma in zip(single_accs, multi_accs):
        assert sa > 0.85, f"single net failed to learn: {single_accs}"
        assert ma > sa - 0.07, f"multi-geo below parity: {multi_accs} vs {single_accs}"


def test_multigeo_render_path():
    """secondary_route consumes a multi-geo ProxyModels end-to-end: the
    shared net's instance-conditioned predictions drive routing exactly as
    apply_multigeo computes them."""
    from pg2024_dprt_tpu.core.types import PathState
    from pg2024_dprt_tpu.render.proxy_stages import march_proxies_xla, secondary_route
    from pg2024_dprt_tpu.scene import random_tri_soup
    from pg2024_dprt_tpu.scene.geometry import ProxyTable
    from pg2024_dprt_tpu.scene.lights import EnvironmentMap

    scene = device_scene_from_meshes([random_tri_soup(256, seed=4)],
                                     tris_per_cluster=64)
    offs = np.asarray([[1.4, 0, 0], [0, 1.4, 0]], np.float32)
    proxies = ProxyTable(
        aabb_min=jnp.asarray(offs), aabb_max=jnp.asarray(offs + 1.0),
        max_length=jnp.asarray(np.linalg.norm(np.ones((2, 3)), axis=1)),
    )
    cfg6 = MLPConfig(width=32, depth=1, in_features=6, head_hidden=16,
                     final_activation="sigmoid", multi_geo=True)
    key = jax.random.PRNGKey(5)
    vis_p = init_mlp(key, cfg6)
    # a freshly initialized net is near-constant pre-sigmoid (the global
    # out1+out2 skip dominates); amplify + center the head so the test gets
    # a MIX of >0.5 and <0.5 predictions to exercise routing with
    cfg_pre = MLPConfig(width=32, depth=1, in_features=6, head_hidden=16,
                        final_activation="none", multi_geo=True)
    rngp = np.random.RandomState(99)
    probe = np.concatenate(
        [rngp.rand(512, 5), rngp.randint(0, 2, (512, 1)) / 4.0],
        axis=1).astype(np.float32)
    center = float(np.mean(np.asarray(
        apply_mlp(vis_p, jnp.asarray(probe), cfg_pre))))
    vis_p = {**vis_p, "head_w2": vis_p["head_w2"] * 30.0,
             "head_b2": vis_p["head_b2"] * 30.0 - 30.0 * center}
    models = multigeo_proxy_models(vis_p,
                                   init_mlp(jax.random.fold_in(key, 1), cfg6),
                                   2, cfg6, cfg6)
    rng = np.random.RandomState(6)
    nrays = 128
    o = jnp.asarray(rng.rand(nrays, 3).astype(np.float32) * 0.5 + 0.25)
    d = rng.randn(nrays, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    paths = PathState.empty(nrays)._replace(
        origin=o, direction=d,
        tmax=jnp.full((nrays,), 3.4e38, jnp.float32),
        throughput=jnp.ones((nrays, 3), jnp.float32),
        pixel_index=jnp.asarray(np.arange(nrays, dtype=np.int32)),
        is_valid=jnp.ones((nrays,), bool),
    )
    env = EnvironmentMap.constant((0.2, 0.2, 0.2))
    new_paths, env_add, diag = secondary_route(
        scene, proxies, models, env, paths, jnp.int32(7), 3, 1e-3, nrays)
    # the routing decision must reflect the multi-geo net's own predictions
    from pg2024_dprt_tpu.ops.traversal import traverse_bvh

    q = march_proxies_xla(proxies, o, d, paths.tmax, paths.is_valid,
                          jnp.int32(7), 3, 1e-3)
    vis = np.asarray(apply_multigeo(models.vis_params, cfg6, q.features,
                                    q.aabb_id, q.is_valid))
    local = traverse_bvh(scene, o, d, 1e-3, paths.tmax, paths.is_valid)
    local_hit = np.asarray(local.is_hit)
    tnode = np.asarray(new_paths.target_node)
    valid = np.asarray(q.is_valid).reshape(nrays, 3)
    any_pred_hit = ((vis > 0.5).reshape(nrays, 3) & valid).any(axis=1)
    marched = valid.any(axis=1)
    assert marched.any()
    # a predicted proxy hit with no closer local hit must route to one of
    # the marched proxies or settle local (local wins on distance); rays
    # with neither local hit nor predicted hit but marched queries take the
    # no-route quirk (stay local, node = my_id = 7)
    sel = any_pred_hit & (~local_hit)
    assert sel.any(), "test needs rays routed by prediction alone"
    assert np.isin(tnode[sel], (0, 1)).all()
    noroute = marched & (~any_pred_hit) & (~local_hit)
    if noroute.any():
        assert (tnode[noroute] == 7).all()
    assert np.isfinite(np.asarray(env_add)).all()


def test_fused_route_multigeo_matches_composed():
    """The route megakernel's in-kernel multi-geo form (pn=1 shared net,
    iid feature column) must agree end-to-end with the composed
    march_proxies_xla + apply_multigeo path."""
    import dataclasses

    import pg2024_dprt_tpu.render.proxy_stages as ps
    from pg2024_dprt_tpu.core.types import PathState
    from pg2024_dprt_tpu.scene import random_tri_soup
    from pg2024_dprt_tpu.scene.geometry import ProxyTable
    from pg2024_dprt_tpu.scene.lights import EnvironmentMap

    scene = device_scene_from_meshes([random_tri_soup(900, seed=0)],
                                     tris_per_cluster=64)
    offs = np.asarray(
        [[-1.05, 0, 0], [1.05, 0, 0], [0, -1.05, 0], [0, 1.05, 0],
         [0, 0, -1.05], [0, 0, 1.05]], np.float32)
    proxies = ProxyTable(
        aabb_min=jnp.asarray(offs), aabb_max=jnp.asarray(offs + 1.0),
        max_length=jnp.asarray(np.linalg.norm(np.ones((6, 3)), axis=1)
                               .astype(np.float32)),
    )
    cfg6 = MLPConfig(width=64, depth=2, in_features=6, multi_geo=True)
    key = jax.random.PRNGKey(9)
    for vis_bias, seed in ((10.0, 31), (-10.0, 37)):
        models = multigeo_proxy_models(
            init_mlp(key, cfg6), init_mlp(jax.random.fold_in(key, 1), cfg6),
            6, cfg6, cfg6)
        models = dataclasses.replace(
            models,
            vis_params={k: (v + vis_bias if k == "head_b2" else v)
                        for k, v in models.vis_params.items()})
        rng = np.random.RandomState(seed)
        n = 512
        o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
        d = rng.randn(n, 3).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
        paths = PathState.empty(n)._replace(
            origin=o, direction=d,
            tmax=jnp.full((n,), 3.4e38, jnp.float32),
            throughput=jnp.ones((n, 3), jnp.float32),
            pixel_index=jnp.asarray(np.arange(n, dtype=np.int32)),
            is_valid=jnp.asarray(rng.rand(n) > 0.1),
        )
        env = EnvironmentMap.constant((0.4, 0.5, 0.7))
        composed = ps.secondary_route(scene, proxies, models, env, paths,
                                      jnp.int32(6), 3, 1e-3, n)
        orig = ps._use_fused_route
        ps._use_fused_route = lambda *a: True
        try:
            fused = ps.secondary_route(scene, proxies, models, env, paths,
                                       jnp.int32(6), 3, 1e-3, n)
        finally:
            ps._use_fused_route = orig
        (cp, ce, _), (fp, fe, _) = composed, fused
        np.testing.assert_array_equal(np.asarray(cp.target_node),
                                      np.asarray(fp.target_node),
                                      err_msg=str(vis_bias))
        np.testing.assert_array_equal(np.asarray(cp.current_node),
                                      np.asarray(fp.current_node))
        np.testing.assert_array_equal(np.asarray(cp.is_hit),
                                      np.asarray(fp.is_hit))
        np.testing.assert_array_equal(np.asarray(cp.is_valid),
                                      np.asarray(fp.is_valid))
        np.testing.assert_allclose(np.asarray(cp.tmax), np.asarray(fp.tmax),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(ce), np.asarray(fe),
                                   rtol=1e-5, atol=1e-6)
