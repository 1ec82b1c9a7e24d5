"""Flagship A-B test (SURVEY.md §4e): a 2-partition scene rendered with
TRAINED neural proxies must approximate the exact (ring-shadow + full
migration) render — the paper's core claim, reproduced end-to-end on the
virtual mesh: data generation -> training -> stacked deployment ->
distributed render."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.models.mlp import MLPConfig
from pg2024_dprt_tpu.models.proxy import ProxyModels
from pg2024_dprt_tpu.models import stack_params
from pg2024_dprt_tpu.parallel import make_mesh, render_image_distributed
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.scene import build_partitioned_scene, two_room_scene
from pg2024_dprt_tpu.scene.geometry import DeviceScene, device_scene_from_meshes
from pg2024_dprt_tpu.scene.partition import partition_meshes
from pg2024_dprt_tpu.train import TrainConfig, balance_vis, depth_only, fit, generate_proxy_dataset


@pytest.mark.slow
def test_scaled_ab_with_committed_weights():
    """SCALED A-B (VERDICT r4 #7): P=8 statue partitions, w128·d4 nets
    trained by scripts/ab_neural_scaled.py (committed weights), 64x64 eval,
    ALL THREE model families (separate vis+depth, combined SEPARATEDNN=0,
    multi-geo shared net) through the SAME distributed A-B — plus a
    RANDOM-weight CONTROL that must degrade the image by a wide margin
    (an A-B whose scene the proxies cannot influence is vacuous; the
    side-grazing light makes every visible NEE ray cross neighbor AABBs).
    Tolerances derive from artifacts/ab_scaled/ab_report.json: trained
    families measured at 5e-6..6e-5 mean tone-mapped err (gate 3e-4 = 5x
    headroom), the all-miss random control at 1.1e-3 (gate >5e-4)."""
    import os
    import sys

    weights = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "ab_scaled", "weights.npz")
    if not os.path.exists(weights):
        pytest.skip("run scripts/ab_neural_scaled.py to produce weights")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import ab_neural_scaled as ab

    from pg2024_dprt_tpu.models.proxy import random_proxy_models
    from pg2024_dprt_tpu.scene.lights import EnvironmentMap  # noqa: F401

    meshes, lights, part, env, camera = ab._scene()
    mesh = make_mesh(ab.PARTS)
    models_sep, models_comb, models_mg = ab.load_models(weights)
    cfg_exact = RenderConfig(width=ab.SIDE, height=ab.SIDE, spp=2, bounces=2)
    cfg_nn = RenderConfig(width=ab.SIDE, height=ab.SIDE, spp=2, bounces=2,
                          use_neural_proxies=True)
    exact = np.asarray(render_image_distributed(
        part, models_sep, lights, env, camera, cfg_exact, mesh))
    tm = lambda x: x / (1.0 + x)

    for name, models in (("separate", models_sep),
                         ("combined", models_comb),
                         ("multigeo", models_mg)):
        nn = np.asarray(render_image_distributed(
            part, models, lights, env, camera, cfg_nn, mesh))
        err = np.abs(tm(nn) - tm(exact))
        assert err.mean() < 3e-4, f"{name}: mean err {err.mean()}"
        ratio = nn.mean() / exact.mean()
        assert 0.99 < ratio < 1.01, f"{name}: ratio {ratio}"

    # engagement control: untrained nets must measurably break the image
    rnd = random_proxy_models(jax.random.PRNGKey(3), ab.PARTS,
                              models_sep.vis_cfg, models_sep.depth_cfg)
    nn_r = np.asarray(render_image_distributed(
        part, rnd, lights, env, camera, cfg_nn, mesh))
    err_r = np.abs(tm(nn_r) - tm(exact))
    assert err_r.mean() > 5e-4, \
        f"control too weak ({err_r.mean()}): A-B not exercising proxies"


@pytest.mark.slow
def test_trained_proxies_approximate_exact_render():
    meshes, lights = two_room_scene(num_rooms=2, tris_per_room=160)
    parts = 2
    part = build_partitioned_scene(meshes, parts)
    mesh = make_mesh(parts)

    from pg2024_dprt_tpu.scene.lights import EnvironmentMap

    env = EnvironmentMap.constant((0.25, 0.25, 0.3))
    camera = Camera.look_at([1.25, 1.2, 5.0], [1.25, 0.8, 0.5], [0, 1, 0], 50.0, 24, 24)

    # --- train small vis+depth nets per partition on its real geometry ---
    assignment = partition_meshes(meshes, parts)
    vis_cfg = MLPConfig(width=64, depth=2)
    depth_cfg = MLPConfig(width=64, depth=2)
    vis_list, depth_list = [], []
    for p, idxs in enumerate(assignment):
        sub_scene = device_scene_from_meshes([meshes[i] for i in idxs])
        lo = np.asarray(part.proxies.aabb_min[p])
        hi = np.asarray(part.proxies.aabb_max[p])
        feats, depth = generate_proxy_dataset(sub_scene, lo, hi, 30_000, seed=100 + p)
        xv, yv = balance_vis(feats, depth)
        vp, _ = fit(xv, yv, vis_cfg, TrainConfig(nn_type="vis", epochs=25, batch=4096, learn_rate=5e-3))
        xd, yd = depth_only(feats, depth)
        if xd.shape[0] < 256:  # ensure a trainable depth set
            xd, yd = feats, depth
        dp, _ = fit(xd, yd, depth_cfg, TrainConfig(nn_type="depth", epochs=25, batch=4096, learn_rate=5e-3))
        vis_list.append(vp)
        depth_list.append(dp)

    models = ProxyModels(
        vis_params=stack_params(vis_list),
        depth_params=stack_params(depth_list),
        num_objects=parts,
        vis_cfg=vis_cfg,
        depth_cfg=depth_cfg,
    )

    cfg_exact = RenderConfig(width=24, height=24, spp=2, bounces=2, use_neural_proxies=False)
    cfg_nn = RenderConfig(width=24, height=24, spp=2, bounces=2, use_neural_proxies=True)

    exact = np.asarray(render_image_distributed(part, models, lights, env, camera, cfg_exact, mesh))
    nn = np.asarray(render_image_distributed(part, models, lights, env, camera, cfg_nn, mesh))

    assert np.isfinite(nn).all() and (nn >= 0).all()
    # tone-mapped relative error: the neural approximation must be close on
    # most pixels (reference tolerates approximation error by design)
    tm = lambda x: x / (1.0 + x)
    err = np.abs(tm(nn) - tm(exact))
    assert err.mean() < 0.08, f"neural vs exact mean tone-mapped error {err.mean()}"
    # per-pixel quality: 90th-percentile tone-mapped error bounded (a render
    # that is right on average but badly wrong on a pixel band fails here)
    p90 = float(np.percentile(err, 90))
    assert p90 < 0.2, f"neural vs exact p90 tone-mapped error {p90}"
    # two-sided mean-brightness bound: catches uniformly-dimmed (e.g.
    # half-brightness: everything spuriously occluded) AND uniformly-blown
    # renders that a one-sided floor would pass
    ratio = nn.mean() / max(exact.mean(), 1e-12)
    assert 0.7 < ratio < 1.4, f"neural/exact mean-brightness ratio {ratio}"
