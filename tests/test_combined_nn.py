"""SEPARATEDNN=0 end-to-end: one double-output net drives both the vis and
depth predictions through the full distributed neural pipeline
(/root/reference/src/render/renderer.cpp:35 `#else` branches;
NeuralVisNetworkWith4Res256AndEncoderDoubleOutput)."""
import numpy as np
import jax
import jax.numpy as jnp

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.models.mlp import COMBINED_VISDEPTH, MLPConfig
from pg2024_dprt_tpu.models.proxy import random_combined_proxy_models
from pg2024_dprt_tpu.parallel import make_mesh, render_image_distributed
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.scene import build_partitioned_scene, cornell_box
from pg2024_dprt_tpu.scene.lights import EnvironmentMap


def test_combined_models_shapes():
    m = random_combined_proxy_models(jax.random.PRNGKey(0), 4)
    assert m.combined and m.num_objects == 4
    assert m.vis_cfg.out_features == 2
    assert m.vis_params["head_w1"].shape == (4, 64, 2)
    assert m.depth_params == {}


def test_distributed_combined_mode_runs():
    """The neural-proxy distributed program accepts SEPARATEDNN=0 models:
    finite non-negative image with direct lighting present."""
    meshes, lights = cornell_box()
    part = build_partitioned_scene(meshes, 2)
    env = EnvironmentMap.constant((0.2, 0.3, 0.4))
    camera = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                            40.0, 24, 24)
    cfg = RenderConfig(width=24, height=24, spp=1, bounces=2,
                       use_neural_proxies=True)
    mesh = make_mesh(2)
    # a small combined net keeps the CPU-mesh test fast; same architecture
    # family as COMBINED_VISDEPTH
    small = MLPConfig(width=64, depth=2, out_features=2,
                      final_activation="sigmoid")
    models = random_combined_proxy_models(jax.random.PRNGKey(1), 2, small)
    img = np.asarray(
        render_image_distributed(part, models, lights, env, camera, cfg, mesh)
    )
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.max() > 0.0


def test_combined_training_learns():
    """The combined loss (MSE vis + hit-masked L1 depth) trains a tiny
    double-output net end-to-end from the partition datagen pipeline."""
    from pg2024_dprt_tpu.scene import device_scene_from_meshes
    from pg2024_dprt_tpu.scene.procedural import random_tri_soup
    from pg2024_dprt_tpu.train.loop import TrainConfig, train_proxy_for_partition

    mesh = random_tri_soup(200, seed=4)
    scene = device_scene_from_meshes([mesh])
    lo, hi = mesh.aabb()
    cfg = MLPConfig(width=32, depth=1, out_features=2,
                    final_activation="sigmoid")
    params, hist = train_proxy_for_partition(
        scene, lo, hi, "combined", mlp_cfg=cfg,
        train_cfg=TrainConfig(nn_type="combined", epochs=40, batch=2048),
        num_samples=6000,
    )
    assert params["head_w1"].shape == (64, 2)
    assert hist["train_loss"][-1] < hist["train_loss"][0] * 0.9


def test_combined_accuracy_eval():
    from pg2024_dprt_tpu.models.mlp import init_mlp
    from pg2024_dprt_tpu.train.eval import combined_accuracy

    cfg = MLPConfig(width=32, depth=1, out_features=2,
                    final_activation="sigmoid")
    params = init_mlp(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(8)
    feats = rng.rand(512, 5).astype(np.float32)
    labels = np.where(rng.rand(512) > 0.5, rng.rand(512), 1.0).astype(np.float32)
    m = combined_accuracy(params, cfg, feats, labels)
    assert 0.0 <= m["vis_accuracy"] <= 1.0
    assert m["depth_l1"] >= 0.0 and 0.0 < m["hit_fraction"] < 1.0
