"""RIS NEE estimator (RenderConfig.nee_mode="ris") — correctness gates.

The reservoir-sampled single-shadow-ray estimator must (a) keep the same
expectation as the reference's shadowPathCount-sum (kernel.cu:444-465), and
(b) degenerate to the sum estimator exactly at shadow_path_count=1.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.render import RenderConfig, render_image
from pg2024_dprt_tpu.scene import cornell_box, device_scene_from_meshes
from pg2024_dprt_tpu.scene.lights import EnvironmentMap


def _setup(spp, bounces=2, side=24, spc=4, nee_mode="ris"):
    meshes, lights = cornell_box()
    scene = device_scene_from_meshes(meshes)
    env = EnvironmentMap.constant((0.1, 0.12, 0.15))
    camera = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                            40.0, side, side)
    cfg = RenderConfig(width=side, height=side, spp=spp, bounces=bounces,
                       shadow_path_count=spc, nee_mode=nee_mode)
    return scene, lights, env, camera, cfg


def test_ris_expectation_matches_sum():
    """Monte-Carlo agreement: at moderate spp both estimators converge to
    the same direct lighting (tone-mapped mean within a few percent)."""
    scene, lights, env, camera, cfg_r = _setup(spp=32, nee_mode="ris")
    cfg_s = dataclasses.replace(cfg_r, nee_mode="sum")
    img_r = np.asarray(render_image(scene, lights, env, camera, cfg_r))
    img_s = np.asarray(render_image(scene, lights, env, camera, cfg_s))
    tm = lambda x: x / (1.0 + x)
    # image means agree tightly; per-pixel mean error bounded by MC noise
    ratio = img_r.mean() / img_s.mean()
    assert 0.95 < ratio < 1.05, f"ris/sum mean ratio {ratio}"
    err = np.abs(tm(img_r) - tm(img_s)).mean()
    assert err < 0.03, f"mean tone-mapped deviation {err}"


def test_ris_spc1_identical_to_sum():
    """shadow_path_count=1: the reservoir has one candidate — both modes
    must produce the SAME image bit-for-bit."""
    scene, lights, env, camera, cfg_r = _setup(spp=2, spc=1, nee_mode="ris")
    cfg_s = dataclasses.replace(cfg_r, nee_mode="sum")
    img_r = np.asarray(render_image(scene, lights, env, camera, cfg_r))
    img_s = np.asarray(render_image(scene, lights, env, camera, cfg_s))
    np.testing.assert_array_equal(img_r, img_s)


def test_ris_shadow_buffer_is_single_row():
    """Structural: RIS shade emits one shadow path per shading point (the
    S-fold shadow wavefront is the thing being optimized away)."""
    from pg2024_dprt_tpu.core.types import PathState
    from pg2024_dprt_tpu.ops.trace_api import trace_closest_cutout
    from pg2024_dprt_tpu.render.pathgen import generate_camera_paths
    from pg2024_dprt_tpu.render.shade import shade

    scene, lights, env, camera, cfg = _setup(spp=1, side=16)
    paths = generate_camera_paths(camera, 0)
    hits, _ = trace_closest_cutout(scene, paths.origin, paths.direction,
                                   1e-3, paths.tmax, paths.is_valid)
    _, sp_ris, _ = shade(scene, lights, env, paths, hits, 0, 0, 4,
                         cfg.frame_buffer_size, nee_mode="ris")
    _, sp_sum, _ = shade(scene, lights, env, paths, hits, 0, 0, 4,
                         cfg.frame_buffer_size, nee_mode="sum")
    assert sp_ris.capacity == paths.capacity
    assert sp_sum.capacity == 4 * paths.capacity
    # RIS throughput carries c_j*W/w_j: after the consumer's /S divide the
    # expected direct light matches the sum of candidates in expectation —
    # spot-check the scale is ≥ the selected candidate's own contribution
    tp = np.asarray(sp_ris.throughput)
    v = np.asarray(sp_ris.is_valid)
    assert np.isfinite(tp).all()
    assert (tp[v] >= 0).all()
