"""Russian-roulette path termination (RenderConfig.russian_roulette) —
correctness gates (VERDICT r4 item 3).

RR is unbiased by construction (1/p compensation), so (a) the estimator
expectation must match the RR-off render, (b) rr=0 must be byte-identical
to the pre-RR pipeline, (c) the in-kernel form (ops/pallas_frame.py) must
reproduce the composed form bit-for-bit (shared RR_SALT draw stream), and
(d) the distributed program must accept it.  The reference has no RR
(optix/kernel.cu:424-439) — this is a beyond-parity estimator lever aimed
at the dominant bounce-closest wavefronts.
"""
import dataclasses

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.render import RenderConfig, render_image
from pg2024_dprt_tpu.render.engine import render_sample
from pg2024_dprt_tpu.ops.pallas_frame import render_sample_fused
from pg2024_dprt_tpu.scene import cornell_box, device_scene_from_meshes
from pg2024_dprt_tpu.scene.lights import EnvironmentMap


def _setup(spp, bounces=4, side=24, rr=0):
    meshes, lights = cornell_box()
    scene = device_scene_from_meshes(meshes)
    env = EnvironmentMap.constant((0.1, 0.12, 0.15))
    camera = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                            40.0, side, side)
    cfg = RenderConfig(width=side, height=side, spp=spp, bounces=bounces,
                       russian_roulette=rr, fused_frame="off")
    return scene, lights, env, camera, cfg


def test_rr_expectation_matches_no_rr():
    """Monte-Carlo agreement: at moderate spp the RR estimator converges to
    the same image as the full-depth render (RR adds variance, never
    bias)."""
    scene, lights, env, camera, cfg_rr = _setup(spp=48, rr=1)
    cfg_off = dataclasses.replace(cfg_rr, russian_roulette=0)
    img_rr = np.asarray(render_image(scene, lights, env, camera, cfg_rr))
    img_off = np.asarray(render_image(scene, lights, env, camera, cfg_off))
    tm = lambda x: x / (1.0 + x)
    ratio = img_rr.mean() / img_off.mean()
    assert 0.95 < ratio < 1.05, f"rr/off mean ratio {ratio}"
    err = np.abs(tm(img_rr) - tm(img_off)).mean()
    assert err < 0.04, f"mean tone-mapped deviation {err}"


def test_rr_kills_paths():
    """Structural: with an aggressive roulette the deep-bounce wavefronts
    actually shrink (fewer valid paths than the rr=0 render would carry).
    Verified through the image: bounce>=1 indirect light dims on SOME
    samples but the mean stays (compensation) — here we just check the two
    images differ (the roulette fired) while expectation holds above."""
    scene, lights, env, camera, cfg_rr = _setup(spp=2, rr=1)
    cfg_off = dataclasses.replace(cfg_rr, russian_roulette=0)
    img_rr = np.asarray(render_image(scene, lights, env, camera, cfg_rr))
    img_off = np.asarray(render_image(scene, lights, env, camera, cfg_off))
    assert not np.array_equal(img_rr, img_off)


def test_rr_fused_matches_composed():
    """The in-kernel RR (frame megakernel) must make the SAME survival
    decisions as the composed pipeline — shared TEA stream, bit-identical
    up to fp reassociation of the surrounding math."""
    scene, lights, env, camera, cfg = _setup(spp=1, rr=1)
    for sample in (0, 5):
        d0, e0, _ = render_sample(scene, lights, env, camera, sample, cfg)
        d1, e1, _ = render_sample_fused(scene, lights, env, camera, sample,
                                        cfg, interpret=True)
        for a, b in ((d0, d1), (e0, e1)):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-2)
            assert rel.max() < 1e-3, rel.max()


def test_rr_distributed_matches_single_device():
    """Exact-mode distributed render with RR == single-device render with RR
    (the roulette draws key on pixel index + bounce salt, not partition)."""
    from pg2024_dprt_tpu.models import random_proxy_models
    from pg2024_dprt_tpu.parallel import make_mesh, render_image_distributed
    from pg2024_dprt_tpu.scene import build_partitioned_scene

    meshes, lights = cornell_box()
    part = build_partitioned_scene(meshes, 4)
    env = EnvironmentMap.constant((0.2, 0.3, 0.4))
    camera = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                            40.0, 24, 24)
    cfg = RenderConfig(width=24, height=24, spp=1, bounces=3,
                       russian_roulette=1)
    single = device_scene_from_meshes(meshes)
    want = np.asarray(render_image(single, lights, env, camera, cfg))
    mesh = make_mesh(4)
    models = random_proxy_models(jax.random.PRNGKey(0), 4)
    got = np.asarray(
        render_image_distributed(part, models, lights, env, camera, cfg, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
