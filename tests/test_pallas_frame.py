"""Whole-sample frame megakernel (ops/pallas_frame.py) vs the composed
render_sample oracle, interpret mode on the CPU mesh."""
import numpy as np
import pytest

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_frame import (
    fused_frame_supported, render_sample_fused,
)
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.render.engine import render_sample
from pg2024_dprt_tpu.scene import cornell_box, device_scene_from_meshes
from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable


def _ab(scene, lights, env, camera, cfg, sample=0, tol=1e-3):
    d0, e0, _ = render_sample(scene, lights, env, camera, sample, cfg)
    d1, e1, _ = render_sample_fused(scene, lights, env, camera, sample, cfg,
                                    interpret=True)
    for a, b in ((d0, d1), (e0, e1)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-2)
        assert rel.max() < tol, rel.max()


@pytest.fixture(scope="module")
def cornell():
    meshes, lights = cornell_box()
    scene = device_scene_from_meshes(meshes)
    env = EnvironmentMap.constant((0.2, 0.3, 0.4))
    cam = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                         40.0, 32, 32)
    return scene, lights, env, cam


def test_fused_matches_composed(cornell):
    scene, lights, env, cam = cornell
    cfg = RenderConfig(width=32, height=32, spp=1, bounces=2,
                       fused_frame="off", tracer="stackless")
    assert fused_frame_supported(scene, lights, env, cfg)
    _ab(scene, lights, env, cam, cfg)


def test_fused_water_bsdf():
    meshes, lights = cornell_box(with_water_sphere=True)
    scene = device_scene_from_meshes(meshes)
    env = EnvironmentMap.constant((0.2, 0.3, 0.4))
    cam = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                         40.0, 32, 32)
    cfg = RenderConfig(width=32, height=32, spp=1, bounces=2,
                       fused_frame="off", tracer="stackless")
    _ab(scene, lights, env, cam, cfg, sample=3)


def test_fused_pad_multilight_envmap(cornell):
    scene, lights, env, _ = cornell
    # 24x24 = 576 rays: non-divisible tile padding; 3 lights: one-hot light
    # selection; rotated lat-long env: polynomial atan2/acos lookup
    tris = np.asarray([
        [[0.3, 0.99, 0.3], [0.7, 0.99, 0.3], [0.7, 0.99, 0.7]],
        [[0.1, 0.99, 0.1], [0.3, 0.99, 0.1], [0.3, 0.99, 0.3]],
        [[0.7, 0.99, 0.7], [0.9, 0.99, 0.7], [0.9, 0.99, 0.9]],
    ], np.float32)
    lights3 = LightTable.from_arrays(
        tris, np.asarray([[40, 40, 40], [10, 30, 10], [30, 10, 10]],
                         np.float32))
    rng = np.random.default_rng(0)
    img = (rng.uniform(0.0, 1.0, (16, 32, 3)).astype(np.float32)) ** 2 * 2.0
    env_ll = EnvironmentMap.from_image(img, rotation_offset=2.007)
    cam = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                         40.0, 24, 24)
    cfg = RenderConfig(width=24, height=24, spp=1, bounces=2,
                       fused_frame="off", tracer="stackless")
    _ab(scene, lights3, env_ll, cam, cfg, sample=11, tol=2e-3)


def test_fused_spp_batch(cornell):
    """spp>1 in ONE kernel launch == the sum of composed per-sample renders
    (grid-inner sample accumulation + in-kernel camera generation)."""
    from pg2024_dprt_tpu.ops.pallas_frame import render_frame_fused

    scene, lights, env, cam = cornell
    cfg = RenderConfig(width=32, height=32, spp=3, bounces=2,
                       fused_frame="off", tracer="stackless")
    d0 = e0 = 0.0
    for s in range(3):
        d, e, _ = render_sample(scene, lights, env, cam, 5 + s, cfg)
        d0 = d0 + np.asarray(d)
        e0 = e0 + np.asarray(e)
    d1, e1, _ = render_frame_fused(scene, lights, env, cam, 5, cfg, spp=3,
                                   interpret=True)
    for a, b in ((d0, d1), (e0, e1)):
        rel = np.abs(a - np.asarray(b)) / np.maximum(np.abs(a), 1e-2)
        assert rel.max() < 1e-3, rel.max()


def test_fused_gate_rejects_big_env(cornell):
    scene, lights, env, _ = cornell
    cfg = RenderConfig(width=32, height=32)
    big_env = EnvironmentMap.constant((1, 1, 1), h=64, w=64)
    assert not fused_frame_supported(scene, lights, big_env, cfg)


def _textured_cornell(images, floor_tex=0, back_tex=-1, uv_scale=1.0):
    """cornell_box with uv-mapped floor (and optionally back wall) textures."""
    from pg2024_dprt_tpu.scene import MeshGeometry

    meshes, lights = cornell_box()
    uv = uv_scale * np.asarray(
        [[0, 0], [0, 1], [1, 1], [0, 0], [1, 1], [1, 0]], np.float32)

    def retex(m, ti):
        return MeshGeometry(
            v0=m.v0, v1=m.v1, v2=m.v2,
            uv0=np.tile(uv[0::3], (len(m.v0) // 2, 1)),
            uv1=np.tile(uv[1::3], (len(m.v0) // 2, 1)),
            uv2=np.tile(uv[2::3], (len(m.v0) // 2, 1)),
            base_color=m.base_color, texture_index=ti, name=m.name)

    meshes[0] = retex(meshes[0], floor_tex)
    if back_tex >= 0:
        meshes[1] = retex(meshes[1], back_tex)
    scene = device_scene_from_meshes(meshes, textures=images)
    return scene, lights


def test_fused_textured_matches_composed():
    """In-kernel bilinear texture fetch (scanline pool + separable one-hot)
    vs the composed sample_textures oracle, single checkerboard floor."""
    from pg2024_dprt_tpu.scene.textures import checkerboard

    scene, lights = _textured_cornell([checkerboard(tiles=4)])
    assert scene.albedo_textures.pool is not None
    env = EnvironmentMap.constant((0.2, 0.3, 0.4))
    cam = Camera.look_at([0.5, 0.9, 2.2], [0.5, 0.2, 0.0], [0, 1, 0],
                         45.0, 32, 32)
    cfg = RenderConfig(width=32, height=32, spp=1, bounces=2,
                       fused_frame="off", tracer="stackless")
    assert fused_frame_supported(scene, lights, env, cfg)
    _ab(scene, lights, env, cam, cfg, sample=2)


def test_fused_textured_multires_wrap():
    """Two textures at different non-128-multiple resolutions + an
    untextured mesh mix; uvs outside [0,1) exercise wrap addressing."""
    from pg2024_dprt_tpu.scene import MeshGeometry
    from pg2024_dprt_tpu.scene.textures import checkerboard

    rng = np.random.default_rng(7)
    tex_a = rng.uniform(0.05, 1.0, (24, 40, 3)).astype(np.float32)
    tex_b = checkerboard(res=48, tiles=3)
    # uvs span [0, 1.7) — out-of-range lookups exercise wrap addressing
    scene, lights = _textured_cornell([tex_a, tex_b], floor_tex=0, back_tex=1,
                                      uv_scale=1.7)
    assert scene.albedo_textures.pool is not None
    env = EnvironmentMap.constant((0.15, 0.2, 0.25))
    cam = Camera.look_at([0.5, 0.7, 2.3], [0.5, 0.3, 0.0], [0, 1, 0],
                         45.0, 24, 24)
    cfg = RenderConfig(width=24, height=24, spp=1, bounces=2,
                       fused_frame="off", tracer="stackless")
    assert fused_frame_supported(scene, lights, env, cfg)
    _ab(scene, lights, env, cam, cfg, sample=5, tol=2e-3)


def test_fused_gate_rejects_cutout_textures():
    """Alpha-cutout texture pools must stay on the composed pipeline (the
    megakernel trace has no anyhit re-trace loop)."""
    img = np.ones((16, 16, 4), np.float32)
    img[4:12, 4:12, 3] = 0.0
    scene, lights = _textured_cornell([img])
    assert scene.albedo_textures.has_cutout
    env = EnvironmentMap.constant((0.2, 0.3, 0.4))
    cfg = RenderConfig(width=32, height=32)
    assert not fused_frame_supported(scene, lights, env, cfg)


def test_fused_grouped_matches_composed(cornell):
    """The grouped (two-level cull) frame path vs the composed oracle —
    grouped=True forces the giant-K dispatch on a small scene."""
    from pg2024_dprt_tpu.ops.pallas_frame import render_frame_fused

    scene, lights, env, cam = cornell
    cfg = RenderConfig(width=32, height=32, spp=1, bounces=2,
                       fused_frame="off", tracer="stackless")
    d0, e0, _ = render_sample(scene, lights, env, cam, 0, cfg)
    d1, e1, _ = render_frame_fused(scene, lights, env, cam, 0, cfg,
                                   interpret=True, grouped=True)
    for a, b in ((d0, d1), (e0, e1)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-2)
        assert rel.max() < 1e-3, rel.max()
