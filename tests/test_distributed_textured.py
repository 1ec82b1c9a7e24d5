"""Textured distributed rendering (VERDICT r4 item 6): a textured scene
(bilinear albedo + alpha-cutout pool replicated per partition) rendered over
the mesh must equal the single-device textured render.  Reference: per-mesh
albedo textures are uploaded on EVERY rank
(/root/reference/src/render/renderer.cpp:1613-1723) and the cutout anyhit
runs in all pipelines (optix/kernel.cu:311-359)."""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import pytest

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.models import random_proxy_models
from pg2024_dprt_tpu.parallel import make_mesh, render_image_distributed
from pg2024_dprt_tpu.render import RenderConfig, render_image
from pg2024_dprt_tpu.scene import (
    MeshGeometry, build_partitioned_scene, cornell_box,
    device_scene_from_meshes)
from pg2024_dprt_tpu.scene.lights import EnvironmentMap
from pg2024_dprt_tpu.scene.textures import checkerboard


def _textured_setup():
    """cornell with a uv-mapped checkerboard floor + a half-transparent
    cutout panel mid-room (exercises bilinear fetch AND the cutout re-trace
    through the distributed migration loop)."""
    meshes, lights = cornell_box()
    uv = np.asarray([[0, 0], [0, 1], [1, 1], [0, 0], [1, 1], [1, 0]],
                    np.float32)
    floor = meshes[0]
    meshes[0] = MeshGeometry(
        v0=floor.v0, v1=floor.v1, v2=floor.v2,
        uv0=uv[0::3], uv1=uv[1::3], uv2=uv[2::3],
        base_color=(1, 1, 1), texture_index=0, name="floor")
    # vertical panel with an alpha-0 texture: rays/shadows must pass
    panel = np.asarray([
        [[0.2, 0.1, 0.5], [0.8, 0.1, 0.5], [0.8, 0.7, 0.5]],
        [[0.2, 0.1, 0.5], [0.8, 0.7, 0.5], [0.2, 0.7, 0.5]],
    ], np.float32)
    pu = np.asarray([[0, 0], [1, 0], [1, 1], [0, 0], [1, 1], [0, 1]],
                    np.float32)
    meshes.append(MeshGeometry(
        v0=panel[:, 0], v1=panel[:, 1], v2=panel[:, 2],
        uv0=pu[0::3], uv1=pu[1::3], uv2=pu[2::3],
        base_color=(1, 1, 1), texture_index=1, name="cutout_panel"))
    clear = np.zeros((8, 8, 4), np.float32)
    clear[..., :3] = 0.9
    textures = [checkerboard(tiles=4), clear]
    env = EnvironmentMap.constant((0.15, 0.18, 0.22))
    camera = Camera.look_at([0.5, 0.6, 2.4], [0.5, 0.4, 0.0], [0, 1, 0],
                            45.0, 28, 28)
    cfg = RenderConfig(width=28, height=28, spp=1, bounces=2)
    return meshes, textures, lights, env, camera, cfg


@pytest.mark.parametrize("parts", [2, 8])
def test_distributed_textured_matches_single_device(parts):
    meshes, textures, lights, env, camera, cfg = _textured_setup()
    single = device_scene_from_meshes(meshes, textures=textures)
    assert single.albedo_textures.has_cutout
    want = np.asarray(render_image(single, lights, env, camera, cfg))

    part = build_partitioned_scene(meshes, parts, textures=textures)
    mesh = make_mesh(parts)
    models = random_proxy_models(jax.random.PRNGKey(0), parts)
    got = np.asarray(
        render_image_distributed(part, models, lights, env, camera, cfg, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_distributed_texture_actually_sampled():
    """The checker texture modulates the distributed image (texture pool
    really rides every partition), and the cutout panel does not darken the
    floor (transparent anyhit through the ring-shadow path)."""
    meshes, textures, lights, env, camera, cfg = _textured_setup()
    mesh = make_mesh(2)
    models = random_proxy_models(jax.random.PRNGKey(0), 2)
    img_tex = np.asarray(render_image_distributed(
        build_partitioned_scene(meshes, 2, textures=textures),
        models, lights, env, camera, cfg, mesh))
    img_plain = np.asarray(render_image_distributed(
        build_partitioned_scene(meshes, 2),
        models, lights, env, camera, cfg, mesh))
    assert not np.allclose(img_tex, img_plain)
    assert np.isfinite(img_tex).all()
