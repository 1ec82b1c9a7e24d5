"""Single-device end-to-end wavefront renderer tests (minimum slice of
SURVEY.md §7 stages 1-4)."""
import numpy as np
import jax.numpy as jnp

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.render import RenderConfig, render_image
from pg2024_dprt_tpu.scene import cornell_box, device_scene_from_meshes
from pg2024_dprt_tpu.scene.lights import EnvironmentMap


def _setup(width=32, height=32, spp=1, bounces=2, env_color=(0.0, 0.0, 0.0)):
    meshes, lights = cornell_box()
    scene = device_scene_from_meshes(meshes)
    env = EnvironmentMap.constant(env_color)
    camera = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0], 40.0, width, height)
    cfg = RenderConfig(width=width, height=height, spp=spp, bounces=bounces)
    return scene, lights, env, camera, cfg


def test_render_produces_light():
    scene, lights, env, camera, cfg = _setup()
    img = np.asarray(render_image(scene, lights, env, camera, cfg))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    # the lit box interior must receive direct light
    assert img.max() > 0.01
    # a meaningful fraction of pixels lit
    assert (img.sum(-1) > 0).mean() > 0.3


def test_render_deterministic():
    scene, lights, env, camera, cfg = _setup()
    a = np.asarray(render_image(scene, lights, env, camera, cfg))
    b = np.asarray(render_image(scene, lights, env, camera, cfg))
    np.testing.assert_array_equal(a, b)


def test_color_bleeding_sides():
    """Red wall on the left, green on the right: indirect light on nearby
    pixels should be tinted accordingly (classic cornell sanity)."""
    scene, lights, env, camera, cfg = _setup(width=48, height=48, spp=4, bounces=3)
    img = np.asarray(render_image(scene, lights, env, camera, cfg))
    left = img[16:32, 2:8].mean(axis=(0, 1))
    right = img[16:32, 40:46].mean(axis=(0, 1))
    assert left[0] > left[1]  # red dominates near red wall
    assert right[1] > right[0]  # green dominates near green wall


def test_env_only_escape():
    """With no direct lights' contribution... env must light escaping rays."""
    meshes, lights = cornell_box()
    scene = device_scene_from_meshes(meshes)
    env = EnvironmentMap.constant((1.0, 2.0, 3.0))
    # camera behind the box looking away -> all rays miss geometry
    camera = Camera.look_at([0.5, 0.5, 5.0], [0.5, 0.5, 10.0], [0, 1, 0], 40.0, 16, 16)
    cfg = RenderConfig(width=16, height=16, spp=1, bounces=1)
    img = np.asarray(render_image(scene, lights, env, camera, cfg))
    np.testing.assert_allclose(img, np.broadcast_to([1.0, 2.0, 3.0], img.shape), rtol=1e-5)


def test_more_bounces_more_energy():
    scene, lights, env, camera, cfg = _setup(bounces=1, spp=2)
    img1 = np.asarray(render_image(scene, lights, env, camera, cfg)).sum()
    cfg3 = RenderConfig(width=32, height=32, spp=2, bounces=3)
    img3 = np.asarray(render_image(scene, lights, env, camera, cfg3)).sum()
    # indirect bounces add energy (never remove it)
    assert img3 > img1 * 1.01


def test_exr_roundtrip(tmp_path):
    from pg2024_dprt_tpu.utils import read_exr, write_exr

    rng = np.random.RandomState(0)
    img = rng.rand(17, 23, 3).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    back, names = read_exr(p)
    assert names == ["B", "G", "R"]
    # read returns channels in file (alphabetical) order
    np.testing.assert_allclose(back[:, :, [2, 1, 0]], img, atol=0)


def test_exr_zip_half_roundtrip(tmp_path):
    """ZIP/ZIPS + half interop (VERDICT r3 #9): the formats OpenCV writes
    reference datasets in (trainingcode/datasets.py:14-36)."""
    from pg2024_dprt_tpu.utils import read_exr, write_exr

    rng = np.random.RandomState(1)
    # h=37 deliberately NOT a multiple of the ZIP 16-line chunk
    img = (rng.rand(37, 23, 3) * 4.0).astype(np.float32)
    for comp in ("zip", "zips", "none"):
        for ptype in ("half", "float"):
            p = str(tmp_path / f"t_{comp}_{ptype}.exr")
            write_exr(p, img, compression=comp, pixel_type=ptype)
            back, names = read_exr(p)
            assert names == ["B", "G", "R"]
            tol = 0 if ptype == "float" else 2e-3
            np.testing.assert_allclose(
                back[:, :, [2, 1, 0]], img, atol=tol,
                rtol=tol, err_msg=f"{comp}/{ptype}")
    # single-channel dataset-style file (the trainingcode EXR pairs)
    mono = (rng.rand(33, 60) * 2.0).astype(np.float32)
    p = str(tmp_path / "mono.exr")
    write_exr(p, mono, compression="zip", pixel_type="half")
    back, names = read_exr(p)
    assert names == ["Y"]
    np.testing.assert_allclose(back[:, :, 0], mono, atol=2e-3, rtol=2e-3)


def test_golden_cornell():
    """Regression lock: deterministic TEA-seeded cornell render must match
    the committed golden EXR (CPU; fp tolerance for compiler drift)."""
    import os
    from pg2024_dprt_tpu.utils import read_exr

    scene, lights, env, camera, cfg = _setup(width=32, height=32, spp=2, bounces=3,
                                             env_color=(0.2, 0.3, 0.4))
    img = np.asarray(render_image(scene, lights, env, camera, cfg))
    golden_path = os.path.join(os.path.dirname(__file__), "golden",
                               "cornell_32x32_spp2_b3.exr")
    golden, names = read_exr(golden_path)
    order = [names.index(c) for c in ("R", "G", "B")]
    golden = golden[:, :, order]
    np.testing.assert_allclose(img, golden, rtol=1e-3, atol=1e-4)


def test_water_bsdf_render():
    """Dielectric (water) box renders finite, energy-sane images and differs
    from the diffuse version (exercises reflect/refract + delta handling)."""
    meshes_w, lights = cornell_box(with_water_sphere=True)
    meshes_d, _ = cornell_box(with_water_sphere=False)
    env = EnvironmentMap.constant((0.1, 0.1, 0.2))
    camera = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0], 40.0, 32, 32)
    cfg = RenderConfig(width=32, height=32, spp=2, bounces=3)
    img_w = np.asarray(render_image(device_scene_from_meshes(meshes_w), lights, env, camera, cfg))
    img_d = np.asarray(render_image(device_scene_from_meshes(meshes_d), lights, env, camera, cfg))
    assert np.isfinite(img_w).all() and (img_w >= 0).all()
    assert np.abs(img_w - img_d).max() > 0.01  # water changes the image


def test_config_json_roundtrip():
    cfg = RenderConfig(width=64, height=32, spp=3, bounces=5, use_neural_proxies=True,
                       tracer="resident", bucket_fraction=0.5)
    back = RenderConfig.from_json(cfg.to_json())
    assert back == cfg


def test_retired_tracer_rejected():
    """The round-1 streaming tracer failed on-chip verification and must not
    be silently selectable (VERDICT r2 item 5)."""
    import pytest
    from pg2024_dprt_tpu.ops.trace_api import resolve_tracer

    with pytest.raises(ValueError, match="retired"):
        resolve_tracer("pallas")


def test_env_rotation_offset():
    """Azimuth rotation shifts the env lookup (reference rotationOffset,
    /root/reference/src/cuda/environment_light.cu:11)."""
    img = np.zeros((4, 8, 3), np.float32)
    img[:, 0] = [1, 0, 0]
    e0 = EnvironmentMap.from_image(img, rotation_offset=0.0)
    e180 = EnvironmentMap.from_image(img, rotation_offset=np.pi)
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    r0 = np.asarray(e0.sample(d))[0]
    r180 = np.asarray(e180.sample(d))[0]
    assert not np.allclose(r0, r180)


def test_frame_sequence_with_animation(tmp_path):
    """Frame loop + light/camera animation (LIGHT_MOVE/CAMERA_MOVE parity)."""
    from pg2024_dprt_tpu.render.frames import render_frames

    scene, lights, env, camera, cfg = _setup(width=16, height=16, spp=1, bounces=1)
    imgs = render_frames(
        scene, lights, env, camera, cfg, num_frames=2, out_dir=str(tmp_path),
        light_velocity=(0.05, 0.0, 0.0), camera_velocity=(0.02, 0.0, 0.0),
    )
    assert len(imgs) == 2
    assert (tmp_path / "frame0.exr").exists() and (tmp_path / "frame1.exr").exists()
    # motion changes the image
    assert np.abs(imgs[0] - imgs[1]).max() > 1e-5


def test_scoped_vmem_fallback_plumbing(monkeypatch):
    """The self-healing scoped-VMEM fallback (render/engine.py::render_sample):
    on a Mosaic 'Scoped allocation' compile failure the sample program is
    re-lowered ONCE with xla_tpu_scoped_vmem_limit_kib raised, cached per
    (scene shape, cfg) signature, and reused on later calls.  The chip
    failure itself can't reproduce on CPU, so this pins the retry/cache
    plumbing with a stubbed jit."""
    from pg2024_dprt_tpu.render import engine

    scene, lights, env, camera, cfg = _setup()
    calls = {"ran": 0, "lowered": 0, "opts": None, "jit": 0}

    class FakeCompiled:
        def __call__(self, *a):
            calls["ran"] += 1
            return "IMG"

    class FakeLowered:
        def compile(self, compiler_options=None):
            calls["opts"] = compiler_options
            return FakeCompiled()

    class FakeJit:
        def __call__(self, *a, **k):
            calls["jit"] += 1
            raise RuntimeError("Mosaic: Scoped allocation overflow")

        def lower(self, *a, **k):
            calls["lowered"] += 1
            return FakeLowered()

    monkeypatch.setattr(engine, "_render_sample_jit", FakeJit())
    engine._SCOPED_FALLBACK.clear()
    try:
        out = engine.render_sample(scene, lights, env, camera, 0, cfg)
        assert out == "IMG"
        assert calls["opts"] == {"xla_tpu_scoped_vmem_limit_kib": 24576}
        # second call rides the cached Compiled: no re-lower, no jit retry
        out2 = engine.render_sample(scene, lights, env, camera, 1, cfg)
        assert out2 == "IMG"
        assert calls["lowered"] == 1 and calls["ran"] == 2

        # a DIFFERENT failure must re-raise untouched (no silent fallback)
        class FakeJitOther:
            def __call__(self, *a, **k):
                raise RuntimeError("some unrelated compile failure")

        monkeypatch.setattr(engine, "_render_sample_jit", FakeJitOther())
        engine._SCOPED_FALLBACK.clear()
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="unrelated"):
            engine.render_sample(scene, lights, env, camera, 0, cfg)
    finally:
        engine._SCOPED_FALLBACK.clear()
