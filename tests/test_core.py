"""Core-layer unit tests: RNG bit-exactness, math oracles, camera."""
import numpy as np
import jax.numpy as jnp

from pg2024_dprt_tpu.core import (
    tea,
    rnd,
    Camera,
    normalize,
    cartesian_to_spherical,
    make_frame,
    to_world,
    to_local,
    uniform_hemisphere,
    uniform_sample_triangle,
    dielectric_reflectance,
    refract_z,
)


def _tea_ref(val0, val1, rounds=4):
    """Pure-python uint32 TEA (transcribed semantics of the reference hash,
    /root/reference/optix/random.hpp:31-46)."""
    mask = 0xFFFFFFFF
    v0, v1, s0 = val0 & mask, val1 & mask, 0
    for _ in range(rounds):
        s0 = (s0 + 0x9E3779B9) & mask
        v0 = (v0 + ((((v1 << 4) & mask) + 0xA341316C) ^ ((v1 + s0) & mask) ^ ((v1 >> 5) + 0xC8013EA4))) & mask
        v1 = (v1 + ((((v0 << 4) & mask) + 0xAD90777D) ^ ((v0 + s0) & mask) ^ ((v0 >> 5) + 0x7E95761E))) & mask
    return v0


def _lcg_ref(prev):
    prev = (1664525 * prev + 1013904223) & 0xFFFFFFFF
    return prev, prev & 0x00FFFFFF


def test_tea_bit_exact():
    pix = np.array([0, 1, 17, 123456, 2**31 - 1], np.uint32)
    smp = np.array([0, 3, 5, 7, 11], np.uint32)
    got = np.asarray(tea(pix, smp))
    want = np.array([_tea_ref(int(a), int(b)) for a, b in zip(pix, smp)], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_rnd_bit_exact_sequence():
    seed0 = np.asarray(tea(np.uint32(42), np.uint32(7)))
    s = jnp.asarray(seed0)
    ref = int(seed0)
    for _ in range(5):
        s, x = rnd(s)
        ref, bits = _lcg_ref(ref)
        assert abs(float(x) - bits / float(0x01000000)) < 1e-7
        assert int(np.asarray(s)) == ref
        assert 0.0 <= float(x) < 1.0


def test_frame_roundtrip():
    rng = np.random.RandomState(0)
    n = np.asarray(normalize(jnp.asarray(rng.randn(64, 3), jnp.float32)))
    w = np.asarray(normalize(jnp.asarray(rng.randn(64, 3), jnp.float32)))
    local = to_local(jnp.asarray(n), jnp.asarray(w))
    back = to_world(jnp.asarray(n), local)
    np.testing.assert_allclose(np.asarray(back), w, atol=1e-5)
    # z-component of local == dot(n, w)
    np.testing.assert_allclose(np.asarray(local)[:, 2], np.sum(n * w, -1), atol=1e-5)


def test_uniform_hemisphere_upper():
    rng = np.random.RandomState(1)
    xi = rng.rand(2, 1000).astype(np.float32)
    d = np.asarray(uniform_hemisphere(jnp.asarray(xi[0]), jnp.asarray(xi[1])))
    assert np.all(d[:, 2] >= 0.0)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_spherical_ranges():
    rng = np.random.RandomState(2)
    d = np.asarray(normalize(jnp.asarray(rng.randn(500, 3), jnp.float32)))
    phi, theta = cartesian_to_spherical(jnp.asarray(d))
    phi, theta = np.asarray(phi), np.asarray(theta)
    assert phi.min() >= 0.0 and phi.max() < 2 * np.pi + 1e-5
    assert theta.min() >= 0.0 and theta.max() <= np.pi + 1e-5
    # y-up convention
    up = cartesian_to_spherical(jnp.asarray([[0.0, 1.0, 0.0]]))
    assert abs(float(up[1][0])) < 1e-6


def test_triangle_sampling_pdf():
    p0 = jnp.asarray([[0.0, 0.0, 0.0]])
    p1 = jnp.asarray([[2.0, 0.0, 0.0]])
    p2 = jnp.asarray([[0.0, 2.0, 0.0]])
    pt, n, pdf = uniform_sample_triangle(p0, p1, p2, jnp.asarray([0.5]), jnp.asarray([0.5]))
    assert abs(float(pdf[0]) - 1.0 / 2.0) < 1e-5  # area = 2
    np.testing.assert_allclose(np.abs(np.asarray(n)[0]), [0, 0, 1], atol=1e-6)


def test_fresnel_limits():
    # normal incidence air->water: ((1-1.33)/(1+1.33))^2 ~ 0.0201
    f0 = float(dielectric_reflectance(jnp.asarray([1.0]), 1.0, 1.33)[0])
    assert abs(f0 - ((1 - 1.33) / (1 + 1.33)) ** 2) < 1e-4
    # grazing -> 1
    fg = float(dielectric_reflectance(jnp.asarray([0.001]), 1.0, 1.33)[0])
    assert fg > 0.9
    # TIR water->air beyond critical angle
    cos_c = np.sqrt(1 - (1.0 / 1.33) ** 2) * 0.5
    ft = float(dielectric_reflectance(jnp.asarray([cos_c]), 1.33, 1.0)[0])
    assert ft == 1.0


def test_refract_snell():
    # 45 deg incidence air->water
    wo = jnp.asarray([[np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)]], dtype=jnp.float32)
    wi, tir = refract_z(wo, 1.0, 1.33)
    assert not bool(tir[0])
    sin_t = np.linalg.norm(np.asarray(wi)[0, :2])
    assert abs(sin_t - np.sin(np.pi / 4) / 1.33) < 1e-5
    assert float(wi[0, 2]) < 0  # transmitted to other side


def test_camera_center_ray():
    cam = Camera.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0], 45.0, 64, 64)
    rows = jnp.asarray([32], jnp.int32)
    cols = jnp.asarray([32], jnp.int32)
    o, d = cam.generate_rays(rows, cols, jnp.asarray([0.0]), jnp.asarray([0.0]))
    np.testing.assert_allclose(np.asarray(o)[0], [0, 0, 5], atol=1e-6)
    # center ray points at the target
    assert float(d[0, 2]) < -0.99
    # top-left pixel goes up-left
    o2, d2 = cam.generate_rays(
        jnp.asarray([0], jnp.int32), jnp.asarray([0], jnp.int32),
        jnp.asarray([0.5]), jnp.asarray([0.5]),
    )
    assert float(d2[0, 1]) > 0 and float(d2[0, 0]) < 0


def test_png_and_memory_utils(tmp_path):
    from pg2024_dprt_tpu.utils.png import tonemap, write_png
    from pg2024_dprt_tpu.utils.memory import buffer_bytes, memory_report
    from pg2024_dprt_tpu.core.types import PathState

    img = np.random.RandomState(0).rand(9, 7, 3).astype(np.float32) * 4
    p = str(tmp_path / "t.png")
    write_png(p, img)
    data = open(p, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and b"IEND" in data
    assert tonemap(img).dtype == np.uint8

    paths = PathState.empty(128)
    assert buffer_bytes(paths) > 128 * 40
    rep = memory_report(paths=paths)
    assert "paths" in rep and "total" in rep


def test_multigeo_mlp_variant():
    """MultiGeoNeuralVisNetwork analogue: 6-feature input (instance id),
    reference trainingcode/module.py:531-582."""
    import jax
    from pg2024_dprt_tpu.models.mlp import MLPConfig, apply_mlp, init_mlp

    cfg = MLPConfig(width=128, depth=2, in_features=6,
                    final_activation="sigmoid", multi_geo=True)
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(1).rand(32, 6).astype(np.float32))
    y = np.asarray(apply_mlp(params, x, cfg))
    assert y.shape == (32,)
    assert (y >= 0).all() and (y <= 1).all()  # sigmoid head
