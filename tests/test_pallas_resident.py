"""Resident-table Pallas tracer vs brute-force oracle (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.ops.traversal import intersect_brute_force
from pg2024_dprt_tpu.scene import cornell_box, device_scene_from_meshes, random_tri_soup


def _check(scene, o, d, tmax, act, **kw):
    got, dropped = trace_resident(scene, o, d, 1e-3, tmax, act, **kw)
    assert int(dropped) == 0
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)
    np.testing.assert_array_equal(np.asarray(got.is_hit), np.asarray(want.is_hit))
    hit = np.asarray(want.is_hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4, atol=1e-5
    )
    # winner may differ from the oracle only on exact-t ties (e.g. a ray
    # landing on the shared edge of two coplanar triangles — either is a
    # legitimate closest hit)
    mismatch = hit & (np.asarray(got.tri_index) != np.asarray(want.tri_index))
    dt = np.abs(np.asarray(got.t) - np.asarray(want.t))
    tol = 1e-5 * np.maximum(1.0, np.abs(np.asarray(want.t)))
    assert (dt[mismatch] <= tol[mismatch]).all()


def test_resident_tracer_soup():
    scene = device_scene_from_meshes([random_tri_soup(700, seed=20)], tris_per_cluster=64)
    n = 2048
    rng = np.random.RandomState(21)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    _check(scene, o, d, jnp.full((n,), 1e30, jnp.float32), jnp.ones((n,), bool),
           tile_rays=128)


def test_resident_tracer_cornell_camera():
    meshes, _ = cornell_box()
    scene = device_scene_from_meshes(meshes, tris_per_cluster=16)
    from pg2024_dprt_tpu.core import Camera

    cam = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0], 40.0, 32, 32)
    pix = jnp.arange(1024, dtype=jnp.int32)
    o, d = cam.generate_rays(pix // 32, pix % 32, jnp.zeros(1024), jnp.zeros(1024))
    _check(scene, o, d, jnp.full((1024,), 1e30, jnp.float32), jnp.ones((1024,), bool),
           tile_rays=128)


def test_resident_tracer_respects_active_and_tmax():
    scene = device_scene_from_meshes([random_tri_soup(300, seed=22)], tris_per_cluster=64)
    n = 512
    rng = np.random.RandomState(23)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    act = jnp.asarray(rng.rand(n) > 0.5)
    got, _ = trace_resident(scene, o, d, 1e-3, jnp.full((n,), 1e30, jnp.float32), act,
                            tile_rays=128)
    assert not np.asarray(got.is_hit)[~np.asarray(act)].any()
    want = intersect_brute_force(scene, o, d, 1e-3, jnp.full((n,), 1e30), act)
    np.testing.assert_array_equal(np.asarray(got.is_hit), np.asarray(want.is_hit))


def test_resident_tracer_finite_tmax():
    """Finite per-ray t_max must clip hits exactly like the oracle."""
    scene = device_scene_from_meshes([random_tri_soup(500, seed=40)], tris_per_cluster=32)
    n = 1024
    rng = np.random.RandomState(41)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.asarray(rng.rand(n).astype(np.float32) * 0.8 + 0.05)
    _check(scene, o, d, tmax, jnp.ones((n,), bool), tile_rays=128)


def test_resident_dense_candidates_never_drop():
    """Heavily overlapping small clusters (every tile sees many candidates)
    must still match the oracle exactly — the in-kernel dispatch has no
    static pair budget, so nothing can be dropped."""
    scene = device_scene_from_meshes([random_tri_soup(700, seed=30)], tris_per_cluster=16)
    n = 512
    rng = np.random.RandomState(31)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.full((n,), 1e30, jnp.float32)
    act = jnp.ones((n,), bool)
    _check(scene, o, d, tmax, act)


def test_resident_any_hit_occlusion():
    scene = device_scene_from_meshes([random_tri_soup(500, seed=24)], tris_per_cluster=64)
    n = 1024
    rng = np.random.RandomState(25)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.full((n,), 1e30, jnp.float32)
    act = jnp.asarray(rng.rand(n) > 0.3)

    occ, dropped = trace_resident(scene, o, d, 1e-3, tmax, act,
                                  tile_rays=128, any_hit=True)
    assert int(dropped) == 0
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(want.is_hit))


def test_resident_hbm_table_matches_oracle():
    """The HBM-streaming variant (double-buffered in-kernel DMA) must match
    the oracle exactly like the VMEM-resident one."""
    scene = device_scene_from_meshes([random_tri_soup(900, seed=50)], tris_per_cluster=64)
    n = 1024
    rng = np.random.RandomState(51)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    _check(scene, o, d, jnp.full((n,), 1e30, jnp.float32), jnp.ones((n,), bool),
           tile_rays=128, hbm_table=True)


def test_resident_hbm_any_hit():
    scene = device_scene_from_meshes([random_tri_soup(500, seed=24)], tris_per_cluster=64)
    n = 1024
    rng = np.random.RandomState(25)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.full((n,), 1e30, jnp.float32)
    act = jnp.asarray(rng.rand(n) > 0.3)
    occ, dropped = trace_resident(scene, o, d, 1e-3, tmax, act,
                                  tile_rays=128, any_hit=True, hbm_table=True)
    assert int(dropped) == 0
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(want.is_hit))


def test_resident_sorted_recull_soup():
    """sort_rays=True enables the exact per-ray cull AND the per-ray-horizon
    re-cull rounds (_recull_loop) — the production bounce-wavefront path."""
    scene = device_scene_from_meshes([random_tri_soup(700, seed=20)], tris_per_cluster=64)
    n = 2048
    rng = np.random.RandomState(21)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    _check(scene, o, d, jnp.full((n,), 1e30, jnp.float32), jnp.ones((n,), bool),
           tile_rays=128, sort_rays=True)


def test_resident_sorted_recull_hbm_finite_tmax():
    """Re-cull rounds through the HBM-streaming DMA pipeline, with per-ray
    finite t_max and inactive rays."""
    scene = device_scene_from_meshes([random_tri_soup(900, seed=50)], tris_per_cluster=64)
    n = 1024
    rng = np.random.RandomState(51)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.asarray(rng.rand(n).astype(np.float32) * 1.2 + 0.05)
    act = jnp.asarray(rng.rand(n) > 0.2)
    got, dropped = trace_resident(scene, o, d, 1e-3, tmax, act,
                                  tile_rays=128, sort_rays=True, hbm_table=True)
    assert int(dropped) == 0
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)
    np.testing.assert_array_equal(np.asarray(got.is_hit), np.asarray(want.is_hit))
    hit = np.asarray(want.is_hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4, atol=1e-5)


def test_resident_recull_small_rounds():
    """recull=1 (re-cull after every visit) and recull=3 (odd, not a divisor
    of typical visit counts) must both match the oracle — exercises the
    round-boundary/drain logic."""
    scene = device_scene_from_meshes([random_tri_soup(700, seed=30)], tris_per_cluster=16)
    n = 512
    rng = np.random.RandomState(31)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    for r in (1, 3):
        _check(scene, o, d, jnp.full((n,), 1e30, jnp.float32),
               jnp.ones((n,), bool), tile_rays=128, sort_rays=True, recull=r)


def test_resident_any_hit_recull():
    """Any-hit RE-CULL rounds (_occl_recull_loop: occluded rays' enter rows
    masked out between rounds) must match the oracle bit-for-bit — incl.
    finite per-ray tmax, inactive rays, odd round lengths, and the
    HBM-streaming DMA variant."""
    scene = device_scene_from_meshes([random_tri_soup(700, seed=24)], tris_per_cluster=64)
    n = 1024
    rng = np.random.RandomState(26)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.asarray(rng.rand(n).astype(np.float32) * 1.5 + 0.05)
    act = jnp.asarray(rng.rand(n) > 0.2)
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)
    for hbm in (False, True):
        for r in (1, 3, 8):
            occ, dropped = trace_resident(
                scene, o, d, 1e-3, tmax, act, tile_rays=128, any_hit=True,
                sort_rays=True, exact_cull=True, recull=r, hbm_table=hbm)
            assert int(dropped) == 0
            np.testing.assert_array_equal(np.asarray(occ), np.asarray(want.is_hit))


def test_resident_hbm_unaligned_cluster_width():
    """tris_per_cluster not 128-aligned: the HBM kernel pads table lanes
    (Mosaic DMA alignment) and the epilogue remaps winner slots."""
    meshes, _ = cornell_box()
    scene = device_scene_from_meshes(meshes, tris_per_cluster=16)
    n = 512
    rng = np.random.RandomState(60)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    _check(scene, o, d, jnp.full((n,), 1e30, jnp.float32), jnp.ones((n,), bool),
           tile_rays=128, hbm_table=True)


def test_resident_grouped_matches_oracle():
    """Two-level grouped dispatch (grouped=True forces the path the auto
    policy reserves for giant K) vs the brute-force oracle, closest hit."""
    scene = device_scene_from_meshes([random_tri_soup(900, seed=31)],
                                     tris_per_cluster=64)
    n = 1024
    rng = np.random.RandomState(32)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    _check(scene, o, d, jnp.full((n,), 1e30, jnp.float32),
           jnp.ones((n,), bool), tile_rays=128, grouped=True)
    # sorted + grouped
    _check(scene, o, d, jnp.full((n,), 1e30, jnp.float32),
           jnp.ones((n,), bool), tile_rays=128, grouped=True, sort_rays=True)


def test_resident_grouped_hbm_matches_oracle():
    scene = device_scene_from_meshes([random_tri_soup(900, seed=33)],
                                     tris_per_cluster=64)
    n = 512
    rng = np.random.RandomState(34)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    _check(scene, o, d, jnp.full((n,), 1e30, jnp.float32),
           jnp.ones((n,), bool), tile_rays=128, grouped=True, hbm_table=True)


def test_resident_grouped_any_hit():
    scene = device_scene_from_meshes([random_tri_soup(900, seed=35)],
                                     tris_per_cluster=64)
    n = 1024
    rng = np.random.RandomState(36)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.full((n,), 0.6, jnp.float32)
    act = jnp.ones((n,), bool)
    got, dropped = trace_resident(scene, o, d, 1e-3, tmax, act,
                                  tile_rays=128, any_hit=True, grouped=True)
    assert int(dropped) == 0
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want.is_hit))
    # and the HBM grouped any-hit
    got2, _ = trace_resident(scene, o, d, 1e-3, tmax, act, tile_rays=128,
                             any_hit=True, grouped=True, hbm_table=True)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want.is_hit))


def test_resident_tiny_kernel_matches_general():
    """Tiny-scene straight-line kernels (k <= TINY_K: every cluster visited
    unconditionally, no cull/selection machinery) must match both the oracle
    and the general kernel bit-for-bit.  hbm_table=True forces the general
    kernel on the same scene (the tiny gate requires a VMEM-resident table)."""
    from pg2024_dprt_tpu.ops.pallas_resident import TINY_K

    scene = device_scene_from_meshes([random_tri_soup(200, seed=70)],
                                     tris_per_cluster=64)
    assert scene.num_clusters <= TINY_K  # else this test stops covering the gate
    # small scenes now prefer the TRANSPOSED kernel; drop its table so this
    # test keeps covering the straight-line (TM, C) kernels (the production
    # path for K <= TINY_K scenes above the TINY_T_ROWS triangle cap)
    scene = scene._replace(cl_mt_table_t=None)
    n = 1024
    rng = np.random.RandomState(71)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.asarray(rng.rand(n).astype(np.float32) * 1.2 + 0.05)
    act = jnp.asarray(rng.rand(n) > 0.2)

    # closest hit: oracle + bit-identical to the general kernel
    _check(scene, o, d, tmax, act)
    got, _ = trace_resident(scene, o, d, 1e-3, tmax, act)
    gen, _ = trace_resident(scene, o, d, 1e-3, tmax, act, hbm_table=True)
    np.testing.assert_array_equal(np.asarray(got.is_hit), np.asarray(gen.is_hit))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(gen.t))
    np.testing.assert_array_equal(np.asarray(got.tri_index),
                                  np.asarray(gen.tri_index))

    # classic (rich=False) epilogue through the tiny kernel
    got2, _ = trace_resident(scene, o, d, 1e-3, tmax, act, rich=False)
    np.testing.assert_array_equal(np.asarray(got2.is_hit), np.asarray(gen.is_hit))
    np.testing.assert_array_equal(np.asarray(got2.tri_index),
                                  np.asarray(gen.tri_index))

    # any-hit tiny kernel
    occ, dropped = trace_resident(scene, o, d, 1e-3, tmax, act, any_hit=True)
    assert int(dropped) == 0
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(want.is_hit))


def test_resident_transposed_single_cluster():
    """Single-cluster scenes take the TRANSPOSED row-major kernel
    (_kernel_tiny_t: triangles in sublanes at their real 8-padded count,
    rays in lanes, loop-free one-hot MXU refinement).  It must match the
    oracle AND pick winners bit-identically to the straight-line kernel it
    replaces (forced via cl_mt_table_t=None) — rich, classic, and any-hit,
    with finite per-ray tmax and inactive rays."""
    scene = device_scene_from_meshes([random_tri_soup(100, seed=80)],
                                     tris_per_cluster=128)
    assert scene.num_clusters == 1 and scene.cl_mt_table_t is not None
    assert scene.cl_mt_table_t.shape == (104, 16)  # 100 tris, 8-padded
    straight = scene._replace(cl_mt_table_t=None)
    n = 1024
    rng = np.random.RandomState(81)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.asarray(rng.rand(n).astype(np.float32) * 1.2 + 0.05)
    act = jnp.asarray(rng.rand(n) > 0.2)

    _check(scene, o, d, tmax, act)
    for rich in (True, False):
        got, dropped = trace_resident(scene, o, d, 1e-3, tmax, act, rich=rich)
        assert int(dropped) == 0
        ref, _ = trace_resident(straight, o, d, 1e-3, tmax, act, rich=rich)
        np.testing.assert_array_equal(np.asarray(got.is_hit), np.asarray(ref.is_hit))
        np.testing.assert_array_equal(np.asarray(got.tri_index),
                                      np.asarray(ref.tri_index))
        if rich:  # both refine the winner exactly -> bit-equal t/u/v
            np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
            np.testing.assert_array_equal(np.asarray(got.u), np.asarray(ref.u))
            np.testing.assert_array_equal(np.asarray(got.v), np.asarray(ref.v))

    occ, dropped = trace_resident(scene, o, d, 1e-3, tmax, act, any_hit=True)
    assert int(dropped) == 0
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(want.is_hit))


def test_resident_transposed_multi_cluster():
    """The transposed table concatenates valid triangles across ALL
    clusters (cluster-major, padding lanes dropped) — a multi-cluster small
    scene must match the oracle and the selection kernel, and sort_rays
    must be a transparent no-op on this path (no cull to help)."""
    scene = device_scene_from_meshes([random_tri_soup(200, seed=70)],
                                     tris_per_cluster=64)
    assert scene.num_clusters > 1 and scene.cl_mt_table_t is not None
    assert scene.cl_mt_table_t.shape == (200, 16)
    n = 1024
    rng = np.random.RandomState(72)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.asarray(rng.rand(n).astype(np.float32) * 1.2 + 0.05)
    act = jnp.asarray(rng.rand(n) > 0.2)
    _check(scene, o, d, tmax, act)
    got, _ = trace_resident(scene, o, d, 1e-3, tmax, act)
    srt, _ = trace_resident(scene, o, d, 1e-3, tmax, act, sort_rays=True)
    np.testing.assert_array_equal(np.asarray(got.tri_index),
                                  np.asarray(srt.tri_index))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(srt.t))
    occ, _ = trace_resident(scene, o, d, 1e-3, tmax, act, any_hit=True)
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(want.is_hit))


def test_resident_transposed_unaligned_width():
    """Cluster width not 8-aligned: the pack-time transposed table pads
    beyond the lane count (geometry.py) and the kernel still matches."""
    scene = device_scene_from_meshes([random_tri_soup(36, seed=82)],
                                     tris_per_cluster=36)
    assert scene.num_clusters == 1
    assert scene.cl_mt_table_t is not None
    assert scene.cl_mt_table_t.shape[0] % 8 == 0
    n = 512
    rng = np.random.RandomState(83)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    _check(scene, o, d, jnp.full((n,), 1e30, jnp.float32), jnp.ones((n,), bool))


def test_resident_grouped_interval_matches_oracle():
    """Interval group keys + exact per-ray member gate (grouped=True,
    exact_cull=False) vs the oracle — the camera-wavefront fast path."""
    scene = device_scene_from_meshes([random_tri_soup(900, seed=41)],
                                     tris_per_cluster=64)
    n = 1024
    rng = np.random.RandomState(42)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    _check(scene, o, d, jnp.full((n,), 1e30, jnp.float32),
           jnp.ones((n,), bool), tile_rays=128, grouped=True,
           exact_cull=False)
    _check(scene, o, d, jnp.full((n,), 1e30, jnp.float32),
           jnp.ones((n,), bool), tile_rays=128, grouped=True,
           exact_cull=False, hbm_table=True)


def test_resident_ssub_variants():
    """In-kernel sub-block retiling (_recull_loop ssub): every sub-block
    width must agree exactly with the oracle — including finite per-ray
    t_max and inactive rays — and with the ssub=1 winners."""
    scene = device_scene_from_meshes([random_tri_soup(900, seed=31)],
                                     tris_per_cluster=64)
    n = 1024
    rng = np.random.RandomState(33)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.asarray(
        np.where(rng.rand(n) < 0.25, 0.4, 1e30).astype(np.float32))
    act = jnp.asarray(rng.rand(n) > 0.2)
    for ssub in (2, 4, 8, 16):
        _check(scene, o, d, tmax, act, tile_rays=128, sort_rays=True,
               ssub=ssub)
    # HBM streaming path with sub-blocks (per-sub DMA chains)
    _check(scene, o, d, tmax, act, tile_rays=128, sort_rays=True,
           ssub=4, hbm_table=True)
