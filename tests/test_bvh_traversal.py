"""BVH build invariants + traversal vs brute-force oracle (SURVEY.md §4a)."""
import numpy as np
import jax.numpy as jnp

from pg2024_dprt_tpu.scene import (
    build_bvh,
    cornell_box,
    device_scene_from_meshes,
    random_tri_soup,
)
from pg2024_dprt_tpu.ops import traverse_bvh, intersect_brute_force


def _soup_scene(n=300, seed=3):
    mesh = random_tri_soup(n, seed=seed)
    return device_scene_from_meshes([mesh])


def test_bvh_structure_invariants():
    mesh = random_tri_soup(500, seed=5)
    bvh = build_bvh(mesh.v0, mesh.v1, mesh.v2)
    m = bvh.num_nodes
    # permutation covers all triangles exactly once
    assert sorted(bvh.tri_order.tolist()) == list(range(500))
    covered = np.zeros(500, bool)
    for i in range(m):
        c = bvh.count[i]
        if c > 0:
            lo = bvh.first[i]
            assert not covered[lo : lo + c].any()
            covered[lo : lo + c] = True
        else:
            right = bvh.first[i]
            assert i + 1 < m and i + 1 < right <= m - 1 or right > i
        assert bvh.skip[i] == -1 or (i < bvh.skip[i] <= m - 1)
        # child bounds inside parent bounds (within epsilon)
        if bvh.count[i] == 0:
            for ch in (i + 1, int(bvh.first[i])):
                assert np.all(bvh.bounds_min[ch] >= bvh.bounds_min[i] - 1e-5)
                assert np.all(bvh.bounds_max[ch] <= bvh.bounds_max[i] + 1e-5)
    assert covered.all()


def test_traversal_matches_brute_force_soup():
    scene = _soup_scene(300)
    rng = np.random.RandomState(7)
    n = 512
    origin = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 2.0 - 0.5)
    direction = jnp.asarray(
        (rng.rand(n, 3).astype(np.float32) - 0.5), jnp.float32
    )
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    active = jnp.ones((n,), bool)

    got = traverse_bvh(scene, origin, direction, 1e-3, tmax, active)
    want = intersect_brute_force(scene, origin, direction, 1e-3, tmax, active)

    np.testing.assert_array_equal(np.asarray(got.is_hit), np.asarray(want.is_hit))
    hit = np.asarray(want.is_hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4, atol=1e-5
    )
    # same triangle except exact-tie cases
    same_tri = np.asarray(got.tri_index)[hit] == np.asarray(want.tri_index)[hit]
    assert same_tri.mean() > 0.99


def test_traversal_matches_brute_force_cornell():
    meshes, _ = cornell_box()
    scene = device_scene_from_meshes(meshes)
    rng = np.random.RandomState(11)
    n = 256
    origin = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 0.8 + 0.1)
    d = rng.randn(n, 3).astype(np.float32)
    direction = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.full((n,), 1e30, jnp.float32)
    active = jnp.ones((n,), bool)

    got = traverse_bvh(scene, origin, direction, 1e-3, tmax, active)
    want = intersect_brute_force(scene, origin, direction, 1e-3, tmax, active)
    # box is open at z=1, so only compare against the oracle (most rays hit)
    np.testing.assert_array_equal(np.asarray(got.is_hit), np.asarray(want.is_hit))
    assert np.asarray(want.is_hit).mean() > 0.5
    hit = np.asarray(want.is_hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4, atol=1e-5
    )


def test_traversal_respects_tmax_and_active():
    scene = _soup_scene(100)
    rng = np.random.RandomState(13)
    n = 64
    origin = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    d = rng.randn(n, 3).astype(np.float32)
    direction = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    active = jnp.asarray(rng.rand(n) > 0.5)

    got_full = traverse_bvh(scene, origin, direction, 1e-3, jnp.full((n,), 1e30), active)
    # inactive rays never hit
    assert not np.asarray(got_full.is_hit)[~np.asarray(active)].any()

    # shrinking tmax below the hit distance removes the hit
    t_hit = np.asarray(got_full.t)
    small = jnp.asarray(np.where(np.isfinite(t_hit) & (t_hit < 1e29), t_hit * 0.5, 1e30), jnp.float32)
    got_cut = traverse_bvh(scene, origin, direction, 1e-3, small, active)
    was_hit = np.asarray(got_full.is_hit)
    assert not np.asarray(got_cut.is_hit)[was_hit].any() or (
        np.asarray(got_cut.t)[was_hit] < t_hit[was_hit]
    ).all()


def test_empty_partition_never_hits():
    scene = device_scene_from_meshes([])
    n = 8
    origin = jnp.zeros((n, 3))
    direction = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    got = traverse_bvh(scene, origin, direction, 1e-3, jnp.full((n,), 1e30), jnp.ones((n,), bool))
    assert not np.asarray(got.is_hit).any()


def test_city_scene_shape_and_traversal():
    """city_scene (architectural stand-in): tri budget honored, BVH matches
    brute force on a mixed terrain+building wavefront."""
    from pg2024_dprt_tpu.scene import city_scene, device_scene_from_meshes

    mesh = city_scene(2048, seed=3)
    assert abs(mesh.num_triangles - 2048) <= 2048 * 0.05
    lo, hi = mesh.aabb()
    assert (np.asarray(hi) - np.asarray(lo)).max() <= 1.2

    scene = device_scene_from_meshes([mesh])
    rng = np.random.RandomState(11)
    n = 256
    origin = jnp.asarray(
        rng.rand(n, 3).astype(np.float32) * np.asarray([1.0, 0.4, 1.0], np.float32)
        + np.asarray([0.0, 0.05, 0.0], np.float32))
    direction = jnp.asarray(rng.rand(n, 3).astype(np.float32) - 0.5)
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    active = jnp.ones((n,), bool)

    got = traverse_bvh(scene, origin, direction, 1e-3, tmax, active)
    want = intersect_brute_force(scene, origin, direction, 1e-3, tmax, active)
    np.testing.assert_array_equal(np.asarray(got.is_hit), np.asarray(want.is_hit))
    hit = np.asarray(want.is_hit)
    assert hit.sum() > 50          # the scene actually intersects the rays
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4, atol=1e-5
    )
