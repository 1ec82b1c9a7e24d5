"""Cluster tracer vs brute-force oracle + cluster decomposition invariants."""
import numpy as np
import jax.numpy as jnp

from pg2024_dprt_tpu.ops.cluster_tracer import occlusion_clusters, traverse_clusters
from pg2024_dprt_tpu.ops.traversal import intersect_brute_force
from pg2024_dprt_tpu.scene import (
    build_bvh,
    cornell_box,
    device_scene_from_meshes,
    random_tri_soup,
)
from pg2024_dprt_tpu.scene.clusters import build_clusters


def test_cluster_decomposition_invariants():
    mesh = random_tri_soup(1000, seed=9)
    bvh = build_bvh(mesh.v0, mesh.v1, mesh.v2)
    ct = build_clusters(bvh, max_tris=64)
    k = ct.aabb_min.shape[0]
    assert (ct.count <= 64).all()
    # every triangle appears exactly once in the map
    valid = ct.tri_map[ct.tri_map >= 0]
    assert sorted(valid.tolist()) == list(range(1000))
    # cluster AABBs contain their triangles
    order = bvh.tri_order
    for j in range(k):
        sl = ct.tri_map[j * 64 : j * 64 + ct.count[j]]
        tris = order[sl]  # tri_map is BVH-order; map to input ids
        pts = np.concatenate([mesh.v0[tris], mesh.v1[tris], mesh.v2[tris]])
        assert (pts >= ct.aabb_min[j] - 1e-4).all()
        assert (pts <= ct.aabb_max[j] + 1e-4).all()


def _rand_rays(n, seed, lo=-0.2, hi=1.2):
    rng = np.random.RandomState(seed)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * (hi - lo) + lo)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    return o, d


def test_cluster_tracer_matches_oracle_soup():
    scene = device_scene_from_meshes([random_tri_soup(700, seed=10)], tris_per_cluster=64)
    n = 2048
    o, d = _rand_rays(n, 11)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    act = jnp.ones((n,), bool)

    got = traverse_clusters(scene, o, d, 1e-3, tmax, act, chunk=512)
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)

    np.testing.assert_array_equal(np.asarray(got.is_hit), np.asarray(want.is_hit))
    hit = np.asarray(want.is_hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4, atol=1e-5
    )
    assert (np.asarray(got.tri_index)[hit] == np.asarray(want.tri_index)[hit]).mean() > 0.99


def test_cluster_tracer_matches_oracle_cornell():
    meshes, _ = cornell_box()
    scene = device_scene_from_meshes(meshes, tris_per_cluster=16)
    n = 1024
    rng = np.random.RandomState(12)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 0.8 + 0.1)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.full((n,), 1e30, jnp.float32)
    act = jnp.ones((n,), bool)

    got = traverse_clusters(scene, o, d, 1e-3, tmax, act, chunk=256)
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)
    np.testing.assert_array_equal(np.asarray(got.is_hit), np.asarray(want.is_hit))
    hit = np.asarray(want.is_hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4, atol=1e-5
    )


def test_cluster_tracer_skewed_rays():
    """All rays converge on one cluster — the dispatch must spill into many
    blocks of that cluster, not drop pairs."""
    scene = device_scene_from_meshes([random_tri_soup(300, seed=13)], tris_per_cluster=64)
    n = 4096
    rng = np.random.RandomState(14)
    # all rays aimed at the scene centroid from one side
    o = jnp.asarray(
        np.stack([np.full(n, -1.0), rng.rand(n), rng.rand(n)], -1).astype(np.float32)
    )
    target = jnp.asarray([0.5, 0.5, 0.5]) + jnp.asarray(
        rng.randn(n, 3).astype(np.float32) * 0.02
    )
    d = target - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    act = jnp.ones((n,), bool)

    got = traverse_clusters(scene, o, d, 1e-3, tmax, act, chunk=4096)
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)
    np.testing.assert_array_equal(np.asarray(got.is_hit), np.asarray(want.is_hit))
    hit = np.asarray(want.is_hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4, atol=1e-5
    )


def test_occlusion_matches_closest_hit():
    scene = device_scene_from_meshes([random_tri_soup(500, seed=15)], tris_per_cluster=64)
    n = 2048
    o, d = _rand_rays(n, 16)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    act = jnp.asarray(np.random.RandomState(17).rand(n) > 0.3)

    occ = occlusion_clusters(scene, o, d, 1e-3, tmax, act, chunk=512)
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(want.is_hit))
