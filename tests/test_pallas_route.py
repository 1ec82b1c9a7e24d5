"""Fused routing megakernel vs the composed per-stage secondary_route.

Both are compared end-to-end through secondary_route itself (the fused
dispatch is forced on, interpret mode on CPU).  vis/depth run in bf16 in
both paths but with different accumulation tiling, so rays whose routing
straddles a knife edge (vis ~ 0.5, pred_t ~ local_t) may legitimately
differ; the test uses models biased far from the thresholds and requires
exact agreement."""
import numpy as np
import jax
import jax.numpy as jnp

import pg2024_dprt_tpu.render.proxy_stages as ps
from pg2024_dprt_tpu.core.types import PathState
from pg2024_dprt_tpu.models.mlp import MLPConfig
from pg2024_dprt_tpu.models.proxy import random_proxy_models
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.geometry import ProxyTable
from pg2024_dprt_tpu.scene.lights import EnvironmentMap


def _setup(vis_bias, seed=0, n=768):
    scene = device_scene_from_meshes([random_tri_soup(900, seed=seed)],
                                     tris_per_cluster=64)
    offs = np.asarray(
        [[-1.05, 0, 0], [1.05, 0, 0], [0, -1.05, 0], [0, 1.05, 0],
         [0, 0, -1.05], [0, 0, 1.05], [-1.05, -1.05, 0], [1.05, 1.05, 0]],
        np.float32,
    )
    proxies = ProxyTable(
        aabb_min=jnp.asarray(offs), aabb_max=jnp.asarray(offs + 1.0),
        max_length=jnp.asarray(np.linalg.norm(np.ones((8, 3)), axis=1).astype(np.float32)),
    )
    cfg = MLPConfig(width=64, depth=2)
    models = random_proxy_models(jax.random.PRNGKey(seed + 1), 8, cfg, cfg)
    # push vis far from the 0.5 threshold so bf16 tiling differences
    # between the two backends cannot flip a routing decision
    import dataclasses

    models = dataclasses.replace(
        models,
        vis_params={k: (v + vis_bias if k == "head_b1" else v)
                    for k, v in models.vis_params.items()},
    )
    rng = np.random.RandomState(seed + 2)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    paths = PathState.empty(n)._replace(
        origin=o, direction=d,
        tmax=jnp.full((n,), 3.4e38, jnp.float32),
        throughput=jnp.ones((n, 3), jnp.float32),
        pixel_index=jnp.asarray(np.arange(n, dtype=np.int32)),
        is_valid=jnp.asarray(rng.rand(n) > 0.1),
    )
    env = EnvironmentMap.constant((0.4, 0.5, 0.7))
    return scene, proxies, models, paths, env


def _run_both(vis_bias, seed):
    scene, proxies, models, paths, env = _setup(vis_bias, seed)
    n = paths.capacity
    composed = ps.secondary_route(scene, proxies, models, env, paths,
                                  jnp.int32(8), 3, 1e-3, n)
    orig = ps._use_fused_route
    ps._use_fused_route = lambda *a: True
    try:
        fused = ps.secondary_route(scene, proxies, models, env, paths,
                                   jnp.int32(8), 3, 1e-3, n)
    finally:
        ps._use_fused_route = orig
    return composed, fused


def _compare(composed, fused):
    (cp, ce, cd), (fp, fe, fd) = composed, fused
    np.testing.assert_array_equal(np.asarray(cp.target_node), np.asarray(fp.target_node))
    np.testing.assert_array_equal(np.asarray(cp.current_node), np.asarray(fp.current_node))
    np.testing.assert_array_equal(np.asarray(cp.is_hit), np.asarray(fp.is_hit))
    np.testing.assert_array_equal(np.asarray(cp.is_valid), np.asarray(fp.is_valid))
    np.testing.assert_array_equal(np.asarray(cp.visited_mask), np.asarray(fp.visited_mask))
    np.testing.assert_allclose(np.asarray(cp.tmax), np.asarray(fp.tmax),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(fe), rtol=1e-5, atol=1e-6)


def test_fused_route_always_visible():
    _compare(*_run_both(vis_bias=10.0, seed=3))


def test_fused_route_never_visible():
    _compare(*_run_both(vis_bias=-10.0, seed=5))


def test_fused_route_hbm_unsorted_match_vmem_sorted():
    """The HBM-streaming trace path and the unsorted wrapper must agree
    with the VMEM-resident sorted default (per-ray decisions are order-
    and table-residency-independent)."""
    from pg2024_dprt_tpu.ops.pallas_route import route_fused

    scene, proxies, models, paths, env = _setup(vis_bias=10.0, seed=7, n=256)
    kw = dict(max_hits=3, eps=1e-3)
    base = route_fused(scene, proxies, models, paths.origin, paths.direction,
                       1e-3, paths.tmax, paths.is_valid, jnp.int32(8), **kw)
    for variant in (
        dict(hbm_table=True),
        dict(sort_rays=False),
        dict(hbm_table=True, sort_rays=False),
    ):
        got = route_fused(scene, proxies, models, paths.origin,
                          paths.direction, 1e-3, paths.tmax, paths.is_valid,
                          jnp.int32(8), **kw, **variant)
        for key in ("settled_node", "has_node", "env_miss", "no_route",
                    "local_hit"):
            np.testing.assert_array_equal(
                np.asarray(base[key]), np.asarray(got[key]), err_msg=str((key, variant)))
        np.testing.assert_allclose(np.asarray(base["new_t"]),
                                   np.asarray(got["new_t"]), rtol=1e-5, atol=1e-6)


def test_fused_route_nn_compact_bit_identical():
    """Valid-row NN chunking (nn_compact) must be BIT-identical to the
    dense all-rows form: the one-hot gather/scatter is exact at HIGHEST
    precision and matmul rows are independent, so every query's network
    output is unchanged — only zeroed rows stop paying FLOPs."""
    from pg2024_dprt_tpu.ops.pallas_route import route_fused

    # vis_bias=0: decisions sit wherever the nets put them; bit-identity
    # must hold even at knife edges
    scene, proxies, models, paths, env = _setup(vis_bias=0.0, seed=11, n=512)
    kw = dict(max_hits=3, eps=1e-3)
    dense = route_fused(scene, proxies, models, paths.origin, paths.direction,
                        1e-3, paths.tmax, paths.is_valid, jnp.int32(8),
                        nn_compact=False, **kw)
    chunked = route_fused(scene, proxies, models, paths.origin,
                          paths.direction, 1e-3, paths.tmax, paths.is_valid,
                          jnp.int32(8), nn_compact=True, **kw)
    for key in ("settled_node", "has_node", "env_miss", "no_route",
                "local_hit", "new_t"):
        np.testing.assert_array_equal(
            np.asarray(dense[key]), np.asarray(chunked[key]), err_msg=key)


def test_fused_route_nn_compact_odd_shapes():
    """Chunking must stay exact for non-128 tiles (tm = n when n < 128,
    so q = mh*n rides odd lane counts through the prefix sum) and for
    max_hits=1 (a single gated chunk)."""
    from pg2024_dprt_tpu.ops.pallas_route import route_fused

    for n, mh in ((96, 3), (512, 1)):
        scene, proxies, models, paths, env = _setup(vis_bias=0.0, seed=13,
                                                    n=n)
        kw = dict(max_hits=mh, eps=1e-3)
        dense = route_fused(scene, proxies, models, paths.origin,
                            paths.direction, 1e-3, paths.tmax,
                            paths.is_valid, jnp.int32(8),
                            nn_compact=False, **kw)
        chunked = route_fused(scene, proxies, models, paths.origin,
                              paths.direction, 1e-3, paths.tmax,
                              paths.is_valid, jnp.int32(8),
                              nn_compact=True, **kw)
        for key in ("settled_node", "has_node", "env_miss", "no_route",
                    "local_hit", "new_t"):
            np.testing.assert_array_equal(
                np.asarray(dense[key]), np.asarray(chunked[key]),
                err_msg=str((n, mh, key)))


def _shadow_setup(vis_bias, depth_bias, seed, n=768):
    import dataclasses

    scene, proxies, models, paths, env = _setup(vis_bias, seed, n)
    models = dataclasses.replace(
        models,
        depth_params={k: (v + depth_bias if k == "head_b1" else v)
                      for k, v in models.depth_params.items()},
    )
    rng = np.random.RandomState(seed + 9)
    shadow = PathState.empty(n)._replace(
        origin=paths.origin, direction=paths.direction,
        tmax=jnp.asarray((rng.rand(n) * 2.5 + 0.3).astype(np.float32)),
        throughput=jnp.asarray(rng.rand(n, 3).astype(np.float32)),
        pixel_index=jnp.asarray((np.arange(n) % 97).astype(np.int32)),
        is_valid=paths.is_valid,
    )
    return scene, proxies, models, shadow


def test_fused_shadow_route_matches_composed():
    """The shadow-mode megakernel (local occlusion + march + vis/depth +
    max-occlusion blend in one program) must reproduce the composed
    shadow_direct_light_nn image.  vis/depth biased off both decision
    thresholds (vis>0.5 and the inside-hit depth comparison)."""
    for vis_bias, depth_bias, seed in (
        (10.0, -10.0, 41),   # everything marched occludes
        (10.0, 10.0, 43),    # inside-hits pass the depth test
        (-10.0, 0.0, 47),    # nothing occludes
    ):
        scene, proxies, models, shadow = _shadow_setup(vis_bias, depth_bias,
                                                       seed)
        npix = 97
        composed, _ = ps.shadow_direct_light_nn(
            scene, proxies, models, shadow, jnp.int32(8), 3, 1e-3, 4, npix)
        orig = ps._use_fused_route
        ps._use_fused_route = lambda *a: True
        try:
            fused, _ = ps.shadow_direct_light_nn(
                scene, proxies, models, shadow, jnp.int32(8), 3, 1e-3, 4,
                npix)
        finally:
            ps._use_fused_route = orig
        np.testing.assert_allclose(
            np.asarray(composed), np.asarray(fused), rtol=1e-5, atol=1e-6,
            err_msg=str((vis_bias, depth_bias, seed)))


def test_fused_shadow_route_sorted_matches_unsorted():
    """Shadow weights are per-ray and order-independent: the sorted-wrapper
    variant must agree with the default unsorted form."""
    from pg2024_dprt_tpu.ops.pallas_route import shadow_route_fused

    scene, proxies, models, shadow = _shadow_setup(10.0, 10.0, 53, n=256)
    kw = dict(max_hits=3, eps=1e-3)
    base = shadow_route_fused(scene, proxies, models, shadow.origin,
                              shadow.direction, 1e-3,
                              shadow.tmax * (1.0 - 1e-3), shadow.is_valid,
                              jnp.int32(8), **kw)
    got = shadow_route_fused(scene, proxies, models, shadow.origin,
                             shadow.direction, 1e-3,
                             shadow.tmax * (1.0 - 1e-3), shadow.is_valid,
                             jnp.int32(8), sort_rays=True, **kw)
    for key in ("weight", "occluded_local", "survives"):
        np.testing.assert_array_equal(np.asarray(base[key]),
                                      np.asarray(got[key]), err_msg=key)
