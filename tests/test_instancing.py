"""Instanced proxy tables (reference instanceID semantics,
/root/reference/optix/secondary_ray_kernel.cu:289-316): object-space NN
features, per-instance world/object depth ratio, obj/node indirection."""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from pg2024_dprt_tpu.core.types import PathState
from pg2024_dprt_tpu.models.mlp import MLPConfig
from pg2024_dprt_tpu.models.proxy import random_proxy_models
from pg2024_dprt_tpu.render.proxy_stages import march_proxies_xla, secondary_route
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.geometry import ProxyTable
from pg2024_dprt_tpu.scene.lights import EnvironmentMap


def _rays(n, seed=2):
    rng = np.random.RandomState(seed)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    return o, jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))


def _boxes():
    offs = np.asarray(
        [[-1.05, 0, 0], [1.05, 0, 0], [0, -1.05, 0], [0, 1.05, 0]], np.float32)
    return offs, offs + 1.0


def _identity_instanced(lo, hi):
    p = lo.shape[0]
    m = np.zeros((p, 3, 4), np.float32)
    m[:, :, :3] = np.eye(3, dtype=np.float32)
    return ProxyTable(
        aabb_min=jnp.asarray(lo), aabb_max=jnp.asarray(hi),
        max_length=jnp.asarray(np.linalg.norm(hi - lo, axis=1)),
        obj_id=jnp.arange(p, dtype=jnp.int32),
        node_id=jnp.arange(p, dtype=jnp.int32),
        world_to_obj=jnp.asarray(m),
        obj_min=jnp.asarray(lo), obj_span=jnp.asarray(hi - lo),
    )


def test_identity_instancing_matches_plain():
    """world_to_obj = identity must reproduce the non-instanced march
    field-for-field."""
    lo, hi = _boxes()
    plain = ProxyTable(aabb_min=jnp.asarray(lo), aabb_max=jnp.asarray(hi),
                       max_length=jnp.asarray(np.linalg.norm(hi - lo, axis=1)))
    inst = _identity_instanced(lo, hi)
    o, d = _rays(512)
    cap = jnp.full((512,), 3.4e38, jnp.float32)
    act = jnp.ones((512,), bool)
    qa = march_proxies_xla(plain, o, d, cap, act, jnp.int32(99), 3, 1e-3)
    qb = march_proxies_xla(inst, o, d, cap, act, jnp.int32(99), 3, 1e-3)
    np.testing.assert_array_equal(np.asarray(qa.is_valid), np.asarray(qb.is_valid))
    np.testing.assert_array_equal(np.asarray(qa.aabb_id), np.asarray(qb.aabb_id))
    v = np.asarray(qa.is_valid)
    np.testing.assert_allclose(np.asarray(qa.features)[v],
                               np.asarray(qb.features)[v], atol=1e-6)
    np.testing.assert_allclose(np.asarray(qa.t_ratio)[v],
                               np.asarray(qb.t_ratio)[v], atol=1e-6)
    np.testing.assert_allclose(np.asarray(qa.normalized_t)[v],
                               np.asarray(qb.normalized_t)[v], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(qb.node_id)[v] >= 0, True)


def test_scaled_instance_ratio_and_features():
    """A uniformly scaled instance reports t_ratio = scale and object-space
    features equal to the unscaled object's features for equivalent rays."""
    s = 2.0
    # object space: unit box at origin; world instance: scaled by s, offset
    obj_lo = np.zeros((1, 3), np.float32)
    obj_hi = np.ones((1, 3), np.float32)
    off = np.asarray([[3.0, 0.0, 0.0]], np.float32)
    w_lo = off + obj_lo * s
    w_hi = off + obj_hi * s
    m = np.zeros((1, 3, 4), np.float32)
    m[0, :, :3] = np.eye(3, dtype=np.float32) / s
    m[0, :, 3] = -off[0] / s
    inst = ProxyTable(
        aabb_min=jnp.asarray(w_lo), aabb_max=jnp.asarray(w_hi),
        max_length=jnp.asarray(np.linalg.norm(obj_hi - obj_lo, axis=1)),
        obj_id=jnp.zeros((1,), jnp.int32), node_id=jnp.ones((1,), jnp.int32),
        world_to_obj=jnp.asarray(m),
        obj_min=jnp.asarray(obj_lo), obj_span=jnp.asarray(obj_hi - obj_lo),
    )
    # reference object at the origin, unscaled, non-instanced
    plain = ProxyTable(aabb_min=jnp.asarray(obj_lo), aabb_max=jnp.asarray(obj_hi),
                       max_length=jnp.asarray(np.linalg.norm(obj_hi - obj_lo, axis=1)))
    n = 256
    o_obj, d = _rays(n, seed=5)
    o_obj = o_obj * 0.3 - 1.0  # outside the unit box, mostly
    cap = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)
    # equivalent world rays: x_w = off + s * x_obj
    o_w = jnp.asarray(off) + o_obj * s
    qi = march_proxies_xla(inst, o_w, d, cap, act, jnp.int32(0), 3, 1e-3)
    qp = march_proxies_xla(plain, o_obj, d, cap, act, jnp.int32(99), 3, 1e-3)
    vi, vp = np.asarray(qi.is_valid), np.asarray(qp.is_valid)
    np.testing.assert_array_equal(vi, vp)
    v = vi
    # object-space features identical; world aabb_t scales by s; ratio = s
    np.testing.assert_allclose(np.asarray(qi.features)[v],
                               np.asarray(qp.features)[v], atol=1e-5)
    np.testing.assert_allclose(np.asarray(qi.t_ratio)[v], s, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(qi.aabb_t)[v],
                               np.asarray(qp.aabb_t)[v] * s, rtol=1e-5)
    # object-space normalized entry depth is scale-invariant
    np.testing.assert_allclose(np.asarray(qi.normalized_t)[v],
                               np.asarray(qp.normalized_t)[v], rtol=1e-5)
    # routing target is the owning node, not the object
    assert (np.asarray(qi.node_id)[v] == 1).all()
    assert (np.asarray(qi.aabb_id)[v] == 0).all()


def _instanced_setup(vis_bias, seed=0, n=512):
    """4 instances of 2 objects (scaled + offset), 2 nets, soup scene."""
    scene = device_scene_from_meshes([random_tri_soup(512, seed=seed)],
                                     tris_per_cluster=64)
    offs = np.asarray(
        [[-1.6, 0, 0], [1.2, 0, 0], [0, -1.6, 0], [0, 1.2, 0]], np.float32)
    scales = np.asarray([0.5, 0.5, 0.7, 0.7], np.float32)
    obj_lo = np.zeros((4, 3), np.float32)
    obj_hi = np.ones((4, 3), np.float32)
    m = np.zeros((4, 3, 4), np.float32)
    for i in range(4):
        m[i, :, :3] = np.eye(3, dtype=np.float32) / scales[i]
        m[i, :, 3] = -offs[i] / scales[i]
    proxies = ProxyTable(
        aabb_min=jnp.asarray(offs),
        aabb_max=jnp.asarray(offs + scales[:, None]),
        max_length=jnp.asarray(np.linalg.norm(obj_hi - obj_lo, axis=1)),
        obj_id=jnp.asarray([0, 1, 0, 1], jnp.int32),
        node_id=jnp.asarray([1, 2, 3, 4], jnp.int32),
        world_to_obj=jnp.asarray(m),
        obj_min=jnp.asarray(obj_lo), obj_span=jnp.asarray(obj_hi - obj_lo),
    )
    cfg = MLPConfig(width=64, depth=2)
    models = random_proxy_models(jax.random.PRNGKey(seed + 1), 2, cfg, cfg)
    models = dataclasses.replace(
        models,
        vis_params={k: (v + vis_bias if k == "head_b1" else v)
                    for k, v in models.vis_params.items()},
    )
    rng = np.random.RandomState(seed + 2)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.6 - 0.3)
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


def _route_both_instanced(vis_bias, seed, my_id):
    import pg2024_dprt_tpu.render.proxy_stages as ps

    scene, proxies, models, paths, env = _instanced_setup(vis_bias, seed)
    n = paths.capacity
    composed = ps.secondary_route(scene, proxies, models, env, paths,
                                  jnp.int32(my_id), 3, 1e-3, n)
    orig = ps._use_fused_route
    ps._use_fused_route = lambda *a: True
    try:
        fused = ps.secondary_route(scene, proxies, models, env, paths,
                                   jnp.int32(my_id), 3, 1e-3, n)
    finally:
        ps._use_fused_route = orig
    return composed, fused


def _compare_routes(composed, fused):
    (cp, ce, _), (fp, fe, _) = composed, fused
    np.testing.assert_array_equal(np.asarray(cp.target_node),
                                  np.asarray(fp.target_node))
    np.testing.assert_array_equal(np.asarray(cp.current_node),
                                  np.asarray(fp.current_node))
    np.testing.assert_array_equal(np.asarray(cp.is_hit), np.asarray(fp.is_hit))
    np.testing.assert_array_equal(np.asarray(cp.is_valid),
                                  np.asarray(fp.is_valid))
    np.testing.assert_allclose(np.asarray(cp.tmax), np.asarray(fp.tmax),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(fe),
                               rtol=1e-5, atol=1e-6)


def test_fused_route_instanced_matches_composed():
    """The route megakernel's in-kernel instancing (object-space features,
    obj-id net select, node-id routing, t_ratio consumption) must agree
    end-to-end with the composed march_proxies_xla + grouped-NN path."""
    _compare_routes(*_route_both_instanced(vis_bias=10.0, seed=17, my_id=0))
    _compare_routes(*_route_both_instanced(vis_bias=-10.0, seed=19, my_id=0))


def test_fused_route_instanced_node_exclusion():
    """Own-partition exclusion is by OWNING NODE: with my_id = an instance's
    node, both paths must skip exactly that instance."""
    _compare_routes(*_route_both_instanced(vis_bias=10.0, seed=23, my_id=2))


def test_instanced_route_consumption():
    """End-to-end secondary_route over a scaled instance: with rigged
    constant nets (vis ~ 1, depth = const), the settled tmax must be
    aabb_t + t_ratio * max_length * depth (tMaxFloatTypeKernel parity,
    frame_buffer_update.cu:222-257), and target_node the owning node."""
    scene = device_scene_from_meshes([random_tri_soup(256, seed=3)],
                                     tris_per_cluster=64)
    s = 2.0
    obj_lo = np.zeros((1, 3), np.float32)
    obj_hi = np.ones((1, 3), np.float32)
    off = np.asarray([[3.0, 0.2, 0.2]], np.float32)
    m = np.zeros((1, 3, 4), np.float32)
    m[0, :, :3] = np.eye(3, dtype=np.float32) / s
    m[0, :, 3] = -off[0] / s
    inst = ProxyTable(
        aabb_min=jnp.asarray(off), aabb_max=jnp.asarray(off + s),
        max_length=jnp.asarray(np.linalg.norm(obj_hi - obj_lo, axis=1)),
        obj_id=jnp.zeros((1,), jnp.int32), node_id=jnp.ones((1,), jnp.int32),
        world_to_obj=jnp.asarray(m),
        obj_min=jnp.asarray(obj_lo), obj_span=jnp.asarray(obj_hi - obj_lo),
    )
    cfg = MLPConfig(width=64, depth=2)
    models = random_proxy_models(jax.random.PRNGKey(1), 1, cfg, cfg)
    depth_const = 0.25
    zero_v = jax.tree.map(jnp.zeros_like, models.vis_params)
    zero_d = jax.tree.map(jnp.zeros_like, models.depth_params)
    models = dataclasses.replace(
        models,
        vis_params={k: (v + 8.0 if k == "head_b1" else v)
                    for k, v in zero_v.items()},         # sigmoid(8) ~ 1
        depth_params={k: (v + depth_const if k == "head_b1" else v)
                      for k, v in zero_d.items()},       # leaky(c) = c
    )
    n = 64
    # rays from far left aimed at the instance box (miss local geometry:
    # scene soup lives in [0,1]^3, rays start at x=2.5 going +x)
    o = jnp.asarray(np.tile([[2.5, 1.0, 1.0]], (n, 1)).astype(np.float32)
                    + np.random.RandomState(7).rand(n, 3).astype(np.float32) * 0.1)
    d = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (n, 1)).astype(np.float32))
    paths = PathState.empty(n)._replace(
        origin=o, direction=d,
        tmax=jnp.full((n,), 3.4e38, jnp.float32),
        throughput=jnp.ones((n, 3), jnp.float32),
        pixel_index=jnp.asarray(np.arange(n, dtype=np.int32)),
        is_valid=jnp.ones((n,), bool),
    )
    env = EnvironmentMap.constant((0.3, 0.3, 0.3))
    new_paths, env_add, diag = secondary_route(
        scene, inst, models, env, paths, jnp.int32(0), 3, 1e-3, n)
    q = march_proxies_xla(inst, o, d, paths.tmax, paths.is_valid,
                          jnp.int32(0), 3, 1e-3)
    v0 = np.asarray(q.is_valid)[0::3]
    assert v0.any(), "test rays must hit the instance proxy"
    expect = (np.asarray(q.aabb_t) + np.asarray(q.t_ratio)
              * np.asarray(q.max_length) * depth_const)[0::3]
    got_t = np.asarray(new_paths.tmax)
    got_node = np.asarray(new_paths.target_node)
    np.testing.assert_allclose(got_t[v0], expect[v0], rtol=1e-4)
    assert (got_node[v0] == 1).all()


def test_fused_shadow_route_instanced_matches_composed():
    """Shadow-mode megakernel over an INSTANCED proxy table: the in-kernel
    object-space normalized entry depth (t / (ratio * max_length)) must
    reproduce the composed inside-hit depth comparison."""
    import pg2024_dprt_tpu.render.proxy_stages as ps

    for vis_bias, depth_bias, seed in ((10.0, -10.0, 61), (10.0, 10.0, 67)):
        scene, proxies, models, paths, env = _instanced_setup(vis_bias,
                                                              seed)
        models = dataclasses.replace(
            models,
            depth_params={k: (v + depth_bias if k == "head_b1" else v)
                          for k, v in models.depth_params.items()},
        )
        n = paths.capacity
        rng = np.random.RandomState(seed + 9)
        shadow = PathState.empty(n)._replace(
            origin=paths.origin, direction=paths.direction,
            tmax=jnp.asarray((rng.rand(n) * 2.5 + 0.3).astype(np.float32)),
            throughput=jnp.asarray(rng.rand(n, 3).astype(np.float32)),
            pixel_index=jnp.asarray((np.arange(n) % 97).astype(np.int32)),
            is_valid=paths.is_valid,
        )
        composed, _ = ps.shadow_direct_light_nn(
            scene, proxies, models, shadow, jnp.int32(0), 3, 1e-3, 4, 97)
        orig = ps._use_fused_route
        ps._use_fused_route = lambda *a: True
        try:
            fused, _ = ps.shadow_direct_light_nn(
                scene, proxies, models, shadow, jnp.int32(0), 3, 1e-3, 4, 97)
        finally:
            ps._use_fused_route = orig
        np.testing.assert_allclose(
            np.asarray(composed), np.asarray(fused), rtol=1e-5, atol=1e-6,
            err_msg=str((vis_bias, depth_bias, seed)))
