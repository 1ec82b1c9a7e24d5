"""Pallas proxy-march kernel vs the XLA reference implementation.

Row ORDER may differ (the XLA oracle compacts records by slot, the kernel
writes one row per marching iteration — consumers are order-invariant:
secondary_route argmins over the hit axis, apply_grouped masks by
is_valid), so hits are compared per ray sorted by t.
"""
import numpy as np
import jax.numpy as jnp

from pg2024_dprt_tpu.ops.pallas_march import march_proxies_pallas
from pg2024_dprt_tpu.render.proxy_stages import march_proxies_xla
from pg2024_dprt_tpu.scene.geometry import ProxyTable

MH = 3


def _proxies(p=8, seed=0, with_empty=False):
    rng = np.random.RandomState(seed)
    lo = rng.rand(p, 3).astype(np.float32) * 3.0 - 1.0
    hi = lo + 0.3 + rng.rand(p, 3).astype(np.float32) * 1.2
    ml = np.linalg.norm(hi - lo, axis=1).astype(np.float32)
    if with_empty:
        lo[2], hi[2], ml[2] = np.inf, -np.inf, 0.0
    return ProxyTable(aabb_min=jnp.asarray(lo), aabb_max=jnp.asarray(hi),
                      max_length=jnp.asarray(ml))


def _rays(n, seed=1):
    rng = np.random.RandomState(seed)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 4.0 - 1.5)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    return o, d


def _hit_sets(q, n):
    """Per-ray list of (aabb, inside, t) for valid rows, sorted by t."""
    v = np.asarray(q.is_valid).reshape(n, MH)
    a = np.asarray(q.aabb_id).reshape(n, MH)
    i = np.asarray(q.is_inside).reshape(n, MH)
    t = np.asarray(q.aabb_t).reshape(n, MH)
    f = np.asarray(q.features).reshape(n, MH, 5)
    out = []
    for r in range(n):
        rows = [(a[r, k], bool(i[r, k]), t[r, k], f[r, k]) for k in range(MH) if v[r, k]]
        rows.sort(key=lambda x: x[2])
        out.append(rows)
    return out


def _check(proxies, o, d, t_cap, act, my_node):
    n = o.shape[0]
    ref = march_proxies_xla(proxies, o, d, t_cap, act, jnp.int32(my_node), MH, 1e-3)
    got = march_proxies_pallas(proxies, o, d, t_cap, act, jnp.int32(my_node), MH, 1e-3)
    hs_ref, hs_got = _hit_sets(ref, n), _hit_sets(got, n)
    for r in range(n):
        assert len(hs_ref[r]) == len(hs_got[r]), (r, hs_ref[r], hs_got[r])
        for (a0, i0, t0, f0), (a1, i1, t1, f1) in zip(hs_ref[r], hs_got[r]):
            assert a0 == a1 and i0 == i1, (r, hs_ref[r], hs_got[r])
            np.testing.assert_allclose(t0, t1, rtol=1e-5, atol=1e-6)
            # angle identities (phi(-d) vs phi(d)+pi) agree to f32 ulps
            np.testing.assert_allclose(f0, f1, rtol=1e-4, atol=2e-5)


def test_march_kernel_matches_oracle():
    proxies = _proxies()
    o, d = _rays(512)
    n = 512
    _check(proxies, o, d, jnp.full((n,), 3.4e38, jnp.float32),
           jnp.ones((n,), bool), my_node=8)


def test_march_kernel_my_node_exclusion_and_tcap():
    proxies = _proxies(seed=3)
    o, d = _rays(512, seed=4)
    n = 512
    rng = np.random.RandomState(5)
    t_cap = jnp.asarray((0.3 + rng.rand(n) * 3.0).astype(np.float32))
    act = jnp.asarray(rng.rand(n) > 0.3)
    _check(proxies, o, d, t_cap, act, my_node=2)


def test_march_kernel_instanced_matches_oracle():
    """Instanced tables (VERDICT r3 #5): the kernel's in-kernel
    object-space featurization (affine transform + Cephes angles + exact
    t_ratio) must match march_proxies_xla hit-for-hit, including the
    routing node id and the world/object depth scale."""
    rng = np.random.RandomState(11)
    p = 4
    offs = (rng.rand(p, 3).astype(np.float32) * 3.0 - 1.0)
    sc = (0.4 + rng.rand(p).astype(np.float32) * 0.8)
    m = np.zeros((p, 3, 4), np.float32)
    for i in range(p):
        m[i, :, :3] = np.eye(3, dtype=np.float32) / sc[i]
        m[i, :, 3] = -offs[i] / sc[i]
    proxies = ProxyTable(
        aabb_min=jnp.asarray(offs),
        aabb_max=jnp.asarray(offs + sc[:, None]),
        max_length=jnp.asarray(np.full((p,), np.sqrt(3.0), np.float32)),
        obj_id=jnp.asarray([0, 1, 0, 1], jnp.int32),
        node_id=jnp.asarray([1, 2, 3, 0], jnp.int32),
        world_to_obj=jnp.asarray(m),
        obj_min=jnp.zeros((p, 3), np.float32),
        obj_span=jnp.ones((p, 3), np.float32))
    o, d = _rays(512, seed=12)
    n = 512
    t_cap = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)
    for my in (0, 4):
        ref = march_proxies_xla(proxies, o, d, t_cap, act, jnp.int32(my),
                                MH, 1e-3)
        got = march_proxies_pallas(proxies, o, d, t_cap, act, jnp.int32(my),
                                   MH, 1e-3)

        def rows(q):
            v = np.asarray(q.is_valid).reshape(n, MH)
            a = np.asarray(q.aabb_id).reshape(n, MH)
            nd = np.asarray(q.node_id).reshape(n, MH)
            i = np.asarray(q.is_inside).reshape(n, MH)
            t = np.asarray(q.aabb_t).reshape(n, MH)
            rt = np.asarray(q.t_ratio).reshape(n, MH)
            f = np.asarray(q.features).reshape(n, MH, 5)
            out = []
            for r in range(n):
                rr = [(a[r, k], nd[r, k], bool(i[r, k]), t[r, k], rt[r, k],
                       f[r, k]) for k in range(MH) if v[r, k]]
                rr.sort(key=lambda x: x[3])
                out.append(rr)
            return out

        hs_ref, hs_got = rows(ref), rows(got)
        for r in range(n):
            assert len(hs_ref[r]) == len(hs_got[r]), (my, r)
            for (a0, n0, i0, t0, r0, f0), (a1, n1, i1, t1, r1, f1) in zip(
                    hs_ref[r], hs_got[r]):
                assert a0 == a1 and n0 == n1 and i0 == i1, (my, r)
                np.testing.assert_allclose(t0, t1, rtol=1e-5, atol=1e-6)
                np.testing.assert_allclose(r0, r1, rtol=1e-4, atol=1e-6)
                np.testing.assert_allclose(f0, f1, rtol=1e-4, atol=5e-4)


def test_march_kernel_empty_partition():
    proxies = _proxies(seed=6, with_empty=True)
    o, d = _rays(256, seed=7)
    n = 256
    _check(proxies, o, d, jnp.full((n,), 3.4e38, jnp.float32),
           jnp.ones((n,), bool), my_node=0)
    got = march_proxies_pallas(proxies, o, d, jnp.full((n,), 3.4e38, jnp.float32),
                               jnp.ones((n,), bool), jnp.int32(0), MH, 1e-3)
    assert not bool((np.asarray(got.aabb_id)[np.asarray(got.is_valid)] == 2).any())
