"""Two-level instanced local geometry (VERDICT r3 #6): the resident
kernel's per-cluster object-space transform must reproduce an explicit
per-instance oracle hit-for-hit, and N instances must share ONE triangle
table (reference capability: instanced GASes + per-instance transforms,
distributed_traversal_kernel.cu:174, renderer.cpp:1726-1796)."""
import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.ops.traversal import traverse_bvh
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.geometry import device_scene_from_instances


def _transforms(ni, seed):
    """Random affines: rotation * per-axis scale + translation."""
    rng = np.random.RandomState(seed)
    M = np.zeros((ni, 3, 4), np.float32)
    for i in range(ni):
        q = rng.randn(3, 3)
        r, _ = np.linalg.qr(q)
        s = np.diag(0.5 + rng.rand(3) * 1.5)
        M[i, :, :3] = (r @ s).astype(np.float32)
        M[i, :, 3] = (rng.rand(3) * 6.0 - 3.0).astype(np.float32)
    return M


def _oracle(base, M, o, d, t_min, t_max, act):
    """Per-instance loop: transform rays with the UNNORMALIZED object
    direction (t_obj == t_world), traverse the base BVH, min-combine."""
    ni = M.shape[0]
    inv_lin = np.linalg.inv(M[:, :, :3])
    inv_tr = -np.einsum("iab,ib->ia", inv_lin, M[:, :, 3])
    best_t = np.asarray(t_max, np.float32).copy()
    best_tri = np.full(o.shape[0], -1, np.int64)
    hit = np.zeros(o.shape[0], bool)
    tb = int(base.v0.shape[0])
    for i in range(ni):
        o_l = o @ inv_lin[i].T + inv_tr[i]
        d_l = d @ inv_lin[i].T
        h = traverse_bvh(base, jnp.asarray(o_l), jnp.asarray(d_l),
                         t_min, jnp.asarray(best_t), jnp.asarray(act))
        ht = np.asarray(h.t)
        hh = np.asarray(h.is_hit)
        closer = hh & (ht < best_t)
        best_t = np.where(closer, ht, best_t)
        best_tri = np.where(closer,
                            i * tb + np.asarray(h.tri_index, np.int64),
                            best_tri)
        hit |= closer
    return best_t, best_tri, hit


def test_instanced_trace_matches_per_instance_oracle():
    meshes = [random_tri_soup(1500, seed=3)]
    M = _transforms(4, seed=5)
    inst = device_scene_from_instances(meshes, M, tris_per_cluster=64)
    base = device_scene_from_meshes(meshes, tris_per_cluster=64)
    assert inst.instanced
    # one shared table: instanced cluster count = 4x base, table unchanged
    assert inst.num_clusters == 4 * base.num_clusters
    assert inst.cl_mt_table.shape == base.cl_mt_table.shape

    rng = np.random.RandomState(7)
    n = 2048
    o = (rng.rand(n, 3) * 10.0 - 5.0).astype(np.float32)
    # aim each ray at a random point inside a random instance's bounds so
    # the comparison exercises real hits, not a miss wall
    centers = (np.einsum("iab,b->ia", M[:, :, :3],
                         np.full(3, 0.5, np.float32)) + M[:, :, 3])
    pick = rng.randint(0, M.shape[0], n)
    jitter = (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.6
    target = centers[pick] + np.einsum(
        "nab,nb->na", M[pick, :, :3], jitter)
    d = (target - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    act = rng.rand(n) > 0.15
    tmax = np.where(rng.rand(n) > 0.5, 3.4e38, 4.0).astype(np.float32)

    want_t, want_tri, want_hit = _oracle(base, M, o, d, 1e-3, tmax, act)
    got, dropped = trace_resident(inst, jnp.asarray(o), jnp.asarray(d),
                                  1e-3, jnp.asarray(tmax), jnp.asarray(act))
    got_t = np.asarray(got.t)
    got_hit = np.asarray(got.is_hit)
    got_tri = np.asarray(got.tri_index, np.int64)
    assert int(dropped) == 0

    assert (got_hit == want_hit).mean() > 0.999, (
        got_hit.sum(), want_hit.sum())
    both = got_hit & want_hit
    assert both.sum() > 200  # the test must exercise real hits
    dt = np.abs(got_t[both] - want_t[both]) / np.maximum(1.0, want_t[both])
    assert dt.max() < 1e-3
    # winner identity (virtual id = inst*TB + base canon); coplanar-tie
    # winners may differ where ts are equal
    tri_same = got_tri[both] == want_tri[both]
    assert (tri_same | (dt < 1e-4)).all()

    # any-hit kernel agrees with the closest-hit oracle's hit mask
    occ, dr = trace_resident(inst, jnp.asarray(o), jnp.asarray(d), 1e-3,
                             jnp.asarray(tmax), jnp.asarray(act),
                             any_hit=True)
    assert int(dr) == 0
    assert (np.asarray(occ) == want_hit).mean() > 0.999


def test_instanced_render_smoke():
    """Instanced scene renders end-to-end through the composed pipeline
    (resident tracer, instanced surface_attributes decode)."""
    from pg2024_dprt_tpu.core import Camera
    from pg2024_dprt_tpu.render import RenderConfig, render_image
    from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable
    from pg2024_dprt_tpu.scene.procedural import cornell_box

    meshes, _ = cornell_box()
    M = np.zeros((2, 3, 4), np.float32)
    M[0, :, :3] = np.eye(3)
    M[1, :, :3] = np.eye(3) * 0.5
    M[1, :, 3] = [1.6, 0.0, 0.0]
    inst = device_scene_from_instances(meshes, M)
    quad = np.asarray(
        [[[0.2, 0.98, 0.2], [0.8, 0.98, 0.2], [0.8, 0.98, 0.8]],
         [[0.2, 0.98, 0.2], [0.8, 0.98, 0.8], [0.2, 0.98, 0.8]]],
        np.float32)
    lights = LightTable.from_arrays(quad, np.full((2, 3), 12.0, np.float32))
    env = EnvironmentMap.constant((0.1, 0.1, 0.12))
    cam = Camera.look_at([1.0, 0.6, 3.2], [0.8, 0.5, 0.0], [0, 1, 0],
                         55.0, 24, 24)
    cfg = RenderConfig(width=24, height=24, spp=1, bounces=2,
                       tracer="resident", fused_frame="off")
    img = np.asarray(render_image(inst, lights, env, cam, cfg))
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.max() > 1e-3


def test_instanced_grouped_matches_flat():
    """The grouped two-level cull is instance-aware (per-instance base-order
    groups, mboxes lane-7 cid0 indirection): forced-grouped traces must
    reproduce the flat instanced kernel exactly, VMEM and HBM-streamed,
    closest and any-hit."""
    meshes = [random_tri_soup(1500, seed=3)]
    M = _transforms(3, seed=11)
    inst = device_scene_from_instances(meshes, M, tris_per_cluster=64)
    assert inst.cl_gboxes is not None and inst.cl_mboxes is not None
    # member/group indirection invariants
    mb = np.asarray(inst.cl_mboxes)
    kb = inst.cl_mt_table.shape[0]
    # cid0 = instance*KB + base_group*G: base part must be group-aligned
    assert (mb[:, 0, 7].astype(int) % kb % 8 == 0).all()
    assert mb[:, 0, 7].max() < inst.num_clusters

    rng = np.random.RandomState(13)
    n = 1024
    o = (rng.rand(n, 3) * 10.0 - 5.0).astype(np.float32)
    centers = (np.einsum("iab,b->ia", M[:, :, :3],
                         np.full(3, 0.5, np.float32)) + M[:, :, 3])
    pick = rng.randint(0, M.shape[0], n)
    target = centers[pick] + (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.5
    d = (target - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    act = rng.rand(n) > 0.1
    tmax = np.full(n, 3.4e38, np.float32)
    args = (jnp.asarray(o), jnp.asarray(d), 1e-3, jnp.asarray(tmax),
            jnp.asarray(act))

    ref, dr0 = trace_resident(inst, *args, grouped=False)
    assert int(dr0) == 0
    assert int(np.asarray(ref.is_hit).sum()) > 200
    for hbm in (False, True):
        got, dr = trace_resident(inst, *args, grouped=True, hbm_table=hbm)
        assert int(dr) == 0
        np.testing.assert_array_equal(np.asarray(got.is_hit),
                                      np.asarray(ref.is_hit))
        both = np.asarray(ref.is_hit)
        np.testing.assert_allclose(np.asarray(got.t)[both],
                                   np.asarray(ref.t)[both], rtol=1e-5)
        assert (np.asarray(got.tri_index)[both]
                == np.asarray(ref.tri_index)[both]).mean() > 0.999

    occ_ref, _ = trace_resident(inst, *args, any_hit=True, grouped=False)
    for hbm in (False, True):
        occ, dr = trace_resident(inst, *args, any_hit=True, grouped=True,
                                 hbm_table=hbm)
        assert int(dr) == 0
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))


def test_instanced_wide_clusters():
    """The >8M-effective-tri regime widens clusters to 2048 lanes
    (adaptive rule in device_scene_from_instances); the selection/MT
    machinery must stay exact at c=2048 (11 lane bits in the packed key)."""
    meshes = [random_tri_soup(4096, seed=6)]
    M = _transforms(2, seed=17)
    inst = device_scene_from_instances(meshes, M, tris_per_cluster=2048)
    assert inst.tris_per_cluster == 2048
    base = device_scene_from_meshes(meshes, tris_per_cluster=2048)

    rng = np.random.RandomState(19)
    n = 256
    o = (rng.rand(n, 3) * 10.0 - 5.0).astype(np.float32)
    centers = (np.einsum("iab,b->ia", M[:, :, :3],
                         np.full(3, 0.5, np.float32)) + M[:, :, 3])
    pick = rng.randint(0, 2, n)
    target = centers[pick] + (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.5
    d = (target - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    act = np.ones(n, bool)
    tmax = np.full(n, 3.4e38, np.float32)

    want_t, want_tri, want_hit = _oracle(base, M, o, d, 1e-3, tmax, act)
    got, dr = trace_resident(inst, jnp.asarray(o), jnp.asarray(d), 1e-3,
                             jnp.asarray(tmax), jnp.asarray(act))
    assert int(dr) == 0
    gh = np.asarray(got.is_hit)
    assert (gh == want_hit).mean() > 0.995
    both = gh & want_hit
    assert both.sum() > 64
    dt = np.abs(np.asarray(got.t)[both] - want_t[both]) / np.maximum(
        1.0, want_t[both])
    assert dt.max() < 1e-3
