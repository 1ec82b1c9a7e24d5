"""Conservative visibility-grid culling (VERDICT r3 item 7).

The reference consults precomputed per-AABB visibility grids inside its trace
kernel to cull rays (/root/reference/src/cuda/bvh_intersection.cu:234-310).
Here the grid is built ANALYTICALLY from triangle AABBs
(scene/visibility_grid.py::build_conservative_grid), so "bin empty" is a
proof that no entering ray through that bin can hit — culling is exact, and
the distributed render with grids on must reproduce the grids-off image
while reporting a nonzero culled candidate/hop count."""
import numpy as np
import jax
import jax.numpy as jnp

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.models import random_proxy_models
from pg2024_dprt_tpu.parallel import make_mesh, render_image_distributed
from pg2024_dprt_tpu.render import RenderConfig, render_image
from pg2024_dprt_tpu.scene import (
    build_partitioned_scene,
    device_scene_from_meshes,
)
from pg2024_dprt_tpu.scene.lights import EnvironmentMap
from pg2024_dprt_tpu.scene.procedural import two_room_scene
from pg2024_dprt_tpu.scene.visibility_grid import (
    build_conservative_grid,
    query_conservative_grids,
)


def test_conservative_grid_no_false_negatives():
    """Every ray that really hits geometry must land in a marked bin — the
    exactness contract of conservative construction (sampling can't prove
    this; the analytic builder must)."""
    from pg2024_dprt_tpu.ops.traversal import traverse_bvh
    from pg2024_dprt_tpu.scene.procedural import random_tri_soup
    from pg2024_dprt_tpu.train.datagen import _sample_entry_rays

    mesh = random_tri_soup(400, seed=3)
    scene = device_scene_from_meshes([mesh])
    lo, hi = mesh.aabb()

    tmin = np.minimum(np.minimum(mesh.v0, mesh.v1), mesh.v2)
    tmax = np.maximum(np.maximum(mesh.v0, mesh.v1), mesh.v2)
    grid = build_conservative_grid(tmin, tmax, lo, hi, 16, 16, 16)
    # a soup fills its box loosely: the grid must still leave SOME bins empty
    # or it cannot cull anything
    assert not grid.all()

    n = 20_000
    o, d = _sample_entry_rays(jax.random.PRNGKey(7), jnp.asarray(lo), jnp.asarray(hi), n)
    hits = traverse_bvh(
        scene, o, d, 1e-4, jnp.full((n,), 3.4e38, jnp.float32), jnp.ones((n,), bool)
    )

    # slab entry wrt the box (origins sit ON the AABB surface: nudge back so
    # the entry is found in front of the origin)
    o_out = o - 1e-3 * d
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    t0 = (jnp.asarray(lo)[None] - o_out) * inv
    t1 = (jnp.asarray(hi)[None] - o_out) * inv
    t_near = jnp.minimum(t0, t1)
    t_enter = jnp.max(t_near, axis=-1)

    vis = query_conservative_grids(
        jnp.asarray(grid)[None], jnp.asarray(lo)[None], jnp.asarray(hi)[None],
        o_out, d, t_enter[:, None], t_near[:, None, :],
    )[:, 0]
    hit = np.asarray(hits.is_hit)
    vis = np.asarray(vis)
    false_neg = hit & ~vis
    assert false_neg.sum() == 0, f"{false_neg.sum()} hitting rays in unmarked bins"
    # and it must not be trivially full for these rays either
    assert (~vis).sum() > 0


def test_conservative_grid_anisotropic_no_false_negatives():
    """Round-4 advisor (high): the builder used span-normalized rel-space
    deltas for the azimuth arcs while the query bins raw WORLD directions —
    on an anisotropic AABB (here 10x1x1) the shear moved hitting rays into
    unmarked bins (552/2000 falsely culled in the advisor's repro). The
    builder now scales deltas back to world units; this gate pins that."""
    from pg2024_dprt_tpu.scene.geometry import MeshGeometry
    from pg2024_dprt_tpu.ops.traversal import traverse_bvh
    from pg2024_dprt_tpu.scene.procedural import random_tri_soup
    from pg2024_dprt_tpu.train.datagen import _sample_entry_rays

    mesh = random_tri_soup(400, seed=11)  # content fills [0,1]^3 ...
    scene = device_scene_from_meshes([mesh])
    # ... inside a strongly anisotropic 10x1x1 partition AABB (the advisor's
    # repro geometry): most of the box is empty so real culling must happen.
    lo = np.zeros(3, np.float32)
    hi = np.array([10.0, 1.0, 1.0], np.float32)

    tmin = np.minimum(np.minimum(mesh.v0, mesh.v1), mesh.v2)
    tmax = np.maximum(np.maximum(mesh.v0, mesh.v1), mesh.v2)
    grid = build_conservative_grid(tmin, tmax, lo, hi, 16, 16, 16)
    assert not grid.all()

    n = 20_000
    o, d = _sample_entry_rays(jax.random.PRNGKey(13), jnp.asarray(lo),
                              jnp.asarray(hi), n)
    hits = traverse_bvh(
        scene, o, d, 1e-4, jnp.full((n,), 3.4e38, jnp.float32),
        jnp.ones((n,), bool),
    )
    o_out = o - 1e-3 * d
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d >= 0, 1e-12, -1e-12), d)
    t0 = (jnp.asarray(lo)[None] - o_out) * inv
    t1 = (jnp.asarray(hi)[None] - o_out) * inv
    t_near = jnp.minimum(t0, t1)
    t_enter = jnp.max(t_near, axis=-1)
    vis = query_conservative_grids(
        jnp.asarray(grid)[None], jnp.asarray(lo)[None], jnp.asarray(hi)[None],
        o_out, d, t_enter[:, None], t_near[:, None, :],
    )[:, 0]
    hit = np.asarray(hits.is_hit)
    vis = np.asarray(vis)
    false_neg = hit & ~vis
    assert false_neg.sum() == 0, f"{false_neg.sum()} hitting rays falsely culled"
    assert (~vis).sum() > 0  # still actually culls something


def test_distributed_grid_culling_exact():
    """Grids on == grids off image (conservative culling is exact) while the
    culled candidate/hop stat shows real migration + ring-shadow reduction."""
    meshes, lights = two_room_scene(num_rooms=4, tris_per_room=96, seed=2)
    part_plain = build_partitioned_scene(meshes, 4)
    part_grids = build_partitioned_scene(meshes, 4, visibility_grids=True)
    assert part_grids.proxies.vis_grid is not None
    env = EnvironmentMap.constant((0.25, 0.25, 0.3))
    camera = Camera.look_at(
        [4.0, 2.2, 5.0], [4.0, 0.5, 0.5], [0, 1, 0], 55.0, 24, 24
    )
    mesh = make_mesh(4)
    models = random_proxy_models(jax.random.PRNGKey(0), 4)

    cfg_off = RenderConfig(width=24, height=24, spp=1, bounces=3)
    cfg_on = RenderConfig(width=24, height=24, spp=1, bounces=3,
                          use_visibility_grids=True)

    img_off, st_off = render_image_distributed(
        part_plain, models, lights, env, camera, cfg_off, mesh, return_stats=True
    )
    img_on, st_on = render_image_distributed(
        part_grids, models, lights, env, camera, cfg_on, mesh, return_stats=True
    )
    assert st_off["grid_culled"] == 0
    assert st_on["grid_culled"] > 0, "grids never culled anything"
    # exact-image equivalence gate (fp reassociation only: culling reorders
    # the migration merge, which permutes segment_sum rows)
    np.testing.assert_allclose(np.asarray(img_on), np.asarray(img_off),
                               rtol=1e-5, atol=1e-6)

    # and both match the single-device oracle
    single = device_scene_from_meshes(meshes)
    want = np.asarray(render_image(single, lights, env, camera, cfg_off))
    np.testing.assert_allclose(np.asarray(img_on), want, rtol=1e-3, atol=1e-4)
