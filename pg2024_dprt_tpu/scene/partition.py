"""Geometry partitioner: shards a scene across a device mesh.

The reference assigns each object to an MPI rank and gives every rank cheap
proxies (AABB + neural nets) for remote objects
(/root/reference/src/render/renderer.cpp:1812-1849, `isProxy`/`nodeID` tags).
Here the partitioner emits:

  * per-partition `DeviceScene`s padded to a common static capacity and
    stacked into a (P, ...) pytree — one row per device under shard_map;
  * a replicated global `ProxyTable` of partition AABBs;
  * a replicated global material table (`tri_mesh_id` indexes it globally).

Partition assignment is by mesh, either explicit or by spatial median of mesh
centroids (keeps partitions spatially coherent, which is what makes proxy
AABBs / proxy MLPs meaningful).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import build_bvh
from .geometry import DeviceScene, MeshGeometry, ProxyTable, _pack_device_scene, concat_geometry


class PartitionedScene(NamedTuple):
    stacked: DeviceScene       # every leaf has leading dim P
    proxies: ProxyTable        # (P, ...) replicated — partition-level rows
    num_partitions: int
    # instance-partitioned scenes only: INSTANCE-level proxy rows for the
    # NEURAL routing/shadow stages (world_to_obj + obj_id selects the net,
    # node_id routes to the owning partition — the reference's per-rank AS
    # table with instanced proxy handles, renderer.cpp:1812-1849).  The
    # migration loop keeps using the partition-level `proxies` above.
    nn_proxies: ProxyTable = None


def _median_split(centroids: np.ndarray, num_partitions: int) -> List[List[int]]:
    """Recursive spatial median split of (N, 3) centroids into P index lists."""
    if num_partitions == 1:
        return [list(range(centroids.shape[0]))]

    def split(idx: np.ndarray, parts: int) -> List[List[int]]:
        if parts == 1:
            return [idx.tolist()]
        c = centroids[idx]
        axis = int(np.argmax(c.max(0) - c.min(0))) if len(idx) > 1 else 0
        order = idx[np.argsort(c[:, axis], kind="stable")]
        left_parts = parts // 2
        mid = int(round(len(order) * left_parts / parts))
        mid = min(max(mid, 0), len(order))
        return split(order[:mid], left_parts) + split(order[mid:], parts - left_parts)

    return split(np.arange(centroids.shape[0]), num_partitions)


def partition_meshes(meshes: Sequence[MeshGeometry], num_partitions: int) -> List[List[int]]:
    """Assign mesh indices to partitions by recursive spatial median split of
    mesh centroids. Returns a list of P lists of mesh indices."""
    if num_partitions == 1:
        return [list(range(len(meshes)))]
    centroids = np.array([(m.aabb()[0] + m.aabb()[1]) * 0.5 for m in meshes])
    return _median_split(centroids, num_partitions)


def partition_instances(meshes: Sequence[MeshGeometry], transforms,
                        num_partitions: int) -> List[List[int]]:
    """Assign INSTANCE indices to partitions by spatial median of the
    transformed base-AABB centers (the instanced analogue of
    `partition_meshes`; reference: per-rank AS tables carry instanced GAS
    handles, /root/reference/src/render/renderer.cpp:1812-1849)."""
    M = np.asarray(transforms, np.float64)
    if num_partitions == 1:
        return [list(range(M.shape[0]))]
    los = np.array([m.aabb()[0] for m in meshes])
    his = np.array([m.aabb()[1] for m in meshes])
    center = ((los.min(0) + his.max(0)) * 0.5).astype(np.float64)
    centroids = np.einsum("iab,b->ia", M[:, :, :3], center) + M[:, :, 3]
    return _median_split(centroids, num_partitions)


def _split_curves(curves, aabb_min: np.ndarray, aabb_max: np.ndarray):
    """Assign curve PIECES to partitions (nearest partition triangle-AABB by
    piece midpoint) and pad each partition's piece set to a common capacity
    so the stacked pytree is rectangular.  Padding pieces carry NaN
    endpoints — every comparison in the branch-free round-cone intersector
    is False on NaN, so they can never hit (ops/curve_intersect.py).

    Returns (per-partition CurveSet list, (P,3) curve-box lo, (P,3) hi) —
    the boxes are all +inf/-inf for partitions that own no pieces."""
    from .curves import CurveSet

    p0 = np.asarray(curves.p0, np.float64)
    p1 = np.asarray(curves.p1, np.float64)
    r0 = np.asarray(curves.r0, np.float64)
    r1 = np.asarray(curves.r1, np.float64)
    seg = np.asarray(curves.seg_id)
    P = aabb_min.shape[0]
    mid = 0.5 * (p0 + p1)                                   # (M,3)
    # distance from piece midpoint to each partition box (0 inside)
    lo_ok = np.where(np.isfinite(aabb_min), aabb_min, np.inf)
    hi_ok = np.where(np.isfinite(aabb_max), aabb_max, -np.inf)
    clamped = np.clip(mid[:, None, :], lo_ok[None], hi_ok[None])  # (M,P,3)
    dist = np.linalg.norm(np.where(np.isfinite(clamped),
                                   clamped - mid[:, None, :], np.inf), axis=-1)
    owner = np.argmin(dist, axis=1)                         # (M,)
    cap = max(1, max((int((owner == p).sum()) for p in range(P)), default=1))

    sets, clo, chi = [], [], []
    for p in range(P):
        idx = np.where(owner == p)[0]
        m = idx.shape[0]
        pp0 = np.full((cap, 3), np.nan, np.float32)
        pp1 = np.full((cap, 3), np.nan, np.float32)
        rr0 = np.zeros((cap,), np.float32)
        rr1 = np.zeros((cap,), np.float32)
        sg = np.full((cap,), -1, np.int32)
        if m:
            pp0[:m] = p0[idx]
            pp1[:m] = p1[idx]
            rr0[:m] = r0[idx]
            rr1[:m] = r1[idx]
            sg[:m] = seg[idx]
            lo = np.minimum(p0[idx] - r0[idx, None],
                            p1[idx] - r1[idx, None]).min(0)
            hi = np.maximum(p0[idx] + r0[idx, None],
                            p1[idx] + r1[idx, None]).max(0)
        else:
            lo = np.full(3, np.inf)
            hi = np.full(3, -np.inf)
        sets.append(CurveSet(
            p0=jnp.asarray(pp0), p1=jnp.asarray(pp1),
            r0=jnp.asarray(rr0), r1=jnp.asarray(rr1),
            seg_id=jnp.asarray(sg), color=jnp.asarray(curves.color)))
        clo.append(lo)
        chi.append(hi)
    return sets, np.asarray(clo, np.float32), np.asarray(chi, np.float32)


def build_partitioned_scene(
    meshes: Sequence[MeshGeometry],
    num_partitions: int,
    assignment: Optional[List[List[int]]] = None,
    textures: Optional[list] = None,
    visibility_grids: bool = False,
    grid_res: tuple = (16, 16, 16),
    curves=None,
) -> PartitionedScene:
    """Build the stacked per-partition scenes + proxy table.

    visibility_grids=True attaches a conservative per-partition visibility
    grid (ProxyTable.vis_grid) built from triangle AABBs — the exact-mode
    cross-partition culling fallback (RenderConfig.use_visibility_grids).

    curves: optional CurveSet covering the whole scene; pieces are assigned
    to partitions spatially (`_split_curves`) and composite with each
    partition's local closest/occlusion traces exactly as on a single
    device — the reference compiles its cubic-B-spline IS into every
    pipeline on every rank (pipeline_helper.cpp:36-297), so hair works in
    all ray stages of the distributed render."""
    if assignment is None:
        assignment = partition_meshes(meshes, num_partitions)
    assert len(assignment) == num_partitions

    # Global material table: tri_mesh_id indexes meshes globally.
    global_host = concat_geometry(list(meshes))
    mesh_tables = dict(
        mesh_base_color=jnp.asarray(global_host["mesh_base_color"]),
        mesh_bsdf_type=jnp.asarray(global_host["mesh_bsdf_type"]),
        mesh_texture_index=jnp.asarray(global_host["mesh_texture_index"]),
    )

    per_part_host = []
    for part in assignment:
        sub = [meshes[i] for i in part]
        host = concat_geometry(sub)
        # remap local mesh ids -> global ids; material tables must be the
        # GLOBAL ones too (tri_shade pre-flattens material attributes per
        # triangle at pack time, indexing by the remapped global ids)
        if part:
            lut = np.asarray(part, np.int32)
            host["tri_mesh_id"] = lut[host["tri_mesh_id"]]
        for k in ("mesh_base_color", "mesh_bsdf_type", "mesh_texture_index"):
            host[k] = global_host[k]
        per_part_host.append(host)

    bvhs = [build_bvh(h["v0"], h["v1"], h["v2"]) for h in per_part_host]
    tri_cap = max(max((h["v0"].shape[0] for h in per_part_host), default=1), 1)
    node_cap = max(max((b.num_nodes for b in bvhs), default=1), 1)

    from .clusters import build_clusters

    cluster_cap = max(
        max((build_clusters(b).aabb_min.shape[0] for b in bvhs), default=1), 1
    )

    scenes = []
    aabb_min, aabb_max = [], []
    for host, bvh in zip(per_part_host, bvhs):
        ds = _pack_device_scene(
            host, bvh, node_capacity=node_cap, tri_capacity=tri_cap,
            cluster_capacity=cluster_cap, textures=textures,
        )
        ds = ds._replace(**mesh_tables)
        scenes.append(ds)
        if host["v0"].shape[0] > 0:
            lo = np.minimum(np.minimum(host["v0"].min(0), host["v1"].min(0)), host["v2"].min(0))
            hi = np.maximum(np.maximum(host["v0"].max(0), host["v1"].max(0)), host["v2"].max(0))
        else:
            lo = np.full(3, np.inf, np.float32)
            hi = np.full(3, -np.inf, np.float32)
        aabb_min.append(lo)
        aabb_max.append(hi)

    # the transposed small-scene tables (cl_mt_table_t / cl_shade_table_t)
    # are sized to each partition's REAL triangle count — pad to the max
    # across partitions so the stacked pytree is rectangular (zero rows
    # have n = 0 -> rejected in-kernel)
    for field in ("cl_mt_table_t", "cl_shade_table_t"):
        tts = [getattr(s, field) for s in scenes]
        if not any(t is not None for t in tts):
            continue
        if any(t is None for t in tts):
            scenes = [s._replace(**{field: None}) for s in scenes]
        else:
            ct_max = max(t.shape[0] for t in tts)
            scenes = [
                s._replace(**{field: jnp.pad(
                    t, ((0, ct_max - t.shape[0]), (0, 0)))})
                for s, t in zip(scenes, tts)
            ]
    aabb_min = np.asarray(aabb_min, np.float32)
    aabb_max = np.asarray(aabb_max, np.float32)
    curve_sets = [None] * num_partitions
    if curves is not None:
        curve_sets, clo, chi = _split_curves(curves, aabb_min, aabb_max)
        scenes = [s._replace(curves=cs) for s, cs in zip(scenes, curve_sets)]
        # proxy AABBs must COVER the partition's curves or migrating rays
        # never route to the rank that owns the hit
        aabb_min = np.minimum(aabb_min, clo)
        aabb_max = np.maximum(aabb_max, chi)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *scenes)
    diag = np.linalg.norm(np.maximum(aabb_max - aabb_min, 0.0), axis=-1).astype(np.float32)
    vis_grid = None
    if visibility_grids:
        from .visibility_grid import build_conservative_grid

        W, H, A = grid_res
        grids = []
        for p, (host, lo, hi) in enumerate(zip(per_part_host, aabb_min, aabb_max)):
            cs = curve_sets[p]
            n_curve = 0 if cs is None else int(
                np.isfinite(np.asarray(cs.p0)).all(axis=1).sum())
            if (host["v0"].shape[0] == 0 and n_curve == 0) \
                    or not np.all(np.isfinite(lo)):
                grids.append(np.zeros((6, H, W, A), bool))
                continue
            tmin = np.minimum(np.minimum(host["v0"], host["v1"]), host["v2"])
            tmax = np.maximum(np.maximum(host["v0"], host["v1"]), host["v2"])
            if n_curve:
                # curve pieces are content too — their swept-sphere boxes
                # keep the grid conservative w.r.t. hair hits
                cp0 = np.asarray(cs.p0)[:n_curve]
                cp1 = np.asarray(cs.p1)[:n_curve]
                cr0 = np.asarray(cs.r0)[:n_curve, None]
                cr1 = np.asarray(cs.r1)[:n_curve, None]
                tmin = np.concatenate(
                    [tmin, np.minimum(cp0 - cr0, cp1 - cr1)], axis=0)
                tmax = np.concatenate(
                    [tmax, np.maximum(cp0 + cr0, cp1 + cr1)], axis=0)
            grids.append(build_conservative_grid(tmin, tmax, lo, hi, W, H, A))
        vis_grid = jnp.asarray(np.stack(grids, axis=0))
    proxies = ProxyTable(
        aabb_min=jnp.asarray(aabb_min),
        aabb_max=jnp.asarray(aabb_max),
        max_length=jnp.asarray(diag),
        vis_grid=vis_grid,
    )
    return PartitionedScene(stacked=stacked, proxies=proxies, num_partitions=num_partitions)


def build_partitioned_scene_instanced(
    meshes: Sequence[MeshGeometry],
    transforms,
    num_partitions: int,
    assignment: Optional[List[List[int]]] = None,
    visibility_grids: bool = False,
    grid_res: tuple = (16, 16, 16),
    tris_per_cluster: Optional[int] = None,
) -> PartitionedScene:
    """Distributed two-level instancing: INSTANCES (not meshes) are the unit
    of partition assignment, and every partition shares ONE set of base
    triangle tables — its row of the stacked scene carries only instance-
    level cluster boxes / transforms for the instances it owns, padded to a
    common instance capacity.  This is the TPU form of the reference's
    per-rank AS table holding instanced GAS handles plus remote proxies
    (/root/reference/src/render/renderer.cpp:1812-1849,
    optix/distributed_traversal_kernel.cu:174) — its production scenes
    (Moana, Bistro) are instance-heavy AND distributed at once.

    `transforms`: (I, 3, 4) obj_to_world affines over the shared base mesh
    list.  Migrating rays route through partition-level proxy AABBs (union
    of owned instance boxes) exactly as in the flat path; local traces run
    the instance-aware grouped cull (ops/pallas_resident.py).  With
    `visibility_grids=True` the conservative grid is rasterized from the
    partition's nonempty instance-CLUSTER world boxes (conservative w.r.t.
    the instanced triangles by containment)."""
    from .geometry import _instance_tables, device_scene_from_meshes

    M = np.asarray(transforms, np.float32)
    assert M.ndim == 3 and M.shape[1:] == (3, 4), "transforms: (I, 3, 4)"
    if assignment is None:
        assignment = partition_instances(meshes, M, num_partitions)
    assert len(assignment) == num_partitions
    icap = max(1, max((len(p) for p in assignment), default=1))
    if tris_per_cluster is None:
        # adaptive cluster width keys on the PER-PARTITION effective
        # triangle count (icap x base) — the K that any one device's
        # kernels actually compile against (device_scene_from_instances)
        eff = icap * sum(m.num_triangles for m in meshes)
        tris_per_cluster = (128 if eff <= 262144 else
                            512 if eff <= 8_388_608 else 2048)
    base = device_scene_from_meshes(meshes, tris_per_cluster=tris_per_cluster)

    ident = np.zeros((3, 4), np.float32)
    ident[:, :3] = np.eye(3, dtype=np.float32)
    scenes, aabb_min, aabb_max, grids = [], [], [], []
    W, H, A = grid_res
    for part in assignment:
        mp = (M[np.asarray(part, np.int64)].reshape(-1, 3, 4)
              if part else np.zeros((0, 3, 4), np.float32))
        pad = np.tile(ident[None], (icap - len(part), 1, 1))
        fields, (wmin, wmax, nonempty) = _instance_tables(
            base, np.concatenate([mp, pad], axis=0), n_valid=len(part))
        scenes.append(base._replace(**fields))
        if nonempty.any():
            lo = wmin[nonempty].min(0).astype(np.float32)
            hi = wmax[nonempty].max(0).astype(np.float32)
        else:
            lo = np.full(3, np.inf, np.float32)
            hi = np.full(3, -np.inf, np.float32)
        aabb_min.append(lo)
        aabb_max.append(hi)
        if visibility_grids:
            if nonempty.any():
                from .visibility_grid import build_conservative_grid

                grids.append(build_conservative_grid(
                    wmin[nonempty], wmax[nonempty], lo, hi, W, H, A))
            else:
                grids.append(np.zeros((6, H, W, A), bool))

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *scenes)
    aabb_min = np.asarray(aabb_min, np.float32)
    aabb_max = np.asarray(aabb_max, np.float32)
    diag = np.linalg.norm(
        np.maximum(aabb_max - aabb_min, 0.0), axis=-1).astype(np.float32)
    proxies = ProxyTable(
        aabb_min=jnp.asarray(aabb_min),
        aabb_max=jnp.asarray(aabb_max),
        max_length=jnp.asarray(diag),
        vis_grid=jnp.asarray(np.stack(grids, axis=0)) if visibility_grids else None,
    )

    # INSTANCE-level neural proxy rows: one row per instance, net selected
    # by obj_id (one shared base object -> 0), routed to the owning
    # partition, featurized in OBJECT space via world_to_obj (reference
    # instanceID semantics, optix/secondary_ray_kernel.cu:289-316).
    blo, bhi = _meshes_aabb(meshes)
    corners = np.stack([np.where(np.asarray(sel), bhi, blo)
                        for sel in np.ndindex(2, 2, 2)])      # (8, 3)
    wc = (np.einsum("iab,cb->ica", M[:, :, :3], corners)
          + M[:, None, :, 3])                                 # (I, 8, 3)
    inst_lo = wc.min(axis=1)
    inst_hi = wc.max(axis=1)
    inv_lin = np.linalg.inv(M[:, :, :3].astype(np.float64)).astype(np.float32)
    inv_tr = -np.einsum("iab,ib->ia", inv_lin, M[:, :, 3])
    w2o = np.concatenate([inv_lin, inv_tr[:, :, None]], axis=2)  # (I, 3, 4)
    owner = np.full(M.shape[0], 0, np.int32)
    for p, part in enumerate(assignment):
        for i in part:
            owner[i] = p
    nn_proxies = ProxyTable(
        aabb_min=jnp.asarray(inst_lo.astype(np.float32)),
        aabb_max=jnp.asarray(inst_hi.astype(np.float32)),
        # depth denormalizer = OBJECT-space diagonal (ProxyTable docstring)
        max_length=jnp.asarray(
            np.full(M.shape[0], np.linalg.norm(bhi - blo), np.float32)),
        obj_id=jnp.zeros((M.shape[0],), jnp.int32),
        node_id=jnp.asarray(owner),
        world_to_obj=jnp.asarray(w2o.astype(np.float32)),
        obj_min=jnp.asarray(np.broadcast_to(blo, (M.shape[0], 3)).copy()),
        obj_span=jnp.asarray(
            np.broadcast_to(bhi - blo, (M.shape[0], 3)).copy()),
    )
    return PartitionedScene(stacked=stacked, proxies=proxies,
                            num_partitions=num_partitions,
                            nn_proxies=nn_proxies)


def _meshes_aabb(meshes):
    los = np.array([m.aabb()[0] for m in meshes])
    his = np.array([m.aabb()[1] for m in meshes])
    return los.min(0).astype(np.float32), his.max(0).astype(np.float32)
