"""Scene geometry containers.

Host-side (`MeshGeometry`, numpy) and device-side (`DeviceScene`, jnp) scene
representations. `DeviceScene` is the TPU-native replacement for the
reference's per-mesh SBT records + GAS handles (record schema at
/root/reference/src/render/pipeline_helper.cpp:177-197, AS table at
/root/reference/src/render/renderer.cpp:1812-1849): triangles live in flat SoA
arrays reordered by the BVH build, and per-triangle shading attributes are
pre-gathered so the device never chases normal/texcoord index buffers.

`ProxyTable` is the global table of remote-partition proxy AABBs — the
TPU equivalent of the reference's `aabbHandle` + `AABBInfo` per AS entry.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..core.types import BSDF_DIFFUSE
from .bvh import FlatBVH, build_bvh


# cluster-group fan-out of the two-level in-kernel cull (pallas_resident)
CL_GROUP = 8
# scenes with at most this many valid triangles (across all clusters) get
# the pack-time transposed MT table (cl_mt_table_t) and take the dense
# transposed kernel (ops/pallas_resident.py _kernel_tiny_t) — the measured
# break-even vs the culled selection kernels is ~512 on camera wavefronts
TINY_T_ROWS = 512


@dataclass
class MeshGeometry:
    """One logical object: triangle soup + per-mesh material."""

    v0: np.ndarray  # (T,3) f32
    v1: np.ndarray
    v2: np.ndarray
    # Per-corner shading normals; default = geometric normal.
    n0: Optional[np.ndarray] = None
    n1: Optional[np.ndarray] = None
    n2: Optional[np.ndarray] = None
    uv0: Optional[np.ndarray] = None  # (T,2)
    uv1: Optional[np.ndarray] = None
    uv2: Optional[np.ndarray] = None
    base_color: tuple = (0.8, 0.8, 0.8)
    bsdf_type: int = BSDF_DIFFUSE
    texture_index: int = -1
    name: str = ""

    def __post_init__(self):
        t = self.v0.shape[0]
        if self.n0 is None:
            gn = np.cross(self.v1 - self.v0, self.v2 - self.v0)
            norm = np.linalg.norm(gn, axis=-1, keepdims=True)
            gn = gn / np.maximum(norm, 1e-12)
            self.n0 = self.n1 = self.n2 = gn.astype(np.float32)
        if self.uv0 is None:
            self.uv0 = np.zeros((t, 2), np.float32)
            self.uv1 = np.zeros((t, 2), np.float32)
            self.uv2 = np.zeros((t, 2), np.float32)

    @property
    def num_triangles(self) -> int:
        return self.v0.shape[0]

    def aabb(self):
        lo = np.minimum(np.minimum(self.v0.min(0), self.v1.min(0)), self.v2.min(0))
        hi = np.maximum(np.maximum(self.v0.max(0), self.v1.max(0)), self.v2.max(0))
        return lo.astype(np.float32), hi.astype(np.float32)


def concat_geometry(meshes: list) -> dict:
    """Concatenate meshes into flat numpy SoA + per-tri mesh ids + material
    tables. Returns a dict of host arrays."""
    if not meshes:
        z3 = np.zeros((0, 3), np.float32)
        z2 = np.zeros((0, 2), np.float32)
        return dict(
            v0=z3, v1=z3, v2=z3, n0=z3, n1=z3, n2=z3, uv0=z2, uv1=z2, uv2=z2,
            tri_mesh_id=np.zeros((0,), np.int32),
            mesh_base_color=np.zeros((0, 3), np.float32),
            mesh_bsdf_type=np.zeros((0,), np.int32),
            mesh_texture_index=np.full((0,), -1, np.int32),
        )
    parts = {k: [] for k in ("v0", "v1", "v2", "n0", "n1", "n2", "uv0", "uv1", "uv2")}
    tri_mesh_id = []
    for mi, m in enumerate(meshes):
        for k in parts:
            parts[k].append(getattr(m, k))
        tri_mesh_id.append(np.full((m.num_triangles,), mi, np.int32))
    out = {k: np.concatenate(v, axis=0).astype(np.float32) for k, v in parts.items()}
    out["tri_mesh_id"] = np.concatenate(tri_mesh_id)
    out["mesh_base_color"] = np.asarray([m.base_color for m in meshes], np.float32)
    out["mesh_bsdf_type"] = np.asarray([m.bsdf_type for m in meshes], np.int32)
    out["mesh_texture_index"] = np.asarray([m.texture_index for m in meshes], np.int32)
    return out


class ProxyTable(NamedTuple):
    """Global proxy-AABB table, replicated on every device. Row p describes
    partition p (TPU equivalent of `AccelerationStructure::{aabbHandle,
    AABBInfo, nodeID}`, /root/reference/src/render/renderer.cpp:1812-1842).

    INSTANCING (optional, reference instanceID semantics,
    /root/reference/optix/secondary_ray_kernel.cu:289-316): when
    `world_to_obj` is set, each row is an INSTANCE of an object — the proxy
    march transforms hits to object space for the NN features, selects the
    net by `obj_id`, routes to `node_id`, and emits the world/object depth
    scale `t_ratio` that the prediction-consumption stage multiplies into
    `maxLength * depth` (frame_buffer_update.cu:222-257 parity).
    `max_length` is then the OBJECT-space diagonal."""

    aabb_min: jnp.ndarray    # (P, 3) f32 world-space AABB
    aabb_max: jnp.ndarray    # (P, 3) f32
    max_length: jnp.ndarray  # (P,)   f32  AABB diagonal, depth denormalizer
    # --- instancing extension (all None = row == object == partition) ---
    obj_id: jnp.ndarray = None       # (P,) i32 net/object index
    node_id: jnp.ndarray = None      # (P,) i32 owning partition
    world_to_obj: jnp.ndarray = None  # (P, 3, 4) f32 affine world -> object
    obj_min: jnp.ndarray = None      # (P, 3) f32 object-space AABB min
    obj_span: jnp.ndarray = None     # (P, 3) f32 object-space AABB extent
    # conservative binary visibility grids (the non-neural cross-partition
    # culling fallback, scene/visibility_grid.py::build_conservative_grid;
    # reference role /root/reference/src/cuda/bvh_intersection.cu:234-310)
    vis_grid: jnp.ndarray = None     # (P, 6, H, W, A) bool

    @property
    def num_partitions(self) -> int:
        return self.aabb_min.shape[0]

    @property
    def instanced(self) -> bool:
        return self.world_to_obj is not None


class DeviceScene(NamedTuple):
    """One partition's device-resident geometry + flattened BVH + materials.

    Triangle arrays are reordered by the BVH build and padded to a static
    capacity (`tri_valid` masks padding); under shard_map every device holds
    one row of a (P, ...) stacked version of this structure."""

    # BVH (threaded layout; see scene/bvh.py)
    node_min: jnp.ndarray   # (M,3) f32
    node_max: jnp.ndarray   # (M,3) f32
    node_first: jnp.ndarray  # (M,) i32
    node_count: jnp.ndarray  # (M,) i32
    node_skip: jnp.ndarray  # (M,) i32
    # Triangles (BVH order)
    v0: jnp.ndarray  # (T,3)
    v1: jnp.ndarray
    v2: jnp.ndarray
    n0: jnp.ndarray
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray  # (T,2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    tri_mesh_id: jnp.ndarray  # (T,) i32
    tri_valid: jnp.ndarray    # (T,) bool (False = padding)
    # Material tables (small, replicated)
    mesh_base_color: jnp.ndarray     # (Mm,3) f32
    mesh_bsdf_type: jnp.ndarray      # (Mm,) i32
    mesh_texture_index: jnp.ndarray  # (Mm,) i32
    # Cluster decomposition for the TPU tracer (scene/clusters.py):
    # cluster-major triangle data packed component-planar so tracers stream
    # contiguous (C,)-wide tiles with zero gathers. Row k of cl_tri_table is
    # [v0x(C) v0y v0z v1x v1y v1z v2x v2y v2z tmap(C)] (tmap as f32; canonical
    # triangle ids < 2^24 are exact).
    cl_aabb_min: jnp.ndarray   # (K,3) f32
    cl_aabb_max: jnp.ndarray   # (K,3) f32
    cl_count: jnp.ndarray      # (K,) i32 valid tris per cluster
    cl_tri_table: jnp.ndarray  # (K, 10*C) f32
    cl_tri_map: jnp.ndarray    # (K*C,) i32 -> canonical tri index (-1 pad)
    # Woop-transform table for the MXU triangle test (ops/pallas_tracer.py):
    # row k reshapes to (4, 4*C); [o,1] @ it -> [o'x o'y o'z tmap] and
    # [d,0] @ it -> [d'x d'y d'z 0], the ray in each triangle's unit space
    # (t = -o'z/d'z, u = o'x + t d'x, v = o'y + t d'y).
    cl_woop_table: jnp.ndarray = None  # (K, 4*4*C) f32
    # Precomputed derived tables for ops/pallas_resident.py — the per-call
    # XLA prologue hoisted to build time (entry-op/launch count dominates
    # this backend, see CLAUDE.md). cl_mt_table rows per cluster: v0 xyz,
    # e1 xyz, e2 xyz, n = e1 x e2 xyz (padding tris all-zero -> n = 0 ->
    # rejected in-kernel), row 12 = canonical triangle index as f32 (-1 on
    # padding lanes; exact below 2^24), rows 13..15 zero (sublane-8-aligned
    # HBM DMA slices). cl_boxes rows: minx..z, maxx..z, nonempty flag,
    # pad — non-finite (empty-cluster) entries zeroed. scene_aabb is the
    # union AABB over non-empty clusters.
    cl_mt_table: jnp.ndarray = None   # (K, 16, C) f32
    cl_boxes: jnp.ndarray = None      # (8, K) f32
    scene_aabb: jnp.ndarray = None    # (2, 3) f32
    # TRANSPOSED MT table for small scenes (<= TINY_T_ROWS valid triangles
    # total): the same 16 component rows as cl_mt_table but per-TRIANGLE
    # rows / per-component columns, cluster-major with padding lanes
    # dropped, 8-padded.  Feeds the row-major dense transposed kernels
    # (ops/pallas_resident.py _kernel_tiny_t): triangles ride the sublane
    # dim so a 36-triangle cornell pays for 40 MT rows, not 128 padded
    # lanes.  Pack-time (an in-call transpose would add an entry op per
    # trace — launch count dominates this backend, CLAUDE.md).
    cl_mt_table_t: jnp.ndarray = None  # (CT8, 16) f32, small scenes only
    # matching transposed copy of cl_shade_table (same row order as
    # cl_mt_table_t) — the frame megakernel's small-scene path fetches ALL
    # winner attributes with one one-hot MXU matmul against it
    cl_shade_table_t: jnp.ndarray = None  # (CT8, 24) f32, small scenes only
    # Two-level cull tables (ops/pallas_resident.py grouped dispatch):
    # clusters are grouped CL_GROUP (=8) SAH-consecutive at a time, so the
    # in-kernel per-ray exact cull runs at (TM, Kg) instead of (TM, K) —
    # ~8x less cull work — and each selected group refines its members with
    # one (G, TM) slab test.  cl_gboxes rows mirror cl_boxes at group
    # granularity; cl_mboxes[g, m] = [minx..z, maxx..z, count, pad] of
    # member m (zero/empty members carry count 0).
    cl_gboxes: jnp.ndarray = None     # (8, Kg) f32
    cl_mboxes: jnp.ndarray = None     # (Kg, G, 8) f32
    # Wide per-triangle attribute rows (BVH order, same index space as v0).
    # Launch count dominates this backend: a dozen narrow XLA gathers per
    # shading stage (n0/n1/n2/uv/material hops) each pay an entry-op launch,
    # so shading reads ONE row per ray instead (scripts/diag_frame_hlo.py:
    # 122 gather custom-calls per 4-bounce frame before this).
    # tri_verts row: v0 xyz, v1 xyz, v2 xyz, pad3.
    # tri_shade row: n0 xyz (0:3), n1 (3:6), n2 (6:9), uv0 (9:11), uv1
    # (11:13), uv2 (13:15), albedo rgb (15:18), bsdf_type (18),
    # texture_index (19, -1 on padding rows), mesh_id (20), pad (21:24) —
    # mesh-level attributes pre-flattened per triangle.
    tri_verts: jnp.ndarray = None     # (T, 12) f32
    tri_shade: jnp.ndarray = None     # (T, 24) f32
    # Cluster-major component-planar copy of tri_shade (same row layout,
    # same tri_map lane order as cl_mt_table) — streamed by the frame
    # megakernel's winner-attribute fetch (ops/pallas_frame.py).
    cl_shade_table: jnp.ndarray = None  # (K, 24, C) f32
    # Packed native-resolution albedo textures (scene/textures.py
    # PackedTextures pytree); indexed by mesh_texture_index. Empty pool when
    # the scene is untextured.
    albedo_textures: object = None
    # Round cubic-B-spline curve primitives (scene/curves.py CurveSet
    # pytree, None when the scene has no hair/curve geometry).  Composited
    # with the triangle closest hit / occlusion in ops/trace_api.py — the
    # counterpart of the reference enabling OptiX's ROUND_CUBIC_BSPLINE
    # intersector in its pipelines (pipeline_helper.cpp:57,116).
    curves: object = None
    # Two-level instancing (the reference's instanced GASes,
    # optixGetInstanceIndex / distributed_traversal_kernel.cu:174): the
    # cluster arrays (cl_boxes/cl_aabb_*/cl_tri_map) are INSTANCE-level
    # (K = I * KB rows) while the triangle tables (cl_mt_table,
    # cl_shade_table, tri_verts, v0..) stay at BASE level (KB clusters,
    # shared across instances — N instances of a mesh cost one table).
    # cl_xf[i, 0, :] lanes: 0-8 world_to_obj linear (row-major), 9-11
    # translation, 12 pad, 13 instance id, 14-15 pad — ONE row per
    # INSTANCE (kernels derive instance = cid // KB, base = rem(cid, KB)).
    # Tracers transform the ray per visited cluster with the UNNORMALIZED
    # object-space direction, so the object-space MT t is the world-space
    # t exactly (ops/pallas_resident.py _xform_visit).
    cl_xf: jnp.ndarray = None         # (I, 1, 16) f32

    @property
    def instanced(self) -> bool:
        return self.cl_xf is not None

    @property
    def num_base_tris(self) -> int:
        """Virtual-triangle-id stride: instanced hit ids are
        instance * num_base_tris + base canonical id."""
        return self.v0.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.v0.shape[0]

    @property
    def num_clusters(self) -> int:
        return self.cl_aabb_min.shape[0]

    @property
    def tris_per_cluster(self) -> int:
        return self.cl_tri_table.shape[1] // 10


def device_scene_from_meshes(
    meshes: list,
    node_capacity: Optional[int] = None,
    tri_capacity: Optional[int] = None,
    tris_per_cluster: Optional[int] = None,
    cluster_capacity: Optional[int] = None,
    textures: Optional[list] = None,
    curves=None,
) -> DeviceScene:
    """Build a single-partition DeviceScene (BVH + reordered triangles).

    tris_per_cluster=None scales the cluster size with the scene: big
    scenes pay per-CLUSTER costs (cull, selection, rekeys) proportional to
    K, so wider clusters win there even though each visit tests more lanes
    (measured at 1M tris: sorted-incoherent 103 ms @128 -> 62 ms @512,
    camera 7.5 -> 6.7-7.3 ms; at 64k tris 128 is best — sweep_resident)."""
    host = concat_geometry(meshes)
    if tris_per_cluster is None:
        t_n = host["v0"].shape[0]
        # >8M unique tris: K ~ 100k cluster tables exceed Mosaic compile
        # limits (see device_scene_from_instances) — widen again
        tris_per_cluster = (128 if t_n <= 262144 else
                            512 if t_n <= 8_388_608 else 2048)
    bvh = build_bvh(host["v0"], host["v1"], host["v2"])
    return _pack_device_scene(
        host, bvh, node_capacity, tri_capacity,
        tris_per_cluster=tris_per_cluster, cluster_capacity=cluster_capacity,
        textures=textures, curves=curves,
    )


def device_scene_from_instances(
    meshes: list,
    transforms,
    tris_per_cluster: Optional[int] = None,
) -> DeviceScene:
    """Instanced scene: I copies of the base mesh list, each placed by a
    (3, 4) obj_to_world affine.  The triangle tables are built ONCE over
    the base geometry; per instance only the cluster AABBs, the tri-map
    tile and a 16-float affine row are added — N instances of a mesh cost
    one table (reference capability: instanced GASes + per-instance
    transforms, /root/reference/src/render/renderer.cpp:1726-1796,
    distributed_traversal_kernel.cu:174).

    transforms: (I, 3, 4) float obj_to_world (rows [R | t]); must be
    invertible (the builder stores the inverse for the tracers)."""
    if tris_per_cluster is None:
        # per-CLUSTER costs scale with K = instances x base clusters, so
        # the adaptive cluster-size rule must look at EFFECTIVE triangles.
        # Beyond ~8M the K ~ 100k cluster tables exceed Mosaic compile
        # limits (measured: K=95168 fails to compile flat AND grouped;
        # K=24768 at c=2048 compiles + runs) — widen clusters again.
        eff = len(np.asarray(transforms)) * sum(m.num_triangles for m in meshes)
        tris_per_cluster = (128 if eff <= 262144 else
                            512 if eff <= 8_388_608 else 2048)
    base = device_scene_from_meshes(meshes, tris_per_cluster=tris_per_cluster)
    fields, _aux = _instance_tables(base, transforms)
    return base._replace(**fields)


def _instance_tables(base: DeviceScene, transforms, n_valid: Optional[int] = None):
    """Instance-level cluster/group tables over a shared base DeviceScene.

    Returns (fields, aux): `fields` is the dict of DeviceScene replacements
    (what `device_scene_from_instances` applies); `aux` carries host numpy
    (wmin, wmax, nonempty) of the (I*KB,) instance-cluster world boxes for
    partition-AABB / visibility-grid construction.  `n_valid` < I marks the
    trailing instances EMPTY (all cluster boxes non-entered, counts 0) —
    the padding rows that make per-partition instance tables rectangular
    across a stacked distributed scene (scene/partition.py)."""
    M = np.asarray(transforms, np.float32)
    assert M.ndim == 3 and M.shape[1:] == (3, 4), "transforms: (I, 3, 4)"
    ni = M.shape[0]
    if n_valid is None:
        n_valid = ni
    kb = base.num_clusters
    c = base.tris_per_cluster
    k = ni * kb

    # world_to_obj inverses
    inv_lin = np.linalg.inv(M[:, :, :3])                     # (I, 3, 3)
    inv_tr = -np.einsum("iab,ib->ia", inv_lin, M[:, :, 3])   # (I, 3)

    # world-space cluster AABBs: transform the 8 corners of each base box
    bmin = np.asarray(base.cl_aabb_min)                      # (KB, 3)
    bmax = np.asarray(base.cl_aabb_max)
    corners = np.stack([
        np.where(np.asarray(sel)[None, :], bmax, bmin)
        for sel in np.ndindex(2, 2, 2)], axis=1)             # (KB, 8, 3)
    wc = (np.einsum("iab,kcb->ikca", M[:, :, :3], corners)
          + M[:, None, None, :, 3])                          # (I, KB, 8, 3)
    finite = np.isfinite(bmin).all(axis=1) & np.isfinite(bmax).all(axis=1)
    wmin = wc.min(axis=2).reshape(k, 3)
    wmax = wc.max(axis=2).reshape(k, 3)
    valid_inst = np.repeat(np.arange(ni) < n_valid, kb)
    count = np.where(valid_inst, np.tile(np.asarray(base.cl_count), ni), 0)
    nonempty = (count > 0) & np.tile(finite, ni) & valid_inst
    wmin = np.where(nonempty[:, None], wmin, 0.0)
    wmax = np.where(nonempty[:, None], wmax, 0.0)
    cl_boxes = np.concatenate(
        [wmin.T, wmax.T, nonempty.astype(np.float32)[None, :],
         np.zeros((1, k), np.float32)], axis=0)              # (8, K)

    # per-INSTANCE transform rows (kernels derive instance = cid // KB and
    # base cluster = rem(cid, KB) — keeping xf at I rows instead of K keeps
    # its VMEM residency negligible at any instance-cluster count)
    xf = np.zeros((ni, 1, 16), np.float32)
    for i in range(ni):
        xf[i, 0, 0:9] = inv_lin[i].reshape(9)
        xf[i, 0, 9:12] = inv_tr[i]
        xf[i, 0, 13] = np.float32(i)

    scene_lo = wmin[nonempty].min(axis=0) if nonempty.any() else np.zeros(3)
    scene_hi = wmax[nonempty].max(axis=0) if nonempty.any() else np.ones(3)

    tri_map = np.tile(np.asarray(base.cl_tri_map).reshape(kb, c), (ni, 1))

    # two-level group tables for the grouped cull (CL_GROUP base clusters
    # per group, PER INSTANCE over the base SAH order — spatially tight).
    # mboxes[g][0, 7] = the group's first member's instance-cluster id
    # (cid0; members are cid0..cid0+G-1); the kernels derive the BASE table
    # group as rem(cid0, KB) // G (see _grouped_recull_loop docstring).
    g = CL_GROUP
    gbb = -(-kb // g)
    kgi = ni * gbb
    kbp = gbb * g
    w3min = np.zeros((ni, kbp, 3), np.float32)
    w3max = np.zeros((ni, kbp, 3), np.float32)
    okm = np.zeros((ni, kbp), bool)
    w3min[:, :kb] = wmin.reshape(ni, kb, 3)
    w3max[:, :kb] = wmax.reshape(ni, kb, 3)
    okm[:, :kb] = nonempty.reshape(ni, kb)
    mboxes = np.zeros((kgi, g, 8), np.float32)
    mboxes[..., 0:3] = w3min.reshape(kgi, g, 3)
    mboxes[..., 3:6] = w3max.reshape(kgi, g, 3)
    mboxes[..., 6] = okm.reshape(kgi, g)
    cid0 = (np.arange(ni)[:, None] * kb
            + np.arange(gbb)[None, :] * g).reshape(kgi)
    mboxes[:, 0, 7] = cid0.astype(np.float32)
    okg = okm.reshape(kgi, g)
    big = np.float32(3.4e38)
    gmin = np.where(okg[..., None], w3min.reshape(kgi, g, 3), big).min(axis=1)
    gmax = np.where(okg[..., None], w3max.reshape(kgi, g, 3), -big).max(axis=1)
    g_any = okg.any(axis=1)
    gmin = np.where(g_any[:, None], gmin, 0.0)
    gmax = np.where(g_any[:, None], gmax, 0.0)
    gboxes = np.concatenate(
        [gmin.T, gmax.T, g_any.astype(np.float32)[None],
         np.zeros((1, kgi), np.float32)], axis=0).astype(np.float32)

    fields = dict(
        cl_aabb_min=jnp.asarray(wmin),
        cl_aabb_max=jnp.asarray(wmax),
        cl_count=jnp.asarray(count),
        cl_tri_map=jnp.asarray(tri_map.reshape(k * c)),
        cl_boxes=jnp.asarray(cl_boxes),
        scene_aabb=jnp.asarray(
            np.stack([scene_lo, scene_hi]).astype(np.float32)),
        cl_xf=jnp.asarray(xf),
        # instance-aware paths only: the transposed/tiny fast paths and
        # the frame megakernel gate off these tables; the grouped cull is
        # instance-aware (per-instance base-order groups above)
        cl_mt_table_t=None,
        cl_shade_table_t=None,
        cl_gboxes=jnp.asarray(gboxes),
        cl_mboxes=jnp.asarray(mboxes),
    )
    return fields, (wmin, wmax, nonempty)


def _pack_device_scene(host: dict, bvh: FlatBVH, node_capacity=None, tri_capacity=None,
                       tris_per_cluster: int = 128, cluster_capacity=None,
                       textures=None, curves=None) -> DeviceScene:
    from .textures import build_textures
    atlas = build_textures(textures or [])
    order = bvh.tri_order
    t = order.shape[0]
    tc = tri_capacity or max(t, 1)
    nc = node_capacity or bvh.num_nodes

    def pad_tri(a, fill=0.0):
        a = a[order]
        if a.shape[0] < tc:
            pad_shape = (tc - a.shape[0],) + a.shape[1:]
            a = np.concatenate([a, np.full(pad_shape, fill, a.dtype)], axis=0)
        return jnp.asarray(a)

    def pad_node(a, fill):
        if a.shape[0] < nc:
            pad_shape = (nc - a.shape[0],) + a.shape[1:]
            a = np.concatenate([a, np.full(pad_shape, fill, a.dtype)], axis=0)
        return jnp.asarray(a)

    tri_valid = np.zeros((tc,), bool)
    tri_valid[:t] = True

    # cluster decomposition (cluster-major padded copies for the TPU tracer)
    from .clusters import build_clusters

    clusters = build_clusters(bvh, max_tris=tris_per_cluster)
    kc = cluster_capacity or max(clusters.aabb_min.shape[0], 1)
    c = clusters.tris_per_cluster
    k0 = clusters.aabb_min.shape[0]
    assert k0 <= kc, f"cluster count {k0} exceeds capacity {kc}"

    inf = np.float32(np.inf)
    cl_min = np.full((kc, 3), inf, np.float32)
    cl_max = np.full((kc, 3), -inf, np.float32)
    cl_cnt = np.zeros((kc,), np.int32)
    cl_min[:k0] = clusters.aabb_min
    cl_max[:k0] = clusters.aabb_max
    cl_cnt[:k0] = clusters.count
    tri_map = np.full((kc * c,), -1, np.int32)
    tri_map[: k0 * c] = clusters.tri_map

    # wide per-triangle attribute rows (see DeviceScene docstring): one
    # (N,12)/(N,24) gather per shading stage replaces ~10 narrow gathers +
    # mesh-table hops, each of which is a separate entry-op launch.
    tri_verts = np.zeros((tc, 12), np.float32)
    tri_shade = np.zeros((tc, 24), np.float32)
    tri_shade[:, 19] = -1.0  # texture_index: pad rows fetch no texture
    if t > 0:
        oa = {k: host[k][order]
              for k in ("v0", "v1", "v2", "n0", "n1", "n2", "uv0", "uv1", "uv2")}
        omesh = host["tri_mesh_id"][order]
        tri_verts[:t, 0:3] = oa["v0"]
        tri_verts[:t, 3:6] = oa["v1"]
        tri_verts[:t, 6:9] = oa["v2"]
        tri_shade[:t, 0:3] = oa["n0"]
        tri_shade[:t, 3:6] = oa["n1"]
        tri_shade[:t, 6:9] = oa["n2"]
        tri_shade[:t, 9:11] = oa["uv0"]
        tri_shade[:t, 11:13] = oa["uv1"]
        tri_shade[:t, 13:15] = oa["uv2"]
        tri_shade[:t, 15:18] = host["mesh_base_color"][omesh]
        tri_shade[:t, 18] = host["mesh_bsdf_type"][omesh]
        tri_shade[:t, 19] = host["mesh_texture_index"][omesh]
        tri_shade[:t, 20] = omesh

    # component-planar cluster-major tri table (see DeviceScene docstring)
    ordered = {k: host[k][order] for k in ("v0", "v1", "v2")}
    safe = np.maximum(tri_map, 0)
    table = np.zeros((kc, 10, c), np.float32)
    if order.shape[0] > 0:
        for vi, key in enumerate(("v0", "v1", "v2")):
            a = ordered[key][safe]         # (kc*c, 3)
            a[tri_map < 0] = 0.0
            table[:, vi * 3 : vi * 3 + 3, :] = (
                a.reshape(kc, c, 3).transpose(0, 2, 1)
            )
    table[:, 9, :] = tri_map.reshape(kc, c).astype(np.float32)

    # Woop transform table: per tri, M = [e1 e2 n]^-1 (n = e1 x e2),
    # b = -M v0; degenerate tris keep zero rows and tmap = -1.
    # Compact (4, 4C) layout: blocks 0..2 hold [M row | b] per unit-space
    # component, block 3 holds tmap on the '1' row. One table serves both
    # o' = [o,1] @ W and d' = [d,0] @ W (the b row multiplies 0 for d').
    woop = np.zeros((kc, 4, 4, c), np.float32)
    woop[:, 3, 3, :] = tri_map.reshape(kc, c).astype(np.float32)
    if order.shape[0] > 0:
        va = ordered["v0"][safe].reshape(kc, c, 3)
        vb = ordered["v1"][safe].reshape(kc, c, 3)
        vc_ = ordered["v2"][safe].reshape(kc, c, 3)
        e1 = vb - va
        e2 = vc_ - va
        nrm = np.cross(e1, e2)
        t_mat = np.stack([e1, e2, nrm], axis=-1)  # (kc, c, 3, 3) columns e1,e2,n
        det = np.linalg.det(t_mat)
        good = (np.abs(det) > 1e-20) & (tri_map.reshape(kc, c) >= 0)
        t_safe = np.where(good[..., None, None], t_mat, np.eye(3, dtype=np.float32))
        m = np.linalg.inv(t_safe).astype(np.float32)          # (kc, c, 3, 3)
        b = -np.einsum("kcij,kcj->kci", m, va).astype(np.float32)
        m = np.where(good[..., None, None], m, 0.0)
        b = np.where(good[..., None], b, 0.0)
        for oc in range(3):
            woop[:, 0:3, oc, :] = m[:, :, oc, :].transpose(0, 2, 1)
            woop[:, 3, oc, :] = b[:, :, oc]
        woop[:, 3, 3, :] = np.where(good, woop[:, 3, 3, :], -1.0)

    # derived MT table + planar box table (see DeviceScene docstring) —
    # built from `table` itself so semantics are bit-identical to the
    # in-call build they replace (pallas_resident.py)
    v0t = table[:, 0:3, :]
    e1t = table[:, 3:6, :] - v0t
    e2t = table[:, 6:9, :] - v0t
    mt_table = np.concatenate(
        [v0t, e1t, e2t, np.cross(e1t, e2t, axis=1),
         tri_map.reshape(kc, 1, c).astype(np.float32),       # row 12: canon
         np.zeros((kc, 3, c), np.float32)], axis=1           # rows 13..15 pad
    ).astype(np.float32)                                     # (kc, 16, c)
    boxes = np.concatenate(
        [cl_min.T, cl_max.T,
         (cl_cnt > 0).astype(np.float32)[None, :],
         np.zeros((1, kc), np.float32)],
        axis=0,
    )
    boxes = np.where(np.isfinite(boxes), boxes, 0.0).astype(np.float32)
    # transposed MT table (small scenes, <= TINY_T_ROWS valid triangles
    # across ALL clusters): per-triangle rows in cluster-major order with
    # padding lanes dropped, 8-padded (zero rows have n = 0 -> rejected).
    # Measured win region of the dense transposed kernel vs the culled
    # selection kernels on a 64k camera wavefront (scripts history): 6.8x
    # at 128 tris, 3.1x at 256, 1.4x at 512.
    mt_table_t = None
    shade_table_t = None
    total_valid = int((tri_map >= 0).sum())
    if total_valid <= TINY_T_ROWS:
        ct8 = max(8, int(-(-max(total_valid, 1) // 8) * 8))

        def t_rows(planar, width):
            rows = planar.transpose(0, 2, 1).reshape(kc * c, width)
            rows = rows[tri_map >= 0]                        # (valid, width)
            return np.ascontiguousarray(np.pad(
                rows, ((0, ct8 - rows.shape[0]), (0, 0)))).astype(np.float32)

        mt_table_t = t_rows(mt_table, 16)
    # cluster-major shade table: tri_shade rows in tri_map lane order
    # (padding lanes zero; their mt rows have n = 0 so they can never win)
    shade_cl = tri_shade[safe].reshape(kc, c, 24).transpose(0, 2, 1).copy()
    shade_cl[np.broadcast_to((tri_map < 0).reshape(kc, 1, c), shade_cl.shape)] = 0.0
    if mt_table_t is not None:
        shade_table_t = t_rows(shade_cl, 24)                 # (CT8, 24)
    # group tables for the two-level cull (CL_GROUP SAH-consecutive
    # clusters per group; K padded to a full final group with empty boxes)
    kgc = -(-kc // CL_GROUP)
    bpad = np.zeros((8, kgc * CL_GROUP), np.float32)
    bpad[:, :kc] = boxes
    b3 = bpad.reshape(8, kgc, CL_GROUP)                      # (8, Kg, G)
    m_ok = b3[6] > 0.0                                       # (Kg, G)
    big = np.float32(3.4e38)
    gmin = np.where(m_ok[None], b3[0:3], big).min(axis=2)    # (3, Kg)
    gmax = np.where(m_ok[None], b3[3:6], -big).max(axis=2)
    g_any = m_ok.any(axis=1)
    gmin = np.where(g_any[None], gmin, 0.0)
    gmax = np.where(g_any[None], gmax, 0.0)
    gboxes = np.concatenate(
        [gmin, gmax, g_any.astype(np.float32)[None],
         np.zeros((1, kgc), np.float32)], axis=0).astype(np.float32)
    mboxes = b3.transpose(1, 2, 0).astype(np.float32).copy()  # (Kg, G, 8)

    nonempty = cl_cnt > 0
    if nonempty.any():
        s_lo = cl_min[nonempty].min(axis=0)
        s_hi = cl_max[nonempty].max(axis=0)
    else:
        s_lo = np.zeros((3,), np.float32)
        s_hi = np.zeros((3,), np.float32)
    scene_aabb = np.stack([s_lo, s_hi]).astype(np.float32)

    return DeviceScene(
        node_min=pad_node(bvh.bounds_min, inf),
        node_max=pad_node(bvh.bounds_max, -inf),
        node_first=pad_node(bvh.first, 0),
        node_count=pad_node(bvh.count, 0),
        node_skip=pad_node(bvh.skip, -1),
        v0=pad_tri(host["v0"]),
        v1=pad_tri(host["v1"]),
        v2=pad_tri(host["v2"]),
        n0=pad_tri(host["n0"]),
        n1=pad_tri(host["n1"]),
        n2=pad_tri(host["n2"]),
        uv0=pad_tri(host["uv0"]),
        uv1=pad_tri(host["uv1"]),
        uv2=pad_tri(host["uv2"]),
        tri_mesh_id=pad_tri(host["tri_mesh_id"], 0),
        tri_valid=jnp.asarray(tri_valid),
        mesh_base_color=jnp.asarray(host["mesh_base_color"]),
        mesh_bsdf_type=jnp.asarray(host["mesh_bsdf_type"]),
        mesh_texture_index=jnp.asarray(host["mesh_texture_index"]),
        cl_aabb_min=jnp.asarray(cl_min),
        cl_aabb_max=jnp.asarray(cl_max),
        cl_count=jnp.asarray(cl_cnt),
        cl_tri_table=jnp.asarray(table.reshape(kc, 10 * c)),
        cl_tri_map=jnp.asarray(tri_map),
        cl_woop_table=jnp.asarray(woop.reshape(kc, 4 * 4 * c)),
        # stored 3-D: a (K, 16*C) layout differs physically under the
        # (8, 128) tiling, so the kernels' reshape(k, 16, c) materialized a
        # full-table copy custom-call on EVERY trace/route launch
        cl_mt_table=jnp.asarray(mt_table.reshape(kc, 16, c)),
        cl_boxes=jnp.asarray(boxes),
        scene_aabb=jnp.asarray(scene_aabb),
        cl_mt_table_t=(None if mt_table_t is None
                       else jnp.asarray(mt_table_t)),
        cl_shade_table_t=(None if shade_table_t is None
                          else jnp.asarray(shade_table_t)),
        cl_gboxes=jnp.asarray(gboxes),
        cl_mboxes=jnp.asarray(mboxes),
        tri_verts=jnp.asarray(tri_verts),
        tri_shade=jnp.asarray(tri_shade),
        cl_shade_table=jnp.asarray(shade_cl.reshape(kc, 24, c)),  # 3-D (same
        # reshape-copy reasoning as cl_mt_table above)
        albedo_textures=atlas,
        curves=curves,
    )
