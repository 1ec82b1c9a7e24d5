"""Procedural test scenes.

The reference targets external assets (Moana/Bistro/San Miguel) that are not
in the snapshot; these generators provide deterministic stand-ins for tests,
golden images, and benchmarks (the `scanCPU`-style oracle role, SURVEY.md §4).
"""
from __future__ import annotations

import numpy as np

from ..core.types import BSDF_DIFFUSE, BSDF_WATER
from .geometry import MeshGeometry
from .lights import LightTable


def _quad(p00, p10, p11, p01):
    """Two triangles for a quad given CCW corners."""
    p00, p10, p11, p01 = (np.asarray(p, np.float32) for p in (p00, p10, p11, p01))
    v0 = np.stack([p00, p00])
    v1 = np.stack([p10, p11])
    v2 = np.stack([p11, p01])
    return v0, v1, v2


def _box(lo, hi):
    """12 triangles of an axis-aligned box with outward normals."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    quads = [
        # floor (y0, normal up... geometric normal from winding)
        ([x0, y0, z0], [x1, y0, z0], [x1, y0, z1], [x0, y0, z1]),
        # ceiling
        ([x0, y1, z0], [x0, y1, z1], [x1, y1, z1], [x1, y1, z0]),
        # -z
        ([x0, y0, z0], [x0, y1, z0], [x1, y1, z0], [x1, y0, z0]),
        # +z
        ([x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1]),
        # -x
        ([x0, y0, z0], [x0, y0, z1], [x0, y1, z1], [x0, y1, z0]),
        # +x
        ([x1, y0, z0], [x1, y1, z0], [x1, y1, z1], [x1, y0, z1]),
    ]
    v0s, v1s, v2s = [], [], []
    for q in quads:
        v0, v1, v2 = _quad(*q)
        v0s.append(v0)
        v1s.append(v1)
        v2s.append(v2)
    return np.concatenate(v0s), np.concatenate(v1s), np.concatenate(v2s)


def cornell_box(with_water_sphere: bool = False):
    """Cornell-box-scale scene: 5 walls, 2 boxes, 1 area light.

    Returns (meshes, light_table). World: x in [0,1], y in [0,1] up, z in [0,1];
    camera looks down -z from z≈2.4."""
    meshes = []

    def wall(p00, p10, p11, p01, color, name):
        v0, v1, v2 = _quad(p00, p10, p11, p01)
        meshes.append(MeshGeometry(v0=v0, v1=v1, v2=v2, base_color=color, name=name))

    white = (0.73, 0.73, 0.73)
    # floor (normal +y)
    wall([0, 0, 0], [0, 0, 1], [1, 0, 1], [1, 0, 0], white, "floor")
    # ceiling (normal -y)
    wall([0, 1, 0], [1, 1, 0], [1, 1, 1], [0, 1, 1], white, "ceiling")
    # back wall z=0 (normal +z)
    wall([0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], white, "back")
    # left wall x=0 (red, normal +x)
    wall([0, 0, 0], [0, 1, 0], [0, 1, 1], [0, 0, 1], (0.65, 0.05, 0.05), "left")
    # right wall x=1 (green, normal -x)
    wall([1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0], (0.12, 0.45, 0.15), "right")

    # short box
    v0, v1, v2 = _box([0.55, 0.0, 0.55], [0.85, 0.3, 0.85])
    meshes.append(MeshGeometry(v0=v0, v1=v1, v2=v2, base_color=white, name="short_box"))
    # tall box (water if requested, to exercise the dielectric BSDF path)
    v0, v1, v2 = _box([0.15, 0.0, 0.15], [0.45, 0.6, 0.45])
    meshes.append(
        MeshGeometry(
            v0=v0, v1=v1, v2=v2,
            base_color=(1.0, 1.0, 1.0) if with_water_sphere else white,
            bsdf_type=BSDF_WATER if with_water_sphere else BSDF_DIFFUSE,
            name="tall_box",
        )
    )

    # area light just under the ceiling
    light_tris = np.asarray(
        [
            [[0.35, 0.998, 0.35], [0.65, 0.998, 0.35], [0.65, 0.998, 0.65]],
            [[0.35, 0.998, 0.35], [0.65, 0.998, 0.65], [0.35, 0.998, 0.65]],
        ],
        np.float32,
    )
    radiance = np.asarray([[15.0, 15.0, 15.0]] * 2, np.float32)
    lights = LightTable.from_arrays(light_tris, radiance)
    return meshes, lights


def random_tri_soup(n: int, seed: int = 0, extent: float = 1.0, jitter: float = 0.08):
    """n random small triangles in [0, extent]^3 — BVH stress/benchmark scene."""
    rng = np.random.RandomState(seed)
    base = rng.rand(n, 3).astype(np.float32) * extent
    e1 = (rng.rand(n, 3).astype(np.float32) - 0.5) * jitter * extent
    e2 = (rng.rand(n, 3).astype(np.float32) - 0.5) * jitter * extent
    return MeshGeometry(v0=base, v1=base + e1, v2=base + e2, name=f"soup{n}")


def statue_mesh(res: int = 48, seed: int = 0, extent: float = 1.0):
    """CHEVAL_MARLY-class demo OBJECT for proxy training: a closed, smoothly
    displaced sphere (low-frequency lobes + mid-frequency ripple) whose
    visibility/depth field is learnable by the reference's 5-input MLPs —
    the procedural stand-in for the statue scan the reference trains on
    (/root/reference/trainingcode/main.py:133 'CHEVAL_MARLY').  ~2*res^2*2
    triangles; fits [0, extent]^3."""
    rng = np.random.RandomState(seed)
    th = np.linspace(0.0, np.pi, res + 1)
    ph = np.linspace(0.0, 2 * np.pi, 2 * res + 1)
    T, Pg = np.meshgrid(th, ph, indexing="ij")       # (res+1, 2res+1)
    a, b, c = 0.22 + 0.06 * rng.rand(3)
    r = (1.0
         + a * np.sin(3.0 * T) * np.cos(2.0 * Pg)
         + b * np.cos(2.0 * T) * np.sin(3.0 * Pg)
         + c * 0.4 * np.sin(5.0 * T + 1.3) * np.sin(4.0 * Pg + 0.7))
    x = r * np.sin(T) * np.cos(Pg)
    y = r * np.cos(T)
    z = r * np.sin(T) * np.sin(Pg)
    v = np.stack([x, y, z], axis=-1)                  # (res+1, 2res+1, 3)
    # normalize into [0, extent]^3
    lo = v.reshape(-1, 3).min(0)
    hi = v.reshape(-1, 3).max(0)
    v = (v - lo) / max((hi - lo).max(), 1e-9) * extent
    p00 = v[:-1, :-1].reshape(-1, 3)
    p10 = v[1:, :-1].reshape(-1, 3)
    p01 = v[:-1, 1:].reshape(-1, 3)
    p11 = v[1:, 1:].reshape(-1, 3)
    v0 = np.concatenate([p00, p00]).astype(np.float32)
    v1 = np.concatenate([p10, p11]).astype(np.float32)
    v2 = np.concatenate([p11, p01]).astype(np.float32)
    # drop degenerate polar slivers
    n = np.cross(v1 - v0, v2 - v0)
    keep = np.linalg.norm(n, axis=-1) > 1e-12
    return MeshGeometry(v0=v0[keep], v1=v1[keep], v2=v2[keep],
                        base_color=(0.75, 0.72, 0.68), name=f"statue{res}")


def city_scene(n: int, seed: int = 0, extent: float = 1.0):
    """~n-triangle architectural stand-in: a displaced terrain grid plus box
    "buildings" — the surface statistics of the reference's target scenes
    (Bistro / San Miguel / City, /root/reference/src/render/renderer.cpp:
    1726-1796) rather than the volumetric worst case of random_tri_soup.
    Rays hit a surface and stop; cluster AABBs tile the surface instead of
    overlapping everywhere.  Deterministic in (n, seed); triangle count is
    within a few percent of n (grid quantization)."""
    rng = np.random.RandomState(seed)
    n_build = max(1, n // 24)           # each box = 12 tris, half the budget
    n_terrain = max(2, n - 12 * n_build)

    # terrain: jittered heightfield grid of g x g cells, 2 tris per cell
    g = max(1, int(np.sqrt(n_terrain / 2)))
    xs = np.linspace(0.0, extent, g + 1, dtype=np.float32)
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    h = rng.rand(g + 1, g + 1).astype(np.float32)
    # smooth the noise a little so the surface is rolling, not spiky
    for _ in range(2):
        h = 0.25 * (np.roll(h, 1, 0) + np.roll(h, -1, 0)
                    + np.roll(h, 1, 1) + np.roll(h, -1, 1))
    gy = h * (0.15 * extent)
    p = np.stack([gx, gy, gz], axis=-1)                       # (g+1, g+1, 3)
    a = p[:-1, :-1].reshape(-1, 3)
    b = p[1:, :-1].reshape(-1, 3)
    c = p[1:, 1:].reshape(-1, 3)
    d = p[:-1, 1:].reshape(-1, 3)
    v0 = np.concatenate([a, a])
    v1 = np.concatenate([b, c])
    v2 = np.concatenate([c, d])

    # buildings: axis-aligned boxes scattered on the terrain
    bs = []
    for _ in range(n_build):
        cx, cz = rng.rand(2).astype(np.float32) * extent * 0.9 + 0.05 * extent
        w, dep = (rng.rand(2).astype(np.float32) * 0.02 + 0.004) * extent
        ht = (rng.rand() * 0.12 + 0.02) * extent
        y0 = 0.0
        bs.append(_box([cx - w, y0, cz - dep], [cx + w, y0 + ht, cz + dep]))
    if bs:
        bv0 = np.concatenate([q[0] for q in bs])
        bv1 = np.concatenate([q[1] for q in bs])
        bv2 = np.concatenate([q[2] for q in bs])
        v0 = np.concatenate([v0, bv0])
        v1 = np.concatenate([v1, bv1])
        v2 = np.concatenate([v2, bv2])
    return MeshGeometry(v0=v0.astype(np.float32), v1=v1.astype(np.float32),
                        v2=v2.astype(np.float32), name=f"city{n}")


def two_room_scene(num_rooms: int = 2, tris_per_room: int = 512, seed: int = 1):
    """Spatially separated clusters of geometry — the canonical multi-partition
    test (each room maps naturally to one partition). Returns (meshes, lights)."""
    rng = np.random.RandomState(seed)
    meshes = []
    for r in range(num_rooms):
        offset = np.asarray([2.5 * r, 0.0, 0.0], np.float32)
        base = rng.rand(tris_per_room, 3).astype(np.float32) + offset
        e1 = (rng.rand(tris_per_room, 3).astype(np.float32) - 0.5) * 0.15
        e2 = (rng.rand(tris_per_room, 3).astype(np.float32) - 0.5) * 0.15
        meshes.append(
            MeshGeometry(
                v0=base, v1=base + e1, v2=base + e2,
                base_color=(0.7, 0.6 + 0.1 * (r % 3), 0.5),
                name=f"room{r}",
            )
        )
    light_tris = np.asarray(
        [[[0.5, 3.0, 0.5], [1.5, 3.0, 0.5], [1.5, 3.0, 1.5]]], np.float32
    )
    lights = LightTable.from_arrays(light_tris, np.asarray([[40.0, 40.0, 40.0]], np.float32))
    return meshes, lights
