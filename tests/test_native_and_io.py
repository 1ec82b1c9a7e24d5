"""Native BVH builder vs python oracle; OBJ loader; texture atlas."""
import numpy as np
import jax.numpy as jnp

from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.bvh import build_bvh
from pg2024_dprt_tpu.scene.native_bvh import available, build_bvh_native
from pg2024_dprt_tpu.ops.traversal import intersect_brute_force, traverse_bvh


def test_native_builder_valid_and_equivalent():
    assert available(), "native BVH builder failed to compile"
    mesh = random_tri_soup(5000, seed=30)
    native = build_bvh_native(mesh.v0, mesh.v1, mesh.v2, 4)
    assert native is not None
    # structural invariants
    assert sorted(native.tri_order.tolist()) == list(range(5000))
    covered = np.zeros(5000, bool)
    m = native.num_nodes
    for i in range(m):
        if native.count[i] > 0:
            lo = native.first[i]
            covered[lo : lo + native.count[i]] = True
        else:
            assert i + 1 < m and i < native.first[i] < m
        assert native.skip[i] == -1 or i < native.skip[i] <= m - 1
    assert covered.all()

    # traversal through the native BVH matches brute force
    scene = device_scene_from_meshes([mesh])  # uses native path (>=4096 tris)
    rng = np.random.RandomState(31)
    n = 512
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmax = jnp.full((n,), 1e30, jnp.float32)
    act = jnp.ones((n,), bool)
    got = traverse_bvh(scene, o, d, 1e-3, tmax, act)
    want = intersect_brute_force(scene, o, d, 1e-3, tmax, act)
    np.testing.assert_array_equal(np.asarray(got.is_hit), np.asarray(want.is_hit))
    hit = np.asarray(want.is_hit)
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4)


def test_obj_loader(tmp_path):
    from pg2024_dprt_tpu.scene.obj import load_obj

    mtl = tmp_path / "scene.mtl"
    mtl.write_text("newmtl red\nKd 1.0 0.1 0.1\nnewmtl tex\nKd 0.5 0.5 0.5\nmap_Kd wood.png\n")
    obj = tmp_path / "scene.obj"
    obj.write_text(
        "mtllib scene.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "o quad\nusemtl red\n"
        "f 1/1/1 2/2/1 3/3/1 4/4/1\n"   # quad -> 2 tris
        "o tri\nusemtl tex\n"
        "f -4//-1 -3//-1 -2//-1\n"        # negative indices
    )
    meshes, textures = load_obj(str(obj))
    assert len(meshes) == 2
    quad = next(m for m in meshes if m.name.startswith("quad"))
    tri = next(m for m in meshes if m.name.startswith("tri"))
    assert quad.num_triangles == 2
    assert tri.num_triangles == 1
    assert quad.base_color == (1.0, 0.1, 0.1)
    assert quad.texture_index == -1
    assert tri.texture_index == 0
    assert textures == ["wood.png"]
    np.testing.assert_allclose(quad.n0[0], [0, 0, 1])
    np.testing.assert_allclose(quad.uv1[0], [1, 0])


def test_texture_atlas_sampling():
    from pg2024_dprt_tpu.scene.textures import build_textures, checkerboard, sample_textures

    tex = checkerboard(res=64, tiles=2)  # 2x2 checker
    atlas = build_textures([tex])
    # sample centers of the four quadrants (v flipped on write-in: top-left
    # of image = high v)
    u = jnp.asarray([0.25, 0.75, 0.25, 0.75])
    v = jnp.asarray([0.75, 0.75, 0.25, 0.25])
    rgba = np.asarray(sample_textures(atlas, jnp.zeros(4, jnp.int32), u, v))
    assert rgba.shape == (4, 4)
    assert np.allclose(rgba[:, 3], 1.0)
    # checker: diagonal quadrants match, adjacent differ
    assert np.allclose(rgba[0, :3], rgba[3, :3], atol=1e-5)
    assert not np.allclose(rgba[0, :3], rgba[1, :3], atol=1e-2)


def test_textured_render():
    """Checkerboard floor shows spatial albedo variation in the image."""
    from pg2024_dprt_tpu.core import Camera
    from pg2024_dprt_tpu.render import RenderConfig, render_image
    from pg2024_dprt_tpu.scene import MeshGeometry, cornell_box
    from pg2024_dprt_tpu.scene.lights import EnvironmentMap
    from pg2024_dprt_tpu.scene.textures import checkerboard

    meshes, lights = cornell_box()
    floor = meshes[0]
    uv = np.asarray([[0, 0], [0, 1], [1, 1], [0, 0], [1, 1], [1, 0]], np.float32)
    meshes[0] = MeshGeometry(
        v0=floor.v0, v1=floor.v1, v2=floor.v2,
        uv0=uv[0::3], uv1=uv[1::3], uv2=uv[2::3],
        base_color=(1, 1, 1), texture_index=0, name="floor",
    )
    scene = device_scene_from_meshes(meshes, textures=[checkerboard(tiles=4)])
    env = EnvironmentMap.constant((0, 0, 0))
    camera = Camera.look_at([0.5, 0.9, 2.2], [0.5, 0.2, 0.0], [0, 1, 0], 45.0, 32, 32)
    cfg = RenderConfig(width=32, height=32, spp=2, bounces=1)
    img = np.asarray(render_image(scene, lights, env, camera, cfg))
    floor_rows = img[20:]
    lit = floor_rows[floor_rows.sum(-1) > 0.01]
    assert lit.shape[0] > 20
    # checker contrast: variance across lit floor pixels is large
    assert lit.max() > 2.5 * max(lit.min(), 1e-3) or lit.std() > 0.05


def test_alpha_cutout():
    """A fully transparent wall (alpha < 0.05) must not block rays or
    shadows (reference anyhit semantics, optix/kernel.cu:311-359)."""
    import jax.numpy as jnp
    from pg2024_dprt_tpu.ops.trace_api import trace_closest_cutout, trace_occlusion_cutout
    from pg2024_dprt_tpu.scene import MeshGeometry
    from pg2024_dprt_tpu.scene.procedural import _quad

    # wall at z=0.5 (transparent texture), floor at z=0 (opaque)
    v0w, v1w, v2w = _quad([0, 0, 0.5], [1, 0, 0.5], [1, 1, 0.5], [0, 1, 0.5])
    v0f, v1f, v2f = _quad([0, 0, 0.0], [1, 0, 0.0], [1, 1, 0.0], [0, 1, 0.0])
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 0], [1, 1], [0, 1]], np.float32)
    wall = MeshGeometry(v0=v0w, v1=v1w, v2=v2w, uv0=uv[0::3], uv1=uv[1::3],
                        uv2=uv[2::3], texture_index=0, name="wall")
    floor = MeshGeometry(v0=v0f, v1=v1f, v2=v2f, name="floor")

    transparent = np.zeros((8, 8, 4), np.float32)
    transparent[..., :3] = 0.5  # rgb set, alpha 0 -> cutout
    scene = device_scene_from_meshes([wall, floor], textures=[transparent])

    n = 64
    rng = np.random.RandomState(40)
    o = np.stack([rng.rand(n), rng.rand(n), np.full(n, 2.0)], -1).astype(np.float32)
    d = np.tile(np.asarray([[0.0, 0.0, -1.0]], np.float32), (n, 1))
    hits, diag = trace_closest_cutout(
        scene, jnp.asarray(o), jnp.asarray(d), 1e-3,
        jnp.full((n,), 1e30, jnp.float32), jnp.ones((n,), bool),
    )
    # every ray passes through the transparent wall and hits the floor at t=2
    assert np.asarray(hits.is_hit).all()
    np.testing.assert_allclose(np.asarray(hits.t), 2.0, atol=1e-3)
    assert int(diag) == 0

    occ, diag = trace_occlusion_cutout(
        scene, jnp.asarray(o), jnp.asarray(d), 1e-3,
        jnp.full((n,), 1.2, jnp.float32), jnp.ones((n,), bool),
    )
    # within t<1.2 only the transparent wall exists -> unoccluded
    assert not np.asarray(occ).any()
    assert int(diag) == 0


def test_alpha_cutout_max_hops_residue_reports_miss():
    """A ray still on a transparent hit after max_hops re-traces must report
    MISS (reference anyhit never accepts a transparent surface,
    optix/kernel.cu:349-355) and be counted in diag — never silently keep the
    transparent hit."""
    import jax.numpy as jnp
    from pg2024_dprt_tpu.ops.trace_api import trace_closest_cutout
    from pg2024_dprt_tpu.scene import MeshGeometry
    from pg2024_dprt_tpu.scene.procedural import _quad

    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 0], [1, 1], [0, 1]], np.float32)
    walls = []
    for i in range(6):  # 6 stacked transparent walls > max_hops=4
        z = 0.2 + 0.1 * i
        v0, v1, v2 = _quad([0, 0, z], [1, 0, z], [1, 1, z], [0, 1, z])
        walls.append(MeshGeometry(v0=v0, v1=v1, v2=v2, uv0=uv[0::3], uv1=uv[1::3],
                                  uv2=uv[2::3], texture_index=0, name=f"w{i}"))
    transparent = np.zeros((8, 8, 4), np.float32)
    transparent[..., :3] = 0.5
    scene = device_scene_from_meshes(walls, textures=[transparent])

    n = 16
    rng = np.random.RandomState(7)
    o = np.stack([rng.rand(n), rng.rand(n), np.full(n, 2.0)], -1).astype(np.float32)
    d = np.tile(np.asarray([[0.0, 0.0, -1.0]], np.float32), (n, 1))
    hits, diag = trace_closest_cutout(
        scene, jnp.asarray(o), jnp.asarray(d), 1e-3,
        jnp.full((n,), 1e30, jnp.float32), jnp.ones((n,), bool), max_hops=4,
    )
    assert not np.asarray(hits.is_hit).any()   # residue reports miss
    assert int(diag) == n                      # and is surfaced, not silent


def test_visibility_grid():
    """Legacy grid proxy (#19): rays that hit the object must be predicted
    visible; overall prediction should beat chance against real traces."""
    import jax
    from pg2024_dprt_tpu.scene import MeshGeometry
    from pg2024_dprt_tpu.scene.procedural import _box
    from pg2024_dprt_tpu.scene.visibility_grid import build_visibility_grid, query_visibility
    from pg2024_dprt_tpu.train.datagen import _sample_entry_rays

    v0, v1, v2 = _box([0.35, 0.35, 0.35], [0.65, 0.65, 0.65])
    scene = device_scene_from_meshes([MeshGeometry(v0=v0, v1=v1, v2=v2)])
    lo, hi = jnp.zeros(3), jnp.ones(3)
    vg = build_visibility_grid(scene, lo, hi, samples=150_000, seed=5)

    o, d = _sample_entry_rays(jax.random.PRNGKey(99), lo, hi, 4096)
    hits = traverse_bvh(scene, o, d, 1e-4, jnp.full((4096,), 1e30, jnp.float32),
                        jnp.ones((4096,), bool))
    pred = query_visibility(vg, o, d, jnp.zeros((4096,)))
    h = np.asarray(hits.is_hit)
    p = np.asarray(pred)
    # conservative direction: nearly all true hits predicted visible
    assert p[h].mean() > 0.97
    # and it actually culls: a good chunk of misses predicted invisible
    assert (~p[~h]).mean() > 0.3


def test_texture_native_resolution_preserved():
    """A 1024^2 texture must survive at native resolution (the reference
    keeps full-res bilinear textures, renderer.cpp:1613-1723): a 512-tile
    checker (one tile = 2 texels) must still resolve tile colors exactly."""
    from pg2024_dprt_tpu.scene.textures import build_textures, checkerboard, sample_textures

    tex = checkerboard(res=1024, tiles=512)
    small = checkerboard(res=32, tiles=4)
    pool = build_textures([small, tex])
    assert int(pool.width[1]) == 1024 and int(pool.height[1]) == 1024
    assert int(pool.width[0]) == 32
    # texel centers of two adjacent 2-texel tiles in the fine checker
    u = jnp.asarray([1.0 / 1024, 3.0 / 1024])
    v = jnp.asarray([1.0 - 1.0 / 1024, 1.0 - 1.0 / 1024])
    rgba = np.asarray(sample_textures(pool, jnp.ones(2, jnp.int32), u, v))
    assert abs(rgba[0, 0] - rgba[1, 0]) > 0.5  # adjacent tiles differ sharply

    # oversized textures get box-filtered to the cap, not nearest-decimated
    from pg2024_dprt_tpu.scene.textures import build_textures as bt
    big = np.ones((4096, 4096, 3), np.float32)
    big[::2] = 0.0  # alternating rows: box filter must average to 0.5
    pool2 = bt([big], max_res=1024)
    assert int(pool2.width[0]) == 1024
    assert np.allclose(np.asarray(pool2.texels[:, 0]).mean(), 0.5, atol=1e-3)


def _encode_png_with_filters(img: np.ndarray, ftype: int) -> bytes:
    """Hand-encode an 8-bit RGB PNG using one filter type on every row."""
    import struct
    import zlib

    h, w, _ = img.shape
    bpp = 3
    raw = b""
    prev = np.zeros((w * bpp,), np.int32)
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int32)
        if ftype == 0:
            filt = row
        elif ftype == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            filt = (row - left) & 0xFF
        elif ftype == 2:
            filt = (row - prev) & 0xFF
        elif ftype == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            filt = (row - ((left + prev) >> 1)) & 0xFF
        elif ftype == 4:
            filt = np.zeros_like(row)
            for x in range(row.shape[0]):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[x] = (row[x] - pred) & 0xFF
        raw += bytes([ftype]) + bytes(filt.astype(np.uint8))
        prev = row

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_read_png_all_filters(tmp_path):
    """Decoder handles every PNG filter type (0..4) bit-exactly."""
    from pg2024_dprt_tpu.utils.png import read_png

    img = (np.random.RandomState(5).rand(13, 17, 3) * 255).astype(np.uint8)
    for f in range(5):
        p = tmp_path / f"f{f}.png"
        p.write_bytes(_encode_png_with_filters(img, f))
        back = read_png(str(p))
        np.testing.assert_allclose(back, img.astype(np.float32) / 255.0,
                                   atol=1e-6, err_msg=f"filter {f}")


def test_read_png_gray_and_rgba(tmp_path):
    """Gray (1ch) and RGBA (4ch) color types decode with correct shapes."""
    import struct
    import zlib

    from pg2024_dprt_tpu.utils.png import read_png

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    rng = np.random.RandomState(6)
    for ctype, ch in ((0, 1), (6, 4)):
        img = (rng.rand(9, 11, ch) * 255).astype(np.uint8)
        raw = b"".join(b"\x00" + img[y].tobytes() for y in range(9))
        ihdr = struct.pack(">IIBBBBB", 11, 9, 8, ctype, 0, 0, 0)
        p = tmp_path / f"c{ctype}.png"
        p.write_bytes(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                      + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
        back = read_png(str(p))
        assert back.shape == (9, 11, ch)
        np.testing.assert_allclose(back, img.astype(np.float32) / 255.0, atol=1e-6)


def test_textured_obj_scene_from_disk(tmp_path):
    """End-to-end: .obj + .mtl + .png on disk -> scene_from_obj ->
    render_image shows the texture's spatial color split.  Closes the
    reference's stb_image texture-load loop
    (/root/reference/src/render/renderer.cpp:1613-1723) with zero
    hand-built texel arrays."""
    from pg2024_dprt_tpu.core import Camera
    from pg2024_dprt_tpu.render import RenderConfig, render_image
    from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable
    from pg2024_dprt_tpu.scene.obj import scene_from_obj
    from pg2024_dprt_tpu.utils.png import write_png

    # left half red, right half blue
    tex = np.zeros((16, 16, 3), np.uint8)
    tex[:, :8, 0] = 255
    tex[:, 8:, 2] = 255
    write_png(str(tmp_path / "split.png"), tex)

    (tmp_path / "scene.mtl").write_text(
        "newmtl floor\nKd 1 1 1\nmap_Kd split.png\n")
    # floor quad in y=0, uv: u tracks x
    (tmp_path / "scene.obj").write_text(
        "mtllib scene.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 0 1\nv 0 0 1\n"
        "vn 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "o floor\nusemtl floor\n"
        "f 1/1/1 4/4/1 3/3/1 2/2/1\n")
    scene = scene_from_obj(str(tmp_path / "scene.obj"))
    assert scene.albedo_textures.count == 1

    env = EnvironmentMap.constant((0.0, 0.0, 0.0))
    lights = LightTable.from_arrays(
        np.asarray([[[0.2, 2.0, 0.2], [0.8, 2.0, 0.2], [0.5, 2.0, 0.8]]]),
        np.asarray([[8.0, 8.0, 8.0]]))
    cam = Camera.look_at([0.5, 1.6, 0.5], [0.5, 0.0, 0.5], [0, 0, -1], 45.0, 24, 24)
    cfg = RenderConfig(width=24, height=24, spp=2, bounces=1)
    img = np.asarray(render_image(scene, lights, env, cam, cfg))
    # u tracks world x which tracks image columns (up=-z keeps x horizontal;
    # tolerate either horizontal orientation)
    cols = img.mean(axis=0)  # (W, 3)
    left, right = cols[:10].mean(axis=0), cols[-10:].mean(axis=0)
    ratios = sorted([left[0] / max(left[2], 1e-6), right[0] / max(right[2], 1e-6)])
    # one side strongly red-dominant, the other strongly blue-dominant
    assert ratios[1] > 3.0 and ratios[0] < 1 / 3.0, (left, right)
