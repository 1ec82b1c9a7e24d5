"""The command-line renderer (python -m pg2024_dprt_tpu.render) — the
analogue of the reference's renderer executable + per-scene launch setup
(/root/reference/src/main.cpp, renderer.cpp:1726-1796,1938-2060)."""
import os

import numpy as np

from pg2024_dprt_tpu.render.__main__ import auto_camera, load_scene, main, scene_bounds


def test_cli_builtin_cornell(tmp_path):
    out = str(tmp_path / "r")
    images = main(["cornell", "--size", "24", "--spp", "2", "--bounces", "2",
                   "--out", out, "--format", "both"])
    assert os.path.exists(os.path.join(out, "frame0.png"))
    assert os.path.exists(os.path.join(out, "frame0.exr"))
    img = images[0]
    assert img.shape == (24, 24, 3)
    assert 0.01 < float(np.mean(img)) < 20.0
    assert np.all(np.isfinite(img))


def test_cli_obj_scene_auto_framing(tmp_path):
    # an emitter-free .obj: the CLI must auto-frame the camera and place an
    # auto area light so the render is non-black
    (tmp_path / "box.obj").write_text(
        "v 0 0 0\nv 2 0 0\nv 2 0 2\nv 0 0 2\n"
        "v 0.7 0 0.7\nv 1.3 0 0.7\nv 1.0 0.8 1.0\n"
        "f 1 4 3 2\n"   # floor (normal +y)
        "f 5 6 7\n")    # a bump to shadow
    out = str(tmp_path / "r")
    images = main([str(tmp_path / "box.obj"), "--size", "20", "--spp", "2",
                   "--bounces", "2", "--out", out])
    assert os.path.exists(os.path.join(out, "frame0.png"))
    assert float(np.mean(images[0])) > 1e-3  # lit by the auto light


def test_cli_distributed_partitions(tmp_path):
    out = str(tmp_path / "r")
    images = main(["rooms:2", "--size", "16", "--spp", "1", "--bounces", "2",
                   "--partitions", "2", "--out", out])
    assert images[0].shape == (16, 16, 3)
    assert np.all(np.isfinite(images[0]))


def test_cli_scene_specs_and_bounds():
    meshes, lights, _ = load_scene("soup:256")
    assert lights is None
    lo, hi = scene_bounds(meshes)
    assert np.all(hi > lo)
    cam = auto_camera(lo, hi, 45.0, 32, 32)
    assert cam.width == 32
    meshes, lights, _ = load_scene("cornell")
    assert lights is not None and lights.count == 2


def test_cli_instanced_builtin(tmp_path):
    # instanced:I,T — the two-level builtin (I instances over one shared
    # base table); single-device path
    out = str(tmp_path / "r")
    images = main(["instanced:4,512", "--size", "20", "--spp", "1",
                   "--bounces", "2", "--out", out])
    assert images[0].shape == (20, 20, 3)
    assert np.all(np.isfinite(images[0]))
    assert float(np.mean(images[0])) > 1e-4


def test_cli_instanced_distributed(tmp_path):
    # the round-5 composition: instances partitioned over the mesh
    # (build_partitioned_scene_instanced), P=2
    out = str(tmp_path / "r")
    images = main(["instanced:4,512", "--size", "20", "--spp", "1",
                   "--bounces", "2", "--partitions", "2", "--out", out])
    assert images[0].shape == (20, 20, 3)
    assert np.all(np.isfinite(images[0]))
