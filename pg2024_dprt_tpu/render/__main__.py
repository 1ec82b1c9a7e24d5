"""Command-line renderer — the analogue of the reference's renderer
executable (`/root/reference/src/main.cpp` + `Renderer::launch`,
renderer.cpp:1938-2060): load a scene (an .obj from disk or a named builtin),
set up camera/lights, render N frames, write PNG/EXR.

Usage:
    python -m pg2024_dprt_tpu.render SCENE [options]

SCENE is a path to a .obj file (materials + PNG textures resolved relative
to it, scene/obj.py) or a builtin:
    cornell | cornell-water | city[:N] | soup[:N] | rooms[:N] | instanced[:I[,T]]

Examples:
    python -m pg2024_dprt_tpu.render cornell --size 256 --spp 8 --out /tmp/r
    python -m pg2024_dprt_tpu.render bunny.obj --spp 4 --format both
    python -m pg2024_dprt_tpu.render rooms:2 --partitions 2 --spp 2
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..scene import device_scene_from_meshes
from ..scene.lights import EnvironmentMap, LightTable
from ..utils.timing import Timing
from .config import RenderConfig


def _parse_vec3(s: str):
    parts = [float(x) for x in s.split(",")]
    if len(parts) != 3:
        raise argparse.ArgumentTypeError(f"expected 'x,y,z', got {s!r}")
    return parts


def load_scene(spec: str, default_color=(0.8, 0.8, 0.8)):
    """Resolve a SCENE spec -> (meshes, lights-or-None, texture images)."""
    from ..scene.procedural import (
        city_scene, cornell_box, random_tri_soup, two_room_scene)

    name, _, arg = spec.partition(":")
    if name == "cornell" or name == "cornell-water":
        meshes, lights = cornell_box(with_water_sphere=name == "cornell-water")
        return meshes, lights, None
    if name == "city":
        return [city_scene(int(arg or 20000))], None, None
    if name == "soup":
        return [random_tri_soup(int(arg or 65536))], None, None
    if name == "rooms":
        meshes, lights = two_room_scene(int(arg or 2))
        return meshes, lights, None
    if name == "instanced":
        # instanced:I[,T] — an IxT two-level scene: a grid of I instances
        # of one T-tri soup sharing ONE triangle table
        # (scene/geometry.py::device_scene_from_instances)
        parts = (arg or "8").split(",")
        ni = int(parts[0])
        tris = int(parts[1]) if len(parts) > 1 else 65536
        base = random_tri_soup(tris, seed=9)
        cols = max(1, int(np.ceil(np.sqrt(ni))))
        tf = np.zeros((ni, 3, 4), np.float32)
        for i in range(ni):
            tf[i, :, :3] = np.eye(3, dtype=np.float32)
            tf[i, :, 3] = [2.2 * (i % cols), 0.0, 2.2 * (i // cols)]
        return ([base], tf), None, None
    if not os.path.exists(spec):
        raise SystemExit(f"scene {spec!r}: no such file and not a builtin "
                         f"(cornell | cornell-water | city[:N] | soup[:N] | "
                         f"rooms[:N] | instanced[:I[,T]])")
    from ..scene.obj import load_obj, load_texture_images

    meshes, texture_paths = load_obj(spec, default_color=default_color)
    images = load_texture_images(texture_paths, base_dir=os.path.dirname(spec))
    return meshes, None, images


def scene_bounds(meshes):
    lo = np.full(3, np.inf, np.float32)
    hi = np.full(3, -np.inf, np.float32)
    for m in meshes:
        for v in (m.v0, m.v1, m.v2):
            lo = np.minimum(lo, np.asarray(v).min(axis=0))
            hi = np.maximum(hi, np.asarray(v).max(axis=0))
    return lo, hi


def auto_camera(lo, hi, fov: float, width: int, height: int):
    """Frame the scene AABB from a 3/4 view (the scene-agnostic default the
    reference hard-codes per scene, renderer.cpp:1726-1796)."""
    from ..core import Camera

    center = 0.5 * (lo + hi)
    radius = 0.5 * float(np.linalg.norm(hi - lo))
    radius = max(radius, 1e-3)
    dist = radius / np.tan(np.deg2rad(fov) * 0.5) * 1.15
    eye = center + np.asarray([0.45, 0.35, 1.0]) / np.linalg.norm(
        [0.45, 0.35, 1.0]) * dist
    return Camera.look_at(eye, center, [0.0, 1.0, 0.0], fov, width, height)


def auto_light(lo, hi, intensity: float) -> LightTable:
    """Area light hovering over the scene AABB (for .obj scenes, which carry
    no emitters — mirrors the reference's per-scene light setup)."""
    cx, cz = 0.5 * (lo[0] + hi[0]), 0.5 * (lo[2] + hi[2])
    ex, ez = hi[0] - lo[0], hi[2] - lo[2]
    y = hi[1] + 0.25 * max(hi[1] - lo[1], 1e-3)
    hx, hz = 0.2 * max(ex, 1e-3), 0.2 * max(ez, 1e-3)
    quad = np.asarray(
        [[[cx - hx, y, cz - hz], [cx + hx, y, cz - hz], [cx + hx, y, cz + hz]],
         [[cx - hx, y, cz - hz], [cx + hx, y, cz + hz], [cx - hx, y, cz + hz]]],
        np.float32)
    # scale radiance with scene extent so total power covers the footprint
    rad = intensity * max(ex * ez, 1e-6) / max(4.0 * hx * hz, 1e-6)
    return LightTable.from_arrays(quad, np.full((2, 3), rad, np.float32))


def train_partition_proxies(meshes, part, parts: int, samples: int,
                            epochs: int, width: int = 64, depth: int = 2):
    """Offline stage of the flagship workflow (reference trainingcode/main.py):
    train vis+depth proxy nets per partition on its real geometry, deploy
    stacked (see examples/neural_two_rooms.py for the long-form version)."""
    from ..models import stack_params
    from ..models.mlp import MLPConfig
    from ..models.proxy import ProxyModels
    from ..scene.partition import partition_meshes
    from ..train import (
        TrainConfig, balance_vis, depth_only, fit, generate_proxy_dataset)

    assignment = partition_meshes(meshes, parts)
    cfg = MLPConfig(width=width, depth=depth)
    vis_list, depth_list = [], []
    for p, idxs in enumerate(assignment):
        sub = device_scene_from_meshes([meshes[i] for i in idxs])
        lo = np.asarray(part.proxies.aabb_min[p])
        hi = np.asarray(part.proxies.aabb_max[p])
        feats, d = generate_proxy_dataset(sub, lo, hi, samples, seed=100 + p)
        xv, yv = balance_vis(feats, d)
        vp, hist = fit(xv, yv, cfg, TrainConfig(
            nn_type="vis", epochs=epochs, batch=4096, learn_rate=5e-3))
        print(f"partition {p}: vis loss {hist['test_loss'][-1]:.4f}", flush=True)
        xd, yd = depth_only(feats, d)
        if xd.shape[0] < 256:
            xd, yd = feats, d
        dp, hist = fit(xd, yd, cfg, TrainConfig(
            nn_type="depth", epochs=epochs, batch=4096, learn_rate=5e-3))
        print(f"partition {p}: depth loss {hist['test_loss'][-1]:.4f}", flush=True)
        vis_list.append(vp)
        depth_list.append(dp)
    return ProxyModels(
        vis_params=stack_params(vis_list), depth_params=stack_params(depth_list),
        num_objects=parts, vis_cfg=cfg, depth_cfg=cfg)


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="python -m pg2024_dprt_tpu.render", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("scene", help=".obj path or builtin (cornell | cornell-water"
                                 " | city[:N] | soup[:N] | rooms[:N] | "
                                 "instanced[:I[,T]])")
    p.add_argument("--size", type=int, default=256, help="square image size")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--bounces", type=int, default=4)
    p.add_argument("--shadow-paths", type=int, default=4,
                   help="NEE samples per shading point (reference shadowPathCount)")
    p.add_argument("--frames", type=int, default=1)
    p.add_argument("--out", default="out", help="output directory")
    p.add_argument("--format", choices=("png", "exr", "both"), default="png")
    p.add_argument("--partitions", type=int, default=0,
                   help="render distributed over an N-partition device mesh "
                        "(exact mode: migration + ring shadows)")
    p.add_argument("--neural", action="store_true",
                   help="with --partitions: train per-partition vis/depth "
                        "proxies (the offline trainingcode stage), then route "
                        "secondary/shadow rays through them "
                        "(secondaryRayModuleBasedNN)")
    p.add_argument("--proxy-samples", type=int, default=30000,
                   help="--neural: training rays per partition")
    p.add_argument("--proxy-epochs", type=int, default=25,
                   help="--neural: training epochs per net")
    p.add_argument("--env", type=_parse_vec3, default=[0.0, 0.0, 0.0],
                   metavar="R,G,B", help="constant environment radiance")
    p.add_argument("--cam-pos", type=_parse_vec3, default=None, metavar="X,Y,Z")
    p.add_argument("--cam-target", type=_parse_vec3, default=None, metavar="X,Y,Z")
    p.add_argument("--fov", type=float, default=45.0)
    p.add_argument("--light-intensity", type=float, default=8.0,
                   help="auto area-light radiance scale (scenes without emitters)")
    p.add_argument("--light-velocity", type=_parse_vec3, default=None,
                   metavar="X,Y,Z", help="LIGHT_MOVE: light offset per frame")
    p.add_argument("--dolly", type=_parse_vec3, default=None, metavar="X,Y,Z",
                   help="CAMERA_MOVE: camera offset per frame")
    p.add_argument("--cpu-mesh", action="store_true",
                   help="with --partitions: run on a virtual N-device CPU "
                        "mesh (xla_force_host_platform_device_count) — the "
                        "dryrun_multichip recipe for machines with fewer "
                        "attached accelerators than partitions")
    p.add_argument("--tracer", default="auto",
                   choices=("auto", "stackless", "cluster", "resident"))
    p.add_argument("--fused-frame", default="auto", choices=("auto", "on", "off"))
    p.add_argument("--nee", default="ris", choices=("ris", "sum"),
                   help="NEE estimator: reservoir-selected single occlusion ray (ris) or the reference S-ray sum")
    p.add_argument("--visibility-grids", action="store_true",
                   help="with --partitions (exact mode): conservative per-partition visibility grids pre-filter migrations + ring-shadow hops (image unchanged)")
    args = p.parse_args(argv)

    if args.partitions > 1 and args.cpu_mesh \
            and os.environ.get("_PG2024_CPU_MESH") != "1":
        # An accelerator plugin's sitecustomize may already have initialized
        # a backend at interpreter start, after which the CPU device count
        # cannot be changed — re-exec ourselves with a pure-CPU environment
        # (JAX_PLATFORMS + xla_force_host_platform_device_count, plugin site
        # dirs stripped from PYTHONPATH).
        env = dict(os.environ)
        env["_PG2024_CPU_MESH"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={args.partitions}"
            ).strip()
        env["PYTHONPATH"] = os.pathsep.join(
            q for q in env.get("PYTHONPATH", "").split(os.pathsep)
            if q and ".axon_site" not in q)
        os.execve(sys.executable,
                  [sys.executable, "-m", "pg2024_dprt_tpu.render"]
                  + (sys.argv[1:] if argv is None else list(argv)), env)
    if args.partitions > 1 and args.cpu_mesh:
        # (re-exec'd child) make sure nothing re-selects an accelerator
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ..core import Camera

    w = args.width or args.size
    h = args.height or args.size
    meshes, lights, textures = load_scene(args.scene)
    instanced_spec = isinstance(meshes, tuple)
    if instanced_spec:
        base_meshes, transforms = meshes
        blo, bhi = scene_bounds(base_meshes)
        corners = np.stack([np.where(np.asarray(sel), bhi, blo)
                            for sel in np.ndindex(2, 2, 2)])
        wc = (np.einsum("iab,cb->ica", transforms[:, :, :3], corners)
              + transforms[:, None, :, 3])
        lo = wc.reshape(-1, 3).min(axis=0).astype(np.float32)
        hi = wc.reshape(-1, 3).max(axis=0).astype(np.float32)
    else:
        lo, hi = scene_bounds(meshes)
    if lights is None:
        lights = auto_light(lo, hi, args.light_intensity)
    if args.cam_pos is not None:
        target = args.cam_target if args.cam_target is not None \
            else list(0.5 * (lo + hi))
        camera = Camera.look_at(args.cam_pos, target, [0, 1, 0], args.fov, w, h)
    else:
        camera = auto_camera(lo, hi, args.fov, w, h)
    env = EnvironmentMap.constant(args.env)
    cfg = RenderConfig(width=w, height=h, spp=args.spp, bounces=args.bounces,
                       shadow_path_count=args.shadow_paths, tracer=args.tracer,
                       fused_frame=args.fused_frame, nee_mode=args.nee,
                       use_visibility_grids=args.visibility_grids)
    timing = Timing()

    from .frames import render_frames

    if args.partitions > 1:
        import dataclasses

        import jax

        from ..models import random_proxy_models
        from ..parallel import make_mesh
        from ..scene import (
            build_partitioned_scene, build_partitioned_scene_instanced)

        if jax.device_count() < args.partitions:
            raise SystemExit(
                f"--partitions {args.partitions} needs {args.partitions} "
                f"devices but this process sees {jax.device_count()} "
                f"({jax.default_backend()}); re-run with --cpu-mesh to use a "
                f"virtual {args.partitions}-device CPU mesh, or lower "
                f"--partitions")
        if instanced_spec:
            # distributed two-level instancing: partitions own instance
            # subsets over one shared base table (scene/partition.py)
            part = build_partitioned_scene_instanced(
                base_meshes, transforms, args.partitions,
                visibility_grids=args.visibility_grids)
        else:
            part = build_partitioned_scene(
                meshes, args.partitions, textures=textures,
                visibility_grids=args.visibility_grids)
        mesh = make_mesh(args.partitions)
        if args.neural and instanced_spec:
            # neural instanced: ONE net pair trained on the shared BASE
            # object serves every instance via the instance-level proxy
            # rows (PartitionedScene.nn_proxies)
            from ..models import stack_params
            from ..models.mlp import MLPConfig
            from ..models.proxy import ProxyModels
            from ..scene import device_scene_from_meshes as _dsm
            from ..scene.partition import _meshes_aabb
            from ..train.loop import TrainConfig, train_proxy_for_partition

            blo, bhi = _meshes_aabb(base_meshes)
            base_scene = _dsm(base_meshes)
            mcfg = MLPConfig(width=64, depth=2)
            vp, hv = train_proxy_for_partition(
                base_scene, blo, bhi, "vis", mlp_cfg=mcfg,
                train_cfg=TrainConfig(nn_type="vis",
                                      epochs=args.proxy_epochs,
                                      batch=4096, learn_rate=5e-3),
                num_samples=args.proxy_samples)
            dp, hd = train_proxy_for_partition(
                base_scene, blo, bhi, "depth", mlp_cfg=mcfg,
                train_cfg=TrainConfig(nn_type="depth",
                                      epochs=args.proxy_epochs,
                                      batch=4096, learn_rate=5e-3),
                num_samples=args.proxy_samples)
            print(f"base-object nets: vis {hv['test_loss'][-1]:.4f} "
                  f"depth {hd['test_loss'][-1]:.4f}", flush=True)
            models = ProxyModels(stack_params([vp]), stack_params([dp]), 1,
                                 mcfg, mcfg)
            cfg = dataclasses.replace(cfg, use_neural_proxies=True)
        elif args.neural:
            models = train_partition_proxies(
                meshes, part, args.partitions, args.proxy_samples,
                args.proxy_epochs)
            cfg = dataclasses.replace(cfg, use_neural_proxies=True)
        else:
            # exact mode still needs a (unused-prediction) model table for
            # the jitted program's static structure
            models = random_proxy_models(jax.random.PRNGKey(0), args.partitions)
        images = render_frames(
            None, lights, env, camera, cfg, num_frames=args.frames,
            timing=timing, distributed=(part, models, mesh),
            light_velocity=args.light_velocity, camera_velocity=args.dolly)
    else:
        if instanced_spec:
            from ..scene.geometry import device_scene_from_instances

            scene = device_scene_from_instances(base_meshes, transforms)
        else:
            scene = device_scene_from_meshes(meshes, textures=textures)
        images = render_frames(scene, lights, env, camera, cfg,
                               num_frames=args.frames, timing=timing,
                               light_velocity=args.light_velocity,
                               camera_velocity=args.dolly)

    os.makedirs(args.out, exist_ok=True)
    for i, img in enumerate(images):
        if args.format in ("exr", "both"):
            from ..utils.exr import write_exr

            write_exr(os.path.join(args.out, f"frame{i}.exr"), img)
        if args.format in ("png", "both"):
            from ..utils.png import write_png

            write_png(os.path.join(args.out, f"frame{i}.png"), img)
    print(timing.report())
    print(f"wrote {len(images)} frame(s) ({w}x{h}, {args.spp}spp, "
          f"{args.bounces} bounces) to {args.out}/; mean luminance "
          f"{float(np.mean(images[0])):.4f}")
    return images


if __name__ == "__main__":
    main(sys.argv[1:])
