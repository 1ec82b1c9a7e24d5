"""Extended committed benchmark suite (real TPU) -> artifacts/bench_suite.json.

Rows (all chained-slope timed, see utils/benchmarking.py and CLAUDE.md):
  * camera_64k        — coherent primary wavefront, resident tracer
  * incoherent_64k    — random rays, cluster-schedule sorted, resident tracer
  * camera_1m         — 1M-triangle scene (HBM-streaming resident kernel:
                        the 89 MiB cluster table exceeds VMEM), the
                        massive-scene regime the reference targets
  * incoherent_1m     — random rays over the 1M scene, auto-sorted
  * anyhit_64k        — occlusion wavefront, resident tracer
  * frame_exact       — 256x256 1spp 4-bounce full frame (trace+shade+NEE)
  * frame_1m          — the same full frame over the 1M-triangle scene
  * frame_cornell     — the same full frame on the BASELINE-scale scene
  * frame_textured    — textured cornell (in-kernel bilinear fetch)
  * neural_route_64k  — secondaryRayModuleBasedNN analogue (fused route)
  * neural_route_1m   — the same at 1M tris (HBM-streamed cluster table)
  * grouped_mlp       — neural-proxy inference engine (vis net, 8 objects),
                        the VisNNTime analogue (renderer.cpp:921,968)
  * train_step        — one fwd+bwd+Adam step of the offline training stack
                        (batch 12800, PROD vis net, reference main.py recipe)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_suite.py [--quick]
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.models.proxy import apply_grouped, random_proxy_models
from pg2024_dprt_tpu.models.mlp import PROD_VIS
from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.render.engine import render_sample
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable
from pg2024_dprt_tpu.utils.benchmarking import chained_time

ROWS = []


def row(name, value, unit, detail=""):
    r = {"name": name, "value": round(value, 3), "unit": unit, "detail": detail}
    ROWS.append(r)
    print(json.dumps(r), flush=True)


def row_stats(name, unit, detail, measure, passes: int = 3):
    """High-variance rows (VERDICT r4 #9): run `measure()` (-> value in
    `unit`) several times and record BOTH min and median, so
    round-over-round deltas are decidable against the ~2x tunnel noise."""
    vals = sorted(measure() for _ in range(passes))
    med = vals[len(vals) // 2]
    # throughput rows: best = max; time rows (ms): best = min
    best = vals[0] if unit == "ms" else vals[-1]
    r = {"name": name, "value": round(best, 3), "unit": unit,
         "median": round(med, 3), "passes": passes,
         "detail": detail + f" (best of {passes}, median {med:.3g})"}
    ROWS.append(r)
    print(json.dumps(r), flush=True)


def camera_rays(n, side):
    cam = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0], 45.0, side, side)
    bs = 16
    ids = np.arange(n)
    by, bx = ids // (side * bs), ids % (side * bs)
    blk, inner = bx // (bs * bs), bx % (bs * bs)
    pix = jnp.asarray(((by * bs + inner // bs) * side + (blk * bs + inner % bs)).astype(np.int32))
    return cam.generate_rays(pix // side, pix % side, jnp.zeros(n), jnp.zeros(n))


def main():
    n = 65536
    scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)], tris_per_cluster=128)
    co, cd = camera_rays(n, 256)
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)

    # scenes ride as ARGS (not closure constants): embedded-constant HLO
    # blows the relay's remote_compile body limit at 1M-tri scale (HTTP 413)
    # and defeats the persistent compile cache (CLAUDE.md)
    def t_res(o, d, tmx, act, sc):
        return trace_resident(sc, o, d, 1e-3, tmx, act, tile_rays=128)[0].t

    def t_res_sorted(o, d, tmx, act, sc):
        return trace_resident(sc, o, d, 1e-3, tmx, act, tile_rays=128,
                              sort_rays=True)[0].t

    def t_occl(o, d, tmx, act, sc):
        return trace_resident(sc, o, d, 1e-3, tmx, act, tile_rays=128,
                              any_hit=True)[0].astype(jnp.float32)

    per = chained_time(t_res, co, cd, tmx, act, scene)
    row("camera_64k", n / per / 1e6, "Mrays/s", f"{per*1e3:.2f} ms/wavefront")

    per = chained_time(t_res_sorted, ro, rd, tmx, act, scene)
    row("incoherent_64k", n / per / 1e6, "Mrays/s",
        f"{per*1e3:.2f} ms/wavefront, cluster-schedule sorted")

    row_stats("anyhit_64k", "Mrays/s", "occlusion wavefront",
              lambda: n / chained_time(t_occl, co, cd, tmx, act, scene) / 1e6)

    # 1M-triangle scene -> resident tracer auto-selects the HBM-streaming
    # kernel (89 MiB cluster table, double-buffered in-kernel DMA)
    # auto cluster width (512 at this scale: sorted-incoherent 103 -> 62 ms
    # vs the 64k rows' tpc=128 — scene/geometry.py device_scene_from_meshes)
    scene1m = device_scene_from_meshes([random_tri_soup(1 << 20, seed=3)])

    # tile_rays=128 (not 256): the per-ray horizon re-cull needs the
    # (TM, K) enter matrix within its VMEM cap, and re-culling is a 10.8x
    # win at this scale (scripts/diag_1m.py: 94 ms vs 1016 ms at K=11437)
    per = chained_time(t_res, co, cd, tmx, act, scene1m, short=2, long=7)
    row("camera_1m", n / per / 1e6, "Mrays/s",
        f"{per*1e3:.2f} ms/wavefront, 1M tris, adaptive 512-tri clusters, "
        "HBM-streaming resident kernel")

    # incoherent rays over the 1M scene: auto-sorted (cluster when K<4096),
    # short chain (an
    # unsorted long chain exceeds the device watchdog on this relay)
    per = chained_time(t_res_sorted, ro, rd, tmx, act, scene1m,
                       short=1, long=4, reps=2)
    row("incoherent_1m", n / per / 1e6, "Mrays/s",
        f"{per*1e3:.2f} ms/wavefront, 1M tris, auto-sorted")

    # neural routing at 1M triangles: the fused route megakernel with the
    # HBM-streamed cluster table (double-buffered in-kernel DMA) — the
    # massive-scene regime of the reference's production mode
    from pg2024_dprt_tpu.models.proxy import random_proxy_models as _rpm
    from pg2024_dprt_tpu.ops.pallas_route import route_fused
    from pg2024_dprt_tpu.scene.geometry import ProxyTable as _PT

    offs1m = np.asarray(
        [[-1.05, 0, 0], [1.05, 0, 0], [0, -1.05, 0], [0, 1.05, 0],
         [0, 0, -1.05], [0, 0, 1.05], [-1.05, -1.05, 0], [1.05, 1.05, 0]],
        np.float32)
    proxies1m = _PT(
        aabb_min=jnp.asarray(offs1m), aabb_max=jnp.asarray(offs1m + 1.0),
        max_length=jnp.asarray(np.linalg.norm(np.ones((8, 3)), axis=1)
                               .astype(np.float32)))
    models1m = _rpm(jax.random.PRNGKey(1), 8)

    def route1m_t(o, d, tmx, act, sc):
        dd = route_fused(sc, proxies1m, models1m, o, d, 1e-3, tmx, act,
                         jnp.int32(0), 3, 1e-3)
        return dd["new_t"]

    per = chained_time(route1m_t, ro, rd, tmx, act, scene1m,
                       short=1, long=4, reps=2)
    row("neural_route_1m", n / per / 1e6, "Mpaths/s",
        f"{per*1e3:.2f} ms: trace + march + vis/depth NN + routing, "
        "1M tris, HBM-streamed table, 8 proxies")

    # two-level INSTANCED scene: 8 placed copies of a 512k-tri base soup =
    # 4.2M effective triangles through ONE shared 45 MiB table (the unique-
    # triangle ceiling VERDICT r3 flagged; reference: instanced GASes,
    # renderer.cpp:1726-1796).  Rays aimed into the instance grid.
    from pg2024_dprt_tpu.scene.geometry import device_scene_from_instances

    im = np.zeros((8, 3, 4), np.float32)
    for i in range(8):
        im[i, :, :3] = np.eye(3, dtype=np.float32)
        im[i, :, 3] = [2.2 * (i % 4), 0.0, 2.2 * (i // 4)]
    scene_inst = device_scene_from_instances(
        [random_tri_soup(1 << 19, seed=9)], im)
    eff_tris = 8 * (1 << 19)
    cam_i = Camera.look_at([3.3, 1.5, 9.0], [3.3, 0.5, 1.0], [0, 1, 0],
                           55.0, 256, 256)
    pixi = jnp.arange(n, dtype=jnp.int32)
    oi, di = cam_i.generate_rays(pixi // 256, pixi % 256,
                                 jnp.zeros(n), jnp.zeros(n))
    row_stats(
        "camera_4m_instanced", "Mrays/s",
        f"GRAZING view, {eff_tris/1e6:.1f}M effective tris "
        "(8 instances x 512k base, one shared HBM-streamed table, in-kernel "
        "per-cluster object-space transform)",
        lambda: n / chained_time(t_res, oi, di, tmx, act, scene_inst,
                                 short=1, long=4, reps=2) / 1e6)

    # second pinned view (VERDICT r4 #9: the row is view-dependent by ~2.2x
    # — grazing sweeps many surface clusters, centered terminates fast;
    # regressions in EITHER regime must be visible round-over-round)
    lo_i, hi_i = np.asarray(scene_inst.scene_aabb)
    ci = 0.5 * (lo_i + hi_i)
    ext_i = float(np.max(hi_i - lo_i))
    cam_ic = Camera.look_at(
        [ci[0], ci[1] + 0.5 * ext_i, ci[2] + 2.2 * ext_i], list(ci),
        [0, 1, 0], 55.0, 256, 256)
    oic, dic = cam_ic.generate_rays(pixi // 256, pixi % 256,
                                    jnp.zeros(n), jnp.zeros(n))
    row_stats(
        "camera_4m_instanced_centered", "Mrays/s",
        f"CENTERED view, {eff_tris/1e6:.1f}M effective tris (same scene)",
        lambda: n / chained_time(t_res, oic, dic, tmx, act, scene_inst,
                                 short=1, long=4, reps=2) / 1e6)

    # full exact frame — packed at the frame megakernel's tuned cluster
    # size (tpc=512 -> K=128: fewer, larger front-to-back visits; the
    # tpc=128 tracer packing costs the same frame ~30% more, measured)
    scene_f = device_scene_from_meshes(
        [random_tri_soup(65536, seed=0)], tris_per_cluster=512)
    lt = np.asarray([[[0.3, 2.0, 0.3], [0.7, 2.0, 0.3], [0.7, 2.0, 0.7]]], np.float32)
    lights = LightTable.from_arrays(lt, np.asarray([[60.0, 60.0, 60.0]], np.float32))
    env = EnvironmentMap.constant((0.4, 0.5, 0.7))
    camera = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0], 45.0, 256, 256)
    cfg = RenderConfig(width=256, height=256, spp=1, bounces=4)

    def frame_slope(frame_fn, short, long, reps=2, extra=()):
        """Chained frame slope with a bounded, BIT-CHANGING seed fold (see
        utils/benchmarking.py): the seed advances by an output-dependent
        step >= 1 each iteration, so every frame in the chain renders a
        DIFFERENT integer seed and the relay cannot fast-path bit-identical
        repeats (the old `s + v*1e-30` fold underflowed against the f32
        seed -> all iterations identical)."""
        @jax.jit
        def chain(s0, nc, *extra):
            def step(i, carry):
                s, acc = carry
                v = frame_fn(s, *extra)
                bump = (jnp.clip(v, -1.0, 1.0) + 1.001)[0] * (
                    1.0 + i.astype(jnp.float32))
                return s + bump, acc + v[0]
            _, acc = jax.lax.fori_loop(0, nc, step, (s0, jnp.float32(0)))
            return acc

        s0 = jnp.asarray([7.0], jnp.float32)
        float(np.asarray(chain(s0, 1, *extra)))
        ts = {}
        for nc in (short, long):
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                float(np.asarray(chain(s0 + np.random.rand(), nc, *extra)))
                best = min(best, time.time() - t0)
            ts[nc] = best
        return (ts[long] - ts[short]) / (long - short)

    def frame(seed_f):
        direct, env_img, _diag = render_sample(
            scene_f, lights, env, camera, seed_f[0].astype(jnp.int32), cfg)
        return jnp.sum(direct + env_img).reshape(1)

    per = frame_slope(frame, 2, 7)
    rays = 256 * 256 * cfg.bounces * (1 + cfg.shadow_path_count)
    row("frame_exact", per * 1e3, "ms",
        f"256x256 1spp 4 bounces incl NEE ({rays/per/1e6:.1f} Mrays/s eq)")

    # Russian-roulette frames (RenderConfig.russian_roulette; unbiased —
    # expectation gated in tests/test_rr.py): paths entering bounce >= rr
    # are survival-tested, shrinking the dominant deep-bounce closest
    # wavefronts.  Both thresholds recorded; equal-quality budget evidence
    # in artifacts/rr_budget.json (scripts/bench_estimators.py).
    import dataclasses as _dc

    for rr in (1, 2):
        cfg_rr = _dc.replace(cfg, russian_roulette=rr)

        def frame_rr(seed_f, cfg_rr=cfg_rr):
            direct, env_img, _diag = render_sample(
                scene_f, lights, env, camera, seed_f[0].astype(jnp.int32),
                cfg_rr)
            return jnp.sum(direct + env_img).reshape(1)

        per = frame_slope(frame_rr, 2, 7)
        row(f"frame_exact_rr{rr}", per * 1e3, "ms",
            f"256x256 1spp 4 bounces, russian_roulette={rr}")

    # spp-batched frame: ALL spp ride ONE megakernel launch (grid inner
    # dim, render_frame_fused(spp=)) — pins the measured 13-17% launch
    # amortization vs spp sequential calls (round-4 sweep_fused note)
    from pg2024_dprt_tpu.render.engine import render_image

    cfg_s4 = _dc.replace(cfg, spp=4)

    def frame_s4(seed_f):
        img = render_image(scene_f, lights, env, camera, cfg_s4,
                           base_sample=seed_f[0].astype(jnp.int32))
        return jnp.sum(img).reshape(1)

    per = frame_slope(frame_s4, 1, 4)
    row("frame_exact_spp4", per * 1e3, "ms",
        "256x256 4spp 4 bounces, all spp fused in one launch")

    # the same full frame at the massive-scene scale the reference targets
    # (frame megakernel with HBM-streamed cluster tables).  The 1M scene
    # rides as a jit ARG: embedded at 89 MiB it blows the relay's
    # remote_compile body limit (HTTP 413) and the compile cache
    def frame_1m(seed_f, sc):
        direct, env_img, _diag = render_sample(
            sc, lights, env, camera, seed_f[0].astype(jnp.int32), cfg)
        return jnp.sum(direct + env_img).reshape(1)

    per = frame_slope(frame_1m, 1, 4, extra=(scene1m,))
    row("frame_1m", per * 1e3, "ms",
        "256x256 1spp 4 bounces incl NEE, 1M tris, HBM-streamed tables")

    # the BASELINE-scale scene as a FULL frame (trace+shade+NEE megakernel)
    from pg2024_dprt_tpu.scene import cornell_box

    c_meshes, c_lights = cornell_box()
    scene_c = device_scene_from_meshes(c_meshes, tris_per_cluster=128)
    cam_c = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                           40.0, 256, 256)
    env_c = EnvironmentMap.constant((0.0, 0.0, 0.0))

    def frame_c(seed_f):
        direct, env_img, _diag = render_sample(
            scene_c, c_lights, env_c, cam_c, seed_f[0].astype(jnp.int32), cfg)
        return jnp.sum(direct + env_img).reshape(1)

    per = frame_slope(frame_c, 2, 10)
    row("frame_cornell", per * 1e3, "ms",
        "256x256 1spp 4 bounces incl NEE, cornell scene")

    # textured full frame: the megakernel's in-kernel bilinear texture
    # fetch (scanline pool + separable one-hot, ops/pallas_frame.py) —
    # before round 2 any textured scene fell back to the composed pipeline
    from pg2024_dprt_tpu.scene import MeshGeometry
    from pg2024_dprt_tpu.scene.textures import checkerboard

    t_meshes, t_lights = cornell_box()
    t_uv = np.asarray([[0, 0], [0, 1], [1, 1], [0, 0], [1, 1], [1, 0]],
                      np.float32)
    t_floor = t_meshes[0]
    t_meshes[0] = MeshGeometry(
        v0=t_floor.v0, v1=t_floor.v1, v2=t_floor.v2,
        uv0=t_uv[0::3], uv1=t_uv[1::3], uv2=t_uv[2::3],
        base_color=t_floor.base_color, texture_index=0, name="floor")
    scene_t = device_scene_from_meshes(
        t_meshes, tris_per_cluster=128,
        textures=[checkerboard(res=256, tiles=8)])

    def frame_t(seed_f):
        direct, env_img, _diag = render_sample(
            scene_t, t_lights, env_c, cam_c, seed_f[0].astype(jnp.int32), cfg)
        return jnp.sum(direct + env_img).reshape(1)

    per = frame_slope(frame_t, 2, 10)
    row("frame_textured", per * 1e3, "ms",
        "256x256 1spp 4 bounces incl NEE, textured cornell (256^2 "
        "checkerboard, in-kernel bilinear fetch)")

    # full neural routing stage (secondaryRayModuleBasedNN analogue,
    # renderer.cpp:1407-1452): local closest hit + proxy AABB march +
    # vis/depth grouped inference + prediction consumption, one jitted stage
    from pg2024_dprt_tpu.core.types import PathState
    from pg2024_dprt_tpu.render.proxy_stages import secondary_route
    from pg2024_dprt_tpu.scene.geometry import ProxyTable

    # 8 unit proxy boxes surrounding the local scene ([0,1]^3) so escaping
    # rays march real neighbors — a realistic per-partition neighborhood
    p_count = 8
    offs = np.asarray(
        [[-1.05, 0, 0], [1.05, 0, 0], [0, -1.05, 0], [0, 1.05, 0],
         [0, 0, -1.05], [0, 0, 1.05], [-1.05, -1.05, 0], [1.05, 1.05, 0]],
        np.float32,
    )
    p_lo, p_hi = offs, offs + 1.0
    proxies = ProxyTable(
        aabb_min=jnp.asarray(p_lo), aabb_max=jnp.asarray(p_hi),
        max_length=jnp.asarray(np.linalg.norm(p_hi - p_lo, axis=1)),
    )
    route_models = random_proxy_models(jax.random.PRNGKey(1), p_count)
    base_paths = PathState.empty(n)._replace(
        tmax=jnp.full((n,), 3.4e38, jnp.float32),
        throughput=jnp.ones((n, 3), jnp.float32),
        pixel_index=jnp.asarray(np.arange(n, dtype=np.int32)),
        is_valid=jnp.ones((n,), bool),
    )

    def route_t(o, d, tmx, act):
        paths = base_paths._replace(origin=o, direction=d)
        new_paths, env_add, _ = secondary_route(
            scene, proxies, route_models, env, paths, jnp.int32(p_count),
            max_hits=3, eps=1e-3, frame_buffer_size=n,
        )
        return new_paths.tmax

    per = chained_time(route_t, ro, rd, tmx, act, short=1, long=4, reps=2)
    row("neural_route_64k", n / per / 1e6, "Mpaths/s",
        f"{per*1e3:.2f} ms: trace + proxy march + vis/depth NN + routing, "
        f"{p_count} proxies")

    # grouped neural-proxy inference (VisNNTime analogue)
    models = random_proxy_models(jax.random.PRNGKey(0), 8)
    q = 65536
    feats = jnp.asarray(np.random.RandomState(5).rand(q, PROD_VIS.in_features).astype(np.float32))
    obj = jnp.asarray(np.random.RandomState(6).randint(0, 8, size=q).astype(np.int32))
    vmask = jnp.ones((q,), bool)

    def mlp_t(f, obj, vmask):
        return apply_grouped(models.vis_params, PROD_VIS, f, obj, vmask, 8)

    per = chained_time(mlp_t, feats, obj, vmask)
    row("grouped_mlp", q / per / 1e6, "Mqueries/s",
        f"{per*1e3:.2f} ms for 64k queries over 8 objects (vis net)")

    # INSTANCED proxy march on the Pallas kernel (VERDICT r3 #5: instanced
    # tables previously fell back to the measured-15x-slower XLA path) —
    # 16 instance rows over 4 objects, per-visit world_to_obj featurization
    from pg2024_dprt_tpu.ops.pallas_march import march_proxies_pallas
    from pg2024_dprt_tpu.scene.geometry import ProxyTable

    prng = np.random.RandomState(17)
    pi = 16
    offs = (prng.rand(pi, 3).astype(np.float32) * 4.0 - 1.5)
    sc = (0.4 + prng.rand(pi).astype(np.float32) * 0.8)
    mtx = np.zeros((pi, 3, 4), np.float32)
    for i in range(pi):
        mtx[i, :, :3] = np.eye(3, dtype=np.float32) / sc[i]
        mtx[i, :, 3] = -offs[i] / sc[i]
    iproxies = ProxyTable(
        aabb_min=jnp.asarray(offs),
        aabb_max=jnp.asarray(offs + sc[:, None]),
        max_length=jnp.asarray(np.full((pi,), np.sqrt(3.0), np.float32)),
        obj_id=jnp.asarray(np.arange(pi, dtype=np.int32) % 4),
        node_id=jnp.asarray(np.arange(pi, dtype=np.int32) % 8),
        world_to_obj=jnp.asarray(mtx),
        obj_min=jnp.zeros((pi, 3), np.float32),
        obj_span=jnp.ones((pi, 3), np.float32))
    mo = jnp.asarray(prng.rand(n, 3).astype(np.float32) * 5.0 - 2.0)
    md_np = prng.randn(n, 3).astype(np.float32)
    md = jnp.asarray(md_np / np.linalg.norm(md_np, axis=1, keepdims=True))
    mcap = jnp.full((n,), 3.4e38, jnp.float32)
    mact = jnp.ones((n,), bool)

    def march_t(o_, d_, cap_, act_, px_):
        qm = march_proxies_pallas(px_, o_, d_, cap_, act_, jnp.int32(31), 3,
                                  1e-3)
        return jnp.where(qm.is_valid, jnp.minimum(qm.aabb_t, 1.0), 1.0)

    per = chained_time(march_t, mo, md, mcap, mact, iproxies)
    row("march_instanced", n / per / 1e6, "Mrays/s",
        f"{per*1e3:.2f} ms: 64k rays x 16 instanced proxies, max_hits=3, "
        "in-kernel object-space featurization")

    # offline training stack on the chip (reference recipe main.py:75-171:
    # batch 12800, Adam, MSE vis loss) — one full fwd+bwd+Adam step
    from pg2024_dprt_tpu.models.mlp import init_mlp
    from pg2024_dprt_tpu.train.loop import TrainConfig, _train_step, make_optimizer

    tparams = init_mlp(jax.random.PRNGKey(3), PROD_VIS)
    tcfg = TrainConfig()
    ttx = make_optimizer(tcfg)
    topt = ttx.init(tparams)
    tb = tcfg.batch
    tx_x = jnp.asarray(
        np.random.RandomState(7).rand(tb, PROD_VIS.in_features).astype(np.float32))
    tx_y = jnp.asarray(
        (np.random.RandomState(8).rand(tb) > 0.5).astype(np.float32))

    def train_t(x, tparams, topt):
        p2, _o2, loss = _train_step(tparams, topt, x, tx_y, PROD_VIS, "vis", ttx)
        # fold a term over every updated leaf so the whole backward pass +
        # optimizer update survives DCE under the chained fold
        reg = sum(jnp.sum(l) for l in jax.tree.leaves(p2))
        return jnp.reshape(loss + 1e-9 * reg, (1,))

    # params/opt ride as ARGS (the file-wide rule): keeps the HLO byte-stable
    # and the relay compile body small.  A 0.05-0.3 ms step sits below
    # tunnel RTT noise at chain length 12 (committed rows swung 40-258
    # Msamples/s run to run) — the tiny-kernel rule from bench.py applies:
    # long chains + more reps
    per = chained_time(train_t, tx_x, tparams, topt, short=10, long=110,
                       reps=3)
    row("train_step", tb / per / 1e6, "Msamples/s",
        f"{per*1e3:.2f} ms/step, batch 12800, PROD vis net (w256 d4), Adam")

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/bench_suite.json", "w") as f:
        json.dump({"ts": time.time(), "rows": ROWS}, f, indent=1)
    print("wrote artifacts/bench_suite.json")


if __name__ == "__main__":
    main()
