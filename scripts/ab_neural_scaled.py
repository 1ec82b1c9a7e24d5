"""SCALED neural A-B artifact (VERDICT r4 #7): P=8 rooms, w128·d4 nets,
64x64 eval, all three model families (separate vis+depth, combined
SEPARATEDNN=0, multi-geo shared net) through the SAME distributed A-B.

Three phases, because backends disagree: datagen needs the CPU stackless
traversal, training wants the accelerator's device-resident loop, and the
P=8 distributed render needs the virtual CPU mesh.  The script re-execs
itself per phase and hands off through artifacts/ab_scaled/:

    datasets.npz  (phase 1, CPU)    per-partition features/depths
    weights.npz   (phase 2, accel)  all trained nets, flat key namespace
    ab_report.json(phase 3, CPU mesh) measured A-B errors per family

tests/test_neural_end_to_end.py::test_scaled_ab_with_committed_weights
consumes weights.npz + ab_report.json — its tolerances are the measured
errors with headroom, justified by this artifact instead of guessed.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_neural_scaled.py
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

PARTS = 8
SIDE = 64
RAYS = 200_000
EPOCHS = 240          # report label; actual epochs derive from TARGET_STEPS
TARGET_STEPS = 30_000
W, D = 128, 4
OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts", "ab_scaled")


def _scene():
    """A row of 8 statue objects, one per partition — COMPACT per-partition
    geometry, the regime the reference's proxies are built for (each MPI
    rank owns a statue-class object, renderer.cpp:1726-1796).  Sparse
    thin-triangle rooms measured UNLEARNABLE for the 5-input nets (vis MSE
    stuck at ~0.23 balanced = coin flipping); statue-class objects train to
    reference-class loss (artifacts/proxy_quality.json)."""
    from pg2024_dprt_tpu.core import Camera
    from pg2024_dprt_tpu.scene import build_partitioned_scene
    from pg2024_dprt_tpu.scene.geometry import MeshGeometry
    from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable
    from pg2024_dprt_tpu.scene.procedural import statue_mesh

    # statues nearly touching + a small END-OF-ROW light low to the ground:
    # every statue shadows its neighbors (the NN occlusion path must answer
    # REMOTE visibility) and bounce rays routinely enter adjacent statues'
    # AABBs (the NN routing path decides real migrations) — p90 err was
    # EXACTLY 0 with a top light and wide spacing (proxies never consulted
    # on anything that mattered)
    meshes = []
    for i in range(PARTS):
        m = statue_mesh(32, seed=i)
        off = np.asarray([1.1 * i, 0.0, 0.0], np.float32)
        meshes.append(MeshGeometry(
            v0=m.v0 + off, v1=m.v1 + off, v2=m.v2 + off,
            base_color=(0.75, 0.70, 0.62), name=f"statue{i}"))
    part = build_partitioned_scene(meshes, PARTS)
    cx = 1.1 * (PARTS - 1) * 0.5 + 0.5
    # SIDE-GRAZING light past the row's end at statue height: NEE rays from
    # every camera-visible front sweep laterally through the neighbors'
    # AABBs, so the NN occlusion path answers consequential remote
    # visibility on visible pixels (measured: an all-miss predictor — what
    # an untrained net collapses to — shifts the image ~50x more than the
    # trained nets do; the eval's random-weight CONTROL pins that)
    xe = 1.1 * (PARTS - 1) + 2.5
    quad = np.asarray(
        [[[xe - 0.4, 0.2, 0.1], [xe + 0.4, 0.2, 0.1], [xe + 0.4, 1.0, 0.9]],
         [[xe - 0.4, 0.2, 0.1], [xe + 0.4, 1.0, 0.9], [xe - 0.4, 1.0, 0.9]]],
        np.float32)
    lights = LightTable.from_arrays(quad, np.full((2, 3), 60.0, np.float32))
    env = EnvironmentMap.constant((0.25, 0.25, 0.3))
    camera = Camera.look_at([cx, 1.5, 4.6], [cx, 0.5, 0.5], [0, 1, 0],
                            60.0, SIDE, SIDE)
    return meshes, lights, part, env, camera


def phase_datagen():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pg2024_dprt_tpu.scene.geometry import device_scene_from_meshes
    from pg2024_dprt_tpu.scene.partition import partition_meshes
    from pg2024_dprt_tpu.train import generate_proxy_dataset

    meshes, _, part, _, _ = _scene()
    assignment = partition_meshes(meshes, PARTS)
    out = {}
    for p, idxs in enumerate(assignment):
        sub = device_scene_from_meshes([meshes[i] for i in idxs])
        lo = np.asarray(part.proxies.aabb_min[p])
        hi = np.asarray(part.proxies.aabb_max[p])
        feats, dpt = generate_proxy_dataset(sub, lo, hi, RAYS, seed=100 + p)
        out[f"feats{p}"] = feats
        out[f"depth{p}"] = dpt
        print(f"datagen p{p}: hit {(dpt != 1.0).mean():.3f}", flush=True)
    np.savez(os.path.join(OUT, "datasets.npz"), **out)


def phase_train():
    import jax

    from pg2024_dprt_tpu.models.mlp import MLPConfig
    from pg2024_dprt_tpu.train import TrainConfig, balance_vis, depth_only, fit
    from pg2024_dprt_tpu.train.datasets import combined_labels, multi_geo_features

    ds = np.load(os.path.join(OUT, "datasets.npz"))
    vis_cfg = MLPConfig(width=W, depth=D)
    comb_cfg = MLPConfig(width=W, depth=D, out_features=2,
                         final_activation="sigmoid")
    mg_cfg = MLPConfig(width=W, depth=D, in_features=6, multi_geo=True)
    t0 = time.time()
    weights = {}
    losses = {}

    def tc(nn_type, n_rows):
        # fixed STEP budget, not epoch count: these per-room datasets are
        # 25-65k rows (vs the statue's 3.1M), so a fixed epoch count
        # undertrains by 100x (measured: vis stuck at 0.23 MSE after 240
        # epochs = 720 steps; the statue's 0.0046 took ~90k steps)
        batch = min(4096, max(1024, n_rows))
        steps_per_epoch = max(1, (n_rows * 4) // (5 * batch))  # 80% train
        epochs = max(1, TARGET_STEPS // steps_per_epoch)
        return TrainConfig(nn_type=nn_type, epochs=epochs, batch=batch,
                           learn_rate=5e-4, epochs_per_call=100)

    def fit_checked(xx, yy, mcfg, tcfg, gate):
        """Tunnel robustness: a fit that lands above `gate` (collapse-level
        loss) is re-run once — mid-process training collapse was observed
        on the relay (see _fit_device notes) and is transient."""
        p_, h_ = fit(xx, yy, mcfg, tcfg, device_loop=True)
        if h_["test_loss"][-1] > gate:
            print(f"  RETRY: {tcfg.nn_type} loss "
                  f"{h_['test_loss'][-1]:.4f} > {gate}", flush=True)
            p_, h_ = fit(xx, yy, mcfg, tcfg, device_loop=True)
        return p_, h_

    mg_f, mg_d = [], []
    for p in range(PARTS):
        feats, dpt = ds[f"feats{p}"], ds[f"depth{p}"]
        mg_f.append(feats)
        mg_d.append(dpt)
        xv, yv = balance_vis(feats, dpt)
        vp, hv = fit_checked(xv, yv, vis_cfg, tc("vis", xv.shape[0]), 0.1)
        xd, yd = depth_only(feats, dpt)
        if xd.shape[0] < 256:
            xd, yd = feats, dpt
        dp, hd = fit_checked(xd, yd, vis_cfg, tc("depth", xd.shape[0]), 0.05)
        xc, yc = combined_labels(feats, dpt)
        cp, hc = fit_checked(xc, yc, comb_cfg, tc("combined", xc.shape[0]),
                             0.15)
        losses[f"p{p}"] = dict(vis=hv["test_loss"][-1],
                               depth=hd["test_loss"][-1],
                               combined=hc["test_loss"][-1])
        print(f"p{p}: {losses[f'p{p}']} ({time.time()-t0:.0f}s)", flush=True)
        for name, params in (("vis", vp), ("depth", dp), ("comb", cp)):
            for k, v in params.items():
                weights[f"{name}{p}/{k}"] = np.asarray(v)

    mgf, mgd = multi_geo_features(mg_f, mg_d)
    xv, yv = balance_vis(mgf, mgd)
    mvp, hmv = fit(xv, yv, mg_cfg, tc("vis", xv.shape[0]), device_loop=True)
    hit = mgd != 1.0
    mdp, hmd = fit(mgf[hit], mgd[hit].astype(np.float32), mg_cfg,
                   tc("depth", int(hit.sum())), device_loop=True)
    losses["multigeo"] = dict(vis=hmv["test_loss"][-1],
                              depth=hmd["test_loss"][-1])
    print("multigeo:", losses["multigeo"], flush=True)
    for name, params in (("mgvis", mvp), ("mgdepth", mdp)):
        for k, v in params.items():
            weights[f"{name}/{k}"] = np.asarray(v)
    np.savez(os.path.join(OUT, "weights.npz"), **weights)
    with open(os.path.join(OUT, "train_losses.json"), "w") as f:
        json.dump(losses, f, indent=1)


def load_models(path=None):
    """Reassemble the three ProxyModels families from weights.npz (shared
    with the test)."""
    from pg2024_dprt_tpu.models import stack_params
    from pg2024_dprt_tpu.models.mlp import MLPConfig
    from pg2024_dprt_tpu.models.proxy import (
        ProxyModels, combined_proxy_models, multigeo_proxy_models)

    w = np.load(path or os.path.join(OUT, "weights.npz"))
    vis_cfg = MLPConfig(width=W, depth=D)
    comb_cfg = MLPConfig(width=W, depth=D, out_features=2,
                         final_activation="sigmoid")
    mg_cfg = MLPConfig(width=W, depth=D, in_features=6, multi_geo=True)

    def net(prefix):
        pre = prefix + "/"
        return {k[len(pre):]: w[k] for k in w.files if k.startswith(pre)}

    vis = stack_params([net(f"vis{p}") for p in range(PARTS)])
    dep = stack_params([net(f"depth{p}") for p in range(PARTS)])
    comb = stack_params([net(f"comb{p}") for p in range(PARTS)])
    models_sep = ProxyModels(vis, dep, PARTS, vis_cfg, vis_cfg)
    models_comb = combined_proxy_models(comb, PARTS, comb_cfg)
    models_mg = multigeo_proxy_models(net("mgvis"), net("mgdepth"), PARTS,
                                      mg_cfg, mg_cfg)
    return models_sep, models_comb, models_mg


def phase_eval():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pg2024_dprt_tpu.parallel import make_mesh, render_image_distributed
    from pg2024_dprt_tpu.render import RenderConfig

    _, lights, part, env, camera = _scene()
    mesh = make_mesh(PARTS)
    models_sep, models_comb, models_mg = load_models()
    cfg_exact = RenderConfig(width=SIDE, height=SIDE, spp=2, bounces=2)
    cfg_nn = RenderConfig(width=SIDE, height=SIDE, spp=2, bounces=2,
                          use_neural_proxies=True)
    exact = np.asarray(render_image_distributed(
        part, models_sep, lights, env, camera, cfg_exact, mesh))
    tm = lambda x: x / (1.0 + x)
    report = {"parts": PARTS, "side": SIDE, "width": W, "depth": D,
              "epochs": EPOCHS, "rays": RAYS, "families": {}}
    # RANDOM-weight control: an untrained leaky-relu net is a near-constant
    # all-miss predictor, so this measures how much a WRONG proxy can move
    # THIS image — the trained families must beat it by a wide margin or
    # the A-B is vacuous (closed-room scenes measured bit-identical under
    # any weights: zero consequential cross-partition queries)
    from pg2024_dprt_tpu.models.mlp import MLPConfig as _MC
    from pg2024_dprt_tpu.models.proxy import random_proxy_models as _rpm

    rnd_models = _rpm(__import__("jax").random.PRNGKey(3), PARTS,
                      _MC(width=W, depth=D), _MC(width=W, depth=D))
    for name, models in (("random_control", rnd_models),
                         ("separate", models_sep), ("combined", models_comb),
                         ("multigeo", models_mg)):
        nn = np.asarray(render_image_distributed(
            part, models, lights, env, camera, cfg_nn, mesh))
        err = np.abs(tm(nn) - tm(exact))
        row = dict(mean_err=float(err.mean()),
                   p90_err=float(np.percentile(err, 90)),
                   ratio=float(nn.mean() / exact.mean()))
        report["families"][name] = row
        print(name, row, flush=True)
    with open(os.path.join(OUT, "ab_report.json"), "w") as f:
        json.dump(report, f, indent=1)


def _reexec(phase, cpu):
    env = dict(os.environ)
    env["_AB_SCALED_PHASE"] = phase
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        env["PYTHONPATH"] = os.pathsep.join(
            [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
            + [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))])
    r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
    assert r.returncode == 0, f"phase {phase} failed"


def main():
    os.makedirs(OUT, exist_ok=True)
    if not os.path.exists(os.path.join(OUT, "datasets.npz")):
        _reexec("datagen", cpu=True)
    if not os.path.exists(os.path.join(OUT, "weights.npz")):
        _reexec("train", cpu=False)
    _reexec("eval", cpu=True)


if __name__ == "__main__":
    phase = os.environ.get("_AB_SCALED_PHASE")
    if phase == "datagen":
        phase_datagen()
    elif phase == "train":
        phase_train()
    elif phase == "eval":
        phase_eval()
    else:
        main()
