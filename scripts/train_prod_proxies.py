"""Train PRODUCTION-size proxy nets to reference-class loss (VERDICT r4 #2).

The reference's checked-in quality evidence is PROD w256·d4 nets trained on
the CHEVAL_MARLY statue to vis MSE ≈0.0044 (120 epochs) and depth L1 ≈0.0172
(/root/reference/trainingcode/main.py:133, nnVis.py:54,78).  This script
reproduces that artifact on the procedural statue demo object
(scene/procedural.py::statue_mesh): it generates the training set with the
production traversal (datagen on the CPU backend — per-ray BVH stepping is
pathological on TPU), trains PROD vis + depth nets and one combined
SEPARATEDNN=0 net on the accelerator, evaluates on a FRESH held-out ray set,
writes loss-stamped npz checkpoints under artifacts/proxies/, and commits
artifacts/proxy_quality.json with the quality gates:

    vis MSE  <= 0.005   (reference-class)
    depth L1 <= 0.02

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/train_prod_proxies.py
(~25-40 min on the tunnel chip; --fast trains w64·d2 for smoke testing)
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

from pg2024_dprt_tpu.models.mlp import (
    COMBINED_VISDEPTH, MLPConfig, PROD_DEPTH, PROD_VIS, apply_mlp,
    half_vs_full_error)
from pg2024_dprt_tpu.scene import device_scene_from_meshes
from pg2024_dprt_tpu.scene.procedural import statue_mesh
from pg2024_dprt_tpu.train.datagen import generate_proxy_dataset
from pg2024_dprt_tpu.train.datasets import balance_vis, combined_labels, depth_only
from pg2024_dprt_tpu.train.eval import (
    combined_accuracy, depth_accuracy, save_prediction_exr)
from pg2024_dprt_tpu.train.loop import TrainConfig, fit, save_checkpoint

FAST = "--fast" in sys.argv
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "artifacts")


def _datagen(path: str):
    """Child phase (CPU platform forced): cast rays with the production
    traversal and save the train + eval datasets as one npz."""
    mesh = statue_mesh(48, seed=0)
    scene = device_scene_from_meshes([mesh])
    lo, hi = mesh.aabb()
    n_train = 100_000 if FAST else 4_000_000
    feats, labels = generate_proxy_dataset(scene, lo, hi, n_train, seed=1)
    feats_eval, labels_eval = generate_proxy_dataset(
        scene, lo, hi, n_train // 8, seed=777)
    np.savez(path, feats=feats, labels=labels,
             feats_eval=feats_eval, labels_eval=labels_eval,
             num_tris=mesh.num_triangles)


def _datagen_via_subprocess(path: str):
    """Run _datagen in a CPU-forced child (the axon tunnel platform makes
    per-ray BVH stepping pathological, and env JAX_PLATFORMS alone is
    ignored once sitecustomize registered the backend)."""
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["_PG2024_TRAIN_DATAGEN"] = path
    pyp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
           if p and "axon" not in p]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(pyp + [repo])
    r = subprocess.run([sys.executable, os.path.abspath(__file__)]
                       + (["--fast"] if FAST else []), env=env)
    assert r.returncode == 0, "datagen child failed"


def main():
    t_start = time.time()
    mesh = statue_mesh(48, seed=0)
    print(f"statue: {mesh.num_triangles} tris", flush=True)

    os.makedirs(os.path.join(OUT_DIR, "proxies"), exist_ok=True)
    ds_path = os.path.join(OUT_DIR, "proxies", "statue_dataset.npz")
    n_want = 100_000 if FAST else 4_000_000
    if (not os.path.exists(ds_path)
            or np.load(ds_path)["feats"].shape[0] != n_want):
        _datagen_via_subprocess(ds_path)
    ds = np.load(ds_path)
    feats, labels = ds["feats"], ds["labels"]
    feats_eval, labels_eval = ds["feats_eval"], ds["labels_eval"]
    print(f"dataset: {feats.shape[0]} rows, hit fraction "
          f"{(labels != 1.0).mean():.3f} ({time.time() - t_start:.0f}s), "
          f"training on {jax.default_backend()}", flush=True)

    epochs = 5 if FAST else 120
    vis_cfg = MLPConfig(width=64, depth=2) if FAST else PROD_VIS
    depth_cfg = MLPConfig(width=64, depth=2) if FAST else PROD_DEPTH
    comb_cfg = (MLPConfig(width=64, depth=2, out_features=2,
                          final_activation="sigmoid")
                if FAST else COMBINED_VISDEPTH)

    ckpt_dir = os.path.join(OUT_DIR, "proxies")
    os.makedirs(ckpt_dir, exist_ok=True)

    # --- vis net (balanced dataset, MSE; reference main.py recipe; the
    # binary decision boundary needs more epochs than the smooth depth
    # field: 120 -> 0.0095, 360 with device-loop training is still <6 min) ---
    fx, fy = balance_vis(feats, labels)
    t0 = time.time()
    vis_params, vis_hist = fit(
        fx, fy, vis_cfg, TrainConfig(nn_type="vis", epochs=3 * epochs),
        verbose=True)
    vis_train_s = time.time() - t0
    # eval on FRESH balanced rows (same distribution as the reference's
    # training-MSE number) and on the raw unbalanced stream
    ex, ey = balance_vis(feats_eval, labels_eval, seed=3)
    vis_mse_bal = float(np.mean(
        (np.asarray(apply_mlp(vis_params, jnp.asarray(ex), vis_cfg)) - ey) ** 2))
    raw_y = (labels_eval != 1.0).astype(np.float32)
    vis_mse_raw = float(np.mean(
        (np.asarray(apply_mlp(vis_params, jnp.asarray(feats_eval), vis_cfg))
         - raw_y) ** 2))
    save_checkpoint(os.path.join(
        ckpt_dir, f"vis_prod-loss={vis_mse_bal:.6f}"), vis_params)
    print(f"vis: balanced MSE {vis_mse_bal:.6f} raw {vis_mse_raw:.6f} "
          f"({vis_train_s:.0f}s)", flush=True)

    # --- depth net (hits only, L1) ---
    dx, dy = depth_only(feats, labels)
    t0 = time.time()
    depth_params, depth_hist = fit(
        dx, dy, depth_cfg, TrainConfig(nn_type="depth", epochs=epochs),
        verbose=True)
    depth_train_s = time.time() - t0
    dex, dey = depth_only(feats_eval, labels_eval)
    depth_l1 = float(np.mean(np.abs(
        np.asarray(apply_mlp(depth_params, jnp.asarray(dex), depth_cfg)) - dey)))
    save_checkpoint(os.path.join(
        ckpt_dir, f"depth_prod-loss={depth_l1:.6f}"), depth_params)
    print(f"depth: eval L1 {depth_l1:.6f} ({depth_train_s:.0f}s)", flush=True)

    # --- combined SEPARATEDNN=0 double-output net ---
    cx, cy = combined_labels(feats, labels)
    t0 = time.time()
    comb_params, comb_hist = fit(
        cx, cy, comb_cfg, TrainConfig(nn_type="combined", epochs=epochs),
        verbose=True)
    comb_train_s = time.time() - t0
    comb_metrics = combined_accuracy(comb_params, comb_cfg, feats_eval,
                                     labels_eval)
    save_checkpoint(os.path.join(
        ckpt_dir, f"combined_prod-depthl1={comb_metrics['depth_l1']:.6f}"),
        comb_params)
    print(f"combined: {comb_metrics} ({comb_train_s:.0f}s)", flush=True)

    # --- reference-style eval artifacts ---
    acc = depth_accuracy(vis_params, vis_cfg, depth_params, depth_cfg,
                         feats_eval, labels_eval)
    save_prediction_exr(os.path.join(ckpt_dir, "vis_pred_960x540.exr"),
                        vis_params, vis_cfg)
    bf16_err = float(half_vs_full_error(
        vis_params, jnp.asarray(feats_eval[:65536]), vis_cfg))

    gates = {
        "vis_mse_le_0.005": vis_mse_bal <= 0.005,
        "depth_l1_le_0.02": depth_l1 <= 0.02,
    }
    report = {
        "ts": time.time(),
        "object": f"statue_mesh(48) {mesh.num_triangles} tris",
        "config": {
            "width": vis_cfg.width, "depth": vis_cfg.depth,
            "epochs": epochs, "train_rows": int(feats.shape[0]),
            "eval_rows": int(feats_eval.shape[0]), "fast": FAST,
            "backend": jax.default_backend(),
        },
        "vis": {
            "eval_mse_balanced": vis_mse_bal,
            "eval_mse_raw": vis_mse_raw,
            "final_train_loss": vis_hist["train_loss"][-1],
            "final_test_loss": vis_hist["test_loss"][-1],
            "train_seconds": vis_train_s,
            "reference_target": 0.0044,
        },
        "depth": {
            "eval_l1": depth_l1,
            "final_train_loss": depth_hist["train_loss"][-1],
            "final_test_loss": depth_hist["test_loss"][-1],
            "train_seconds": depth_train_s,
            "reference_target": 0.0172,
        },
        "combined": dict(comb_metrics,
                         final_test_loss=comb_hist["test_loss"][-1],
                         train_seconds=comb_train_s),
        "accuracy": acc,
        "bf16_vs_f32_mean_abs": bf16_err,
        "gates": gates,
        "pass": all(gates.values()),
    }
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "proxy_quality.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in ("vis", "depth", "gates", "pass")},
                     indent=1))
    print(f"wrote {path} ({time.time() - t_start:.0f}s total)")


if __name__ == "__main__":
    child_path = os.environ.get("_PG2024_TRAIN_DATAGEN")
    if child_path:
        jax.config.update("jax_platforms", "cpu")
        _datagen(child_path)
    else:
        main()
