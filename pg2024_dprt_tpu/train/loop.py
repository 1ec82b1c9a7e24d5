"""Proxy-MLP training loop — port of /root/reference/trainingcode/main.py.

Reference recipe (main.py:75-171): seed 19990201, manual mini-batching
(batch 12800), Adam lr 5e-4, ReduceLROnPlateau(factor 0.1, patience 10),
MSE for vis / L1 for depth, periodic loss-stamped checkpoints, per-epoch
reshuffle. Here the step is jitted, optionally data-parallel over a mesh
(batch sharded, grads psum'd by XLA), and checkpoints are orbax pytrees
(the TorchScript export step disappears: the renderer consumes raw stacked
weight arrays directly, SURVEY.md §5 checkpoint notes).
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.mlp import MLPConfig, PROD_DEPTH, PROD_VIS, apply_mlp, init_mlp
from .datagen import generate_proxy_dataset
from .datasets import balance_vis, depth_only, shuffle, split_train_test


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    nn_type: str = "vis"          # "vis" (MSE) | "depth" (L1)
    batch: int = 12800            # main.py:12
    learn_rate: float = 5e-4      # main.py:141
    epochs: int = 50              # reference runs 1000; configurable
    # "plateau" reproduces the reference ReduceLROnPlateau recipe;
    # "cosine" (warmup + cosine decay) converges far faster — default.
    schedule: str = "cosine"
    total_steps_hint: int = 0     # cosine horizon; 0 = epochs * steps/epoch
    plateau_factor: float = 0.1   # main.py:152
    plateau_patience: int = 10
    seed: int = 19990201          # main.py:76
    checkpoint_every: int = 20    # main.py:165
    checkpoint_dir: Optional[str] = None
    # device-resident loop (_fit_device): epochs fused into one jitted
    # program per host round-trip — small datasets have few steps/epoch, so
    # per-epoch RPCs through the tunnel would dominate wall time
    epochs_per_call: int = 25


def _loss_fn(params, x, y, cfg: MLPConfig, nn_type: str):
    if nn_type == "combined":
        # SEPARATEDNN=0 double-output net: MSE on the vis channel + L1 on
        # the depth channel masked to hits (composes the reference's two
        # separated losses, main.py:139-152; y = [vis, depth])
        from ..models.mlp import apply_mlp_all

        pred = apply_mlp_all(params, x, cfg)
        vis_loss = jnp.mean((pred[:, 0] - y[:, 0]) ** 2)
        hit = y[:, 0] > 0.5
        depth_err = jnp.abs(pred[:, 1] - y[:, 1]) * hit
        depth_loss = jnp.sum(depth_err) / jnp.maximum(jnp.sum(hit), 1)
        return vis_loss + depth_loss
    pred = apply_mlp(params, x, cfg)
    if nn_type == "vis":
        return jnp.mean((pred - y) ** 2)  # MSELoss
    return jnp.mean(jnp.abs(pred - y))    # L1Loss


@partial(jax.jit, static_argnames=("mlp_cfg", "nn_type", "tx"))
def _train_step(params, opt_state, x, y, mlp_cfg, nn_type, tx):
    loss, grads = jax.value_and_grad(_loss_fn)(params, x, y, mlp_cfg, nn_type)
    updates, opt_state = tx.update(grads, opt_state, params, value=loss)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@partial(jax.jit, static_argnames=("mlp_cfg", "nn_type"))
def eval_loss(params, x, y, mlp_cfg, nn_type):
    return _loss_fn(params, x, y, mlp_cfg, nn_type)


def make_optimizer(cfg: TrainConfig, total_steps: int = 10_000):
    if cfg.schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learn_rate, min(200, total_steps // 10 + 1),
            max(total_steps, 2), cfg.learn_rate * 1e-3,
        )
        tx = optax.adam(sched)
    else:
        tx = optax.chain(
            optax.adam(cfg.learn_rate),
            optax.contrib.reduce_on_plateau(
                factor=cfg.plateau_factor, patience=cfg.plateau_patience
            ),
        )
    # uniform update signature: `value=` accepted (consumed by plateau only)
    return optax.with_extra_args_support(tx)


def _fit_device(features, labels, mlp_cfg: MLPConfig, cfg: TrainConfig,
                params=None, verbose=False):
    """Device-resident training loop: the whole dataset is uploaded ONCE,
    each epoch is ONE jitted program (on-device shuffle via
    jax.random.permutation + lax.scan over batches), and only the epoch
    losses come back to the host.  On the tunnel backend the host-driven
    loop pays a full RTT + batch upload PER STEP (~1 s/step measured — a
    PROD net would take hours); this form runs the same optimizer math at
    one RPC per epoch.  The reference's torch loop is host-driven
    (trainingcode/main.py:135-165) — this is the TPU-idiomatic re-design,
    not a port."""
    key = jax.random.PRNGKey(cfg.seed)
    if params is None:
        params = init_mlp(key, mlp_cfg)

    train_x, train_y, test_x, test_y = split_train_test(
        features, labels, seed=cfg.seed & 0xFFFF)
    n = train_x.shape[0]
    b = min(cfg.batch, n)
    steps_per_epoch = max(1, n // b)
    total_steps = cfg.total_steps_hint or cfg.epochs * steps_per_epoch
    tx = make_optimizer(cfg, total_steps)
    opt_state = tx.init(params)

    x = jnp.asarray(train_x, jnp.float32)
    y = jnp.asarray(train_y, jnp.float32)
    tx_b = min(4 * b, test_x.shape[0]) if test_x.shape[0] else 0
    ex = jnp.asarray(test_x[:tx_b], jnp.float32)
    ey = jnp.asarray(test_y[:tx_b], jnp.float32)

    # chunk epochs into ONE jitted program each (nested scan: epochs x
    # steps) — small datasets have few steps/epoch, so per-epoch RPCs would
    # re-dominate wall time on the tunnel exactly like per-step ones did.
    # The dataset rides as ARGUMENTS, not closure captures: closed-over
    # device arrays are hoisted jaxpr consts, and sequential fits with
    # identical (params, e0) args but different embedded datasets were
    # observed COLLAPSING mid-process on the tunnel (p0-p3 trained to
    # 0.018, p4+ stuck at init-level 0.23 — same code, same shapes); with
    # the data in the argument list every call is honestly distinct.
    epc = max(1, min(getattr(cfg, "epochs_per_call", 25), cfg.epochs))

    @partial(jax.jit, static_argnames=())
    def run_chunk(params, opt_state, e0, x, y, ex, ey):
        def epoch(carry, e):
            params, opt_state = carry
            perm = jax.random.permutation(jax.random.fold_in(key, e), n)

            def body(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice(perm, (i * b,), (b,))
                xb = jnp.take(x, idx, axis=0)
                yb = jnp.take(y, idx, axis=0)
                loss, grads = jax.value_and_grad(_loss_fn)(
                    params, xb, yb, mlp_cfg, cfg.nn_type)
                updates, opt_state = tx.update(grads, opt_state, params,
                                               value=loss)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(steps_per_epoch))
            return (params, opt_state), losses[-1]

        (params, opt_state), ep_losses = jax.lax.scan(
            epoch, (params, opt_state), e0 + jnp.arange(epc))
        test = (_loss_fn(params, ex, ey, mlp_cfg, cfg.nn_type)
                if tx_b else ep_losses[-1])
        return params, opt_state, ep_losses, test

    history = {"train_loss": [], "test_loss": []}
    # ceil-chunking: a ragged final chunk runs to the next epc multiple
    # (extra steps sit at the cosine floor lr — harmless)
    for e0 in range(0, -(-cfg.epochs // epc) * epc, epc):
        params, opt_state, ep_losses, test = run_chunk(
            params, opt_state, jnp.int32(e0), x, y, ex, ey)
        test_f = float(test)
        history["train_loss"].extend(float(l) for l in np.asarray(ep_losses))
        history["test_loss"].extend(
            [history["test_loss"][-1] if history["test_loss"] else test_f]
            * (epc - 1) + [test_f])
        if verbose:
            print(f"epoch {e0 + epc}: train {history['train_loss'][-1]:.6f} "
                  f"test {test_f:.6f}", flush=True)
        if cfg.checkpoint_dir and (e0 // epc) % max(
                1, cfg.checkpoint_every // epc) == 0:
            save_checkpoint(
                os.path.join(cfg.checkpoint_dir,
                             f"{cfg.nn_type}-loss={test_f:.6f}-epochs={e0}"),
                params)
    return jax.tree.map(lambda a: jax.device_get(a), params), history


def fit(features, labels, mlp_cfg: MLPConfig, cfg: TrainConfig, params=None,
        verbose=False, device_loop: bool = None):
    """Train one proxy net. Returns (params, history dict).

    device_loop=None auto-selects the device-resident epoch program
    (`_fit_device`) on accelerator backends; the host-driven loop (below)
    is kept for CPU runs and reference-recipe parity."""
    if device_loop is None:
        device_loop = jax.default_backend() != "cpu"
    if device_loop:
        return _fit_device(features, labels, mlp_cfg, cfg, params, verbose)
    key = jax.random.PRNGKey(cfg.seed)
    if params is None:
        params = init_mlp(key, mlp_cfg)

    train_x, train_y, test_x, test_y = split_train_test(features, labels, seed=cfg.seed & 0xFFFF)
    steps_per_epoch = max(1, train_x.shape[0] // min(cfg.batch, max(train_x.shape[0], 1)))
    total_steps = cfg.total_steps_hint or cfg.epochs * steps_per_epoch
    tx = make_optimizer(cfg, total_steps)
    opt_state = tx.init(params)
    train_x = np.asarray(train_x, np.float32)
    train_y = np.asarray(train_y, np.float32)

    history = {"train_loss": [], "test_loss": []}
    n = train_x.shape[0]
    b = min(cfg.batch, n)
    for epoch in range(cfg.epochs):
        # drop the ragged tail so the jitted step sees one static shape
        for i in range(0, n - b + 1, b):
            x = jnp.asarray(train_x[i : i + b])
            y = jnp.asarray(train_y[i : i + b])
            params, opt_state, loss = _train_step(
                params, opt_state, x, y, mlp_cfg, cfg.nn_type, tx
            )
        test = float(
            eval_loss(params, jnp.asarray(test_x[: 4 * b]), jnp.asarray(test_y[: 4 * b]),
                      mlp_cfg, cfg.nn_type)
        ) if test_x.shape[0] else float(loss)
        history["train_loss"].append(float(loss))
        history["test_loss"].append(test)
        if verbose:
            print(f"epoch {epoch + 1}: train {float(loss):.6f} test {test:.6f}")

        if cfg.checkpoint_dir and epoch % cfg.checkpoint_every == 0:
            save_checkpoint(
                os.path.join(
                    cfg.checkpoint_dir,
                    f"{cfg.nn_type}-loss={test:.6f}-epochs={epoch}",
                ),
                params,
            )
        train_x, train_y = shuffle(train_x, train_y, seed=epoch)

    return params, history


def train_proxy_for_partition(
    scene, aabb_min, aabb_max, nn_type: str,
    mlp_cfg: MLPConfig = None,
    train_cfg: TrainConfig = None,
    num_samples: int = 200_000,
    seed: int = 0,
):
    """End-to-end: ray-cast one partition's geometry -> balanced dataset ->
    trained net (the full offline pipeline of SURVEY.md #20+#23-25)."""
    if mlp_cfg is None:
        if nn_type == "combined":
            from ..models.mlp import COMBINED_VISDEPTH

            mlp_cfg = COMBINED_VISDEPTH
        else:
            mlp_cfg = PROD_VIS if nn_type == "vis" else PROD_DEPTH
    train_cfg = train_cfg or TrainConfig(nn_type=nn_type)
    feats, depth = generate_proxy_dataset(scene, aabb_min, aabb_max, num_samples, seed=seed)
    if nn_type == "vis":
        x, y = balance_vis(feats, depth)
    elif nn_type == "combined":
        from .datasets import combined_labels

        x, y = combined_labels(feats, depth)
    else:
        x, y = depth_only(feats, depth)
    return fit(x, y, mlp_cfg, train_cfg)


def save_checkpoint(path: str, params):
    """Loss-stamped checkpoint (main.py:165-169 role) as an .npz pytree."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {k: np.asarray(v) for k, v in params.items()}
    np.savez(path + ".npz", **flat)


def load_checkpoint(path: str):
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def save_checkpoint_orbax(path: str, params):
    """Orbax pytree checkpoint (production alternative to npz)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, like=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=like)
