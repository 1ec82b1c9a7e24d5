"""Proxy-net evaluation/visualization tools.

Ports of the reference's eval scripts: `nnVis.py` (render vis/depth
predictions of a fixed test grid to EXR, /root/reference/trainingcode/
nnVis.py:60-130) and `utils/testDepthLoss.py` (thresholded-visibility
accuracy + depth L1, /root/reference/trainingcode/utils/testDepthLoss.py:20-51).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.mlp import MLPConfig, apply_mlp
from ..utils.exr import write_exr


def prediction_grid(params, cfg: MLPConfig, width: int = 960, height: int = 540,
                    phi: float = 0.25, theta: float = 0.5):
    """Evaluate the net over a (height x width) grid of AABB face entry
    points with a fixed direction — the nnVis test-image layout
    (960x540, nnVis.py:115-122). Returns (height, width) predictions."""
    ys, xs = np.meshgrid(
        np.linspace(0, 1, height, dtype=np.float32),
        np.linspace(0, 1, width, dtype=np.float32),
        indexing="ij",
    )
    feats = np.stack(
        [xs, ys, np.zeros_like(xs), np.full_like(xs, phi), np.full_like(xs, theta)],
        axis=-1,
    ).reshape(-1, 5)
    pred = np.asarray(apply_mlp(params, jnp.asarray(feats), cfg))
    return pred.reshape(height, width)


def save_prediction_exr(path: str, params, cfg: MLPConfig, **kw):
    img = prediction_grid(params, cfg, **kw)
    write_exr(path, np.repeat(img[:, :, None], 3, axis=2))
    return img


def depth_accuracy(vis_params, vis_cfg: MLPConfig,
                   depth_params, depth_cfg: MLPConfig,
                   features: np.ndarray, depth_labels: np.ndarray,
                   threshold: float = 0.5):
    """testDepthLoss port: visibility accuracy at `threshold` + depth L1 over
    true hits. Returns dict(metrics)."""
    x = jnp.asarray(features)
    vis_pred = np.asarray(apply_mlp(vis_params, x, vis_cfg))
    depth_pred = np.asarray(apply_mlp(depth_params, x, depth_cfg))

    is_hit = depth_labels != 1.0
    vis_label = is_hit.astype(np.float32)
    vis_acc = ((vis_pred > threshold) == (vis_label > threshold)).mean()
    depth_l1 = float(np.abs(depth_pred[is_hit] - depth_labels[is_hit]).mean()) if is_hit.any() else 0.0
    return {"vis_accuracy": float(vis_acc), "depth_l1": depth_l1,
            "hit_fraction": float(is_hit.mean())}


def combined_accuracy(params, cfg: MLPConfig, features: np.ndarray,
                      depth_labels: np.ndarray, threshold: float = 0.5):
    """depth_accuracy for a SEPARATEDNN=0 double-output net: one forward
    yields both channels (0 = vis, 1 = depth)."""
    from ..models.mlp import apply_mlp_all

    pred = np.asarray(apply_mlp_all(params, jnp.asarray(features), cfg))
    is_hit = depth_labels != 1.0
    vis_label = is_hit.astype(np.float32)
    vis_acc = ((pred[:, 0] > threshold) == (vis_label > threshold)).mean()
    depth_l1 = float(np.abs(pred[is_hit, 1] - depth_labels[is_hit]).mean()) \
        if is_hit.any() else 0.0
    return {"vis_accuracy": float(vis_acc), "depth_l1": depth_l1,
            "hit_fraction": float(is_hit.mean())}
