"""Canonical evaluation metrics — exact reference semantics (utils.py:286-315).

All are computed per-image then averaged over the batch, over the validity mask
(= GT depth within [depth_min, depth_max], cas_total_rscv.py:526):

- ``abs_depth_error``: MAE excluding outlier errors > threshold
  (threshold = 100·interval at call sites, train_whu.py:336-337).
- ``threshold_metric``: fraction of masked pixels with |err| < τ
  (τ = 1· and 6·interval).
- ``interval_metric``: fraction with |err|/interval < k (k = 3 — the
  "<3-interval completeness" headline metric).

Where torch returns NaN for an empty mask, we return 0 for the fractions and
0 for the MAE (an empty-mask image contributes nothing meaningful either way;
the driver-level averaging matches when masks are non-empty, which the metric
definition presumes).
"""

from __future__ import annotations

import jax.numpy as jnp


def _per_image_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean per image: values/mask [B,H,W] -> [B]."""
    m = mask.astype(values.dtype)
    return jnp.sum(values * m, axis=(1, 2)) / jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)


def abs_depth_error(depth_est, depth_gt, mask, threshold) -> jnp.ndarray:
    diff = jnp.abs(depth_est - depth_gt)
    inlier = mask & (diff < threshold)
    return jnp.mean(_per_image_mean(diff, inlier))


def threshold_metric(depth_est, depth_gt, mask, thres) -> jnp.ndarray:
    err = jnp.abs(depth_est - depth_gt)
    return jnp.mean(_per_image_mean((err < thres).astype(jnp.float32), mask))


def interval_metric(depth_est, depth_gt, interval, mask, k) -> jnp.ndarray:
    err = jnp.abs(depth_est - depth_gt) / interval
    return jnp.mean(_per_image_mean((err < k).astype(jnp.float32), mask))


def eval_metrics(depth_est, depth_gt, mask, depth_interval) -> dict[str, jnp.ndarray]:
    """The reference driver's metric set (train_whu.py:336-340).

    ``depth_interval`` is [B] (per-sample); reference uses the scalar of a
    batch-size-1 loader.
    """
    interval = depth_interval.reshape(-1, 1, 1)
    m = mask > 0.5
    return {
        "abs_depth_error": abs_depth_error(depth_est, depth_gt, m, 100.0 * interval),
        "thres1interval_error": threshold_metric(depth_est, depth_gt, m, 1.0 * interval),
        "thres6interval_error": threshold_metric(depth_est, depth_gt, m, 6.0 * interval),
        "thres3interval_error": interval_metric(depth_est, depth_gt, interval, m, 3.0),
    }
