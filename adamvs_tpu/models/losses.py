"""Cascade losses and masked-smooth-L1 helpers.

- ``cas_mvs_vis_loss`` (reference adamvs.py:8-46): per-stage masked smooth-L1 on
  the fused depth (bilinearly upsampled to GT resolution) plus the mean of the
  per-view pair-depth smooth-L1 terms, weighted by ``dlossw``.
  The reference slices the fused term to batch element 0 (``depth[0:1]``,
  adamvs.py:13) — an artifact of batch-size-1 training; here the full batch
  contributes (documented deviation, SURVEY.md quirks).
- ``cas_rednet_loss`` (reference msrednet.py:8-27): per-stage masked smooth-L1.

Masked means over an empty mask are 0 here rather than NaN (the reference
produces NaN and silently skips the optimizer step, train_whu.py:285-287; we
keep a NaN guard in the train step as a *metric* instead).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.regression import resize_bilinear


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    """Huber with beta=1 (torch F.smooth_l1_loss elementwise)."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    w = mask.astype(values.dtype)
    denom = jnp.sum(w)
    return jnp.sum(values * w) / jnp.maximum(denom, 1.0)


def _stage_depth_loss(depth_est, depth_gt, mask):
    h, w = depth_gt.shape[-2:]
    est = resize_bilinear(depth_est, h, w)
    return masked_mean(smooth_l1(est - depth_gt), mask)


def cas_mvs_vis_loss(outputs, depth_gt_ms, mask_ms, dlossw=(0.5, 1.0, 2.0)):
    """Returns (total_loss, final_stage_depth_loss)."""
    total = jnp.float32(0.0)
    depth_loss = jnp.float32(0.0)
    for key in sorted(k for k in outputs if k.startswith("stage")):
        stage = outputs[key]
        idx = int(key.replace("stage", "")) - 1
        gt = depth_gt_ms[key]
        mask = mask_ms[key] > 0.5
        depth_loss = _stage_depth_loss(stage["depth"], gt, mask)
        pair = stage.get("pair_result", ())
        pair_loss = jnp.float32(0.0)
        if len(pair) > 0:
            for p in pair:
                pair_loss = pair_loss + _stage_depth_loss(p, gt, mask)
            pair_loss = pair_loss / len(pair)
        w = dlossw[idx] if dlossw is not None else 1.0
        total = total + w * (depth_loss + pair_loss)
    return total, depth_loss


def cas_rednet_loss(outputs, depth_gt_ms, mask_ms, dlossw=(0.5, 1.0, 2.0)):
    total = jnp.float32(0.0)
    depth_loss = jnp.float32(0.0)
    for key in sorted(k for k in outputs if k.startswith("stage")):
        stage = outputs[key]
        idx = int(key.replace("stage", "")) - 1
        gt = depth_gt_ms[key]
        mask = mask_ms[key] > 0.5
        depth_loss = _stage_depth_loss(stage["depth"], gt, mask)
        w = dlossw[idx] if dlossw is not None else 1.0
        total = total + w * depth_loss
    return total, depth_loss
