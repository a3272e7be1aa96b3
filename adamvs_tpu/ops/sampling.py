"""Cascade depth-hypothesis samplers.

Reference semantics (models/module.py:628-663):
- stage 1: uniform linspace over [min, max]: ``min + i*(max-min)/(D-1)``;
- stage k>1: per-pixel window around the previous depth,
  ``lo = prev - D/2·Δ``, ``hi = prev + D/2·Δ``, samples
  ``lo + i·(hi-lo)/(D-1)`` (note the effective spacing is ``D·Δ/(D-1)``, and
  the reference applies no clamping to [min_depth, max_depth]).
"""

from __future__ import annotations

import jax.numpy as jnp


def uniform_depth_samples(depth_range: jnp.ndarray, ndepth: int) -> jnp.ndarray:
    """depth_range [B,2] = [min,max] -> [B,D] uniform hypotheses."""
    lo = depth_range[:, 0]
    hi = depth_range[:, 1]
    step = (hi - lo) / (ndepth - 1)
    i = jnp.arange(ndepth, dtype=jnp.float32)
    return lo[:, None] + i[None, :] * step[:, None]


def window_min_and_interval(
    prev_depth: jnp.ndarray, ndepth: int, interval: jnp.ndarray | float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel window parameters: (lo, step), each shaped like prev_depth.

    ``hypothesis_i = lo + i * step`` reproduces
    ``get_cur_depth_range_samples`` (module.py:628-643). Exposing (lo, step)
    instead of the materialized [B,D,H,W] volume lets the streaming path build
    one hypothesis slice at a time, and spatial resizing commutes with the
    linear form (used by the MS-REDNet trilinear-resize semantics).
    """
    lo = prev_depth - ndepth / 2 * interval
    hi = prev_depth + ndepth / 2 * interval
    step = (hi - lo) / (ndepth - 1)
    return lo, step


def windowed_depth_samples(
    prev_depth: jnp.ndarray, ndepth: int, interval: jnp.ndarray | float
) -> jnp.ndarray:
    """prev_depth [B,H,W] -> [B,D,H,W] per-pixel windowed hypotheses."""
    lo, step = window_min_and_interval(prev_depth, ndepth, interval)
    i = jnp.arange(ndepth, dtype=jnp.float32)[None, :, None, None]
    return lo[:, None] + i * step[:, None]
