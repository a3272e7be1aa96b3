"""Soft-argmax depth regression and the streaming (online-softmax) form.

Full-volume form (models/module.py:617-625): ``depth = Σ_d p(d)·d`` with the
probability volume from a softmax over depth; per-pixel hypothesis volumes are
bilinearly resized to the probability map's resolution
(``align_corners=False``).

Streaming form (models/adamvs.py:495-531, msrednet.py:402-436): the reference
accumulates ``exp(cost)`` online without max subtraction, which can overflow.
We keep the exact same mathematical result — softmax-weighted depth and
max-probability confidence — but carry a running max for stability, so the
streamed result equals the full-volume softmax identically (up to fp error).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """torch ``F.interpolate(mode='bilinear', align_corners=False)`` equivalent
    on the trailing two spatial dims of an arbitrarily-batched array.

    ``antialias=False`` is required for parity when DOWNSCALING: torch's
    bilinear interpolate never widens the kernel, while jax.image.resize
    antialiases by default — the mismatch shifted MSREDNet's stage-2/3
    hypothesis windows (full-res window -> stage-res resize,
    /root/reference/models/msrednet.py:320-322) by up to 3e-2 of the depth
    range (caught by test_msrednet_full_cascade_parity)."""
    if x.shape[-2] == height and x.shape[-1] == width:
        return x
    return jax.image.resize(
        x, x.shape[:-2] + (height, width), method="linear", antialias=False
    )


def depth_regression(prob: jnp.ndarray, depth_values: jnp.ndarray) -> jnp.ndarray:
    """prob [B,D,H,W] softmax volume, depth_values [B,D] or [B,D,h,w] -> [B,H,W]."""
    B, D, H, W = prob.shape
    if depth_values.ndim == 2:
        dv = depth_values[:, :, None, None]
    else:
        dv = resize_bilinear(depth_values, H, W)
    return jnp.sum(prob * dv, axis=1)


class OnlineSoftmax(NamedTuple):
    """Carried state of the streamed softmax regression (all [B,H,W,1])."""

    m: jnp.ndarray  # running max of costs
    s: jnp.ndarray  # Σ exp(c - m)
    ds: jnp.ndarray  # Σ depth · exp(c - m)
    pmax: jnp.ndarray  # max exp(c - m)


def online_softmax_init(shape, dtype=jnp.float32) -> OnlineSoftmax:
    return OnlineSoftmax(
        m=jnp.full(shape, -jnp.inf, dtype),
        s=jnp.zeros(shape, dtype),
        ds=jnp.zeros(shape, dtype),
        pmax=jnp.zeros(shape, dtype),
    )


def online_softmax_update(
    state: OnlineSoftmax, cost: jnp.ndarray, depth: jnp.ndarray
) -> OnlineSoftmax:
    """Fold in one depth slice: ``cost`` and ``depth`` broadcastable to state."""
    m_new = jnp.maximum(state.m, cost)
    scale = jnp.exp(state.m - m_new)
    e = jnp.exp(cost - m_new)
    return OnlineSoftmax(
        m=m_new,
        s=state.s * scale + e,
        ds=state.ds * scale + depth * e,
        pmax=jnp.maximum(state.pmax * scale, e),
    )


def online_softmax_merge(a: OnlineSoftmax, b: OnlineSoftmax) -> OnlineSoftmax:
    """Merge two partial streams (associative + commutative): the algebraic
    basis for sharding the depth-hypothesis axis over a mesh — each shard
    scans its depth block locally, then partial states tree-reduce
    (psum-style) to the full-sweep state. Exact, not approximate."""
    m_new = jnp.maximum(a.m, b.m)
    # -inf - -inf = nan when merging two still-empty states (padded shards)
    sa = jnp.where(a.m == m_new, 1.0, jnp.exp(a.m - m_new))
    sb = jnp.where(b.m == m_new, 1.0, jnp.exp(b.m - m_new))
    return OnlineSoftmax(
        m=m_new,
        s=a.s * sa + b.s * sb,
        ds=a.ds * sa + b.ds * sb,
        pmax=jnp.maximum(a.pmax * sa, b.pmax * sb),
    )


def online_softmax_finalize(state: OnlineSoftmax) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(depth, confidence): softmax-regressed depth and max softmax probability."""
    s = state.s + 1e-10
    return state.ds / s, state.pmax / s
