"""Plane-sweep homography warping (XLA reference implementation).

Warps source-view feature maps into the reference frustum at a set of depth
hypotheses — the geometric core of plane-sweep MVS (reference semantics:
models/module.py:527-568 ``homo_warping_float``).

Semantics reproduced exactly:
- relative transform ``P = src_proj @ inv(ref_proj)``;
- ref pixel (x, y) back-projected at depth d:  ``p = R·[x,y,1]·d + t``;
- perspective divide to source pixel coords (u, v);
- bilinear sampling with zeros outside the image, where the grid normalization
  + ``align_corners=True`` round trip means sampling happens at *unnormalized*
  pixel coordinates u ∈ [0, W-1], v ∈ [0, H-1];
- the sampling grid is a constant w.r.t. autodiff (the reference builds it
  under ``no_grad``): gradients flow only through the sampled features.

Layout is TPU-native NHWC; outputs are [B, D, H, W, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def warp_transform(src_proj: jnp.ndarray, ref_proj: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """rot [B,3,3], trans [B,3] of the ref->src pixel-space transform."""
    proj = src_proj @ jnp.linalg.inv(ref_proj)
    return proj[..., :3, :3], proj[..., :3, 3]


def _source_coords(
    rot: jnp.ndarray,  # [B,3,3]
    trans: jnp.ndarray,  # [B,3]
    depth: jnp.ndarray,  # [B,D,H,W] or [B,D] (fronto-parallel planes)
    height: int,
    width: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(u, v) source pixel coordinates, each [B,D,H,W]."""
    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    # rot @ [x, y, 1]^T, separably: rot_xyz[b,i,h,w] = R[i,0]x + R[i,1]y + R[i,2]
    rx = rot[:, :, 0][:, :, None, None] * x[None, None, None, :]
    ry = rot[:, :, 1][:, :, None, None] * y[None, None, :, None]
    rot_xyz = rx + ry + rot[:, :, 2][:, :, None, None]  # [B,3,H,W]

    if depth.ndim == 2:
        d = depth[:, None, :, None, None]  # [B,1,D,1,1]
    else:
        d = depth[:, None]  # [B,1,D,H,W]
    p = rot_xyz[:, :, None] * d + trans[:, :, None, None, None]  # [B,3,D,H,W]
    z = p[:, 2]
    # behind-camera / near-plane guard: push samples far out of range so the
    # zeros-padding path zeroes them (the torch reference leaves this to
    # grid_sample's out-of-range handling)
    safe = z > 1e-6
    z = jnp.where(safe, z, 1.0)
    u = jnp.where(safe, p[:, 0] / z, -1e9)
    v = jnp.where(safe, p[:, 1] / z, -1e9)
    return u, v


def bilinear_sample(feat: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample ``feat`` [B,H,W,C] at pixel coords (u, v) [B,...].

    Out-of-range taps contribute zeros (torch ``grid_sample`` with
    ``padding_mode='zeros'``, ``align_corners=True``). Returns [B, ..., C].
    """
    B, H, W, C = feat.shape
    out_shape = u.shape[1:]
    u = u.reshape(B, -1)
    v = v.reshape(B, -1)

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0

    flat = feat.reshape(B, H * W, C)

    def tap(xi, yi, w):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        idx = yi_c * W + xi_c  # [B,N]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B,N,C]
        return vals * (w * valid)[..., None]

    out = (
        tap(u0, v0, (1 - du) * (1 - dv))
        + tap(u0 + 1, v0, du * (1 - dv))
        + tap(u0, v0 + 1, (1 - du) * dv)
        + tap(u0 + 1, v0 + 1, du * dv)
    )
    return out.reshape((B,) + out_shape + (C,))


def plane_sweep_warp(
    src_feat: jnp.ndarray,  # [B,Hs,Ws,C]
    src_proj: jnp.ndarray,  # [B,4,4]
    ref_proj: jnp.ndarray,  # [B,4,4]
    depth: jnp.ndarray,  # [B,D] or [B,D,H,W] (H,W = reference grid)
    grid_hw: tuple[int, int] | None = None,
    grid_dtype=None,
) -> jnp.ndarray:
    """Warp source features to the reference frustum. Returns [B,D,H,W,C].

    The reference pixel grid is (H, W): taken from ``depth`` when it is
    per-pixel, from ``grid_hw`` when given, else from the source shape. A
    reference grid smaller than the source supports row-band (tile-sharded)
    processing, where the ref band samples the full source frame.

    ``grid_dtype=jnp.float64`` computes the transform + sample coordinates in
    double precision (reference ``homo_warping_double``, module.py:571-612 —
    useful for very long focal lengths where f32 pixel coords lose ulps).
    Requires ``jax_enable_x64``; sampling weights are cast back to the feature
    dtype.
    """
    if depth.ndim == 4:
        H, W = depth.shape[2:4]
    elif grid_hw is not None:
        H, W = grid_hw
    else:
        H, W = src_feat.shape[1:3]
    if grid_dtype is not None:
        src_proj = src_proj.astype(grid_dtype)
        ref_proj = ref_proj.astype(grid_dtype)
        depth = depth.astype(grid_dtype)
    rot, trans = warp_transform(src_proj, ref_proj)
    u, v = _source_coords(rot, trans, depth, H, W)
    if grid_dtype is not None:
        u = u.astype(src_feat.dtype)
        v = v.astype(src_feat.dtype)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    return bilinear_sample(src_feat, u, v)
