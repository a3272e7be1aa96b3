"""Reference building blocks not used by the live model families.

The reference ships several modules that its two shipped models never call
(SURVEY.md §2.2 rows M3/M6/M7/M8 — legacies of MVSNet/R-MVSNet-era
regularizers). They are provided here so the block inventory is complete for
users building model variants, in the same TPU-native NHWC style as
``nn.blocks``:

- ``ConvLSTMCell``    — convolutional LSTM (reference models/module.py:109-144).
- ``ConvBnReLU3D`` / ``ConvBn3D`` — 3D conv blocks over [B,D,H,W,C] volumes
  (module.py:304-321); the MVSNet-style 3D cost regularizer building block.
- ``ConvGnReLU`` / ``ConvGn`` / ``ConvTransGnReLU`` — GroupNorm conv blocks
  with torch's ``max(1, out_channels // group_channel)`` group count
  (module.py:324-355).
- ``DeformConvBlock`` — modulated deformable convolution (DCNv2): a conv
  predicts per-tap offsets and a sigmoid modulation mask, taps are gathered
  with bilinear interpolation (zeros outside the image), and a dense
  projection combines the gathered neighborhood (module.py:357-503;
  ``DeformConvGnReLU`` = deform conv + GN + ReLU). The gather reuses the
  plane-sweep bilinear sampler, so on TPU it shares the same fast path.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.warp import bilinear_sample
from .blocks import BN_EPS, BN_MOMENTUM


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM (module.py:109-144).

    carry = (c, h), both [B,H,W,hidden]; returns ((c, h), h).
    """

    hidden: int
    kernel: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, x: jnp.ndarray):
        c, h = carry
        k = (self.kernel, self.kernel)
        gates = nn.Conv(4 * self.hidden, k, padding="SAME", use_bias=True,
                        dtype=self.dtype)(jnp.concatenate([x, h], axis=-1))
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h = nn.sigmoid(o) * jnp.tanh(c)
        return (c, h), h

    def init_carry(self, batch: int, height: int, width: int, dtype=jnp.float32):
        z = jnp.zeros((batch, height, width, self.hidden), dtype)
        return (z, z)


class ConvBnReLU3D(nn.Module):
    """3D conv + BN + ReLU over volumes [B,D,H,W,C] (module.py:304-312)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel,) * 3, strides=(self.stride,) * 3,
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype)(x)
        return nn.relu(x)


class ConvBn3D(nn.Module):
    """3D conv + BN, no activation (module.py:315-321)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel,) * 3, strides=(self.stride,) * 3,
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                            epsilon=BN_EPS, dtype=self.dtype)(x)


def _num_groups(features: int, group_channel: int) -> int:
    # torch reference: G = max(1, out_channels // group_channel) (module.py:327)
    return max(1, features // group_channel)


class ConvGnReLU(nn.Module):
    """Conv + GroupNorm + ReLU (module.py:324-334)."""

    features: int
    kernel: int = 3
    stride: int = 1
    group_channel: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=_num_groups(self.features, self.group_channel),
                         epsilon=1e-5)(x)
        return nn.relu(x)


class ConvGn(nn.Module):
    """Conv + GroupNorm, no activation (module.py:337-345)."""

    features: int
    kernel: int = 3
    stride: int = 1
    group_channel: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        return nn.GroupNorm(num_groups=_num_groups(self.features, self.group_channel),
                            epsilon=1e-5)(x)


class ConvTransGnReLU(nn.Module):
    """Stride-2 transposed conv + GroupNorm + ReLU (module.py:348-355)."""

    features: int
    kernel: int = 3
    group_channel: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.ConvTranspose(self.features, (self.kernel, self.kernel), strides=(2, 2),
                             padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=_num_groups(self.features, self.group_channel),
                         epsilon=1e-5)(x)
        return nn.relu(x)


class DeformConvBlock(nn.Module):
    """Modulated deformable conv (DCNv2, module.py:357-503), TPU-native.

    An offset head predicts (dy, dx) per kernel tap and a sigmoid modulation
    mask; each tap samples the input bilinearly at its displaced location
    (zeros outside the image, matching the reference's zero-padded gather);
    the gathered K·K neighborhood is combined by a dense projection — exactly
    a KxK conv evaluated at learned sample points. ``modulated=False`` gives
    DCNv1 (no mask).
    """

    features: int
    kernel: int = 3
    modulated: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        K = self.kernel
        off = nn.Conv(2 * K * K, (K, K), padding="SAME", use_bias=True,
                      kernel_init=nn.initializers.zeros, dtype=self.dtype,
                      name="offset")(x)  # zero-init: starts as a plain conv
        off = off.reshape(B, H, W, K * K, 2)
        if self.modulated:
            m = nn.Conv(K * K, (K, K), padding="SAME", use_bias=True,
                        kernel_init=nn.initializers.zeros, dtype=self.dtype,
                        name="mask")(x)
            m = nn.sigmoid(m)  # reference inits mask conv to zero -> 0.5
        else:
            m = None

        yy = jnp.arange(H, dtype=jnp.float32)[:, None]
        xx = jnp.arange(W, dtype=jnp.float32)[None, :]
        taps = []
        r = (K - 1) // 2
        for t in range(K * K):
            ki, kj = t // K - r, t % K - r
            v = yy + ki + off[..., t, 0]  # [B,H,W]
            u = xx + kj + off[..., t, 1]
            s = bilinear_sample(x, u, v)  # [B,H,W,C], zeros outside
            if m is not None:
                s = s * m[..., t : t + 1]
            taps.append(s)
        g = jnp.concatenate(taps, axis=-1)  # [B,H,W,K*K*C]
        return nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype,
                       name="proj")(g)


class DeformConvGnReLU(nn.Module):
    """Deformable conv + GroupNorm + ReLU (module.py:497-503)."""

    features: int
    kernel: int = 3
    group_channel: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = DeformConvBlock(self.features, self.kernel, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=_num_groups(self.features, self.group_channel),
                         epsilon=1e-5)(x)
        return nn.relu(x)
