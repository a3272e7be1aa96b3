"""Flax building blocks: conv/deconv wrappers and convolutional GRU cells.

Semantics mirror the reference block set (models/module.py) with TPU-native
NHWC layout:

- ``ConvBlock``    = Conv2d wrapper (conv + optional BN + ReLU), bias only when
  BN is off; BN momentum 0.1 in torch == 0.9 running-average here
  (module.py:164-198).
- ``DeconvBlock``  = stride-2 transposed conv + BN + ReLU whose output is
  exactly 2Hx2W (module.py:207-245 crops to 2x).
- ``ConvReLU`` / ``ConvTransReLU`` = unnormalized variants (module.py:264-301).
- ``ConvGRUCell``  = plain conv GRU: sigmoid gates from concat(x,h), tanh
  candidate from concat(x, r*h), out = u*h + (1-u)*c (module.py:5-52).
- ``GNConvGRUCell`` = GRU with GroupNorm(1) on both gates and the candidate
  (module.py:54-106).
- ``DeConvFuse``   = deconv x2, concat skip, conv (module.py:506-524).

Weight init follows flax defaults (the reference's commented-out xavier init is
never applied — torch defaults are used there; we don't chase init-level parity
since no reference checkpoints are shipped).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .fastconv import FastConv, FastConvTranspose

# torch BatchNorm2d(momentum=0.1) keeps running = 0.9*running + 0.1*batch;
# flax's `momentum` is the running-average coefficient itself.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class ConvBlock(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = True
    relu: bool = True
    dtype: Any = None
    use_stock: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = FastConv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            use_bias=not self.use_bn,
            dtype=self.dtype,
            use_stock=self.use_stock,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
                dtype=self.dtype,
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DeconvBlock(nn.Module):
    """Stride-2 transposed conv (+BN+ReLU) with exact 2x output."""

    features: int
    kernel: int = 3
    use_bn: bool = True
    relu: bool = True
    dtype: Any = None
    use_stock: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = FastConvTranspose(
            self.features,
            (self.kernel, self.kernel),
            strides=(2, 2),
            use_bias=not self.use_bn,
            dtype=self.dtype,
            use_stock=self.use_stock,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
                dtype=self.dtype,
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ConvReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = FastConv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            use_bias=False,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class ConvTransReLU(nn.Module):
    """Stride-2 unnormalized transposed conv + ReLU (module.py:294-301)."""

    features: int
    kernel: int = 3
    dtype: Any = None
    use_stock: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = FastConvTranspose(
            self.features, (self.kernel, self.kernel), strides=(2, 2),
            use_bias=False, dtype=self.dtype, use_stock=self.use_stock,
        )(x)
        return nn.relu(x)


class ConvGRUCell(nn.Module):
    """Plain convolutional GRU (module.py:5-52). Carry and output are the
    hidden state [B,H,W,hidden]."""

    hidden: int
    kernel: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        k = (self.kernel, self.kernel)
        gates = FastConv(2 * self.hidden, k, use_bias=True, dtype=self.dtype)(
            jnp.concatenate([x, h], axis=-1)
        )
        r, u = jnp.split(gates, 2, axis=-1)
        r = nn.sigmoid(r)
        u = nn.sigmoid(u)
        c = FastConv(self.hidden, k, use_bias=True, dtype=self.dtype)(
            jnp.concatenate([x, r * h], axis=-1)
        )
        c = jnp.tanh(c)
        out = u * h + (1 - u) * c
        return out, out


class GNConvGRUCell(nn.Module):
    """Conv GRU with GroupNorm(1) on gates and candidate (module.py:54-106)."""

    hidden: int
    kernel: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        k = (self.kernel, self.kernel)
        gates = FastConv(2 * self.hidden, k, use_bias=True, dtype=self.dtype)(
            jnp.concatenate([x, h], axis=-1)
        )
        r, u = jnp.split(gates, 2, axis=-1)
        # GroupNorm must follow the cell compute dtype: an f32 GN output
        # promotes the carried state to f32, breaking the scan's carry typing
        # when the carry is initialized in bf16
        r = nn.sigmoid(nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype)(r))
        u = nn.sigmoid(nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype)(u))
        o = FastConv(self.hidden, k, use_bias=True, dtype=self.dtype)(
            jnp.concatenate([x, r * h], axis=-1)
        )
        o = jnp.tanh(nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype)(o))
        out = u * h + (1 - u) * o
        return out, out


class DeConvFuse(nn.Module):
    """U-Net up step: deconv x2, concat skip, fuse conv (module.py:506-524)."""

    features: int
    kernel: int = 3
    dtype: Any = None
    use_stock: bool = False

    @nn.compact
    def __call__(self, skip: jnp.ndarray, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = DeconvBlock(self.features, self.kernel, dtype=self.dtype,
                        use_stock=self.use_stock)(x, train)
        x = jnp.concatenate([x, skip], axis=-1)
        return ConvBlock(self.features, self.kernel, dtype=self.dtype,
                         use_stock=self.use_stock)(x, train)
