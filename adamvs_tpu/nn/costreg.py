"""Cost-volume regularizers.

- ``CostRegNet2D``: 2D U-Net over the cost volume with the depth axis as
  channels (reference adamvs.py:198-238) — used for the stage-1 per-view
  matching scores in Ada-MVS. Three stride-2 downs, three transposed-conv ups
  with additive skips, 3x3 output head.
- ``AdaRedCell``: one depth-slice step of the Ada-MVS recurrent regularizer
  (reference ``CostRegNetRED``/``SliceCostRegNetRED``, adamvs.py:157-195,
  400-424): conv -> GRU(b) -> stride-2 conv -> GRU(2b) -> deconv + skip ->
  1-channel head (stride-2 deconv when ``up`` — output at 2x resolution).
- ``RedCell``: one depth-slice step of the MS-REDNet 4-level recurrent
  encoder-decoder (reference ``RED_Regularization``/``slice_RED_Regularization``,
  msrednet.py:134-181, 339-372). The input cost is negated on entry
  (msrednet.py:163).

Both cells are written as ``(carry, x) -> (carry, y)`` scan bodies; the models
drive them with ``nn.scan`` over the depth axis — one implementation serves
both the full-volume (training) and streamed (full-res inference) paths, unlike
the reference's duplicated train/Infer module forks.

The reference hard-codes GRU state channels 8/16 regardless of
``base_channels`` (adamvs.py:175-176) and pins states to ``.cuda()``; here
states are sized from ``base`` and live wherever XLA puts them.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .blocks import BN_EPS, BN_MOMENTUM, ConvGRUCell, ConvReLU, ConvTransReLU, GNConvGRUCell
from .fastconv import FastConv, FastConvTranspose


class CostRegNet2D(nn.Module):
    """U-Net over [B,H,W,D] (depth-as-channels). Output same shape."""

    channels: int  # = number of depth hypotheses D
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.channels

        def cbr(y, stride=1):
            y = FastConv(c, (3, 3), strides=(stride, stride), use_bias=False,
                         dtype=self.dtype)(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, dtype=self.dtype)(y)
            return nn.relu(y)

        def up(y):
            y = FastConvTranspose(c, (3, 3), strides=(2, 2), use_bias=False,
                                  dtype=self.dtype)(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, dtype=self.dtype)(y)
            return nn.relu(y)

        c0 = cbr(x)
        c2 = cbr(cbr(c0, 2))
        c4 = cbr(cbr(c2, 2))
        y = cbr(cbr(c4, 2))
        y = c4 + up(y)
        y = c2 + up(y)
        y = c0 + up(y)
        return FastConv(c, (3, 3), use_bias=True, dtype=self.dtype)(y)


class AdaRedCell(nn.Module):
    """Ada-MVS recurrent regularizer, one depth slice.

    carry = (h1 [B,H,W,b], h2 [B,H/2,W/2,2b]); input cost [B,H,W,C];
    output reg cost [B,2H,2W,1] when ``up`` else [B,H,W,1].
    """

    base: int = 8
    up: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, cost: jnp.ndarray):
        h1, h2 = carry
        b = self.base
        c1 = ConvReLU(b, 3, 1, dtype=self.dtype)(cost)
        r1, h1 = ConvGRUCell(b, dtype=self.dtype)(h1, c1)
        c2 = ConvReLU(2 * b, 3, 2, dtype=self.dtype)(r1)
        r2, h2 = ConvGRUCell(2 * b, dtype=self.dtype)(h2, c2)
        u1 = FastConvTranspose(b, (3, 3), strides=(2, 2), use_bias=True,
                               dtype=self.dtype)(r2)
        u1 = nn.relu(u1 + r1)
        if self.up:
            out = FastConvTranspose(1, (3, 3), strides=(2, 2), use_bias=True,
                                    dtype=self.dtype)(u1)
        else:
            out = FastConv(1, (3, 3), use_bias=True, dtype=self.dtype)(u1)
        return (h1, h2), out

    def init_carry(self, batch: int, height: int, width: int, dtype=jnp.float32):
        b = self.base
        return (
            jnp.zeros((batch, height, width, b), dtype),
            jnp.zeros((batch, height // 2, width // 2, 2 * b), dtype),
        )


class RedCell(nn.Module):
    """MS-REDNet 4-level recurrent encoder-decoder, one depth slice.

    carry = 4 GRU states at H, H/2, H/4, H/8 with b, 2b, 4b, 8b channels;
    input cost [B,H,W,C]; output [B,H,W,1].
    """

    base: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, cost: jnp.ndarray):
        h1, h2, h3, h4 = carry
        b = self.base
        x = -cost  # msrednet.py:163 feeds the negated cost
        c1 = ConvReLU(2 * b, 3, 2, dtype=self.dtype)(x)
        c2 = ConvReLU(4 * b, 3, 2, dtype=self.dtype)(c1)
        c3 = ConvReLU(8 * b, 3, 2, dtype=self.dtype)(c2)
        r4, h4 = GNConvGRUCell(8 * b, dtype=self.dtype)(h4, c3)
        u3 = ConvTransReLU(4 * b, dtype=self.dtype)(r4)
        r3, h3 = GNConvGRUCell(4 * b, dtype=self.dtype)(h3, c2)
        u2 = ConvTransReLU(2 * b, dtype=self.dtype)(u3 + r3)
        r2, h2 = GNConvGRUCell(2 * b, dtype=self.dtype)(h2, c1)
        u1 = ConvTransReLU(b, dtype=self.dtype)(u2 + r2)
        r1, h1 = GNConvGRUCell(b, dtype=self.dtype)(h1, x)
        out = FastConv(1, (3, 3), use_bias=True, dtype=self.dtype)(u1 + r1)
        return (h1, h2, h3, h4), out

    def init_carry(self, batch: int, height: int, width: int, dtype=jnp.float32):
        b = self.base
        return (
            jnp.zeros((batch, height, width, b), dtype),
            jnp.zeros((batch, height // 2, width // 2, 2 * b), dtype),
            jnp.zeros((batch, height // 4, width // 4, 4 * b), dtype),
            jnp.zeros((batch, height // 8, width // 8, 8 * b), dtype),
        )


def scan_regularizer(cell_cls, length=None, **scan_kwargs):
    """Lift a slice cell into a depth-axis scan: (carry, [D,...]) -> (carry, [D,...])."""
    return nn.scan(
        cell_cls,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=0,
        out_axes=0,
        length=length,
        **scan_kwargs,
    )
