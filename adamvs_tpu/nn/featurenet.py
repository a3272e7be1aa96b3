"""Multi-scale feature extraction U-Nets.

- ``AdaFeatureNet``: the Ada-MVS encoder-decoder with SPP-style pooled branches
  at each output scale (reference ``FeatureNet0``, models/adamvs.py:49-152).
  Outputs {"stage1": 4b @ H/4, "stage2": 2b @ H/2, "stage3": b @ H}.
- ``RedFeatureNet``: the plain U-Net / FPN variant (reference ``FeatureNet``,
  models/msrednet.py:29-130) with the same output channel plan.

All convs NHWC; bilinear upsampling of the pooled branches uses half-pixel
centers (torch ``F.upsample(mode='bilinear')`` with default
``align_corners=False``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fastconv import FastConv
from .blocks import ConvBlock, DeConvFuse


def _resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    # antialias=False: torch F.interpolate parity (only matters on downscale)
    return jax.image.resize(
        x, (x.shape[0], h, w, x.shape[3]), method="linear", antialias=False
    )


class _SPPBranch(nn.Module):
    """AvgPool kxk -> 1x1 ConvBlock -> bilinear upsample back (adamvs.py:74-96)."""

    features: int
    pool: int
    dtype: Any = None
    use_stock: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.pool
        y = nn.avg_pool(x, (p, p), strides=(p, p))
        y = ConvBlock(self.features, kernel=1, dtype=self.dtype,
                      use_stock=self.use_stock)(y, train)
        return _resize_bilinear(y, x.shape[1], x.shape[2])


class AdaFeatureNet(nn.Module):
    base: int = 8
    num_stages: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict[str, jnp.ndarray]:
        b = self.base
        # stock XLA convs: 2.2x faster than shift-einsum at feature-net
        # shapes (tools/feature_probe.py, round 5)
        conv = lambda f, k, s: ConvBlock(f, k, s, dtype=self.dtype,
                                         use_stock=True)

        c0 = conv(b, 3, 1)(x, train)
        c0 = conv(b, 3, 1)(c0, train)

        c1 = conv(2 * b, 5, 2)(c0, train)
        c1 = conv(2 * b, 3, 1)(c1, train)
        c1 = conv(2 * b, 3, 1)(c1, train)

        c2 = conv(4 * b, 5, 2)(c1, train)
        c2 = conv(4 * b, 3, 1)(c2, train)
        c2 = conv(4 * b, 3, 1)(c2, train)

        outputs = {}
        intra = c2
        b1 = _SPPBranch(2 * b, 4, dtype=self.dtype)(intra, train)
        b2 = _SPPBranch(2 * b, 8, dtype=self.dtype)(intra, train)
        cat = jnp.concatenate([b1, b2, intra], axis=-1)
        outputs["stage1"] = FastConv(4 * b, (1, 1), use_bias=False, dtype=self.dtype, use_stock=True)(cat)
        if self.num_stages < 2:
            return outputs

        intra = DeConvFuse(2 * b, dtype=self.dtype, use_stock=True)(c1, intra, train)
        b1 = _SPPBranch(b, 4, dtype=self.dtype)(intra, train)
        b2 = _SPPBranch(b, 8, dtype=self.dtype)(intra, train)
        cat = jnp.concatenate([b1, b2, intra], axis=-1)
        outputs["stage2"] = FastConv(2 * b, (1, 1), use_bias=False, dtype=self.dtype, use_stock=True)(cat)
        if self.num_stages < 3:
            return outputs

        # full-res level stays on automatic dispatch: the stock stage-3 out
        # conv makes XLA fuse the (B,V) output reshape into the conv and pick
        # a (B,C)-tiled layout — 12.8-25.6x padding, 19.5G HBM at bench
        # shapes (round-5 OOM); shift-einsum keeps W-minor layouts
        intra = DeConvFuse(b, dtype=self.dtype)(c0, intra, train)
        b1 = _SPPBranch(b // 2, 4, dtype=self.dtype, use_stock=False)(intra, train)
        b2 = _SPPBranch(b // 2, 8, dtype=self.dtype, use_stock=False)(intra, train)
        cat = jnp.concatenate([b1, b2, intra], axis=-1)
        outputs["stage3"] = FastConv(b, (1, 1), use_bias=False, dtype=self.dtype)(cat)

        return outputs

    @staticmethod
    def out_channels(base: int = 8) -> dict[str, int]:
        return {"stage1": 4 * base, "stage2": 2 * base, "stage3": base}


class RedFeatureNet(nn.Module):
    base: int = 8
    num_stages: int = 3
    arch_mode: str = "unet"  # "unet" | "fpn"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict[str, jnp.ndarray]:
        assert self.arch_mode in ("unet", "fpn")
        b = self.base
        # stock XLA convs: 2.2x faster than shift-einsum at feature-net
        # shapes (tools/feature_probe.py, round 5)
        conv = lambda f, k, s: ConvBlock(f, k, s, dtype=self.dtype,
                                         use_stock=True)

        c0 = conv(b, 3, 1)(x, train)
        c0 = conv(b, 3, 1)(c0, train)
        c1 = conv(2 * b, 5, 2)(c0, train)
        c1 = conv(2 * b, 3, 1)(c1, train)
        c1 = conv(2 * b, 3, 1)(c1, train)
        c2 = conv(4 * b, 5, 2)(c1, train)
        c2 = conv(4 * b, 3, 1)(c2, train)
        c2 = conv(4 * b, 3, 1)(c2, train)

        outputs = {}
        intra = c2
        outputs["stage1"] = FastConv(4 * b, (1, 1), use_bias=False, dtype=self.dtype, use_stock=True)(intra)

        if self.arch_mode == "unet":
            if self.num_stages >= 2:
                intra = DeConvFuse(2 * b, dtype=self.dtype, use_stock=True)(c1, intra, train)
                outputs["stage2"] = FastConv(2 * b, (1, 1), use_bias=False, dtype=self.dtype, use_stock=True)(intra)
            if self.num_stages >= 3:
                # automatic dispatch at full res (see AdaFeatureNet note)
                intra = DeConvFuse(b, dtype=self.dtype)(c0, intra, train)
                outputs["stage3"] = FastConv(b, (1, 1), use_bias=False, dtype=self.dtype)(intra)
        else:  # fpn (msrednet.py:115-128)
            final = 4 * b
            if self.num_stages >= 2:
                up = jax.image.resize(
                    intra, (intra.shape[0], intra.shape[1] * 2, intra.shape[2] * 2, intra.shape[3]),
                    method="nearest",
                )
                intra = up + FastConv(final, (1, 1), use_bias=True, dtype=self.dtype, use_stock=True)(c1)
                f2 = 2 * b if self.num_stages == 3 else b
                outputs["stage2"] = FastConv(f2, (3, 3), use_bias=False, dtype=self.dtype, use_stock=True)(intra)
            if self.num_stages >= 3:
                up = jax.image.resize(
                    intra, (intra.shape[0], intra.shape[1] * 2, intra.shape[2] * 2, intra.shape[3]),
                    method="nearest",
                )
                intra = up + FastConv(final, (1, 1), use_bias=True, dtype=self.dtype, use_stock=True)(c0)
                outputs["stage3"] = FastConv(b, (3, 3), use_bias=False, dtype=self.dtype)(intra)

        return outputs

    @staticmethod
    def out_channels(base: int = 8) -> dict[str, int]:
        return {"stage1": 4 * base, "stage2": 2 * base, "stage3": base}
