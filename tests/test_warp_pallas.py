"""Pallas banded-warp kernel == XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from adamvs_tpu.ops import bilinear_sample
from adamvs_tpu.ops.warp_pallas import banded_bilinear_sample_pallas


def test_pallas_kernel_matches_gather():
    rng = np.random.RandomState(0)
    H, W, C = 64, 128, 8
    feat = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    y, x = np.meshgrid(np.arange(48, dtype=np.float32), np.arange(96, dtype=np.float32), indexing="ij")
    u = jnp.asarray((x + 7.3 + 0.02 * x + 2 * np.sin(y / 17.0))[None, None])
    v = jnp.asarray((y + 3.1 + 0.01 * x + 1.5 * np.sin(x / 23.0))[None, None])
    ref = bilinear_sample(feat, u, v)
    out = banded_bilinear_sample_pallas(
        feat, u, v, tile_h=8, tile_w=32, row_band=32, col_band=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_kernel_batch_depth():
    rng = np.random.RandomState(1)
    B, N = 2, 2
    feat = jnp.asarray(rng.randn(B, 32, 64, 4).astype(np.float32))
    u = jnp.asarray(rng.uniform(-2, 65, (B, N, 16, 32)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-2, 33, (B, N, 16, 32)).astype(np.float32))
    ref = bilinear_sample(feat, u, v)
    out = banded_bilinear_sample_pallas(
        feat, u, v, tile_h=8, tile_w=16, row_band=32, col_band=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
