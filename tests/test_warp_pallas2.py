"""Merged-lane Pallas kernel (v2) == XLA gather reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from adamvs_tpu.ops import bilinear_sample
from adamvs_tpu.ops.warp_pallas2 import banded_bilinear_sample_pallas2


def test_pallas2_matches_gather_smooth():
    rng = np.random.RandomState(0)
    H, W, C = 64, 128, 8
    feat = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    y, x = np.meshgrid(np.arange(48, dtype=np.float32), np.arange(96, dtype=np.float32), indexing="ij")
    u = jnp.asarray((x + 7.3 + 0.02 * x + 2 * np.sin(y / 17.0))[None, None])
    v = jnp.asarray((y + 3.1 + 0.01 * x + 1.5 * np.sin(x / 23.0))[None, None])
    ref = bilinear_sample(feat, u, v)
    out = banded_bilinear_sample_pallas2(
        feat, u, v, tile_h=8, tile_w=32, row_band=16, col_band=48, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas2_batch_depth_random_full_band():
    """Bands >= whole (padded) image: any coordinate pattern must be exact,
    including out-of-image samples (zeros)."""
    rng = np.random.RandomState(1)
    B, N = 2, 2
    feat = jnp.asarray(rng.randn(B, 32, 64, 4).astype(np.float32))
    u = jnp.asarray(rng.uniform(-4, 67, (B, N, 16, 32)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-4, 35, (B, N, 16, 32)).astype(np.float32))
    ref = bilinear_sample(feat, u, v)
    out = banded_bilinear_sample_pallas2(
        feat, u, v, tile_h=8, tile_w=16, row_band=40, col_band=120, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas2_c16_and_border():
    rng = np.random.RandomState(2)
    H, W, C = 40, 72, 16
    feat = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    # samples straddling every border (zeros-padding behavior)
    y, x = np.meshgrid(
        np.linspace(-1.5, H + 0.5, 24, dtype=np.float32),
        np.linspace(-1.5, W + 0.5, 32, dtype=np.float32),
        indexing="ij",
    )
    u = jnp.asarray(x[None, None])
    v = jnp.asarray(y[None, None])
    ref = bilinear_sample(feat, u, v)
    out = banded_bilinear_sample_pallas2(
        feat, u, v, tile_h=8, tile_w=16, row_band=48, col_band=112, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas2_fallback_when_c_not_pow2():
    """C=6 does not divide 128 -> falls back to the XLA banded path."""
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(1, 32, 64, 6).astype(np.float32))
    y, x = np.meshgrid(np.arange(16, dtype=np.float32), np.arange(32, dtype=np.float32), indexing="ij")
    u = jnp.asarray((x + 1.2)[None, None])
    v = jnp.asarray((y + 0.7)[None, None])
    ref = bilinear_sample(feat, u, v)
    out = banded_bilinear_sample_pallas2(feat, u, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas2_bf16_matmul_close():
    """mm_dtype=bfloat16 quantizes only feature values + hat weights; output
    must stay f32 and within bf16 relative error of the exact gather."""
    rng = np.random.RandomState(4)
    H, W, C = 64, 128, 8
    feat = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    y, x = np.meshgrid(np.arange(48, dtype=np.float32), np.arange(96, dtype=np.float32), indexing="ij")
    u = jnp.asarray((x + 7.3 + 0.02 * x + 2 * np.sin(y / 17.0))[None, None])
    v = jnp.asarray((y + 3.1 + 0.01 * x + 1.5 * np.sin(x / 23.0))[None, None])
    ref = bilinear_sample(feat, u, v)
    out = banded_bilinear_sample_pallas2(
        feat, u, v, tile_h=8, tile_w=32, row_band=16, col_band=48, interpret=True,
        mm_dtype=jnp.bfloat16,
    )
    assert out.dtype == jnp.float32
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert float(err.max()) < 0.05, float(err.max())
    assert float(err.mean()) < 0.01, float(err.mean())


def test_pallas2_merged_source_equals_raw():
    """Pre-merged sources (merge_source — the scan-hoisted form) must sample
    identically to per-call merging, for f32 and the bf16 matmul mode."""
    from adamvs_tpu.ops.warp_pallas2 import merge_source

    rng = np.random.RandomState(6)
    H, W, C = 64, 128, 8
    feat = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    y, x = np.meshgrid(np.arange(48, dtype=np.float32), np.arange(96, dtype=np.float32), indexing="ij")
    u = jnp.asarray((x + 7.3 + 0.02 * x)[None, None])
    v = jnp.asarray((y + 3.1 + 0.01 * x)[None, None])
    kw = dict(tile_h=8, tile_w=32, row_band=16, col_band=48, interpret=True)
    raw = banded_bilinear_sample_pallas2(feat, u, v, **kw)
    merged = merge_source(feat, row_band=16, col_band=48)
    out = banded_bilinear_sample_pallas2(merged, u, v, **kw)
    assert out.dtype == raw.dtype
    np.testing.assert_array_equal(np.asarray(out), np.asarray(raw))

    raw_bf = banded_bilinear_sample_pallas2(feat, u, v, mm_dtype=jnp.bfloat16, **kw)
    merged_bf = merge_source(feat, row_band=16, col_band=48, mm_dtype=jnp.bfloat16)
    out_bf = banded_bilinear_sample_pallas2(merged_bf, u, v, **kw)
    assert out_bf.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out_bf), np.asarray(raw_bf))
