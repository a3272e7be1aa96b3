"""Tests for the non-live reference building blocks (SURVEY §2.2 M3/M6/M7/M8)
and the double-precision warp grid (M10's homo_warping_double)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adamvs_tpu.nn.extras import (
    ConvBn3D,
    ConvBnReLU3D,
    ConvGn,
    ConvGnReLU,
    ConvLSTMCell,
    ConvTransGnReLU,
    DeformConvBlock,
    DeformConvGnReLU,
)


def test_conv_lstm_cell_shapes_and_state():
    cell = ConvLSTMCell(hidden=6)
    x = jnp.ones((2, 8, 10, 4))
    carry = cell.init_carry(2, 8, 10)
    variables = cell.init(jax.random.PRNGKey(0), carry, x)
    (c, h), y = cell.apply(variables, carry, x)
    assert c.shape == h.shape == y.shape == (2, 8, 10, 6)
    assert np.array_equal(np.asarray(h), np.asarray(y))
    # state updates are bounded by the tanh/sigmoid algebra
    assert np.all(np.abs(np.asarray(h)) <= 1.0)


def test_conv3d_blocks():
    x = jnp.ones((1, 6, 8, 8, 3))  # [B,D,H,W,C] volume
    m = ConvBnReLU3D(features=5, stride=2)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 3, 4, 4, 5)
    assert np.all(np.asarray(y) >= 0)

    m2 = ConvBn3D(features=4)
    v2 = m2.init(jax.random.PRNGKey(1), x)
    y2 = m2.apply(v2, x)
    assert y2.shape == (1, 6, 8, 8, 4)


def test_groupnorm_blocks():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4), jnp.float32)
    for cls, out_shape in [
        (ConvGnReLU, (2, 8, 8, 16)),
        (ConvGn, (2, 8, 8, 16)),
        (ConvTransGnReLU, (2, 16, 16, 16)),
    ]:
        m = cls(features=16)
        variables = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(variables, x)
        assert y.shape == out_shape
        # GroupNorm with G = max(1, 16//8) = 2 groups
        gn = [k for k in variables["params"] if "GroupNorm" in k]
        assert gn, "GroupNorm layer missing"


def test_deform_conv_zero_offsets_match_plain_conv():
    """Zero-initialized offsets + unit mask == a plain KxK convolution."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 10, 12, 3), jnp.float32)
    m = DeformConvBlock(features=7, modulated=False)
    variables = m.init(jax.random.PRNGKey(3), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 10, 12, 7)

    # build the equivalent plain conv: proj is a 1x1 over [K*K*C] gathered taps
    # with zero offsets == 3x3 conv with zero padding
    import flax.linen as nn

    proj_k = variables["params"]["proj"]["kernel"]  # [1,1,9*C,F]
    proj_b = variables["params"]["proj"]["bias"]
    K, C, F = 3, 3, 7
    w = np.zeros((K, K, C, F), np.float32)
    for t in range(K * K):
        w[t // K, t % K] = np.asarray(proj_k[0, 0, t * C : (t + 1) * C])
    conv = nn.Conv(F, (K, K), padding="SAME", use_bias=True)
    ref = conv.apply({"params": {"kernel": jnp.asarray(w), "bias": proj_b}}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_deform_conv_modulated_halves_zero_init():
    """Modulated DCNv2 at init: sigmoid(0) = 0.5 scales every tap."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 2), jnp.float32)
    m1 = DeformConvBlock(features=4, modulated=True)
    m0 = DeformConvBlock(features=4, modulated=False)
    v1 = m1.init(jax.random.PRNGKey(5), x)
    # share the projection weights, drop the mask head
    p = dict(v1["params"])
    p0 = {k: v for k, v in p.items() if k != "mask"}
    y1 = m1.apply(v1, x)
    y0 = m0.apply({"params": p0}, x)
    b = np.asarray(v1["params"]["proj"]["bias"])
    np.testing.assert_allclose(
        np.asarray(y1) - b, (np.asarray(y0) - b) * 0.5, rtol=1e-4, atol=1e-5
    )


def test_deform_gn_relu_runs():
    x = jnp.ones((1, 8, 8, 3))
    m = DeformConvGnReLU(features=8)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 8, 8, 8)
    assert np.all(np.asarray(y) >= 0)


def test_double_precision_warp_grid():
    """grid_dtype=f64 matches f32 on benign geometry and actually runs in x64."""
    from adamvs_tpu.ops.warp import plane_sweep_warp

    rng = np.random.RandomState(6)
    feat = jnp.asarray(rng.rand(1, 16, 20, 3), jnp.float32)
    proj_r = np.eye(4, dtype=np.float32)
    proj_s = np.eye(4, dtype=np.float32)
    proj_s[0, 3] = 2.5  # pure pixel shift at unit depth
    depth = jnp.ones((1, 2), jnp.float32) * 4.0
    a = plane_sweep_warp(feat, jnp.asarray(proj_s)[None], jnp.asarray(proj_r)[None], depth)
    jax.config.update("jax_enable_x64", True)
    try:
        b = plane_sweep_warp(
            feat, jnp.asarray(proj_s)[None], jnp.asarray(proj_r)[None], depth,
            grid_dtype=jnp.float64,
        )
    finally:
        jax.config.update("jax_enable_x64", False)
    assert b.dtype == feat.dtype
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
