"""Shift-einsum convs == flax nn.Conv / nn.ConvTranspose (same params)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adamvs_tpu.nn.fastconv import (
    FastConv,
    FastConvTranspose,
    conv2d_shift,
    conv2d_transpose_shift,
)


@pytest.mark.parametrize("ci,co,stride,k", [
    (8, 8, 1, 3), (8, 16, 2, 3), (3, 8, 1, 5), (16, 8, 1, 3), (5, 7, 2, 3),
])
def test_conv2d_shift_matches_lax(ci, co, stride, k):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 13, 17, ci), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = conv2d_shift(x, w, stride)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ci,co,stride,k,h,w_", [
    (8, 8, 2, 3, 12, 16), (16, 8, 2, 3, 7, 9), (4, 6, 2, 4, 8, 8),
    (8, 4, 3, 3, 6, 5),
])
def test_conv2d_transpose_shift_matches_flax(ci, co, stride, k, h, w_):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, h, w_, ci), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.float32)
    mod = nn.ConvTranspose(co, (k, k), strides=(stride, stride), padding="SAME",
                           use_bias=False)
    ref = mod.apply({"params": {"kernel": w}}, x)
    out = conv2d_transpose_shift(x, w, stride)
    assert out.shape == ref.shape == (1, h * stride, w_ * stride, co)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fastconv_module_param_compat():
    """FastConv params load into nn.Conv and produce identical outputs."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 10, 12, 8), jnp.float32)
    fast = FastConv(16, (3, 3), strides=(2, 2))
    variables = fast.init(jax.random.PRNGKey(0), x)
    std = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME")
    ref = std.apply(variables, x)
    out = fast.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fastconvtranspose_module_param_compat():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 7, 8), jnp.float32)
    fast = FastConvTranspose(8, (3, 3), strides=(2, 2))
    variables = fast.init(jax.random.PRNGKey(0), x)
    std = nn.ConvTranspose(8, (3, 3), strides=(2, 2), padding="SAME")
    ref = std.apply(variables, x)
    out = fast.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fastconv_large_c_falls_back():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 96), jnp.float32)
    fast = FastConv(96, (3, 3))
    variables = fast.init(jax.random.PRNGKey(0), x)
    std = nn.Conv(96, (3, 3), padding="SAME")
    np.testing.assert_allclose(
        np.asarray(fast.apply(variables, x)), np.asarray(std.apply(variables, x)),
        rtol=1e-5, atol=1e-4,
    )
