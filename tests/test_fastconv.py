"""Shift-einsum convs == torch semantics (the import-parity ground truth).

FastConv/FastConvTranspose are torch-grid-aligned (symmetric padding; see
nn/fastconv.py docstring), so reference checkpoints import bit-exactly
(train/torch_import.py). Each test checks BOTH code paths (shift-einsum and
the stock-XLA fallback) against torch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from adamvs_tpu.nn.fastconv import (
    FastConv,
    FastConvTranspose,
    conv2d_shift,
    conv2d_transpose_shift,
)


def torch_conv(x_nhwc, k_hwio, stride):
    """torch.conv2d with padding=(k-1)//2, NHWC/HWIO wrappers."""
    x = torch.tensor(np.asarray(x_nhwc).transpose(0, 3, 1, 2))
    w = torch.tensor(np.asarray(k_hwio).transpose(3, 2, 0, 1))  # OIHW
    p = ((k_hwio.shape[0] - 1) // 2, (k_hwio.shape[1] - 1) // 2)
    y = torch.conv2d(x, w, stride=stride, padding=p)
    return y.numpy().transpose(0, 2, 3, 1)


def torch_conv_transpose(x_nhwc, k_hwio, stride):
    """torch.conv_transpose2d equivalent of our correlation-form transposed
    conv: torch kernel = ours spatially flipped, IOHW."""
    kh, kw = k_hwio.shape[:2]
    pl_h = kh - 1 - (kh - 1) // 2
    p = kh - 1 - pl_h  # torch padding
    op = (kh + stride - 2 - pl_h) - pl_h  # torch output_padding
    x = torch.tensor(np.asarray(x_nhwc).transpose(0, 3, 1, 2))
    w = np.asarray(k_hwio)[::-1, ::-1].transpose(2, 3, 0, 1).copy()  # flip -> IOHW
    y = torch.conv_transpose2d(
        x, torch.tensor(w), stride=stride, padding=p, output_padding=op,
    )
    return y.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("ci,co,stride,k", [
    (8, 8, 1, 3), (8, 16, 2, 3), (3, 8, 1, 5), (16, 8, 1, 3), (5, 7, 2, 3),
    (3, 16, 2, 5),
])
def test_conv2d_shift_matches_torch(ci, co, stride, k):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 13, 17, ci), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.float32)
    ref = torch_conv(x, w, stride)
    out = conv2d_shift(x, w, stride)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ci,co,stride,k,h,w_", [
    (8, 8, 2, 3, 12, 16), (16, 8, 2, 3, 7, 9), (4, 6, 2, 4, 8, 8),
    (8, 4, 3, 3, 6, 5),
])
def test_conv2d_transpose_shift_matches_torch(ci, co, stride, k, h, w_):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, h, w_, ci), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.float32)
    ref = torch_conv_transpose(x, w, stride)
    out = conv2d_transpose_shift(x, w, stride)
    assert out.shape == ref.shape == (1, h * stride, w_ * stride, co)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ci,co", [(8, 16), (48, 48)])  # shift path / XLA path
def test_fastconv_module_both_paths_match_torch(ci, co):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 10, 12, ci), jnp.float32)
    fast = FastConv(co, (3, 3), strides=(2, 2))
    variables = fast.init(jax.random.PRNGKey(0), x)
    ref = torch_conv(x, np.asarray(variables["params"]["kernel"]), 2)
    ref = ref + np.asarray(variables["params"]["bias"])
    out = fast.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ci,co", [(8, 8), (48, 48)])  # shift path / XLA path
def test_fastconvtranspose_module_both_paths_match_torch(ci, co):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 7, ci), jnp.float32)
    fast = FastConvTranspose(co, (3, 3), strides=(2, 2))
    variables = fast.init(jax.random.PRNGKey(0), x)
    ref = torch_conv_transpose(x, np.asarray(variables["params"]["kernel"]), 2)
    ref = ref + np.asarray(variables["params"]["bias"])
    out = fast.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_fastconv_asymmetric_stride_uses_xla_path():
    """Asymmetric strides must not silently hit the square-stride shift path."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 12, 12, 8), jnp.float32)
    fast = FastConv(8, (3, 3), strides=(2, 1))
    variables = fast.init(jax.random.PRNGKey(0), x)
    out = fast.apply(variables, x)
    x_t = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    w_t = torch.tensor(np.asarray(variables["params"]["kernel"]).transpose(3, 2, 0, 1))
    ref = torch.conv2d(x_t, w_t, stride=(2, 1), padding=1).numpy().transpose(0, 2, 3, 1)
    ref = ref + np.asarray(variables["params"]["bias"])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
