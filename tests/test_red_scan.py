"""Parity: the fused Pallas regularizer-scan (ops/red_scan.py, interpret
mode) vs the exact flax AdaRedCell scan it replaces (nn/costreg.py).

The kernel is bitwise-restructured math (MXU contractions per kernel column,
phase-decomposed transposed convs, halo'd row tiles with HBM carry ping-pong),
so agreement across tile boundaries, image edges (non-tile-multiple h/w), both
``up`` modes, and multiple depth slices exercises every structural mechanism:
halo exchange via the carry buffers, boundary masking, decimation/interleave
alignment, and the tap/phase weight packing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adamvs_tpu.nn.costreg import AdaRedCell
from adamvs_tpu.ops.red_scan import ada_red_scan, pack_red_params, spatialize

pytestmark = pytest.mark.slow  # heavy tier; excluded from the default run


def _ref_scan(cell, variables, vol):
    """nn.scan-free reference: python loop of the flax cell over depth."""
    D, B, h, w, C = vol.shape
    carry = cell.init_carry(B, h, w, vol.dtype)
    outs = []
    for d in range(D):
        (carry, cost) = cell.apply(variables, carry, vol[d])
        outs.append(cost[..., 0])
    return jnp.stack(outs)  # [D, B, oh, ow]


@pytest.mark.parametrize("up", [True, False])
def test_red_scan_matches_cell_scan(up):
    rng = np.random.RandomState(0 if up else 1)
    D, B, h, w, C, base = 5, 1, 44, 74, 8, 8  # h, w not tile multiples
    th = 16
    cell = AdaRedCell(base, up)
    carry0 = cell.init_carry(B, h, w)
    variables = cell.init(
        jax.random.PRNGKey(2), carry0, jnp.zeros((B, h, w, C))
    )
    vol = jnp.asarray(rng.randn(D, B, h, w, C).astype(np.float32))

    want = _ref_scan(cell, variables, vol)
    packed = pack_red_params(variables["params"], up)
    got = ada_red_scan(
        packed, spatialize(vol, th), C, base, up, h, w,
        tile_rows=th, interpret=True,
    )
    assert got.shape == want.shape
    err = float(jnp.max(jnp.abs(got - want)))
    scale = float(jnp.std(want)) + 1e-9
    assert err / scale < 5e-5, (err, scale)


def test_red_scan_batch_and_multitile():
    """B=2 and several row tiles: carries must not leak across batch or depth
    parity, and the tile seams must be exact."""
    rng = np.random.RandomState(3)
    D, B, h, w, C, base = 4, 2, 64, 40, 16, 8
    th = 16
    cell = AdaRedCell(base, True)
    variables = cell.init(
        jax.random.PRNGKey(4), cell.init_carry(B, h, w), jnp.zeros((B, h, w, C))
    )
    vol = jnp.asarray(rng.randn(D, B, h, w, C).astype(np.float32))
    want = _ref_scan(cell, variables, vol)
    got = ada_red_scan(
        pack_red_params(variables["params"], True), spatialize(vol, th),
        C, base, True, h, w, tile_rows=th, interpret=True,
    )
    err = float(jnp.max(jnp.abs(got - want)))
    scale = float(jnp.std(want)) + 1e-9
    assert err / scale < 5e-5, (err, scale)


def test_red_scan_bf16():
    """bf16 data path (the bench configuration)."""
    rng = np.random.RandomState(5)
    D, B, h, w, C, base = 3, 1, 32, 48, 8, 8
    th = 16
    cell = AdaRedCell(base, True, dtype=jnp.bfloat16)
    variables = cell.init(
        jax.random.PRNGKey(6),
        cell.init_carry(B, h, w, jnp.bfloat16),
        jnp.zeros((B, h, w, C), jnp.bfloat16),
    )
    vol = jnp.asarray(rng.randn(D, B, h, w, C).astype(np.float32)).astype(
        jnp.bfloat16
    )
    want = _ref_scan(cell, variables, vol).astype(jnp.float32)
    got = ada_red_scan(
        pack_red_params(variables["params"], True), spatialize(vol, th),
        C, base, True, h, w, tile_rows=th, interpret=True,
    ).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got - want)))
    scale = float(jnp.std(want)) + 1e-9
    # bf16 recurrence accumulates rounding differences across D steps
    assert err / scale < 0.08, (err, scale)
