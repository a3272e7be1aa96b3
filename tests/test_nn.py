"""NN building-block tests: shapes, scan/loop equivalence, BN semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adamvs_tpu.nn import (
    AdaFeatureNet,
    AdaRedCell,
    ConvGRUCell,
    CostRegNet2D,
    GNConvGRUCell,
    RedCell,
    RedFeatureNet,
    scan_regularizer,
)

KEY = jax.random.PRNGKey(0)


def test_ada_featurenet_shapes():
    net = AdaFeatureNet(base=8)
    x = jnp.zeros((2, 64, 96, 3))
    vars_ = net.init(KEY, x)
    out = net.apply(vars_, x)
    assert out["stage1"].shape == (2, 16, 24, 32)
    assert out["stage2"].shape == (2, 32, 48, 16)
    assert out["stage3"].shape == (2, 64, 96, 8)


@pytest.mark.parametrize("arch", ["unet", "fpn"])
def test_red_featurenet_shapes(arch):
    net = RedFeatureNet(base=8, arch_mode=arch)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = net.init(KEY, x)
    out = net.apply(vars_, x)
    assert out["stage1"].shape == (1, 16, 16, 32)
    assert out["stage2"].shape == (1, 32, 32, 16)
    assert out["stage3"].shape == (1, 64, 64, 8)


def test_featurenet_train_mode_updates_bn():
    net = AdaFeatureNet(base=8)
    x = jax.random.normal(KEY, (1, 32, 32, 3))
    vars_ = net.init(KEY, x)
    _, mutated = net.apply(vars_, x, train=True, mutable=["batch_stats"])
    # running stats must move from init
    leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaf)


def test_gru_cell_zero_state_fixed_point():
    """With zero input and zero state, out = (1-u)*tanh(c_bias-ish) — just
    check shape and that state propagates."""
    cell = ConvGRUCell(hidden=8)
    x = jax.random.normal(KEY, (1, 16, 16, 4))
    h = jnp.zeros((1, 16, 16, 8))
    vars_ = cell.init(KEY, h, x)
    out, h2 = cell.apply(vars_, h, x)
    assert out.shape == (1, 16, 16, 8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(h2))
    # feeding the new state changes the output
    out2, _ = cell.apply(vars_, h2, x)
    assert np.abs(np.asarray(out2 - out)).max() > 1e-6


def test_gn_gru_cell_shapes():
    cell = GNConvGRUCell(hidden=16)
    x = jax.random.normal(KEY, (2, 8, 8, 16))
    h = jnp.zeros((2, 8, 8, 16))
    vars_ = cell.init(KEY, h, x)
    out, h2 = cell.apply(vars_, h, x)
    assert out.shape == (2, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_costregnet2d_shapes():
    net = CostRegNet2D(channels=48)
    x = jax.random.normal(KEY, (1, 24, 32, 48))
    vars_ = net.init(KEY, x)
    out = net.apply(vars_, x)
    assert out.shape == (1, 24, 32, 48)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("up", [True, False])
def test_ada_red_cell_shapes(up):
    cell = AdaRedCell(base=8, up=up)
    cost = jax.random.normal(KEY, (1, 16, 24, 32))
    carry = cell.init_carry(1, 16, 24)
    vars_ = cell.init(KEY, carry, cost)
    (h1, h2), out = cell.apply(vars_, carry, cost)
    factor = 2 if up else 1
    assert out.shape == (1, 16 * factor, 24 * factor, 1)
    assert h1.shape == (1, 16, 24, 8)
    assert h2.shape == (1, 8, 12, 16)


def test_red_cell_shapes():
    cell = RedCell(base=8)
    cost = jax.random.normal(KEY, (1, 16, 24, 32))
    carry = cell.init_carry(1, 16, 24)
    vars_ = cell.init(KEY, carry, cost)
    carry2, out = cell.apply(vars_, carry, cost)
    assert out.shape == (1, 16, 24, 1)
    assert carry2[3].shape == (1, 2, 3, 64)


@pytest.mark.parametrize("cell_cls,kwargs", [(AdaRedCell, {"up": False}), (RedCell, {})])
def test_scan_matches_manual_loop(cell_cls, kwargs):
    """nn.scan over depth == manual per-slice loop with the same params —
    proves one implementation serves both the volume and streaming paths."""
    D, B, H, W, C = 5, 1, 16, 16, 8
    vol = jax.random.normal(KEY, (D, B, H, W, C))

    cell = cell_cls(base=8, **kwargs)
    carry0 = cell.init_carry(B, H, W)
    vars_ = cell.init(KEY, carry0, vol[0])

    scan_cls = scan_regularizer(cell_cls)
    scanned = scan_cls(base=8, **kwargs)
    carry_s, ys = scanned.apply(vars_, carry0, vol)

    carry_m = carry0
    outs = []
    for d in range(D):
        carry_m, y = cell.apply(vars_, carry_m, vol[d])
        outs.append(y)
    ys_manual = jnp.stack(outs)

    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_manual), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(carry_s), jax.tree_util.tree_leaves(carry_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_online_softmax_equals_full():
    """Streamed online softmax == full softmax regression (SURVEY hard-part #2)."""
    from adamvs_tpu.ops import (
        online_softmax_finalize,
        online_softmax_init,
        online_softmax_update,
    )

    rng = np.random.RandomState(0)
    D, B, H, W = 12, 2, 6, 7
    costs = jnp.asarray(rng.randn(D, B, H, W).astype(np.float32) * 30)  # wide range
    depths = jnp.asarray((rng.rand(D, B, H, W) * 100 + 50).astype(np.float32))

    state = online_softmax_init((B, H, W))
    for d in range(D):
        state = online_softmax_update(state, costs[d], depths[d])
    depth_s, conf_s = online_softmax_finalize(state)

    prob = jax.nn.softmax(costs, axis=0)
    depth_f = jnp.sum(prob * depths, axis=0)
    conf_f = jnp.max(prob, axis=0)

    np.testing.assert_allclose(np.asarray(depth_s), np.asarray(depth_f), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(conf_s), np.asarray(conf_f), rtol=1e-5)
