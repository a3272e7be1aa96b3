"""MSREDNet reg_impl='precomp' (models/msrednet.py red_precomp_depth): the
depth-batched restructure of the 4-level GN-GRU recurrence must match the
per-slice RedCell scan with the same parameters — unit (cost volume) and
model level (full cascade through the fused sweep, interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from adamvs_tpu.models import MSREDNet
from adamvs_tpu.models.adamvs import model_pack_reg
from adamvs_tpu.models.msrednet import red_precomp_depth
from adamvs_tpu.nn.costreg import RedCell

pytestmark = pytest.mark.slow  # heavy tier; excluded from the default run

KEY = jax.random.PRNGKey(0)


def test_red_precomp_matches_cell_scan():
    rng = np.random.RandomState(0)
    D, B, h, w, C, base = 5, 1, 24, 32, 16, 8
    cell = RedCell(base)
    carry0 = cell.init_carry(B, h, w)
    variables = cell.init(KEY, carry0, jnp.zeros((B, h, w, C)))
    vol = jnp.asarray(rng.randn(D, B, h, w, C).astype(np.float32))
    lo = jnp.full((B, h, w), 300.0)
    step = jnp.full((B, h, w), 25.0)

    carry = carry0
    outs = []
    for d in range(D):
        carry, cost = cell.apply(variables, carry, vol[d])
        outs.append(cost[..., 0])
    cost_ref = jnp.stack(outs).astype(jnp.float32)  # [D,B,h,w]
    prob = jax.nn.softmax(cost_ref, axis=0)
    d_idx = jnp.arange(D, dtype=jnp.float32)[:, None, None, None]
    hyp = lo[None] + d_idx * step[None]
    want_depth = np.asarray(jnp.sum(prob * hyp, axis=0))

    got_depth, _ = red_precomp_depth(variables["params"], vol, base, lo, step)
    err = np.max(np.abs(np.asarray(got_depth) - want_depth))
    assert err / 25.0 < 5e-5, err


def test_msrednet_precomp_model_matches_scan():
    from tests.test_models import scene_batch

    pytest.importorskip("jax")
    # reuse the synthetic-scene fixture machinery via direct call
    import tests.conftest as _c  # noqa: F401

    rng = np.random.RandomState(1)
    B, V, H, W = 1, 3, 64, 64
    imgs = jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32))
    proj = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    for v in range(V):
        proj[:, v, 0, 0] = proj[:, v, 1, 1] = 80.0
        proj[:, v, 0, 2] = W / 2
        proj[:, v, 1, 2] = H / 2
        proj[:, v, 0, 3] = 80.0 * 0.8 * v
    projs = {}
    for k, s in (("stage1", 4), ("stage2", 2), ("stage3", 1)):
        p = proj.copy()
        p[:, :, :2, :] /= s
        projs[k] = jnp.asarray(p)
    dv = jnp.asarray([[300.0, 500.0, 25.0]], jnp.float32)

    kw = dict(ndepths=(8, 4, 4), depth_intervals_ratio=(4.0, 2.0, 1.0),
              base=8, cr_base=(8, 8, 8))
    m_scan = MSREDNet(warp_impl="gather", **kw)  # pure XLA reference path
    m_pre = MSREDNet(sweep_impl="fusedf32", reg_impl="precomp", **kw)
    variables = m_scan.init(KEY, imgs, projs, dv)
    packed = model_pack_reg(m_pre, variables)

    out_s = m_scan.apply(variables, imgs, projs, dv, train=False)
    with pltpu.force_tpu_interpret_mode():
        out_p = m_pre.apply(variables, imgs, projs, dv, train=False,
                            packed_reg=packed)
    ds = np.asarray(out_s["depth"])
    dp = np.asarray(out_p["depth"])
    err = np.abs(dp - ds) / 200.0  # depth range
    assert err.max() < 1e-4, f"precomp model deviates: rel max {err.max():.2e}"


def test_msrednet_precomp_requires_packed():
    kw = dict(ndepths=(8, 4, 4), base=4, cr_base=(4, 4, 4))
    m = MSREDNet(sweep_impl="fusedf32", reg_impl="precomp", **kw)
    imgs = jnp.zeros((1, 2, 32, 32, 3))
    projs = {f"stage{k}": jnp.tile(jnp.eye(4), (1, 2, 1, 1)).astype(jnp.float32)
             for k in (1, 2, 3)}
    dv = jnp.asarray([[10.0, 20.0, 1.0]], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        variables = m.init(KEY, imgs, projs, dv)  # init: no loud check
        with pytest.raises(ValueError, match="precomp"):
            m.apply(variables, imgs, projs, dv, train=False)


def test_adamvs_precomp_model_matches_scan():
    """AdaMVS reg_impl='precomp' (ada_precomp_depth): the depth-batched
    restructure must match the exact scan path with the same checkpoint."""
    from adamvs_tpu.models import AdaMVS

    rng = np.random.RandomState(2)
    B, V, H, W = 1, 3, 64, 64
    imgs = jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32))
    proj = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    for v in range(V):
        proj[:, v, 0, 0] = proj[:, v, 1, 1] = 80.0
        proj[:, v, 0, 2] = W / 2
        proj[:, v, 1, 2] = H / 2
        proj[:, v, 0, 3] = 80.0 * 0.8 * v
    projs = {}
    for k, s in (("stage1", 4), ("stage2", 2), ("stage3", 1)):
        p = proj.copy()
        p[:, :, :2, :] /= s
        projs[k] = jnp.asarray(p)
    dv = jnp.asarray([[300.0, 500.0, 25.0]], jnp.float32)

    kw = dict(ndepths=(8, 4, 4), depth_intervals_ratio=(4.0, 2.0, 1.0),
              base=8, cr_base=(8, 8, 8))
    m_scan = AdaMVS(warp_impl="gather", **kw)
    m_pre = AdaMVS(sweep_impl="fusedf32", reg_impl="precomp", **kw)
    variables = m_scan.init(KEY, imgs, projs, dv)
    packed = model_pack_reg(m_pre, variables)

    out_s = m_scan.apply(variables, imgs, projs, dv, train=False)
    with pltpu.force_tpu_interpret_mode():
        out_p = m_pre.apply(variables, imgs, projs, dv, train=False,
                            packed_reg=packed)
    ds = np.asarray(out_s["depth"])
    dp = np.asarray(out_p["depth"])
    err = np.abs(dp - ds) / 200.0
    assert err.max() < 1e-4, f"adamvs precomp deviates: rel max {err.max():.2e}"
