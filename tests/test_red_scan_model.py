"""Model-level parity: AdaMVS(reg_impl='pallas') — the fused Pallas
regularizer-scan inference path (ops/red_scan.py) — vs the exact XLA scan
path, same parameter tree, interpret mode on CPU.

Covers the full wiring: fused-sweep folded volume -> refold_spatial bulk
relayout -> ada_red_scan -> full-softmax regression == the scan path's
online-softmax accumulation."""

import jax
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from adamvs_tpu.models import AdaMVS
from adamvs_tpu.models.adamvs import pack_reg_params
import pytest

pytestmark = pytest.mark.slow  # heavy tier; excluded from the default run


def test_model_pallas_reg_matches_scan(synthetic_scene):
    from tests.test_models import scene_batch

    imgs, projs, dv = scene_batch(synthetic_scene)
    kw = dict(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4,
              cr_base=(4, 4))
    m_scan = AdaMVS(warp_impl="gather", **kw)
    m_pallas = AdaMVS(sweep_impl="fusedf32", reg_impl="pallas", **kw)
    variables = m_scan.init(jax.random.PRNGKey(0), imgs, projs, dv)
    packed = pack_reg_params(m_pallas, variables)

    out_s = m_scan.apply(variables, imgs, projs, dv)
    with pltpu.force_tpu_interpret_mode():
        out_p = m_pallas.apply(variables, imgs, projs, dv, packed_reg=packed)

    ds = np.asarray(out_s["depth"])
    dp = np.asarray(out_p["depth"])
    assert dp.shape == ds.shape
    scale = synthetic_scene.depth_end - synthetic_scene.depth_start
    err = np.abs(ds - dp)
    assert np.median(err) < 1e-3 * scale
    assert np.max(err) < 2e-2 * scale, f"max {err.max()} vs scale {scale}"
    cs = np.asarray(out_s["photometric_confidence"])
    cp = np.asarray(out_p["photometric_confidence"])
    assert np.median(np.abs(cs - cp)) < 1e-3
