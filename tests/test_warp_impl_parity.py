"""Model-level warp-implementation parity: banded == gather forward."""

import jax
import jax.numpy as jnp
import numpy as np

from adamvs_tpu.models import AdaMVS

KEY = jax.random.PRNGKey(0)


def test_model_banded_warp_matches_gather(synthetic_scene):
    from tests.test_models import scene_batch

    imgs, projs, dv = scene_batch(synthetic_scene)
    kw = dict(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4, cr_base=(4, 4))
    m_gather = AdaMVS(warp_impl="gather", **kw)
    m_banded = AdaMVS(warp_impl="banded", warp_bands=(32, 96), **kw)
    variables = m_gather.init(KEY, imgs, projs, dv)

    out_g = m_gather.apply(variables, imgs, projs, dv)
    out_b = m_banded.apply(variables, imgs, projs, dv)

    dg = np.asarray(out_g["depth"])
    db = np.asarray(out_b["depth"])
    err = np.abs(dg - db)
    # identical math modulo contraction-order fp noise, amplified through the
    # recurrent network — compare against the depth range scale
    scale = synthetic_scene.depth_end - synthetic_scene.depth_start
    assert np.median(err) < 1e-3 * scale
    assert np.max(err) < 2e-2 * scale, f"max {err.max()} vs scale {scale}"
    cg = np.asarray(out_g["photometric_confidence"])
    cb = np.asarray(out_b["photometric_confidence"])
    assert np.median(np.abs(cg - cb)) < 1e-3
