"""Tile-sharded predict: row-band sharded forward == unsharded forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adamvs_tpu.models import AdaMVS, MSREDNet
from adamvs_tpu.parallel import make_mesh
from adamvs_tpu.predict.tiled import tiled_forward

pytestmark = pytest.mark.slow  # heavy tier; excluded from the default run

KEY = jax.random.PRNGKey(0)


def _scene_io(scene, view_num=3):
    from tests.test_models import scene_batch

    imgs, projs, dv = scene_batch(scene, view_num)
    return imgs, projs, dv[:, :2]  # predict convention [B,2]


@pytest.mark.parametrize("model_cls", [AdaMVS, MSREDNet])
def test_tiled_matches_unsharded(synthetic_scene, model_cls):
    imgs, projs, dv = _scene_io(synthetic_scene)
    model = model_cls(
        ndepths=(8, 4, 4), depth_intervals_ratio=(4.0, 2.0, 1.0), base=4, cr_base=(4, 4, 4)
    )
    variables = model.init(KEY, imgs, projs, dv, num_depth=32)

    full = model.apply(variables, imgs, projs, dv, num_depth=32)
    ref_depth = np.asarray(full["depth"])
    ref_conf = np.asarray(full["photometric_confidence"])

    mesh = make_mesh(data=1, tile=4)
    depth, conf = tiled_forward(
        model, variables, imgs, projs, dv, mesh, num_depth=32, halo=32
    )
    depth = np.asarray(depth)
    conf = np.asarray(conf)

    assert depth.shape == ref_depth.shape
    # interior of each band must match; only band-edge rows can deviate when
    # the halo under-covers the receptive field (halo=32 < full RF here, so
    # allow a row margin at band boundaries)
    H = depth.shape[1]
    rows = H // 4
    interior = np.ones(H, bool)
    for b in range(1, 4):
        interior[b * rows - 2 : b * rows + 2] = False
    err = np.abs(depth - ref_depth)[:, interior]
    assert np.median(err) < 1e-3
    assert (err < 1e-2).mean() > 0.97
    cerr = np.abs(conf - ref_conf)[:, interior]
    assert np.median(cerr) < 1e-3


def test_tiled_large_halo_near_exact(synthetic_scene):
    """With a halo >= the receptive field, the match should be tight everywhere."""
    imgs, projs, dv = _scene_io(synthetic_scene)
    model = AdaMVS(
        ndepths=(8, 4, 4), depth_intervals_ratio=(4.0, 2.0, 1.0), base=4, cr_base=(4, 4, 4)
    )
    variables = model.init(KEY, imgs, projs, dv, num_depth=32)
    full = np.asarray(model.apply(variables, imgs, projs, dv, num_depth=32)["depth"])

    mesh = make_mesh(data=1, tile=2)
    depth, _ = tiled_forward(
        model, variables, imgs, projs, dv, mesh, num_depth=32, halo=44
    )
    err = np.abs(np.asarray(depth) - full)
    assert np.max(err) < 1e-2, f"max err {err.max()}"
    assert np.median(err) < 1e-4
