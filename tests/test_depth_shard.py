"""Depth-hypothesis-axis sharding (the SP analog, SURVEY.md §2.6):

- ``online_softmax_merge`` is associative/commutative and merging per-block
  partial scans equals the full scan (the algebra that makes D-blocks
  shardable at all);
- the depth-sharded AdaMVS forward (warp+fuse under shard_map over a
  ``depth`` mesh axis) is IDENTICAL to the unsharded forward with the same
  variables — exact, not approximate (the GRU scan is replicated, not reset
  per block).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from adamvs_tpu.models import AdaMVS
from adamvs_tpu.ops.regression import (
    online_softmax_finalize,
    online_softmax_init,
    online_softmax_merge,
    online_softmax_update,
)

KEY = jax.random.PRNGKey(0)

pytestmark = pytest.mark.slow  # heavy tier; excluded from the default run


def test_online_softmax_merge_equals_full_scan():
    rng = np.random.RandomState(0)
    D, shape = 12, (1, 5, 7)
    costs = rng.randn(D, *shape).astype(np.float32) * 3
    depths = (rng.rand(D, *shape).astype(np.float32) * 100 + 300)

    full = online_softmax_init(shape)
    for d in range(D):
        full = online_softmax_update(full, jnp.asarray(costs[d]), jnp.asarray(depths[d]))

    # 3 blocks of 4, scanned locally then tree-merged (one still-empty state
    # exercises the -inf guard)
    parts = []
    for b in range(3):
        acc = online_softmax_init(shape)
        for d in range(4 * b, 4 * b + 4):
            acc = online_softmax_update(acc, jnp.asarray(costs[d]), jnp.asarray(depths[d]))
        parts.append(acc)
    parts.append(online_softmax_init(shape))  # empty shard (padding case)
    merged = online_softmax_merge(online_softmax_merge(parts[0], parts[1]),
                                  online_softmax_merge(parts[2], parts[3]))

    df, cf = online_softmax_finalize(full)
    dm, cm = online_softmax_finalize(merged)
    np.testing.assert_allclose(np.asarray(dm), np.asarray(df), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cm), np.asarray(cf), rtol=1e-5)


@pytest.fixture(scope="module")
def depth_mesh():
    devs = np.array(jax.devices()[:4])
    return Mesh(devs, ("depth",))


def test_depth_sharded_forward_equals_unsharded(synthetic_scene, depth_mesh):
    from tests.test_models import scene_batch

    imgs, projs, dv = scene_batch(synthetic_scene)
    kw = dict(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4, cr_base=(4, 4))
    plain = AdaMVS(**kw)
    sharded = AdaMVS(depth_mesh=depth_mesh, **kw)

    variables = plain.init(KEY, imgs, projs, dv)
    # identical parameter trees: the sharded path must restore plain ckpts
    v2 = sharded.init(KEY, imgs, projs, dv)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)

    out_a = plain.apply(variables, imgs, projs, dv, train=False)
    out_b = jax.jit(
        lambda v, i, p, d: sharded.apply(v, i, p, d, train=False)
    )(variables, imgs, projs, dv)
    np.testing.assert_allclose(
        np.asarray(out_b["depth"]), np.asarray(out_a["depth"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_b["photometric_confidence"]),
        np.asarray(out_a["photometric_confidence"]), atol=1e-4,
    )
