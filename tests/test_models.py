"""Model-level tests: shapes/contracts, losses, gradients, and a functional
sanity check — with enough depth hypotheses and photo-consistent inputs, even a
randomly-initialized Ada-MVS correlation pipeline should localize depth near
the ground truth on the synthetic scene (plane-sweep peaks at the true depth).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adamvs_tpu.geom import proj_matrix, stage_proj_matrices
from adamvs_tpu.models import AdaMVS, MSREDNet, cas_mvs_vis_loss, cas_rednet_loss

pytestmark = pytest.mark.slow  # heavy tier; excluded from the default run

KEY = jax.random.PRNGKey(0)


def scene_batch(scene, view_num=3):
    """Build a [B=1] model feed from the synthetic scene (NHWC)."""
    views = scene.views[:view_num]
    from adamvs_tpu.data.pipeline import center_image

    imgs = np.stack([center_image(v.image) for v in views])[None]  # [1,V,H,W,3]
    proj = np.stack([proj_matrix(v.camera) for v in views])
    projs = {k: v[None] for k, v in stage_proj_matrices(proj).items()}
    dv = np.array([[scene.depth_start, scene.depth_end, scene.depth_interval]], np.float32)
    return jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in projs.items()}, jnp.asarray(dv)


@pytest.fixture(scope="module")
def small_model_io(synthetic_scene):
    imgs, projs, dv = scene_batch(synthetic_scene)
    model = AdaMVS(ndepths=(16, 8), depth_intervals_ratio=(4.0, 2.0), base=8)
    vars_ = model.init(KEY, imgs, projs, dv)
    return model, vars_, imgs, projs, dv


def test_adamvs_output_contract(small_model_io, synthetic_scene):
    model, vars_, imgs, projs, dv = small_model_io
    out = model.apply(vars_, imgs, projs, dv)
    H, W = synthetic_scene.height, synthetic_scene.width
    # 2-stage cascade: stage1 (up) at H/2, stage2 (up) at H
    assert out["stage1"]["depth"].shape == (1, H // 2, W // 2)
    assert out["stage2"]["depth"].shape == (1, H, W)
    assert out["depth"].shape == (1, H, W)
    assert out["photometric_confidence"].shape == (1, H, W)
    assert len(out["stage1"]["pair_result"]) == 2  # V-1 per-view depths
    assert out["stage1"]["pair_confidence"].shape == (1, H // 4, W // 4, 2)
    assert len(out["stage2"]["pair_result"]) == 0
    conf = np.asarray(out["photometric_confidence"])
    assert np.isfinite(conf).all() and (conf >= 0).all() and (conf <= 1 + 1e-5).all()
    # depths inside the hypothesis range (stage1 uniform sweep guarantees it)
    d = np.asarray(out["depth"])
    assert np.isfinite(d).all()


def test_msrednet_output_contract(synthetic_scene):
    imgs, projs, dv = scene_batch(synthetic_scene)
    model = MSREDNet(ndepths=(16, 8), depth_intervals_ratio=(4.0, 2.0), base=8)
    vars_ = model.init(KEY, imgs, projs, dv)
    out = model.apply(vars_, imgs, projs, dv)
    H, W = synthetic_scene.height, synthetic_scene.width
    # MS-REDNet cells never upsample: stage outputs live at stage res
    assert out["stage1"]["depth"].shape == (1, H // 4, W // 4)
    assert out["stage2"]["depth"].shape == (1, H // 2, W // 2)
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_adamvs_predict_convention(small_model_io):
    """depth_values [B,2] + num_depth (predict) must run the same cascade."""
    model, vars_, imgs, projs, dv = small_model_io
    dv2 = dv[:, :2]
    out = model.apply(vars_, imgs, projs, dv2, num_depth=64)
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_adamvs_losses_finite(small_model_io, synthetic_scene):
    model, vars_, imgs, projs, dv = small_model_io
    out = model.apply(vars_, imgs, projs, dv)
    H, W = synthetic_scene.height, synthetic_scene.width
    gt = jnp.asarray(synthetic_scene.views[0].depth[None])
    gt_ms = {
        "stage1": gt[:, ::4, ::4],
        "stage2": gt,
    }
    mask_ms = {k: jnp.ones_like(v) for k, v in gt_ms.items()}
    loss, dloss = cas_mvs_vis_loss(out, gt_ms, mask_ms, dlossw=(0.5, 1.0))
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert np.isfinite(float(dloss))


def test_gradients_flow(small_model_io, synthetic_scene):
    model, vars_, imgs, projs, dv = small_model_io
    gt = jnp.asarray(synthetic_scene.views[0].depth[None])
    gt_ms = {"stage1": gt[:, ::4, ::4], "stage2": gt}
    mask_ms = {k: jnp.ones_like(v) for k, v in gt_ms.items()}

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            imgs, projs, dv, train=True, mutable=["batch_stats"],
        )[0]
        return cas_mvs_vis_loss(out, gt_ms, mask_ms, dlossw=(0.5, 1.0))[0]

    grads = jax.grad(loss_fn)(vars_["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    nonzero = sum(float(np.abs(np.asarray(l)).sum()) > 0 for l in leaves)
    # the vast majority of parameters must receive gradient
    assert nonzero / len(leaves) > 0.9


def test_plane_sweep_localizes_depth(synthetic_scene):
    """Functional sanity: windowed-SSD plane sweep over a uniform hypothesis
    sweep must localize the true depth — photo-consistency makes the SSD ~0 at
    the correct plane, so argmin error checks the entire warp/projection stack
    end-to-end (a convention bug would produce plausible-but-wrong depths)."""
    from adamvs_tpu.ops import plane_sweep_warp
    from adamvs_tpu.ops.sampling import uniform_depth_samples

    imgs, projs, dv = scene_batch(synthetic_scene)
    ref = imgs[:, 0]
    src = imgs[:, 1]
    p = projs["stage3"]
    D = 96
    hyp = uniform_depth_samples(dv[:, :2], D)

    def ssd_block(hb):
        warped = plane_sweep_warp(src, p[:, 1], p[:, 0], hb)  # [B,d,h,w,C]
        diff = ((warped - ref[:, None]) ** 2).sum(-1)  # [B,d,h,w]
        # 5x5 window aggregation
        k = jnp.ones((5, 5), diff.dtype) / 25.0
        return jax.vmap(
            lambda v: jax.scipy.signal.convolve2d(v, k, mode="same"), in_axes=1, out_axes=1
        )(diff[0])[None]

    blocks = [ssd_block(hyp[:, i : i + 16]) for i in range(0, D, 16)]
    ssd = jnp.concatenate(blocks, axis=1)  # [B,D,h,w]
    best = jnp.take_along_axis(
        hyp[:, :, None, None], jnp.argmin(ssd, axis=1, keepdims=True), axis=1
    )[:, 0]
    gt = synthetic_scene.views[0].depth[None]
    err = np.abs(np.asarray(best) - gt)
    step = (synthetic_scene.depth_end - synthetic_scene.depth_start) / (D - 1)
    # interior pixels (window fully valid) within a few sweep steps of truth
    interior = err[:, 8:-8, 8:-8]
    assert np.median(interior) < 2 * step
    assert (interior < 4 * step).mean() > 0.8
