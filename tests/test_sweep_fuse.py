"""Fused sweep kernels (ops/sweep_fuse.py) vs the exact gather composition.

Interpret-mode (CPU) parity: the one-call fused/correlation volume kernels
must reproduce warp -> (ref ⊙ warp) -> visibility-weighted fusion (reference
adamvs.py:497-512) / channel-mean correlation (adamvs.py:268-288) built from
the exact XLA gather warp, for per-pixel hypothesis plans, multiple chunk
counts, and each live channel width.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adamvs_tpu.ops.sweep_fuse import (
    corr_sweep_volume,
    fused_sweep_volume,
    merge_sources,
)
from adamvs_tpu.ops.warp import plane_sweep_warp

pytestmark = pytest.mark.slow  # heavy tier; excluded from the default run


def make_case(seed, B, Vs, h, w, C, noise=2.0):
    rng = np.random.RandomState(seed)
    ref_feat = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    src_feats = jnp.asarray(rng.randn(Vs, B, h, w, C).astype(np.float32))
    proj = np.tile(np.eye(4, dtype=np.float32), (Vs + 1, B, 1, 1))
    for v in range(Vs + 1):
        proj[v, :, 0, 0] = proj[v, :, 1, 1] = 200.0
        proj[v, :, 0, 2] = w / 2
        proj[v, :, 1, 2] = h / 2
        proj[v, :, 0, 3] = 200.0 * 2.0 * v  # x-baselines
        proj[v, :, 1, 3] = 200.0 * 0.5 * v  # mild y-baseline (row motion)
    ref_proj = jnp.asarray(proj[0])
    src_projs = jnp.asarray(proj[1:])
    weights = jnp.asarray(rng.rand(B, h, w, Vs).astype(np.float32))
    base = np.full((B, h, w), 30.0, np.float32)
    lo = jnp.asarray(base + rng.randn(B, h, w).astype(np.float32) * noise)
    step = jnp.asarray(np.full((B, h, w), 0.8, np.float32)
                       + rng.rand(B, h, w).astype(np.float32) * 0.05)
    return ref_feat, src_feats, src_projs, ref_proj, weights, lo, step


def reference_fused(ref_feat, src_feats, src_projs, ref_proj, weights, lo, step, D):
    Vs = src_feats.shape[0]
    wn = weights / (1e-5 + jnp.sum(weights, axis=-1, keepdims=True))
    outs = []
    for d in range(D):
        hyp = (lo + d * step)[:, None]  # [B,1,h,w]
        acc = 0.0
        for v in range(Vs):
            warped = plane_sweep_warp(src_feats[v], src_projs[v], ref_proj, hyp)[:, 0]
            acc = acc + wn[..., v : v + 1] * (ref_feat * warped)
        outs.append(acc)
    return jnp.stack(outs)  # [D,B,h,w,C]


def reference_corr(ref_feat, src_feats, src_projs, ref_proj, lo, step, D):
    Vs = src_feats.shape[0]
    outs = []
    for v in range(Vs):
        per_d = []
        for d in range(D):
            hyp = (lo + d * step)[:, None]
            warped = plane_sweep_warp(src_feats[v], src_projs[v], ref_proj, hyp)[:, 0]
            per_d.append(jnp.mean(ref_feat * warped, axis=-1))
        outs.append(jnp.stack(per_d, axis=-1))  # [B,h,w,D]
    return jnp.stack(outs)  # [Vs,B,h,w,D]


@pytest.mark.parametrize("C,B,Vs,D,d_chunk", [
    (8, 1, 2, 8, 8),
    (16, 1, 3, 8, 4),
    (32, 2, 2, 6, 3),
])
def test_fused_sweep_matches_gather(C, B, Vs, D, d_chunk):
    h, w = 24, 40
    ref_feat, src_feats, src_projs, ref_proj, weights, lo, step = make_case(
        C + B, B, Vs, h, w, C
    )
    srcs = merge_sources(src_feats, row_band=12, col_band=128, mm_dtype=None)
    got = fused_sweep_volume(
        ref_feat, srcs, src_projs, ref_proj, weights, lo, step,
        num_depth=D, d_chunk=d_chunk, tile_h=8, tile_w=64, interpret=True,
    )
    want = reference_fused(
        ref_feat, src_feats, src_projs, ref_proj, weights, lo, step, D
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=5e-5)


def test_fused_sweep_bf16_close():
    C, B, Vs, D = 16, 1, 2, 8
    h, w = 24, 40
    ref_feat, src_feats, src_projs, ref_proj, weights, lo, step = make_case(
        7, B, Vs, h, w, C
    )
    srcs = merge_sources(src_feats, row_band=12, col_band=128,
                         mm_dtype=jnp.bfloat16)
    got = fused_sweep_volume(
        ref_feat, srcs, src_projs, ref_proj, weights, lo, step,
        num_depth=D, d_chunk=8, interpret=True,
    )
    want = reference_fused(
        ref_feat, src_feats, src_projs, ref_proj, weights, lo, step, D
    )
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = np.std(np.asarray(want)) + 1e-9
    assert np.max(err) / scale < 0.06, np.max(err) / scale
    assert np.mean(err) / scale < 0.01, np.mean(err) / scale


@pytest.mark.parametrize("C,Vs,D,d_chunk", [(16, 2, 8, 4), (32, 3, 6, 6)])
def test_corr_sweep_matches_gather(C, Vs, D, d_chunk):
    B, h, w = 1, 24, 40
    ref_feat, src_feats, src_projs, ref_proj, _, lo, step = make_case(
        C + 1, B, Vs, h, w, C
    )
    srcs = merge_sources(src_feats, row_band=12, col_band=128, mm_dtype=None)
    got = corr_sweep_volume(
        ref_feat, srcs, src_projs, ref_proj, lo, step,
        num_depth=D, d_chunk=d_chunk, interpret=True,
    )
    want = reference_corr(ref_feat, src_feats, src_projs, ref_proj, lo, step, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_sweep_behind_camera_zeros():
    """Hypotheses that project behind the source camera contribute zeros
    (ops/warp.py near-plane guard semantics)."""
    C, B, Vs, D = 8, 1, 1, 4
    h, w = 16, 24
    ref_feat, src_feats, src_projs, ref_proj, weights, lo, step = make_case(
        3, B, Vs, h, w, C
    )
    # drive hypotheses negative -> z <= 0 for some depths
    lo = jnp.full((B, h, w), -2.0)
    step = jnp.full((B, h, w), 1.0)
    srcs = merge_sources(src_feats, row_band=12, col_band=128, mm_dtype=None)
    got = fused_sweep_volume(
        ref_feat, srcs, src_projs, ref_proj, weights, lo, step,
        num_depth=D, d_chunk=4, interpret=True,
    )
    want = reference_fused(
        ref_feat, src_feats, src_projs, ref_proj, weights, lo, step, D
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_model_fused_sweep_matches_scan(synthetic_scene):
    """AdaMVS(sweep_impl='fusedf32') == AdaMVS(sweep_impl='scan') forward:
    same parameter tree, same math, one Pallas call per stage instead of a
    per-depth warp inside the recurrent scan."""
    from jax.experimental.pallas import tpu as pltpu

    from adamvs_tpu.models import AdaMVS
    from tests.test_models import scene_batch

    imgs, projs, dv = scene_batch(synthetic_scene)
    kw = dict(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4,
              cr_base=(4, 4))
    m_scan = AdaMVS(warp_impl="gather", **kw)
    m_fused = AdaMVS(sweep_impl="fusedf32", **kw)
    variables = m_scan.init(jax.random.PRNGKey(0), imgs, projs, dv)

    out_s = m_scan.apply(variables, imgs, projs, dv)
    with pltpu.force_tpu_interpret_mode():
        out_f = m_fused.apply(variables, imgs, projs, dv)

    ds = np.asarray(out_s["depth"])
    df = np.asarray(out_f["depth"])
    scale = synthetic_scene.depth_end - synthetic_scene.depth_start
    err = np.abs(ds - df)
    assert np.median(err) < 1e-3 * scale
    assert np.max(err) < 2e-2 * scale, f"max {err.max()} vs scale {scale}"
    cs = np.asarray(out_s["photometric_confidence"])
    cf = np.asarray(out_f["photometric_confidence"])
    assert np.median(np.abs(cs - cf)) < 1e-3
    # stage-1 per-view confidences feed later stages: check them too
    ps = np.asarray(out_s["stage1"]["pair_confidence"])
    pf = np.asarray(out_f["stage1"]["pair_confidence"])
    assert np.median(np.abs(ps - pf)) < 1e-3


def test_var_sweep_volume_matches_reference():
    """var_sweep_volume == variance over {ref, gather-warped views}
    (msrednet.py:214-231 semantics)."""
    from adamvs_tpu.ops.sweep_fuse import var_sweep_volume

    B, Vs, h, w, C, D = 1, 3, 24, 40, 8, 8
    ref_feat, src_feats, src_projs, ref_proj, _, lo, step = make_case(
        11, B, Vs, h, w, C
    )
    srcs = merge_sources(src_feats, row_band=12, col_band=128, mm_dtype=None)
    got = var_sweep_volume(
        ref_feat, srcs, src_projs, ref_proj, lo, step,
        num_depth=D, d_chunk=4, interpret=True,
    )
    nv = Vs + 1
    outs = []
    for d in range(D):
        hyp = (lo + d * step)[:, None]
        s = ref_feat
        q = ref_feat * ref_feat
        for v in range(Vs):
            warped = plane_sweep_warp(src_feats[v], src_projs[v], ref_proj, hyp)[:, 0]
            s = s + warped
            q = q + warped * warped
        outs.append(q / nv - (s / nv) ** 2)
    want = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_model_msrednet_fused_matches_scan(synthetic_scene):
    """MSREDNet(sweep_impl='fusedf32') == MSREDNet(sweep_impl='scan')."""
    from jax.experimental.pallas import tpu as pltpu

    from adamvs_tpu.models import MSREDNet
    from tests.test_models import scene_batch

    imgs, projs, dv = scene_batch(synthetic_scene)
    kw = dict(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4,
              cr_base=(4, 4))
    m_scan = MSREDNet(warp_impl="gather", **kw)
    m_fused = MSREDNet(sweep_impl="fusedf32", **kw)
    variables = m_scan.init(jax.random.PRNGKey(0), imgs, projs, dv)

    out_s = m_scan.apply(variables, imgs, projs, dv)
    with pltpu.force_tpu_interpret_mode():
        out_f = m_fused.apply(variables, imgs, projs, dv)

    ds = np.asarray(out_s["depth"])
    df = np.asarray(out_f["depth"])
    scale = synthetic_scene.depth_end - synthetic_scene.depth_start
    err = np.abs(ds - df)
    assert np.median(err) < 1e-3 * scale
    assert np.max(err) < 2e-2 * scale, f"max {err.max()} vs scale {scale}"
