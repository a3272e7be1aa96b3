"""Geometry tests: convention conversion, projection, warp photo-consistency.

These validate the whole camera/warp stack against analytic synthetic scenes —
per SURVEY.md hard-part #5, an off-by-one here produces plausible-but-wrong
depths, so these run before any model exists.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adamvs_tpu.geom import (
    camera_from_legacy,
    convert_photogrammetric_extrinsic,
    crop_to_multiple,
    depth_sample_count,
    legacy_cam_array,
    proj_matrix,
    scale_camera,
    stage_proj_matrices,
)
from adamvs_tpu.ops import plane_sweep_warp, bilinear_sample, uniform_depth_samples
from adamvs_tpu.ops.sampling import windowed_depth_samples, window_min_and_interval


def test_extrinsic_conversion_roundtrip():
    rng = np.random.RandomState(0)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.randn(3) * 10
    tcw = convert_photogrammetric_extrinsic(q, t)
    # inverse of Tcw must be [q@diag(1,-1,-1) | t]
    twc = np.linalg.inv(tcw)
    np.testing.assert_allclose(twc[:3, :3], q @ np.diag([1, -1, -1]), atol=1e-5)
    np.testing.assert_allclose(twc[:3, 3], t, atol=1e-4)
    # proper rigid transform
    np.testing.assert_allclose(tcw[3], [0, 0, 0, 1], atol=1e-6)


def test_projection_of_known_point(synthetic_scene):
    """A world point on the plane must project to the pixel whose ray hit it."""
    view = synthetic_scene.views[0]
    a, b, h0 = synthetic_scene.plane
    proj = proj_matrix(view.camera)
    # pick the world point under pixel (u,v) via the rendered depth
    u, v = 40, 30
    d = view.depth[v, u]
    # back-project with the converted camera: p_cam = d * K^-1 [u,v,1]
    p_cam = d * np.linalg.inv(view.camera.K) @ np.array([u, v, 1.0])
    twc = np.linalg.inv(view.camera.tcw)
    p_world = twc[:3, :3] @ p_cam + twc[:3, 3]
    # the point lies on the plane
    assert p_world[2] == pytest.approx(a * p_world[0] + b * p_world[1] + h0, abs=1e-3)
    # and reprojects to (u,v)
    ph = proj @ np.append(p_world, 1.0)
    assert ph[0] / ph[2] == pytest.approx(u, abs=1e-3)
    assert ph[1] / ph[2] == pytest.approx(v, abs=1e-3)


def test_stage_proj_scaling(synthetic_scene):
    cam = synthetic_scene.views[0].camera
    proj = proj_matrix(cam)[None]
    stages = stage_proj_matrices(proj)
    np.testing.assert_allclose(stages["stage3"], proj)
    np.testing.assert_allclose(stages["stage2"][0, :2], proj[0, :2] / 2)
    np.testing.assert_allclose(stages["stage1"][0, :2], proj[0, :2] / 4)
    np.testing.assert_allclose(stages["stage1"][0, 2:], proj[0, 2:])


def test_scale_camera_consistency(synthetic_scene):
    """Halving the camera must project world points to halved pixel coords."""
    view = synthetic_scene.views[1]
    cam_half = scale_camera(view.camera, 0.5)
    p_world = np.array([5.0, -3.0, 20.0, 1.0])
    full = proj_matrix(view.camera) @ p_world
    half = proj_matrix(cam_half) @ p_world
    assert half[0] / half[2] == pytest.approx(0.5 * full[0] / full[2])
    assert half[1] / half[2] == pytest.approx(0.5 * full[1] / full[2])


def test_crop_to_multiple():
    assert crop_to_multiple(100, 200, 5504, 3712) == (128, 224)
    assert crop_to_multiple(6000, 200, 5504, 3712) == (5504, 224)
    assert crop_to_multiple(5504, 3712, 5504, 3712, resize_scale=0.5) == (2752, 1856)


def test_depth_sample_count():
    # matches int((end-start)/interval/32 + 1)*32 (cas_total_rscv.py:315)
    assert depth_sample_count(0, 100, 1.0) == 128
    assert depth_sample_count(0, 31, 1.0) == 32
    assert depth_sample_count(10, 330, 0.5) == 672


def test_legacy_cam_roundtrip(synthetic_scene):
    cam = synthetic_scene.views[2].camera
    back = camera_from_legacy(legacy_cam_array(cam))
    np.testing.assert_allclose(back.K, cam.K, rtol=1e-6)
    np.testing.assert_allclose(back.tcw, cam.tcw, rtol=1e-6)
    assert back.depth_start == pytest.approx(cam.depth_start)


# ---------------------------------------------------------------------------
# warp
# ---------------------------------------------------------------------------


def test_warp_identity():
    """Warping a view into its own frustum is the identity at any depth."""
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(1, 16, 24, 4).astype(np.float32))
    proj = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    depth = jnp.asarray(np.array([[5.0, 9.0]], dtype=np.float32))
    warped = plane_sweep_warp(feat, proj, proj, depth)
    assert warped.shape == (1, 2, 16, 24, 4)
    np.testing.assert_allclose(np.asarray(warped[:, 0]), np.asarray(feat), atol=1e-5)
    np.testing.assert_allclose(np.asarray(warped[:, 1]), np.asarray(feat), atol=1e-5)


def test_bilinear_sample_matches_manual():
    rng = np.random.RandomState(0)
    feat = rng.rand(1, 8, 9, 2).astype(np.float32)
    u = np.array([[1.5, 0.0, 7.9, -0.5, 9.2]], dtype=np.float32)
    v = np.array([[2.25, 0.0, 6.9, 3.0, 1.0]], dtype=np.float32)
    out = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(u), jnp.asarray(v)))

    def manual(ui, vi):
        x0, y0 = int(np.floor(ui)), int(np.floor(vi))
        du, dv = ui - x0, vi - y0
        acc = np.zeros(2, np.float32)
        for (xx, yy, w) in [
            (x0, y0, (1 - du) * (1 - dv)),
            (x0 + 1, y0, du * (1 - dv)),
            (x0, y0 + 1, (1 - du) * dv),
            (x0 + 1, y0 + 1, du * dv),
        ]:
            if 0 <= xx <= 8 and 0 <= yy <= 7:
                acc += w * feat[0, yy, xx]
        return acc

    for i in range(u.shape[1]):
        np.testing.assert_allclose(out[0, i], manual(u[0, i], v[0, i]), atol=1e-5)


def test_warp_photo_consistency(synthetic_scene):
    """Warping a source image at the GT depth reproduces the reference image.

    This exercises the full stack: photogrammetric conversion, projection
    matrices, relative transform, perspective divide, bilinear sampling.
    """
    ref = synthetic_scene.views[0]
    src = synthetic_scene.views[1]
    ref_proj = jnp.asarray(proj_matrix(ref.camera)[None])
    src_proj = jnp.asarray(proj_matrix(src.camera)[None])
    src_img = jnp.asarray(src.image[None].astype(np.float32))
    depth = jnp.asarray(ref.depth[None, None])  # [B=1, D=1, H, W]

    warped = np.asarray(plane_sweep_warp(src_img, src_proj, ref_proj, depth))[0, 0]
    ref_img = ref.image.astype(np.float32)

    # valid where the source actually sees the point (warped!=0 zero-padding)
    valid = warped.sum(-1) > 0
    assert valid.mean() > 0.5  # decent overlap
    err = np.abs(warped - ref_img)[valid]
    # bilinear resampling of a smooth texture: mean error should be tiny
    assert err.mean() < 2.0
    assert np.median(err) < 1.5


def test_warp_per_pixel_equals_constant_depth(synthetic_scene):
    """[B,D] constant hypotheses must equal a [B,D,H,W] constant volume."""
    ref = synthetic_scene.views[0]
    src = synthetic_scene.views[2]
    H, W = ref.depth.shape
    ref_proj = jnp.asarray(proj_matrix(ref.camera)[None])
    src_proj = jnp.asarray(proj_matrix(src.camera)[None])
    feat = jnp.asarray(src.image[None].astype(np.float32))
    d0 = float(ref.depth.mean())
    flat = plane_sweep_warp(feat, src_proj, ref_proj, jnp.full((1, 2), d0))
    vol = plane_sweep_warp(feat, src_proj, ref_proj, jnp.full((1, 2, H, W), d0))
    np.testing.assert_allclose(np.asarray(flat), np.asarray(vol), atol=1e-4)


def test_warp_grad_blocked_through_grid(synthetic_scene):
    """Gradients flow to features, not through the sampling grid (module.py:538)."""
    import jax

    ref = synthetic_scene.views[0]
    src = synthetic_scene.views[1]
    ref_proj = jnp.asarray(proj_matrix(ref.camera)[None])
    src_proj = jnp.asarray(proj_matrix(src.camera)[None])
    feat = jnp.asarray(src.image[None].astype(np.float32))
    depth = jnp.full((1, 1), float(ref.depth.mean()))

    g_feat = jax.grad(lambda f: plane_sweep_warp(f, src_proj, ref_proj, depth).sum())(feat)
    assert np.isfinite(np.asarray(g_feat)).all()
    assert np.abs(np.asarray(g_feat)).sum() > 0

    g_depth = jax.grad(lambda d: plane_sweep_warp(feat, src_proj, ref_proj, d).sum())(depth)
    np.testing.assert_array_equal(np.asarray(g_depth), 0.0)


# ---------------------------------------------------------------------------
# hypothesis sampling
# ---------------------------------------------------------------------------


def test_uniform_samples():
    dr = jnp.asarray(np.array([[10.0, 20.0]], dtype=np.float32))
    s = np.asarray(uniform_depth_samples(dr, 6))
    np.testing.assert_allclose(s[0], [10, 12, 14, 16, 18, 20], atol=1e-6)


def test_windowed_samples():
    prev = jnp.full((1, 4, 4), 100.0)
    s = np.asarray(windowed_depth_samples(prev, 8, 2.0))
    assert s.shape == (1, 8, 4, 4)
    # lo = 100 - 4*2 = 92, hi = 108, step = 16/7
    np.testing.assert_allclose(s[0, 0], 92.0, atol=1e-5)
    np.testing.assert_allclose(s[0, -1], 108.0, atol=1e-5)
    lo, step = window_min_and_interval(prev, 8, 2.0)
    np.testing.assert_allclose(np.asarray(lo), 92.0)
    np.testing.assert_allclose(np.asarray(step), 16.0 / 7.0)
