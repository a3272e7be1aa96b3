"""Banded (MXU-formulated) warp == reference gather warp."""

import jax.numpy as jnp
import numpy as np
import pytest

from adamvs_tpu.geom import proj_matrix
from adamvs_tpu.ops import bilinear_sample, plane_sweep_warp
from adamvs_tpu.ops.warp_banded import banded_bilinear_sample, plane_sweep_warp_banded


def test_banded_matches_gather_random_smooth():
    rng = np.random.RandomState(0)
    H, W, C = 64, 96, 8
    feat = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    y, x = np.meshgrid(np.arange(48, dtype=np.float32), np.arange(80, dtype=np.float32), indexing="ij")
    u = (x + 5.3 + 0.02 * x + 2 * np.sin(y / 17.0))[None, None]
    v = (y + 3.1 + 0.01 * x + 1.5 * np.sin(x / 23.0))[None, None]
    u = jnp.asarray(u)
    v = jnp.asarray(v)
    ref = bilinear_sample(feat, u, v)
    out = banded_bilinear_sample(feat, u, v, tile_h=8, tile_w=16, row_band=24, col_band=48)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_banded_zero_padding_borders():
    """Coords straddling the image border must reproduce zeros-padding."""
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(1, 16, 32, 4).astype(np.float32))
    y, x = np.meshgrid(np.arange(16, dtype=np.float32), np.arange(32, dtype=np.float32), indexing="ij")
    u = jnp.asarray((x - 3.5)[None, None])  # left border crossing
    v = jnp.asarray((y + 12.3)[None, None])  # bottom border crossing
    ref = bilinear_sample(feat, u, v)
    out = banded_bilinear_sample(feat, u, v, tile_h=8, tile_w=16, row_band=16, col_band=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_banded_far_out_of_image():
    feat = jnp.ones((1, 16, 32, 2))
    u = jnp.full((1, 1, 16, 32), -1e9)
    v = jnp.full((1, 1, 16, 32), -1e9)
    out = banded_bilinear_sample(feat, u, v, tile_h=8, tile_w=16)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_banded_plane_sweep_matches_reference(synthetic_scene):
    """Full plane-sweep warp parity on the synthetic scene, both hypothesis
    forms, including non-tile-multiple shapes (padding path)."""
    ref_v = synthetic_scene.views[0]
    src_v = synthetic_scene.views[1]
    ref_proj = jnp.asarray(proj_matrix(ref_v.camera)[None])
    src_proj = jnp.asarray(proj_matrix(src_v.camera)[None])
    feat = jnp.asarray(src_v.image[None].astype(np.float32))

    # per-pixel depth (GT)
    depth_px = jnp.asarray(ref_v.depth[None, None])
    a = plane_sweep_warp(feat, src_proj, ref_proj, depth_px)
    b = plane_sweep_warp_banded(
        feat, src_proj, ref_proj, depth_px, tile_h=8, tile_w=64, row_band=48, col_band=128
    )
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3)

    # fronto-parallel planes [B,D]
    d0 = float(ref_v.depth.mean())
    hyp = jnp.asarray(np.array([[d0 * 0.95, d0, d0 * 1.05]], np.float32))
    a = plane_sweep_warp(feat, src_proj, ref_proj, hyp)
    b = plane_sweep_warp_banded(
        feat, src_proj, ref_proj, hyp, tile_h=8, tile_w=64, row_band=48, col_band=128
    )
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3)


def test_banded_batch_and_depth_axes():
    rng = np.random.RandomState(2)
    B, N, H, W, C = 2, 3, 32, 32, 4
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    u = jnp.asarray(rng.uniform(0, W - 1, (B, N, 24, 24)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, H - 1, (B, N, 24, 24)).astype(np.float32))
    # random (non-smooth) coords: use full-image bands so banding stays exact
    ref = bilinear_sample(feat, u, v)
    out = banded_bilinear_sample(feat, u, v, tile_h=8, tile_w=8, row_band=32, col_band=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_band_overflow_detector_flags_depth_discontinuity():
    """The banded sampler silently zeros in-image samples farther than the
    static band from a tile's min coordinate — possible only across extreme
    depth discontinuities. The detector must flag exactly that geometry, stay
    silent on smooth scenes, and its flag must coincide with banded != gather."""
    from adamvs_tpu.ops.warp_banded import band_overflow, plane_sweep_band_overflow

    rng = np.random.RandomState(5)
    B, H, W, C = 1, 64, 256, 4  # source frame
    h, w = 64, 96  # reference grid
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    ref_proj = np.eye(4, dtype=np.float32)[None].repeat(B, 0)
    ref_proj[:, 0, 0] = ref_proj[:, 1, 1] = 2200.0
    src_proj = ref_proj.copy()
    # proj = K @ T, so the stored translation is focal-scaled: f*baseline.
    # u(x, d) = x + 48000/d -> offset 160px at d=300, 80px at d=600
    src_proj[:, 0, 3] = 48000.0
    # col_band must cover tile_w + in-tile disparity spread: 64 is exact for
    # smooth scenes at tile_w=32, overflowed by the 80px step-scene jump
    bands = dict(tile_h=8, tile_w=32, row_band=32, col_band=64)

    # smooth scene: constant depth -> zero overflow, banded == gather
    depth_smooth = jnp.full((B, 1, h, w), 400.0, jnp.float32)
    diag = plane_sweep_band_overflow(
        (H, W), jnp.asarray(src_proj), jnp.asarray(ref_proj), depth_smooth, **bands
    )
    assert float(diag["overflow_frac"]) == 0.0
    a = plane_sweep_warp(feat, jnp.asarray(src_proj), jnp.asarray(ref_proj),
                         depth_smooth)
    b = plane_sweep_warp_banded(
        feat, jnp.asarray(src_proj), jnp.asarray(ref_proj), depth_smooth, **bands
    )
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3)

    # step scene: 300 vs 600 inside one tile row -> u jumps 80px > col_band-1
    step = np.full((B, 1, h, w), 300.0, np.float32)
    step[:, :, :, w // 2:] = 600.0
    depth_step = jnp.asarray(step)
    diag = plane_sweep_band_overflow(
        (H, W), jnp.asarray(src_proj), jnp.asarray(ref_proj), depth_step, **bands
    )
    assert float(diag["overflow_frac"]) > 0.0
    assert float(diag["max_uspread"]) > 64 - 1

    a = plane_sweep_warp(feat, jnp.asarray(src_proj), jnp.asarray(ref_proj), depth_step)
    b = plane_sweep_warp_banded(
        feat, jnp.asarray(src_proj), jnp.asarray(ref_proj), depth_step, **bands
    )
    # the discrepancy exists (that is the failure mode) and is what the
    # detector quantifies
    assert float(jnp.max(jnp.abs(a - b))) > 0.1
