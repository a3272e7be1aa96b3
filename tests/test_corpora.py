"""Loader tests for the DTU / BlendedMVS / WHU-MVS corpora layouts."""

import numpy as np
import pytest

from adamvs_tpu.data.lists import build_sample_list
from adamvs_tpu.data.pipeline import load_train_sample


@pytest.fixture(scope="module")
def small_scene():
    from adamvs_tpu.data.synthetic import make_scene

    return make_scene(num_views=3, height=64, width=96, seed=1)


def _check_sample(ts, scene, view_num):
    H, W = scene.height, scene.width
    assert ts.imgs.shape == (view_num, H, W, 3)
    assert np.isfinite(ts.imgs).all()
    assert ts.depth["stage3"].shape == (H, W)
    m = ts.mask["stage3"] > 0.5
    assert m.mean() > 0.8
    np.testing.assert_allclose(
        ts.depth["stage3"][m], scene.views[0].depth[m], atol=0.5
    )
    # projection matrices consistent: reproject the GT depth of the center px
    proj = ts.proj_matrices["stage3"][0]
    assert proj.shape == (4, 4)


def test_dtu_tree_loads(tmp_path, small_scene):
    from adamvs_tpu.data.synthetic import write_dtu_tree

    root = write_dtu_tree(str(tmp_path / "dtu"), small_scene)
    samples = build_sample_list(root, "dtu", view_num=3)
    # 3 ref views x 7 light conditions
    assert len(samples) == 21
    ts = load_train_sample(samples[0], mode="test")
    _check_sample(ts, small_scene, 3)
    # dtu depth range: start + 192 * interval (cas_total_rscv.py:348)
    assert ts.depth_values[1] > ts.depth_values[0]


def test_blendedmvs_tree_loads(tmp_path, small_scene):
    from adamvs_tpu.data.synthetic import write_blendedmvs_tree

    root = write_blendedmvs_tree(str(tmp_path / "bmvs"), small_scene)
    samples = build_sample_list(root, "BlendedMVS", view_num=3)
    assert len(samples) == 3
    ts = load_train_sample(samples[0], mode="test")
    _check_sample(ts, small_scene, 3)
    assert ts.depth_values[0] == pytest.approx(small_scene.depth_start)
    assert ts.depth_values[2] == pytest.approx(small_scene.depth_interval)


def test_whu_mvs_tree_loads(tmp_path, small_scene):
    from adamvs_tpu.data.synthetic import write_whu_mvs_tree

    root = write_whu_mvs_tree(str(tmp_path / "whu_mvs"), small_scene)
    samples = build_sample_list(root, "whu_mvs", view_num=3)
    assert len(samples) == 3
    ts = load_train_sample(samples[0], mode="test")
    # png/64 depth quantization: 1/64 resolution
    H, W = small_scene.height, small_scene.width
    assert ts.imgs.shape == (3, H, W, 3)
    m = ts.mask["stage3"] > 0.5
    np.testing.assert_allclose(
        ts.depth["stage3"][m], small_scene.views[0].depth[m], atol=0.05
    )
