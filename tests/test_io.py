"""Codec round-trip tests: PFM, EXR, camera text dialects."""

import numpy as np
import pytest

from adamvs_tpu.io import (
    read_pfm,
    write_pfm,
    read_exr_depth,
    write_exr_depth,
    read_obliquewhu_cam,
    read_view_pairs,
    read_predict_cameras,
    read_predict_images,
    read_predict_image_paths,
    write_red_cam,
)
from adamvs_tpu.io.exr import read_exr, write_exr, _zip_compress, _zip_uncompress
from adamvs_tpu.geom import legacy_cam_array


def test_pfm_roundtrip_gray(tmp_path):
    img = np.random.RandomState(0).rand(17, 23).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    write_pfm(p, img)
    back, scale = read_pfm(p)
    np.testing.assert_array_equal(back, img)
    assert scale == 1.0


def test_pfm_roundtrip_color(tmp_path):
    img = np.random.RandomState(0).rand(8, 5, 3).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    write_pfm(p, img)
    back, _ = read_pfm(p)
    np.testing.assert_array_equal(back, img)


def test_exr_zip_predictor_roundtrip():
    data = np.random.RandomState(0).randint(0, 256, size=1001, dtype=np.uint8).tobytes()
    packed = _zip_compress(data)
    assert _zip_uncompress(packed, len(data)) == data


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
def test_exr_roundtrip_float(tmp_path, compression):
    depth = (np.random.RandomState(0).rand(37, 53) * 1000).astype(np.float32)
    p = str(tmp_path / "d.exr")
    write_exr_depth(p, depth, compression=compression)
    back = read_exr_depth(p)
    np.testing.assert_array_equal(back, depth)


def test_exr_half_channel(tmp_path):
    img = np.random.RandomState(1).rand(20, 31).astype(np.float16)
    p = str(tmp_path / "h.exr")
    write_exr(p, {"Y": img}, compression="zip")
    back = read_exr(p)["Y"]
    np.testing.assert_array_equal(back, img)


def test_exr_multichannel(tmp_path):
    rng = np.random.RandomState(2)
    chans = {c: rng.rand(16, 16).astype(np.float32) for c in ("B", "G", "R")}
    p = str(tmp_path / "rgb.exr")
    write_exr(p, chans)
    back = read_exr(p)
    for c in chans:
        np.testing.assert_array_equal(back[c], chans[c])


def test_obliquewhu_cam_roundtrip(tmp_path, synthetic_scene):
    from adamvs_tpu.data.synthetic import _write_obliquewhu_cam_txt

    view = synthetic_scene.views[1]
    p = str(tmp_path / "cam.txt")
    _write_obliquewhu_cam_txt(p, view)
    cam = read_obliquewhu_cam(p)
    np.testing.assert_allclose(cam.tcw, view.camera.tcw, atol=1e-5)
    np.testing.assert_allclose(cam.K, view.camera.K, atol=1e-5)
    assert cam.depth_start == pytest.approx(synthetic_scene.depth_start)
    assert cam.depth_end == pytest.approx(synthetic_scene.depth_end)
    # ceil-to-32 hypothesis count (cas_total_rscv.py:421)
    assert cam.depth_count % 32 == 0
    assert cam.depth_count >= (cam.depth_end - cam.depth_start) / cam.depth_interval


def test_predict_source_parsers(tmp_path, synthetic_scene):
    from adamvs_tpu.data.synthetic import write_predict_source_tree

    root = write_predict_source_tree(str(tmp_path / "source"), synthetic_scene)
    cams = read_predict_cameras(root + "/camera_info.txt")
    photos = read_predict_images(root + "/image_info.txt")
    paths, names = read_predict_image_paths(root + "/image_path.txt")
    pairs = read_view_pairs(root + "/viewpair.txt", view_num=3)

    assert len(cams) == 1 and 1 in cams
    assert len(photos) == len(synthetic_scene.views)
    assert len(paths) == len(synthetic_scene.views)
    # parser keeps all sources (truncation happens at use — predict_oblique.py:124)
    assert all(len(p) >= 3 for p in pairs)
    ph = photos[0]
    np.testing.assert_allclose(ph.rwc, synthetic_scene.views[0].rwc, atol=1e-12)
    assert ph.depth_min == pytest.approx(synthetic_scene.depth_start)


def test_view_pair_padding(tmp_path):
    p = str(tmp_path / "pair.txt")
    with open(p, "w") as f:
        f.write("2\n0\n2 1 0.5 2 0.4\n5\n1 3 0.9\n")
    pairs = read_view_pairs(p, view_num=4)
    # sources are padded up to view_num by repeating the first (data_io.py:127-130)
    assert pairs[0] == [0, 1, 2, 1, 1]
    assert pairs[1] == [5, 3, 3, 3, 3]


def test_write_red_cam(tmp_path, synthetic_scene):
    cam = synthetic_scene.views[0].camera
    arr = legacy_cam_array(cam)
    p = str(tmp_path / "out.txt")
    write_red_cam(p, arr, "/some/ref.png")
    text = open(p).read()
    assert text.startswith("extrinsic: XrightYdown, [Rcw|tcw]\n")
    assert "/some/ref.png" in text
    toks = text.split()
    # extrinsic tokens 3..18 parse back to Tcw
    back = np.array([float(t) for t in toks[3:19]]).reshape(4, 4)
    np.testing.assert_allclose(back, cam.tcw, rtol=1e-6)
