"""Native (C++) host-runtime parity tests: PNG/EXR decode and preprocessing
must match the Python/PIL reference implementations exactly (or to rounding).
Skipped when the library isn't built (native/build.sh)."""

import io as _io

import numpy as np
import pytest
from PIL import Image

from adamvs_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libmvsnative.so not built"
)


def _png_bytes(arr, mode=None):
    buf = _io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return buf.getvalue()


def test_png_rgb8_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (37, 53, 3), dtype=np.uint8)
    out = native.decode_png(_png_bytes(img))
    np.testing.assert_array_equal(out, img)


def test_png_gray8():
    img = np.random.RandomState(1).randint(0, 256, (16, 23), dtype=np.uint8)
    out = native.decode_png(_png_bytes(img))
    np.testing.assert_array_equal(out, img)


def test_png_gray16():
    img = np.random.RandomState(2).randint(0, 65535, (20, 31), dtype=np.uint16)
    buf = _io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    out = native.decode_png(buf.getvalue())
    np.testing.assert_array_equal(out, img)


def test_png_rgba():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (12, 18, 4), dtype=np.uint8)
    out = native.decode_png(_png_bytes(img))
    np.testing.assert_array_equal(out, img)


def test_png_smooth_image_filters():
    """Smooth gradients exercise the non-trivial PNG row filters (sub/up/avg/paeth)."""
    y, x = np.mgrid[0:64, 0:64]
    img = np.stack([(x * 2) % 256, (y * 3) % 256, ((x + y)) % 256], -1).astype(np.uint8)
    out = native.decode_png(_png_bytes(img))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
@pytest.mark.parametrize("dtype", [np.float32, np.float16])
def test_exr_native_matches_python(tmp_path, compression, dtype):
    from adamvs_tpu.io.exr import write_exr

    depth = (np.random.RandomState(0).rand(45, 61) * 1000).astype(dtype)
    p = str(tmp_path / "d.exr")
    write_exr(p, {"Z": depth}, compression=compression)
    out = native.read_exr_depth(p)
    np.testing.assert_array_equal(out, depth.astype(np.float32))


def test_center_image_matches_python():
    from adamvs_tpu.data.pipeline import center_image as py_center

    img = np.random.RandomState(0).randint(0, 256, (64, 48, 3), dtype=np.uint8)
    ref = py_center(img)
    out = native.center_image(img)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_resize_matches_cv2():
    import cv2

    img = np.random.RandomState(0).randint(0, 256, (64, 96, 3), dtype=np.uint8)
    ref = cv2.resize(img, (48, 32), interpolation=cv2.INTER_LINEAR)
    out = native.resize_bilinear(img, 32, 48)
    diff = np.abs(out.astype(int) - ref.astype(int))
    # cv2 uses fixed-point arithmetic; allow off-by-one rounding
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.97


def test_read_image_native_path(tmp_path):
    from adamvs_tpu.io.images import read_image

    img = np.random.RandomState(0).randint(0, 256, (32, 32, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(read_image(p), img)
