"""Native image-ops library tests (build + parity with PIL/cv2)."""

import numpy as np
import pytest

from mgnet_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native lib unavailable"
)

RNG = np.random.RandomState(0)


def test_png_roundtrip(tmp_path):
    from PIL import Image

    img = RNG.randint(0, 255, (37, 53, 3), np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    out = native.decode_image(p)
    np.testing.assert_array_equal(out, img)


def test_jpeg_decode(tmp_path):
    from PIL import Image

    img = np.full((32, 32, 3), 128, np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(img).save(p, quality=95)
    out = native.decode_image(p)
    assert out.shape == (32, 32, 3)
    assert np.abs(out.astype(int) - 128).max() <= 3


def test_png16_gray_roundtrip(tmp_path):
    """16-bit depth/disparity PNGs must decode via the fallback path at
    least (decode_image converts to RGB; raw 16-bit read uses PIL)."""
    from PIL import Image

    img = RNG.randint(0, 65535, (16, 16)).astype(np.uint16)
    p = str(tmp_path / "d.png")
    Image.fromarray(img).save(p)
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, img)


def test_resize_bilinear_matches_cv2():
    import cv2

    img = RNG.randint(0, 255, (40, 60, 3), np.uint8)
    ours = native.resize_bilinear(img, 23, 31)
    ref = cv2.resize(img, (31, 23), interpolation=cv2.INTER_LINEAR)
    # rounding differences of at most 1 LSB
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_resize_nearest_matches_torch_semantics():
    import torch
    import torch.nn.functional as F

    img = RNG.randint(0, 255, (13, 17, 3), np.uint8)
    ours = native.resize_nearest(img, 29, 9)
    ref = F.interpolate(
        torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None],
        size=(29, 9), mode="nearest",
    )[0].permute(1, 2, 0).numpy().astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


def test_normalize():
    img = RNG.randint(0, 255, (8, 8, 3), np.uint8)
    mean = np.array([0.45, 0.45, 0.45], np.float32)
    std = np.array([0.22, 0.23, 0.24], np.float32)
    ours = native.normalize(img, mean, std)
    ref = (img.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(ours, ref, atol=1e-5)
