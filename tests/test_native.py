"""Native image-ops library tests (build + parity with PIL/cv2)."""

import os

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


JAX_CHECKSUM_SCRIPT = r"""
import sys
import numpy as np
from mgnet_tpu.export.aot import load_exported

call = load_exported(sys.argv[1])
h, w = int(sys.argv[2]), int(sys.argv[3])
image = np.full((1, h, w, 3), 0.5, np.float32)
K = np.array([[[2262.52, 0.0, 1096.98],
               [0.0, 2265.30, 513.137],
               [0.0, 0.0, 1.0]]], np.float32)
cam_h = np.array([1.22], np.float32)
out = call(image, K, cam_h)
import jax
leaves = jax.tree_util.tree_leaves(out)
buf = np.asarray(leaves[0]).tobytes()
c = 0
for b in buf:
    c = (c * 1099511628211 + b) & 0xFFFFFFFFFFFFFFFF
print("jax fnv1a=%016x" % c)
"""


@pytest.mark.slow
def test_pjrt_runner_matches_jax(tmp_path):
    """Build the C++ PJRT runner, run the exported tiny fused model
    through the PJRT C API plugin, and compare its output[0] readback
    checksum with the jax execution of the same artifact on the same
    backend (VERDICT r3 #7; reference analog trt_inference/main.cpp:
    207-235). Requires the tunneled TPU (axon plugin) or a local libtpu."""
    import re
    import shutil
    import subprocess
    import sys
    import uuid

    plugin = os.environ.get("MGNET_PJRT_PLUGIN", "/opt/axon/libaxon_pjrt.so")
    if not os.path.exists(plugin):
        pytest.skip(f"no PJRT plugin at {plugin}")
    if shutil.which("cmake") is None:
        pytest.skip("cmake unavailable")
    try:
        import tensorflow as tf  # noqa: F401  (ships the PJRT C headers)
    except ImportError:
        pytest.skip("tensorflow (PJRT C API headers) unavailable")
    inc = os.path.join(os.path.dirname(tf.__file__), "include")
    if not os.path.exists(os.path.join(inc, "xla/pjrt/c/pjrt_c_api.h")):
        pytest.skip("pjrt_c_api.h not found in the tensorflow include dir")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    build = os.path.join(repo, "native", "build")
    subprocess.run(
        ["cmake", "-S", os.path.join(repo, "native"), "-B", build,
         f"-DPJRT_INCLUDE_DIR={inc}"],
        check=True, capture_output=True, text=True)
    subprocess.run(
        ["cmake", "--build", build, "--target", "mgnet_pjrt_runner"],
        check=True, capture_output=True, text=True)
    runner = os.path.join(build, "mgnet_pjrt_runner")
    assert os.path.exists(runner)

    # On-device work below: drop the CPU forcing so export, the jax
    # checksum, and the runner all execute on the same real backend.
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")

    h, w = 128, 256
    exp = str(tmp_path / "model.jaxir")
    r = subprocess.run(
        [sys.executable, "tools/export_inference.py",
         "--config-file", "configs/MGNet-Cityscapes-Fine.yaml",
         "--output", exp, "--height", str(h), "--width", str(w),
         "MODEL.COMPUTE_DTYPE", "float32"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    cmd = [runner, plugin, exp + ".stablehlo", exp + ".compile_options.pb",
           "-", "3", str(h), str(w)]
    if "axon" in os.path.basename(plugin):
        cmd += ["topology=v5e:1x1x1", "n_slices=#1", "rank=#4294967295",
                "remote_compile=#1", f"session_id={uuid.uuid4()}"]
    r = subprocess.run(cmd, cwd=repo, env=env, capture_output=True,
                       text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    m = re.search(r"fnv1a=([0-9a-f]{16})", r.stdout)
    assert m, f"runner printed no checksum:\n{r.stdout[-2000:]}"
    runner_sum = m.group(1)

    r = subprocess.run(
        [sys.executable, "-c", JAX_CHECKSUM_SCRIPT, exp, str(h), str(w)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    m = re.search(r"jax fnv1a=([0-9a-f]{16})", r.stdout)
    assert m, f"jax side printed no checksum:\n{r.stdout[-2000:]}"
    assert m.group(1) == runner_sum, (
        f"runner output[0] checksum {runner_sum} != jax {m.group(1)}")
