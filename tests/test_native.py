"""Native fastloader tests: C++ vs numpy reference implementations."""

import os
import subprocess

import numpy as np
import pytest

from pyramid_flow_tpu.data import native


@pytest.fixture(scope="module", autouse=True)
def ensure_built():
    if not native.available():
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run([os.path.join(root, "native", "build.sh")], check=True)
        import importlib
        importlib.reload(native)
    assert native.available(), "native library should build in this image"


def test_resize_matches_reference():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (37, 53, 3), np.uint8)
    out = native.resize_bilinear_u8(img, 24, 40)
    assert out.shape == (24, 40, 3)

    # reference via PIL-independent numpy path
    lib = native._lib
    native._lib = None
    try:
        ref = native.resize_bilinear_u8(img, 24, 40)
    finally:
        native._lib = lib
    # allow 1-unit rounding differences
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_normalize():
    img = np.asarray([0, 127, 255], np.uint8).reshape(1, 1, 3)
    out = native.u8_to_f32_norm(img)
    np.testing.assert_allclose(out.ravel(), [-1.0, -0.00392157, 1.0], atol=1e-5)


def test_crop_resize_norm():
    rng = np.random.default_rng(1)
    # 48x64 -> cover-resize to 32x43 -> crop 32x32 at left=3
    img = rng.integers(0, 255, (48, 64, 3), np.uint8)
    out = native.crop_resize_norm(img, 32, 32, top=0, left=3)
    assert out.shape == (32, 32, 3)
    assert -1.0 <= out.min() and out.max() <= 1.0


def test_batch_load_npy(tmp_path):
    rng = np.random.default_rng(2)
    shape = (3, 4, 4, 2)
    paths = []
    want = []
    for i in range(5):
        arr = rng.standard_normal(shape).astype(np.float32 if i % 2 else np.float16)
        p = str(tmp_path / f"a{i}.npy")
        np.save(p, arr)
        paths.append(p)
        want.append(arr.astype(np.float32))
    out = native.batch_load_npy(paths, shape, num_threads=4)
    np.testing.assert_allclose(out, np.stack(want), atol=1e-6)


def test_batch_load_npy_fallback(tmp_path):
    arr = np.arange(8, dtype=np.float32).reshape(2, 4)
    p = str(tmp_path / "x.npy")
    np.save(p, arr)
    lib = native._lib
    native._lib = None
    try:
        out = native.batch_load_npy([p], (2, 4))
    finally:
        native._lib = lib
    np.testing.assert_array_equal(out[0], arr)
