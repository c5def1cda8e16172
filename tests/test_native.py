"""Native host-preprocessing library: build + parity vs numpy fallback."""

import numpy as np
import pytest

from transformer_explainability_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("g++ unavailable")
    return lib


def test_normalize_parity(lib):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (4, 17, 23, 3), np.uint8)
    mean, std = [0.5, 0.4, 0.3], [0.2, 0.25, 0.3]
    got = native.normalize_chw(imgs, mean, std, native=True)
    want = native.normalize_chw(imgs, mean, std, native=False)
    assert got.shape == (4, 3, 17, 23)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resize_parity(lib):
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 14, 14).astype(np.float32)
    got = native.resize_bilinear_chw(x, 224, 224, native=True)
    want = native.resize_bilinear_chw(x, 224, 224, native=False)
    assert got.shape == (2, 3, 224, 224)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)



def test_threads_consistency(lib):
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (9, 8, 8, 3), np.uint8)
    a = native.normalize_chw(imgs, [0.5] * 3, [0.5] * 3, threads=1)
    b = native.normalize_chw(imgs, [0.5] * 3, [0.5] * 3, threads=8)
    np.testing.assert_array_equal(a, b)
