"""Pallas fused rollout kernel: parity vs the jnp reference path
(interpret mode on CPU; the real TPU path is exercised by bench/verify)."""

import numpy as np
import jax.numpy as jnp
import pytest

from transformer_explainability_tpu.ops import relprop as rp
from transformer_explainability_tpu.ops.pallas_kernels import (
    rollout_from_grad_cam)


def _ref(cams, grads, start_layer, row_normalize):
    m = cams if grads is None else grads * cams
    m = jnp.clip(m, min=0).mean(axis=1)
    return rp.compute_rollout(m, start_layer, row_normalize=row_normalize)


@pytest.mark.parametrize("start_layer", [0, 1])
@pytest.mark.parametrize("row_normalize", [False, True])
@pytest.mark.parametrize("with_grads", [True, False])
def test_rollout_kernel_parity(start_layer, row_normalize, with_grads):
    rng = np.random.RandomState(0)
    L, h, n = 4, 3, 37          # n deliberately lane-unaligned
    cams = jnp.asarray(rng.randn(L, h, n, n).astype(np.float32))
    grads = (jnp.asarray(rng.randn(L, h, n, n).astype(np.float32))
             if with_grads else None)
    want = np.asarray(_ref(cams, grads, start_layer, row_normalize))
    got = np.asarray(rollout_from_grad_cam(
        cams, grads, start_layer, row_normalize,
        use_pallas=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rollout_kernel_fallback_matches():
    rng = np.random.RandomState(1)
    cams = jnp.asarray(rng.randn(3, 2, 17, 17).astype(np.float32))
    grads = jnp.asarray(rng.randn(3, 2, 17, 17).astype(np.float32))
    a = np.asarray(rollout_from_grad_cam(cams, grads, use_pallas=False))
    b = np.asarray(rollout_from_grad_cam(cams, grads, use_pallas=True,
                                         interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
