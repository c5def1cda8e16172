"""Pallas TPU kernels for the explanation hot path.

The headline aggregation of ``transformer_attribution`` — per layer
``(grad ⊙ cam)⁺`` head-mean, +I (optionally row-normalized), then the
layer-chain matrix product (reference ``ViT_LRP.py:38-49,357-369``) — is a
chain of L small (n,n) ops; fused here into ONE kernel that keeps the running
``joint`` product resident in VMEM across the whole chain instead of writing
L intermediates to HBM.

The token count is zero-padded to a lane multiple (197 -> 256). Zero padding
is exact for the chain: ``[[M,0],[0,0]] @ [[J,0],[0,0]] = [[MJ,0],[0,0]]``,
so the top-left (n,n) block of the padded product equals the unpadded
product (the +I in the pad region only affects pad rows/cols, which are
sliced away).

``rollout_from_grad_cam`` auto-falls back to the jnp implementation off-TPU
(CPU tests) or when ``use_pallas=False``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from transformer_explainability_tpu.ops import relprop as rp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _chain_kernel(mats_ref, out_ref, *, n_layers: int):
    """Left-multiply chain ``out = mats[L-1] @ ... @ mats[0]`` with the whole
    (L, N, N) stack and the running product VMEM-resident. Single program
    (grid=()), so it stays correct under vmap batching (which prepends a
    batch grid dimension — no ``program_id`` dependence here)."""
    joint = mats_ref[0]
    def body(i, joint):
        # pin the precision: Mosaic rejects the ambient HIGH (tf32) setting,
        # and the chain is a negligible share of total FLOPs anyway
        return jnp.dot(mats_ref[i], joint, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = jax.lax.fori_loop(1, n_layers, body, joint)


def rollout_from_grad_cam(cams: jax.Array, grads: Optional[jax.Array] = None,
                          start_layer: int = 0, row_normalize: bool = False,
                          use_pallas: Optional[bool] = None,
                          interpret: bool = False) -> jax.Array:
    """Fused ``Π_{i=L-1..start} (I + mean_h (grads_i ⊙ cams_i)⁺)`` -> (n, n).

    cams/grads: (L, h, n, n). ``grads=None`` skips the grad weighting (the
    cam-only rollout). Matches
    ``clip(g*c,0).mean(1)`` + :func:`...ops.relprop.compute_rollout` exactly
    (fp32).

    cams may also be pre-reduced (L, n, n) — already ``(grad⊙cam)⁺``
    head-meaned inside the reverse scan (vit.reverse_pass fuse_grad_cam);
    then only the +I chain runs here (grads must be None).
    """
    prereduced = cams.ndim == 3
    if prereduced:
        assert grads is None
        L, n, _ = cams.shape
    else:
        L, h, n, _ = cams.shape
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        if prereduced:
            m = cams
        else:
            m = cams if grads is None else grads * cams
            m = jnp.clip(m, min=0).mean(axis=1)
        return rp.compute_rollout(m, start_layer, row_normalize=row_normalize)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # elementwise prep in XLA (it fuses into the producing ops): weight,
    # relu, head-mean, +I, optional row normalization, zero-pad to lanes
    if prereduced:
        m = cams[start_layer:].astype(jnp.float32)
    else:
        m = cams if grads is None else grads * cams
        m = jnp.clip(m[start_layer:].astype(jnp.float32), min=0).mean(axis=1)
    m = m + jnp.eye(n, dtype=jnp.float32)
    if row_normalize:
        m = m / m.sum(axis=-1, keepdims=True)
    N = _round_up(n, 128)
    mats = jnp.pad(m, ((0, 0), (0, N - n), (0, N - n)))
    n_layers = L - start_layer

    out = pl.pallas_call(
        functools.partial(_chain_kernel, n_layers=n_layers),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        interpret=interpret,
    )(mats)
    return out[:n, :n].astype(cams.dtype)
