"""Batch-shape discipline for compile-once execution.

Every jitted program retraces per input shape; on the remote-compile relay a
stray shape (e.g. the ragged final batch of an eval split) costs minutes.
These helpers pad a ragged batch up to a power-of-two bucket — padded rows
are edge-replicated so they stay numerically well-conditioned (no 0/0 in
per-row normalizations) — and the caller slices the output back. Row
independence is guaranteed by the vmapped program structure, so results for
the real rows are bit-identical to the unpadded call.

Replaces the reference's batch-1 Python loops (``bert_pipeline.py:457-585``)
with bounded-compile batched execution.
"""

from __future__ import annotations

import jax.numpy as jnp


def bucket_size(n: int) -> int:
    """Smallest power of two >= n (>= 1): at most log2(B_max)+1 distinct
    compiled batch shapes per program."""
    return max(1, 1 << (max(1, n) - 1).bit_length())


def pad_axis0(arr, target: int):
    """Edge-replicate rows of ``arr`` along axis 0 up to ``target``."""
    arr = jnp.asarray(arr)
    n = arr.shape[0]
    if n == target:
        return arr
    if n > target:
        raise ValueError(f"batch {n} exceeds target {target}")
    reps = jnp.repeat(arr[-1:], target - n, axis=0)
    return jnp.concatenate([arr, reps], axis=0)
