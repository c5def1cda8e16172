"""Profiling / timing helpers (SURVEY §5.1: the reference has none; the TPU
build standardizes on ``jax.profiler`` traces + transfer-synced wall timing).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Optional

import jax
import numpy as np


class TraceRefusedError(RuntimeError):
    """Raised when ``trace`` is invoked on a relay (axon) backend without
    the explicit ``TE_TPU_ALLOW_TRACE=1`` override."""


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """TensorBoard-viewable device trace around a block::

        with profiling.trace("/tmp/trace"):
            fn(args)

    HAZARD GUARD: on the axon relay backend ``jax.profiler.trace`` has
    taken the relay down for every client — a round-4 attempt (production
    program, B=104, 4 reps) hung before writing any trace file and left
    ``jax.devices()`` hanging in every new process for hours (commit
    2a9740d; CLAUDE.md "relay-profiler hazard"). Tracing on axon is
    therefore REFUSED unless ``TE_TPU_ALLOW_TRACE=1`` is set; if you must
    trace, use small batches, one rep, background the run with a timeout,
    and expect to lose the relay.
    """
    if (jax.default_backend() == "axon"
            and os.environ.get("TE_TPU_ALLOW_TRACE", "") != "1"):
        raise TraceRefusedError(
            "jax.profiler.trace on the axon relay backend is disabled: a "
            "previous trace hung the relay for all clients (multi-hour "
            "outage; see CLAUDE.md). Set TE_TPU_ALLOW_TRACE=1 to override "
            "at your own risk (small batches, one rep, timeout).")
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Block until ready AND force a host transfer of one leaf — on relay
    backends (axon) ``block_until_ready`` alone does not sync."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        jax.block_until_ready(leaves)
        np.asarray(leaves[0])


def timeit(fn: Callable, *args, iters: int = 8, warmup: int = 1,
           name: Optional[str] = None, quiet: bool = False) -> float:
    """Mean seconds per call, compile excluded (transfer-synced)."""
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    if not quiet:
        print(f"{name or getattr(fn, '__name__', 'fn')}: {dt * 1e3:.2f} ms")
    return dt
