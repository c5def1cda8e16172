"""Async-verification serving for the guarded production mode.

The envelope guard's ~1% benign false-positive rate is structural (the
benign and stress statistic distributions nearly touch — PERF.md round 4d),
and a sync CPU fallback costs ~2.1 s per flagged sample. The serving policy
that keeps envelope mode at its ~10% pipelined diagnostics cost is
``fallback="defer"``: return the fast heatmaps immediately and drain
flagged samples through an asynchronous verification queue. This module is
that queue, made concrete and measurable:

  * :class:`GuardedServer` — wraps
    :func:`~transformer_explainability_tpu.explain.generator.make_guarded_explain_fn`
    (``fallback="defer"``) with a background verifier thread running the
    exact-CPU program
    (:func:`~...explain.generator.make_cpu_exact_fn`). ``submit()`` returns
    a :class:`BatchTicket` whose ``heatmaps`` are the fast results;
    corrections are spliced in place as the verifier drains, and
    ``ticket.wait()`` blocks until every flagged sample of that batch is
    verified.
  * Instrumentation: per-sample queue wait, verification service time,
    queue depth at enqueue, verifier busy fraction — :meth:`GuardedServer
    .stats` summarizes the sustained-load behaviour the serving claim
    rests on (measured end-to-end by ``experiments/guarded_defer_load.py``;
    numbers in PERF.md round 5).

The TPU fast path and the CPU verifier overlap: JAX dispatch is
thread-safe, and the verifier's program is committed to the host CPU
device, so verification steals no TPU time (the "verifier throughput
share" statistic quantifies how busy the host core is).

Reference surface: this subsystem has no counterpart in
hila-chefer/Transformer-Explainability — it is the TPU build's
failure-detection/serving layer (SURVEY.md §5.3).
"""
from __future__ import annotations

import queue
import threading
import time
from collections import deque
from typing import Optional

import numpy as np

from transformer_explainability_tpu.explain.generator import (
    ENVELOPE_BOUNDS, PRECISION_PRESETS, STRICT_AGREEMENT, _batch_corr,
    _envelope_flags, make_cpu_exact_fn, make_explain_fn)
from transformer_explainability_tpu.models.vit import (VIT_BASE_16_224,
                                                       ViTConfig)


class BatchTicket:
    """Result handle for one submitted batch.

    ``heatmaps`` holds the fast-path results immediately; rows flagged by
    the guard (``flagged``) are overwritten with the exact-CPU heatmap as
    the verifier drains. ``corrections`` maps row index -> the exact
    heatmap (also spliced into ``heatmaps``). ``wait()`` blocks until all
    of this batch's flagged rows are verified."""

    def __init__(self, heatmaps: np.ndarray, flagged: np.ndarray,
                 score: np.ndarray):
        self.heatmaps = heatmaps
        self.flagged = flagged
        self.score = score
        self.corrections: dict = {}
        self.errors: dict = {}         # row -> repr(exception)
        self._pending = int(flagged.sum())
        self._done = threading.Event()
        if self._pending == 0:
            self._done.set()

    def _deliver(self, row: int, heat: np.ndarray) -> None:
        self.heatmaps[row] = heat
        self.corrections[row] = heat
        self._finish_one()

    def _fail(self, row: int, err: BaseException) -> None:
        # verification failed: the fast heatmap stays in place, the row
        # stays marked flagged, and the error is recorded — a dead verifier
        # must never hang wait()/drain() (the queue is the serving path)
        self.errors[row] = repr(err)
        self._finish_one()

    def _finish_one(self) -> None:
        self._pending -= 1
        if self._pending <= 0:
            self._done.set()

    def wait(self, timeout: Optional[float] = None) -> bool:
        return self._done.wait(timeout)

    @property
    def done(self) -> bool:
        return self._done.is_set()


class GuardedServer:
    """Envelope-guarded serving with an async exact-CPU verification queue.

    Parameters mirror :func:`make_guarded_explain_fn` (defer semantics —
    flagged rows never block a batch); ``mode`` may be ``"envelope"``
    (production) or ``"strict"`` (useful on CPU tests where the agreement
    threshold is controllable). ``max_queue`` bounds the verification
    backlog — when full, enqueueing blocks (back-pressure) rather than
    growing without bound.

    Two submission paths:

      * :meth:`submit` — synchronous: one batch in, finalized ticket out.
        Pays the full device round-trip per batch; on the relay backend
        that latency (~1.5-2.5 s) dwarfs the ~0.2 s compute, capping a
        submit loop at ~35 expl/s (measured, guarded_defer_load round 5).
      * :meth:`serve_stream` — pipelined: dispatches up to ``depth``
        batches ahead before forcing the oldest to the host, overlapping
        device compute + transfer of batch *i+k* with host-side flag
        processing of batch *i*. This is the sustained-serving path.

    Use as a context manager or call :meth:`close`.
    """

    def __init__(self, cfg: ViTConfig = VIT_BASE_16_224,
                 start_layer: int = 0, mode: str = "envelope",
                 envelope_bounds: Optional[dict] = None,
                 agreement: Optional[float] = None,
                 fallback_precision: str = "float32",
                 max_queue: int = 256, **precision_overrides):
        if mode not in ("strict", "envelope"):
            raise ValueError(f"unknown guarded mode {mode!r}")
        kwargs = dict(PRECISION_PRESETS["production"])
        kwargs.update(precision_overrides)
        self._mode = mode
        # the server owns the fast program(s) directly (rather than
        # wrapping make_guarded_explain_fn) so dispatch and host-sync can
        # be split for pipelined submission
        if mode == "strict":
            self._fast = make_explain_fn(cfg, "transformer_attribution",
                                         start_layer=start_layer, **kwargs)
            self._check = make_explain_fn(cfg, "transformer_attribution",
                                          start_layer=start_layer,
                                          matmul_precision="float32")
            self._agreement = (STRICT_AGREEMENT if agreement is None
                               else agreement)
        else:
            self._fast = make_explain_fn(cfg, "transformer_attribution",
                                         start_layer=start_layer,
                                         with_diagnostics=True, **kwargs)
            self._bounds = dict(envelope_bounds or ENVELOPE_BOUNDS)
        self._verify = make_cpu_exact_fn(cfg, start_layer=start_layer,
                                         matmul_precision=fallback_precision)
        self._q: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._lock = threading.Lock()          # protects the stats lists
        self._busy_s = 0.0
        self._t_open = time.monotonic()
        self._waits: list = []                 # enqueue -> verify start
        self._services: list = []              # verify start -> done
        self._depths: list = []                # queue depth at enqueue
        self._n_samples = 0
        self._n_flagged = 0
        self._n_batches = 0
        self._n_errors = 0
        self._closed = False
        self._worker = threading.Thread(target=self._drain_loop,
                                        name="guarded-verifier", daemon=True)
        self._worker.start()

    # ------------------------------------------------------------ worker

    def _drain_loop(self) -> None:
        while True:
            item = self._q.get()
            if item is None:                   # close sentinel
                self._q.task_done()
                return
            ticket, params, img, index, row, t_enq = item
            t0 = time.monotonic()
            try:
                heat = self._verify(params, img, index)
            except BaseException as e:           # noqa: BLE001
                ticket._fail(row, e)
                with self._lock:
                    self._n_errors += 1
                self._q.task_done()
                continue
            t1 = time.monotonic()
            ticket._deliver(row, heat)
            with self._lock:
                self._waits.append(t0 - t_enq)
                self._services.append(t1 - t0)
                self._busy_s += t1 - t0
            self._q.task_done()

    # ------------------------------------------------------------ public

    def _dispatch(self, params, images, indices):
        """Launch the fast program(s) on-device WITHOUT host sync — JAX
        async dispatch returns device futures immediately."""
        if self._mode == "strict":
            return (self._fast(params, images, indices),
                    self._check(params, images, indices))
        return self._fast(params, images, indices)

    def _finalize(self, dev, params, imgs_np, idx_np,
                  n_valid: Optional[int]) -> BatchTicket:
        """Host-sync one dispatched batch, compute flags, build its ticket,
        and enqueue flagged rows for async verification."""
        if self._mode == "strict":
            heat = np.array(dev[0])
            score = _batch_corr(heat, np.asarray(dev[1]))
            flagged = score < self._agreement
        else:
            heat_d, diag_d = dev
            heat = np.array(heat_d)
            score = np.asarray(diag_d, np.float64)
            flagged = _envelope_flags(score, self._bounds)
            score = score[:, 6]          # g_growth, for info readability
        if n_valid is not None:
            flagged = flagged & (np.arange(len(flagged)) < n_valid)
        ticket = BatchTicket(heat, flagged, score)
        rows = np.nonzero(flagged)[0]
        with self._lock:
            self._n_batches += 1
            self._n_samples += (len(flagged) if n_valid is None
                                else int(n_valid))
            self._n_flagged += len(rows)
            self._depths.append(self._q.qsize())
        for r in rows:
            self._q.put((ticket, params, imgs_np[r], idx_np[r], int(r),
                         time.monotonic()))
        return ticket

    def submit(self, params, images, indices,
               n_valid: Optional[int] = None) -> BatchTicket:
        """Run the guarded fast path on one batch; enqueue flagged samples
        for async exact verification. Returns immediately with the fast
        heatmaps (corrections land in place; ``ticket.wait()`` to block).

        Synchronous — pays the device round-trip per batch; use
        :meth:`serve_stream` for sustained load."""
        if self._closed:
            raise RuntimeError("GuardedServer is closed")
        dev = self._dispatch(params, images, indices)
        return self._finalize(dev, params, np.asarray(images),
                              np.asarray(indices), n_valid)

    def serve_stream(self, params, batch_iter, depth: int = 4):
        """Pipelined serving: yields one finalized :class:`BatchTicket` per
        input batch, in order, keeping up to ``depth`` batches dispatched
        ahead of the host-sync point — device compute/transfer of batch
        i+k overlaps flag processing of batch i, amortizing the per-call
        round-trip that caps a synchronous :meth:`submit` loop.

        ``batch_iter`` yields ``(images, indices)`` or
        ``(images, indices, n_valid)`` tuples."""
        if self._closed:
            raise RuntimeError("GuardedServer is closed")
        pending: deque = deque()
        for item in batch_iter:
            images, indices = item[0], item[1]
            n_valid = item[2] if len(item) > 2 else None
            dev = self._dispatch(params, images, indices)
            pending.append((dev, np.asarray(images), np.asarray(indices),
                            n_valid))
            if len(pending) > depth:
                d, im, ix, nv = pending.popleft()
                yield self._finalize(d, params, im, ix, nv)
        while pending:
            d, im, ix, nv = pending.popleft()
            yield self._finalize(d, params, im, ix, nv)

    def drain(self, timeout: Optional[float] = None) -> None:
        """Block until the verification queue is empty (all submitted
        batches' flagged samples verified)."""
        if timeout is None:
            self._q.join()
            return
        deadline = time.monotonic() + timeout
        while self._q.unfinished_tasks and time.monotonic() < deadline:
            time.sleep(0.01)
        if self._q.unfinished_tasks:
            raise TimeoutError("verification queue did not drain in time")

    def reset_stats(self) -> None:
        """Zero the counters/latency samples (call after a warmup submit so
        compile-time service samples don't pollute the load measurement)."""
        with self._lock:
            self._waits.clear()
            self._services.clear()
            self._depths.clear()
            self._busy_s = 0.0
            self._n_samples = self._n_flagged = self._n_batches = 0
            self._n_errors = 0
            self._t_open = time.monotonic()

    def stats(self) -> dict:
        """Sustained-load queue statistics (seconds)."""
        with self._lock:
            waits = np.asarray(self._waits, np.float64)
            services = np.asarray(self._services, np.float64)
            depths = np.asarray(self._depths, np.float64)
            wall = time.monotonic() - self._t_open
            out = {
                "n_batches": self._n_batches,
                "n_samples": self._n_samples,
                "n_flagged": self._n_flagged,
                "n_errors": self._n_errors,
                "flag_rate": (self._n_flagged / self._n_samples
                              if self._n_samples else 0.0),
                "verifier_busy_s": self._busy_s,
                "wall_s": wall,
                "verifier_busy_frac": self._busy_s / wall if wall else 0.0,
                "queue_depth_max": float(depths.max()) if depths.size else 0.0,
                "queue_depth_mean": (float(depths.mean())
                                     if depths.size else 0.0),
            }
        for name, arr in (("queue_wait", waits), ("service", services)):
            if arr.size:
                out[f"{name}_mean_s"] = float(arr.mean())
                out[f"{name}_p50_s"] = float(np.percentile(arr, 50))
                out[f"{name}_p95_s"] = float(np.percentile(arr, 95))
                out[f"{name}_max_s"] = float(arr.max())
        return out

    def close(self) -> None:
        """Drain outstanding work and stop the verifier thread."""
        if self._closed:
            return
        self._closed = True
        self._q.join()
        self._q.put(None)
        self._worker.join()

    def __enter__(self) -> "GuardedServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
