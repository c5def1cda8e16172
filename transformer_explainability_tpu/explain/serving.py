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
from typing import Optional

import numpy as np

from transformer_explainability_tpu.explain.generator import (
    make_cpu_exact_fn, make_guarded_explain_fn)
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

    Parameters mirror :func:`make_guarded_explain_fn` (the guard always
    runs with ``fallback="defer"`` + ``return_info=True``); ``mode`` may be
    ``"envelope"`` (production) or ``"strict"`` (useful on CPU tests where
    the agreement threshold is controllable). ``max_queue`` bounds the
    verification backlog — when full, ``submit`` blocks (back-pressure)
    rather than growing without bound.

    Use as a context manager or call :meth:`close`.
    """

    def __init__(self, cfg: ViTConfig = VIT_BASE_16_224,
                 start_layer: int = 0, mode: str = "envelope",
                 envelope_bounds: Optional[dict] = None,
                 agreement: Optional[float] = None,
                 fallback_precision: str = "float32",
                 max_queue: int = 256, **precision_overrides):
        self._guard = make_guarded_explain_fn(
            cfg, start_layer=start_layer, mode=mode,
            agreement=agreement, envelope_bounds=envelope_bounds,
            fallback="defer", return_info=True,
            fallback_precision=fallback_precision, **precision_overrides)
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

    def submit(self, params, images, indices,
               n_valid: Optional[int] = None) -> BatchTicket:
        """Run the guarded fast path on one batch; enqueue flagged samples
        for async exact verification. Returns immediately with the fast
        heatmaps (corrections land in place; ``ticket.wait()`` to block)."""
        if self._closed:
            raise RuntimeError("GuardedServer is closed")
        heat, info = self._guard(params, images, indices, n_valid=n_valid)
        ticket = BatchTicket(np.asarray(heat), np.asarray(info["flagged"]),
                             np.asarray(info["score"]))
        rows = np.nonzero(ticket.flagged)[0]
        with self._lock:
            self._n_batches += 1
            self._n_samples += (len(ticket.flagged) if n_valid is None
                                else int(n_valid))
            self._n_flagged += len(rows)
            self._depths.append(self._q.qsize())
        imgs_np = np.asarray(images)
        idx_np = np.asarray(indices)
        for r in rows:
            self._q.put((ticket, params, imgs_np[r], idx_np[r], int(r),
                         time.monotonic()))
        return ticket

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
