"""The profiler hazard guard: jax.profiler.trace on the axon relay backend
took the relay down for every client (multi-hour outage — CLAUDE.md,
commit 2a9740d), so profiling.trace must REFUSE on axon unless explicitly
overridden with TE_TPU_ALLOW_TRACE=1."""
import jax
import pytest

from transformer_explainability_tpu.utils import profiling


def test_trace_refused_on_axon(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    monkeypatch.delenv("TE_TPU_ALLOW_TRACE", raising=False)
    with pytest.raises(profiling.TraceRefusedError):
        with profiling.trace("/tmp/should-never-exist"):
            pass


def test_trace_override_env(monkeypatch, tmp_path):
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    monkeypatch.setenv("TE_TPU_ALLOW_TRACE", "1")
    # With the override the guard steps aside and the real profiler runs
    # (we're actually on CPU here, so this is safe).
    with profiling.trace(str(tmp_path / "trace")):
        pass


def test_trace_allowed_on_cpu(tmp_path):
    assert jax.default_backend() == "cpu"
    with profiling.trace(str(tmp_path / "trace")) as logdir:
        assert logdir
