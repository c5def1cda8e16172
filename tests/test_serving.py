"""GuardedServer: the async verification queue behind the envelope guard's
defer policy (explain/serving.py). Proven on CPU: flagged rows are
corrected in place with the exact-CPU program while unflagged rows stay
bitwise the fast program's output; the queue drains, back-pressures, and
reports sane statistics."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.models.vit import (
    VIT_BASE_16_224, init_params)
from transformer_explainability_tpu.explain.generator import (
    DIAG_FIELDS, calibrate_envelope, make_explain_fn)
from transformer_explainability_tpu.explain.serving import GuardedServer

CFG = dataclasses.replace(VIT_BASE_16_224, img_size=32, embed_dim=64,
                          depth=3, num_heads=4, num_classes=10)

FLAG_ALL = {f: (np.inf, -np.inf) for f in DIAG_FIELDS}


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(4, 3, 32, 32).astype(np.float32))
    idx = jnp.asarray([1, -1, 3, 0], jnp.int32)
    return params, imgs, idx


def test_server_no_flags_queue_stays_empty(setup):
    """Bounds calibrated on the traffic itself: nothing flagged, ticket is
    done immediately, heatmaps == the fast program bitwise."""
    params, imgs, idx = setup
    diag_fn = make_explain_fn(CFG, "transformer_attribution",
                              with_diagnostics=True)
    heat_fast, diag = diag_fn(params, imgs, idx)
    bounds = calibrate_envelope(np.asarray(diag), margin=1.5)
    with GuardedServer(CFG, envelope_bounds=bounds) as srv:
        t = srv.submit(params, imgs, idx)
        assert t.done and not t.flagged.any() and not t.corrections
        np.testing.assert_array_equal(t.heatmaps, np.asarray(heat_fast))
        s = srv.stats()
    assert s["n_flagged"] == 0 and s["queue_depth_max"] == 0.0


def test_server_corrections_spliced_async(setup):
    """Flag everything: ticket starts not-done, wait() completes, every row
    equals the exact-CPU program, stats count the work."""
    params, imgs, idx = setup
    exact = make_explain_fn(CFG, "transformer_attribution",
                            matmul_precision="float32")
    want = np.asarray(exact(params, imgs, idx))
    with GuardedServer(CFG, envelope_bounds=FLAG_ALL) as srv:
        t = srv.submit(params, imgs, idx)
        assert t.flagged.all()
        assert t.wait(timeout=300), "verification queue never drained"
        np.testing.assert_allclose(t.heatmaps, want, rtol=1e-5, atol=1e-7)
        assert sorted(t.corrections) == [0, 1, 2, 3]
        s = srv.stats()
    assert s["n_flagged"] == 4 and s["n_samples"] == 4
    assert s["flag_rate"] == 1.0
    assert s["service_mean_s"] > 0 and s["verifier_busy_s"] > 0


def test_server_multi_batch_sustained(setup):
    """Several batches in flight: corrections land on the right tickets;
    drain() empties the queue; unflagged rows untouched (n_valid masks the
    pad row)."""
    params, imgs, idx = setup
    fast = make_explain_fn(CFG, "transformer_attribution",
                           with_diagnostics=True)
    heat_fast, _ = fast(params, imgs, idx)
    heat_fast = np.asarray(heat_fast)
    exact = make_explain_fn(CFG, "transformer_attribution",
                            matmul_precision="float32")
    want = np.asarray(exact(params, imgs, idx))
    with GuardedServer(CFG, envelope_bounds=FLAG_ALL) as srv:
        tickets = [srv.submit(params, imgs, idx, n_valid=3)
                   for _ in range(3)]
        srv.drain(timeout=600)
        for t in tickets:
            assert t.done
            # rows 0-2 flagged+corrected; pad row 3 untouched fast output
            assert sorted(t.corrections) == [0, 1, 2]
            np.testing.assert_allclose(t.heatmaps[:3], want[:3],
                                       rtol=1e-5, atol=1e-7)
            np.testing.assert_array_equal(t.heatmaps[3], heat_fast[3])
        s = srv.stats()
    assert s["n_batches"] == 3 and s["n_samples"] == 9
    assert s["n_flagged"] == 9
    assert s["queue_wait_p95_s"] >= s["queue_wait_p50_s"] >= 0


def test_server_strict_mode_cpu_no_flags(setup):
    """Strict mode on CPU: production == exact f32, nothing flagged."""
    params, imgs, idx = setup
    with GuardedServer(CFG, mode="strict") as srv:
        t = srv.submit(params, imgs, idx)
        assert not t.flagged.any() and t.done
    assert srv.stats()["n_flagged"] == 0


def test_serve_stream_matches_submit(setup):
    """Pipelined serving yields the same tickets (order, heatmaps, flags,
    corrections) as a synchronous submit loop, at any depth."""
    params, imgs, idx = setup
    exact = make_explain_fn(CFG, "transformer_attribution",
                            matmul_precision="float32")
    want = np.asarray(exact(params, imgs, idx))
    batches = [(imgs, idx), (imgs[::-1], idx[::-1]), (imgs, idx, 2)]
    for depth in (1, 2, 8):      # deeper than the stream and shallower
        with GuardedServer(CFG, envelope_bounds=FLAG_ALL) as srv:
            tickets = list(srv.serve_stream(params, iter(batches),
                                            depth=depth))
            srv.drain(timeout=600)
        assert len(tickets) == 3
        np.testing.assert_allclose(tickets[0].heatmaps, want,
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(tickets[1].heatmaps, want[::-1],
                                   rtol=1e-5, atol=1e-7)
        # third batch: n_valid=2 masks rows 2-3
        assert sorted(tickets[2].corrections) == [0, 1]
        assert srv.stats()["n_samples"] == 4 + 4 + 2


def test_serve_stream_rejected_after_close(setup):
    params, imgs, idx = setup
    srv = GuardedServer(CFG, mode="strict")
    srv.close()
    with pytest.raises(RuntimeError):
        list(srv.serve_stream(params, [(imgs, idx)]))


def test_server_verifier_failure_never_hangs(setup):
    """A raising verifier must not kill the worker or hang wait()/drain():
    failed rows keep the fast heatmap, record the error, stay flagged."""
    params, imgs, idx = setup
    fast = make_explain_fn(CFG, "transformer_attribution",
                           with_diagnostics=True)
    heat_fast, _ = fast(params, imgs, idx)
    with GuardedServer(CFG, envelope_bounds=FLAG_ALL) as srv:
        calls = {"n": 0}
        real = srv._verify

        def flaky(p, im, ix):
            calls["n"] += 1
            if calls["n"] % 2 == 1:
                raise RuntimeError("verifier crash")
            return real(p, im, ix)

        srv._verify = flaky
        t = srv.submit(params, imgs, idx)
        assert t.wait(timeout=300)
        # odd calls (rows 0, 2) failed; even (1, 3) corrected
        assert sorted(t.errors) == [0, 2]
        assert sorted(t.corrections) == [1, 3]
        np.testing.assert_array_equal(t.heatmaps[0],
                                      np.asarray(heat_fast)[0])
        s = srv.stats()
    assert s["n_errors"] == 2


def test_server_rejects_submit_after_close(setup):
    params, imgs, idx = setup
    srv = GuardedServer(CFG, mode="strict")
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit(params, imgs, idx)
    srv.close()      # idempotent
