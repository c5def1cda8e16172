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


# ---------------------------------------------------------------- tiers


def test_tier_f32_clears_benign_flags(setup):
    """tier='tpu-f32': flagged rows whose production heatmap agrees with
    the f32 re-check are cleared with the f32 result in one micro-batch —
    no exact-CPU escalation."""
    params, imgs, idx = setup
    f32 = make_explain_fn(CFG, "transformer_attribution",
                          matmul_precision="float32")
    want = np.asarray(f32(params, imgs, idx))
    with GuardedServer(CFG, envelope_bounds=FLAG_ALL, tier="tpu-f32",
                       verify_batch=4) as srv:
        t = srv.submit(params, imgs, idx)
        assert t.flagged.all()
        assert t.wait(timeout=300)
        np.testing.assert_allclose(t.heatmaps, want, rtol=1e-5, atol=1e-7)
        s = srv.stats()
    assert s["n_tier_cleared"] == 4 and s["n_escalated"] == 0


def test_tier_f32_escalates_on_disagreement(setup):
    """An impossible tier agreement forces every flagged row to escalate
    to the exact-CPU program — the strict-mode policy for rows where the
    production and f32 programs disagree."""
    params, imgs, idx = setup
    f32 = make_explain_fn(CFG, "transformer_attribution",
                          matmul_precision="float32")
    want = np.asarray(f32(params, imgs, idx))
    with GuardedServer(CFG, envelope_bounds=FLAG_ALL, tier="tpu-f32",
                       tier_agreement=2.0, verify_batch=3) as srv:
        t = srv.submit(params, imgs, idx)
        assert t.wait(timeout=300)
        np.testing.assert_allclose(t.heatmaps, want, rtol=1e-5, atol=1e-7)
        s = srv.stats()
    assert s["n_escalated"] == 4 and s["n_tier_cleared"] == 0
    assert sorted(t.corrections) == [0, 1, 2, 3]


def test_tier_f32_program_failure_falls_back_to_cpu(setup):
    """A dying tier program (e.g. relay outage) must not lose rows: the
    whole micro-batch falls back to per-row exact CPU."""
    params, imgs, idx = setup
    f32 = make_explain_fn(CFG, "transformer_attribution",
                          matmul_precision="float32")
    want = np.asarray(f32(params, imgs, idx))
    with GuardedServer(CFG, envelope_bounds=FLAG_ALL, tier="tpu-f32") as srv:
        def dead(*a):
            raise RuntimeError("relay outage")
        srv._tier_fn = dead
        t = srv.submit(params, imgs, idx)
        assert t.wait(timeout=300)
        np.testing.assert_allclose(t.heatmaps, want, rtol=1e-5, atol=1e-7)
        s = srv.stats()
    assert s["n_errors"] == 0 and s["n_tier_cleared"] == 0
    assert sorted(t.corrections) == [0, 1, 2, 3]


def test_tier_f32_rejected_in_strict_mode():
    with pytest.raises(ValueError):
        GuardedServer(CFG, mode="strict", tier="tpu-f32")
    with pytest.raises(ValueError):
        GuardedServer(CFG, tier="gpu")
    with pytest.raises(ValueError):
        GuardedServer(CFG, input_format="float16")


def test_strict_deliver_f32_policy(setup):
    """strict_policy='deliver-f32': flagged rows are synchronously
    replaced by the f32 co-run result (no queue), only deep-disagreement
    rows escalate to CPU."""
    params, imgs, idx = setup
    f32 = make_explain_fn(CFG, "transformer_attribution",
                          matmul_precision="float32")
    want = np.asarray(f32(params, imgs, idx))
    # agreement=2.0 flags everything; tier_agreement=-2.0 -> nothing deep
    with GuardedServer(CFG, mode="strict", strict_policy="deliver-f32",
                       agreement=2.0, tier_agreement=-2.0) as srv:
        t = srv.submit(params, imgs, idx)
        assert t.done and not t.flagged.any()
        assert t.delivered_f32 is not None and t.delivered_f32.all()
        np.testing.assert_allclose(t.heatmaps, want, rtol=1e-5, atol=1e-7)
        s = srv.stats()
    assert s["n_f32_delivered"] == 4 and s["n_flagged"] == 0


def test_strict_deliver_f32_deep_rows_escalate(setup):
    """tier_agreement=2.0 makes every flagged row 'deep': all go to CPU
    and come back as the exact program's output."""
    params, imgs, idx = setup
    f32 = make_explain_fn(CFG, "transformer_attribution",
                          matmul_precision="float32")
    want = np.asarray(f32(params, imgs, idx))
    with GuardedServer(CFG, mode="strict", strict_policy="deliver-f32",
                       agreement=2.0, tier_agreement=2.0) as srv:
        t = srv.submit(params, imgs, idx)
        assert t.flagged.all()
        assert t.wait(timeout=300)
        np.testing.assert_allclose(t.heatmaps, want, rtol=1e-5, atol=1e-7)
        assert sorted(t.corrections) == [0, 1, 2, 3]
        s = srv.stats()
    assert s["n_f32_delivered"] == 0 and s["n_flagged"] == 4


def test_strict_deliver_f32_requires_strict_mode():
    with pytest.raises(ValueError):
        GuardedServer(CFG, mode="envelope", strict_policy="deliver-f32")
    with pytest.raises(ValueError):
        GuardedServer(CFG, mode="strict", strict_policy="f64")


# ------------------------------------------------------ uint8 wire format


@pytest.fixture(scope="module")
def setup_uint8(setup):
    params, imgs, idx = setup
    rng = np.random.RandomState(7)
    u8 = rng.randint(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    # host-side equivalent of the on-device preprocess, f32 throughout
    host = ((u8.astype(np.float32) / np.float32(255.0)) - np.float32(0.5))
    host = (host / np.float32(0.5)).transpose(0, 3, 1, 2)
    return params, u8, host, idx


def test_preprocess_uint8_matches_host_normalization(setup_uint8):
    """make_explain_fn(preprocess='uint8') on raw HWC frames equals the
    default program on host-normalized CHW floats."""
    params, u8, host, idx = setup_uint8
    fn_u8 = make_explain_fn(CFG, "transformer_attribution",
                            preprocess="uint8")
    fn_f32 = make_explain_fn(CFG, "transformer_attribution")
    a = np.asarray(fn_u8(params, jnp.asarray(u8), idx))
    b = np.asarray(fn_f32(params, jnp.asarray(host), idx))
    # XLA lowers the on-device divides as multiplies — inputs can differ
    # by 1 ulp, which relprop amplifies to ~1e-3 relative; assert
    # near-equality plus per-sample correlation
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-8)
    for i in range(a.shape[0]):
        x = a[i].ravel() - a[i].mean()
        y = b[i].ravel() - b[i].mean()
        corr = x @ y / (np.linalg.norm(x) * np.linalg.norm(y))
        assert corr > 0.999999, (i, corr)


def test_server_uint8_wire_format_end_to_end(setup_uint8):
    """GuardedServer(input_format='uint8'): all three programs (fast, tier,
    exact CPU) consume raw frames; corrected rows match the f32 program on
    the same raw frames."""
    params, u8, host, idx = setup_uint8
    f32_u8 = make_explain_fn(CFG, "transformer_attribution",
                             preprocess="uint8",
                             matmul_precision="float32")
    want = np.asarray(f32_u8(params, jnp.asarray(u8), idx))
    with GuardedServer(CFG, envelope_bounds=FLAG_ALL, tier="tpu-f32",
                       input_format="uint8", verify_batch=4) as srv:
        srv.warmup(params, u8[0], -1)
        t = srv.submit(params, u8, idx)
        assert t.wait(timeout=300)
        np.testing.assert_allclose(t.heatmaps, want, rtol=1e-5, atol=1e-7)
        s = srv.stats()
    assert s["n_tier_cleared"] == 4


# ------------------------------------------- verifier cache thread-safety


def test_cpu_exact_fn_concurrent_first_call(setup, monkeypatch):
    """Regression: make_cpu_exact_fn's cache fill must be atomic.

    GuardedServer calls the same verifier fn from its caller thread
    (warmup) and its drain worker concurrently; before the lock, a reader
    arriving mid-fill saw the key already set but no 'params' entry and
    died with KeyError — observed live the first time a high-flag-rate
    batch was submitted before warmup (round 5e). device_put is delayed
    here to hold the fill window open deterministically."""
    import threading as _th
    import time as _time
    from transformer_explainability_tpu.explain import generator as gen

    params, imgs, idx = setup
    fn = gen.make_cpu_exact_fn(CFG)
    real_put = jax.device_put
    entered = _th.Event()

    def slow_put(x, device=None):
        # first caller parks inside the cache-fill long enough for the
        # second thread to run its whole cache check
        if not entered.is_set():
            entered.set()
            _time.sleep(0.5)
        return real_put(x, device)

    monkeypatch.setattr(gen.jax, "device_put", slow_put)
    img0 = np.asarray(imgs[0])
    errs, outs = [], []

    def call():
        try:
            outs.append(fn(params, img0, 1))
        except Exception as e:          # the pre-fix failure mode
            errs.append(e)

    threads = [_th.Thread(target=call) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errs, errs
    assert len(outs) == 2
    np.testing.assert_array_equal(outs[0], outs[1])


# ------------------------------------------------- escalation load-shedding


def test_escalation_budget_zero_sheds_everything(setup):
    """budget=0: flagged rows are never queued — ticket completes
    immediately, heatmaps stay the delivered (f32) results, all rows
    marked shed."""
    params, imgs, idx = setup
    f32 = make_explain_fn(CFG, "transformer_attribution",
                          matmul_precision="float32")
    want = np.asarray(f32(params, imgs, idx))
    with GuardedServer(CFG, mode="strict", strict_policy="deliver-f32",
                       agreement=2.0, tier_agreement=2.0,
                       escalation_budget=0) as srv:
        t = srv.submit(params, imgs, idx)
        assert t.done and not t.corrections
        assert t.shed is not None and t.shed.all()
        assert t.flagged.all()          # the check verdict is preserved
        np.testing.assert_allclose(t.heatmaps, want, rtol=1e-5, atol=1e-7)
        s = srv.stats()
    assert s["n_shed"] == 4 and s["n_flagged"] == 4


def test_escalation_budget_partial(setup):
    """budget=2 with 4 flagged rows in one batch: exactly 2 are verified
    (exact-CPU corrections land), 2 are shed."""
    params, imgs, idx = setup
    with GuardedServer(CFG, mode="strict", strict_policy="deliver-f32",
                       agreement=2.0, tier_agreement=2.0,
                       escalation_budget=2) as srv:
        t = srv.submit(params, imgs, idx)
        assert t.shed is not None and int(t.shed.sum()) == 2
        assert t.wait(timeout=300)
        assert len(t.corrections) == 2
        assert set(t.corrections) == set(np.nonzero(~t.shed)[0].tolist())
        s = srv.stats()
    assert s["n_shed"] == 2 and s["n_flagged"] == 4


def test_escalation_budget_envelope_mode(setup):
    """Envelope mode budget=0: flag-everything bounds produce a done
    ticket with untouched fast heatmaps and full shed accounting."""
    params, imgs, idx = setup
    fast = make_explain_fn(CFG, "transformer_attribution",
                           with_diagnostics=True)
    want = np.asarray(fast(params, imgs, idx)[0])
    with GuardedServer(CFG, envelope_bounds=FLAG_ALL,
                       escalation_budget=0) as srv:
        t = srv.submit(params, imgs, idx)
        assert t.done and t.shed is not None and t.shed.all()
        np.testing.assert_array_equal(t.heatmaps, want)
        s = srv.stats()
    assert s["n_shed"] == 4


def test_escalation_budget_rejects_negative():
    with pytest.raises(ValueError):
        GuardedServer(CFG, escalation_budget=-1)
