"""Guarded BERT explanations (make_guarded_bert_explain_fn): strict
cross-check + exact-CPU fallback splicing, proven on CPU where the
production preset and the f32 verifier agree (so flags are forced via
the agreement threshold) — the BERT twin of tests/test_guarded.py."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.models.bert import (BertConfig,
                                                        init_params)
from transformer_explainability_tpu.explain.bert_generator import (
    make_cpu_exact_bert_fn, make_explain_fn, make_guarded_bert_explain_fn)

CFG = BertConfig(vocab_size=100, hidden_size=32, num_layers=3,
                 num_heads=4, intermediate_size=64,
                 max_position_embeddings=40, num_labels=2)
S = 12
START = CFG.num_layers - 1        # reference default: last layer


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, CFG.vocab_size, (4, S)), jnp.int32)
    mask = np.ones((4, S), np.float32)
    mask[1, S // 2:] = 0.0        # one padded row
    mask = jnp.asarray(mask)
    idx = jnp.asarray([1, -1, 0, 1], jnp.int32)
    return params, ids, mask, idx


def test_no_flags_heat_matches_fast(setup):
    """agreement=-2: nothing flags; output is the production program's."""
    params, ids, mask, idx = setup
    fast = make_explain_fn(CFG, "transformer_attribution",
                           start_layer=START)
    want = np.asarray(fast(params, ids, mask, idx))
    fn = make_guarded_bert_explain_fn(CFG, start_layer=START,
                                      agreement=-2.0, return_info=True)
    heat, info = fn(params, ids, mask, idx)
    assert not info["flagged"].any()
    assert info["score"].shape == (4,)
    np.testing.assert_array_equal(heat, want)


def test_flag_all_sync_fallback_splices_exact_cpu(setup):
    """agreement=2: every row re-runs on the exact-CPU program and the
    spliced rows match it."""
    params, ids, mask, idx = setup
    exact = make_cpu_exact_bert_fn(CFG, start_layer=START)
    want = np.stack([exact(params, np.asarray(ids[i]),
                           np.asarray(mask[i]), int(idx[i]))
                     for i in range(4)])
    fn = make_guarded_bert_explain_fn(CFG, start_layer=START,
                                      agreement=2.0, return_info=True)
    heat, info = fn(params, ids, mask, idx)
    assert info["flagged"].all()
    np.testing.assert_allclose(heat, want, rtol=1e-5, atol=1e-7)


def test_defer_leaves_heat_untouched(setup):
    """fallback='defer': flags are reported but the fast heatmaps are
    returned unmodified (the async-queue serving policy)."""
    params, ids, mask, idx = setup
    fast = make_explain_fn(CFG, "transformer_attribution",
                           start_layer=START)
    want = np.asarray(fast(params, ids, mask, idx))
    fn = make_guarded_bert_explain_fn(CFG, start_layer=START,
                                      agreement=2.0, fallback="defer",
                                      return_info=True)
    heat, info = fn(params, ids, mask, idx)
    assert info["flagged"].all()
    np.testing.assert_array_equal(heat, want)


def test_n_valid_skips_pad_rows(setup):
    """n_valid=2: only the first two rows may flag (and fall back)."""
    params, ids, mask, idx = setup
    fn = make_guarded_bert_explain_fn(CFG, start_layer=START,
                                      agreement=2.0, fallback="defer",
                                      return_info=True)
    _, info = fn(params, ids, mask, idx, n_valid=2)
    assert info["flagged"][:2].all() and not info["flagged"][2:].any()


def test_rejects_unknown_fallback():
    with pytest.raises(ValueError):
        make_guarded_bert_explain_fn(CFG, fallback="async")


def test_cpu_exact_fn_thread_safe_first_call(setup, monkeypatch):
    """Concurrent first calls must not race the cache fill (the ViT
    round-5e failure mode; the BERT fn shares the locked design)."""
    import threading
    import time
    from transformer_explainability_tpu.explain import bert_generator as bg

    params, ids, mask, idx = setup
    fn = make_cpu_exact_bert_fn(CFG, start_layer=START)
    real_put = jax.device_put
    entered = threading.Event()

    def slow_put(x, device=None):
        if not entered.is_set():
            entered.set()
            time.sleep(0.5)
        return real_put(x, device)

    monkeypatch.setattr(bg.jax, "device_put", slow_put)
    errs, outs = [], []

    def call():
        try:
            outs.append(fn(params, np.asarray(ids[0]),
                           np.asarray(mask[0]), 1))
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=call) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errs, errs
    assert len(outs) == 2
    np.testing.assert_array_equal(outs[0], outs[1])
