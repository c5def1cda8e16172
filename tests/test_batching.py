"""Compile-once batch discipline (VERDICT r1: ragged batches must not
retrace) — bucketing helpers + both Explainer wrappers."""

import numpy as np
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.utils.batching import (
    bucket_size, pad_axis0)


def test_bucket_size():
    assert [bucket_size(n) for n in (1, 2, 3, 4, 5, 8, 9)] == \
        [1, 2, 4, 4, 8, 8, 16]


def test_pad_axis0_edge_replicates():
    a = np.arange(6).reshape(3, 2)
    out = np.asarray(pad_axis0(a, 4))
    np.testing.assert_array_equal(out[:3], a)
    np.testing.assert_array_equal(out[3], a[-1])


def test_vit_explainer_bucketing_compiles_once():
    from transformer_explainability_tpu.models.vit import (
        ViTConfig, init_params)
    from transformer_explainability_tpu.explain.generator import Explainer
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=24, depth=2,
                    num_heads=2, num_classes=7)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ex = Explainer(params, cfg)
    rng = np.random.RandomState(0)
    x4 = rng.randn(4, 3, 32, 32).astype(np.float32)
    out4 = np.asarray(ex.explain(x4, indices=[1, 2, 3, -1]))
    out3 = np.asarray(ex.explain(x4[:3], indices=[1, 2, 3]))
    assert out3.shape[0] == 3
    # padded rows are discarded; real rows bit-identical to the full batch
    np.testing.assert_array_equal(out3, out4[:3])
    # B=3 padded to the B=4 bucket -> ONE compiled specialization
    fn = ex._fns[("transformer_attribution", 0, False, 1.0)]
    assert fn._cache_size() == 1


def test_bert_explainer_bucketing_compiles_once():
    from transformer_explainability_tpu.models import bert as bert_mod
    from transformer_explainability_tpu.models.bert import BertConfig
    from transformer_explainability_tpu.explain.bert_generator import (
        BertExplainer)
    cfg = BertConfig(vocab_size=50, hidden_size=24, num_layers=2,
                     num_heads=2, intermediate_size=48,
                     max_position_embeddings=16, num_labels=3)
    params = bert_mod.init_params(jax.random.PRNGKey(0), cfg)
    ex = BertExplainer(params, cfg)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 50, (4, 12)).astype(np.int32)
    mask = np.ones((4, 12), np.float32)
    mask[2, 9:] = 0
    out4 = np.asarray(ex.explain(ids, mask, indices=[0, 1, 2, -1],
                                 method="transformer_attribution",
                                 start_layer=1))
    out3 = np.asarray(ex.explain(ids[:3], mask[:3], indices=[0, 1, 2],
                                 method="transformer_attribution",
                                 start_layer=1))
    np.testing.assert_array_equal(out3, out4[:3])
    fn = ex._fns[("transformer_attribution", 1, 1.0, 12)]
    assert fn._cache_size() == 1


def test_pipeline_padded_train_step_matches_unpadded():
    """A weight-0 padding row must not change the parameter update."""
    import optax
    from transformer_explainability_tpu.models import bert as bert_mod
    from transformer_explainability_tpu.models.bert import BertConfig
    from transformer_explainability_tpu.rationale import pipeline as pl
    cfg = BertConfig(vocab_size=50, hidden_size=24, num_layers=2,
                     num_heads=2, intermediate_size=48,
                     max_position_embeddings=16, num_labels=2)
    params = bert_mod.init_params(jax.random.PRNGKey(0), cfg)
    tx, step = pl.make_train_step(cfg, optax.adam(1e-3), 1.0, dropout=0.0)
    opt_state = tx.init(params)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 50, (4, 12)), jnp.int32)
    mask = jnp.ones((4, 12), jnp.float32)
    tgt = jnp.asarray([0, 1, 1, 0], jnp.int32)
    key = jax.random.PRNGKey(7)

    w_full = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    p1, _, loss1, correct1 = step(params, opt_state, ids, mask, tgt,
                                  w_full, key)
    # reference: same 3 rows padded by a copy of row 2 with weight 0 — the
    # update must ignore the pad row entirely
    ids_p = ids.at[3].set(ids[2])
    tgt_p = tgt.at[3].set(tgt[2])
    p2, _, loss2, correct2 = step(params, opt_state, ids_p, mask, tgt_p,
                                  w_full, key)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    assert float(correct1) == float(correct2)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
