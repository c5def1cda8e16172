"""Sequence-parallel BERT forward: parity vs the single-shard forward on the
virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_explainability_tpu.models import bert as bert_mod
from transformer_explainability_tpu.models.bert import BertConfig
from transformer_explainability_tpu.parallel.mesh import make_mesh
from transformer_explainability_tpu.parallel.sequence import (
    make_seq_sharded_bert_forward)

CFG = BertConfig(vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
                 intermediate_size=64, max_position_embeddings=64,
                 num_labels=3)


@pytest.mark.parametrize("n_data,n_seq", [(2, 4), (1, 8), (4, 2)])
def test_seq_sharded_forward_parity(n_data, n_seq):
    params = bert_mod.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    B, S = max(2, n_data), 32
    ids = rng.randint(0, 100, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.float32)
    mask[0, -5:] = 0.0                      # padding crosses shard boundaries

    want = np.asarray(jax.vmap(
        lambda i, m: bert_mod.forward(params, i, m, CFG))(
            jnp.asarray(ids), jnp.asarray(mask)))

    mesh = make_mesh(n_data=n_data, n_model=n_seq)
    fn = make_seq_sharded_bert_forward(CFG, mesh,
                                       matmul_precision="float32")
    got = np.asarray(fn(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_seq_sharded_long_context():
    """SP extends context: S=64 over 8 shards runs and stays finite."""
    params = bert_mod.init_params(jax.random.PRNGKey(1), CFG)
    rng = np.random.RandomState(1)
    ids = rng.randint(0, 100, (2, 64)).astype(np.int32)
    mask = np.ones((2, 64), np.float32)
    mesh = make_mesh(n_data=1, n_model=8)
    fn = make_seq_sharded_bert_forward(CFG, mesh)
    out = np.asarray(fn(params, jnp.asarray(ids), jnp.asarray(mask)))
    assert out.shape == (2, 3) and np.isfinite(out).all()


@pytest.mark.parametrize("n_data,n_seq", [(2, 4), (4, 2)])
def test_seq_sharded_explain_parity(n_data, n_seq):
    """SP transformer_attribution == the dense fused explain (the SP reverse
    pass mirrors every dense op with psum_scatter/psum/all_gather)."""
    from transformer_explainability_tpu.parallel.sequence import (
        make_seq_sharded_bert_explain)
    from transformer_explainability_tpu.explain.bert_generator import (
        make_explain_fn)
    params = bert_mod.init_params(jax.random.PRNGKey(1), CFG)
    rng = np.random.RandomState(1)
    B, S = max(2, n_data), 32
    ids = rng.randint(0, 100, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.float32)
    mask[0, -5:] = 0.0
    idx = np.asarray([1, -1] * (B // 2), np.int32)

    dense = make_explain_fn(CFG, method="transformer_attribution",
                            start_layer=1)
    want = np.asarray(dense(params, jnp.asarray(ids), jnp.asarray(mask),
                            jnp.asarray(idx)))

    mesh = make_mesh(n_data=n_data, n_model=n_seq)
    fn = make_seq_sharded_bert_explain(CFG, mesh, start_layer=1)
    got = np.asarray(fn(params, jnp.asarray(ids), jnp.asarray(mask),
                        jnp.asarray(idx)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)
