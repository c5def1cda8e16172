"""LRP conservation invariant — the reference's manual debug breadcrumbs
(commented-out ``cam.sum()`` checks at ViT_LRP.py:326,334 and
BERT.py:647-650) codified: with the "ours" rules at alpha=1 the total
relevance injected at the classifier is conserved through the whole relprop
chain (the renormalizing Add keeps per-block totals)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_explainability_tpu.models import vit as vit_mod
from transformer_explainability_tpu.models import bert as bert_mod
from transformer_explainability_tpu.models.vit import ViTConfig
from transformer_explainability_tpu.models.bert import BertConfig

VCFG = ViTConfig(img_size=32, patch_size=16, embed_dim=24, depth=3,
                 num_heads=4, num_classes=10)
BCFG = BertConfig(vocab_size=100, hidden_size=32, num_layers=3, num_heads=4,
                  intermediate_size=64, max_position_embeddings=40,
                  num_labels=2)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vit_relevance_conservation(seed):
    params = vit_mod.init_params(jax.random.PRNGKey(seed), VCFG)
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.randn(3, 32, 32), jnp.float32)
    logits, res = vit_mod.forward_collect(params, img, VCFG)
    onehot = jax.nn.one_hot(seed % 10, 10)
    R_tokens, _, _ = vit_mod.reverse_pass(params, res, onehot, VCFG,
                                          alpha=1.0, variant="ours")
    assert np.isclose(float(R_tokens.sum()), 1.0, atol=1e-4), \
        float(R_tokens.sum())


def test_bert_relevance_conservation():
    params = bert_mod.init_params(jax.random.PRNGKey(0), BCFG)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 100, (12,)), jnp.int32)
    mask = jnp.ones((12,), jnp.float32)
    logits, res = bert_mod.forward_collect(params, ids, mask, BCFG)
    onehot = jax.nn.one_hot(1, 2)
    R_tokens, _, _ = bert_mod.reverse_pass(params, res, onehot, BCFG,
                                           alpha=1.0, variant="ours")
    assert np.isclose(float(R_tokens.sum()), 1.0, atol=1e-3), \
        float(R_tokens.sum())
