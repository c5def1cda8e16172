"""Regression: explain_single must self-apply jax.default_matmul_precision.

PERF.md round 3d found that without the context, the XLA-side rule dots
(which carry no per-dot ``precision=``) lower at the backend default —
1-pass bf16 on TPU — regardless of the ``matmul_precision`` argument,
silently degrading a direct caller's "float32" request to mean corr 0.817
vs 0.994 against f64 truth. The fix wraps the implementation in
``jax.default_matmul_precision(matmul_precision)`` inside explain_single
itself (explain/generator.py, explain/bert_generator.py).

Lowered-HLO check: under the context every dot's precision_config is
HIGHEST, so the lowered text of a *bare* (uncontexted) jit of
explain_single must carry HIGHEST dots. CPU lowering preserves the
precision attribute even though CPU execution ignores it, so the test
runs on the CPU conftest backend.
"""
import functools
import re

import jax
import jax.numpy as jnp
import numpy as np

from transformer_explainability_tpu.models.vit import ViTConfig
from transformer_explainability_tpu.models import vit as vit_mod
from transformer_explainability_tpu.models.bert import BertConfig
from transformer_explainability_tpu.models import bert as bert_mod
from transformer_explainability_tpu.explain import generator as vgen
from transformer_explainability_tpu.explain import bert_generator as bgen

VCFG = ViTConfig(img_size=32, patch_size=16, embed_dim=24, depth=2,
                 num_heads=4, num_classes=10)
BCFG = BertConfig(vocab_size=64, hidden_size=24, num_layers=2, num_heads=4,
                  intermediate_size=96, max_position_embeddings=48,
                  num_labels=2)


def _dot_precisions(text: str) -> set:
    """Collect the precision of every stablehlo dot_general.

    Lowered syntax: ``precision = [HIGHEST, HIGHEST]``; a dot with no
    precision attribute is backend-DEFAULT (the footgun).
    """
    out = set()
    for line in text.splitlines():
        if "dot_general" not in line:
            continue
        m = re.search(r"precision = \[([A-Z]+)", line)
        out.add(m.group(1) if m else "DEFAULT")
    return out


def test_vit_explain_single_lowers_dots_highest():
    params = vit_mod.init_params(jax.random.PRNGKey(0), VCFG)
    img = jnp.zeros((3, 32, 32), jnp.float32)
    fn = functools.partial(vgen.explain_single, cfg=VCFG,
                           method="transformer_attribution",
                           matmul_precision="float32")
    text = jax.jit(fn).lower(params, img, jnp.int32(0)).as_text()
    prec = _dot_precisions(text)
    assert prec == {"HIGHEST"}, (
        f"explain_single lowered dots at {prec}; the self-applied "
        "default_matmul_precision context is not reaching the rule dots")


def test_vit_explain_single_respects_requested_precision():
    # the context must carry the *argument*, not a hardcoded float32
    params = vit_mod.init_params(jax.random.PRNGKey(0), VCFG)
    img = jnp.zeros((3, 32, 32), jnp.float32)
    fn = functools.partial(vgen.explain_single, cfg=VCFG,
                           method="transformer_attribution",
                           matmul_precision="tensorfloat32")
    text = jax.jit(fn).lower(params, img, jnp.int32(0)).as_text()
    assert "HIGH" in _dot_precisions(text)


def test_bert_explain_single_lowers_dots_highest():
    params = bert_mod.init_params(jax.random.PRNGKey(0), BCFG)
    ids = jnp.zeros((16,), jnp.int32)
    mask = jnp.ones((16,), jnp.int32)
    fn = functools.partial(bgen.explain_single, cfg=BCFG,
                           method="transformer_attribution", start_layer=1,
                           matmul_precision="float32")
    text = jax.jit(fn).lower(params, ids, mask, jnp.int32(0)).as_text()
    prec = _dot_precisions(text)
    assert prec == {"HIGHEST"}, (
        f"bert explain_single lowered dots at {prec}")


def test_vit_explain_single_matches_wrapped_numerics():
    # direct call == the same call under an explicit outer context
    params = vit_mod.init_params(jax.random.PRNGKey(1), VCFG)
    img = jnp.asarray(np.random.RandomState(0)
                      .randn(3, 32, 32).astype(np.float32))
    direct = vgen.explain_single(params, img, jnp.int32(1), VCFG)
    with jax.default_matmul_precision("float32"):
        wrapped = vgen.explain_single(params, img, jnp.int32(1), VCFG)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(wrapped))
