"""FULL-SCALE BERT parity: bert-base (12 layers, hidden 768, 12 heads,
intermediate 3072) vs. the PyTorch reference
``BERT_explainability/modules/BERT/BertForSequenceClassification.py`` —
the exact depth/width the reference's ERASER pipeline explains
(``bert_pipeline.py:426-431``; relprop chain ``BERT.py:645-651``).

The toy-config suite (tests/test_bert_explain_parity.py) proves per-rule and
per-method parity at depth 3 / hidden 32; this module proves the chain at
REAL depth, where a depth-12 subtlety (post-norm residual accumulation, the
rollout row-normalization interacting over 12 real layers, start_layer
off-by-ones invisible at depth 3) would otherwise slip through.

Shared random weights (zero egress: no checkpoint downloads), a real
sentence through a local wordpiece vocab-file tokenizer, FLOAT64 on both
sides — f64 removes hardware/precision noise entirely, so agreement at
~1e-10 relative L2 proves *semantic* identity (same argument as
tests/test_fullscale_parity.py; PERF.md "The parity criterion").

Scale notes: vocab_size is 4096 (not 30522) — the word-embedding table's
row count is orthogonal to the relprop chain under test (embedding lookups
are not relprop-ed, ``BERT.py:58-94``) and f64 tables at full vocab are
pure fixture memory; every dimension the chain touches (depth, hidden,
heads, intermediate, max_position_embeddings=512) is the real one.

Marked ``slow``: single-core f64 at S=512 costs minutes per program.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.conftest import requires_reference
from transformer_explainability_tpu.models import bert as bert_mod
from transformer_explainability_tpu.models.bert import BertConfig
from transformer_explainability_tpu.params.convert import (
    bert_params_from_torch_state_dict)
from transformer_explainability_tpu.explain.bert_generator import (
    explain_single)

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "movie", "was", "an", "un", "##forget", "##table",
         "masterpiece", "with", "breath", "##taking", "cinema", "##tog",
         "##raphy", "and", "a", "plot", "that", "never", "lets", "go",
         "of", "you", "."]
SENTENCE = ("the movie was an unforgettable masterpiece with breathtaking "
            "cinematography and a plot that never lets go of you .")
NUM_LAYERS = 12


@pytest.fixture(scope="module", autouse=True)
def x64_mode():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _tokenize(tmp_path_factory, max_len):
    """Real sentence -> (ids, mask) at length ``max_len`` through a local
    vocab-file wordpiece tokenizer (zero egress — no HF hub)."""
    from transformers import BertTokenizerFast
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB))
    tok = BertTokenizerFast(vocab_file=str(p), do_lower_case=True)
    enc = tok(SENTENCE, padding="max_length", truncation=True,
              max_length=max_len)
    ids = np.asarray(enc["input_ids"], np.int64)[None]
    mask = np.asarray(enc["attention_mask"], np.float64)[None]
    assert mask.sum() > 8, "sentence must produce real tokens"
    assert mask.sum() < max_len, "must exercise the padded-mask Add path"
    return ids, mask


@pytest.fixture(scope="module")
def pair(x64_mode, tmp_path_factory):
    import sys
    import types
    sys.path.insert(0, "/root/reference")
    if "gensim" not in sys.modules:    # reference transitively imports it
        gensim = types.ModuleType("gensim")
        gensim_models = types.ModuleType("gensim.models")
        gensim_models.KeyedVectors = object
        gensim.models = gensim_models
        sys.modules["gensim"] = gensim
        sys.modules["gensim.models"] = gensim_models
    import torch
    from transformers import BertConfig as HFConfig
    from BERT_explainability.modules.BERT.BertForSequenceClassification import (
        BertForSequenceClassification)
    torch.manual_seed(0)
    hf_cfg = HFConfig(vocab_size=4096, hidden_size=768,
                      num_hidden_layers=NUM_LAYERS, num_attention_heads=12,
                      intermediate_size=3072, max_position_embeddings=512,
                      num_labels=2, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    ref = BertForSequenceClassification(hf_cfg).double()
    ref.eval()
    # the installed transformers' masked-position fill value at f64
    ext = ref.bert.get_extended_attention_mask(
        torch.tensor([[1.0, 0.0]], dtype=torch.float64), (1, 2),
        torch.device("cpu"))
    cfg = BertConfig(vocab_size=4096, hidden_size=768,
                     num_layers=NUM_LAYERS, num_heads=12,
                     intermediate_size=3072, max_position_embeddings=512,
                     num_labels=2, mask_value=float(ext[0, 0, 0, 1]))
    params = bert_params_from_torch_state_dict(ref.state_dict(), cfg,
                                               dtype=jnp.float64)
    ids128, mask128 = _tokenize(tmp_path_factory, 128)
    return ref, cfg, params, ids128, mask128


def _ref_ta(ref, ids, mask, index, start_layer):
    """Reference transformer_attribution (generate_LRP,
    ExplanationGenerator.py:28-59) in f64, minus .cuda()."""
    import torch
    from BERT_explainability.modules.BERT.ExplanationGenerator import (
        compute_rollout_attention)
    out = ref(input_ids=torch.tensor(ids),
              attention_mask=torch.tensor(mask, dtype=torch.float64),
              return_dict=False)[0]
    onehot = np.zeros((1, out.shape[-1]), np.float64)
    onehot[0, index] = 1
    ref.zero_grad()
    torch.sum(torch.from_numpy(onehot) * out).backward(retain_graph=True)
    ref.relprop(torch.tensor(onehot), alpha=1)
    cams = []
    for blk in ref.bert.encoder.layer:
        grad = blk.attention.self.get_attn_gradients()
        cam = blk.attention.self.get_attn_cam()
        cam = cam[0].reshape(-1, cam.shape[-1], cam.shape[-1])
        grad = grad[0].reshape(-1, grad.shape[-1], grad.shape[-1])
        cams.append((grad * cam).clamp(min=0).mean(dim=0).unsqueeze(0))
    rollout = compute_rollout_attention(cams, start_layer=start_layer)
    rollout[:, 0, 0] = rollout[:, 0].min()
    return rollout[:, 0].detach().numpy()[0]


def _ref_full(ref, ids, mask, index):
    """Reference generate_full_lrp (ExplanationGenerator.py:85-103) in f64."""
    import torch
    out = ref(input_ids=torch.tensor(ids),
              attention_mask=torch.tensor(mask, dtype=torch.float64),
              return_dict=False)[0]
    onehot = np.zeros((1, out.shape[-1]), np.float64)
    onehot[0, index] = 1
    ref.zero_grad()
    torch.sum(torch.from_numpy(onehot) * out).backward(retain_graph=True)
    cam = ref.relprop(torch.tensor(onehot), alpha=1)
    cam = cam.sum(dim=2)
    cam[:, 0] = 0
    return cam.detach().numpy()[0]


def _jax_explain(cfg, params, ids, mask, index, method, start_layer):
    fn = jax.jit(lambda p, i, m, x: explain_single(
        p, i, m, x, cfg, method, start_layer=start_layer))
    return np.asarray(fn(params, jnp.asarray(ids[0], jnp.int32),
                         jnp.asarray(mask[0]), jnp.int32(index)))


def _assert_rel_l2(got, want, bound=1e-8):
    got = np.asarray(got, np.float64).ravel()
    want = np.asarray(want, np.float64).ravel()
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel <= bound, f"rel L2 {rel:.3e} > {bound}"


@requires_reference
@pytest.mark.slow
def test_bert_fullscale_forward_logits(pair):
    import torch
    ref, cfg, params, ids, mask = pair
    want = ref(input_ids=torch.tensor(ids),
               attention_mask=torch.tensor(mask, dtype=torch.float64),
               return_dict=False)[0].detach().numpy()[0]
    got = np.asarray(jax.jit(lambda p, i, m: bert_mod.forward(
        p, i, m, cfg))(params, jnp.asarray(ids[0], jnp.int32),
                       jnp.asarray(mask[0])))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


@requires_reference
@pytest.mark.slow
@pytest.mark.parametrize("start_layer", [0, 11])
def test_bert_fullscale_transformer_attribution(pair, start_layer):
    """The headline chain (BERT.py:645-651 -> 12-layer grad*cam rollout) at
    real depth, both start_layer extremes (the notebook uses 0 and 11)."""
    ref, cfg, params, ids, mask = pair
    want = _ref_ta(ref, ids, mask, index=1, start_layer=start_layer)
    got = _jax_explain(cfg, params, ids, mask, 1,
                       "transformer_attribution", start_layer)
    _assert_rel_l2(got, want)


@requires_reference
@pytest.mark.slow
def test_bert_fullscale_full_lrp(pair):
    """Token-level full LRP through all 12 layers + embeddings add chain."""
    ref, cfg, params, ids, mask = pair
    want = _ref_full(ref, ids, mask, index=0)
    got = _jax_explain(cfg, params, ids, mask, 0, "full", 11)
    _assert_rel_l2(got, want)


@requires_reference
@pytest.mark.slow
def test_bert_fullscale_s512_transformer_attribution(pair, tmp_path_factory):
    """One S=512 case — the ERASER movies operating point
    (BERT_params/movies_bert.json max_length=512)."""
    ref, cfg, params, _, _ = pair
    ids, mask = _tokenize(tmp_path_factory, 512)
    want = _ref_ta(ref, ids, mask, index=1, start_layer=11)
    got = _jax_explain(cfg, params, ids, mask, 1,
                       "transformer_attribution", 11)
    _assert_rel_l2(got, want)
