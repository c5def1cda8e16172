"""End-to-end BERT parity vs. the reference BertForSequenceClassification
(BERT_explainability/modules/BERT/) with random weights, small config,
including padded inputs (the attention-mask Add relprop path)."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.conftest import requires_reference
from transformer_explainability_tpu.models import bert as bert_mod
from transformer_explainability_tpu.models.bert import BertConfig
from transformer_explainability_tpu.params.convert import (
    bert_params_from_torch_state_dict)
from transformer_explainability_tpu.explain.bert_generator import (
    make_explain_fn)

S = 12
NUM_LAYERS = 3


def jax_cfg(mask_value):
    return BertConfig(vocab_size=100, hidden_size=32, num_layers=NUM_LAYERS,
                      num_heads=4, intermediate_size=64,
                      max_position_embeddings=40, num_labels=2,
                      mask_value=mask_value)


@pytest.fixture(scope="module")
def pair():
    import sys
    import types
    sys.path.insert(0, "/root/reference")
    # the reference transitively imports gensim (unused in these paths)
    if "gensim" not in sys.modules:
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
    hf_cfg = HFConfig(vocab_size=100, hidden_size=32, num_hidden_layers=NUM_LAYERS,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=40, num_labels=2,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    ref = BertForSequenceClassification(hf_cfg)
    ref.eval()
    # what the installed transformers uses for masked positions
    mask_value = float((1.0 - torch.ones(1)).item())  # placeholder, fixed below
    ext = ref.bert.get_extended_attention_mask(
        torch.tensor([[1.0, 0.0]]), (1, 2), torch.device("cpu"))
    mask_value = float(ext[0, 0, 0, 1])
    cfg = jax_cfg(mask_value)
    params = bert_params_from_torch_state_dict(ref.state_dict(), cfg)

    rng = np.random.RandomState(7)
    ids = rng.randint(0, 100, (1, S)).astype(np.int64)
    mask_full = np.ones((1, S), np.float32)
    mask_pad = mask_full.copy()
    mask_pad[0, -3:] = 0.0
    return ref, cfg, params, ids, mask_full, mask_pad


def ref_explain(ref, ids, mask, index, method, start_layer=11):
    """The reference Generator driver, minus its .cuda() calls."""
    import torch
    ids_t = torch.tensor(ids)
    mask_t = torch.tensor(mask)
    out = ref(input_ids=ids_t, attention_mask=mask_t, return_dict=False)[0]
    onehot = np.zeros((1, out.shape[-1]), np.float32)
    onehot[0, index] = 1
    ref.zero_grad()
    torch.sum(torch.from_numpy(onehot) * out).backward(retain_graph=True)
    if method == "full":
        cam = ref.relprop(torch.tensor(onehot), alpha=1)
        cam = cam.sum(dim=2)
        cam[:, 0] = 0
        return cam.detach().numpy()[0]
    ref.relprop(torch.tensor(onehot), alpha=1)
    blocks = ref.bert.encoder.layer
    from BERT_explainability.modules.BERT.ExplanationGenerator import (
        compute_rollout_attention)
    import torch as T
    if method == "transformer_attribution":
        cams = []
        for blk in blocks:
            grad = blk.attention.self.get_attn_gradients()
            cam = blk.attention.self.get_attn_cam()
            cam = cam[0].reshape(-1, cam.shape[-1], cam.shape[-1])
            grad = grad[0].reshape(-1, grad.shape[-1], grad.shape[-1])
            cam = (grad * cam).clamp(min=0).mean(dim=0)
            cams.append(cam.unsqueeze(0))
        rollout = compute_rollout_attention(cams, start_layer=start_layer)
        rollout[:, 0, 0] = rollout[:, 0].min()
        return rollout[:, 0].detach().numpy()[0]
    if method == "last_layer":
        cam = blocks[-1].attention.self.get_attn_cam()[0]
        cam = cam.clamp(min=0).mean(dim=0).unsqueeze(0)
        cam[:, 0, 0] = 0
        return cam[:, 0].detach().numpy()[0]
    if method == "last_layer_attn":
        cam = blocks[-1].attention.self.get_attn()[0]
        cam = cam.mean(dim=0).unsqueeze(0)
        cam[:, 0, 0] = 0
        return cam[:, 0].detach().numpy()[0]
    if method == "rollout":
        mats = [blk.attention.self.get_attn().mean(dim=1).detach()
                for blk in blocks]
        rollout = compute_rollout_attention(mats, start_layer=0)
        rollout[:, 0, 0] = 0
        return rollout[:, 0].detach().numpy()[0]
    if method == "attn_gradcam":
        cam = blocks[-1].attention.self.get_attn()
        grad = blocks[-1].attention.self.get_attn_gradients()
        cam = cam[0].reshape(-1, cam.shape[-1], cam.shape[-1])
        grad = grad[0].reshape(-1, grad.shape[-1], grad.shape[-1])
        grad = grad.mean(dim=[1, 2], keepdim=True)
        cam = (cam * grad).mean(0).clamp(min=0).unsqueeze(0)
        cam = (cam - cam.min()) / (cam.max() - cam.min())
        cam[:, 0, 0] = 0
        return cam[:, 0].detach().numpy()[0]
    raise ValueError(method)


@requires_reference
def test_forward_logits_parity(pair):
    import torch
    ref, cfg, params, ids, mask_full, mask_pad = pair
    for mask in (mask_full, mask_pad):
        want = ref(input_ids=torch.tensor(ids),
                   attention_mask=torch.tensor(mask),
                   return_dict=False)[0].detach().numpy()
        got = np.asarray(bert_mod.forward(
            params, jnp.asarray(ids[0], jnp.int32),
            jnp.asarray(mask[0]), cfg))
        np.testing.assert_allclose(got, want[0], rtol=1e-4, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("method,start_layer", [
    ("transformer_attribution", NUM_LAYERS - 1),
    ("transformer_attribution", 0),
    ("last_layer", 11),
    ("full", 11),
    ("last_layer_attn", 11),
    ("rollout", 0),
    ("attn_gradcam", 11),
])
@pytest.mark.parametrize("padded", [False, True])
def test_bert_method_parity(pair, method, start_layer, padded):
    ref, cfg, params, ids, mask_full, mask_pad = pair
    mask = mask_pad if padded else mask_full
    index = 1
    want = ref_explain(ref, ids, mask, index, method, start_layer)
    fn = make_explain_fn(cfg, method=method,
                         start_layer=min(start_layer, NUM_LAYERS - 1))
    got = np.asarray(fn(params, jnp.asarray(ids, jnp.int32),
                        jnp.asarray(mask), jnp.array([index], jnp.int32)))
    np.testing.assert_allclose(got[0], want, rtol=2e-3, atol=1e-5)


@pytest.fixture(scope="module")
def pair_orig(pair):
    """Reference BERT_cls_lrp / BERT_orig_lrp (vanilla layers_lrp rules) —
    the model the pipeline uses for every baseline method
    (bert_pipeline.py:443-448), sharing the ours-model's weights."""
    import torch
    from transformers import BertConfig as HFConfig
    from BERT_explainability.modules.BERT.BERT_cls_lrp import (
        BertForSequenceClassification as BertClsLrp)
    ref, cfg, params, ids, mask_full, mask_pad = pair
    hf_cfg = HFConfig(vocab_size=100, hidden_size=32,
                      num_hidden_layers=NUM_LAYERS, num_attention_heads=4,
                      intermediate_size=64, max_position_embeddings=40,
                      num_labels=2, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    ref_lrp = BertClsLrp(hf_cfg)
    ref_lrp.load_state_dict(ref.state_dict())
    ref_lrp.eval()
    return ref_lrp, cfg, params, ids, mask_full, mask_pad


@requires_reference
@pytest.mark.parametrize("method", ["full", "last_layer"])
def test_bert_lrp_variant_parity(pair_orig, method):
    """variant='lrp' vs the reference's layers_lrp BERT model."""
    ref_lrp, cfg, params, ids, mask_full, _ = pair_orig
    index = 0
    want = ref_explain(ref_lrp, ids, mask_full, index, method, 0)
    fn = make_explain_fn(cfg, method=method, start_layer=0, variant="lrp")
    got = np.asarray(fn(params, jnp.asarray(ids, jnp.int32),
                        jnp.asarray(mask_full), jnp.array([index], jnp.int32)))
    np.testing.assert_allclose(got[0], want, rtol=2e-3, atol=1e-5)


@requires_reference
def test_argmax_sentinel(pair):
    import torch
    ref, cfg, params, ids, mask_full, _ = pair
    out = ref(input_ids=torch.tensor(ids),
              attention_mask=torch.tensor(mask_full),
              return_dict=False)[0].detach()
    top = int(out.argmax())
    fn = make_explain_fn(cfg, start_layer=0)
    a = np.asarray(fn(params, jnp.asarray(ids, jnp.int32),
                      jnp.asarray(mask_full), jnp.array([-1], jnp.int32)))
    b = np.asarray(fn(params, jnp.asarray(ids, jnp.int32),
                      jnp.asarray(mask_full), jnp.array([top], jnp.int32)))
    np.testing.assert_array_equal(a, b)


@requires_reference
def test_head_mask_parity(pair):
    """The dormant reference capability (BERT.py:355-356, :375-377): per-head
    multipliers on the post-softmax probabilities, z-rule Mul relprop.

    The reference's own relprop path is broken upstream — its forward uses a
    plain ``*`` and never calls ``self.mul``, so ``Mul.X`` is unset and
    relprop raises AttributeError. The test repairs the hooks after the
    forward (calling ``self.mul`` on the saved probs + mask, exactly what
    the forward was intended to do) and then asserts full parity: logits,
    per-layer attention cams + hook gradients, and token relevance."""
    import torch
    ref, cfg, params, ids, mask_full, _ = pair
    rng = np.random.RandomState(3)
    L, h = NUM_LAYERS, 4
    hm = rng.uniform(0.2, 1.0, (L, h)).astype(np.float32)
    hm[0, 1] = 0.0                      # one fully-masked head
    ids_t = torch.tensor(ids)
    mask_t = torch.tensor(mask_full)
    hm_t = torch.tensor(hm)

    out = ref(input_ids=ids_t, attention_mask=mask_t, head_mask=hm_t,
              return_dict=False)[0]
    logits, res = bert_mod.forward_collect(
        params, jnp.asarray(ids[0]), jnp.asarray(mask_full[0]), cfg,
        head_mask=jnp.asarray(hm))
    np.testing.assert_allclose(np.asarray(logits), out.detach().numpy()[0],
                               rtol=1e-4, atol=1e-5)

    onehot = np.zeros((1, 2), np.float32)
    onehot[0, 1] = 1
    ref.zero_grad()
    torch.sum(torch.from_numpy(onehot) * out).backward(retain_graph=True)
    # repair the dormant Mul hooks with the values the forward consumed
    for l, blk in enumerate(ref.bert.encoder.layer):
        sa = blk.attention.self
        sa.mul([sa.get_attn(), hm_t[l].view(1, -1, 1, 1)])
    want_R = ref.relprop(torch.tensor(onehot), alpha=1).detach().numpy()[0]

    R_tokens, attn_cams, attn_grads = bert_mod.reverse_pass(
        params, res, jnp.asarray(onehot[0]), cfg, head_mask=jnp.asarray(hm))
    np.testing.assert_allclose(np.asarray(R_tokens), want_R,
                               rtol=1e-3, atol=1e-6)
    for l, blk in enumerate(ref.bert.encoder.layer):
        sa = blk.attention.self
        np.testing.assert_allclose(
            np.asarray(attn_cams[l]),
            sa.get_attn_cam().detach().numpy()[0], rtol=1e-3, atol=1e-6,
            err_msg=f"attn_cam layer {l}")
        np.testing.assert_allclose(
            np.asarray(attn_grads[l]),
            sa.get_attn_gradients().detach().numpy()[0],
            rtol=1e-3, atol=1e-6, err_msg=f"attn_grad layer {l}")
