"""End-to-end parity: our jitted explain() vs. the PyTorch reference
(baselines/ViT/ViT_LRP.py + ViT_explanation_generator.py), random weights,
small ViT config, batch 1 — the reference's operating point.

The reference generator's .cuda() calls make it unusable on CPU, so the tests
replicate its 10-line driver (forward -> one-hot backward -> model.relprop)
verbatim semantics around the *reference model's own* relprop.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.conftest import requires_reference
from transformer_explainability_tpu.models.vit import ViTConfig
from transformer_explainability_tpu.models import vit as vit_mod
from transformer_explainability_tpu.params.convert import (
    vit_params_from_torch_state_dict)
from transformer_explainability_tpu.explain.generator import make_explain_fn

CFG = ViTConfig(img_size=32, patch_size=16, embed_dim=24, depth=3,
                num_heads=4, num_classes=10)


@pytest.fixture(scope="module")
def pair():
    import torch
    import sys
    sys.path.insert(0, "/root/reference")
    from baselines.ViT import ViT_LRP
    torch.manual_seed(0)
    ref = ViT_LRP.VisionTransformer(
        img_size=32, patch_size=16, embed_dim=24, depth=3, num_heads=4,
        mlp_ratio=4., qkv_bias=True, num_classes=10)
    ref.eval()
    params = vit_params_from_torch_state_dict(ref.state_dict(), CFG)
    rng = np.random.RandomState(42)
    img = rng.randn(1, 3, 32, 32).astype(np.float32)
    return ref, params, img


def ref_relprop(ref, img, index, method, start_layer=0, is_ablation=False):
    import torch
    xt = torch.tensor(img, requires_grad=True)
    out = ref(xt)
    onehot = np.zeros((1, CFG.num_classes), dtype=np.float32)
    onehot[0, index] = 1
    score = torch.sum(torch.from_numpy(onehot) * out)
    ref.zero_grad()
    score.backward(retain_graph=True)
    cam = ref.relprop(torch.tensor(onehot), method=method, alpha=1,
                      start_layer=start_layer, is_ablation=is_ablation)
    return cam.detach().numpy()


@requires_reference
def test_forward_logits_parity(pair):
    import torch
    ref, params, img = pair
    want = ref(torch.tensor(img, requires_grad=True)).detach().numpy()
    got = np.asarray(vit_mod.forward(params, jnp.asarray(img[0]), CFG))
    np.testing.assert_allclose(got, want[0], rtol=1e-4, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("method,start_layer", [
    ("transformer_attribution", 0),
    ("transformer_attribution", 1),
    ("rollout", 0),
    ("last_layer", 0),
    ("second_layer", 0),
])
def test_relprop_method_parity(pair, method, start_layer):
    ref, params, img = pair
    index = 3
    want = ref_relprop(ref, img, index, method, start_layer)
    fn = make_explain_fn(CFG, method=method, start_layer=start_layer)
    got = np.asarray(fn(params, jnp.asarray(img),
                        jnp.array([index], jnp.int32)))
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-3, atol=1e-5)


@requires_reference
def test_full_lrp_parity(pair):
    ref, params, img = pair
    want = ref_relprop(ref, img, 7, "full")
    fn = make_explain_fn(CFG, method="full")
    got = np.asarray(fn(params, jnp.asarray(img), jnp.array([7], jnp.int32)))
    np.testing.assert_allclose(got[0], want[0], rtol=1e-3, atol=1e-5)


@requires_reference
def test_last_layer_ablation_parity(pair):
    ref, params, img = pair
    want = ref_relprop(ref, img, 2, "last_layer", is_ablation=True)
    fn = make_explain_fn(CFG, method="last_layer", is_ablation=True)
    got = np.asarray(fn(params, jnp.asarray(img), jnp.array([2], jnp.int32)))
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-3, atol=1e-5)


@requires_reference
def test_last_layer_attn_parity(pair):
    ref, params, img = pair
    want = ref_relprop(ref, img, 0, "last_layer_attn")
    fn = make_explain_fn(CFG, method="last_layer_attn")
    got = np.asarray(fn(params, jnp.asarray(img), jnp.array([0], jnp.int32)))
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-4, atol=1e-6)


@requires_reference
def test_rollout_attn_baseline_parity(pair):
    """Baselines.generate_rollout: raw attention, row-normalized rollout."""
    import torch
    ref, params, img = pair
    xt = torch.tensor(img, requires_grad=True)
    _ = ref(xt)
    from baselines.ViT.ViT_explanation_generator import (
        compute_rollout_attention)
    mats = [blk.attn.get_attn().mean(dim=1).detach() for blk in ref.blocks]
    want = compute_rollout_attention(mats)[0, 0, 1:].numpy()

    fn = make_explain_fn(CFG, method="rollout_attn")
    got = np.asarray(fn(params, jnp.asarray(img), jnp.array([-1], jnp.int32)))
    np.testing.assert_allclose(got.reshape(-1), want, rtol=1e-4, atol=1e-6)


@requires_reference
def test_attn_gradcam_parity(pair):
    """Baselines.generate_cam_attn math, replicated on the LRP model's saved
    attn/gradients (the reference uses ViT_new, identical forward)."""
    import torch
    ref, params, img = pair
    index = 5
    xt = torch.tensor(img, requires_grad=True)
    out = ref(xt)
    onehot = np.zeros((1, CFG.num_classes), dtype=np.float32)
    onehot[0, index] = 1
    ref.zero_grad()
    torch.sum(torch.from_numpy(onehot) * out).backward()
    grad = ref.blocks[-1].attn.get_attn_gradients()
    cam = ref.blocks[-1].attn.get_attn()
    g = CFG.grid
    cam = cam[0, :, 0, 1:].reshape(-1, g, g)
    grad = grad[0, :, 0, 1:].reshape(-1, g, g)
    grad = grad.mean(dim=[1, 2], keepdim=True)
    cam = (cam * grad).mean(0).clamp(min=0)
    want = ((cam - cam.min()) / (cam.max() - cam.min())).detach().numpy()

    fn = make_explain_fn(CFG, method="attn_gradcam")
    got = np.asarray(fn(params, jnp.asarray(img), jnp.array([index], jnp.int32)))
    np.testing.assert_allclose(got[0], want, rtol=1e-3, atol=1e-5)


@pytest.fixture(scope="module")
def pair_orig():
    """Reference ViT_orig_LRP (vanilla layers_lrp rules) — the model the seg
    harness uses for the full-LRP / partial-LRP baselines
    (imagenet_seg_eval.py:146-148)."""
    import torch
    import sys
    sys.path.insert(0, "/root/reference")
    from baselines.ViT import ViT_orig_LRP
    torch.manual_seed(0)
    ref = ViT_orig_LRP.VisionTransformer(
        img_size=32, patch_size=16, embed_dim=24, depth=3, num_heads=4,
        mlp_ratio=4., qkv_bias=True, num_classes=10)
    ref.eval()
    params = vit_params_from_torch_state_dict(ref.state_dict(), CFG)
    rng = np.random.RandomState(43)
    img = rng.randn(1, 3, 32, 32).astype(np.float32)
    return ref, params, img


@requires_reference
@pytest.mark.parametrize("method", ["full", "last_layer", "second_layer"])
def test_lrp_variant_parity(pair_orig, method):
    """variant='lrp' (separate-denominator Linear, plain z-rule Add) vs the
    reference's layers_lrp model."""
    ref, params, img = pair_orig
    index = 4
    want = ref_relprop(ref, img, index, method)
    fn = make_explain_fn(CFG, method=method, variant="lrp")
    got = np.asarray(fn(params, jnp.asarray(img),
                        jnp.array([index], jnp.int32)))
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-3, atol=1e-5)


@requires_reference
def test_argmax_index_matches_explicit(pair):
    """index=-1 (argmax) must equal passing the argmax class explicitly."""
    import torch
    ref, params, img = pair
    out = ref(torch.tensor(img, requires_grad=True)).detach()
    top = int(out.argmax())
    fn = make_explain_fn(CFG)
    a = np.asarray(fn(params, jnp.asarray(img), jnp.array([-1], jnp.int32)))
    b = np.asarray(fn(params, jnp.asarray(img), jnp.array([top], jnp.int32)))
    np.testing.assert_array_equal(a, b)


def test_batched_matches_loop(pair):
    """vmapped batch explanation == per-image singles (defines the batched
    semantics the reference lacks — SURVEY §7 'batch semantics')."""
    _, params, _ = pair
    rng = np.random.RandomState(1)
    imgs = rng.randn(3, 3, 32, 32).astype(np.float32)
    idx = np.array([1, 4, -1], np.int32)
    fn = make_explain_fn(CFG)
    batch = np.asarray(fn(params, jnp.asarray(imgs), jnp.asarray(idx)))
    for i in range(3):
        one = np.asarray(fn(params, jnp.asarray(imgs[i:i + 1]),
                            jnp.asarray(idx[i:i + 1])))
        np.testing.assert_allclose(batch[i], one[0], rtol=1e-5, atol=1e-7)
