"""Checkpoint adaptation tests (reference helpers.py:87-149 capabilities)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_explainability_tpu.models import vit as vit_mod
from transformer_explainability_tpu.models.vit import ViTConfig, init_params
from transformer_explainability_tpu.params import convert as C


CFG = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                num_heads=2, num_classes=10)


def test_adapt_first_conv_grayscale():
    rng = np.random.RandomState(0)
    k = rng.randn(3 * 16 * 16, 8).astype(np.float32)
    k1 = C.adapt_first_conv(k, in_chans=1, patch=16)
    assert k1.shape == (16 * 16, 8)
    # summing RGB planes == applying the conv to a 3x-replicated gray image
    np.testing.assert_allclose(
        k1, k.reshape(3, 256, 8).sum(0), rtol=1e-6)


def test_adapt_first_conv_multichannel():
    rng = np.random.RandomState(0)
    k = rng.randn(3 * 4 * 4, 8).astype(np.float32)
    k5 = C.adapt_first_conv(k, in_chans=5, patch=4)
    assert k5.shape == (5 * 16, 8)
    # tiled + rescaled by 3/5
    np.testing.assert_allclose(
        k5.reshape(5, 16, 8)[0], k.reshape(3, 16, 8)[0] * 0.6, rtol=1e-6)
    assert C.adapt_first_conv(k, in_chans=3, patch=4) is k


def test_adapt_classifier():
    rng = np.random.RandomState(0)
    head = {"kernel": rng.randn(8, 1001).astype(np.float32),
            "bias": rng.randn(1001).astype(np.float32)}
    out = C.adapt_classifier(head, 1000, 1001)
    assert out["kernel"].shape == (8, 1000)
    np.testing.assert_allclose(np.asarray(out["bias"]), head["bias"][1:])
    out2 = C.adapt_classifier(head, 7, 1001)
    assert out2["kernel"].shape == (8, 7) and np.asarray(
        out2["bias"]).shape == (7,)
    assert C.adapt_classifier(head, 1001, 1001) is head


def test_resize_pos_embed_identity_and_grid():
    rng = np.random.RandomState(0)
    pe = rng.randn(1 + 4, 6).astype(np.float32)     # 2x2 grid
    assert C.resize_pos_embed(pe, 5) is pe
    out = C.resize_pos_embed(pe, 1 + 16)            # -> 4x4 grid
    assert out.shape == (17, 6)
    np.testing.assert_allclose(out[0], pe[0])       # CLS row untouched


def test_adapt_pretrained_end_to_end():
    params = init_params(jax.random.PRNGKey(0), CFG)
    tgt = ViTConfig(img_size=64, patch_size=16, in_chans=1, embed_dim=32,
                    depth=2, num_heads=2, num_classes=4)
    adapted = C.adapt_pretrained(params, tgt, pretrained_classes=10)
    assert adapted["patch_embed"]["kernel"].shape == (1 * 16 * 16, 32)
    assert adapted["head"]["kernel"].shape == (32, 4)
    assert adapted["pos_embed"].shape == (tgt.num_tokens, 32)
    # the adapted model runs
    img = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64),
                      jnp.float32)
    logits = vit_mod.forward(adapted, img, tgt)
    assert logits.shape == (4,) and bool(jnp.isfinite(logits).all())


def test_npz_pytree_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(0), CFG)
    path = str(tmp_path / "ckpt.npz")
    C.save_vit_npz(path, params)
    loaded = C.load_npz_pytree(path, params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_default_cfgs_registry():
    assert set(C.DEFAULT_CFGS) == {"vit_base_patch16_224",
                                   "vit_large_patch16_224",
                                   "deit_base_patch16_224",
                                   "deit_base_distilled_patch16_224"}
    for cfg in C.DEFAULT_CFGS.values():
        assert cfg["url"].startswith("https://")
