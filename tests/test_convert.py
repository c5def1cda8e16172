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


@pytest.mark.parametrize("nesting", ["flat", "model", "state_dict"])
def test_load_vit_checkpoint_pth_file(tmp_path, nesting):
    """File-level ingestion of a torch .pth in the reference layout
    (DeiT hub checkpoints nest under 'model', ViT_LRP.py:435)."""
    torch = pytest.importorskip("torch")
    D, L, C, P = 8, 2, 5, 16
    cfg = ViTConfig(img_size=32, patch_size=P, embed_dim=D, depth=L,
                    num_heads=2, num_classes=C)
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    sd = {"patch_embed.proj.weight": t(D, 3, P, P),
          "patch_embed.proj.bias": t(D),
          "cls_token": t(1, 1, D), "pos_embed": t(1, cfg.num_tokens, D),
          "norm.weight": t(D), "norm.bias": t(D),
          "head.weight": t(C, D), "head.bias": t(C)}
    for i in range(L):
        sd.update({
            f"blocks.{i}.norm1.weight": t(D), f"blocks.{i}.norm1.bias": t(D),
            f"blocks.{i}.attn.qkv.weight": t(3 * D, D),
            f"blocks.{i}.attn.qkv.bias": t(3 * D),
            f"blocks.{i}.attn.proj.weight": t(D, D),
            f"blocks.{i}.attn.proj.bias": t(D),
            f"blocks.{i}.norm2.weight": t(D), f"blocks.{i}.norm2.bias": t(D),
            f"blocks.{i}.mlp.fc1.weight": t(4 * D, D),
            f"blocks.{i}.mlp.fc1.bias": t(4 * D),
            f"blocks.{i}.mlp.fc2.weight": t(D, 4 * D),
            f"blocks.{i}.mlp.fc2.bias": t(D),
        })
    path = str(tmp_path / "ckpt.pth")
    blob = {"flat": sd, "model": {"model": sd},
            "state_dict": {"state_dict": sd}}[nesting]
    torch.save(blob, path)
    params = C_mod_load(path, cfg)
    assert params["blocks"]["qkv"]["kernel"].shape == (L, D, 3 * D)
    np.testing.assert_allclose(
        np.asarray(params["head"]["kernel"]),
        sd["head.weight"].numpy().T, rtol=1e-6)
    # converted params actually run
    img = jnp.asarray(np.random.RandomState(0).randn(3, 32, 32), jnp.float32)
    logits = vit_mod.forward(params, img, cfg)
    assert logits.shape == (C,) and bool(jnp.isfinite(logits).all())


def C_mod_load(path, cfg):
    return C.load_vit_checkpoint(path, cfg)


def test_distilled_state_dict_conversion():
    torch = pytest.importorskip("torch")
    from transformer_explainability_tpu.models.vit import (
        DEIT_BASE_DISTILLED_16_224)
    import dataclasses
    cfg = dataclasses.replace(DEIT_BASE_DISTILLED_16_224, img_size=32,
                              embed_dim=8, depth=1, num_heads=2,
                              num_classes=4)
    g = torch.Generator().manual_seed(0)
    D, C_, P = 8, 4, 16

    def t(*shape):
        return torch.randn(*shape, generator=g)

    sd = {"patch_embed.proj.weight": t(D, 3, P, P),
          "patch_embed.proj.bias": t(D),
          "cls_token": t(1, 1, D), "dist_token": t(1, 1, D),
          "pos_embed": t(1, cfg.num_tokens, D),
          "norm.weight": t(D), "norm.bias": t(D),
          "head.weight": t(C_, D), "head.bias": t(C_),
          "head_dist.weight": t(C_, D), "head_dist.bias": t(C_),
          "blocks.0.norm1.weight": t(D), "blocks.0.norm1.bias": t(D),
          "blocks.0.attn.qkv.weight": t(3 * D, D),
          "blocks.0.attn.qkv.bias": t(3 * D),
          "blocks.0.attn.proj.weight": t(D, D),
          "blocks.0.attn.proj.bias": t(D),
          "blocks.0.norm2.weight": t(D), "blocks.0.norm2.bias": t(D),
          "blocks.0.mlp.fc1.weight": t(4 * D, D),
          "blocks.0.mlp.fc1.bias": t(4 * D),
          "blocks.0.mlp.fc2.weight": t(D, 4 * D),
          "blocks.0.mlp.fc2.bias": t(D)}
    params = C.vit_params_from_torch_state_dict(sd, cfg)
    assert "dist_token" in params and "head_dist" in params
    assert params["pos_embed"].shape == (cfg.num_tokens, D)
    img = jnp.asarray(np.random.RandomState(0).randn(3, 32, 32), jnp.float32)
    logits = vit_mod.forward(params, img, cfg)
    assert logits.shape == (C_,) and bool(jnp.isfinite(logits).all())


def test_default_cfgs_registry():
    assert set(C.DEFAULT_CFGS) == {"vit_base_patch16_224",
                                   "vit_large_patch16_224",
                                   "deit_base_patch16_224",
                                   "deit_base_distilled_patch16_224"}
    for cfg in C.DEFAULT_CFGS.values():
        assert cfg["url"].startswith("https://")

def test_load_vit_checkpoint_npz_own_export(tmp_path):
    """ADVICE r1: the .npz branch must accept the repo's own save_vit_npz
    export (flat-pytree keystr layout), not just torch state-dict keys."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    path = str(tmp_path / "export.npz")
    C.save_vit_npz(path, params)
    loaded = C.load_vit_checkpoint(path, CFG)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resize_pos_embed_distilled_prefix():
    """ADVICE r1: two prefix rows (CLS+DIST) must be carried through, with
    the grid computed from new_tokens - 2."""
    rng = np.random.RandomState(0)
    pe = rng.randn(2 + 4, 6).astype(np.float32)       # 2 prefix + 2x2 grid
    out = C.resize_pos_embed(pe, 2 + 16, num_prefix_tokens=2)
    assert out.shape == (18, 6)
    np.testing.assert_allclose(out[:2], pe[:2])       # CLS+DIST untouched


def test_adapt_pretrained_distilled_resolution_change():
    """End-to-end: a distilled config at a new resolution keeps both prefix
    rows and adapts head_dist alongside head."""
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                    num_heads=2, num_classes=10, distilled=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tgt = ViTConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                    num_heads=2, num_classes=4, distilled=True)
    adapted = C.adapt_pretrained(params, tgt, pretrained_classes=10)
    assert adapted["pos_embed"].shape == (tgt.num_tokens, 32)
    np.testing.assert_allclose(np.asarray(adapted["pos_embed"][:2]),
                               np.asarray(params["pos_embed"][:2]))
    assert adapted["head_dist"]["kernel"].shape == (32, 4)
    img = jnp.asarray(np.random.RandomState(0).randn(3, 64, 64), jnp.float32)
    logits = vit_mod.forward(adapted, img, tgt)
    assert logits.shape == (4,) and bool(jnp.isfinite(logits).all())


def test_state_dict_export_roundtrip():
    """jax -> torch-layout export (vit_state_dict_from_params) inverts the
    importer exactly, including the distilled extras and qkv bias."""
    import dataclasses
    from transformer_explainability_tpu.models.vit import (
        DEIT_BASE_DISTILLED_16_224)
    cfg = dataclasses.replace(DEIT_BASE_DISTILLED_16_224, img_size=32,
                              embed_dim=8, depth=2, num_heads=2,
                              num_classes=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    sd = C.vit_state_dict_from_params(params, cfg)
    # torch tensor layout invariants
    D, P = cfg.embed_dim, cfg.patch_size
    assert sd["patch_embed.proj.weight"].shape == (D, 3, P, P)
    assert sd["cls_token"].shape == (1, 1, D)
    assert sd["blocks.1.attn.qkv.weight"].shape == (3 * D, D)
    back = C.vit_params_from_torch_state_dict(sd, cfg)
    flat_a, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    fb = {str(k): v for k, v in flat_b.items()}
    assert len(flat_a) == len(fb)
    for k, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(fb[str(k)]),
                                      err_msg=str(k))


def test_bert_state_dict_export_roundtrip():
    """jax -> HF-layout export (bert_state_dict_from_params) inverts the
    importer exactly, with and without the bert. encoder prefix."""
    from transformer_explainability_tpu.models.bert import (
        BertConfig, init_params as bert_init)
    cfg = BertConfig(vocab_size=50, hidden_size=8, num_layers=2,
                     num_heads=2, intermediate_size=16,
                     max_position_embeddings=16, num_labels=3)
    params = bert_init(jax.random.PRNGKey(0), cfg)
    for prefix in (True, False):
        sd = C.bert_state_dict_from_params(params, cfg, prefix_bert=prefix)
        pre = "bert." if prefix else ""
        assert pre + "encoder.layer.1.attention.self.query.weight" in sd
        assert "classifier.weight" in sd        # never prefixed
        # the reference's persistent position_ids buffer (BERT.py:55-56):
        # a strict load_state_dict would report it missing otherwise
        pid = sd[pre + "embeddings.position_ids"]
        assert pid.shape == (1, cfg.max_position_embeddings)
        assert pid.dtype == np.int64
        # every exported leaf must be writable (torch.from_numpy warns and
        # aliases immutable memory on read-only arrays)
        assert all(a.flags.writeable for a in sd.values())
        back = C.bert_params_from_torch_state_dict(sd, cfg)
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        fb = {str(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(back)[0]}
        assert len(flat_a) == len(fb)
        for k, v in flat_a:
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(fb[str(k)]), err_msg=str(k))
