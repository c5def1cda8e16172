"""Checkpoint converters: public torch/HF checkpoints -> JAX parameter pytrees.

The reference ingests timm ``.pth`` state dicts (``baselines/ViT/helpers.py:
87-149``, URL registry at ``ViT_LRP.py:24-36``) and HF ``from_pretrained``
weights for BERT. Parity demands loading the *identical* public weights, so
these converters map those state-dict layouts into this framework's pytrees.
Everything here is host-side numpy; no torch dependency unless a ``.pth`` file
is actually being read.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.models.vit import ViTConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):          # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def vit_params_from_torch_state_dict(sd: Mapping[str, Any],
                                     cfg: ViTConfig,
                                     dtype=jnp.float32) -> Dict[str, Any]:
    """Convert a timm/reference ViT state dict (the layout of
    ``baselines/ViT/ViT_LRP.py``'s VisionTransformer) into our pytree.

    Layout changes:
      * linear weights transpose (out,in) -> (in,out);
      * patch-embed conv weight (D, C, P, P) -> (C*P*P, D), channel-major
        flatten matching :func:`...ops.relprop.patchify`;
      * per-block tensors stacked along a leading depth axis for lax.scan.
    """
    sd = {k: _np(v) for k, v in sd.items()}
    D, L = cfg.embed_dim, cfg.depth

    def stack(fmt: str, transpose: bool = False):
        arrs = []
        for i in range(L):
            a = sd[fmt.format(i)]
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dtype)

    pe_w = sd["patch_embed.proj.weight"]          # (D, C, P, P)
    pe_kernel = pe_w.reshape(pe_w.shape[0], -1).T  # (C*P*P, D)

    params = {
        "patch_embed": {
            "kernel": jnp.asarray(pe_kernel, dtype),
            "bias": jnp.asarray(sd["patch_embed.proj.bias"], dtype),
        },
        "cls_token": jnp.asarray(sd["cls_token"].reshape(1, D), dtype),
        "pos_embed": jnp.asarray(sd["pos_embed"].reshape(-1, D), dtype),
        "blocks": {
            "norm1": {"scale": stack("blocks.{}.norm1.weight"),
                      "bias": stack("blocks.{}.norm1.bias")},
            "qkv": {"kernel": stack("blocks.{}.attn.qkv.weight", True)},
            "proj": {"kernel": stack("blocks.{}.attn.proj.weight", True),
                     "bias": stack("blocks.{}.attn.proj.bias")},
            "norm2": {"scale": stack("blocks.{}.norm2.weight"),
                      "bias": stack("blocks.{}.norm2.bias")},
            "fc1": {"kernel": stack("blocks.{}.mlp.fc1.weight", True),
                    "bias": stack("blocks.{}.mlp.fc1.bias")},
            "fc2": {"kernel": stack("blocks.{}.mlp.fc2.weight", True),
                    "bias": stack("blocks.{}.mlp.fc2.bias")},
        },
        "norm": {"scale": jnp.asarray(sd["norm.weight"], dtype),
                 "bias": jnp.asarray(sd["norm.bias"], dtype)},
        "head": {"kernel": jnp.asarray(sd["head.weight"].T, dtype),
                 "bias": jnp.asarray(sd["head.bias"], dtype)},
    }
    if "blocks.0.attn.qkv.bias" in sd:
        params["blocks"]["qkv"]["bias"] = stack("blocks.{}.attn.qkv.bias")
    if "dist_token" in sd:                     # timm deit_*_distilled_*
        params["dist_token"] = jnp.asarray(sd["dist_token"].reshape(1, D),
                                           dtype)
        params["head_dist"] = {
            "kernel": jnp.asarray(sd["head_dist.weight"].T, dtype),
            "bias": jnp.asarray(sd["head_dist.bias"], dtype)}
    return params


def vit_state_dict_from_params(params: Mapping[str, Any],
                               cfg: ViTConfig) -> Dict[str, np.ndarray]:
    """Inverse of :func:`vit_params_from_torch_state_dict`: export our
    pytree to the reference/timm state-dict layout (numpy arrays — feed to
    ``torch.from_numpy`` / ``model.load_state_dict``). Round-trip exact.

    Exists so jax-trained or jax-initialized weights can be loaded into the
    reference ``baselines/ViT/ViT_LRP.py`` model (cross-framework eval,
    fidelity methodology) or any timm ViT.
    """
    # np.array (not asarray): jax arrays view as read-only numpy;
    # torch.from_numpy on non-writable arrays warns and silently aliases
    # immutable memory — export owned, writable buffers uniformly
    p = jax.tree.map(lambda a: np.array(a), dict(params))
    D, L, C, P = cfg.embed_dim, cfg.depth, cfg.in_chans, cfg.patch_size
    sd: Dict[str, np.ndarray] = {
        # (C*P*P, D) channel-major flatten -> (D, C, P, P)
        "patch_embed.proj.weight":
            p["patch_embed"]["kernel"].T.reshape(D, C, P, P).copy(),
        "patch_embed.proj.bias": p["patch_embed"]["bias"],
        "cls_token": p["cls_token"].reshape(1, 1, D),
        "pos_embed": p["pos_embed"][None],
        "norm.weight": p["norm"]["scale"], "norm.bias": p["norm"]["bias"],
        "head.weight": p["head"]["kernel"].T.copy(),
        "head.bias": p["head"]["bias"],
    }
    per_block = [
        ("blocks.{}.norm1.weight", ("norm1", "scale"), False),
        ("blocks.{}.norm1.bias", ("norm1", "bias"), False),
        ("blocks.{}.attn.qkv.weight", ("qkv", "kernel"), True),
        ("blocks.{}.attn.proj.weight", ("proj", "kernel"), True),
        ("blocks.{}.attn.proj.bias", ("proj", "bias"), False),
        ("blocks.{}.norm2.weight", ("norm2", "scale"), False),
        ("blocks.{}.norm2.bias", ("norm2", "bias"), False),
        ("blocks.{}.mlp.fc1.weight", ("fc1", "kernel"), True),
        ("blocks.{}.mlp.fc1.bias", ("fc1", "bias"), False),
        ("blocks.{}.mlp.fc2.weight", ("fc2", "kernel"), True),
        ("blocks.{}.mlp.fc2.bias", ("fc2", "bias"), False),
    ]
    if "bias" in p["blocks"]["qkv"]:
        per_block.append(("blocks.{}.attn.qkv.bias", ("qkv", "bias"), False))
    for fmt, (mod, leaf), transpose in per_block:
        stacked = p["blocks"][mod][leaf]
        for i in range(L):
            a = stacked[i]
            sd[fmt.format(i)] = a.T.copy() if transpose else a
    if "dist_token" in p:                      # timm deit_*_distilled_*
        sd["dist_token"] = p["dist_token"].reshape(1, 1, D)
        sd["head_dist.weight"] = p["head_dist"]["kernel"].T.copy()
        sd["head_dist.bias"] = p["head_dist"]["bias"]
    return sd


def bert_params_from_torch_state_dict(sd: Mapping[str, Any], cfg,
                                      dtype=jnp.float32) -> Dict[str, Any]:
    """Convert an HF BertForSequenceClassification state dict (the layout the
    reference fine-tunes and reloads, ``bert_pipeline.py:404,426-429``) into
    our pytree. Accepts both ``bert.``-prefixed (classification model) and
    bare BertModel dicts."""
    sd = {k: _np(v) for k, v in sd.items()}
    if any(k.startswith("bert.") for k in sd):
        sd = {(k[5:] if k.startswith("bert.") else k): v for k, v in sd.items()}
    L = cfg.num_layers

    def stack(fmt, transpose=False):
        return jnp.asarray(np.stack(
            [sd[fmt.format(i)].T if transpose else sd[fmt.format(i)]
             for i in range(L)]), dtype)

    def ln(fmt):
        return {"scale": stack(fmt + ".weight"), "bias": stack(fmt + ".bias")}

    def lin(fmt):
        return {"kernel": stack(fmt + ".weight", True),
                "bias": stack(fmt + ".bias")}

    p = "encoder.layer.{}."
    params = {
        "embeddings": {
            "word": jnp.asarray(sd["embeddings.word_embeddings.weight"], dtype),
            "position": jnp.asarray(
                sd["embeddings.position_embeddings.weight"], dtype),
            "token_type": jnp.asarray(
                sd["embeddings.token_type_embeddings.weight"], dtype),
            "ln": {"scale": jnp.asarray(sd["embeddings.LayerNorm.weight"], dtype),
                   "bias": jnp.asarray(sd["embeddings.LayerNorm.bias"], dtype)},
        },
        "layers": {
            "q": lin(p + "attention.self.query"),
            "k": lin(p + "attention.self.key"),
            "v": lin(p + "attention.self.value"),
            "attn_out": lin(p + "attention.output.dense"),
            "attn_ln": ln(p + "attention.output.LayerNorm"),
            "inter": lin(p + "intermediate.dense"),
            "out": lin(p + "output.dense"),
            "out_ln": ln(p + "output.LayerNorm"),
        },
        "pooler": {"kernel": jnp.asarray(sd["pooler.dense.weight"].T, dtype),
                   "bias": jnp.asarray(sd["pooler.dense.bias"], dtype)},
    }
    if "classifier.weight" in sd:
        params["classifier"] = {
            "kernel": jnp.asarray(sd["classifier.weight"].T, dtype),
            "bias": jnp.asarray(sd["classifier.bias"], dtype)}
    return params


def bert_state_dict_from_params(params: Mapping[str, Any], cfg,
                                prefix_bert: bool = True
                                ) -> Dict[str, np.ndarray]:
    """Inverse of :func:`bert_params_from_torch_state_dict`: export our
    pytree to the HF BertForSequenceClassification state-dict layout
    (numpy arrays). Round-trip exact.

    ``prefix_bert``: emit ``bert.``-prefixed encoder keys (the
    classification-model layout the reference pipeline saves/reloads,
    ``bert_pipeline.py:404,426-429``) — pass False for a bare BertModel
    dict. Lets ERASER models fine-tuned here (rationale/pipeline.py) be
    exported back to the HF/torch ecosystem.

    Includes the ``embeddings.position_ids`` buffer the reference's
    vendored BertEmbeddings registers persistently (``BERT.py:55-56`` —
    it is exported when the torch model is serialized), so a strict
    ``load_state_dict`` (``bert_pipeline.py:426-429``) sees no missing
    keys. (Alternative: load with ``strict=False`` and drop the key.)
    """
    # np.array (not asarray): export owned, writable buffers — see
    # vit_state_dict_from_params
    p = jax.tree.map(lambda a: np.array(a), dict(params))
    L = cfg.num_layers
    pre = "bert." if prefix_bert else ""
    emb, lay = p["embeddings"], p["layers"]
    sd: Dict[str, np.ndarray] = {
        pre + "embeddings.position_ids":
            np.arange(cfg.max_position_embeddings, dtype=np.int64)[None],
        pre + "embeddings.word_embeddings.weight": emb["word"],
        pre + "embeddings.position_embeddings.weight": emb["position"],
        pre + "embeddings.token_type_embeddings.weight": emb["token_type"],
        pre + "embeddings.LayerNorm.weight": emb["ln"]["scale"],
        pre + "embeddings.LayerNorm.bias": emb["ln"]["bias"],
        pre + "pooler.dense.weight": p["pooler"]["kernel"].T.copy(),
        pre + "pooler.dense.bias": p["pooler"]["bias"],
    }
    per_layer = [
        ("attention.self.query", "q", True),
        ("attention.self.key", "k", True),
        ("attention.self.value", "v", True),
        ("attention.output.dense", "attn_out", True),
        ("attention.output.LayerNorm", "attn_ln", False),
        ("intermediate.dense", "inter", True),
        ("output.dense", "out", True),
        ("output.LayerNorm", "out_ln", False),
    ]
    for hf_name, ours, is_linear in per_layer:
        mod = lay[ours]
        w = mod["kernel"] if is_linear else mod["scale"]
        b = mod["bias"]
        for i in range(L):
            base = f"{pre}encoder.layer.{i}.{hf_name}"
            sd[base + ".weight"] = w[i].T.copy() if is_linear else w[i]
            sd[base + ".bias"] = b[i]
    if "classifier" in p:        # classifier stays unprefixed in HF layout
        sd["classifier.weight"] = p["classifier"]["kernel"].T.copy()
        sd["classifier.bias"] = p["classifier"]["bias"]
    return sd


def load_bert_checkpoint(path_or_name: str, cfg, dtype=jnp.float32):
    """Load from an HF-format directory/file (safetensors or torch .bin/.pt)."""
    import os
    if os.path.isdir(path_or_name):
        st = os.path.join(path_or_name, "model.safetensors")
        pt = os.path.join(path_or_name, "pytorch_model.bin")
        path_or_name = st if os.path.exists(st) else pt
    if path_or_name.endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = load_file(path_or_name)
    else:
        import torch
        sd = torch.load(path_or_name, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
    return bert_params_from_torch_state_dict(sd, cfg, dtype)


# Public checkpoint registry — the reference's ``default_cfgs``
# (ViT_LRP.py:24-36) + the DeiT torch.hub URL (:432-435). Zero-egress
# environments pass a local file instead; URLs are kept for parity/docs.
DEFAULT_CFGS = {
    "vit_base_patch16_224": {
        "url": "https://github.com/rwightman/pytorch-image-models/releases/"
               "download/v0.1-vitjx/jx_vit_base_p16_224-80ecf9dd.pth",
        "num_classes": 1000, "in_chans": 3,
    },
    "vit_large_patch16_224": {
        "url": "https://github.com/rwightman/pytorch-image-models/releases/"
               "download/v0.1-vitjx/jx_vit_large_p16_224-4ee7a4dc.pth",
        "num_classes": 1000, "in_chans": 3,
    },
    "deit_base_patch16_224": {
        "url": "https://dl.fbaipublicfiles.com/deit/"
               "deit_base_patch16_224-b5f2ef4d.pth",
        "num_classes": 1000, "in_chans": 3,
    },
    "deit_base_distilled_patch16_224": {
        "url": "https://dl.fbaipublicfiles.com/deit/"
               "deit_base_distilled_patch16_224-df68dfff.pth",
        "num_classes": 1000, "in_chans": 3, "distilled": True,
    },
}


def adapt_first_conv(kernel: np.ndarray, in_chans: int,
                     patch: int) -> Optional[np.ndarray]:
    """Adapt a patch-embed kernel (C*P*P, D) trained on 3 channels to
    ``in_chans`` input channels (reference ``helpers.py:99-134``):
    1 channel -> sum over RGB; otherwise tile channels and rescale by
    3/in_chans; returns None when no sane adaptation exists."""
    k = np.asarray(kernel, np.float32)
    D = k.shape[1]
    k3 = k.reshape(3, patch * patch, D)          # channel-major flatten
    if in_chans == 1:
        return k3.sum(axis=0).reshape(patch * patch, D)
    if in_chans == 3:
        return k
    repeat = -(-in_chans // 3)
    kc = np.tile(k3, (repeat, 1, 1))[:in_chans] * (3.0 / in_chans)
    return kc.reshape(in_chans * patch * patch, D)


def adapt_classifier(head: Dict[str, Any], num_classes: int,
                     pretrained_classes: int, key=None):
    """Classifier head resizing (reference ``helpers.py:137-147``):
    1001->1000 drops the background class; any other mismatch reinitializes
    (the reference deletes + falls back to the model's random init)."""
    kernel, bias = np.asarray(head["kernel"]), np.asarray(head["bias"])
    if num_classes == pretrained_classes:
        return head
    if num_classes == 1000 and pretrained_classes == 1001:
        return {"kernel": jnp.asarray(kernel[:, 1:]),
                "bias": jnp.asarray(bias[1:])}
    import jax
    if key is None:
        key = jax.random.PRNGKey(0)
    D = kernel.shape[0]
    return {"kernel": 0.02 * jax.random.truncated_normal(
                key, -2.0, 2.0, (D, num_classes), jnp.float32),
            "bias": jnp.zeros((num_classes,), jnp.float32)}


def resize_pos_embed(pos_embed: np.ndarray, new_tokens: int,
                     num_prefix_tokens: int = 1) -> np.ndarray:
    """Bilinear grid interpolation of the (n_prefix+N, D) position table for
    a different image resolution — the timm capability the TPU build adds so
    one checkpoint serves multiple input sizes. ``num_prefix_tokens`` is 1
    for plain ViT (CLS) and 2 for distilled DeiT (CLS+DIST); prefix rows are
    carried through untouched, only the patch grid is interpolated."""
    import jax
    pe = np.asarray(pos_embed)
    if pe.shape[0] == new_tokens:
        return pe
    prefix, grid = pe[:num_prefix_tokens], pe[num_prefix_tokens:]
    g_old = int(np.sqrt(grid.shape[0]))
    g_new = int(np.sqrt(new_tokens - num_prefix_tokens))
    grid = grid.reshape(g_old, g_old, -1)
    grid = np.asarray(jax.image.resize(
        jnp.asarray(grid), (g_new, g_new, grid.shape[-1]), "bilinear"))
    return np.concatenate([prefix, grid.reshape(g_new * g_new, -1)], axis=0)


def adapt_pretrained(params: Dict[str, Any], cfg: ViTConfig,
                     pretrained_classes: int = 1000, key=None
                     ) -> Dict[str, Any]:
    """Apply all checkpoint->model adaptations (first conv channels,
    classifier size, pos-embed grid) in one call."""
    params = dict(params)
    k = adapt_first_conv(params["patch_embed"]["kernel"], cfg.in_chans,
                         cfg.patch_size)
    if k is not None:
        params["patch_embed"] = dict(params["patch_embed"],
                                     kernel=jnp.asarray(k))
    params["head"] = adapt_classifier(params["head"], cfg.num_classes,
                                      pretrained_classes, key)
    if "head_dist" in params:
        params["head_dist"] = adapt_classifier(
            params["head_dist"], cfg.num_classes, pretrained_classes, key)
    params["pos_embed"] = jnp.asarray(
        resize_pos_embed(params["pos_embed"], cfg.num_tokens,
                         cfg.num_prefix_tokens))
    return params


def save_vit_npz(path: str, params: Dict[str, Any]) -> None:
    """Flat .npz export of a parameter pytree (the interchange format; restore
    with :func:`load_npz_pytree`)."""
    from transformer_explainability_tpu.utils.checkpoint import save_pytree
    save_pytree(path, params)


def load_npz_pytree(path: str, like):
    from transformer_explainability_tpu.utils.checkpoint import load_pytree
    return load_pytree(path, like)


def load_vit_checkpoint(path: str, cfg: ViTConfig, dtype=jnp.float32):
    """Load a timm ``.pth``/DeiT checkpoint file or an ``.npz`` export.

    Mirrors the reference's ``load_pretrained`` entry points
    (``helpers.py:87-149`` and the DeiT hub load at ``ViT_LRP.py:432-435``,
    whose checkpoint nests the state dict under ``"model"``).
    """
    if path.endswith(".npz"):
        sd = dict(np.load(path))
        if "patch_embed.proj.weight" not in sd:
            # Not a torch state-dict export: this is the repo's own flat
            # pytree layout (save_vit_npz / utils.checkpoint.save_pytree,
            # jax keystr keys) — restore it against a like-shaped pytree.
            from transformer_explainability_tpu.models.vit import init_params
            import jax
            like = init_params(jax.random.PRNGKey(0), cfg)
            return jax.tree.map(lambda a: jnp.asarray(a, dtype),
                                load_npz_pytree(path, like))
    else:
        import torch
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    return vit_params_from_torch_state_dict(sd, cfg, dtype)
