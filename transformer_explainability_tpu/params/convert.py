"""Checkpoint converters: public torch/HF checkpoints -> JAX parameter pytrees.

The reference ingests timm ``.pth`` state dicts (``baselines/ViT/helpers.py:
87-149``, URL registry at ``ViT_LRP.py:24-36``) and HF ``from_pretrained``
weights for BERT. Parity demands loading the *identical* public weights, so
these converters map those state-dict layouts into this framework's pytrees.
Everything here is host-side numpy; no torch dependency unless a ``.pth`` file
is actually being read.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
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
    return params


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


def load_vit_checkpoint(path: str, cfg: ViTConfig, dtype=jnp.float32):
    """Load a timm ``.pth``/DeiT checkpoint file or an ``.npz`` export.

    Mirrors the reference's ``load_pretrained`` entry points
    (``helpers.py:87-149`` and the DeiT hub load at ``ViT_LRP.py:432-435``,
    whose checkpoint nests the state dict under ``"model"``).
    """
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    return vit_params_from_torch_state_dict(sd, cfg, dtype)
