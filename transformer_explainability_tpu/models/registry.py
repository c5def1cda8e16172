"""Model factory — the analog of the reference's constructor functions
(``vit_base_patch16_224`` ViT_LRP.py:410, ``vit_large_patch16_224`` :419,
``deit_base_patch16_224`` :427) + ``build_model_with_cfg``
(``baselines/ViT/helpers.py:250-295``): name -> (config, params), loading a
local checkpoint file when given (zero-egress environments download
separately; URLs in ``params.convert.DEFAULT_CFGS``)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax

from transformer_explainability_tpu.models import bert as bert_mod
from transformer_explainability_tpu.models import vit as vit_mod
from transformer_explainability_tpu.models.bert import (BERT_BASE_UNCASED,
                                                        BertConfig)
from transformer_explainability_tpu.models.vit import (
    DEIT_BASE_16_224, DEIT_BASE_DISTILLED_16_224, VIT_BASE_16_224,
    VIT_LARGE_16_224, ViTConfig)

VIT_CONFIGS: Dict[str, ViTConfig] = {
    "vit_base_patch16_224": VIT_BASE_16_224,
    "vit_large_patch16_224": VIT_LARGE_16_224,
    "deit_base_patch16_224": DEIT_BASE_16_224,
    "deit_base_distilled_patch16_224": DEIT_BASE_DISTILLED_16_224,
}

BERT_CONFIGS: Dict[str, BertConfig] = {
    "bert-base-uncased": BERT_BASE_UNCASED,
}


def list_models():
    return sorted(VIT_CONFIGS) + sorted(BERT_CONFIGS)


def create_model(name: str, checkpoint: Optional[str] = None,
                 seed: int = 0, **overrides
                 ) -> Tuple[Any, Dict[str, Any]]:
    """Returns (config, params). ``checkpoint``: local .pth/.npz (ViT) or HF
    dir/safetensors (BERT); random init otherwise. ``overrides`` replace
    config fields (e.g. ``num_classes=2``)."""
    import dataclasses
    if name in VIT_CONFIGS:
        cfg = VIT_CONFIGS[name]
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        if checkpoint:
            from transformer_explainability_tpu.params.convert import (
                load_vit_checkpoint)
            return cfg, load_vit_checkpoint(checkpoint, cfg)
        return cfg, vit_mod.init_params(jax.random.PRNGKey(seed), cfg)
    if name in BERT_CONFIGS:
        cfg = BERT_CONFIGS[name]
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        if checkpoint:
            from transformer_explainability_tpu.params.convert import (
                load_bert_checkpoint)
            return cfg, load_bert_checkpoint(checkpoint, cfg)
        return cfg, bert_mod.init_params(jax.random.PRNGKey(seed), cfg)
    raise ValueError(f"unknown model {name!r}; available: {list_models()}")
