"""User-facing demo API — the notebook surface of the reference
(``example.ipynb`` cell 2 ``generate_visualization(image, class_index)``,
``print_top_classes``; ``Transformer_explainability.ipynb``;
``DeiT_example.ipynb``).

Typical use::

    from transformer_explainability_tpu import demo
    vis = demo.Demo(params)                      # or Demo.from_checkpoint(...)
    overlay = vis.generate_visualization(pil_image, class_index=243)
    vis.print_top_classes(pil_image)

Everything compiles once per method and runs batched on TPU.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np

from transformer_explainability_tpu.explain.generator import Explainer
from transformer_explainability_tpu.models import vit as vit_mod
from transformer_explainability_tpu.models.vit import (VIT_BASE_16_224,
                                                       ViTConfig)

# ImageNet normalization used by the reference notebooks
# (example.ipynb: Normalize(mean=[0.5]*3, std=[0.5]*3))
MEAN = np.array([0.5, 0.5, 0.5], np.float32)
STD = np.array([0.5, 0.5, 0.5], np.float32)

_CLASSES_PATH = os.path.join(os.path.dirname(__file__), "utils",
                             "imagenet_classes.json")


def imagenet_classes() -> dict:
    """index (int) -> human-readable label (the public ILSVRC2012 label
    table — same factual data as the reference's ``samples/CLS2IDX.py`` —
    stored as JSON with a ``_source`` provenance key)."""
    with open(_CLASSES_PATH) as f:
        return {int(k): v for k, v in json.load(f).items()
                if not k.startswith("_")}


def preprocess(image, size: int = 224) -> np.ndarray:
    """PIL image / HWC array in [0,255] or [0,1] -> normalized (C, H, W)."""
    if hasattr(image, "convert"):          # PIL
        image = image.convert("RGB").resize((size, size))
        arr = np.asarray(image, np.float32) / 255.0
    else:
        arr = np.asarray(image, np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
    if arr.shape[-1] == 3:                 # HWC -> CHW
        arr = ((arr - MEAN) / STD).transpose(2, 0, 1)
    return arr


def show_cam_on_image(img_hwc: np.ndarray, mask_hw: np.ndarray) -> np.ndarray:
    """JET-colormap overlay (the notebooks' ``show_cam_on_image``):
    0.5*heatmap + image, renormalized. Inputs in [0,1]; returns HWC [0,1]."""
    import matplotlib.cm as cm
    heatmap = cm.jet(np.asarray(mask_hw, np.float32))[..., :3]
    cam = heatmap + np.asarray(img_hwc, np.float32)
    return cam / cam.max()


def render_token_heatmap(heat: np.ndarray, img01_hwc: np.ndarray,
                         grid: int = 14, size: int = 224) -> np.ndarray:
    """Token-relevance row -> rendered overlay, the exact notebook pipeline:
    (grid*grid,) -> grid x grid -> bilinear upsample to ``size`` ->
    min-max normalize -> JET overlay on the [0,1] image. Returns HWC [0,1].

    Shared by Demo.generate_visualization and the golden-artifact
    regression test (tests/test_golden.py), so a rendering/colormap/resize
    regression in any piece of this chain fails CI."""
    from transformer_explainability_tpu import native
    hm = np.asarray(heat, np.float32).reshape(grid, grid)
    hm = native.resize_bilinear_chw(hm[None, None], size, size)[0, 0]
    hm = (hm - hm.min()) / (hm.max() - hm.min() + 1e-12)
    return show_cam_on_image(np.clip(img01_hwc, 0, 1), hm)


class Demo:
    """Single-image / batched explanation visualizer on ViT models."""

    def __init__(self, params, cfg: ViTConfig = VIT_BASE_16_224,
                 variant: str = "ours"):
        self.cfg = cfg
        self.explainer = Explainer(params, cfg, variant=variant)
        self.params = params
        # params as an argument, not a closure — closed-over params become
        # giant baked-in constants (343MB for ViT-B) that break the
        # remote-compile tunnel
        self._forward = jax.jit(jax.vmap(
            lambda p, img: vit_mod.forward(p, img, cfg), in_axes=(None, 0)))

    @classmethod
    def from_checkpoint(cls, path: str, cfg: ViTConfig = VIT_BASE_16_224,
                        **kw) -> "Demo":
        from transformer_explainability_tpu.params.convert import (
            load_vit_checkpoint)
        return cls(load_vit_checkpoint(path, cfg), cfg, **kw)

    def generate_visualization(self, image, class_index: Optional[int] = None,
                               method: str = "transformer_attribution",
                               start_layer: int = 0) -> np.ndarray:
        """The reference notebook API: heatmap -> 14x14 -> x16 bilinear
        upsample -> min-max normalize -> JET overlay on the (unnormalized)
        image. Returns HWC float RGB in [0,1]."""
        x = preprocess(image)
        idx = [-1 if class_index is None else int(class_index)]
        hm = np.asarray(self.explainer.explain(
            x[None], indices=idx, method=method, start_layer=start_layer))[0]
        g, S = self.cfg.grid, self.cfg.img_size
        img01 = (x.transpose(1, 2, 0) * STD) + MEAN
        if hm.ndim == 1 and hm.size == g * g:  # token row -> shared pipeline
            return render_token_heatmap(hm, img01, g, S)
        if hm.shape != (S, S):
            from transformer_explainability_tpu import native
            hm = native.resize_bilinear_chw(
                hm[None, None].astype(np.float32), S, S)[0, 0]
        hm = (hm - hm.min()) / (hm.max() - hm.min() + 1e-12)
        return show_cam_on_image(np.clip(img01, 0, 1), hm)

    def predict(self, image) -> np.ndarray:
        return np.asarray(self._forward(self.params,
                                        preprocess(image)[None]))[0]

    def print_top_classes(self, image, k: int = 5) -> list:
        """Softmax top-k with labels (example.ipynb ``print_top_classes``)."""
        logits = self.predict(image)
        probs = np.exp(logits - logits.max())
        probs = probs / probs.sum()
        top = np.argsort(logits)[::-1][:k]
        names = imagenet_classes()
        rows = []
        for i in top:
            row = (int(i), names.get(int(i), str(i)), float(logits[i]),
                   float(probs[i]))
            rows.append(row)
            print(f"class {row[0]:4d} : {row[1]:40s} logit {row[2]:8.3f} "
                  f"prob {row[3]*100:5.1f}%")
        return rows
