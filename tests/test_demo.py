"""Demo API tests (CPU, tiny config)."""

import numpy as np
import jax

from transformer_explainability_tpu import demo
from transformer_explainability_tpu.models.vit import ViTConfig, init_params

TINY = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                 num_heads=2, num_classes=10)


def test_imagenet_classes_table():
    names = demo.imagenet_classes()
    assert len(names) == 1000
    assert "tench" in names[0]
    assert isinstance(names[999], str)


def test_generate_visualization_and_topk(capsys):
    params = init_params(jax.random.PRNGKey(0), TINY)
    d = demo.Demo(params, TINY)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)

    overlay = d.generate_visualization(img, class_index=3)
    assert overlay.shape == (32, 32, 3)
    assert np.isfinite(overlay).all()
    assert overlay.max() <= 1.0 + 1e-6 and overlay.min() >= 0.0

    # argmax path + other methods reuse the same compiled surface
    overlay2 = d.generate_visualization(img, method="rollout_attn")
    assert overlay2.shape == (32, 32, 3)
    full = d.generate_visualization(img, class_index=1, method="full")
    assert full.shape == (32, 32, 3)

    rows = d.print_top_classes(img, k=3)
    assert len(rows) == 3
    out = capsys.readouterr().out
    assert "class" in out and "prob" in out


def test_preprocess_shapes():
    rng = np.random.RandomState(0)
    chw = demo.preprocess(rng.rand(16, 16, 3).astype(np.float32))
    assert chw.shape == (3, 16, 16)
    chw2 = demo.preprocess(rng.randint(0, 255, (16, 16, 3)).astype(np.float32))
    assert np.isfinite(chw2).all() and abs(chw2).max() <= 1.0 + 1e-6
