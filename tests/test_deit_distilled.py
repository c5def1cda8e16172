"""Distilled-DeiT variant (TPU-build extension: dist token + fused heads)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_explainability_tpu.models import vit as vit_mod
from transformer_explainability_tpu.models.vit import ViTConfig, init_params
from transformer_explainability_tpu.explain.generator import make_explain_fn

TINY_D = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                   num_heads=2, num_classes=10, distilled=True)
TINY = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                 num_heads=2, num_classes=10)


def test_distilled_forward_shapes_and_fusion():
    params = init_params(jax.random.PRNGKey(0), TINY_D)
    assert "dist_token" in params and "head_dist" in params
    assert params["pos_embed"].shape[0] == TINY_D.num_patches + 2
    img = jnp.asarray(np.random.RandomState(0).randn(3, 32, 32), jnp.float32)
    logits, res = vit_mod.forward_collect(params, img, TINY_D)
    assert logits.shape == (10,)
    # fused head: logits == (head(cls) + head_dist(dist)) / 2
    cls_logits = res.xn[0] @ params["head"]["kernel"] + params["head"]["bias"]
    dist_logits = (res.xn[1] @ params["head_dist"]["kernel"]
                   + params["head_dist"]["bias"])
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray((cls_logits + dist_logits) / 2),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("method,shape", [
    ("transformer_attribution", (4,)),
    ("rollout_attn", (4,)),
    ("last_layer", (4,)),
    ("attn_gradcam", (2, 2)),
    ("full", (32, 32)),
])
def test_distilled_methods_run(method, shape):
    params = init_params(jax.random.PRNGKey(0), TINY_D)
    fn = make_explain_fn(TINY_D, method=method)
    img = jnp.asarray(np.random.RandomState(0).randn(1, 3, 32, 32),
                      jnp.float32)
    out = np.asarray(fn(params, img, jnp.asarray([3], jnp.int32)))
    assert out.shape == (1,) + shape
    assert np.isfinite(out).all()


def test_distilled_reduces_to_plain_when_dist_ignored():
    """With head_dist == head and dist token == cls token the distilled model
    fuses two identical paths, so logits equal the plain head on cls."""
    params = init_params(jax.random.PRNGKey(0), TINY_D)
    params["head_dist"] = jax.tree.map(jnp.copy, params["head"])
    img = jnp.asarray(np.random.RandomState(1).randn(3, 32, 32), jnp.float32)
    logits, res = vit_mod.forward_collect(params, img, TINY_D)
    want = ((res.xn[0] + res.xn[1]) / 2) @ params["head"]["kernel"] + \
        params["head"]["bias"]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
