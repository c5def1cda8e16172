"""Mesh sharding with the distilled-DeiT param tree (regression: pspecs must
match the params structure for distilled / no-qkv-bias configs)."""

import numpy as np
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.models.vit import ViTConfig, init_params
from transformer_explainability_tpu.parallel.mesh import (
    make_mesh, make_sharded_explain_fn, shard_params, vit_param_pspecs)


def test_distilled_mesh_explain():
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                    num_heads=4, num_classes=10, distilled=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=4, n_model=2)
    sp = shard_params(params, mesh, cfg=cfg)
    fn = make_sharded_explain_fn(cfg, mesh)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(4, 3, 32, 32).astype(np.float32))
    out = np.asarray(fn(sp, imgs, jnp.full((4,), -1, jnp.int32)))
    assert out.shape == (4, cfg.num_patches) and np.isfinite(out).all()


def test_no_qkv_bias_pspecs_match():
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                    num_heads=4, num_classes=10, qkv_bias=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    specs = vit_param_pspecs(cfg)
    # identical tree structure
    jax.tree.map(lambda a, b: None, params, specs,
                 is_leaf=lambda x: not isinstance(x, dict))
    mesh = make_mesh(n_data=8, n_model=1)
    sp = shard_params(params, mesh, cfg=cfg)
    assert "bias" not in sp["blocks"]["qkv"]
