"""Train-state checkpoint round-trip (reference resume_checkpoint analog)."""

import numpy as np
import jax
import optax
import pytest

from transformer_explainability_tpu.models.vit import ViTConfig, init_params
from transformer_explainability_tpu.utils import checkpoint as ckpt


def test_train_state_roundtrip(tmp_path):
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                    num_heads=2, num_classes=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    # take one update so the optimizer state is non-trivial
    grads = jax.tree.map(lambda x: x * 0.01, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    prefix = str(tmp_path / "exp1")
    assert not ckpt.has_train_state(prefix)
    ckpt.save_train_state(prefix, params, opt_state,
                          {"epoch": 3, "best_val_acc": 0.9})
    assert ckpt.has_train_state(prefix)

    params_like = init_params(jax.random.PRNGKey(1), cfg)
    opt_like = tx.init(params_like)
    p2, o2, meta = ckpt.restore_train_state(prefix, params_like, opt_like)
    assert meta == {"epoch": 3, "best_val_acc": 0.9}
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_backend_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                    num_heads=2, num_classes=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "orbax_ck")
    ckpt.save_pytree_orbax(path, params)
    out = ckpt.load_pytree_orbax(path, params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
