"""Mesh/sharding tests on the virtual 8-device CPU backend."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_explainability_tpu.models.vit import ViTConfig, init_params
from transformer_explainability_tpu.explain.generator import make_explain_fn
from transformer_explainability_tpu.parallel.mesh import (
    make_mesh, shard_params, make_sharded_explain_fn)
from transformer_explainability_tpu import train as train_mod

CFG = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                num_heads=4, num_classes=10)


def test_eight_cpu_devices():
    assert len(jax.devices()) == 8


def test_sharded_explain_matches_single():
    params = init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    idx = jnp.asarray(np.arange(8) % 10, jnp.int32)

    ref_fn = make_explain_fn(CFG)
    want = np.asarray(ref_fn(params, imgs, idx))

    mesh = make_mesh(n_data=4, n_model=2)
    sp = shard_params(params, mesh, cfg=CFG)
    fn = make_sharded_explain_fn(CFG, mesh)
    got = np.asarray(fn(sp, imgs, idx))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_sharded_explain_data_only_mesh():
    params = init_params(jax.random.PRNGKey(1), CFG)
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    idx = jnp.full((8,), -1, jnp.int32)
    mesh = make_mesh(n_data=8, n_model=1)
    sp = shard_params(params, mesh, cfg=CFG)
    fn = make_sharded_explain_fn(CFG, mesh)
    out = np.asarray(fn(sp, imgs, idx))
    assert out.shape == (8, CFG.num_patches)
    assert np.isfinite(out).all()


def test_sharded_explain_precision_kwargs():
    """The island-precision knobs thread through the sharded program (the
    harness --mesh + --precision combination)."""
    from transformer_explainability_tpu.explain.generator import (
        PRECISION_PRESETS)
    params = init_params(jax.random.PRNGKey(2), CFG)
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    idx = jnp.full((8,), -1, jnp.int32)
    mesh = make_mesh(n_data=4, n_model=2)
    sp = shard_params(params, mesh, cfg=CFG)
    fn = make_sharded_explain_fn(CFG, mesh, **PRECISION_PRESETS["production"])
    out = np.asarray(fn(sp, imgs, idx))
    assert out.shape == (8, CFG.num_patches) and np.isfinite(out).all()
    # f32 preset == the default sharded program, bitwise
    want = np.asarray(make_sharded_explain_fn(CFG, mesh)(sp, imgs, idx))
    got = np.asarray(make_sharded_explain_fn(
        CFG, mesh, **PRECISION_PRESETS["float32"])(sp, imgs, idx))
    np.testing.assert_array_equal(got, want)


def test_train_step_sharded_loss_decreases():
    mesh = make_mesh(n_data=4, n_model=2)
    opt = train_mod.make_optimizer(lr=1e-3)
    params, opt_state = train_mod.init_train_state(
        jax.random.PRNGKey(0), CFG, opt, mesh)
    step = train_mod.make_train_step(CFG, opt, mesh,
                                     matmul_precision="float32")
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 10, 8), jnp.int32)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, imgs, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
