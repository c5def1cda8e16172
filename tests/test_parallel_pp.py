"""Pipeline-parallel (GPipe-on-a-ring) tests on the virtual 8-device mesh.

Correctness oracle: the single-device forward / train step — the pipeline
is a pure re-scheduling of the same math, so logits, loss, and the
post-step parameters must match to f32 tolerance regardless of the
(n_stage, microbatch) schedule.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from transformer_explainability_tpu.models.vit import (
    ViTConfig, init_params, forward)
from transformer_explainability_tpu.parallel.pipeline import (
    make_pipeline_mesh, make_pp_forward_fn, make_pp_train_step,
    shard_params_pipeline, init_pp_train_state, vit_pipeline_pspecs)
from transformer_explainability_tpu import train as train_mod

CFG = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=4,
                num_heads=4, num_classes=10)


def _batch(B, seed=0):
    rng = np.random.RandomState(seed)
    imgs = jnp.asarray(rng.randn(B, 3, 32, 32).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, CFG.num_classes, B), jnp.int32)
    return imgs, labels


def _single_logits(params, imgs):
    with jax.default_matmul_precision("float32"):
        return np.asarray(jax.vmap(lambda im: forward(params, im, CFG))(imgs))


@pytest.mark.parametrize("n_data,n_stage,micro", [(2, 4, None),  # M = n_stage
                                                  (2, 2, 4),     # M > n_stage
                                                  (1, 4, 8)])    # deep queue
def test_pp_forward_matches_single(n_data, n_stage, micro):
    params = init_params(jax.random.PRNGKey(0), CFG)
    imgs, _ = _batch(8)
    want = _single_logits(params, imgs)

    mesh = make_pipeline_mesh(n_data=n_data, n_stage=n_stage)
    sp = shard_params_pipeline(params, mesh, CFG)
    fn = make_pp_forward_fn(CFG, mesh, microbatches=micro,
                            matmul_precision="float32")
    got = np.asarray(fn(sp, imgs))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_pp_forward_no_remat_matches():
    params = init_params(jax.random.PRNGKey(1), CFG)
    imgs, _ = _batch(8, seed=1)
    want = _single_logits(params, imgs)
    mesh = make_pipeline_mesh(n_data=2, n_stage=4)
    sp = shard_params_pipeline(params, mesh, CFG)
    fn = make_pp_forward_fn(CFG, mesh, matmul_precision="float32",
                            remat=False)
    np.testing.assert_allclose(np.asarray(fn(sp, imgs)), want,
                               rtol=2e-5, atol=1e-6)


def test_pp_train_step_matches_single_device():
    """One PP train step == one single-device train step: same loss, same
    updated parameters. SGD — linear in the gradients — so the comparison
    is scale-sensitive: it catches the check_vma=False psum-transpose
    n_stage factor that Adam's (scale-invariant) first step hides."""
    opt = optax.sgd(1e-2)
    imgs, labels = _batch(8, seed=2)

    # single-device reference
    params0 = init_params(jax.random.PRNGKey(2), CFG)
    ref_step = train_mod.make_train_step(CFG, opt,
                                         matmul_precision="float32")
    ref_params, _, ref_loss = ref_step(params0, opt.init(params0),
                                       imgs, labels)

    mesh = make_pipeline_mesh(n_data=2, n_stage=4)
    pp_params, pp_opt = init_pp_train_state(jax.random.PRNGKey(2), CFG,
                                            opt, mesh)
    step = make_pp_train_step(CFG, opt, mesh, matmul_precision="float32")
    pp_params, pp_opt, pp_loss = step(pp_params, pp_opt, imgs, labels)

    np.testing.assert_allclose(float(pp_loss), float(ref_loss),
                               rtol=1e-5, atol=1e-6)
    flat_ref = jax.tree_util.tree_leaves(ref_params)
    flat_pp = jax.tree_util.tree_leaves(jax.device_get(pp_params))
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=2e-5)


def test_pp_train_loss_decreases():
    opt = train_mod.make_optimizer(lr=1e-2)
    mesh = make_pipeline_mesh(n_data=2, n_stage=2)
    params, opt_state = init_pp_train_state(jax.random.PRNGKey(3), CFG,
                                            opt, mesh)
    step = make_pp_train_step(CFG, opt, mesh, microbatches=2,
                              matmul_precision="float32")
    imgs, labels = _batch(8, seed=3)
    losses = []
    for _ in range(4):
        params, opt_state, loss = step(params, opt_state, imgs, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("n_data,n_stage,micro", [(2, 4, None),  # M = n_stage
                                                  (2, 2, 4)])    # M > n_stage
def test_pp_explain_matches_single(n_data, n_stage, micro):
    """Pipeline-parallel transformer_attribution == single-device
    explain_single: the reverse ring is a pure re-scheduling of the same
    relprop math, so heatmaps must match for any (n_stage, M) schedule.
    Mixed indices exercise both the fixed-class and argmax seed paths."""
    from transformer_explainability_tpu.explain.generator import explain_single
    from transformer_explainability_tpu.parallel.pipeline import (
        make_pp_explain_fn)

    params = init_params(jax.random.PRNGKey(4), CFG)
    imgs, _ = _batch(8, seed=4)
    idx = jnp.asarray([3, -1, 0, 7, -1, 5, 1, -1], jnp.int32)
    want = np.asarray(jax.vmap(
        lambda im, ix: explain_single(params, im, ix, CFG,
                                      method="transformer_attribution")
    )(imgs, idx))

    mesh = make_pipeline_mesh(n_data=n_data, n_stage=n_stage)
    sp = shard_params_pipeline(params, mesh, CFG)
    fn = make_pp_explain_fn(CFG, mesh, microbatches=micro,
                            matmul_precision="float32")
    got = np.asarray(fn(sp, imgs, idx))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)


def test_pp_explain_start_layer_and_distilled():
    """start_layer plumbs into the rollout chain; the distilled (DeiT)
    head's two-token seed path works under PP."""
    from transformer_explainability_tpu.explain.generator import explain_single
    from transformer_explainability_tpu.parallel.pipeline import (
        make_pp_explain_fn)

    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=4,
                    num_heads=4, num_classes=10, distilled=True)
    params = init_params(jax.random.PRNGKey(6), cfg)
    rng = np.random.RandomState(6)
    imgs = jnp.asarray(rng.randn(4, 3, 32, 32).astype(np.float32))
    idx = jnp.asarray([2, -1, 4, 1], jnp.int32)
    want = np.asarray(jax.vmap(
        lambda im, ix: explain_single(params, im, ix, cfg, start_layer=1)
    )(imgs, idx))

    mesh = make_pipeline_mesh(n_data=2, n_stage=2)
    sp = shard_params_pipeline(params, mesh, cfg)
    fn = make_pp_explain_fn(cfg, mesh, start_layer=1,
                            matmul_precision="float32")
    np.testing.assert_allclose(np.asarray(fn(sp, imgs, idx)), want,
                               rtol=2e-4, atol=1e-7)


def test_pp_pspecs_cover_param_tree():
    """Every param leaf has a spec (incl. the distilled variants)."""
    for distilled in (False, True):
        cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                        num_heads=4, num_classes=10, distilled=distilled)
        params = init_params(jax.random.PRNGKey(0), cfg)
        specs = vit_pipeline_pspecs(cfg)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(
                    jax.tree.map(lambda s: 0, specs,
                                 is_leaf=lambda x: hasattr(x, "_normalized_spec")
                                 or type(x).__name__ == "PartitionSpec")))


def test_pp_forward_distilled_matches_single():
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                    num_heads=4, num_classes=10, distilled=True)
    params = init_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.randn(4, 3, 32, 32).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        want = np.asarray(jax.vmap(lambda im: forward(params, im, cfg))(imgs))
    mesh = make_pipeline_mesh(n_data=2, n_stage=2)
    sp = shard_params_pipeline(params, mesh, cfg)
    fn = make_pp_forward_fn(cfg, mesh, matmul_precision="float32")
    np.testing.assert_allclose(np.asarray(fn(sp, imgs)), want,
                               rtol=2e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# BERT PP
# ---------------------------------------------------------------------------

from transformer_explainability_tpu.models import bert as bert_mod
from transformer_explainability_tpu.models.bert import BertConfig
from transformer_explainability_tpu.parallel.pipeline import (
    make_pp_bert_forward_fn, make_pp_bert_train_step,
    shard_bert_params_pipeline)

BCFG = BertConfig(vocab_size=64, hidden_size=32, num_layers=4, num_heads=4,
                  intermediate_size=64, max_position_embeddings=32,
                  num_labels=3)


def _bert_batch(B, S=16, seed=0):
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(0, BCFG.vocab_size, (B, S)), jnp.int32)
    mask = np.ones((B, S), np.float32)
    mask[0, S // 2:] = 0                      # one ragged row
    labels = jnp.asarray(rng.randint(0, BCFG.num_labels, B), jnp.int32)
    return ids, jnp.asarray(mask), labels


def test_pp_bert_forward_matches_single():
    params = bert_mod.init_params(jax.random.PRNGKey(0), BCFG)
    ids, mask, _ = _bert_batch(8)
    with jax.default_matmul_precision("float32"):
        want = np.asarray(jax.vmap(
            lambda i, m: bert_mod.forward(params, i, m, BCFG))(ids, mask))
    mesh = make_pipeline_mesh(n_data=2, n_stage=4)
    sp = shard_bert_params_pipeline(params, mesh, BCFG)
    fn = make_pp_bert_forward_fn(BCFG, mesh, matmul_precision="float32")
    np.testing.assert_allclose(np.asarray(fn(sp, ids, mask)), want,
                               rtol=2e-5, atol=1e-6)


def test_pp_bert_train_step_matches_single_device():
    # SGD: linear in the gradients, so the comparison tests the pipeline
    # gradient itself (Adam's g/(sqrt(v)+eps) amplifies f32 rounding on
    # near-zero grads into O(1e-2) update differences)
    opt = optax.sgd(1e-2)
    ids, mask, labels = _bert_batch(8, seed=2)
    params0 = bert_mod.init_params(jax.random.PRNGKey(2), BCFG)

    def loss_fn(p):
        with jax.default_matmul_precision("float32"):
            logits = jax.vmap(
                lambda i, m: bert_mod.forward(p, i, m, BCFG))(ids, mask)
        return train_mod.cross_entropy(logits, labels)

    loss_ref, grads = jax.value_and_grad(loss_fn)(params0)
    updates, _ = opt.update(grads, opt.init(params0), params0)
    ref_params = optax.apply_updates(params0, updates)

    mesh = make_pipeline_mesh(n_data=2, n_stage=2)
    sp = shard_bert_params_pipeline(params0, mesh, BCFG)
    step = make_pp_bert_train_step(BCFG, opt, mesh, microbatches=2,
                                   matmul_precision="float32")
    pp_params, _, pp_loss = step(sp, opt.init(sp), ids, mask, labels)
    np.testing.assert_allclose(float(pp_loss), float(loss_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(pp_params)),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=2e-5)
