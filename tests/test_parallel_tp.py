"""Tensor-parallel (head-sharded, Megatron-MLP) explain vs the dense path,
on the virtual 8-device CPU mesh (conftest). The TP program runs the Pallas
attention cores per head shard (jnp fallback on CPU — same math), with
explicit psums at the Megatron merges."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.models.vit import ViTConfig, init_params
from transformer_explainability_tpu.explain.generator import make_explain_fn
from transformer_explainability_tpu.parallel.mesh import make_mesh
from transformer_explainability_tpu.parallel.tensor import (
    make_tp_explain_fn, tp_reshuffle_params, shard_tp_params)

CFG = ViTConfig(img_size=32, patch_size=16, embed_dim=24, depth=3,
                num_heads=4, num_classes=10)


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(7)
    imgs = jnp.asarray(rng.randn(4, 3, 32, 32).astype(np.float32))
    idx = jnp.asarray([3, -1, 0, 9], jnp.int32)
    dense = make_explain_fn(CFG, method="transformer_attribution")
    want = np.asarray(dense(params, imgs, idx))
    return params, imgs, idx, want


@pytest.mark.parametrize("n_data,n_model", [(2, 2), (1, 4), (4, 2)])
def test_tp_explain_matches_dense(setup, n_data, n_model):
    params, imgs, idx, want = setup
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    fn = make_tp_explain_fn(CFG, mesh)
    got = np.asarray(fn(params, imgs, idx))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)


def test_tp_explain_pre_sharded(setup):
    params, imgs, idx, want = setup
    mesh = make_mesh(n_data=2, n_model=2)
    placed = shard_tp_params(params, mesh, CFG)
    fn = make_tp_explain_fn(CFG, mesh, pre_sharded=True)
    got = np.asarray(fn(placed, imgs, idx))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)


def test_tp_reshuffle_roundtrip():
    """The reshuffled qkv columns, re-gathered shard by shard, reproduce the
    original layout's per-head q/k/v groups."""
    params = init_params(jax.random.PRNGKey(1), CFG)
    k = 2
    resh = tp_reshuffle_params(params, k)
    w = np.asarray(params["blocks"]["qkv"]["kernel"])   # (L, D, 3D)
    wr = np.asarray(resh["blocks"]["qkv"]["kernel"])
    L, D, _ = w.shape
    h, d = CFG.num_heads, CFG.head_dim
    w5 = w.reshape(L, D, 3, h, d)
    wr_blocks = wr.reshape(L, D, k, 3, h // k, d)
    for j in range(k):
        for q in range(3):
            np.testing.assert_array_equal(
                wr_blocks[:, :, j, q],
                w5[:, :, q, j * (h // k):(j + 1) * (h // k)])


def test_mesh_routes_tp_to_kernel_path(setup):
    """make_sharded_explain_fn with a model axis now routes the headline
    method through the TP shard_map path (kernels composable) and matches
    the dense result."""
    from transformer_explainability_tpu.parallel.mesh import (
        make_sharded_explain_fn, shard_params)
    params, imgs, idx, want = setup
    mesh = make_mesh(n_data=2, n_model=2)
    fn = make_sharded_explain_fn(CFG, mesh)
    got = np.asarray(fn(params, imgs, idx))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)


def test_tp_precision_islands_thread_through(setup):
    """The production precision islands (bf16 rules/MLP, f32 attention)
    must build and stay numerically exact on CPU (where every MXU
    'precision' is exact f32 — the knobs select TPU pass counts only)."""
    params, imgs, idx, want = setup
    mesh = make_mesh(n_data=2, n_model=2)
    fn = make_tp_explain_fn(CFG, mesh,
                            matmul_precision="tensorfloat32",
                            attn_precision="float32",
                            relprop_precision="bfloat16",
                            mlp_precision="bfloat16")
    got = np.asarray(fn(params, imgs, idx))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)


def test_mesh_forwards_island_knobs_to_tp(setup):
    """make_sharded_explain_fn must not drop relprop/mlp precision when
    routing to the TP program (the round-4 cliff's silent half)."""
    params, imgs, idx, want = setup
    from transformer_explainability_tpu.parallel.mesh import (
        make_sharded_explain_fn)
    mesh = make_mesh(n_data=2, n_model=2)
    fn = make_sharded_explain_fn(CFG, mesh,
                                 matmul_precision="tensorfloat32",
                                 attn_precision="float32",
                                 relprop_precision="bfloat16",
                                 mlp_precision="bfloat16")
    got = np.asarray(fn(params, imgs, idx))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)


def test_tp_mlp_kernel_composition_matches_dense(setup):
    """The TP MLP kernel composition (phase1/psum/phase2 split) is the same
    math re-associated: force it on at exact f32 (CPU jnp fallbacks) and
    compare against the dense single-device program."""
    params, imgs, idx, want = setup
    mesh = make_mesh(n_data=2, n_model=2)
    fn = make_tp_explain_fn(CFG, mesh, mlp_kernel=True)
    got = np.asarray(fn(params, imgs, idx))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)


def test_tp_rich_anchors_matches(setup):
    """The rich-anchor forward (saved qkv_pre/proj_pre consumed by the
    reverse) is the same math as the default recompute path."""
    params, imgs, idx, want = setup
    mesh = make_mesh(n_data=2, n_model=2)
    fn = make_tp_explain_fn(CFG, mesh, rich_anchors=True)
    np.testing.assert_allclose(np.asarray(fn(params, imgs, idx)), want,
                               rtol=2e-4, atol=1e-7)
