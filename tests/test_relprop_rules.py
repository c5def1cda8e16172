"""Unit tests for the LRP rule library.

Two kinds of checks:
  1. Parity vs. the PyTorch reference rules (``modules/layers_ours.py`` /
     ``modules/layers_lrp.py``) on random tensors — the reference modules are
     imported (not copied) and used as the oracle.
  2. Intrinsic invariants (conservation where the rule promises it, shapes).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.ops import relprop as rp
from tests.conftest import requires_reference

jax.config.update("jax_enable_x64", False)

RNG = np.random.RandomState(0)


def t(x):
    import torch
    return torch.tensor(np.asarray(x), dtype=torch.float32, requires_grad=True)


def close(a, b, rtol=1e-5, atol=1e-6):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# safe_divide
# ---------------------------------------------------------------------------

@requires_reference
def test_safe_divide_parity():
    from modules.layers_ours import safe_divide as ref_sd
    b = np.concatenate([RNG.randn(100).astype(np.float32),
                        np.zeros(5, np.float32),
                        np.full(3, 1e-12, np.float32),
                        np.full(3, -1e-9, np.float32)])
    a = RNG.randn(*b.shape).astype(np.float32)
    ours = rp.safe_divide(jnp.asarray(a), jnp.asarray(b))
    theirs = ref_sd(t(a), t(b)).detach().numpy()
    close(ours, theirs)


# ---------------------------------------------------------------------------
# Add
# ---------------------------------------------------------------------------

@requires_reference
@pytest.mark.parametrize("variant,mod", [("ours", "modules.layers_ours"),
                                         ("lrp", "modules.layers_lrp")])
def test_add_parity(variant, mod):
    import importlib
    layers = importlib.import_module(mod)
    a = RNG.randn(7, 11).astype(np.float32)
    b = RNG.randn(7, 11).astype(np.float32)
    R = RNG.randn(7, 11).astype(np.float32)

    m = layers.Add()
    Z = m([t(a), t(b)])
    ra, rb = m.relprop(t(R), alpha=1)

    ja, jb = rp.add_relprop(jnp.asarray(a), jnp.asarray(b), jnp.asarray(R),
                            variant=variant)
    close(ja, ra.detach().numpy())
    close(jb, rb.detach().numpy())


def test_add_ours_conserves_total():
    a = jnp.asarray(RNG.randn(5, 6).astype(np.float32))
    b = jnp.asarray(RNG.randn(5, 6).astype(np.float32))
    R = jnp.asarray(RNG.rand(5, 6).astype(np.float32))
    ra, rb = rp.add_relprop(a, b, R, variant="ours")
    # "ours" renormalizes so the branch totals sum to R.sum()
    close(ra.sum() + rb.sum(), R.sum(), rtol=1e-4)


# ---------------------------------------------------------------------------
# Linear α-β
# ---------------------------------------------------------------------------

@requires_reference
@pytest.mark.parametrize("variant,mod", [("ours", "modules.layers_ours"),
                                         ("lrp", "modules.layers_lrp")])
def test_linear_parity(variant, mod):
    import importlib
    import torch
    layers = importlib.import_module(mod)
    x = RNG.randn(9, 16).astype(np.float32)
    R = RNG.randn(9, 24).astype(np.float32)

    m = layers.Linear(16, 24)
    with torch.no_grad():
        w = m.weight.detach().numpy().copy()   # (out, in)
    _ = m(t(x))
    ref = m.relprop(t(R), alpha=1).detach().numpy()

    ours = rp.linear_alphabeta(jnp.asarray(x), jnp.asarray(w.T),
                               jnp.asarray(R), alpha=1.0, variant=variant)
    close(ours, ref, rtol=1e-4, atol=1e-5)


@requires_reference
def test_linear_alpha2_parity():
    """alpha=2/beta=1 exercises the inhibitor branch."""
    import torch
    from modules import layers_ours as layers
    x = RNG.randn(5, 8).astype(np.float32)
    R = RNG.randn(5, 12).astype(np.float32)
    m = layers.Linear(8, 12)
    with torch.no_grad():
        w = m.weight.detach().numpy().copy()
    _ = m(t(x))
    ref = m.relprop(t(R), alpha=2).detach().numpy()
    ours = rp.linear_alphabeta(jnp.asarray(x), jnp.asarray(w.T),
                               jnp.asarray(R), alpha=2.0, variant="ours")
    close(ours, ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# einsum (attention matmuls), matmul, mul
# ---------------------------------------------------------------------------

@requires_reference
def test_einsum_qk_parity():
    from modules.layers_ours import einsum as ref_einsum
    h, n, d = 3, 5, 4
    q = RNG.randn(1, h, n, d).astype(np.float32)
    k = RNG.randn(1, h, n, d).astype(np.float32)
    R = RNG.randn(1, h, n, n).astype(np.float32)

    m = ref_einsum('bhid,bhjd->bhij')
    _ = m([t(q), t(k)])
    rq, rk = m.relprop(t(R), alpha=1)

    jq, jk = rp.einsum_qk_relprop(jnp.asarray(q[0]), jnp.asarray(k[0]),
                                  jnp.asarray(R[0]))
    close(jq, rq.detach().numpy()[0])
    close(jk, rk.detach().numpy()[0])


@requires_reference
def test_einsum_av_parity():
    from modules.layers_ours import einsum as ref_einsum
    h, n, d = 3, 5, 4
    a = np.abs(RNG.randn(1, h, n, n)).astype(np.float32)
    v = RNG.randn(1, h, n, d).astype(np.float32)
    R = RNG.randn(1, h, n, d).astype(np.float32)

    m = ref_einsum('bhij,bhjd->bhid')
    _ = m([t(a), t(v)])
    ra, rv = m.relprop(t(R), alpha=1)

    ja, jv = rp.einsum_av_relprop(jnp.asarray(a[0]), jnp.asarray(v[0]),
                                  jnp.asarray(R[0]))
    close(ja, ra.detach().numpy()[0])
    close(jv, rv.detach().numpy()[0])


@requires_reference
def test_matmul_mul_parity():
    import sys
    sys.path.insert(0, "/root/reference")
    from BERT_explainability.modules.layers_ours import MatMul, Mul
    a = RNG.randn(2, 4, 5).astype(np.float32)
    b = RNG.randn(2, 5, 3).astype(np.float32)
    R = RNG.randn(2, 4, 3).astype(np.float32)
    m = MatMul()
    _ = m([t(a), t(b)])
    ra, rb = m.relprop(t(R), alpha=1)
    ja, jb = rp.matmul_relprop(jnp.asarray(a), jnp.asarray(b), jnp.asarray(R))
    close(ja, ra.detach().numpy())
    close(jb, rb.detach().numpy())

    c = RNG.randn(2, 4, 5).astype(np.float32)
    d = RNG.randn(2, 4, 5).astype(np.float32)
    Rm = RNG.randn(2, 4, 5).astype(np.float32)
    mm = Mul()
    _ = mm([t(c), t(d)])
    rc, rd = mm.relprop(t(Rm), alpha=1)
    jc, jd = rp.mul_relprop(jnp.asarray(c), jnp.asarray(d), jnp.asarray(Rm))
    close(jc, rc.detach().numpy())
    close(jd, rd.detach().numpy())


# ---------------------------------------------------------------------------
# Clone / IndexSelect / Cat / AddEye
# ---------------------------------------------------------------------------

@requires_reference
def test_clone_parity():
    from modules.layers_ours import Clone
    x = RNG.randn(6, 7).astype(np.float32)
    R1 = RNG.randn(6, 7).astype(np.float32)
    R2 = RNG.randn(6, 7).astype(np.float32)
    m = Clone()
    _ = m(t(x), 2)
    ref = m.relprop((t(R1), t(R2)), alpha=1).detach().numpy()
    ours = rp.clone_relprop(jnp.asarray(x), [jnp.asarray(R1), jnp.asarray(R2)])
    close(ours, ref)


@requires_reference
def test_index_select_parity():
    import torch
    from modules.layers_ours import IndexSelect
    x = RNG.randn(1, 9, 4).astype(np.float32)
    R = RNG.randn(1, 1, 4).astype(np.float32)
    m = IndexSelect()
    _ = m(t(x), 1, torch.tensor(0))
    ref = m.relprop(t(R), alpha=1).detach().numpy()
    ours = rp.index_select_relprop(jnp.asarray(x), 1, jnp.asarray(0),
                                   jnp.asarray(R))
    close(ours, ref)


@requires_reference
def test_cat_parity():
    from modules.layers_ours import Cat
    a = RNG.randn(2, 3, 4).astype(np.float32)
    b = RNG.randn(2, 5, 4).astype(np.float32)
    R = RNG.randn(2, 8, 4).astype(np.float32)
    m = Cat()
    _ = m([t(a), t(b)], 1)
    ra, rb = m.relprop(t(R), alpha=1)
    ja, jb = rp.cat_relprop([jnp.asarray(a), jnp.asarray(b)], 1, jnp.asarray(R))
    close(ja, ra.detach().numpy())
    close(jb, rb.detach().numpy())


@requires_reference
def test_add_eye_parity():
    from modules.layers_ours import AddEye
    x = RNG.randn(2, 3, 5, 5).astype(np.float32)
    R = RNG.randn(2, 3, 5, 5).astype(np.float32)
    m = AddEye()
    _ = m(t(x))
    ref = m.relprop(t(R), alpha=1).detach().numpy()
    ours = rp.zrule(lambda y: y + jnp.eye(5, dtype=y.dtype),
                    [jnp.asarray(x)], jnp.asarray(R))
    close(ours, ref)


# ---------------------------------------------------------------------------
# Patch-conv z^B  (the full-LRP input rule)
# ---------------------------------------------------------------------------

@requires_reference
def test_conv_patch_zB_parity():
    import torch
    from modules.layers_ours import Conv2d
    patch, emb = 4, 6
    img = RNG.randn(1, 3, 8, 8).astype(np.float32)
    R = RNG.randn(1, emb, 2, 2).astype(np.float32)

    m = Conv2d(3, emb, kernel_size=patch, stride=patch)
    with torch.no_grad():
        w = m.weight.detach().numpy().copy()   # (emb, 3, p, p)
    _ = m(t(img))
    ref = m.relprop(t(R), alpha=1).detach().numpy()

    w_lin = w.reshape(emb, -1).T               # (3*p*p, emb), channel-major
    # torch R layout (emb, gh, gw) -> (P, emb)
    R_lin = R[0].reshape(emb, -1).T
    ours = rp.conv_patch_zB_relprop(jnp.asarray(img[0]), jnp.asarray(w_lin),
                                    jnp.asarray(R_lin), patch)
    close(ours, ref[0], rtol=1e-4, atol=1e-5)


def test_patchify_roundtrip():
    img = jnp.asarray(RNG.randn(3, 16, 16).astype(np.float32))
    p = rp.patchify(img, 4)
    back = rp.unpatchify(p, 4, 3, 16, 16)
    close(back, img)


# ---------------------------------------------------------------------------
# Rollout
# ---------------------------------------------------------------------------

@requires_reference
def test_rollout_parity():
    import torch
    import importlib
    vit = importlib.import_module("baselines.ViT.ViT_LRP")
    L, n = 4, 7
    cams = np.abs(RNG.randn(L, n, n)).astype(np.float32)
    ref = vit.compute_rollout_attention(
        [torch.tensor(cams[i:i + 1]) for i in range(L)], start_layer=1).numpy()
    ours = rp.compute_rollout(jnp.asarray(cams), start_layer=1)
    close(ours, ref[0], rtol=1e-4, atol=1e-5)


@requires_reference
def test_rollout_rownorm_parity():
    """BERT-side rollout row-normalizes (BERT.py:28-39)."""
    import torch
    import importlib
    bert = importlib.import_module("BERT_explainability.modules.BERT.BERT")
    L, n = 3, 5
    cams = np.abs(RNG.randn(L, n, n)).astype(np.float32) + 0.1
    ref = bert.compute_rollout_attention(
        [torch.tensor(cams[i:i + 1]) for i in range(L)], start_layer=0).numpy()
    ours = rp.compute_rollout(jnp.asarray(cams), start_layer=0,
                              row_normalize=True)
    close(ours, ref[0], rtol=1e-4, atol=1e-5)
