"""Pallas fused rollout kernel: parity vs the jnp reference path
(interpret mode on CPU; the real TPU path is exercised by bench/verify)."""

import numpy as np
import jax.numpy as jnp
import pytest

from transformer_explainability_tpu.ops import relprop as rp
from transformer_explainability_tpu.ops.pallas_kernels import (
    rollout_from_grad_cam)


def _ref(cams, grads, start_layer, row_normalize):
    m = cams if grads is None else grads * cams
    m = jnp.clip(m, min=0).mean(axis=1)
    return rp.compute_rollout(m, start_layer, row_normalize=row_normalize)


@pytest.mark.parametrize("start_layer", [0, 1])
@pytest.mark.parametrize("row_normalize", [False, True])
@pytest.mark.parametrize("with_grads", [True, False])
def test_rollout_kernel_parity(start_layer, row_normalize, with_grads):
    rng = np.random.RandomState(0)
    L, h, n = 4, 3, 37          # n deliberately lane-unaligned
    cams = jnp.asarray(rng.randn(L, h, n, n).astype(np.float32))
    grads = (jnp.asarray(rng.randn(L, h, n, n).astype(np.float32))
             if with_grads else None)
    want = np.asarray(_ref(cams, grads, start_layer, row_normalize))
    got = np.asarray(rollout_from_grad_cam(
        cams, grads, start_layer, row_normalize,
        use_pallas=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rollout_kernel_fallback_matches():
    rng = np.random.RandomState(1)
    cams = jnp.asarray(rng.randn(3, 2, 17, 17).astype(np.float32))
    grads = jnp.asarray(rng.randn(3, 2, 17, 17).astype(np.float32))
    a = np.asarray(rollout_from_grad_cam(cams, grads, use_pallas=False))
    b = np.asarray(rollout_from_grad_cam(cams, grads, use_pallas=True,
                                         interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Fused attention-core kernels (forward + reverse).
# ---------------------------------------------------------------------------

def _rand_qkv(rng, n, h, d):
    return (jnp.asarray(rng.randn(n, 3 * h * d).astype(np.float32)),
            jnp.asarray(rng.randn(n, h * d).astype(np.float32)),
            jnp.asarray(rng.randn(n, h * d).astype(np.float32)))


def test_attn_fwd_core_interpret_matches_jnp():
    from transformer_explainability_tpu.ops.pallas_kernels import (
        attn_fwd_core, _attn_fwd_core_jnp)
    rng = np.random.RandomState(2)
    n, h, d = 29, 3, 8                     # lane-unaligned on purpose
    qkv, _, _ = _rand_qkv(rng, n, h, d)
    want = np.asarray(_attn_fwd_core_jnp(qkv, h, d, d ** -0.5))
    got = np.asarray(attn_fwd_core(qkv, h, d, d ** -0.5,
                                   use_pallas=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_attn_rev_core_interpret_matches_jnp():
    """f64 comparison: the safe-divide chains amplify 1-ulp softmax
    differences between the interpret-mode kernel and the einsum path to
    ~1e-3 in f32 (pure reassociation chaos); f64 pins semantics tightly."""
    import jax
    from transformer_explainability_tpu.ops.pallas_kernels import (
        attn_rev_core, _attn_rev_core_jnp)
    jax.config.update("jax_enable_x64", True)
    try:
        import jax.numpy as jnp64
        rng = np.random.RandomState(3)
        n, h, d = 29, 3, 8
        qkv = jnp64.asarray(rng.randn(n, 3 * h * d))
        g_o = jnp64.asarray(rng.randn(n, h * d))
        cam_o = jnp64.asarray(rng.randn(n, h * d))
        want = _attn_rev_core_jnp(qkv, g_o, cam_o, h, d, d ** -0.5)
        got = attn_rev_core(qkv, g_o, cam_o, h, d, d ** -0.5,
                            use_pallas=True, interpret=True)
        for g, w, name in zip(got, want, ["g_qkv", "cam_qkv", "gc"]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-9, atol=1e-12, err_msg=name)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_attn_rev_core_jnp_matches_rule_library():
    """The fused core must equal composing the repo's own building blocks:
    block_backward's attention fragment + einsum_av/qk z-rules + the
    (grad ⊙ cam)⁺ head-mean (reference ViT_LRP.py:154-177, 358-366)."""
    import jax
    from transformer_explainability_tpu.ops.pallas_kernels import (
        _attn_rev_core_jnp, _split_heads)
    rng = np.random.RandomState(4)
    n, h, d = 17, 2, 4
    qkv, g_o, cam_o = _rand_qkv(rng, n, h, d)
    scale = d ** -0.5

    q, k, v = _split_heads(qkv, h, d)
    go = g_o.reshape(n, h, d).transpose(1, 0, 2)
    co = cam_o.reshape(n, h, d).transpose(1, 0, 2)
    dots = jnp.einsum("hid,hjd->hij", q, k)
    attn = jax.nn.softmax(dots * scale, axis=-1)

    # backward reference: vjp of (q,k,v) -> softmax(qk*scale) @ v at g_o,
    # plus the post-softmax hook gradient
    def f(q, k, v):
        a = jax.nn.softmax(jnp.einsum("hid,hjd->hij", q, k) * scale, axis=-1)
        return jnp.einsum("hij,hjd->hid", a, v)
    _, vjp = jax.vjp(f, q, k, v)
    g_q_ref, g_k_ref, g_v_ref = vjp(go)
    g_attn_ref = jnp.einsum("hid,hjd->hij", go, v)

    # relprop reference: the rule library with the /2 splits
    cam1, cam_v = rp.einsum_av_relprop(attn, v, co)
    cam1, cam_v = cam1 / 2, cam_v / 2
    cam_q, cam_k = rp.einsum_qk_relprop(q, k, cam1)
    cam_q, cam_k = cam_q / 2, cam_k / 2
    gc_ref = jnp.clip(g_attn_ref * cam1, min=0).mean(axis=0)

    def merge3(a, b, c):
        x = jnp.stack([a, b, c], axis=0)
        return x.transpose(2, 0, 1, 3).reshape(n, 3 * h * d)

    g_qkv, cam_qkv, gc = _attn_rev_core_jnp(qkv, g_o, cam_o, h, d, scale)
    np.testing.assert_allclose(np.asarray(g_qkv),
                               np.asarray(merge3(g_q_ref, g_k_ref, g_v_ref)),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam_qkv),
                               np.asarray(merge3(cam_q, cam_k, cam_v)),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_explain_kernel_path_matches_reference_path():
    """explain_single(use_attn_kernel=True) on CPU routes through the fused
    step structure with the jnp fallback cores — must equal the einsum path
    (same math, different op grouping)."""
    import jax
    from transformer_explainability_tpu.models.vit import ViTConfig, init_params
    from transformer_explainability_tpu.explain.generator import explain_single
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=24, depth=3,
                    num_heads=4, num_classes=10)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.randn(3, 32, 32).astype(np.float32))
    for sl in (0, 1):
        a = np.asarray(jax.jit(
            lambda p, x, i: explain_single(p, x, i, cfg, start_layer=sl,
                                           use_attn_kernel=False))(
            params, img, jnp.int32(3)))
        b = np.asarray(jax.jit(
            lambda p, x, i: explain_single(p, x, i, cfg, start_layer=sl,
                                           use_attn_kernel=True))(
            params, img, jnp.int32(3)))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-7)


def test_mlp_rev_core_interpret_matches_jnp():
    """f64 (see the attn_rev_core test note: f32 divide-chain chaos)."""
    import jax
    from transformer_explainability_tpu.ops.pallas_kernels import (
        mlp_rev_core, _mlp_rev_core_jnp)
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.RandomState(6)
        n, D, M = 23, 16, 40
        x_mid = jnp.asarray(rng.randn(n, D))
        g_out = jnp.asarray(rng.randn(n, D))
        R = jnp.asarray(rng.randn(n, D))
        ln = {"scale": jnp.asarray(1 + 0.1 * rng.randn(D)),
              "bias": jnp.asarray(0.1 * rng.randn(D))}
        bp = {"fc1": {"kernel": jnp.asarray(rng.randn(D, M) * 0.2),
                      "bias": jnp.asarray(0.1 * rng.randn(M))},
              "fc2": {"kernel": jnp.asarray(rng.randn(M, D) * 0.2),
                      "bias": jnp.asarray(0.1 * rng.randn(D))}}
        want = _mlp_rev_core_jnp(x_mid, g_out, R, ln, bp, 1e-6, "ours", 1.0)
        got = mlp_rev_core(x_mid, g_out, R, ln, bp, 1e-6,
                           use_pallas=True, interpret=True)
        for g, w, name in zip(got, want, ["g_mid", "R_mid"]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-9, atol=1e-12, err_msg=name)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_mlp_rev_core_chunked_matches_one_shot():
    """The M-chunked form (f32-HIGHEST's VMEM-fitting path) is the same
    math as the one-shot kernel, re-associated: f64 interpret, tight tol
    (only the chunk-sum reassociation differs)."""
    import jax
    from transformer_explainability_tpu.ops.pallas_kernels import mlp_rev_core
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.RandomState(9)
        n, D, M = 19, 16, 40
        x_mid = jnp.asarray(rng.randn(n, D))
        g_out = jnp.asarray(rng.randn(n, D))
        R = jnp.asarray(rng.randn(n, D))
        ln = {"scale": jnp.asarray(1 + 0.1 * rng.randn(D)),
              "bias": jnp.asarray(0.1 * rng.randn(D))}
        bp = {"fc1": {"kernel": jnp.asarray(rng.randn(D, M) * 0.2),
                      "bias": jnp.asarray(0.1 * rng.randn(M))},
              "fc2": {"kernel": jnp.asarray(rng.randn(M, D) * 0.2),
                      "bias": jnp.asarray(0.1 * rng.randn(D))}}
        kw = dict(use_pallas=True, interpret=True)
        want = mlp_rev_core(x_mid, g_out, R, ln, bp, 1e-6, m_chunks=0, **kw)
        for mc in (2, 4, 5):
            got = mlp_rev_core(x_mid, g_out, R, ln, bp, 1e-6, m_chunks=mc,
                               **kw)
            for g, w, name in zip(got, want, ["g_mid", "R_mid"]):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                           rtol=1e-9, atol=1e-12,
                                           err_msg=f"mc={mc} {name}")
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_mlp_rev_core_jnp_matches_fused_step():
    """The jnp fallback must equal the exact ops of the non-kernel fused
    step (block_backward MLP half + the rule library) on random f32 data."""
    import jax
    from transformer_explainability_tpu.ops.pallas_kernels import (
        _mlp_rev_core_jnp)
    from transformer_explainability_tpu.models import vit as vit_mod
    cfg = vit_mod.ViTConfig(img_size=32, patch_size=16, embed_dim=16,
                            depth=1, num_heads=2, num_classes=4)
    params = vit_mod.init_params(jax.random.PRNGKey(2), cfg)
    bp = jax.tree.map(lambda a: a[0], params["blocks"])
    rng = np.random.RandomState(7)
    n = cfg.num_tokens
    x_mid = jnp.asarray(rng.randn(n, cfg.embed_dim).astype(np.float32))
    g_out = jnp.asarray(rng.randn(n, cfg.embed_dim).astype(np.float32))
    R = jnp.asarray(rng.randn(n, cfg.embed_dim).astype(np.float32))

    g_mid, Rm = _mlp_rev_core_jnp(x_mid, g_out, R, bp["norm2"], bp,
                                  cfg.block_ln_eps, "ours", 1.0)

    # reference composition
    acts = vit_mod._block_acts_from_anchors(x_mid * 0, x_mid, bp, cfg)
    g_hg = g_out @ bp["fc2"]["kernel"].T
    g_h1 = g_hg * vit_mod._gelu_grad(acts.h1)
    g_xn2 = g_h1 @ bp["fc1"]["kernel"].T
    want_g = g_out + vit_mod._layernorm_bwd(g_xn2, x_mid, bp["norm2"],
                                            cfg.block_ln_eps)
    R1, R2 = rp.add_relprop(x_mid, acts.mlp_out, R, "ours")
    R2 = rp.linear_alphabeta(acts.hg, bp["fc2"]["kernel"], R2, 1.0, "ours",
                             y_pre=acts.mlp_out - bp["fc2"]["bias"])
    R2 = rp.linear_alphabeta(acts.xn2, bp["fc1"]["kernel"], R2, 1.0, "ours",
                             y_pre=acts.h1 - bp["fc1"]["bias"])
    want_R = rp.clone_relprop(x_mid, [R1, R2])
    np.testing.assert_allclose(np.asarray(g_mid), np.asarray(want_g),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Rm), np.asarray(want_R),
                               rtol=2e-3, atol=1e-6)


def test_kernel_erf_matches_lax_erf():
    """The in-kernel rational-polynomial erf (Mosaic has no erf lowering)
    must track jax.lax.erf to a few f32 ulps over the relevant range."""
    import jax
    from transformer_explainability_tpu.ops.pallas_kernels import _kerf
    x = jnp.asarray(np.linspace(-6, 6, 100001).astype(np.float32))
    np.testing.assert_allclose(np.asarray(_kerf(x)),
                               np.asarray(jax.lax.erf(x)), atol=1e-6)


@pytest.mark.slow
def test_block_rev_core_interpret_matches_vit_blocks():
    """The whole-block megakernel == block_backward + _block_relprop_impl +
    the fused grad-cam map, in f64 (interpret mode)."""
    import jax
    from transformer_explainability_tpu.ops.pallas_kernels import block_rev_core
    from transformer_explainability_tpu.models import vit as vit_mod
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = vit_mod.ViTConfig(img_size=32, patch_size=16, embed_dim=24,
                                depth=1, num_heads=4, num_classes=4)
        params = jax.tree.map(
            lambda a: a.astype(jnp.float64),
            vit_mod.init_params(jax.random.PRNGKey(3), cfg))
        bp = jax.tree.map(lambda a: a[0], params["blocks"])
        rng = np.random.RandomState(8)
        n, D = cfg.num_tokens, cfg.embed_dim
        x_in = jnp.asarray(rng.randn(n, D))
        x_mid, _, acts = vit_mod._block_acts(x_in, bp, cfg)
        g_out = jnp.asarray(rng.randn(n, D))
        R = jnp.asarray(rng.randn(n, D))

        want_g, want_gtap = vit_mod.block_backward(g_out, x_in, x_mid, acts,
                                                   bp, cfg)
        want_R, attn_cam, _ = vit_mod._block_relprop_impl(
            R, x_in, x_mid, bp, cfg, 1.0, "ours", acts=acts)
        want_gc = jnp.clip(want_gtap * attn_cam, min=0).mean(axis=0)

        got_g, got_R, got_gc = block_rev_core(
            x_in, x_mid, acts.out_merged, g_out, R, bp,
            cfg.num_heads, cfg.head_dim, cfg.block_ln_eps,
            mxu="float32", attn_mxu="float32", rule_mxu="float32",
            use_pallas=True, interpret=True)
        for g, w, name in [(got_g, want_g, "g_in"), (got_R, want_R, "R_in"),
                           (got_gc, want_gc, "gc")]:
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-9, atol=1e-12, err_msg=name)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_block_fwd_core_interpret_matches_vit_blocks():
    import jax
    from transformer_explainability_tpu.ops.pallas_kernels import block_fwd_core
    from transformer_explainability_tpu.models import vit as vit_mod
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = vit_mod.ViTConfig(img_size=32, patch_size=16, embed_dim=24,
                                depth=1, num_heads=4, num_classes=4)
        params = jax.tree.map(
            lambda a: a.astype(jnp.float64),
            vit_mod.init_params(jax.random.PRNGKey(4), cfg))
        bp = jax.tree.map(lambda a: a[0], params["blocks"])
        rng = np.random.RandomState(9)
        x = jnp.asarray(rng.randn(cfg.num_tokens, cfg.embed_dim))
        want_mid, want_out, acts = vit_mod._block_acts(x, bp, cfg)
        got_out, got_mid, got_om = block_fwd_core(
            x, bp, cfg.num_heads, cfg.head_dim, cfg.block_ln_eps,
            mxu="float32", attn_mxu="float32",
            use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_mid), np.asarray(want_mid),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_om),
                                   np.asarray(acts.out_merged),
                                   rtol=1e-9, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_kdot_tensorfloat32_precision_sandwich():
    """Emulated tf32 (bf16x3) is far closer to f32 than 1-pass bf16, for
    plain operands and for pre-split (hi, lo) weight pairs alike."""
    from transformer_explainability_tpu.ops.pallas_kernels import (
        _kdot, _split_hi_lo)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(128, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(256, 128).astype(np.float32))
    exact = np.asarray(_kdot(a, w, ((1,), (0,)), "float32"))

    def relerr(y):
        return np.abs(np.asarray(y) - exact).max() / np.abs(exact).max()

    e_tf32 = relerr(_kdot(a, w, ((1,), (0,)), "tensorfloat32"))
    e_pair = relerr(_kdot(a, _split_hi_lo(w), ((1,), (0,)), "tensorfloat32"))
    e_bf16 = relerr(_kdot(a, w, ((1,), (0,)), "bfloat16"))
    assert e_tf32 < 1e-4 and e_pair < 1e-4, (e_tf32, e_pair)
    assert e_bf16 > 20 * max(e_tf32, e_pair)
    # a bf16 dot against a pair uses the hi half == casting the weight
    got = _kdot(a, _split_hi_lo(w), ((1,), (0,)), "bfloat16")
    want = _kdot(a, w, ((1,), (0,)), "bfloat16")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kdot_float32_triple_precision_sandwich():
    """Emulated f32-HIGHEST (bf16×6 with a pre-split (hi, mid, lo) weight
    triple) is ~two orders tighter than emulated tf32, and a triple
    downgrades exactly: its (hi, mid) prefix IS the tf32 pair, its hi IS
    the bf16 cast."""
    from transformer_explainability_tpu.ops.pallas_kernels import (
        _kdot, _split3, _split_hi_lo, _kabs)
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(128, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(256, 128).astype(np.float32))
    exact = np.asarray(_kdot(a, w, ((1,), (0,)), "float32")).astype(np.float64)
    trip = _split3(w)

    def relerr(y):
        return np.abs(np.asarray(y).astype(np.float64) - exact).max() \
            / np.abs(exact).max()

    e_6x = relerr(_kdot(a, trip, ((1,), (0,)), "float32"))
    e_tf32 = relerr(_kdot(a, w, ((1,), (0,)), "tensorfloat32"))
    assert e_6x < 1e-6, e_6x
    assert e_tf32 > 5 * e_6x, (e_tf32, e_6x)
    # the triple reconstructs w exactly (8+8+8 mantissa bits >= f32's 24)
    rec = sum(np.asarray(t.astype(jnp.float32)) for t in trip)
    np.testing.assert_array_equal(rec, np.asarray(w))
    # downgrades: tf32 on a triple == tf32 on the pair; bf16 uses hi alone
    pair = _split_hi_lo(w)
    np.testing.assert_array_equal(
        np.asarray(_kdot(a, trip, ((1,), (0,)), "tensorfloat32")),
        np.asarray(_kdot(a, pair, ((1,), (0,)), "tensorfloat32")))
    np.testing.assert_array_equal(
        np.asarray(_kdot(a, trip, ((1,), (0,)), "bfloat16")),
        np.asarray(_kdot(a, w, ((1,), (0,)), "bfloat16")))
    # triple abs decomposition reconstructs |w| exactly
    arec = sum(np.asarray(t.astype(jnp.float32)) for t in _kabs(trip))
    np.testing.assert_array_equal(arec, np.abs(np.asarray(w)))


@pytest.mark.slow
def test_mlp_rev_core_f32_triple_kernel_close_to_xla():
    """The f32-HIGHEST MLP kernel (triple-split weights, interpret mode, f32
    data) tracks the exact-f32 jnp fallback to f32-class accuracy on the
    gradient side (the relevance side goes through safe_divide chaos, so
    only correlation is asserted)."""
    from transformer_explainability_tpu.ops.pallas_kernels import (
        mlp_rev_core, _mlp_rev_core_jnp)
    rng = np.random.RandomState(11)
    n, D, M = 32, 24, 48
    x_mid = jnp.asarray(rng.randn(n, D).astype(np.float32))
    g_out = jnp.asarray(rng.randn(n, D).astype(np.float32))
    R = jnp.asarray(rng.randn(n, D).astype(np.float32))
    ln = {"scale": jnp.asarray((1 + 0.1 * rng.randn(D)).astype(np.float32)),
          "bias": jnp.asarray((0.1 * rng.randn(D)).astype(np.float32))}
    bp = {"fc1": {"kernel": jnp.asarray(rng.randn(D, M).astype(np.float32) * .2),
                  "bias": jnp.asarray((0.1 * rng.randn(M)).astype(np.float32))},
          "fc2": {"kernel": jnp.asarray(rng.randn(M, D).astype(np.float32) * .2),
                  "bias": jnp.asarray((0.1 * rng.randn(D)).astype(np.float32))}}
    want = _mlp_rev_core_jnp(x_mid, g_out, R, ln, bp, 1e-6, "ours", 1.0)
    for mc in (0, 4):
        got = mlp_rev_core(x_mid, g_out, R, ln, bp, 1e-6, mxu="float32",
                           rule_mxu="float32", use_pallas=True,
                           interpret=True, m_chunks=mc)
        g, wg = np.asarray(got[0]), np.asarray(want[0])
        assert np.abs(g - wg).max() / np.abs(wg).max() < 1e-5
        r, wr = np.asarray(got[1]).ravel(), np.asarray(want[1]).ravel()
        assert np.corrcoef(r, wr)[0, 1] > 0.99


def test_islands_exceed_base_gating():
    """Rule/MLP islands above the base pass precision cannot be served by
    pre-split kernel weights; the explain path must fall back to XLA for
    those combos instead of crashing on _kdot's HIGHEST-pair assert."""
    import jax
    from transformer_explainability_tpu.ops.pallas_kernels import (
        islands_exceed_base)
    from transformer_explainability_tpu.explain.generator import (
        explain_single)
    from transformer_explainability_tpu.models import vit as vit_mod

    assert not islands_exceed_base("tensorfloat32", None, None)
    assert not islands_exceed_base("tensorfloat32", "bfloat16")
    assert islands_exceed_base("tensorfloat32", "float32")
    assert islands_exceed_base("bfloat16", "tensorfloat32", None)
    assert not islands_exceed_base("float32", "float32", "bfloat16")

    # end-to-end: tf32 base + f32 rules on the kernel-structured path
    # (use_attn_kernel=True exercises the same code the TPU runs, with the
    # jnp math fallbacks) — previously AssertionError, now the XLA MLP/rule
    # branch with raw f32 weights
    cfg = vit_mod.ViTConfig(img_size=32, patch_size=16, embed_dim=24,
                            depth=2, num_heads=4, num_classes=5)
    params = vit_mod.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(3, 32, 32).astype(np.float32))
    out = jax.jit(lambda p, im: explain_single(
        p, im, jnp.int32(1), cfg, matmul_precision="tensorfloat32",
        relprop_precision="float32", use_attn_kernel=True))(params, img)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_bert_kernel_gate_respects_hidden_act():
    """Non-GELU BERT configs must not auto-route through the fused kernels
    (they hardcode exact GELU); an explicit use_kernel=True raises."""
    import jax
    from transformer_explainability_tpu.models import bert as bert_mod
    from transformer_explainability_tpu.explain.bert_generator import (
        explain_single)
    cfg = bert_mod.BertConfig(vocab_size=50, hidden_size=24, num_layers=2,
                              num_heads=4, intermediate_size=48,
                              max_position_embeddings=32, num_labels=3,
                              hidden_act="relu")
    params = bert_mod.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 50, (16,)), jnp.int32)
    mask = jnp.ones((16,), jnp.float32)
    # auto-gate: runs the XLA path, finite output
    out = explain_single(params, ids, mask, jnp.int32(0), cfg,
                         matmul_precision="tensorfloat32")
    assert np.isfinite(np.asarray(out)).all()
    # an explicit kernel request on a relu config is clamped to the XLA
    # path (same clamp as non-TA methods) — identical result, never the
    # GELU-hardcoded kernels
    out_k = explain_single(params, ids, mask, jnp.int32(0), cfg,
                           matmul_precision="tensorfloat32", use_kernel=True)
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(out))
    # the model-level kernel entry point itself is guarded
    with pytest.raises(AssertionError, match="GELU"):
        bert_mod.forward_collect(params, ids, mask, cfg, use_kernel=True)


def test_kabs_pair_matches_abs():
    from transformer_explainability_tpu.ops.pallas_kernels import (
        _kabs, _split_hi_lo)
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    hi, lo = _kabs(_split_hi_lo(w))
    # the pair encodes w to ~2x-bf16 (16-bit-mantissa) accuracy; the abs
    # decomposition must reconstruct |w| to the same accuracy (in particular
    # the lo sign flip must be right — a wrong sign costs a full ulp(hi))
    np.testing.assert_allclose(
        np.asarray(hi.astype(jnp.float32) + lo.astype(jnp.float32)),
        np.abs(np.asarray(w)), rtol=2e-5, atol=1e-7)


@pytest.mark.slow
def test_block_rev_core_tf32_interpret_close_to_f32():
    """The tf32 megakernel (paired weights) tracks the exact-f32 unfused
    reverse step to tf32-grade accuracy in interpret mode."""
    import jax
    from transformer_explainability_tpu.ops.pallas_kernels import (
        block_rev_core)
    from transformer_explainability_tpu.models import vit as vit_mod
    cfg = vit_mod.ViTConfig(img_size=32, patch_size=16, embed_dim=24,
                            depth=1, num_heads=4, num_classes=4)
    params = vit_mod.init_params(jax.random.PRNGKey(5), cfg)
    bp = jax.tree.map(lambda a: a[0], params["blocks"])
    rng = np.random.RandomState(11)
    n, D = cfg.num_tokens, cfg.embed_dim
    x_in = jnp.asarray(rng.randn(n, D).astype(np.float32))
    x_mid, _, acts = vit_mod._block_acts(x_in, bp, cfg)
    g_out = jnp.asarray(rng.randn(n, D).astype(np.float32))
    R = jnp.asarray(rng.randn(n, D).astype(np.float32))

    want = block_rev_core(x_in, x_mid, acts.out_merged, g_out, R, bp,
                          cfg.num_heads, cfg.head_dim, cfg.block_ln_eps,
                          mxu="float32", attn_mxu="float32",
                          rule_mxu="float32", use_pallas=True,
                          interpret=True)
    got = block_rev_core(x_in, x_mid, acts.out_merged, g_out, R, bp,
                         cfg.num_heads, cfg.head_dim, cfg.block_ln_eps,
                         mxu="tensorfloat32", attn_mxu="tensorfloat32",
                         rule_mxu="tensorfloat32", use_pallas=True,
                         interpret=True)
    for g, w, name in zip(got, want, ["g_in", "R_in", "gc"]):
        denom = np.abs(np.asarray(w)).max()
        err = np.abs(np.asarray(g) - np.asarray(w)).max() / denom
        assert err < 5e-3, (name, err)


@pytest.mark.slow
def test_block_rev_core_prepared_weights_match_inline():
    """The prepare_block_weights -> ws plumbing (production scan path) is
    numerically identical to in-call weight preparation."""
    import jax
    from transformer_explainability_tpu.ops import pallas_kernels as pk
    from transformer_explainability_tpu.models import vit as vit_mod
    cfg = vit_mod.ViTConfig(img_size=32, patch_size=16, embed_dim=24,
                            depth=2, num_heads=4, num_classes=4)
    params = vit_mod.init_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.RandomState(3)
    n, D = cfg.num_tokens, cfg.embed_dim
    for mxu in ["tensorfloat32", "bfloat16"]:
        prep = pk.prepare_block_weights(params["blocks"], mxu)
        for i in range(cfg.depth):
            bp = jax.tree.map(lambda a: a[i], params["blocks"])
            ws = tuple(w[i] for w in prep)
            x_in = jnp.asarray(rng.randn(n, D).astype(np.float32))
            x_mid, _, acts = vit_mod._block_acts(x_in, bp, cfg)
            g_out = jnp.asarray(rng.randn(n, D).astype(np.float32))
            R = jnp.asarray(rng.randn(n, D).astype(np.float32))
            kw = dict(mxu=mxu, attn_mxu="float32", rule_mxu="bfloat16",
                      use_pallas=True, interpret=True)
            got = pk.block_rev_core(x_in, x_mid, acts.out_merged, g_out, R,
                                    bp, cfg.num_heads, cfg.head_dim,
                                    cfg.block_ln_eps, ws=ws, **kw)
            want = pk.block_rev_core(x_in, x_mid, acts.out_merged, g_out, R,
                                     bp, cfg.num_heads, cfg.head_dim,
                                     cfg.block_ln_eps, **kw)
            for g, w, name in zip(got, want, ["g_in", "R_in", "gc"]):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                              err_msg=f"{mxu}/{name}")
            gf = pk.block_fwd_core(x_in, bp, cfg.num_heads, cfg.head_dim,
                                   cfg.block_ln_eps, mxu=mxu,
                                   attn_mxu="float32", use_pallas=True,
                                   interpret=True, ws=ws)
            wf = pk.block_fwd_core(x_in, bp, cfg.num_heads, cfg.head_dim,
                                   cfg.block_ln_eps, mxu=mxu,
                                   attn_mxu="float32", use_pallas=True,
                                   interpret=True)
            for g, w in zip(gf, wf):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.slow
def test_block_rev_core_mlp_mxu_override():
    """The mlp_mxu knob: None == explicit mxu (bitwise), and the
    tf32+mlp=bf16 production mix changes ONLY the fc1/fc2 fwd/bwd dots
    (kernel interpret == math path; result stays close to full tf32)."""
    import jax
    from transformer_explainability_tpu.ops import pallas_kernels as pk
    from transformer_explainability_tpu.models import vit as vit_mod
    cfg = vit_mod.ViTConfig(img_size=32, patch_size=16, embed_dim=24,
                            depth=1, num_heads=4, num_classes=4)
    params = vit_mod.init_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.RandomState(3)
    n, D = cfg.num_tokens, cfg.embed_dim
    bp = jax.tree.map(lambda a: a[0], params["blocks"])
    x_in = jnp.asarray(rng.randn(n, D).astype(np.float32))
    x_mid, _, acts = vit_mod._block_acts(x_in, bp, cfg)
    g_out = jnp.asarray(rng.randn(n, D).astype(np.float32))
    R = jnp.asarray(rng.randn(n, D).astype(np.float32))
    base = dict(mxu="tensorfloat32", attn_mxu="float32",
                rule_mxu="bfloat16", use_pallas=True, interpret=True)
    args = (x_in, x_mid, acts.out_merged, g_out, R, bp,
            cfg.num_heads, cfg.head_dim, cfg.block_ln_eps)
    want = pk.block_rev_core(*args, **base)
    same = pk.block_rev_core(*args, mlp_mxu="tensorfloat32", **base)
    for g, w in zip(same, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    mixed_k = pk.block_rev_core(*args, mlp_mxu="bfloat16", **base)
    mixed_m = pk.block_rev_core(*args, mlp_mxu="bfloat16",
                                **{**base, "use_pallas": False,
                                   "interpret": False})
    for g, w, name in zip(mixed_k, mixed_m, ["g_in", "R_in", "gc"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
    # the override perturbs but does not corrupt (bf16-level delta)
    for g, w in zip(mixed_k, want):
        g, w = np.asarray(g), np.asarray(w)
        assert not np.array_equal(g, w)
        c = np.corrcoef(g.ravel(), w.ravel())[0, 1]
        assert c > 0.99, c
    # forward megakernel: same contract
    f_want = pk.block_fwd_core(x_in, bp, cfg.num_heads, cfg.head_dim,
                               cfg.block_ln_eps, mxu="tensorfloat32",
                               attn_mxu="float32", use_pallas=True,
                               interpret=True)
    f_mix = pk.block_fwd_core(x_in, bp, cfg.num_heads, cfg.head_dim,
                              cfg.block_ln_eps, mxu="tensorfloat32",
                              attn_mxu="float32", mlp_mxu="bfloat16",
                              use_pallas=True, interpret=True)
    assert not np.array_equal(np.asarray(f_mix[0]), np.asarray(f_want[0]))
    # x_mid (attention half) is untouched by the MLP override
    np.testing.assert_array_equal(np.asarray(f_mix[1]),
                                  np.asarray(f_want[1]))
    np.testing.assert_array_equal(np.asarray(f_mix[2]),
                                  np.asarray(f_want[2]))


def test_block_fwd_core_save_attn_anchors():
    """save_attn=True returns the rich anchors (qkv_pre, proj_pre, dots,
    probs) consistent with the block math, and leaves x_out/x_mid/out_m
    identical to the plain call (f64 interpret)."""
    import jax
    from transformer_explainability_tpu.ops.pallas_kernels import block_fwd_core
    from transformer_explainability_tpu.models import vit as vit_mod
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = vit_mod.ViTConfig(img_size=32, patch_size=16, embed_dim=24,
                                depth=1, num_heads=4, num_classes=4)
        params = jax.tree.map(
            lambda a: a.astype(jnp.float64),
            vit_mod.init_params(jax.random.PRNGKey(4), cfg))
        bp = jax.tree.map(lambda a: a[0], params["blocks"])
        rng = np.random.RandomState(9)
        x = jnp.asarray(rng.randn(cfg.num_tokens, cfg.embed_dim))
        kw = dict(mxu="float32", attn_mxu="float32",
                  use_pallas=True, interpret=True)
        plain = block_fwd_core(x, bp, cfg.num_heads, cfg.head_dim,
                               cfg.block_ln_eps, **kw)
        rich = block_fwd_core(x, bp, cfg.num_heads, cfg.head_dim,
                              cfg.block_ln_eps, save_attn=True, **kw)
        assert len(rich) == 7
        for a, b in zip(plain, rich[:3]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=0)
        _, _, _, qkv_pre, proj_pre, dots, probs = rich
        _, _, acts = vit_mod._block_acts(x, bp, cfg)
        want_qkv_pre = acts.qkv - bp["qkv"]["bias"]
        np.testing.assert_allclose(np.asarray(qkv_pre),
                                   np.asarray(want_qkv_pre),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(proj_pre),
            np.asarray(acts.attn_out - bp["proj"]["bias"]),
            rtol=1e-9, atol=1e-12)
        n, h = cfg.num_tokens, cfg.num_heads
        assert dots.shape == (h * n, n) and probs.shape == (h * n, n)
        # probs rows are the post-softmax attention, head-stacked; compare
        # against acts.attn (h, n, n) — note acts applies the scale before
        # softmax, the kernel's saved dots are PRE-scale
        scale = cfg.head_dim ** -0.5
        for i in range(h):
            np.testing.assert_allclose(
                np.asarray(probs[i * n:(i + 1) * n]),
                np.asarray(acts.attn[i]), rtol=1e-9, atol=1e-12)
            got_sm = jax.nn.softmax(dots[i * n:(i + 1) * n] * scale, axis=-1)
            np.testing.assert_allclose(np.asarray(got_sm),
                                       np.asarray(acts.attn[i]),
                                       rtol=1e-9, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_block_fwd_core_save_mlp_anchors():
    """save_mlp=True additionally returns (fc1_pre, fc2_pre) consistent
    with the block math, base outputs unchanged (f64 interpret)."""
    import jax
    from transformer_explainability_tpu.ops.pallas_kernels import block_fwd_core
    from transformer_explainability_tpu.models import vit as vit_mod
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = vit_mod.ViTConfig(img_size=32, patch_size=16, embed_dim=24,
                                depth=1, num_heads=4, num_classes=4)
        params = jax.tree.map(
            lambda a: a.astype(jnp.float64),
            vit_mod.init_params(jax.random.PRNGKey(4), cfg))
        bp = jax.tree.map(lambda a: a[0], params["blocks"])
        rng = np.random.RandomState(9)
        x = jnp.asarray(rng.randn(cfg.num_tokens, cfg.embed_dim))
        kw = dict(mxu="float32", attn_mxu="float32",
                  use_pallas=True, interpret=True)
        plain = block_fwd_core(x, bp, cfg.num_heads, cfg.head_dim,
                               cfg.block_ln_eps, **kw)
        rich = block_fwd_core(x, bp, cfg.num_heads, cfg.head_dim,
                              cfg.block_ln_eps, save_attn=True,
                              save_mlp=True, **kw)
        assert len(rich) == 9
        for a, b in zip(plain, rich[:3]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=0)
        fc1_pre, fc2_pre = rich[7], rich[8]
        x_mid = rich[1]
        xn2 = vit_mod._layernorm(x_mid, bp["norm2"], cfg.block_ln_eps)
        want_fc1 = xn2 @ bp["fc1"]["kernel"]
        np.testing.assert_allclose(np.asarray(fc1_pre), np.asarray(want_fc1),
                                   rtol=1e-9, atol=1e-12)
        hg = jax.nn.gelu(want_fc1 + bp["fc1"]["bias"], approximate=False)
        np.testing.assert_allclose(np.asarray(fc2_pre),
                                   np.asarray(hg @ bp["fc2"]["kernel"]),
                                   rtol=1e-9, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_block_rev_core_saved_anchors_match_recompute():
    """The rich-anchor reverse step == the recompute reverse step when the
    anchors come from the forward kernel (f64 interpret: both paths see the
    same linearization values, so the outputs agree to roundoff)."""
    import jax
    from transformer_explainability_tpu.ops import pallas_kernels as pk
    from transformer_explainability_tpu.models import vit as vit_mod
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = vit_mod.ViTConfig(img_size=32, patch_size=16, embed_dim=24,
                                depth=1, num_heads=4, num_classes=4)
        params = jax.tree.map(
            lambda a: a.astype(jnp.float64),
            vit_mod.init_params(jax.random.PRNGKey(3), cfg))
        bp = jax.tree.map(lambda a: a[0], params["blocks"])
        rng = np.random.RandomState(8)
        n, D = cfg.num_tokens, cfg.embed_dim
        x_in = jnp.asarray(rng.randn(n, D))
        g_out = jnp.asarray(rng.randn(n, D))
        R = jnp.asarray(rng.randn(n, D))
        kw = dict(mxu="float32", attn_mxu="float32", rule_mxu="float32",
                  use_pallas=True, interpret=True)
        (x_out, x_mid, out_m, qkv_pre, proj_pre, dots, probs) = \
            pk.block_fwd_core(x_in, bp, cfg.num_heads, cfg.head_dim,
                              cfg.block_ln_eps, save_attn=True,
                              mxu="float32", attn_mxu="float32",
                              use_pallas=True, interpret=True)
        want = pk.block_rev_core(x_in, x_mid, out_m, g_out, R, bp,
                                 cfg.num_heads, cfg.head_dim,
                                 cfg.block_ln_eps, **kw)
        got = pk.block_rev_core(x_in, x_mid, out_m, g_out, R, bp,
                                cfg.num_heads, cfg.head_dim,
                                cfg.block_ln_eps,
                                saved=(qkv_pre, proj_pre, dots, probs), **kw)
        for g, w, name in zip(got, want, ("g_in", "R_in", "gc")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-9, atol=1e-12, err_msg=name)
        # and the jnp fallback (use_pallas=False) accepts saved too
        got_f = pk.block_rev_core(x_in, x_mid, out_m, g_out, R, bp,
                                  cfg.num_heads, cfg.head_dim,
                                  cfg.block_ln_eps,
                                  saved=(qkv_pre, proj_pre, dots, probs),
                                  mxu="float32", attn_mxu="float32",
                                  rule_mxu="float32", use_pallas=False)
        for g, w, name in zip(got_f, want, ("g_in", "R_in", "gc")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-9, atol=1e-12, err_msg=name)

        # 6-tuple form (MLP anchors too) — both kernel and jnp fallback
        rich6 = pk.block_fwd_core(x_in, bp, cfg.num_heads, cfg.head_dim,
                                  cfg.block_ln_eps, save_attn=True,
                                  save_mlp=True, mxu="float32",
                                  attn_mxu="float32", use_pallas=True,
                                  interpret=True)
        saved6 = rich6[3:]
        for use_pallas in (True, False):
            got6 = pk.block_rev_core(
                x_in, x_mid, out_m, g_out, R, bp, cfg.num_heads,
                cfg.head_dim, cfg.block_ln_eps, saved=saved6,
                mxu="float32", attn_mxu="float32", rule_mxu="float32",
                use_pallas=use_pallas, interpret=use_pallas)
            for g, w, name in zip(got6, want, ("g_in", "R_in", "gc")):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=1e-9, atol=1e-12,
                    err_msg=f"{name} (saved6, pallas={use_pallas})")
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_explain_rich_anchor_path_matches_recompute_path():
    """End-to-end: explain_single on the fused block path with rich anchors
    == without (CPU math fallback; identical linearization points)."""
    import os
    import jax
    from transformer_explainability_tpu.models.vit import ViTConfig, init_params
    from transformer_explainability_tpu.explain.generator import explain_single
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=24, depth=3,
                    num_heads=4, num_classes=10)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.randn(3, 32, 32).astype(np.float32))

    def run(rich, rich_mlp=False):
        env = os.environ
        old = {k: env.get(k) for k in ("TE_TPU_RICH_ANCHORS",
                                       "TE_TPU_RICH_MLP")}
        env["TE_TPU_RICH_ANCHORS"] = "1" if rich else "0"
        env["TE_TPU_RICH_MLP"] = "1" if rich_mlp else "0"
        try:
            with jax.default_matmul_precision("tensorfloat32"):
                return np.asarray(jax.jit(
                    lambda p, x, i: explain_single(
                        p, x, i, cfg, use_attn_kernel=True,
                        matmul_precision="tensorfloat32"))(
                    params, img, jnp.int32(3)))
        finally:
            for k, v in old.items():
                if v is None:
                    env.pop(k, None)
                else:
                    env[k] = v

    a = run(False)
    b = run(True)
    c = run(True, rich_mlp=True)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(c, a, rtol=1e-5, atol=1e-8)


def test_explain_f32_rich_anchor_path_is_bitwise():
    """The exact-f32 path's XLA-level rich anchors (saved pre-bias
    qkv/proj/fc1/fc2 dot outputs consumed by the reverse kstep) replace
    recomputes with bitwise-equal saved values — the explain output must be
    EXACTLY unchanged, preserving the mode's reference-ordered-parity
    contract (PERF.md round 3)."""
    import os
    import jax
    from transformer_explainability_tpu.models.vit import (ViTConfig,
                                                           init_params)
    from transformer_explainability_tpu.explain.generator import (
        explain_single)
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=24, depth=3,
                    num_heads=4, num_classes=10)
    params = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(6)
    img = jnp.asarray(rng.randn(3, 32, 32).astype(np.float32))

    def run(rich):
        old = {k: os.environ.get(k) for k in ("TE_TPU_RICH_ANCHORS",
                                              "TE_TPU_RICH_XLA")}
        os.environ["TE_TPU_RICH_ANCHORS"] = "1" if rich else "0"
        # the XLA-path anchors are opt-in (measured speed-neutral on the
        # bandwidth-bound f32 mode — PERF.md round 3c)
        os.environ["TE_TPU_RICH_XLA"] = "1" if rich else "0"
        try:
            with jax.default_matmul_precision("float32"):
                return np.asarray(jax.jit(
                    lambda p, x, i: explain_single(
                        p, x, i, cfg, use_attn_kernel=True,
                        matmul_precision="float32"))(
                    params, img, jnp.int32(3)))
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    np.testing.assert_array_equal(run(True), run(False))


def test_mlp_rev_tp_phases_interpret_match_jnp():
    """The TP MLP phase kernels (interpret mode) == their jnp fallbacks, and
    the two-phase composition over simulated shards == the one-shot
    single-device MLP core (f64, 2-way 'mesh' via column/row slicing with
    host-side psums)."""
    import jax
    from transformer_explainability_tpu.ops.pallas_kernels import (
        mlp_rev_tp_phase1, mlp_rev_tp_phase2, _mlp_rev_core_jnp,
        _ksafe_divide, _ln_fwd)
    from transformer_explainability_tpu.ops import relprop as rp
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.RandomState(9)
        n, D, M, k = 23, 16, 40, 2
        x_mid = jnp.asarray(rng.randn(n, D))
        g_out = jnp.asarray(rng.randn(n, D))
        R = jnp.asarray(rng.randn(n, D))
        ln = {"scale": jnp.asarray(1 + 0.1 * rng.randn(D)),
              "bias": jnp.asarray(0.1 * rng.randn(D))}
        w1 = jnp.asarray(rng.randn(D, M) * 0.2)
        w2 = jnp.asarray(rng.randn(M, D) * 0.2)
        b1 = jnp.asarray(0.1 * rng.randn(M))
        b2 = jnp.asarray(0.1 * rng.randn(D))
        eps = 1e-6
        C = M // k

        # per-"device" phase 1, interpret kernels vs jnp fallbacks
        p1 = []
        for c in range(k):
            w1_l, w2_l = w1[:, c * C:(c + 1) * C], w2[c * C:(c + 1) * C]
            b1_l = b1[c * C:(c + 1) * C]
            got = mlp_rev_tp_phase1(x_mid, g_out, ln, b1_l, w1_l, w2_l, eps,
                                    mxu="float32", rule_mxu="float32",
                                    use_pallas=True, interpret=True)
            want = mlp_rev_tp_phase1(x_mid, g_out, ln, b1_l, w1_l, w2_l,
                                     eps, use_pallas=False)
            for g, w in zip(got, want):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                           rtol=1e-9, atol=1e-12)
            p1.append(got)

        # host-side "psums" + the shared XLA glue
        fc2_pre = sum(np.asarray(p[1]) for p in p1)
        axw2 = sum(np.asarray(p[2]) for p in p1)
        mlp_out = jnp.asarray(fc2_pre) + b2
        R1, R2 = rp.add_relprop(x_mid, mlp_out, R, "ours")
        Sr = rp.safe_divide(R2, 0.5 * (jnp.asarray(fc2_pre)
                                       + jnp.asarray(axw2)))

        num_w = np.zeros((n, D))
        num_a = np.zeros((n, D))
        for c in range(k):
            w1_l, w2_l = w1[:, c * C:(c + 1) * C], w2[c * C:(c + 1) * C]
            b1_l = b1[c * C:(c + 1) * C]
            got = mlp_rev_tp_phase2(x_mid, Sr, p1[c][0], ln, b1_l, w1_l,
                                    w2_l, eps, mxu="float32",
                                    rule_mxu="float32", use_pallas=True,
                                    interpret=True)
            want = mlp_rev_tp_phase2(x_mid, Sr, p1[c][0], ln, b1_l, w1_l,
                                     w2_l, eps, use_pallas=False)
            for g, w in zip(got, want):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                           rtol=1e-9, atol=1e-12)
            num_w += np.asarray(got[0])
            num_a += np.asarray(got[1])

        xn2, _, _ = _ln_fwd(x_mid, ln["scale"], ln["bias"], eps)
        R2b = 0.5 * (np.asarray(xn2) * num_w
                     + np.abs(np.asarray(xn2)) * num_a)
        Rm = rp.clone_relprop(x_mid, [R1, jnp.asarray(R2b)])
        g_xn2 = sum(np.asarray(p[3]) for p in p1)
        from transformer_explainability_tpu.models.vit import _layernorm_bwd
        g_mid = g_out + _layernorm_bwd(jnp.asarray(g_xn2), x_mid, ln, eps)

        bp = {"fc1": {"kernel": w1, "bias": b1},
              "fc2": {"kernel": w2, "bias": b2}}
        want_g, want_R = _mlp_rev_core_jnp(x_mid, g_out, R, ln, bp, eps,
                                           "ours", 1.0)
        np.testing.assert_allclose(np.asarray(g_mid), np.asarray(want_g),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(Rm), np.asarray(want_R),
                                   rtol=1e-9, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)
