"""BERT fused-layer Pallas kernels: equivalence vs layer_backward +
layer_relprop (interpret mode on CPU; the real TPU path is exercised by the
bench)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from transformer_explainability_tpu.models import bert as bert_mod
from transformer_explainability_tpu.models.bert import BertConfig
from transformer_explainability_tpu.ops import pallas_kernels as pk

CFG = BertConfig(vocab_size=97, hidden_size=24, num_layers=3, num_heads=4,
                 intermediate_size=48, max_position_embeddings=64,
                 num_labels=4)


def _layer_inputs(cfg, key=0, seed=6, S=21, masked=3):
    params = bert_mod.init_params(jax.random.PRNGKey(key), cfg)
    lp = jax.tree.map(lambda a: a[1], params["layers"])
    rng = np.random.RandomState(seed)
    mask = np.ones((S,), np.float32)
    mask[S - masked:] = 0.0
    ext_mask = jnp.asarray((1.0 - mask) * cfg.mask_value)
    x_in = jnp.asarray(rng.randn(S, cfg.hidden_size).astype(np.float32))
    g_out = jnp.asarray(rng.randn(S, cfg.hidden_size).astype(np.float32))
    R = jnp.asarray(rng.randn(S, cfg.hidden_size).astype(np.float32))
    return params, lp, ext_mask, x_in, g_out, R


@pytest.mark.slow
def test_bert_rev_cores_interpret_match_layer_relprop():
    """out_rev_core ∘ attn_rev_core == layer_backward + layer_relprop + the
    fused (grad ⊙ cam)⁺ head-mean, in f64 (interpret mode)."""
    jax.config.update("jax_enable_x64", True)
    try:
        _, lp32, ext_mask, x_in, g_out, R = _layer_inputs(CFG)
        lp = jax.tree.map(lambda a: a.astype(jnp.float64), lp32)
        x_in, g_out, R, ext_mask = (a.astype(jnp.float64)
                                    for a in (x_in, g_out, R, ext_mask))
        att_ln, _, acts = bert_mod._layer_acts(x_in, None, lp, ext_mask, CFG)

        want_g_in, want_gprobs = bert_mod.layer_backward(
            g_out, x_in, att_ln, acts, lp, CFG)
        want_R_in, want_cam = bert_mod.layer_relprop(
            R, x_in, att_ln, lp, ext_mask, CFG, 1.0, "ours", acts=acts)
        want_gc = jnp.clip(want_gprobs * want_cam, min=0).mean(axis=0)

        kw = dict(mxu="float32", rule_mxu="float32", use_pallas=True,
                  interpret=True)
        g_attln, R_att = pk.bert_out_rev_core(att_ln, g_out, R, lp,
                                              CFG.layer_norm_eps, **kw)
        got_g, got_R, got_gc = pk.bert_attn_rev_core(
            x_in, g_attln, R_att, ext_mask, lp, CFG.num_heads, CFG.head_dim,
            CFG.layer_norm_eps, attn_mxu="float32", **kw)
        for g, w, name in [(got_g, want_g_in, "g_in"),
                           (got_R, want_R_in, "R_in"),
                           (got_gc, want_gc, "gc")]:
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-9, atol=1e-12, err_msg=name)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_bert_fwd_core_interpret_matches_layer_acts():
    jax.config.update("jax_enable_x64", True)
    try:
        _, lp32, ext_mask, x_in, _, _ = _layer_inputs(CFG, key=1, seed=7)
        lp = jax.tree.map(lambda a: a.astype(jnp.float64), lp32)
        x_in = x_in.astype(jnp.float64)
        ext_mask = ext_mask.astype(jnp.float64)
        want_attln, want_out, _ = bert_mod._layer_acts(x_in, None, lp,
                                                       ext_mask, CFG)
        got_out, got_attln = pk.bert_layer_fwd_core(
            x_in, ext_mask, lp, CFG.num_heads, CFG.head_dim,
            CFG.layer_norm_eps, mxu="float32", attn_mxu="float32",
            use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_attln),
                                   np.asarray(want_attln),
                                   rtol=1e-9, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_bert_explain_kernel_path_matches_reference_path():
    """explain_single(use_kernel=True) on CPU routes through the fused step
    structure with the jnp fallback cores — must match the einsum path (same
    math, different op grouping)."""
    from transformer_explainability_tpu.explain.bert_generator import (
        explain_single)
    params = bert_mod.init_params(jax.random.PRNGKey(2), CFG)
    rng = np.random.RandomState(8)
    S = 24
    ids = jnp.asarray(rng.randint(0, CFG.vocab_size, (S,)), jnp.int32)
    mask = jnp.asarray((np.arange(S) < 20).astype(np.float32))
    for sl in (CFG.num_layers - 1, 0):
        a = np.asarray(jax.jit(
            lambda p, i, m, ix: explain_single(p, i, m, ix, CFG,
                                               start_layer=sl,
                                               use_kernel=False))(
            params, ids, mask, jnp.int32(1)))
        b = np.asarray(jax.jit(
            lambda p, i, m, ix: explain_single(p, i, m, ix, CFG,
                                               start_layer=sl,
                                               use_kernel=True))(
            params, ids, mask, jnp.int32(1)))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_bert_attn_rev_chunked_matches_single_kernel():
    """The chunked mid + per-head-chunk path (used above S=384 on TPU) is
    the same math as the single fused kernel, redistributed: per-chunk
    accumulators summed in XLA plus the combine. f64 interpret, tight tol
    (only float reassociation across the chunk sum differs)."""
    jax.config.update("jax_enable_x64", True)
    try:
        _, lp32, ext_mask, x_in, g_out, R = _layer_inputs(CFG, key=4,
                                                          seed=11)
        lp = jax.tree.map(lambda a: a.astype(jnp.float64), lp32)
        x_in, g_out, R, ext_mask = (a.astype(jnp.float64)
                                    for a in (x_in, g_out, R, ext_mask))
        kw = dict(mxu="float32", attn_mxu="float32", rule_mxu="float32",
                  use_pallas=True, interpret=True)
        want = pk.bert_attn_rev_core(x_in, g_out, R, ext_mask, lp,
                                     CFG.num_heads, CFG.head_dim,
                                     CFG.layer_norm_eps, head_chunk=0, **kw)
        for hc in (1, 3, 4):   # 4 does not divide num_heads=4? it does; 3 ragged
            got = pk.bert_attn_rev_core(x_in, g_out, R, ext_mask, lp,
                                        CFG.num_heads, CFG.head_dim,
                                        CFG.layer_norm_eps, head_chunk=hc,
                                        **kw)
            for g, w, name in zip(got, want, ("g_in", "R_in", "gc")):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                           rtol=1e-9, atol=1e-12,
                                           err_msg=f"hc={hc} {name}")
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_bert_rev_core_mlp_mxu_override():
    """The mlp_mxu knob (BERT analog of the ViT MLP-precision island):
    None == explicit mxu (bitwise); the tf32+mlp=bf16 mix changes ONLY the
    inter/out dense fwd/bwd dots (kernel interpret == math path; result
    stays close to full tf32); the forward's att_ln is untouched."""
    _, lp, ext_mask, x_in, g_out, R = _layer_inputs(CFG, key=5, seed=13)
    att_ln, _, _ = bert_mod._layer_acts(x_in, None, lp, ext_mask, CFG)
    base = dict(mxu="tensorfloat32", rule_mxu="bfloat16", use_pallas=True,
                interpret=True)
    args = (att_ln, g_out, R, lp, CFG.layer_norm_eps)
    want = pk.bert_out_rev_core(*args, **base)
    same = pk.bert_out_rev_core(*args, mlp_mxu="tensorfloat32", **base)
    for g, w in zip(same, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    mixed_k = pk.bert_out_rev_core(*args, mlp_mxu="bfloat16", **base)
    mixed_m = pk.bert_out_rev_core(*args, mlp_mxu="bfloat16",
                                   **{**base, "use_pallas": False,
                                      "interpret": False})
    for g, w, name in zip(mixed_k, mixed_m, ["g_attln", "R_att"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
    # the override perturbs but does not corrupt (bf16-level delta)
    for g, w in zip(mixed_k, want):
        g, w = np.asarray(g), np.asarray(w)
        assert not np.array_equal(g, w)
        c = np.corrcoef(g.ravel(), w.ravel())[0, 1]
        assert c > 0.99, c
    # forward kernel: out changes, att_ln (pre-MLP) is untouched
    fkw = dict(num_heads=CFG.num_heads, head_dim=CFG.head_dim,
               eps=CFG.layer_norm_eps, mxu="tensorfloat32",
               attn_mxu="float32", use_pallas=True, interpret=True)
    f_want = pk.bert_layer_fwd_core(x_in, ext_mask, lp, **fkw)
    f_mix = pk.bert_layer_fwd_core(x_in, ext_mask, lp, mlp_mxu="bfloat16",
                                   **fkw)
    assert not np.array_equal(np.asarray(f_mix[0]), np.asarray(f_want[0]))
    np.testing.assert_array_equal(np.asarray(f_mix[1]),
                                  np.asarray(f_want[1]))


@pytest.mark.slow
def test_bert_prepared_weights_match_inline():
    params, lp, ext_mask, x_in, g_out, R = _layer_inputs(CFG, key=3, seed=9)
    for mxu in ["tensorfloat32", "bfloat16"]:
        prep = pk.prepare_bert_weights(params["layers"], mxu)
        ws = tuple(w[1] for w in prep)
        n4 = len(ws) // 6 * 4
        kw = dict(mxu=mxu, rule_mxu="bfloat16", use_pallas=True,
                  interpret=True)
        att_ln, _, _ = bert_mod._layer_acts(x_in, None, lp, ext_mask, CFG)
        got = pk.bert_out_rev_core(att_ln, g_out, R, lp, CFG.layer_norm_eps,
                                   ws=ws[n4:], **kw)
        want = pk.bert_out_rev_core(att_ln, g_out, R, lp,
                                    CFG.layer_norm_eps, **kw)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        got = pk.bert_attn_rev_core(x_in, *want, ext_mask, lp, CFG.num_heads,
                                    CFG.head_dim, CFG.layer_norm_eps,
                                    attn_mxu="float32", ws=ws[:n4], **kw)
        want2 = pk.bert_attn_rev_core(x_in, *want, ext_mask, lp,
                                      CFG.num_heads, CFG.head_dim,
                                      CFG.layer_norm_eps,
                                      attn_mxu="float32", **kw)
        for g, w in zip(got, want2):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.slow
def test_bert_rich_anchors_match_recompute():
    """Rich forward anchors (save_attn/save_mlp) feed the reverse cores the
    exact values their recomputes would produce. On the eager math path
    (use_pallas=False) anchored and recomputed reverses agree BITWISE; under
    a jitted kernel body (interpret mode) XLA's fusion choices differ
    between the two programs, so the agreement is to roundoff (same
    convention as the ViT test_block_rev_core_saved_anchors_match_recompute,
    asserted there in f64). Covers the single fused kernel AND the chunked
    path, tf32 and bf16 modes, with the mlp island on."""
    _, lp, ext_mask, x_in, g_out, R = _layer_inputs(CFG, key=6, seed=15)
    for mxu, probs in [("tensorfloat32", True), ("tensorfloat32", False),
                       ("bfloat16", True)]:
        n_attn = 5 if probs else 3
        for mode, assert_fn in [
                (dict(use_pallas=False, interpret=False),
                 np.testing.assert_array_equal),
                (dict(use_pallas=True, interpret=True),
                 lambda a, b, err_msg: np.testing.assert_allclose(
                     a, b, rtol=2e-6, atol=1e-7, err_msg=err_msg))]:
            fkw = dict(num_heads=CFG.num_heads, head_dim=CFG.head_dim,
                       eps=CFG.layer_norm_eps, mxu=mxu, attn_mxu="float32",
                       mlp_mxu="bfloat16", **mode)
            outs = pk.bert_layer_fwd_core(x_in, ext_mask, lp,
                                          save_attn=True, save_probs=probs,
                                          save_mlp=True, **fkw)
            out, att_ln = outs[:2]
            saved_attn = outs[2:2 + n_attn]
            saved_mlp = outs[2 + n_attn:4 + n_attn]
            # the anchored forward's primary outputs are unchanged
            plain = pk.bert_layer_fwd_core(x_in, ext_mask, lp, **fkw)
            assert_fn(np.asarray(out), np.asarray(plain[0]),
                      err_msg=f"{mxu} fwd out")
            assert_fn(np.asarray(att_ln), np.asarray(plain[1]),
                      err_msg=f"{mxu} fwd att_ln")

            okw = dict(mxu=mxu, rule_mxu="bfloat16", mlp_mxu="bfloat16",
                       **mode)
            want_o = pk.bert_out_rev_core(att_ln, g_out, R, lp,
                                          CFG.layer_norm_eps, **okw)
            got_o = pk.bert_out_rev_core(att_ln, g_out, R, lp,
                                         CFG.layer_norm_eps,
                                         saved=saved_mlp, **okw)
            for g, w, name in zip(got_o, want_o, ("g_attln", "R_att")):
                assert_fn(np.asarray(g), np.asarray(w),
                          err_msg=f"{mxu} {name}")

            akw = dict(mxu=mxu, attn_mxu="float32", rule_mxu="bfloat16",
                       **mode)
            chunks = (0, 3) if mode["interpret"] else (None,)
            for hc in chunks:     # single fused kernel; ragged chunks
                want_a = pk.bert_attn_rev_core(
                    x_in, *want_o, ext_mask, lp, CFG.num_heads,
                    CFG.head_dim, CFG.layer_norm_eps, head_chunk=hc, **akw)
                got_a = pk.bert_attn_rev_core(
                    x_in, *want_o, ext_mask, lp, CFG.num_heads,
                    CFG.head_dim, CFG.layer_norm_eps, head_chunk=hc,
                    saved=saved_attn, **akw)
                for g, w, name in zip(got_a, want_a, ("g_in", "R_in", "gc")):
                    assert_fn(np.asarray(g), np.asarray(w),
                              err_msg=f"{mxu} hc={hc} {name}")


@pytest.mark.slow
def test_bert_rich_anchor_explain_matches_plain(monkeypatch):
    """explain_single(use_kernel=True) with rich anchors on (default) ==
    anchors off — end-to-end through the forward_collect/reverse_pass
    anchor plumbing (identical linearization points; roundoff-level
    compiler-fusion differences only)."""
    from transformer_explainability_tpu.explain.bert_generator import (
        explain_single)
    params = bert_mod.init_params(jax.random.PRNGKey(7), CFG)
    rng = np.random.RandomState(16)
    S = 24
    ids = jnp.asarray(rng.randint(0, CFG.vocab_size, (S,)), jnp.int32)
    mask = jnp.asarray((np.arange(S) < 19).astype(np.float32))

    def run():
        return np.asarray(jax.jit(
            lambda p, i, m, ix: explain_single(
                p, i, m, ix, CFG, matmul_precision="tensorfloat32",
                attn_precision="float32", mlp_precision="bfloat16",
                use_kernel=True))(params, ids, mask, jnp.int32(2)))

    monkeypatch.setenv("TE_TPU_RICH_ANCHORS", "1")
    rich = run()
    monkeypatch.setenv("TE_TPU_RICH_ANCHORS", "0")
    plain = run()
    np.testing.assert_allclose(rich, plain, rtol=1e-5, atol=1e-8)
