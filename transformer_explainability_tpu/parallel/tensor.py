"""Tensor parallelism (TP) for the ViT explain path, composed with the
Pallas attention cores.

The round-2 ``model``-axis path partitioned the Megatron-sharded einsums with
plain ``jit`` + ``NamedSharding`` — which forced the Pallas kernels off
(Mosaic custom calls have no GSPMD partitioning rule for sharded weight
operands). This module keeps them: the explain program is written in
``shard_map`` with EXPLICIT collectives, so each device runs the fused
attention kernels (:func:`...ops.pallas_kernels.attn_fwd_core` /
``attn_rev_core``) LOCALLY on its head slice — heads divide the model axis
(12/16 heads over 2/4-way TP) — while the Megatron-sharded Linears psum at
the merges:

  * qkv column-parallel by head (weights pre-shuffled so each shard's
    columns are its heads' q|k|v groups in the kernels' 'qkv h d' layout);
  * proj / fc2 row-parallel (psum after the partial matmul, bias added once
    after the psum);
  * fc1 column-parallel;
  * the α-β Linear rules follow the same decomposition: column-parallel
    rules have local denominators and psum their (n, D) relevance partials;
    row-parallel rules psum the denominator products (y_pre, |x|@|w|) and
    keep their relevance output local;
  * the renormalizing Add/clone rules and LayerNorms run on replicated
    activations — no collectives;
  * the per-block ``(grad ⊙ cam)⁺`` head-mean psums its per-shard head sums.

The whole-block megakernel stays single-device-only: its in-kernel MLP half
would need psums INSIDE the Pallas program, which Mosaic cannot express —
the attention cores (the layout-bound part XLA handles worst) are the part
worth keeping under TP.

MEASURED COST (round 4, real chip, B=32, production precision,
experiments/perf_tp_cost.py): **64% of the single-device megakernel rate
per device** (294.3 vs 460.6 expl/s at n_model=1, trivial psums). The
first measurement read 40% (186.5) — more than half of that cliff was a
silent precision mismatch, not structure: the TP program had no
relprop/mlp precision islands, so every rule and MLP dot paid the
ambient 3-pass tf32 (and the attention core's in-kernel rule dots paid
6-pass f32) where the megakernels run 1-pass bf16. With the islands
threaded (this module + mesh.make_sharded_explain_fn), the remaining
36% is the structural loss of the whole-block megakernels. TP is for
models that don't fit a chip; for throughput, scale out with dp (its
shard_map wrapper measures free: 462.6). BERT TP is intentionally
absent: BERT-base fits one chip, dp covers serving, SP covers long
context (docs/PARALLELISM.md).

Reference being distributed: ``ViT_LRP.py`` relprop (:154-177, :203-213) —
the reference itself has no live parallelism (SURVEY §2.9).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from transformer_explainability_tpu.models import vit as vit_mod
from transformer_explainability_tpu.models.vit import ViTConfig
from transformer_explainability_tpu.ops import pallas_kernels as pk
from transformer_explainability_tpu.ops import relprop as rp
from transformer_explainability_tpu.parallel.sequence import shard_map


def tp_reshuffle_params(params, n_model: int):
    """Reorder the stacked qkv kernel/bias columns from the global
    '(qkv, head, d)' layout to '(shard, qkv, head_local, d)' so a contiguous
    model-axis slice is exactly one shard's heads in the kernels' layout.
    proj/fc1/fc2 already shard contiguously. Returns a NEW pytree
    (jnp ops — traceable, so it can also run inside jit)."""
    qkv = dict(params["blocks"]["qkv"])
    w = qkv["kernel"]                        # (L, D, 3D)
    L, D = w.shape[0], w.shape[1]
    k = n_model
    w = w.reshape(L, D, 3, k, D // k).transpose(0, 1, 3, 2, 4)
    qkv["kernel"] = w.reshape(L, D, 3 * D)
    if "bias" in qkv:
        b = qkv["bias"].reshape(L, 3, k, D // k)
        qkv["bias"] = b.transpose(0, 2, 1, 3).reshape(L, 3 * D)
    out = dict(params)
    out["blocks"] = {**params["blocks"], "qkv": qkv}
    return out


def tp_param_specs(cfg: ViTConfig, qkv_bias: Optional[bool] = None,
                   axis: str = "model"):
    """PartitionSpecs matching :func:`tp_reshuffle_params`' layout."""
    if qkv_bias is None:
        qkv_bias = cfg.qkv_bias
    blocks = {
        "norm1": {"scale": P(), "bias": P()},
        "qkv": {"kernel": P(None, None, axis)},
        "proj": {"kernel": P(None, axis, None), "bias": P()},
        "norm2": {"scale": P(), "bias": P()},
        "fc1": {"kernel": P(None, None, axis), "bias": P(None, axis)},
        "fc2": {"kernel": P(None, axis, None), "bias": P()},
    }
    if qkv_bias:
        blocks["qkv"]["bias"] = P(None, axis)
    specs = {
        "patch_embed": {"kernel": P(), "bias": P()},
        "cls_token": P(),
        "pos_embed": P(),
        "blocks": blocks,
        "norm": {"scale": P(), "bias": P()},
        "head": {"kernel": P(), "bias": P()},
    }
    if cfg.distilled:
        specs["dist_token"] = P()
        specs["head_dist"] = {"kernel": P(), "bias": P()}
    return specs


def _lin_rule_col(x, ax, w_local, R_local, y_pre_local, axis):
    """'ours' α=1 rule for a COLUMN-parallel Linear (qkv/fc1): denominator
    local in the output columns; the (n, D_in) relevance partial psums."""
    aw = jnp.abs(w_local)
    axw = ax @ aw
    S = rp.safe_divide(R_local, 0.5 * (y_pre_local + axw))
    part = 0.5 * (x * (S @ w_local.T) + ax * (S @ aw.T))
    return jax.lax.psum(part, axis)


def _lin_rule_row(x_local, w_local, R, y_pre_psummed, axis):
    """'ours' α=1 rule for a ROW-parallel Linear (proj/fc2): the denominator
    products psum; the relevance output stays local in the input rows."""
    ax = jnp.abs(x_local)
    aw = jnp.abs(w_local)
    axw = jax.lax.psum(ax @ aw, axis)
    S = rp.safe_divide(R, 0.5 * (y_pre_psummed + axw))
    return 0.5 * (x_local * (S @ w_local.T) + ax * (S @ aw.T))


def make_tp_explain_fn(cfg: ViTConfig, mesh: Mesh,
                       method: str = "transformer_attribution",
                       start_layer: int = 0, alpha: float = 1.0,
                       variant: str = "ours",
                       matmul_precision: str = "float32",
                       attn_precision: Optional[str] = None,
                       relprop_precision: Optional[str] = None,
                       mlp_precision: Optional[str] = None,
                       data_axis: str = "data", model_axis: str = "model",
                       pre_sharded: bool = False):
    """Jitted TP explain ``fn(params, images, indices) -> (B, num_patches)``.

    ``pre_sharded=False`` (default): pass the ORIGINAL pytree; the qkv
    column reshuffle runs inside the program (one traced transpose — fine
    for tests/occasional calls). Production callers should pre-place with
    :func:`shard_tp_params` and pass ``pre_sharded=True``.

    ``relprop_precision``/``mlp_precision`` mirror the single-device islands
    (PERF.md: the LRP rule dots tolerate 1-pass bf16; the fc1/fc2 fwd/bwd
    dots sit outside the attention-gradient chain and tolerate bf16 too) —
    without them the TP program paid the ambient 3-pass tf32 on every rule
    and MLP dot the production megakernels run at bf16, a large share of
    the round-4b 38%-of-single-device cliff.

    Constraints: the kernel-compatible config only (variant="ours", α=1,
    method="transformer_attribution"), num_heads and mlp_dim divisible by
    the model-axis size.
    """
    assert method in ("transformer_attribution", "grad"), method
    assert variant == "ours" and alpha == 1.0, (variant, alpha)
    k = mesh.shape[model_axis]
    h, d, D, M = cfg.num_heads, cfg.head_dim, cfg.embed_dim, cfg.mlp_dim
    assert h % k == 0 and M % k == 0, (h, M, k)
    h_loc = h // k
    eps = cfg.block_ln_eps
    attn_mxu = vit_mod._mxu_name(attn_precision, matmul_precision)
    rule_mxu = vit_mod._mxu_name(relprop_precision, matmul_precision)
    import contextlib

    def _ctx(p):
        return (jax.default_matmul_precision(p) if p is not None
                else contextlib.nullcontext())

    n = cfg.num_tokens

    def per_example(params, img, index):
        bp_all = params["blocks"]
        cat_x, x0 = vit_mod.embed(params, img, cfg)

        def fwd_step(x, bp):
            xn1 = vit_mod._layernorm(x, bp["norm1"], eps)
            qkv_l = xn1 @ bp["qkv"]["kernel"]            # (n, 3D/k) local
            if "bias" in bp["qkv"]:
                qkv_l = qkv_l + bp["qkv"]["bias"]
            out_l = pk.attn_fwd_core(qkv_l, h_loc, d, d ** -0.5,
                                     mxu=attn_mxu)       # (n, D/k)
            attn_out = jax.lax.psum(out_l @ bp["proj"]["kernel"],
                                    model_axis) + bp["proj"]["bias"]
            x_mid = x + attn_out
            xn2 = vit_mod._layernorm(x_mid, bp["norm2"], eps)
            with _ctx(mlp_precision):
                h1_l = xn2 @ bp["fc1"]["kernel"] + bp["fc1"]["bias"]
                hg_l = jax.nn.gelu(h1_l, approximate=False)
                mlp_out = jax.lax.psum(hg_l @ bp["fc2"]["kernel"],
                                       model_axis) + bp["fc2"]["bias"]
            return x_mid + mlp_out, (x, x_mid, out_l)

        x_final, (x_ins, x_mids, out_ls) = jax.lax.scan(fwd_step, x0, bp_all)

        xn = vit_mod._layernorm(x_final, params["norm"], cfg.final_ln_eps)
        logits = xn[0] @ params["head"]["kernel"] + params["head"]["bias"]
        idx = jnp.where(index >= 0, index, jnp.argmax(logits))
        onehot = jax.nn.one_hot(idx, cfg.num_classes, dtype=logits.dtype)

        def tail(xf):
            xn_t = vit_mod._layernorm(xf, params["norm"], cfg.final_ln_eps)
            lg = xn_t[0] @ params["head"]["kernel"] + params["head"]["bias"]
            return jnp.sum(onehot * lg)

        g_final = jax.grad(tail)(x_final)
        with _ctx(relprop_precision):
            R = rp.linear_alphabeta(xn[0], params["head"]["kernel"], onehot,
                                    alpha, variant)
            R = rp.index_select_relprop(xn, 0, jnp.array(0), R[None, :])

        def rev_step(carry, xs):
            g_out, Rc = carry
            x_in, x_mid, out_l, bp = xs
            wqkv, wproj = bp["qkv"]["kernel"], bp["proj"]["kernel"]
            w1, w2 = bp["fc1"]["kernel"], bp["fc2"]["kernel"]

            # recompute (replicated LNs; local qkv/proj partials)
            xn1 = vit_mod._layernorm(x_in, bp["norm1"], eps)
            qkv_pre_l = xn1 @ wqkv
            qkv_l = qkv_pre_l + bp["qkv"]["bias"] \
                if "bias" in bp["qkv"] else qkv_pre_l
            proj_pre = jax.lax.psum(out_l @ wproj, model_axis)
            attn_out = proj_pre + bp["proj"]["bias"]
            xn2 = vit_mod._layernorm(x_mid, bp["norm2"], eps)
            ax2 = jnp.abs(xn2)
            with _ctx(mlp_precision):
                fc1_pre_l = xn2 @ w1
                h1_l = fc1_pre_l + bp["fc1"]["bias"]
                hg_l = jax.nn.gelu(h1_l, approximate=False)
                fc2_pre = jax.lax.psum(hg_l @ w2, model_axis)
            mlp_out = fc2_pre + bp["fc2"]["bias"]

            # ---- backward, MLP half ----
            with _ctx(mlp_precision):
                g_hg_l = g_out @ w2.T
                g_h1_l = g_hg_l * vit_mod._gelu_grad(h1_l)
                g_xn2 = jax.lax.psum(g_h1_l @ w1.T, model_axis)
            g_mid = g_out + vit_mod._layernorm_bwd(g_xn2, x_mid, bp["norm2"],
                                                   eps)

            # ---- relprop, MLP half (add/clone replicated; rule dots at the
            # rule-island precision, like the single-device path) ----
            with _ctx(relprop_precision):
                R1, R2 = rp.add_relprop(x_mid, mlp_out, Rc, variant)
                R2_l = _lin_rule_row(hg_l, w2, R2, fc2_pre, model_axis)
                R2 = _lin_rule_col(xn2, ax2, w1, R2_l, fc1_pre_l, model_axis)
                Rm = rp.clone_relprop(x_mid, [R1, R2])

            g_om_l = g_mid @ wproj.T                     # (n, D/k)

            with _ctx(relprop_precision):
                Ra1, Ra2 = rp.add_relprop(x_in, attn_out, Rm, variant,
                                          Z=x_mid)
                cam_o_l = _lin_rule_row(out_l, wproj, Ra2, proj_pre,
                                        model_axis)

            # attention core on the LOCAL head slice — the Pallas kernel
            g_qkv_l, cam_qkv_l, gc_l = pk.attn_rev_core(
                qkv_l, g_om_l, cam_o_l, h_loc, d, d ** -0.5,
                attn_mxu=attn_mxu, rule_mxu=rule_mxu)

            ax1 = jnp.abs(xn1)
            with _ctx(relprop_precision):
                R2 = _lin_rule_col(xn1, ax1, wqkv, cam_qkv_l, qkv_pre_l,
                                   model_axis)
            g_xn1 = jax.lax.psum(g_qkv_l @ wqkv.T, model_axis)
            g_in = g_mid + vit_mod._layernorm_bwd(g_xn1, x_in, bp["norm1"],
                                                  eps)
            R_in = rp.clone_relprop(x_in, [Ra1, R2])

            # per-shard head-mean -> global head-mean
            gc = jax.lax.psum(gc_l, model_axis) / k
            return (g_in, R_in), gc

        (_, _), gc_maps = jax.lax.scan(
            rev_step, (g_final, R), (x_ins, x_mids, out_ls, bp_all),
            reverse=True)

        joint = pk.rollout_from_grad_cam(gc_maps, None, start_layer)
        return joint[0, cfg.num_prefix_tokens:]

    def shard_fn(params, imgs, indices):
        return jax.vmap(per_example, in_axes=(None, 0, 0))(
            params, imgs, indices)

    pspecs = tp_param_specs(cfg, axis=model_axis)
    dspec = data_axis if data_axis in mesh.shape else None
    mapped = shard_map(shard_fn, mesh,
                       (pspecs, P(dspec), P(dspec)), P(dspec))

    def fn(params, images, indices):
        if not pre_sharded:
            params = tp_reshuffle_params(params, k)
        with jax.default_matmul_precision(matmul_precision):
            return mapped(params, images, indices.astype(jnp.int32))

    return jax.jit(fn)


def shard_tp_params(params, mesh: Mesh, cfg: ViTConfig,
                    model_axis: str = "model"):
    """Reshuffle the qkv columns for head-contiguous sharding and device_put
    with the TP layout."""
    from jax.sharding import NamedSharding
    k = mesh.shape[model_axis]
    resh = tp_reshuffle_params(params, k)
    specs = tp_param_specs(cfg, qkv_bias="bias" in params["blocks"]["qkv"],
                           axis=model_axis)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(resh, shardings)
