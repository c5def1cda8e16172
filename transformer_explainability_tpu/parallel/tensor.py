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
experiments/perf_tp_cost.py): **71% of the single-device megakernel rate
per device** (328.7 vs 466.2 expl/s at n_model=1, trivial psums). The
round-4b first measurement read 40% (186.8); the cliff closed in two
steps — (1) the precision islands (→63%: the TP program had no
relprop/mlp precision knobs, so every rule and MLP dot paid ambient
3-pass tf32 and the attention core's in-kernel rule dots 6-pass f32
where the megakernels run 1-pass bf16), and (2) the TP-split fused MLP
kernels (→71%: ``ops.pallas_kernels.mlp_rev_tp_phase1/2`` — the
single-device MLP core factored at its collective points, five (n, D)
psums per block, reverse loop unrolled to keep the scoped-VMEM caps).
The remaining 29% is the rest of the whole-block megakernel fusion
(LN1/qkv/proj glue + per-kernel fixed costs). TP is for models that
don't fit a chip; for throughput, scale out with dp (its shard_map
wrapper measures free: 468.0). BERT TP is intentionally absent:
BERT-base fits one chip, dp covers serving, SP covers long context
(docs/PARALLELISM.md).

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
                       pre_sharded: bool = False,
                       mlp_kernel: Optional[bool] = None,
                       rich_anchors: Optional[bool] = None):
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

    ``mlp_kernel`` (default on): run the MLP half of each reverse step
    through the TP-split fused kernels (:func:`...ops.pallas_kernels.
    mlp_rev_tp_phase1`/``phase2`` — the single-device MLP core factored at
    its collective points, every (n, M/k) tensor VMEM-resident, five
    (n, D) psums per block). The reverse loop Python-unrolls on TPU (XLA
    drops scoped-VMEM caps inside scan bodies — CLAUDE.md). ``False``
    keeps the round-4 XLA rule path.

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
    mlp_mxu = vit_mod._mxu_name(mlp_precision, matmul_precision)
    if mlp_kernel is None:
        # mirror the single-device design: the f32-HIGHEST MLP stays in XLA
        # (the in-kernel bf16x6 emulation measured SLOWER than XLA's
        # pipelined HIGHEST, and its triple working set is VMEM-heavy —
        # PERF.md round 2d)
        mlp_kernel = mlp_mxu in ("bfloat16", "tensorfloat32")
    if rich_anchors is None:
        # measured a wash on the real chip (345.6 anchors-on vs 346.9 off,
        # interleaved B=32): at XLA level the skipped tf32 recompute dots
        # cost about what the saved (L, n, 3D/k) anchors' HBM traffic
        # costs, and — unlike the in-kernel megakernel anchors — the XLA
        # saves are not bitwise (fusion differences, ~1e-4 heatmap).
        # Default off; the kwarg stays for chips with a different
        # MXU/HBM balance.
        rich_anchors = False
    # big kernels lose their scoped-VMEM cap inside lax.scan bodies
    # (CLAUDE.md) — unroll the reverse loop where the kernels actually run
    unroll_rev = mlp_kernel and jax.default_backend() == "tpu"
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
            qkv_pre_l = xn1 @ bp["qkv"]["kernel"]        # (n, 3D/k) local
            qkv_l = qkv_pre_l + bp["qkv"]["bias"] \
                if "bias" in bp["qkv"] else qkv_pre_l
            out_l = pk.attn_fwd_core(qkv_l, h_loc, d, d ** -0.5,
                                     mxu=attn_mxu)       # (n, D/k)
            proj_pre = jax.lax.psum(out_l @ bp["proj"]["kernel"], model_axis)
            attn_out = proj_pre + bp["proj"]["bias"]
            x_mid = x + attn_out
            xn2 = vit_mod._layernorm(x_mid, bp["norm2"], eps)
            with _ctx(mlp_precision):
                h1_l = xn2 @ bp["fc1"]["kernel"] + bp["fc1"]["bias"]
                hg_l = jax.nn.gelu(h1_l, approximate=False)
                mlp_out = jax.lax.psum(hg_l @ bp["fc2"]["kernel"],
                                       model_axis) + bp["fc2"]["bias"]
            # rich anchors (opt-in): saving qkv_pre/proj_pre skips the
            # reverse step's two recompute dots. Same dots on the same
            # operands, but NOT bitwise at XLA level (fusion differences,
            # unlike the in-kernel megakernel anchors) and measured a
            # wash on this chip — see make_tp_explain_fn
            saved = ((x, x_mid, out_l, qkv_pre_l, proj_pre) if rich_anchors
                     else (x, x_mid, out_l))
            return x_mid + mlp_out, saved

        x_final, fwd_saved = jax.lax.scan(fwd_step, x0, bp_all)
        x_ins, x_mids, out_ls = fwd_saved[:3]

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
            if rich_anchors:
                x_in, x_mid, out_l, qkv_pre_l, proj_pre, bp = xs
            else:
                x_in, x_mid, out_l, bp = xs
            wqkv, wproj = bp["qkv"]["kernel"], bp["proj"]["kernel"]
            w1, w2 = bp["fc1"]["kernel"], bp["fc2"]["kernel"]

            # recompute (replicated LNs; local qkv/proj partials) — or the
            # saved forward anchors
            xn1 = vit_mod._layernorm(x_in, bp["norm1"], eps)
            if not rich_anchors:
                qkv_pre_l = xn1 @ wqkv
                proj_pre = jax.lax.psum(out_l @ wproj, model_axis)
            qkv_l = qkv_pre_l + bp["qkv"]["bias"] \
                if "bias" in bp["qkv"] else qkv_pre_l
            attn_out = proj_pre + bp["proj"]["bias"]
            if mlp_kernel:
                # ---- fused TP MLP core: two local kernels + five (n, D)
                # psums (the single-device MLP core split at its collective
                # points — see ops/pallas_kernels.py) ----
                fc1_pre_l, fc2_pre_l, axw2_l, gxn2_l = pk.mlp_rev_tp_phase1(
                    x_mid, g_out, bp["norm2"], bp["fc1"]["bias"], w1, w2,
                    eps, mxu=mlp_mxu, rule_mxu=rule_mxu)
                fc2_pre = jax.lax.psum(fc2_pre_l, model_axis)
                axw2 = jax.lax.psum(axw2_l, model_axis)
                g_xn2 = jax.lax.psum(gxn2_l, model_axis)
                mlp_out = fc2_pre + bp["fc2"]["bias"]
                g_mid = g_out + vit_mod._layernorm_bwd(
                    g_xn2, x_mid, bp["norm2"], eps)
                R1, R2 = rp.add_relprop(x_mid, mlp_out, Rc, variant)
                Sr = rp.safe_divide(R2, 0.5 * (fc2_pre + axw2))
                num_w_l, num_a_l = pk.mlp_rev_tp_phase2(
                    x_mid, Sr, fc1_pre_l, bp["norm2"], bp["fc1"]["bias"],
                    w1, w2, eps, mxu=mlp_mxu, rule_mxu=rule_mxu)
                xn2 = vit_mod._layernorm(x_mid, bp["norm2"], eps)
                R2b = 0.5 * (xn2 * jax.lax.psum(num_w_l, model_axis)
                             + jnp.abs(xn2)
                             * jax.lax.psum(num_a_l, model_axis))
                Rm = rp.clone_relprop(x_mid, [R1, R2b])
            else:
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
                g_mid = g_out + vit_mod._layernorm_bwd(g_xn2, x_mid,
                                                       bp["norm2"], eps)

                # ---- relprop, MLP half (add/clone replicated; rule dots
                # at the rule-island precision, like single-device) ----
                with _ctx(relprop_precision):
                    R1, R2 = rp.add_relprop(x_mid, mlp_out, Rc, variant)
                    R2_l = _lin_rule_row(hg_l, w2, R2, fc2_pre, model_axis)
                    R2 = _lin_rule_col(xn2, ax2, w1, R2_l, fc1_pre_l,
                                       model_axis)
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

        if unroll_rev:
            # static Python loop: keeps the TP MLP kernels' raised
            # scoped-VMEM caps (lost inside lax.scan bodies — CLAUDE.md)
            carry = (g_final, R)
            gcs = []
            for i in range(cfg.depth - 1, -1, -1):
                bp_i = jax.tree.map(lambda a, _i=i: a[_i], bp_all)
                carry, gc_i = rev_step(
                    carry, tuple(t[i] for t in fwd_saved) + (bp_i,))
                gcs.append(gc_i)
            gc_maps = jnp.stack(gcs[::-1])
        else:
            (_, _), gc_maps = jax.lax.scan(
                rev_step, (g_final, R), fwd_saved + (bp_all,),
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
