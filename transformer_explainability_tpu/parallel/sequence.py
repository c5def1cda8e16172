"""Sequence parallelism (SP): shard the token axis over mesh devices.

The reference caps context by *truncation* (512 wordpieces,
``BERT_params/movies_bert.json:2``; SURVEY §5.7). The TPU-native headroom
story is sharding the sequence across chips with ``shard_map``: every device
holds S/n tokens, computes its Q rows locally, ``all_gather``s K/V over ICI,
and attends its row block against the full sequence — dense attention with
O(S²/n) compute and O(S·D) communication per layer per device.

Two entry points:
  * :func:`make_seq_sharded_bert_forward` — the classification forward
    (serving / fine-tune-scoring path).
  * :func:`make_seq_sharded_bert_explain` — the headline
    ``transformer_attribution`` explanation under SP: the fused
    backward+relprop reverse scan where every dense op's collective mirror
    is explicit — K/V cotangents and relevances ``psum_scatter`` back to
    their owner shards, the renormalizing Add rule's global sums ``psum``
    over the token axis, and the final rollout chain runs on the
    all-gathered per-layer maps. Extends explanation (not just serving) to
    contexts larger than one chip's memory.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map        # jax >= 0.8

    # JAX-VERSION DEPENDENCY (audit this shim on any jax upgrade):
    # check_vma=False changes shard_map's AD transpose — the transpose of
    # a broadcast psum is another psum (replication can't be proven), so
    # gradients through psum'd values arrive n_axis times too large.
    # parallel/pipeline.py's train step compensates with an explicit
    # grads/n_stage divide, pinned by the scale-sensitive
    # test_pp_train_step_matches_single_device (fast tier, the canary).
    # If a jax upgrade changes this transpose (or check_vma is enabled
    # here), that divide silently mis-scales gradients by 1/n_stage.
    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:                                # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

from transformer_explainability_tpu.models import bert as bert_mod
from transformer_explainability_tpu.models.bert import BertConfig


def make_seq_sharded_bert_forward(cfg: BertConfig, mesh: Mesh,
                                  seq_axis: str = "model",
                                  data_axis: Optional[str] = "data",
                                  matmul_precision: str = "bfloat16"):
    """Jitted ``fn(params, input_ids, attention_mask) -> logits``.

    input_ids/attention_mask: (B, S) with B divisible by the data-axis size
    and S by the seq-axis size. Params replicated; K/V all-gathered per layer
    over the ``seq_axis`` (ICI); the CLS hidden state is recovered with a
    masked psum.
    """
    n_seq = mesh.shape[seq_axis]

    def shard_fn(params, ids, ext_mask_full):
        # ids: (B_local, S/n) this shard's token block
        # ext_mask_full: (B_local, S) additive mask, replicated over seq axis
        B, s = ids.shape
        shard = jax.lax.axis_index(seq_axis)
        pos = shard * s + jnp.arange(s, dtype=jnp.int32)
        e = params["embeddings"]
        x = (e["word"][ids] + e["position"][pos][None, :, :]
             + e["token_type"][jnp.zeros((B, s), jnp.int32)])
        x = jax.vmap(lambda t: bert_mod._layernorm(
            t, e["ln"], cfg.layer_norm_eps))(x)

        def layer(x, lp):
            q = x @ lp["q"]["kernel"] + lp["q"]["bias"]
            k = x @ lp["k"]["kernel"] + lp["k"]["bias"]
            v = x @ lp["v"]["kernel"] + lp["v"]["bias"]
            hd, h = cfg.head_dim, cfg.num_heads
            q = q.reshape(B, s, h, hd).transpose(0, 2, 1, 3)
            k = k.reshape(B, s, h, hd).transpose(0, 2, 1, 3)
            v = v.reshape(B, s, h, hd).transpose(0, 2, 1, 3)
            # gather the full K/V over the sequence axis (ICI collective);
            # tiled=True concatenates shard blocks along the token dim
            k_full = jax.lax.all_gather(k, seq_axis, axis=2, tiled=True)
            v_full = jax.lax.all_gather(v, seq_axis, axis=2, tiled=True)
            scores = jnp.einsum("bhid,bhjd->bhij", q, k_full) / jnp.sqrt(
                jnp.asarray(hd, x.dtype))
            probs = jax.nn.softmax(
                scores + ext_mask_full[:, None, None, :], axis=-1)
            ctx = jnp.einsum("bhij,bhjd->bhid", probs, v_full)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, s, h * hd)
            dense = ctx @ lp["attn_out"]["kernel"] + lp["attn_out"]["bias"]
            att_ln = jax.vmap(lambda t: bert_mod._layernorm(
                t, lp["attn_ln"], cfg.layer_norm_eps))(dense + x)
            inter = bert_mod._act(
                att_ln @ lp["inter"]["kernel"] + lp["inter"]["bias"],
                cfg.hidden_act)
            out = inter @ lp["out"]["kernel"] + lp["out"]["bias"]
            return jax.vmap(lambda t: bert_mod._layernorm(
                t, lp["out_ln"], cfg.layer_norm_eps))(out + att_ln), None

        x, _ = jax.lax.scan(layer, x, params["layers"])

        # CLS token lives on shard 0: masked psum recovers it everywhere
        first = jnp.where(shard == 0, x[:, 0, :], jnp.zeros_like(x[:, 0, :]))
        first = jax.lax.psum(first, seq_axis)
        pooled = jnp.tanh(first @ params["pooler"]["kernel"]
                          + params["pooler"]["bias"])
        return (pooled @ params["classifier"]["kernel"]
                + params["classifier"]["bias"])

    dspec = data_axis if data_axis in mesh.shape else None
    in_specs = (P(), P(dspec, seq_axis), P(dspec, None))
    out_specs = P(dspec, None)
    mapped = shard_map(shard_fn, mesh, in_specs, out_specs)

    def fn(params, input_ids, attention_mask):
        with jax.default_matmul_precision(matmul_precision):
            ext = (1.0 - attention_mask.astype(jnp.float32)) * cfg.mask_value
            return mapped(params, input_ids.astype(jnp.int32), ext)

    return jax.jit(fn)


def _add_relprop_sp(a, b, R, variant, seq_axis, Z=None):
    """ops.relprop.add_relprop with the renormalization's global sums
    ``psum``'d over the token axis (the rule's sums are over the WHOLE
    tensor — reference modules/layers_ours.py:109-118 — which under SP spans
    every shard)."""
    from transformer_explainability_tpu.ops.relprop import safe_divide
    if Z is None:
        Z = a + b
    S = safe_divide(R, Z)
    Ca = a * S
    Cb = b * S
    if variant == "lrp":
        return Ca, Cb
    a_sum = jax.lax.psum(Ca.sum(), seq_axis)
    b_sum = jax.lax.psum(Cb.sum(), seq_axis)
    r_sum = jax.lax.psum(R.sum(), seq_axis)
    tot = jnp.abs(a_sum) + jnp.abs(b_sum)
    a_fact = safe_divide(jnp.abs(a_sum), tot) * r_sum
    b_fact = safe_divide(jnp.abs(b_sum), tot) * r_sum
    Ca = Ca * safe_divide(a_fact, a_sum)
    Cb = Cb * safe_divide(b_fact, b_sum)
    return Ca, Cb


def make_seq_sharded_bert_explain(cfg: BertConfig, mesh: Mesh,
                                  seq_axis: str = "model",
                                  data_axis: Optional[str] = "data",
                                  start_layer: int = 11,
                                  alpha: float = 1.0,
                                  variant: str = "ours",
                                  matmul_precision: str = "float32"):
    """Jitted sequence-parallel ``transformer_attribution`` explanation:
    ``fn(params, input_ids, attention_mask, indices) -> (B, S)`` token
    relevance rows (the reference ``Generator.generate_LRP``,
    ExplanationGenerator.py:28-59, CLS-cell min-ed).

    input_ids/attention_mask: (B, S); B divisible by the data-axis size, S by
    the seq-axis size. Every op of the dense fused reverse pass
    (models/bert.py reverse_pass) has its SP mirror here:

      * forward: K/V ``all_gather`` per layer (as in the SP forward);
      * backward: dK/dV partials ``psum_scatter`` to their owner shards;
      * relprop: the K/V relevance partials likewise ``psum_scatter``; the
        renormalizing Add rules ``psum`` their global sums;
      * rollout: per-layer (s, S) grad⊙cam maps ``all_gather`` into the
        (S, S) chain (replicated tail — negligible FLOPs).
    """
    from transformer_explainability_tpu.ops import relprop as rp

    n_seq = mesh.shape[seq_axis]
    hd, h = cfg.head_dim, cfg.num_heads

    def per_example(params, ids, mask_full, index):
        # ids: (s,) this shard's token block; mask_full: (S,)
        s = ids.shape[0]
        S = mask_full.shape[0]
        shard = jax.lax.axis_index(seq_axis)
        pos = shard * s + jnp.arange(s, dtype=jnp.int32)
        e = params["embeddings"]
        x0 = (e["word"][ids] + e["position"][pos]
              + e["token_type"][jnp.zeros((s,), jnp.int32)])
        x0 = bert_mod._layernorm(x0, e["ln"], cfg.layer_norm_eps)
        ext_full = (1.0 - mask_full.astype(x0.dtype)) * cfg.mask_value

        def heads_l(x):
            return x.reshape(-1, h, hd).transpose(1, 0, 2)

        def unheads_l(x):
            return x.transpose(1, 0, 2).reshape(-1, h * hd)

        def layer_fwd(x, lp):
            """Local-rows layer forward; returns (out, att_ln, acts dict)."""
            q = heads_l(x @ lp["q"]["kernel"] + lp["q"]["bias"])
            k_l = heads_l(x @ lp["k"]["kernel"] + lp["k"]["bias"])
            v_l = heads_l(x @ lp["v"]["kernel"] + lp["v"]["bias"])
            k = jax.lax.all_gather(k_l, seq_axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v_l, seq_axis, axis=1, tiled=True)
            raw = jnp.einsum("hid,hjd->hij", q, k)            # (h, s, S)
            scaled = raw / jnp.sqrt(jnp.asarray(hd, x.dtype))
            probs = jax.nn.softmax(scaled + ext_full, axis=-1)
            ctx = unheads_l(jnp.einsum("hij,hjd->hid", probs, v))
            dense_out = ctx @ lp["attn_out"]["kernel"] + lp["attn_out"]["bias"]
            att_mid = dense_out + x
            att_ln = bert_mod._layernorm(att_mid, lp["attn_ln"],
                                         cfg.layer_norm_eps)
            inter_pre = att_ln @ lp["inter"]["kernel"] + lp["inter"]["bias"]
            inter_g = bert_mod._act(inter_pre, cfg.hidden_act)
            dense2 = inter_g @ lp["out"]["kernel"] + lp["out"]["bias"]
            out = bert_mod._layernorm(dense2 + att_ln, lp["out_ln"],
                                      cfg.layer_norm_eps)
            acts = dict(q=q, k_l=k_l, v_l=v_l, k=k, v=v, raw=raw,
                        scaled=scaled, probs=probs, ctx=ctx,
                        dense_out=dense_out, att_mid=att_mid,
                        inter_pre=inter_pre, inter_g=inter_g, dense2=dense2)
            return out, att_ln, acts

        def fwd_step(x, lp):
            out, att_ln, _ = layer_fwd(x, lp)
            return out, (x, att_ln)

        seq_out, (x_ins, att_lns) = jax.lax.scan(fwd_step, x0,
                                                 params["layers"])

        # tail: CLS lives on shard 0; masked psum replicates it
        cls_l = jnp.where(shard == 0, seq_out[0], jnp.zeros_like(seq_out[0]))
        first = jax.lax.psum(cls_l, seq_axis)                 # (D,) replicated
        pooled_pre = first @ params["pooler"]["kernel"] + params["pooler"]["bias"]
        pooled = jnp.tanh(pooled_pre)
        logits = (pooled @ params["classifier"]["kernel"]
                  + params["classifier"]["bias"])
        idx = jnp.where(index >= 0, index, jnp.argmax(logits))
        onehot = jax.nn.one_hot(idx, cfg.num_labels, dtype=logits.dtype)

        # gradient seed (manual tail VJP; logits replicated over seq shards)
        g_pooled = (onehot @ params["classifier"]["kernel"].T
                    ) * (1.0 - pooled * pooled)
        g_first = g_pooled @ params["pooler"]["kernel"].T     # replicated
        g_seq = jnp.zeros_like(seq_out)
        g_seq = jnp.where(shard == 0, g_seq.at[0].set(g_first), g_seq)

        # relevance seed (classifier -> pooler -> IndexSelect scatter)
        R = rp.linear_alphabeta(pooled, params["classifier"]["kernel"],
                                onehot, alpha, variant)
        R = rp.linear_alphabeta(first, params["pooler"]["kernel"], R,
                                alpha, variant)
        S_row = rp.safe_divide(R, first)                      # (D,) replicated
        R_seq = jnp.zeros_like(seq_out)
        R_seq = jnp.where(shard == 0,
                          seq_out * R_seq.at[0].set(S_row), R_seq)

        inv_sqrt = 1.0 / jnp.sqrt(jnp.asarray(hd, x0.dtype))

        def rev_step(carry, xs):
            g_out, Rc = carry
            x_in, att_ln, lp = xs
            _, _, a = layer_fwd(x_in, lp)

            # ---- backward (models/bert.py layer_backward, SP mirrors) ----
            g_sum2 = bert_mod._layernorm_bwd(g_out, a["dense2"] + att_ln,
                                             lp["out_ln"], cfg.layer_norm_eps)
            g_ig = g_sum2 @ lp["out"]["kernel"].T
            g_h1 = g_ig * bert_mod._act_grad(a["inter_pre"], cfg.hidden_act)
            g_attln = g_sum2 + g_h1 @ lp["inter"]["kernel"].T
            g_sum1 = bert_mod._layernorm_bwd(g_attln, a["att_mid"],
                                             lp["attn_ln"],
                                             cfg.layer_norm_eps)
            g_ctx = g_sum1 @ lp["attn_out"]["kernel"].T
            g_o = heads_l(g_ctx)                              # (h, s, hd)
            g_probs = jnp.einsum("hid,hjd->hij", g_o, a["v"])  # (h, s, S)
            g_v_part = jnp.einsum("hij,hid->hjd", a["probs"], g_o)
            g_v_l = jax.lax.psum_scatter(g_v_part, seq_axis,
                                         scatter_dimension=1, tiled=True)
            inner = (g_probs * a["probs"]).sum(axis=-1, keepdims=True)
            g_raw = a["probs"] * (g_probs - inner) * inv_sqrt
            g_q = jnp.einsum("hij,hjd->hid", g_raw, a["k"])
            g_k_part = jnp.einsum("hij,hid->hjd", g_raw, a["q"])
            g_k_l = jax.lax.psum_scatter(g_k_part, seq_axis,
                                         scatter_dimension=1, tiled=True)
            g_in = (g_sum1
                    + unheads_l(g_q) @ lp["q"]["kernel"].T
                    + unheads_l(g_k_l) @ lp["k"]["kernel"].T
                    + unheads_l(g_v_l) @ lp["v"]["kernel"].T)

            # ---- relprop (models/bert.py layer_relprop, SP mirrors) ----
            R1, R2 = _add_relprop_sp(a["dense2"], att_ln, Rc, variant,
                                     seq_axis)
            R1 = rp.linear_alphabeta(a["inter_g"], lp["out"]["kernel"], R1,
                                     alpha, variant,
                                     y_pre=a["dense2"] - lp["out"]["bias"])
            R1 = rp.linear_alphabeta(att_ln, lp["inter"]["kernel"], R1,
                                     alpha, variant,
                                     y_pre=a["inter_pre"] - lp["inter"]["bias"])
            R_att = rp.clone_relprop(att_ln, [R1, R2])
            R1, R2 = _add_relprop_sp(a["dense_out"], x_in, R_att, variant,
                                     seq_axis)
            R1 = rp.linear_alphabeta(a["ctx"], lp["attn_out"]["kernel"], R1,
                                     alpha, variant,
                                     y_pre=a["dense_out"]
                                     - lp["attn_out"]["bias"])
            cam = heads_l(R1)                                 # (h, s, hd)
            Zav = jnp.einsum("hij,hjd->hid", a["probs"], a["v"])
            S1 = rp.safe_divide(cam, Zav)
            cam1 = a["probs"] * jnp.einsum("hid,hjd->hij", S1, a["v"]) / 2
            cv_part = jnp.einsum("hij,hid->hjd", a["probs"], S1)
            cam_v = a["v_l"] * jax.lax.psum_scatter(
                cv_part, seq_axis, scatter_dimension=1, tiled=True) / 2
            attn_cam = cam1
            cam1m, _ = _add_relprop_sp(
                a["scaled"], jnp.broadcast_to(ext_full, a["scaled"].shape),
                cam1, variant, seq_axis)
            S2 = rp.safe_divide(cam1m, a["raw"])
            cam_q = a["q"] * jnp.einsum("hij,hjd->hid", S2, a["k"]) / 2
            ck_part = jnp.einsum("hij,hid->hjd", S2, a["q"])
            cam_k = a["k_l"] * jax.lax.psum_scatter(
                ck_part, seq_axis, scatter_dimension=1, tiled=True) / 2
            Rq = rp.linear_alphabeta(
                x_in, lp["q"]["kernel"], unheads_l(cam_q), alpha, variant,
                y_pre=unheads_l(a["q"]) - lp["q"]["bias"])
            Rk = rp.linear_alphabeta(
                x_in, lp["k"]["kernel"], unheads_l(cam_k), alpha, variant,
                y_pre=unheads_l(a["k_l"]) - lp["k"]["bias"])
            Rv = rp.linear_alphabeta(
                x_in, lp["v"]["kernel"], unheads_l(cam_v), alpha, variant,
                y_pre=unheads_l(a["v_l"]) - lp["v"]["bias"])
            R_h1 = rp.clone_relprop(x_in, [Rq, Rk, Rv])
            R_in = rp.clone_relprop(x_in, [R_h1, R2])

            # fused (grad ⊙ cam)⁺ head-mean, local rows (s, S)
            gc = jnp.clip(g_probs * attn_cam, min=0).mean(axis=0)
            return (g_in, R_in), gc

        (_, _), gc_rows = jax.lax.scan(
            rev_step, (g_seq, R_seq), (x_ins, att_lns, params["layers"]),
            reverse=True)

        # rollout on the gathered maps (BERT variant: row-normalized,
        # reference BERT.py:28-39); replicated tail, negligible FLOPs
        gc_full = jax.lax.all_gather(gc_rows, seq_axis, axis=1, tiled=True)
        joint = rp.compute_rollout(gc_full, start_layer, row_normalize=True)
        row = joint[0]
        return row.at[0].set(row.min())

    def shard_fn(params, ids, mask, index):
        return jax.vmap(per_example, in_axes=(None, 0, 0, 0))(
            params, ids, mask, index)

    dspec = data_axis if data_axis in mesh.shape else None
    mapped = shard_map(shard_fn, mesh,
                       (P(), P(dspec, seq_axis), P(dspec, None), P(dspec)),
                       P(dspec, None))

    def fn(params, input_ids, attention_mask, indices):
        with jax.default_matmul_precision(matmul_precision):
            return mapped(params, input_ids.astype(jnp.int32),
                          attention_mask.astype(jnp.float32),
                          indices.astype(jnp.int32))

    return jax.jit(fn)
