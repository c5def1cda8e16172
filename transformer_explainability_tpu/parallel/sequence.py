"""Sequence parallelism (SP): shard the token axis over mesh devices.

The reference caps context by *truncation* (512 wordpieces,
``BERT_params/movies_bert.json:2``; SURVEY §5.7). The TPU-native headroom
story is sharding the sequence across chips with ``shard_map``: every device
holds S/n tokens, computes its Q rows locally, ``all_gather``s K/V over ICI,
and attends its row block against the full sequence — dense attention with
O(S²/n) compute and O(S·D) communication per layer per device.

Scope: the classification *forward* (serving / fine-tune-scoring path).
Explanations stay within a single shard's context (the reference's operating
range); SP extends the usable context of the underlying classifier.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map        # jax >= 0.8

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
