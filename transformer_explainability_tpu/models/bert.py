"""Explainable BERT — TPU-native (JAX) redesign.

Functional re-architecture of the reference's
``BERT_explainability/modules/BERT/BERT.py`` (BertModel rebuilt on the LRP
op library) + ``BertForSequenceClassification.py`` (classifier head with
``relprop`` chain). Same design as :mod:`.vit`: stacked per-layer params,
``lax.scan`` forward storing two anchors per layer (the layer input and the
post-attention LayerNorm output), reverse-scan relprop that recomputes the
rest bitwise, attention-gradient taps instead of backward hooks.

BERT specifics handled here (vs. ViT):
  * post-norm residuals: Add comes *before* LayerNorm
    (reference ``BERT.py:420-425,467-472``), so the LN-identity rule sits on
    the other side of the residual split;
  * separate Q/K/V Linears fed by a 3-way Clone nested inside the 2-way
    attention Clone (``BERT.py:319,227``) — relprop merges both fan-outs;
  * the additive attention mask enters through a renormalizing Add module
    (``BERT.py:342``), so padding participates in the relevance split;
  * optional head-mask Mul (``BERT.py:356,375-377``);
  * the full-LRP chain stops at the embedding output (``BertModel.relprop``
    never descends into ``BertEmbeddings``, ``BERT.py:645-651``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_explainability_tpu.ops import relprop as rp
from transformer_explainability_tpu.ops import pallas_kernels as pk
from transformer_explainability_tpu.models.vit import (_gelu_grad,
                                                       _layernorm,
                                                       _layernorm_bwd,
                                                       _mxu_name)

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    num_labels: int = 2
    # transformers 3.5.1 extends 0/1 masks as (1-mask)*-10000
    # (the reference's dependency pin); newer transformers use finfo.min —
    # configurable for exact parity against either.
    mask_value: float = -10000.0
    hidden_act: str = "gelu"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


BERT_BASE_UNCASED = BertConfig()


def _act(x: Array, name: str) -> Array:
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "tanh":
        return jnp.tanh(x)
    raise ValueError(name)


def init_params(key: jax.Array, cfg: BertConfig, dtype=jnp.float32) -> Params:
    """Random init (normal 0.02, the BERT initializer_range default).

    BACKEND-DETERMINISTIC: computed on the host CPU then transferred —
    same seed must mean the same model on every backend (the normal
    transform's transcendentals differ by ulps across lowerings; see
    vit.init_params)."""
    with jax.default_device(jax.devices("cpu")[0]):
        params = _init_params_impl(key, cfg, dtype)
    if jax.default_backend() != "cpu":
        params = jax.device_put(params, jax.devices()[0])
    return params


def _init_params_impl(key: jax.Array, cfg: BertConfig, dtype) -> Params:
    ks = jax.random.split(key, 12)
    D, L, I = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size

    def nrm(k, shape):
        return 0.02 * jax.random.normal(k, shape, dtype)

    def ln():
        return {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)}

    def lin(k, fi, fo):
        return {"kernel": nrm(k, (L, fi, fo)), "bias": jnp.zeros((L, fo), dtype)}

    return {
        "embeddings": {
            "word": nrm(ks[0], (cfg.vocab_size, D)),
            "position": nrm(ks[1], (cfg.max_position_embeddings, D)),
            "token_type": nrm(ks[2], (cfg.type_vocab_size, D)),
            "ln": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        },
        "layers": {
            "q": lin(ks[3], D, D), "k": lin(ks[4], D, D), "v": lin(ks[5], D, D),
            "attn_out": lin(ks[6], D, D), "attn_ln": ln(),
            "inter": lin(ks[7], D, I), "out": lin(ks[8], I, D), "out_ln": ln(),
        },
        "pooler": {"kernel": nrm(ks[9], (D, D)), "bias": jnp.zeros((D,), dtype)},
        "classifier": {"kernel": nrm(ks[10], (D, cfg.num_labels)),
                       "bias": jnp.zeros((cfg.num_labels,), dtype)},
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _heads(x: Array, cfg: BertConfig) -> Array:
    """(S, D) -> (h, S, hd) (transpose_for_scores, BERT.py:299-302)."""
    S = x.shape[0]
    return x.reshape(S, cfg.num_heads, cfg.head_dim).transpose(1, 0, 2)


def _unheads(x: Array) -> Array:
    """(h, S, hd) -> (S, D) (transpose_for_scores_relprop / context merge)."""
    h, S, d = x.shape
    return x.transpose(1, 0, 2).reshape(S, h * d)


class LayerActs(NamedTuple):
    q: Array            # (h, S, hd)
    k: Array
    v: Array
    scaled: Array       # scaled scores BEFORE the mask add (h, S, S)
    probs: Array        # post-softmax attention (h, S, S)
    ctx: Array          # merged context (S, D) — attn_out dense input
    dense_out: Array    # attn_out dense output (S, D) — residual add operand
    att_mid: Array      # dense_out + x_in, pre-LN
    inter_pre: Array    # intermediate dense output (S, I) — pre-activation
    inter_g: Array      # activation output (S, I) — out dense input
    dense2: Array       # out dense output (S, D)
    # post-head-mask probabilities — what the AV matmul actually consumed
    # (None when no head_mask: == probs). Reference BERT.py:356.
    probs_m: Optional[Array] = None


def _layer_acts(x_in: Array, att_ln: Optional[Array], lp: Params,
                ext_mask: Array, cfg: BertConfig,
                tap: Optional[Array] = None,
                attn_precision: Optional[str] = None,
                head_mask: Optional[Array] = None
                ) -> Tuple[Array, Array, LayerActs]:
    """One encoder layer from its input. ``att_ln`` may be passed (relprop
    recompute path, bitwise equal to forward) or None to compute it.
    ``attn_precision`` pins the QK^T/AV einsums (the precision-sensitive
    island — same contract as vit._block_acts). ``head_mask``: optional
    per-head multiplier (h,), applied to the post-softmax (post-save,
    post-tap) probabilities — reference ``BERT.py:355-356``. Returns
    (att_ln, layer_out, acts)."""
    ap = attn_precision
    q = _heads(x_in @ lp["q"]["kernel"] + lp["q"]["bias"], cfg)
    k = _heads(x_in @ lp["k"]["kernel"] + lp["k"]["bias"], cfg)
    v = _heads(x_in @ lp["v"]["kernel"] + lp["v"]["bias"], cfg)
    raw = jnp.einsum("hid,hjd->hij", q, k, precision=ap)
    scaled = raw / jnp.sqrt(jnp.asarray(cfg.head_dim, x_in.dtype))
    probs = jax.nn.softmax(scaled + ext_mask, axis=-1)
    if tap is not None:
        probs = probs + tap
    probs_m = None
    if head_mask is not None:
        probs_m = probs * head_mask[:, None, None]
    ctx = _unheads(jnp.einsum("hij,hjd->hid",
                              probs if probs_m is None else probs_m, v,
                              precision=ap))
    dense_out = ctx @ lp["attn_out"]["kernel"] + lp["attn_out"]["bias"]
    att_mid = dense_out + x_in
    if att_ln is None:
        att_ln = _layernorm(att_mid, lp["attn_ln"], cfg.layer_norm_eps)

    inter_pre = att_ln @ lp["inter"]["kernel"] + lp["inter"]["bias"]
    inter_g = _act(inter_pre, cfg.hidden_act)
    dense2 = inter_g @ lp["out"]["kernel"] + lp["out"]["bias"]
    out = _layernorm(dense2 + att_ln, lp["out_ln"], cfg.layer_norm_eps)
    return att_ln, out, LayerActs(q, k, v, scaled, probs, ctx, dense_out,
                                  att_mid, inter_pre, inter_g, dense2,
                                  probs_m)


class Residuals(NamedTuple):
    x0: Array        # embedding output / encoder input (S, D)
    x_ins: Array     # (L, S, D) layer inputs
    att_lns: Array   # (L, S, D) post-attention LN outputs
    seq_out: Array   # encoder output (S, D)
    first_tok: Array  # pooler dense input (D,)
    pooled: Array    # pooled output (D,) — classifier input
    probs: Array     # (L, h, S, S) attention probabilities
    ext_mask: Array  # (S,) additive mask
    # rich forward anchors (kernel path only; PERF.md round 3c): dict with
    # "attn" -> stacked (L, ...) slim (qkv_pres, ctxs, dense_nbs) or fat
    # (qkv_pres, dots, probs, ctxs, dense_nbs) tuple, and optionally
    # "mlp" -> (inter_pres, dense2_nbs), from
    # bert_layer_fwd_core(save_attn=True[, save_probs][, save_mlp])
    rich: Optional[dict] = None


def embed(params: Params, input_ids: Array, token_type_ids: Array,
          position_ids: Array, cfg: BertConfig) -> Array:
    e = params["embeddings"]
    x = (e["word"][input_ids] + e["position"][position_ids]
         + e["token_type"][token_type_ids])
    return _layernorm(x, e["ln"], cfg.layer_norm_eps)


def forward_collect(params: Params, input_ids: Array, attention_mask: Array,
                    cfg: BertConfig, token_type_ids: Optional[Array] = None,
                    position_ids: Optional[Array] = None,
                    taps: Optional[Array] = None,
                    use_kernel: bool = False,
                    matmul_precision: str = "float32",
                    attn_precision: Optional[str] = None,
                    mlp_precision: Optional[str] = None,
                    head_mask: Optional[Array] = None,
                    rich_anchors: bool = False,
                    rich_probs: bool = False,
                    rich_mlp: bool = False
                    ) -> Tuple[Array, Residuals]:
    """Per-example forward; input_ids (S,) int32, attention_mask (S,) {0,1}.
    Returns (logits, residuals).

    ``use_kernel``: run each layer as ONE fused Pallas program
    (pk.bert_layer_fwd_core) saving only the two (S, D) anchors — the
    (L, h, S, S) attention probabilities (151 MB per example at S=512) are
    never materialized in HBM; ``Residuals.probs`` comes back None (the
    kernel path only serves ``transformer_attribution``, which never reads
    it). Requires ``taps is None``."""
    S = input_ids.shape[0]
    if token_type_ids is None:
        token_type_ids = jnp.zeros((S,), jnp.int32)
    if position_ids is None:
        position_ids = jnp.arange(S, dtype=jnp.int32)
    x0 = embed(params, input_ids, token_type_ids, position_ids, cfg)
    ext_mask = (1.0 - attention_mask.astype(x0.dtype)) * cfg.mask_value

    if use_kernel:
        assert taps is None, "taps are not supported on the kernel path"
        assert head_mask is None, \
            "head_mask is an XLA-path feature (dormant in the reference)"
        assert cfg.hidden_act == "gelu", \
            "the fused layer kernels hardcode exact GELU; use the XLA path"
        fwd_mxu = _mxu_name(attn_precision, matmul_precision)
        mlp_mxu = (_mxu_name(mlp_precision, matmul_precision)
                   if mlp_precision is not None else None)
        w_prep = pk.prepare_bert_weights(params["layers"], matmul_precision)

        # Python-unrolled layer loop (like the ViT megakernel path): inside
        # a lax.scan/while body XLA drops the pallas_call's vmem_limit_bytes
        # and reverts to the 16 MiB scoped-VMEM default, which the fused
        # kernels exceed ("Scoped allocation ... limit 16.00M" at S=512).
        n_attn = (5 if rich_probs else 3) if rich_anchors else 0
        n_mlp = 2 if (rich_anchors and rich_mlp) else 0
        x, xs_l, atts_l = x0, [], []
        attn_l = [[] for _ in range(n_attn)]
        mlp_l = [[] for _ in range(n_mlp)]
        for l in range(cfg.num_layers):
            lp_l = jax.tree.map(lambda a: a[l], params["layers"])
            ws_l = tuple(w[l] for w in w_prep)
            outs = pk.bert_layer_fwd_core(
                x, ext_mask, lp_l, cfg.num_heads, cfg.head_dim,
                cfg.layer_norm_eps, mxu=matmul_precision, attn_mxu=fwd_mxu,
                mlp_mxu=mlp_mxu, ws=ws_l, save_attn=rich_anchors,
                save_probs=rich_anchors and rich_probs,
                save_mlp=bool(n_mlp))
            out, att_ln = outs[:2] if rich_anchors else outs
            for i in range(n_attn):
                attn_l[i].append(outs[2 + i])
            for i in range(n_mlp):
                mlp_l[i].append(outs[2 + n_attn + i])
            xs_l.append(x)
            atts_l.append(att_ln)
            x = out
        seq_out = x
        x_ins, att_lns = jnp.stack(xs_l), jnp.stack(atts_l)
        rich = None
        if rich_anchors:
            rich = {"attn": tuple(jnp.stack(a) for a in attn_l)}
            if n_mlp:
                rich["mlp"] = tuple(jnp.stack(a) for a in mlp_l)
        probs = None
    else:
        @jax.checkpoint
        def step(x, inp):
            # remat: see vit.forward_collect — backward recomputes layer
            # internals from the carried anchors.
            lp, tap, hm = inp
            att_ln, out, acts = _layer_acts(x, None, lp, ext_mask, cfg, tap,
                                            attn_precision=attn_precision,
                                            head_mask=hm)
            return out, (x, att_ln, acts.probs)

        tap_seq = taps if taps is not None else jnp.zeros(
            (cfg.num_layers, cfg.num_heads, S, S), x0.dtype)
        seq_out, (x_ins, att_lns, probs) = jax.lax.scan(
            step, x0, (params["layers"], tap_seq, head_mask))
        rich = None

    first_tok = seq_out[0]
    pooled = jnp.tanh(first_tok @ params["pooler"]["kernel"]
                      + params["pooler"]["bias"])
    logits = pooled @ params["classifier"]["kernel"] + params["classifier"]["bias"]
    res = Residuals(x0, x_ins, att_lns, seq_out, first_tok, pooled, probs,
                    ext_mask, rich)
    return logits, res


def forward(params, input_ids, attention_mask, cfg, **kw) -> Array:
    return forward_collect(params, input_ids, attention_mask, cfg, **kw)[0]


def _dropout(x: Array, rate: float, key: jax.Array) -> Array:
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def train_forward(params: Params, input_ids: Array, attention_mask: Array,
                  cfg: BertConfig, rng: jax.Array,
                  hidden_dropout: float = 0.1,
                  attn_dropout: float = 0.1) -> Array:
    """Training-mode per-example forward with HF-placement dropout (after
    embeddings, on attention probs, after each residual dense, and on the
    pooled output before the classifier). The eval/relprop path
    (:func:`forward_collect`) stays dropout-free, matching the reference
    which only ever explains models in ``.eval()`` mode."""
    S = input_ids.shape[0]
    x = embed(params, input_ids, jnp.zeros((S,), jnp.int32),
              jnp.arange(S, dtype=jnp.int32), cfg)
    ext_mask = (1.0 - attention_mask.astype(x.dtype)) * cfg.mask_value
    rngs = jax.random.split(rng, 3 * cfg.num_layers + 2)
    x = _dropout(x, hidden_dropout, rngs[0])

    def step(x, inp):
        lp, ks = inp
        q = _heads(x @ lp["q"]["kernel"] + lp["q"]["bias"], cfg)
        k = _heads(x @ lp["k"]["kernel"] + lp["k"]["bias"], cfg)
        v = _heads(x @ lp["v"]["kernel"] + lp["v"]["bias"], cfg)
        scaled = jnp.einsum("hid,hjd->hij", q, k) / jnp.sqrt(
            jnp.asarray(cfg.head_dim, x.dtype))
        probs = jax.nn.softmax(scaled + ext_mask, axis=-1)
        probs = _dropout(probs, attn_dropout, ks[0])
        ctx = _unheads(jnp.einsum("hij,hjd->hid", probs, v))
        dense_out = ctx @ lp["attn_out"]["kernel"] + lp["attn_out"]["bias"]
        dense_out = _dropout(dense_out, hidden_dropout, ks[1])
        att_ln = _layernorm(dense_out + x, lp["attn_ln"], cfg.layer_norm_eps)
        inter_g = _act(att_ln @ lp["inter"]["kernel"] + lp["inter"]["bias"],
                       cfg.hidden_act)
        dense2 = inter_g @ lp["out"]["kernel"] + lp["out"]["bias"]
        dense2 = _dropout(dense2, hidden_dropout, ks[2])
        out = _layernorm(dense2 + att_ln, lp["out_ln"], cfg.layer_norm_eps)
        return out, None

    # 3 dropout sites per layer (HF placement: attention probs, self-output
    # dense, output dense)
    layer_keys = rngs[1:1 + 3 * cfg.num_layers].reshape(
        (cfg.num_layers, 3) + rngs.shape[1:])
    seq_out, _ = jax.lax.scan(step, x, (params["layers"], layer_keys))
    pooled = jnp.tanh(seq_out[0] @ params["pooler"]["kernel"]
                      + params["pooler"]["bias"])
    pooled = _dropout(pooled, hidden_dropout, rngs[-1])
    return pooled @ params["classifier"]["kernel"] + params["classifier"]["bias"]


# ---------------------------------------------------------------------------
# Relprop
# ---------------------------------------------------------------------------

def layer_relprop(R: Array, x_in: Array, att_ln: Array, lp: Params,
                  ext_mask: Array, cfg: BertConfig, alpha: float,
                  variant: str, acts: Optional[LayerActs] = None,
                  relprop_precision: Optional[str] = None,
                  head_mask: Optional[Array] = None
                  ) -> Tuple[Array, Array]:
    """LRP through one encoder layer (reference BertLayer.relprop
    ``BERT.py:521-530`` + BertSelfAttention.relprop ``:367-409``).
    Returns (R_in, attn_cam). ``relprop_precision`` optionally runs the
    rules at a different MXU precision than the ambient one (see
    vit.block_relprop). ``head_mask``: per-head multiplier (h,) — adds the
    z-rule Mul split after the AV split, keeping the probs branch
    (reference ``BERT.py:375-377``; the reference's own path is broken
    upstream — its forward never calls ``self.mul`` — so this implements
    the intended semantics, tested against the hook-repaired reference)."""
    # recompute OUTSIDE the rule-precision context: the z-rule linearization
    # points must match the forward anchors (ambient precision)
    if acts is None:
        _, _, acts = _layer_acts(x_in, att_ln, lp, ext_mask, cfg,
                                 head_mask=head_mask)
    if relprop_precision is not None:
        with jax.default_matmul_precision(relprop_precision):
            return layer_relprop(R, x_in, att_ln, lp, ext_mask, cfg, alpha,
                                 variant, acts, head_mask=head_mask)

    # BertOutput: LN(id) -> add split -> dropout(id) -> dense
    R1, R2 = rp.add_relprop(acts.dense2, att_ln, R, variant)
    R1 = rp.linear_alphabeta(acts.inter_g, lp["out"]["kernel"], R1,
                             alpha, variant,
                             y_pre=acts.dense2 - lp["out"]["bias"])
    # BertIntermediate: act(id) -> dense
    R1 = rp.linear_alphabeta(att_ln, lp["inter"]["kernel"], R1, alpha,
                             variant,
                             y_pre=acts.inter_pre - lp["inter"]["bias"])
    R_att = rp.clone_relprop(att_ln, [R1, R2])

    # BertSelfOutput: LN(id) -> add split -> dropout(id) -> dense
    R1, R2 = rp.add_relprop(acts.dense_out, x_in, R_att, variant)
    R1 = rp.linear_alphabeta(acts.ctx, lp["attn_out"]["kernel"], R1,
                             alpha, variant,
                             y_pre=acts.dense_out - lp["attn_out"]["bias"])

    # BertSelfAttention
    cam = _heads(R1, cfg)                                   # (h, S, hd)
    cam1, cam_v = rp.einsum_av_relprop(
        acts.probs if acts.probs_m is None else acts.probs_m, acts.v, cam)
    cam1 = cam1 / 2
    cam_v = cam_v / 2
    if acts.probs_m is not None:
        # head-mask Mul split, probs branch kept (BERT.py:375-377)
        cam1, _ = rp.mul_relprop(
            acts.probs, jnp.broadcast_to(head_mask[:, None, None],
                                         acts.probs.shape), cam1)
    attn_cam = cam1                                         # save_attn_cam
    # dropout, softmax: identity
    # attention-mask Add (masked scores = scaled + ext_mask, BERT.py:342)
    cam1, _ = rp.add_relprop(acts.scaled, jnp.broadcast_to(
        ext_mask, acts.scaled.shape), cam1, variant)
    cam_q, cam_k = rp.einsum_qk_relprop(acts.q, acts.k, cam1)
    cam_q = cam_q / 2
    cam_k = cam_k / 2
    Rq = rp.linear_alphabeta(x_in, lp["q"]["kernel"], _unheads(cam_q),
                             alpha, variant,
                             y_pre=_unheads(acts.q) - lp["q"]["bias"])
    Rk = rp.linear_alphabeta(x_in, lp["k"]["kernel"], _unheads(cam_k),
                             alpha, variant,
                             y_pre=_unheads(acts.k) - lp["k"]["bias"])
    Rv = rp.linear_alphabeta(x_in, lp["v"]["kernel"], _unheads(cam_v),
                             alpha, variant,
                             y_pre=_unheads(acts.v) - lp["v"]["bias"])
    R_h1 = rp.clone_relprop(x_in, [Rq, Rk, Rv])      # 3-way clone (BERT.py:319)
    R_in = rp.clone_relprop(x_in, [R_h1, R2])        # 2-way clone (BERT.py:227)
    return R_in, attn_cam


def relprop(params: Params, res: Residuals, R_logits: Array, cfg: BertConfig,
            alpha: float = 1.0, variant: str = "ours",
            head_mask: Optional[Array] = None) -> Tuple[Array, Array]:
    """classifier -> pooler -> encoder reversed (reference
    BertForSequenceClassification.relprop + BertModel.relprop). Thin wrapper
    over the fused :func:`reverse_pass` with gradients disabled.
    ``head_mask``: the (L, h) multiplier the forward was run with."""
    R_tokens, attn_cams, _ = reverse_pass(
        params, res, R_logits, cfg, alpha=alpha, variant=variant,
        need_grads=False, need_relprop=True, head_mask=head_mask)
    return R_tokens, attn_cams


def _act_grad(pre: Array, name: str) -> Array:
    if name == "gelu":
        return _gelu_grad(pre)          # shared exact-erf form (vit.py)
    if name == "relu":
        return (pre > 0).astype(pre.dtype)
    if name == "tanh":
        t = jnp.tanh(pre)
        return 1.0 - t * t
    raise ValueError(name)


def layer_backward(g_out: Array, x_in: Array, att_ln: Array,
                   acts: LayerActs, lp: Params, cfg: BertConfig,
                   attn_precision: Optional[str] = None,
                   head_mask: Optional[Array] = None
                   ) -> Tuple[Array, Array]:
    """Hand-written VJP of one encoder layer from saved activations: returns
    (g_in, g_probs) with g_probs the cotangent of the post-softmax attention
    (the reference's hook gradient, BERT.py:347-348 — registered BEFORE the
    optional head-mask Mul, so with a mask the hook gradient carries the
    mask factor). No forward recompute."""
    # output sub-block: out = LN(dense2 + att_ln)
    g_sum2 = _layernorm_bwd(g_out, acts.dense2 + att_ln, lp["out_ln"],
                            cfg.layer_norm_eps)
    g_ig = g_sum2 @ lp["out"]["kernel"].T
    g_h1 = g_ig * _act_grad(acts.inter_pre, cfg.hidden_act)
    g_attln = g_sum2 + g_h1 @ lp["inter"]["kernel"].T

    # attention sub-block: att_ln = LN(dense_out + x_in)
    g_sum1 = _layernorm_bwd(g_attln, acts.att_mid, lp["attn_ln"],
                            cfg.layer_norm_eps)
    g_ctx = g_sum1 @ lp["attn_out"]["kernel"].T
    g_o = _heads(g_ctx, cfg)
    ap = attn_precision
    probs_av = acts.probs if acts.probs_m is None else acts.probs_m
    g_probs = jnp.einsum("hid,hjd->hij", g_o, acts.v, precision=ap)
    g_v = jnp.einsum("hij,hid->hjd", probs_av, g_o, precision=ap)
    if acts.probs_m is not None:
        g_probs = g_probs * head_mask[:, None, None]
    inner = (g_probs * acts.probs).sum(axis=-1, keepdims=True)
    g_raw = (acts.probs * (g_probs - inner)) / jnp.sqrt(
        jnp.asarray(cfg.head_dim, x_in.dtype))
    g_q = jnp.einsum("hij,hjd->hid", g_raw, acts.k, precision=ap)
    g_k = jnp.einsum("hij,hid->hjd", g_raw, acts.q, precision=ap)
    g_in = (g_sum1
            + _unheads(g_q) @ lp["q"]["kernel"].T
            + _unheads(g_k) @ lp["k"]["kernel"].T
            + _unheads(g_v) @ lp["v"]["kernel"].T)
    return g_in, g_probs


def reverse_pass(params: Params, res: Residuals, onehot: Array,
                 cfg: BertConfig, alpha: float = 1.0, variant: str = "ours",
                 need_grads: bool = True, need_relprop: bool = True,
                 relprop_precision: Optional[str] = None,
                 use_kernel: bool = False,
                 matmul_precision: str = "float32",
                 attn_precision: Optional[str] = None,
                 mlp_precision: Optional[str] = None,
                 fuse_grad_cam: bool = False,
                 head_mask: Optional[Array] = None
                 ) -> Tuple[Optional[Array], Optional[Array], Optional[Array]]:
    """Fused reverse scan: class gradient w.r.t. every post-softmax attention
    map + LRP relevance, sharing one recompute per layer (see
    :func:`transformer_explainability_tpu.models.vit.reverse_pass`).
    Returns (R_tokens, attn_cams, attn_grads).

    ``use_kernel``: run each layer's reverse as two fused Pallas programs
    (pk.bert_out_rev_core + pk.bert_attn_rev_core) with the per-layer
    ``(grad ⊙ cam)⁺`` head-mean folded in; returns (R_tokens,
    gc_maps (L, S, S), None) — 12× less scan-output HBM than stacking
    cams+grads. Requires both need flags, variant="ours", alpha=1.

    ``fuse_grad_cam``: fold the same head-mean into the XLA scan (the
    transformer_attribution consumer needs ONLY that map): the scan emits
    one (S, S) per layer instead of two (h, S, S) tensors — at S=512
    that is 302 MB/example of avoidable scan-output HBM (the program is
    bandwidth-bound). Same return contract as the kernel path."""
    g_final = None
    if need_grads:
        def tail(seq_out):
            pooled = jnp.tanh(seq_out[0] @ params["pooler"]["kernel"]
                              + params["pooler"]["bias"])
            logits = (pooled @ params["classifier"]["kernel"]
                      + params["classifier"]["bias"])
            return jnp.sum(onehot * logits)
        g_final = jax.grad(tail)(res.seq_out)

    R = None
    if need_relprop:
        R = rp.linear_alphabeta(res.pooled, params["classifier"]["kernel"],
                                onehot, alpha, variant)
        R = rp.linear_alphabeta(res.first_tok, params["pooler"]["kernel"], R,
                                alpha, variant)
        R = rp.index_select_relprop(res.seq_out, 0, jnp.array(0), R[None, :])

    if use_kernel:
        assert head_mask is None, \
            "head_mask is an XLA-path feature (dormant in the reference)"
        assert need_grads and need_relprop and variant == "ours" \
            and alpha == 1.0, "kernel path: fused method, ours rules only"
        assert cfg.hidden_act == "gelu", \
            "the fused layer kernels hardcode exact GELU; use the XLA path"
        mxu = _mxu_name(None, matmul_precision)
        attn_mxu = _mxu_name(attn_precision, matmul_precision)
        rule_mxu = _mxu_name(relprop_precision, matmul_precision)
        mlp_mxu = (_mxu_name(mlp_precision, matmul_precision)
                   if mlp_precision is not None else None)
        w_prep = pk.prepare_bert_weights(params["layers"], mxu)
        nsplit = len(w_prep) // 6 * 4     # attn weights end here

        # Python-unrolled reverse loop — see forward_collect: scan bodies
        # lose the kernels' scoped-VMEM compiler param
        g_out, Rc = g_final, R
        gc_l = [None] * cfg.num_layers
        rich = res.rich or {}
        rich_attn, rich_mlp_t = rich.get("attn"), rich.get("mlp")
        for l in reversed(range(cfg.num_layers)):
            lp_l = jax.tree.map(lambda a: a[l], params["layers"])
            ws_l = tuple(w[l] for w in w_prep)
            # rich anchors (PERF.md round 3c): "attn" = slim
            # (qkv_pre, ctx, dense_nb) or fat (+dots, probs) tuple,
            # "mlp" = (inter_pre_nb, dense2_nb)
            saved_mlp = (tuple(r[l] for r in rich_mlp_t)
                         if rich_mlp_t is not None else None)
            saved_attn = (tuple(r[l] for r in rich_attn)
                          if rich_attn is not None else None)
            g_attln, R_att = pk.bert_out_rev_core(
                res.att_lns[l], g_out, Rc, lp_l, cfg.layer_norm_eps,
                mxu=mxu, rule_mxu=rule_mxu, mlp_mxu=mlp_mxu,
                ws=ws_l[nsplit:], saved=saved_mlp)
            g_out, Rc, gc_l[l] = pk.bert_attn_rev_core(
                res.x_ins[l], g_attln, R_att, res.ext_mask, lp_l,
                cfg.num_heads, cfg.head_dim, cfg.layer_norm_eps,
                mxu=mxu, attn_mxu=attn_mxu, rule_mxu=rule_mxu,
                ws=ws_l[:nsplit], saved=saved_attn)
        return Rc, jnp.stack(gc_l), None

    def step(carry, xs):
        g_out, Rc = carry
        x_in, att_ln, lp, hm = xs
        _, _, acts = _layer_acts(x_in, att_ln, lp, res.ext_mask, cfg,
                                 attn_precision=attn_precision,
                                 head_mask=hm)
        if need_grads:
            g_in, g_tap = layer_backward(g_out, x_in, att_ln, acts, lp, cfg,
                                         attn_precision=attn_precision,
                                         head_mask=hm)
        else:
            g_in, g_tap = g_out, None
        if need_relprop:
            R_in, attn_cam = layer_relprop(Rc, x_in, att_ln, lp,
                                           res.ext_mask, cfg, alpha, variant,
                                           acts=acts,
                                           relprop_precision=relprop_precision,
                                           head_mask=hm)
        else:
            R_in, attn_cam = Rc, None
        if fuse_grad_cam:
            gc = jnp.clip(g_tap * attn_cam, min=0).mean(axis=0)
            return (g_in, R_in), (gc, None)
        return (g_in, R_in), (attn_cam, g_tap)

    if fuse_grad_cam:
        assert need_grads and need_relprop, "fuse_grad_cam needs both passes"
    (_, R_tokens), (attn_cams, attn_grads) = jax.lax.scan(
        step, (g_final if need_grads else jnp.zeros(()),
               R if need_relprop else jnp.zeros(())),
        (res.x_ins, res.att_lns, params["layers"], head_mask), reverse=True)
    if fuse_grad_cam:
        return R_tokens, attn_cams, None
    return (R_tokens if need_relprop else None,
            attn_cams if need_relprop else None,
            attn_grads if need_grads else None)


# The reference's scaled-mask subtlety: BertSelfAttention scales raw scores
# *outside* the MatMul module, so the Add sees post-scale scores while
# matmul1's relprop sees pre-scale products. In `layer_relprop` the pre-scale
# values re-enter via `einsum_qk_relprop(q, k, ...)` whose internal Z is the
# raw q@k^T — matching ``BERT.py:338-342`` exactly.
