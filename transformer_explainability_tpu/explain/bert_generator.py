"""BERT explanation generators — jitted analogs of the reference
``BERT_explainability/modules/BERT/ExplanationGenerator.py`` (Generator class,
six methods). Same one-program design as the ViT generator; all methods return
the CLS row over tokens (length S), with the reference's special-token
zeroing/min-ing applied.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from transformer_explainability_tpu.models import bert as bert_mod
from transformer_explainability_tpu.models.bert import BertConfig
from transformer_explainability_tpu.ops import pallas_kernels as pk
from transformer_explainability_tpu.ops import relprop as rp

# method -> (needs attention-grads, needs relprop)
# Longest sequence the fused-kernel path auto-enables for (see
# explain_single): BERT-base's position-embedding ceiling. Up to S=384 the
# reverse runs as one fused kernel per layer; beyond, multi-pass (tf32/f32)
# modes switch to the chunked mid + per-head-chunk kernels (the single
# kernel's 12 unrolled heads spill ~112 MB of vector registers past the
# 128 MB chip VMEM — pallas_kernels.bert_attn_rev_core picks the path).
# Measured at S=512 B=8 vs CPU-f32: tf32+f32attn 249 expl/s at corr
# 0.99985 mean / 0.99878 min (XLA f32: 33.7/s); bf16 288/s at 0.996.
KERNEL_MAX_SEQ = 512

METHODS = {
    "transformer_attribution": (True, True),    # generate_LRP (:28-59)
    "last_layer": (False, True),                # generate_LRP_last_layer (:62)
    "full": (False, True),                      # generate_full_lrp (:85)
    "last_layer_attn": (False, False),          # generate_attn_last_layer (:107)
    "rollout": (False, False),                  # generate_rollout (:115)
    "attn_gradcam": (True, False),              # generate_attn_gradcam (:128)
}


def _one_hot_index(logits, index, n):
    idx = jnp.where(index >= 0, index, jnp.argmax(logits, axis=-1))
    return jax.nn.one_hot(idx, n, dtype=logits.dtype)


def explain_single(params, input_ids, attention_mask, index, cfg: BertConfig,
                   method: str = "transformer_attribution",
                   start_layer: int = 11, alpha: float = 1.0,
                   variant: str = "ours",
                   relprop_precision: Optional[str] = None,
                   matmul_precision: str = "float32",
                   attn_precision: Optional[str] = None,
                   use_kernel: Optional[bool] = None,
                   mlp_precision: Optional[str] = None):
    """Per-example BERT explanation. Returns an (S,) token-relevance row.

    ``mlp_precision`` overrides the inter/out dense dots on the fused-kernel
    path only (TPU + transformer_attribution + tf32/bf16 passes); the XLA
    fallback ignores it — see PERF.md's BERT table for the measured modes.

    Self-applies ``jax.default_matmul_precision(matmul_precision)`` so
    direct callers match the make_explain_fn numerics (the XLA-side rule
    dots carry no per-dot ``precision=`` — see the ViT explain_single note,
    PERF.md round 3d).
    """
    with jax.default_matmul_precision(matmul_precision):
        return _explain_single_impl(
            params, input_ids, attention_mask, index, cfg, method,
            start_layer, alpha, variant, relprop_precision,
            matmul_precision, attn_precision, use_kernel, mlp_precision)


def _explain_single_impl(params, input_ids, attention_mask, index, cfg,
                         method, start_layer, alpha, variant,
                         relprop_precision, matmul_precision,
                         attn_precision, use_kernel, mlp_precision):
    if method not in METHODS:
        raise ValueError(
            f"unknown method {method!r}; available: {sorted(METHODS)}")
    needs_grads, needs_relprop = METHODS[method]

    # the headline method routes each layer through the fused Pallas cores
    # on TPU in the reduced-precision modes (see bert.reverse_pass): the
    # (L, h, S, S) probability/cam/grad tensors never reach HBM. Gated at
    # S<=512 (BERT-base's position ceiling); bert_attn_rev_core switches
    # multi-pass modes to the chunked mid + per-head-chunk kernels above
    # S=384 (the single kernel's unrolled heads spill past chip VMEM).
    # semantic eligibility (stated ONCE, applied to BOTH the auto-gate and
    # explicit use_kernel=True requests): the fused cores implement exactly
    # the ours-rules fused method with exact GELU, and their pre-split
    # weights cannot serve a rule/MLP island above the base pass
    eligible = (method == "transformer_attribution"
                and cfg.hidden_act == "gelu"
                and variant == "ours" and alpha == 1.0
                and not pk.islands_exceed_base(
                    matmul_precision, relprop_precision, mlp_precision))
    # an explicit use_kernel=False means "this program must not contain
    # Pallas calls" (e.g. the exact-CPU fallback runs CPU-pinned inside a
    # TPU-default process, where rollout_from_grad_cam's backend auto-gate
    # would wrongly pick the TPU lowering) — same contract as the ViT
    # generator's rollout_pallas (generator.py)
    rollout_pallas = False if use_kernel is False else None
    if use_kernel is None:
        # resource gate (auto only): reduced-precision modes on the real
        # chip at S<=512 (BERT-base's position ceiling); bert_attn_rev_core
        # switches to the chunked kernels above S=384. An explicit
        # use_kernel=True may override these (CPU interpret tests; callers
        # owning the VMEM risk at longer S).
        use_kernel = (eligible
                      and jax.default_backend() == "tpu"
                      and input_ids.shape[0] <= KERNEL_MAX_SEQ
                      and matmul_precision in ("bfloat16", "tensorfloat32"))
    use_kernel = use_kernel and eligible
    # rich anchors (kernel path): the forward kernels additionally emit
    # the slim (qkv_pre, ctx, dense_nb) anchors so the reverse cores skip
    # those recomputes — the BERT analog of the ViT round-3 anchor trade;
    # bit-identical by construction (every saved value is exactly what the
    # reverse recompute would produce). Measured +2-4% at S=512 (PERF.md
    # round 3c; the relevant interleaved A/B — the fat anchors' HBM costs
    # what the skipped passes cost, which is why dots/probs and the MLP
    # anchors default OFF: TE_TPU_RICH_PROBS=1 / TE_TPU_RICH_MLP=1 opt
    # in). Escape hatch: TE_TPU_RICH_ANCHORS=0.
    rich_anchors = (use_kernel
                    and os.environ.get("TE_TPU_RICH_ANCHORS", "1") != "0")
    rich_probs = os.environ.get("TE_TPU_RICH_PROBS", "0") == "1"
    rich_mlp = os.environ.get("TE_TPU_RICH_MLP", "0") == "1"

    logits, res = bert_mod.forward_collect(
        params, input_ids, attention_mask, cfg, use_kernel=use_kernel,
        matmul_precision=matmul_precision, attn_precision=attn_precision,
        mlp_precision=mlp_precision, rich_anchors=rich_anchors,
        rich_probs=rich_probs, rich_mlp=rich_mlp)
    if needs_grads or needs_relprop:
        onehot = _one_hot_index(logits, index, cfg.num_labels)
        # fused reverse scan (bert.reverse_pass): gradients + relprop share
        # one layer recompute
        R_tokens, attn_cams, attn_grads = bert_mod.reverse_pass(
            params, res, onehot, cfg, alpha=alpha, variant=variant,
            need_grads=needs_grads, need_relprop=needs_relprop,
            relprop_precision=relprop_precision, use_kernel=use_kernel,
            matmul_precision=matmul_precision, attn_precision=attn_precision,
            mlp_precision=mlp_precision,
            # the headline method only ever consumes the (grad ⊙ cam)⁺
            # head-mean: fold it into the scan on the XLA path too (the
            # kernel path always does) — (L, S, S) scan output instead of
            # two (L, h, S, S) tensors
            fuse_grad_cam=(method == "transformer_attribution"
                           and not use_kernel))
    else:
        R_tokens = attn_cams = attn_grads = None

    if method == "transformer_attribution":
        # attn_cams is the pre-reduced (L, S, S) (grad ⊙ cam)⁺ head-mean on
        # BOTH paths now (kernel and fused XLA scan); attn_grads is None —
        # the rollout kernel accepts both layouts
        joint = pk.rollout_from_grad_cam(attn_cams, attn_grads, start_layer,
                                         row_normalize=True,
                                         use_pallas=rollout_pallas)
        row = joint[0]
        return row.at[0].set(row.min())          # rollout[:,0,0]=min (:58)

    if method == "last_layer":
        cam = jnp.clip(attn_cams[-1], min=0).mean(axis=0)
        return cam[0].at[0].set(0.0)

    if method == "full":
        cam = R_tokens.sum(axis=-1)              # (S,) token relevance (:103)
        return cam.at[0].set(0.0)

    if method == "last_layer_attn":
        cam = res.probs[-1].mean(axis=0)         # no clamp (:110-113)
        return cam[0].at[0].set(0.0)

    if method == "rollout":
        cams = res.probs.mean(axis=1)
        joint = rp.compute_rollout(cams, start_layer, row_normalize=True)
        return joint[0].at[0].set(0.0)

    if method == "attn_gradcam":
        cam = res.probs[-1]
        grad = attn_grads[-1].mean(axis=(1, 2), keepdims=True)
        cam = jnp.clip((cam * grad).mean(axis=0), min=0)
        cam = (cam - cam.min()) / (cam.max() - cam.min())
        return cam[0].at[0].set(0.0)

    raise AssertionError(method)


def make_explain_fn(cfg: BertConfig, method: str = "transformer_attribution",
                    start_layer: int = 11, alpha: float = 1.0,
                    variant: str = "ours",
                    matmul_precision: str = "float32",
                    relprop_precision: Optional[str] = None,
                    attn_precision: Optional[str] = None,
                    mlp_precision: Optional[str] = None):
    """Jitted, vmapped ``fn(params, input_ids, attention_mask, indices)``.

    input_ids (B, S) int32; attention_mask (B, S); indices (B,) int32 with -1
    = argmax (the reference's ``index=None``). Padding goes through the
    attention mask exactly as in the reference, so a padded batch reproduces
    the reference's per-example (batch-1) results.
    """

    def single(params, ids, mask, index):
        with jax.default_matmul_precision(matmul_precision):
            return explain_single(params, ids, mask, index, cfg, method,
                                  start_layer, alpha, variant,
                                  relprop_precision,
                                  matmul_precision=matmul_precision,
                                  attn_precision=attn_precision,
                                  mlp_precision=mlp_precision)

    return jax.jit(jax.vmap(single, in_axes=(None, 0, 0, 0)))


class BertExplainer:
    """Batched, compiled analog of the reference Generator class."""

    def __init__(self, params, cfg: BertConfig, variant: str = "ours",
                 matmul_precision: str = "float32",
                 relprop_precision: Optional[str] = None,
                 attn_precision: Optional[str] = None,
                 mlp_precision: Optional[str] = None):
        self.params = params
        self.cfg = cfg
        self.variant = variant
        self.matmul_precision = matmul_precision
        self.relprop_precision = relprop_precision
        self.attn_precision = attn_precision
        self.mlp_precision = mlp_precision
        self._fns = {}

    def explain(self, input_ids, attention_mask,
                indices: Optional[np.ndarray] = None,
                method: str = "transformer_attribution",
                start_layer: int = 11, alpha: float = 1.0):
        """Any batch size is accepted; the batch dim is padded to a
        power-of-two bucket (compile-once discipline; sequence length stays
        exact — token results must not depend on mask-padding length).
        Results are sliced back to B."""
        from transformer_explainability_tpu.utils.batching import (
            bucket_size, pad_axis0)
        ids = jnp.asarray(input_ids, jnp.int32)
        if ids.ndim == 1:
            ids = ids[None]
        mask = jnp.asarray(attention_mask, jnp.float32).reshape(ids.shape)
        B = ids.shape[0]
        idx = (jnp.full((B,), -1, jnp.int32) if indices is None
               else jnp.asarray(indices, jnp.int32).reshape(B))
        key = (method, start_layer, alpha, ids.shape[1])
        if key not in self._fns:
            self._fns[key] = make_explain_fn(
                self.cfg, method, start_layer, alpha, self.variant,
                self.matmul_precision, self.relprop_precision,
                self.attn_precision, self.mlp_precision)
        Bp = bucket_size(B)
        out = self._fns[key](self.params, pad_axis0(ids, Bp),
                             pad_axis0(mask, Bp), pad_axis0(idx, Bp))
        return out[:B] if Bp != B else out

    # reference Generator method names
    def generate_LRP(self, ids, mask, index=None, start_layer=11):
        return self.explain(ids, mask, index, "transformer_attribution",
                            start_layer)

    def generate_LRP_last_layer(self, ids, mask, index=None):
        return self.explain(ids, mask, index, "last_layer")

    def generate_full_lrp(self, ids, mask, index=None):
        return self.explain(ids, mask, index, "full")

    def generate_attn_last_layer(self, ids, mask, index=None):
        return self.explain(ids, mask, index, "last_layer_attn")

    def generate_rollout(self, ids, mask, start_layer=0, index=None):
        return self.explain(ids, mask, index, "rollout", start_layer)

    def generate_attn_gradcam(self, ids, mask, index=None):
        return self.explain(ids, mask, index, "attn_gradcam")


def make_cpu_exact_bert_fn(cfg: BertConfig, start_layer: int = 11,
                           matmul_precision: str = "float32",
                           variant: str = "ours"):
    """One-sample exact-CPU BERT ``transformer_attribution`` — the BERT
    analog of :func:`~...explain.generator.make_cpu_exact_fn` (same
    rationale: exact f32 exists only on the host CPU; the TPU "f32" is
    the MXU's bf16x6 emulation, PERF.md round 3d).

    Returns ``fn(params, input_ids, attention_mask, index) -> (S,)``
    (numpy), pinned to the CPU device. Thread-safe (locked cache fill —
    see the ViT twin's round-5e race note)."""
    import threading

    state = {}
    lock = threading.Lock()

    def _fallback(params, ids, mask, index):
        cpu = jax.devices("cpu")[0]
        with lock:
            # id-keyed cache holding a strong ref to the keyed pytree so
            # a recycled id can never resolve to the WRONG weights
            key = id(params)
            if state.get("key") != key or state.get("src") is not params:
                state["params"] = jax.device_put(params, cpu)
                state["src"] = params
                state["key"] = key
            if "fn" not in state:
                def single(p, i, m, ix):
                    # use_kernel=False explicitly: the Pallas cores cannot
                    # run on the CPU device this program is placed on
                    return explain_single(
                        p, i, m, ix, cfg, "transformer_attribution",
                        start_layer=start_layer, variant=variant,
                        matmul_precision=matmul_precision,
                        use_kernel=False)
                state["fn"] = jax.jit(single)
            fn, cpu_params = state["fn"], state["params"]
        return np.asarray(fn(
            cpu_params,
            jax.device_put(np.asarray(ids), cpu),
            jax.device_put(np.asarray(mask), cpu),
            jax.device_put(np.asarray(index), cpu)))

    return _fallback


def make_guarded_bert_explain_fn(cfg: BertConfig, start_layer: int = 11,
                                 agreement: Optional[float] = None,
                                 fallback_precision: str = "float32",
                                 fallback: str = "sync",
                                 return_info: bool = False,
                                 variant: str = "ours",
                                 **precision_overrides):
    """Production-guarded BERT explanations — the strict (per-sample
    numerical-fidelity) mode of the ViT
    :func:`~...explain.generator.make_guarded_explain_fn`, for BERT.

    Runs the production-preset program AND the f32-HIGHEST co-run on
    every batch; a sample whose two token-relevance rows correlate below
    ``agreement`` (default the shared
    :data:`~...explain.generator.STRICT_AGREEMENT` = 0.9999) is re-run
    in exact f32 on the host CPU. Only strict mode exists for BERT: the
    envelope's trust-region diagnostics are emitted by the ViT reverse
    scans and have no BERT counterpart (and envelope mode is an OOD
    detector, not a guarantee — PERF.md rounds 5b/5e).

    Returns ``fn(params, input_ids, attention_mask, indices,
    n_valid=None) -> (B, S) heatmaps`` (numpy), or with
    ``return_info=True`` -> ``(heatmaps, info)`` with
    ``info = {"flagged": bool (B,), "score": float (B,)}`` (score =
    prod-vs-f32 corr). ``fallback="defer"`` skips the CPU re-run and
    only marks flags (the async-queue serving policy).
    """
    from transformer_explainability_tpu.explain.generator import (
        PRECISION_PRESETS, STRICT_AGREEMENT, _batch_corr)

    if fallback not in ("sync", "defer"):
        raise ValueError(f"unknown fallback policy {fallback!r}")
    if agreement is None:
        agreement = STRICT_AGREEMENT
    kwargs = dict(PRECISION_PRESETS["production"])
    kwargs.update(precision_overrides)
    fast = make_explain_fn(cfg, "transformer_attribution",
                           start_layer=start_layer, variant=variant,
                           **kwargs)
    verify = make_explain_fn(cfg, "transformer_attribution",
                             start_layer=start_layer, variant=variant,
                             matmul_precision="float32")
    _fallback = make_cpu_exact_bert_fn(cfg, start_layer=start_layer,
                                       matmul_precision=fallback_precision,
                                       variant=variant)

    def guarded(params, ids, mask, indices,
                n_valid: Optional[int] = None):
        heat = np.array(fast(params, ids, mask, indices))
        hver = np.asarray(verify(params, ids, mask, indices))
        score = _batch_corr(heat, hver)
        flagged = score < agreement
        if n_valid is not None:
            flagged = flagged & (np.arange(len(flagged)) < n_valid)
        if fallback == "sync":
            for i in np.nonzero(flagged)[0]:
                heat[i] = _fallback(params, ids[i], mask[i], indices[i])
        if return_info:
            return heat, {"flagged": flagged, "score": score}
        return heat

    return guarded
