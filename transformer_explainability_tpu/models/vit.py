"""Explainable Vision Transformer — TPU-native (JAX) redesign.

Functionally equivalent to the reference's ``baselines/ViT/ViT_LRP.py`` (ours
rules) and ``ViT_orig_LRP.py`` (vanilla rules; the ``variant`` argument), but
architected for XLA:

  * Pure functions over an explicit parameter pytree; per-block parameters are
    stacked along a leading ``depth`` axis and the forward/relprop passes are
    ``lax.scan``s over it (one compiled block body instead of 12 unrolled).
  * The forward pass stores only two residuals per block (the block input and
    the post-attention midpoint). Everything else the LRP rules need (normed
    activations, q/k/v, attention probabilities, per-branch outputs) is
    *recomputed* inside the reverse scan from those anchors — bitwise identical
    to the forward values since the same ops run on the same inputs. This is
    the remat trade (FLOPs for HBM bandwidth) that keeps large explanation
    batches on-chip.
  * The patch-embedding conv (kernel == stride) is a patchify + one MXU matmul
    rather than a convolution.
  * Attention gradients (the reference's ``attn.register_hook`` at
    ``ViT_LRP.py:145``) are obtained by differentiating a "tapped" forward
    (zero tensors added to the post-softmax attention) — see
    :mod:`transformer_explainability_tpu.explain.generator`.

All public functions are single-example (image ``(C,H,W)``); batch via vmap.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_explainability_tpu.ops import relprop as rp
from transformer_explainability_tpu.ops import pallas_kernels as pk

Array = jax.Array
Params = Dict[str, Any]

# A/B escape hatch: force the smaller attention/MLP kernels + XLA glue
# instead of the whole-block megakernels (perf/fidelity triage).
_NO_BLOCK_KERNEL = os.environ.get("TE_TPU_NO_BLOCK_KERNEL", "") == "1"


def _mxu_name(precision: Optional[str], default: str = "float32") -> str:
    """Map a jax matmul-precision string to the Pallas kernels' per-dot MXU
    mode: bf16 stays bf16 (1-pass); tf32 runs the kernels' 3-pass bf16×3
    split emulation (Mosaic has no native tf32 pass — this is the same
    algorithm XLA's tensorfloat32 lowers to on TPU); f32 runs
    float32-HIGHEST (6-pass)."""
    p = precision if precision is not None else default
    if p == "bfloat16":
        return "bfloat16"
    if p == "tensorfloat32":
        return "tensorfloat32"
    return "float32"


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    # torch nn.LayerNorm defaults: blocks use eps=1e-6 (ViT_LRP.py:184,187),
    # the final norm uses the 1e-5 default (ViT_LRP.py:266).
    block_ln_eps: float = 1e-6
    final_ln_eps: float = 1e-5
    # DeiT distillation token (timm deit_base_distilled_*). The reference's
    # DeiT path has NO distillation token (ViT_LRP.py:427-436 loads the
    # non-distilled checkpoint into the plain ViT); this is a TPU-build
    # extension: eval logits = (head(cls) + head_dist(dist)) / 2.
    distilled: bool = False

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def num_prefix_tokens(self) -> int:
        return 2 if self.distilled else 1

    @property
    def num_tokens(self) -> int:
        return self.num_patches + self.num_prefix_tokens

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


VIT_BASE_16_224 = ViTConfig()
VIT_LARGE_16_224 = ViTConfig(embed_dim=1024, depth=24, num_heads=16)
# DeiT-base in the reference loads into the identical architecture — the repo
# has no distillation-token path (reference ViT_LRP.py:427-436).
DEIT_BASE_16_224 = ViTConfig()
DEIT_BASE_DISTILLED_16_224 = ViTConfig(distilled=True)


# ---------------------------------------------------------------------------
# Init / parameter structure
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    # truncated at ±2 std, matching the reference's trunc_normal_
    # (baselines/ViT/weight_init.py:6-39)
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def init_params(key: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    """Random init mirroring the reference's ``_init_weights``
    (ViT_LRP.py:292-299): trunc-normal(0.02) linear weights, zero biases,
    unit/zero LayerNorm.

    BACKEND-DETERMINISTIC: the init computation is pinned to the host CPU
    (then transferred to the caller's default device). The trunc-normal
    transcendentals differ by ~7e-7 between TPU and CPU lowerings, so
    without the pin "PRNGKey(0) weights" were a different model per
    backend — and the explain chain is knife-edge to ulp-scale weight
    perturbations on ill-conditioned samples, which silently contaminated
    every TPU-vs-CPU-truth fidelity comparison (found round 4: the
    guarded mode's exact-CPU fallback scored 0.89 against truth because
    it was answering for different weights)."""
    with jax.default_device(jax.devices("cpu")[0]):
        params = _init_params_impl(key, cfg, dtype)
    if jax.default_backend() != "cpu":
        params = jax.device_put(params, jax.devices()[0])
    return params


def _init_params_impl(key: jax.Array, cfg: ViTConfig, dtype) -> Params:
    ks = jax.random.split(key, 16)
    D, L, M, C = cfg.embed_dim, cfg.depth, cfg.mlp_dim, cfg.num_classes
    P = cfg.patch_size
    pe_in = cfg.in_chans * P * P

    def ln():
        return {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)}

    def lin(k, fan_in, fan_out):
        return {"kernel": _trunc_normal(k, (L, fan_in, fan_out), dtype=dtype),
                "bias": jnp.zeros((L, fan_out), dtype)}

    params = {
        "patch_embed": {
            "kernel": _trunc_normal(ks[0], (pe_in, D), dtype=dtype),
            "bias": jnp.zeros((D,), dtype),
        },
        "cls_token": _trunc_normal(ks[1], (1, D), dtype=dtype),
        "pos_embed": _trunc_normal(ks[2], (cfg.num_tokens, D), dtype=dtype),
        **({"dist_token": _trunc_normal(ks[8], (1, D), dtype=dtype),
            "head_dist": {"kernel": _trunc_normal(ks[9], (D, C), dtype=dtype),
                          "bias": jnp.zeros((C,), dtype)}}
           if cfg.distilled else {}),
        "blocks": {
            "norm1": ln(),
            "qkv": lin(ks[3], D, 3 * D),
            "proj": lin(ks[4], D, D),
            "norm2": ln(),
            "fc1": lin(ks[5], D, M),
            "fc2": lin(ks[6], M, D),
        },
        "norm": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        "head": {"kernel": _trunc_normal(ks[7], (D, C), dtype=dtype),
                 "bias": jnp.zeros((C,), dtype)},
    }
    if not cfg.qkv_bias:
        params["blocks"]["qkv"].pop("bias")
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layernorm(x: Array, p: Params, eps: float) -> Array:
    mu = x.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _split_qkv(qkv: Array, cfg: ViTConfig) -> Tuple[Array, Array, Array]:
    """(n, 3D) -> three (h, n, hd); column layout matches the torch rearrange
    'n (qkv h d) -> qkv h n d' (ViT_LRP.py:135)."""
    n = qkv.shape[0]
    x = qkv.reshape(n, 3, cfg.num_heads, cfg.head_dim)
    x = x.transpose(1, 2, 0, 3)
    return x[0], x[1], x[2]


def _merge_heads(x: Array) -> Array:
    """(h, n, hd) -> (n, h*hd)."""
    h, n, d = x.shape
    return x.transpose(1, 0, 2).reshape(n, h * d)


class BlockActs(NamedTuple):
    """Recomputed per-block activations, in forward order."""
    xn1: Array        # norm1 output (n, D)
    qkv: Array        # raw qkv matmul output incl. bias (n, 3D) — the LRP
                      # qkv rule consumes this layout directly; keeping it
                      # avoids re-stacking q/k/v (a (n,3D) transpose pass)
    q: Array          # (h, n, hd)
    k: Array
    v: Array
    attn: Array       # post-softmax (+tap) attention (h, n, n)
    out_merged: Array  # matmul2 output merged (n, D) — proj's input
    attn_out: Array   # proj output (n, D) — add1's second operand
    xn2: Array        # norm2 output (n, D)
    h1: Array         # fc1 output (n, M) — pre-GELU (backward needs gelu'(h1))
    hg: Array         # GELU output (n, M) — fc2's input
    mlp_out: Array    # fc2 output (n, D) — add2's second operand


def _block_acts(x_in: Array, bp: Params, cfg: ViTConfig,
                tap: Optional[Array] = None,
                attn_precision: Optional[str] = None
                ) -> Tuple[Array, Array, BlockActs]:
    """Run one block from its input; returns (x_mid, x_out, acts).

    ``attn_precision`` overrides the MXU pass precision of the attention
    einsums only (QK^T and AV) — the softmax chain is the precision-sensitive
    island (PERF.md), so it can run at float32 while the big Linears run at
    bfloat16."""
    ap = attn_precision
    xn1 = _layernorm(x_in, bp["norm1"], cfg.block_ln_eps)
    qkv = xn1 @ bp["qkv"]["kernel"]
    if "bias" in bp["qkv"]:
        qkv = qkv + bp["qkv"]["bias"]
    q, k, v = _split_qkv(qkv, cfg)
    dots = jnp.einsum("hid,hjd->hij", q, k, precision=ap)
    scale = cfg.head_dim ** -0.5
    attn = jax.nn.softmax(dots * scale, axis=-1)
    if tap is not None:
        attn = attn + tap
    out = jnp.einsum("hij,hjd->hid", attn, v, precision=ap)
    out_merged = _merge_heads(out)
    attn_out = out_merged @ bp["proj"]["kernel"] + bp["proj"]["bias"]
    x_mid = x_in + attn_out

    xn2 = _layernorm(x_mid, bp["norm2"], cfg.block_ln_eps)
    h1 = xn2 @ bp["fc1"]["kernel"] + bp["fc1"]["bias"]
    hg = jax.nn.gelu(h1, approximate=False)
    mlp_out = hg @ bp["fc2"]["kernel"] + bp["fc2"]["bias"]
    x_out = x_mid + mlp_out
    return x_mid, x_out, BlockActs(xn1, qkv, q, k, v, attn, out_merged,
                                   attn_out, xn2, h1, hg, mlp_out)


class Residuals(NamedTuple):
    """Everything the relprop pass needs, collected by ``forward_collect``."""
    x0: Array        # tokens after pos-embed add (n, D) — block 0 input
    cat_x: Array     # tokens before pos-embed add (n, D) — the Add's 1st operand
    x_ins: Array     # (L, n, D) stacked block inputs
    x_mids: Array    # (L, n, D) stacked post-attention midpoints
    x_final: Array   # final block output (n, D)
    xn: Array        # final norm output (n, D) — pool's input
    cls: Array       # pooled CLS (D,) — head's input
    attns: Array     # (L, h, n, n) post-softmax attention probabilities
    # (L, n, D) merged attention outputs — saved ONLY on the fused-kernel
    # path (one extra anchor saves the reverse pass a full attention-forward
    # recompute per block); None otherwise
    outs: Optional[Array] = None
    # rich anchors (megakernel path with save_attn): pre-bias qkv/proj
    # matmul outputs and the per-head attention dots/probs row-stacked
    # (L, h*n, n) — lets the reverse megakernel skip the qkv/proj/QK^T/
    # softmax/AV recomputes (~17% of its MXU passes) at ~6 MB/block of
    # HBM (PERF.md round 3)
    qkv_pres: Optional[Array] = None   # (L, n, 3D)
    proj_pres: Optional[Array] = None  # (L, n, D)
    dots: Optional[Array] = None       # (L, h*n, n)
    probs: Optional[Array] = None      # (L, h*n, n)
    # MLP anchors (megakernel path with save_mlp): pre-bias fc1/fc2 matmul
    # outputs — the reverse megakernel skips the two MLP forward-recompute
    # dots too (~11% more of its passes) at ~+3 MB/block (PERF.md round 3b)
    fc1_pres: Optional[Array] = None   # (L, n, M)
    fc2_pres: Optional[Array] = None   # (L, n, D)


def embed(params: Params, img: Array, cfg: ViTConfig) -> Tuple[Array, Array]:
    """Patchify-matmul embedding + CLS (and optional DIST) concat; returns
    (cat_x, x0).

    The patch matmul is pinned to f32-HIGHEST regardless of the ambient
    matmul precision: x0 roots every downstream chain, and the explain
    program is measurably knife-edge to ~1e-5 x0 perturbations on
    ill-conditioned inputs (a tf32 embed flipped whole catdog heatmaps while
    the same pipeline rooted at an f32 embed was stable — PERF.md round 2b).
    The matmul is ~0.6% of forward FLOPs, so the pin is free."""
    patches = rp.patchify(img, cfg.patch_size)
    tok = (jnp.matmul(patches, params["patch_embed"]["kernel"],
                      precision=jax.lax.Precision.HIGHEST)
           + params["patch_embed"]["bias"])
    prefix = [params["cls_token"]]
    if cfg.distilled:
        prefix.append(params["dist_token"])
    cat_x = jnp.concatenate(prefix + [tok], axis=0)
    x0 = cat_x + params["pos_embed"]
    return cat_x, x0


def forward_collect(params: Params, img: Array, cfg: ViTConfig,
                    taps: Optional[Array] = None,
                    attn_precision: Optional[str] = None,
                    unroll: int = 1,
                    use_attn_kernel: bool = False,
                    matmul_precision: str = "float32",
                    mlp_precision: Optional[str] = None,
                    rich_anchors: bool = False,
                    rich_mlp: bool = True
                    ) -> Tuple[Array, Residuals]:
    """Forward pass returning logits + the residuals for relprop.

    ``taps``: optional (L, h, n, n) zeros added to each layer's post-softmax
    attention; differentiating w.r.t. them yields exactly the gradients the
    reference collects with ``attn.register_hook`` (ViT_LRP.py:144-145).

    ``use_attn_kernel``: route each block's attention through the fused
    Pallas core (qkv stays in its raw (n, 3D) layout — no head split/merge
    transposes reach HBM). Requires ``taps is None``; ``Residuals.attns``
    comes back None (callers on this path never read it).
    """
    cat_x, x0 = embed(params, img, cfg)

    rich = {}
    if use_attn_kernel:
        assert taps is None, "taps are not supported on the kernel path"
        if unroll == 1:
            # a lax.scan/while body drops a pallas_call's vmem_limit_bytes
            # (reverts to the 16 MiB scoped default — CLAUDE.md): the big
            # kernels MUST be Python-unrolled; protect direct callers that
            # did not pass unroll=cfg.depth like the generator does
            unroll = cfg.depth
        fwd_mxu = _mxu_name(attn_precision, matmul_precision)

        if (matmul_precision in ("bfloat16", "tensorfloat32")
                and not _NO_BLOCK_KERNEL
                and not pk.islands_exceed_base(matmul_precision,
                                               mlp_precision)):
            # whole-block forward megakernel (one Pallas program per block).
            # Weights are pre-cast/pre-split ONCE outside the scan and fed
            # through the scan's xs — load-bearing for correctness on this
            # toolchain (see pk.prepare_block_weights).
            w_prep = pk.prepare_block_weights(params["blocks"],
                                              matmul_precision)

            mlp_mxu = (_mxu_name(mlp_precision, matmul_precision)
                       if mlp_precision is not None else None)

            if rich_anchors:
                def step_fused_rich(x, xs):
                    bp, ws = xs
                    outs_k = pk.block_fwd_core(
                        x, bp, cfg.num_heads, cfg.head_dim, cfg.block_ln_eps,
                        mxu=matmul_precision, attn_mxu=fwd_mxu,
                        mlp_mxu=mlp_mxu, ws=ws, save_attn=True,
                        save_mlp=rich_mlp)
                    return outs_k[0], (x,) + outs_k[1:]

                keys = ["x_mids", "outs", "qkv_pres", "proj_pres", "dots",
                        "probs"] + (["fc1_pres", "fc2_pres"] if rich_mlp
                                    else [])
                x_final, (x_ins, *stacked) = jax.lax.scan(
                    step_fused_rich, x0, (params["blocks"], w_prep),
                    unroll=unroll)
                rich = dict(zip(keys, stacked))
                x_mids, outs = rich.pop("x_mids"), rich.pop("outs")
            else:
                def step_fused(x, xs):
                    bp, ws = xs
                    x_out, x_mid, out_merged = pk.block_fwd_core(
                        x, bp, cfg.num_heads, cfg.head_dim, cfg.block_ln_eps,
                        mxu=matmul_precision, attn_mxu=fwd_mxu,
                        mlp_mxu=mlp_mxu, ws=ws)
                    return x_out, (x, x_mid, out_merged)

                x_final, (x_ins, x_mids, outs) = jax.lax.scan(
                    step_fused, x0, (params["blocks"], w_prep), unroll=unroll)
        else:
            def step_lite(x, bp):
                xn1 = _layernorm(x, bp["norm1"], cfg.block_ln_eps)
                qkv_pre = xn1 @ bp["qkv"]["kernel"]
                qkv = qkv_pre
                if "bias" in bp["qkv"]:
                    qkv = qkv + bp["qkv"]["bias"]
                out_merged = pk.attn_fwd_core(
                    qkv, cfg.num_heads, cfg.head_dim, cfg.head_dim ** -0.5,
                    mxu=fwd_mxu)
                proj_pre = out_merged @ bp["proj"]["kernel"]
                attn_out = proj_pre + bp["proj"]["bias"]
                x_mid = x + attn_out
                xn2 = _layernorm(x_mid, bp["norm2"], cfg.block_ln_eps)
                fc1_pre = xn2 @ bp["fc1"]["kernel"]
                h1 = fc1_pre + bp["fc1"]["bias"]
                fc2_pre = (jax.nn.gelu(h1, approximate=False)
                           @ bp["fc2"]["kernel"])
                mlp_out = fc2_pre + bp["fc2"]["bias"]
                ys = (x, x_mid, out_merged)
                if rich_anchors:
                    # XLA-path rich anchors (exact-f32 mode, opt-in via
                    # TE_TPU_RICH_XLA): save the four pre-bias dot outputs
                    # the XLA reverse step (kstep) would otherwise
                    # recompute. Bitwise-identical by construction (the
                    # reverse recompute runs the same dots on the same
                    # operands) but measured speed-NEUTRAL: the f32 mode is
                    # bandwidth/VPU-bound, and the anchors' 4-byte HBM
                    # reads cost what the skipped 6-pass dots cost
                    # (PERF.md round 3c).
                    ys = ys + (qkv_pre, proj_pre, fc1_pre, fc2_pre)
                return x_mid + mlp_out, ys

            x_final, scanned = jax.lax.scan(
                step_lite, x0, params["blocks"], unroll=unroll)
            x_ins, x_mids, outs = scanned[:3]
            if rich_anchors:
                rich = dict(zip(["qkv_pres", "proj_pres",
                                 "fc1_pres", "fc2_pres"], scanned[3:]))
        attns = None
    else:
        @jax.checkpoint
        def step(x, inp):
            # remat: the attention-gradient backward (jax.grad over the taps)
            # recomputes block internals instead of keeping ~10 (n,D)/(h,n,n)
            # tensors per block alive — the HBM trade that unlocks large
            # explanation batches (SURVEY §7 'remat trade').
            bp, tap = inp
            x_mid, x_out, acts = _block_acts(x, bp, cfg, tap, attn_precision)
            return x_out, (x, x_mid, acts.attn)

        tap_seq = taps if taps is not None else jnp.zeros(
            (cfg.depth, cfg.num_heads, cfg.num_tokens, cfg.num_tokens),
            x0.dtype)
        x_final, (x_ins, x_mids, attns) = jax.lax.scan(
            step, x0, (params["blocks"], tap_seq), unroll=unroll)

    xn = _layernorm(x_final, params["norm"], cfg.final_ln_eps)
    cls = xn[0]
    logits = cls @ params["head"]["kernel"] + params["head"]["bias"]
    if cfg.distilled:
        logits_dist = (xn[1] @ params["head_dist"]["kernel"]
                       + params["head_dist"]["bias"])
        logits = (logits + logits_dist) / 2      # timm DeiT eval fusion
    res = Residuals(x0, cat_x, x_ins, x_mids, x_final, xn, cls, attns,
                    outs if use_attn_kernel else None, **rich)
    return logits, res


def forward(params: Params, img: Array, cfg: ViTConfig) -> Array:
    """Plain classification forward (the reference's ``ViT_new`` role — e.g.
    scoring perturbed images, ``pertubation_eval_from_hdf5.py:222``)."""
    return forward_collect(params, img, cfg)[0]


# ---------------------------------------------------------------------------
# Relprop
# ---------------------------------------------------------------------------

# Precision note: measurements (PERF.md) show the LRP *rules* tolerate
# 1-pass bf16 matmuls (relevance errors enter multiplicatively), while the
# forward/backward chain needs >=3-pass tf32 (attention-gradient rounding is
# amplified by softmax saturation). `relprop_precision` selects the rules'
# precision independently of the ambient one.


def block_relprop(R: Array, x_in: Array, x_mid: Array, bp: Params,
                  cfg: ViTConfig, alpha: float, variant: str,
                  acts: Optional[BlockActs] = None,
                  relprop_precision: Optional[str] = None
                  ) -> Tuple[Array, Array, Array]:
    """LRP through one block, reverse order (reference ViT_LRP.py:203-213 and
    Attention.relprop :154-177). Recomputes the block's activations from the
    (x_in, x_mid) anchors unless ``acts`` is supplied (the fused reverse pass
    shares one recompute between gradient and relevance).
    Returns (R_in, attn_cam, v_cam)."""
    # recompute anchors OUTSIDE the rule-precision context: the z-rule
    # linearization points must match the forward anchors (ambient
    # precision), not the reduced rule precision
    if acts is None:
        acts = _block_acts_from_anchors(x_in, x_mid, bp, cfg)
    if relprop_precision is not None:
        with jax.default_matmul_precision(relprop_precision):
            return _block_relprop_impl(R, x_in, x_mid, bp, cfg, alpha,
                                       variant, acts)
    return _block_relprop_impl(R, x_in, x_mid, bp, cfg, alpha, variant, acts)


def _block_relprop_impl(R: Array, x_in: Array, x_mid: Array, bp: Params,
                        cfg: ViTConfig, alpha: float, variant: str,
                        acts: Optional[BlockActs] = None
                        ) -> Tuple[Array, Array, Array]:
    if acts is None:
        acts = _block_acts_from_anchors(x_in, x_mid, bp, cfg)

    # forward pre-bias products from acts (saves one matmul per Linear rule)
    fc2_pre = acts.mlp_out - bp["fc2"]["bias"]
    fc1_pre = acts.h1 - bp["fc1"]["bias"]
    proj_pre = acts.attn_out - bp["proj"]["bias"]
    qkv_pre = acts.qkv                       # (n, 3D), the rule's layout
    if "bias" in bp["qkv"]:
        qkv_pre = qkv_pre - bp["qkv"]["bias"]

    # add2 -> mlp -> norm2(id) -> clone2
    R1, R2 = rp.add_relprop(x_mid, acts.mlp_out, R, variant)
    R2 = rp.linear_alphabeta(acts.hg, bp["fc2"]["kernel"], R2, alpha, variant,
                             y_pre=fc2_pre)
    R2 = rp.linear_alphabeta(acts.xn2, bp["fc1"]["kernel"], R2, alpha,
                             variant, y_pre=fc1_pre)
    R = rp.clone_relprop(x_mid, [R1, R2])

    # add1 -> attention -> norm1(id) -> clone1 (x_mid IS x_in + attn_out,
    # stored by the forward — pass it as Z to skip the re-add)
    R1, R2 = rp.add_relprop(x_in, acts.attn_out, R, variant, Z=x_mid)
    R2 = rp.linear_alphabeta(acts.out_merged, bp["proj"]["kernel"], R2,
                             alpha, variant, y_pre=proj_pre)
    cam = R2.reshape(cfg.num_tokens, cfg.num_heads, cfg.head_dim).transpose(1, 0, 2)
    cam1, cam_v = rp.einsum_av_relprop(acts.attn, acts.v, cam)
    cam1 = cam1 / 2
    cam_v = cam_v / 2
    attn_cam = cam1                       # saved (ViT_LRP.py:165)
    # attn_drop, softmax: identity; the *scale multiply is outside any module
    # so relprop sees the pre-scale matmul1 (ViT_LRP.py:139-141).
    cam_q, cam_k = rp.einsum_qk_relprop(acts.q, acts.k, cam1)
    cam_q = cam_q / 2
    cam_k = cam_k / 2
    # 'qkv h n d -> n (qkv h d)' (ViT_LRP.py:175)
    cam_qkv = jnp.stack([cam_q, cam_k, cam_v], axis=0)       # (3, h, n, hd)
    cam_qkv = cam_qkv.transpose(2, 0, 1, 3).reshape(
        cfg.num_tokens, 3 * cfg.embed_dim)
    R2 = rp.linear_alphabeta(acts.xn1, bp["qkv"]["kernel"], cam_qkv,
                             alpha, variant, y_pre=qkv_pre)
    R_in = rp.clone_relprop(x_in, [R1, R2])
    return R_in, attn_cam, cam_v


def _block_acts_from_anchors(x_in: Array, x_mid: Array, bp: Params,
                             cfg: ViTConfig,
                             attn_precision: Optional[str] = None
                             ) -> BlockActs:
    """Recompute all block activations from the two stored anchors; each value
    is the same op on the same inputs as the forward, hence bitwise equal
    (pass the same ``attn_precision`` as the forward)."""
    xn1 = _layernorm(x_in, bp["norm1"], cfg.block_ln_eps)
    qkv = xn1 @ bp["qkv"]["kernel"]
    if "bias" in bp["qkv"]:
        qkv = qkv + bp["qkv"]["bias"]
    q, k, v = _split_qkv(qkv, cfg)
    dots = jnp.einsum("hid,hjd->hij", q, k, precision=attn_precision)
    attn = jax.nn.softmax(dots * (cfg.head_dim ** -0.5), axis=-1)
    out = jnp.einsum("hij,hjd->hid", attn, v, precision=attn_precision)
    out_merged = _merge_heads(out)
    attn_out = out_merged @ bp["proj"]["kernel"] + bp["proj"]["bias"]
    xn2 = _layernorm(x_mid, bp["norm2"], cfg.block_ln_eps)
    h1 = xn2 @ bp["fc1"]["kernel"] + bp["fc1"]["bias"]
    hg = jax.nn.gelu(h1, approximate=False)
    mlp_out = hg @ bp["fc2"]["kernel"] + bp["fc2"]["bias"]
    return BlockActs(xn1, qkv, q, k, v, attn, out_merged, attn_out,
                     xn2, h1, hg, mlp_out)


def relprop(params: Params, res: Residuals, R_logits: Array, cfg: ViTConfig,
            alpha: float = 1.0, variant: str = "ours"
            ) -> Tuple[Array, Array]:
    """Relevance propagation head -> pool -> norm -> blocks (reversed);
    mirrors reference ViT_LRP.py:324-332. Thin wrapper over the fused
    :func:`reverse_pass` with gradients disabled. Returns
    (R_tokens, attn_cams)."""
    R_tokens, attn_cams, _ = reverse_pass(
        params, res, R_logits, cfg, alpha=alpha, variant=variant,
        need_grads=False, need_relprop=True)
    return R_tokens, attn_cams


def _layernorm_bwd(g_y: Array, x: Array, p: Params, eps: float) -> Array:
    """Cotangent of LayerNorm w.r.t. its input (γ from ``p``)."""
    mu = x.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * inv
    gg = g_y * p["scale"]
    return inv * (gg - gg.mean(axis=-1, keepdims=True)
                  - xhat * (gg * xhat).mean(axis=-1, keepdims=True))


def _gelu_grad(x: Array) -> Array:
    """d/dx gelu(x) (exact erf form): Φ(x) + x·φ(x)."""
    cdf = 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))
    pdf = jnp.exp(-0.5 * x * x) / jnp.sqrt(2.0 * jnp.pi).astype(x.dtype)
    return cdf + x * pdf


def block_backward(g_out: Array, x_in: Array, x_mid: Array,
                   acts: BlockActs, bp: Params, cfg: ViTConfig,
                   attn_precision: Optional[str] = None
                   ) -> Tuple[Array, Array]:
    """Hand-written VJP of one block given its saved activations: returns
    (g_in, g_attn) where g_attn is the cotangent of the post-softmax
    attention (the reference's ``register_hook`` gradient, ViT_LRP.py:145).
    No forward recompute — all linearization points come from ``acts``.

    ``attn_precision`` pins the attention-chain einsums (the hook gradient,
    the softmax backward and its q/k/v cotangents) to a higher MXU precision
    than the ambient one — the saturated-softmax gradient chain is where
    rounding is amplified (PERF.md precision ladder)."""
    ap = attn_precision
    # MLP branch: x_out = x_mid + fc2(gelu(fc1(norm2(x_mid))))
    g_hg = g_out @ bp["fc2"]["kernel"].T                    # (n, M)
    g_h1 = g_hg * _gelu_grad(acts.h1)
    g_xn2 = g_h1 @ bp["fc1"]["kernel"].T                    # (n, D)
    g_mid = g_out + _layernorm_bwd(g_xn2, x_mid, bp["norm2"],
                                   cfg.block_ln_eps)

    # attention branch: x_mid = x_in + proj(merge(attn @ v))
    g_om = g_mid @ bp["proj"]["kernel"].T                   # (n, D)
    n = g_om.shape[0]
    g_o = g_om.reshape(n, cfg.num_heads, cfg.head_dim).transpose(1, 0, 2)
    g_attn = jnp.einsum("hid,hjd->hij", g_o, acts.v,
                        precision=ap)                       # hook gradient
    g_v = jnp.einsum("hij,hid->hjd", acts.attn, g_o, precision=ap)
    # softmax (attn = softmax(dots * scale) + tap; d tap == d attn)
    inner = (g_attn * acts.attn).sum(axis=-1, keepdims=True)
    g_dots = acts.attn * (g_attn - inner) * (cfg.head_dim ** -0.5)
    g_q = jnp.einsum("hij,hjd->hid", g_dots, acts.k, precision=ap)
    g_k = jnp.einsum("hij,hid->hjd", g_dots, acts.q, precision=ap)
    g_qkv = jnp.stack([g_q, g_k, g_v], axis=0)              # (3, h, n, hd)
    g_qkv = g_qkv.transpose(2, 0, 1, 3).reshape(n, 3 * cfg.embed_dim)
    g_xn1 = g_qkv @ bp["qkv"]["kernel"].T
    g_in = g_mid + _layernorm_bwd(g_xn1, x_in, bp["norm1"],
                                  cfg.block_ln_eps)
    return g_in, g_attn


def _trunk_stats(g: Array, R: Array) -> Array:
    """Per-block trunk norms stacked by the reverse scan when
    ``with_trunk_stats`` is on: (|g|_inf, |g|_1, |R|_inf, |R|_1) of the
    carry AFTER each block's reverse step. These are XLA-level reductions
    on tensors the scan already carries (free on every path, megakernels
    included); the guarded mode's trust-region detector consumes their
    cross-block growth ratios (experiments/guarded_stats_cpu.py: per-block
    gradient-magnitude growth separates the ill-conditioned stress regime
    from real-image inputs where no single-realization statistic could)."""
    return jnp.stack([jnp.max(jnp.abs(g)), jnp.sum(jnp.abs(g)),
                      jnp.max(jnp.abs(R)), jnp.sum(jnp.abs(R))
                      ]).astype(jnp.float32)


def reverse_pass(params: Params, res: Residuals, onehot: Array,
                 cfg: ViTConfig, alpha: float = 1.0, variant: str = "ours",
                 need_grads: bool = True, need_relprop: bool = True,
                 relprop_precision: Optional[str] = None,
                 attn_precision: Optional[str] = None,
                 fuse_grad_cam: bool = False,
                 unroll: int = 1,
                 use_attn_kernel: bool = False,
                 matmul_precision: str = "float32",
                 mlp_precision: Optional[str] = None,
                 with_trunk_stats: bool = False
                 ) -> Tuple[Optional[Array], Optional[Array], Optional[Array]]:
    """ONE reverse scan computing the class gradient w.r.t. every post-softmax
    attention map AND the LRP relevance chain, sharing a single recompute of
    each block's activations.

    Replaces the reference's two separate machineries — ``one_hot.backward``
    filling ``attn.register_hook`` gradients (ViT_LRP.py:144-145,
    ViT_explanation_generator.py:31-38) and the Python relprop walk
    (ViT_LRP.py:324-332) — with a fused ``lax.scan``: per block, ``jax.vjp``
    of the block body at tap=0 yields (dL/dx_in, dL/dattn) while its forward
    recompute feeds the relprop rules directly.

    Returns (R_tokens, attn_cams, attn_grads); entries are None when the
    corresponding ``need_*`` flag is False (and XLA never computes them).

    ``fuse_grad_cam=True`` (requires both need flags): the per-block
    ``(grad ⊙ cam)⁺`` head-mean (ViT_LRP.py:358-366) is folded INTO the scan
    body, so the scan stacks one (n, n) map per block instead of two
    (h, n, n) tensors — 24x less scan-output HBM traffic (the profile shows
    the explain program is bandwidth/vector-bound, not MXU-bound). Returns
    (R_tokens, gc_maps (L, n, n), None).

    ``with_trunk_stats=True`` (fused method only): additionally stacks
    :func:`_trunk_stats` per block and returns a 4-tuple
    (R_tokens, gc_maps, None, trunk (L, 4)).
    """
    if with_trunk_stats:
        assert fuse_grad_cam, "trunk stats are emitted by the fused scans"
    # gradient seed through the tail: x_final -> LN -> CLS -> head -> score
    g_final = None
    if need_grads:
        def tail(x_final):
            xn = _layernorm(x_final, params["norm"], cfg.final_ln_eps)
            logits = xn[0] @ params["head"]["kernel"] + params["head"]["bias"]
            if cfg.distilled:
                logits = (logits + xn[1] @ params["head_dist"]["kernel"]
                          + params["head_dist"]["bias"]) / 2
            return jnp.sum(onehot * logits)
        g_final = jax.grad(tail)(res.x_final)

    # relevance seed: head -> pool -> final norm(identity) (ViT_LRP.py:327-330)
    R = None
    if need_relprop:
        if cfg.distilled:
            # seed through the SAME fused output the gradient tail uses:
            # logits = (head(cls) + head_dist(dist)) / 2. The /2 is a
            # constant scale (identity rule); the Add splits relevance
            # between the two heads, each then relprops through its Linear
            # onto its own token row.
            z1 = res.xn[0] @ params["head"]["kernel"] + params["head"]["bias"]
            z2 = (res.xn[1] @ params["head_dist"]["kernel"]
                  + params["head_dist"]["bias"])
            R1, R2 = rp.add_relprop(z1, z2, onehot, variant)
            R_cls = rp.linear_alphabeta(res.xn[0], params["head"]["kernel"],
                                        R1, alpha, variant)
            R_dist = rp.linear_alphabeta(
                res.xn[1], params["head_dist"]["kernel"], R2, alpha, variant)
            R = jnp.zeros_like(res.xn).at[0].set(R_cls).at[1].set(R_dist)
        else:
            R = rp.linear_alphabeta(res.cls, params["head"]["kernel"],
                                    onehot, alpha, variant)
            R = rp.index_select_relprop(res.xn, 0, jnp.array(0), R[None, :])

    if fuse_grad_cam:
        assert need_grads and need_relprop, "fuse_grad_cam needs both passes"

    if use_attn_kernel:
        # Fused-kernel reverse step: the whole per-head attention chain
        # (forward recompute, backward, LRP z-rules, (grad⊙cam)⁺ map) runs
        # in ONE Pallas kernel per block with everything VMEM-resident; XLA
        # keeps only the big Linear matmuls, LayerNorms and the rule tails.
        assert fuse_grad_cam, "the kernel path implements the fused method"
        if unroll == 1:
            # see forward_collect: big kernels must not sit in a scan body
            unroll = cfg.depth
        attn_mxu = _mxu_name(attn_precision, matmul_precision)
        rule_mxu = _mxu_name(relprop_precision, matmul_precision)
        # the MLP kernel runs bf16 (1-pass) or emulated-tf32 (3-pass bf16×3
        # weight pairs) dots. An f32-HIGHEST form exists (bf16×6 triple-split
        # weights + M-chunking, pk.mlp_rev_core) and is f32-accurate, but
        # measured SLOWER end-to-end than leaving the f32 MLP to XLA
        # (127.9 vs 143.6 expl/s — XLA's HIGHEST pipeline beats the
        # in-kernel 6-dot emulation at these shapes), so f32 keeps the XLA
        # MLP; see PERF.md round 2d.
        kernel_modes = (("bfloat16",) if _NO_BLOCK_KERNEL
                        else ("bfloat16", "tensorfloat32"))
        # rule/MLP islands ABOVE the base pass cannot be served by the
        # pre-split kernel weights (pk.islands_exceed_base) — those combos
        # take the XLA branches below, which use the raw f32 weights
        use_mlp_kernel = (matmul_precision in kernel_modes
                          and not pk.islands_exceed_base(
                              matmul_precision, relprop_precision,
                              mlp_precision)
                          and variant == "ours" and alpha == 1.0)
        # whole-block megakernel: ONE Pallas program per (sample, block) for
        # the entire reverse step (per-program fixed cost dominates the
        # smaller kernels — PERF.md)
        use_block_kernel = use_mlp_kernel and not _NO_BLOCK_KERNEL
        mlp_mxu = _mxu_name(None, matmul_precision)
        # per-dot override for the fc1/fc2 fwd-recompute + backward dots
        # inside the megakernel (None = follow matmul_precision)
        mlp_only_mxu = (_mxu_name(mlp_precision, matmul_precision)
                        if mlp_precision is not None else None)
        scale = cfg.head_dim ** -0.5

        if use_block_kernel:
            # weights pre-cast/pre-split ONCE outside the scan — see
            # pk.prepare_block_weights (correctness-critical on this
            # toolchain, not just faster)
            w_prep = pk.prepare_block_weights(params["blocks"], mlp_mxu)
            saved_fields = [res.qkv_pres, res.proj_pres, res.dots, res.probs]
            if res.fc1_pres is not None:
                saved_fields += [res.fc1_pres, res.fc2_pres]
            n_saved = 0 if res.qkv_pres is None else len(saved_fields)

            def kstep_block(carry, xs):
                g_out, Rc = carry
                x_in, x_mid, out_m, bp, ws = xs[:5]
                saved = xs[5:] if n_saved else None
                g_in, R_in, gc = pk.block_rev_core(
                    x_in, x_mid, out_m, g_out, Rc, bp,
                    cfg.num_heads, cfg.head_dim, cfg.block_ln_eps,
                    mxu=mlp_mxu, attn_mxu=attn_mxu, rule_mxu=rule_mxu,
                    mlp_mxu=mlp_only_mxu, ws=ws, saved=saved)
                if with_trunk_stats:
                    return (g_in, R_in), (gc, _trunk_stats(g_in, R_in))
                return (g_in, R_in), (gc,)

            assert res.outs is not None
            xs = (res.x_ins, res.x_mids, res.outs, params["blocks"], w_prep)
            if n_saved:
                xs = xs + tuple(saved_fields)
            (g0, R_tokens), ys = jax.lax.scan(
                kstep_block, (g_final, R), xs, reverse=True, unroll=unroll)
            if with_trunk_stats:
                return R_tokens, ys[0], None, ys[1]
            return R_tokens, ys[0], None

        # XLA-path rich anchors (the exact-f32 mode's analog of the
        # megakernel anchors): forward_collect saved the four pre-bias dot
        # outputs; consume them instead of recomputing (each is a 6-pass
        # f32-HIGHEST dot — ~19% of the reverse side's MXU passes).
        lite_saved = [res.qkv_pres, res.proj_pres]
        if not use_mlp_kernel and res.fc1_pres is not None:
            lite_saved += [res.fc1_pres, res.fc2_pres]
        n_lite = 0 if res.qkv_pres is None else len(lite_saved)

        def kstep(carry, xs):
            g_out, Rc = carry
            x_in, x_mid, out_merged, bp = xs[:4]
            saved = xs[4:] if n_lite else ()
            # lite recompute — no attention einsums in XLA (out_merged is
            # the third forward anchor; the attention internals are
            # recomputed inside attn_rev_core)
            xn1 = _layernorm(x_in, bp["norm1"], cfg.block_ln_eps)
            qkv_pre = saved[0] if n_lite else xn1 @ bp["qkv"]["kernel"]
            qkv = qkv_pre
            if "bias" in bp["qkv"]:
                qkv = qkv + bp["qkv"]["bias"]
            proj_pre = (saved[1] if n_lite
                        else out_merged @ bp["proj"]["kernel"])
            attn_out = proj_pre + bp["proj"]["bias"]

            def with_rule_precision(f, *a):
                if relprop_precision is not None:
                    with jax.default_matmul_precision(relprop_precision):
                        return f(*a)
                return f(*a)

            if use_mlp_kernel:
                # whole MLP half (LN fwd/bwd, fc1/gelu/fc2 recompute,
                # backward, add2 + both α-β rules + clone) in ONE kernel
                g_mid, Rm = pk.mlp_rev_core(
                    x_mid, g_out, Rc, bp["norm2"], bp, cfg.block_ln_eps,
                    mxu=mlp_only_mxu or mlp_mxu, rule_mxu=rule_mxu,
                    variant=variant, alpha=alpha)
            else:
                xn2 = _layernorm(x_mid, bp["norm2"], cfg.block_ln_eps)
                fc1_pre = (saved[2] if n_lite == 4
                           else xn2 @ bp["fc1"]["kernel"])
                h1 = fc1_pre + bp["fc1"]["bias"]
                hg = jax.nn.gelu(h1, approximate=False)
                fc2_pre = (saved[3] if n_lite == 4
                           else hg @ bp["fc2"]["kernel"])
                mlp_out = fc2_pre + bp["fc2"]["bias"]
                # backward, MLP side (block_backward's first half)
                g_hg = g_out @ bp["fc2"]["kernel"].T
                g_h1 = g_hg * _gelu_grad(h1)
                g_xn2 = g_h1 @ bp["fc1"]["kernel"].T
                g_mid = g_out + _layernorm_bwd(g_xn2, x_mid, bp["norm2"],
                                               cfg.block_ln_eps)

                def mlp_rules(R):
                    R1, R2 = rp.add_relprop(x_mid, mlp_out, R, variant)
                    R2 = rp.linear_alphabeta(hg, bp["fc2"]["kernel"], R2,
                                             alpha, variant, y_pre=fc2_pre)
                    R2 = rp.linear_alphabeta(xn2, bp["fc1"]["kernel"], R2,
                                             alpha, variant, y_pre=fc1_pre)
                    return rp.clone_relprop(x_mid, [R1, R2])

                Rm = with_rule_precision(mlp_rules, Rc)

            g_om = g_mid @ bp["proj"]["kernel"].T

            # relprop: add1 split + proj rule (XLA; moderate shapes)
            def rules_to_cam_o(Rm):
                Ra1, Ra2 = rp.add_relprop(x_in, attn_out, Rm, variant,
                                          Z=x_mid)
                cam_o = rp.linear_alphabeta(out_merged, bp["proj"]["kernel"],
                                            Ra2, alpha, variant,
                                            y_pre=proj_pre)
                return Ra1, cam_o

            def rules_from_cam_qkv(cam_qkv, Ra1):
                R2 = rp.linear_alphabeta(xn1, bp["qkv"]["kernel"], cam_qkv,
                                         alpha, variant, y_pre=qkv_pre)
                return rp.clone_relprop(x_in, [Ra1, R2])

            Ra1, cam_o = with_rule_precision(rules_to_cam_o, Rm)

            g_qkv, cam_qkv, gc = pk.attn_rev_core(
                qkv, g_om, cam_o, cfg.num_heads, cfg.head_dim, scale,
                attn_mxu=attn_mxu, rule_mxu=rule_mxu)

            g_xn1 = g_qkv @ bp["qkv"]["kernel"].T
            g_in = g_mid + _layernorm_bwd(g_xn1, x_in, bp["norm1"],
                                          cfg.block_ln_eps)
            R_in = with_rule_precision(rules_from_cam_qkv, cam_qkv, Ra1)
            if with_trunk_stats:
                return (g_in, R_in), (gc, _trunk_stats(g_in, R_in))
            return (g_in, R_in), (gc,)

        assert res.outs is not None, \
            "kernel reverse path needs forward_collect(use_attn_kernel=True)"
        xs = (res.x_ins, res.x_mids, res.outs, params["blocks"])
        if n_lite:
            xs = xs + tuple(lite_saved)
        (g0, R_tokens), ys = jax.lax.scan(
            kstep, (g_final, R), xs, reverse=True, unroll=unroll)
        if with_trunk_stats:
            return R_tokens, ys[0], None, ys[1]
        return R_tokens, ys[0], None

    def step(carry, xs):
        g_out, Rc = carry
        x_in, x_mid, bp = xs
        acts = _block_acts_from_anchors(x_in, x_mid, bp, cfg, attn_precision)
        if need_grads:
            g_in, g_tap = block_backward(g_out, x_in, x_mid, acts, bp, cfg,
                                         attn_precision)
        else:
            g_in, g_tap = g_out, None
        if need_relprop:
            R_in, attn_cam, _ = block_relprop(
                Rc, x_in, x_mid, bp, cfg, alpha, variant, acts=acts,
                relprop_precision=relprop_precision)
        else:
            R_in, attn_cam = Rc, None
        if fuse_grad_cam:
            gc = jnp.clip(g_tap * attn_cam, min=0).mean(axis=0)   # (n, n)
            if with_trunk_stats:
                return (g_in, R_in), (gc, _trunk_stats(g_in, R_in))
            return (g_in, R_in), (gc,)
        return (g_in, R_in), (attn_cam, g_tap)

    carry0 = (g_final if need_grads else jnp.zeros(()),
              R if need_relprop else jnp.zeros(()))
    xs = (res.x_ins, res.x_mids, params["blocks"])
    if fuse_grad_cam:
        (g0, R_tokens), ys = jax.lax.scan(step, carry0, xs,
                                          reverse=True, unroll=unroll)
        if with_trunk_stats:
            return R_tokens, ys[0], None, ys[1]
        return R_tokens, ys[0], None
    (g0, R_tokens), (attn_cams, attn_grads) = jax.lax.scan(
        step, carry0, xs, reverse=True, unroll=unroll)
    return (R_tokens if need_relprop else None,
            attn_cams if need_relprop else None,
            attn_grads if need_grads else None)


def full_lrp_input_relevance(params: Params, res: Residuals, R_tokens: Array,
                             img: Array, cfg: ViTConfig, variant: str = "ours"
                             ) -> Array:
    """Continue relprop to the pixels (method="full", ViT_LRP.py:337-343):
    pos-embed Add -> drop CLS -> patch-conv z^B -> channel sum."""
    Rx, _ = rp.add_relprop(res.cat_x, jnp.broadcast_to(
        params["pos_embed"], res.cat_x.shape), R_tokens, variant)
    Rp = Rx[cfg.num_prefix_tokens:]                    # drop CLS/DIST rows
    cam = rp.conv_patch_zB_relprop(img, params["patch_embed"]["kernel"], Rp,
                                   cfg.patch_size)
    return cam.sum(axis=0)                             # (H, W)
