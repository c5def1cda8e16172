"""Pallas TPU kernels for the explanation hot path.

The headline aggregation of ``transformer_attribution`` — per layer
``(grad ⊙ cam)⁺`` head-mean, +I (optionally row-normalized), then the
layer-chain matrix product (reference ``ViT_LRP.py:38-49,357-369``) — is a
chain of L small (n,n) ops; fused here into ONE kernel that keeps the running
``joint`` product resident in VMEM across the whole chain instead of writing
L intermediates to HBM.

The token count is zero-padded to a lane multiple (197 -> 256). Zero padding
is exact for the chain: ``[[M,0],[0,0]] @ [[J,0],[0,0]] = [[MJ,0],[0,0]]``,
so the top-left (n,n) block of the padded product equals the unpadded
product (the +I in the pad region only affects pad rows/cols, which are
sliced away).

``rollout_from_grad_cam`` auto-falls back to the jnp implementation off-TPU
(CPU tests) or when ``use_pallas=False``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from transformer_explainability_tpu.ops import relprop as rp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _chain_kernel(mats_ref, out_ref, *, n_layers: int):
    """Left-multiply chain ``out = mats[L-1] @ ... @ mats[0]`` with the whole
    (L, N, N) stack and the running product VMEM-resident. Single program
    (grid=()), so it stays correct under vmap batching (which prepends a
    batch grid dimension — no ``program_id`` dependence here)."""
    joint = mats_ref[0]
    def body(i, joint):
        # pin the precision: Mosaic rejects the ambient HIGH (tf32) setting,
        # and the chain is a negligible share of total FLOPs anyway
        return jnp.dot(mats_ref[i], joint, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = jax.lax.fori_loop(1, n_layers, body, joint)


def rollout_from_grad_cam(cams: jax.Array, grads: Optional[jax.Array] = None,
                          start_layer: int = 0, row_normalize: bool = False,
                          use_pallas: Optional[bool] = None,
                          interpret: bool = False) -> jax.Array:
    """Fused ``Π_{i=L-1..start} (I + mean_h (grads_i ⊙ cams_i)⁺)`` -> (n, n).

    cams/grads: (L, h, n, n). ``grads=None`` skips the grad weighting (the
    cam-only rollout). Matches
    ``clip(g*c,0).mean(1)`` + :func:`...ops.relprop.compute_rollout` exactly
    (fp32).

    cams may also be pre-reduced (L, n, n) — already ``(grad⊙cam)⁺``
    head-meaned inside the reverse scan (vit.reverse_pass fuse_grad_cam);
    then only the +I chain runs here (grads must be None).
    """
    prereduced = cams.ndim == 3
    if prereduced:
        assert grads is None
        L, n, _ = cams.shape
    else:
        L, h, n, _ = cams.shape
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        if prereduced:
            m = cams
        else:
            m = cams if grads is None else grads * cams
            m = jnp.clip(m, min=0).mean(axis=1)
        return rp.compute_rollout(m, start_layer, row_normalize=row_normalize)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # elementwise prep in XLA (it fuses into the producing ops): weight,
    # relu, head-mean, +I, optional row normalization, zero-pad to lanes
    if prereduced:
        m = cams[start_layer:].astype(jnp.float32)
    else:
        m = cams if grads is None else grads * cams
        m = jnp.clip(m[start_layer:].astype(jnp.float32), min=0).mean(axis=1)
    m = m + jnp.eye(n, dtype=jnp.float32)
    if row_normalize:
        m = m / m.sum(axis=-1, keepdims=True)
    N = _round_up(n, 128)
    mats = jnp.pad(m, ((0, 0), (0, N - n), (0, N - n)))
    n_layers = L - start_layer

    out = pl.pallas_call(
        functools.partial(_chain_kernel, n_layers=n_layers),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        interpret=interpret,
    )(mats)
    return out[:n, :n].astype(cams.dtype)


# ---------------------------------------------------------------------------
# Fused attention-core kernels.
#
# Profiling the explain program (B=64, see PERF.md) shows the MXU at ~15% of
# device time; the rest is elementwise fusions, layout copies and casts —
# dominated by the per-head q/k/v split/merge transposes and the (h, n, n)
# attention chains that XLA materializes in HBM between every matmul. These
# kernels keep the ENTIRE per-head attention computation VMEM-resident:
#
#   * ``attn_fwd_core``: qkv (n, 3D) raw-matmul layout -> softmax-attention
#     output merged back to (n, D). No head-split transpose ever reaches HBM.
#   * ``attn_rev_core``: one kernel per (sample, block) computing, per head,
#     the forward recompute (dots, softmax, AV), the hand-written backward
#     (the reference's attn.register_hook gradient, ViT_LRP.py:144-145 +
#     softmax/QK^T/AV cotangents), the LRP z-rules through AV and QK^T with
#     their /2 splits (ViT_LRP.py:154-177), and the fused
#     ``(grad ⊙ cam)⁺`` head-mean map (ViT_LRP.py:358-366). Inputs and
#     outputs stay in the (n, 3D)/(n, D) merged layouts the surrounding
#     Linear matmuls consume, so XLA never transposes to head-major.
#
# Both are single-program kernels (grid=()) with a static python loop over
# heads — safe under vmap batching (no ``pl.program_id`` dependence; the
# batching rule prepends a grid dimension).
#
# ``mxu`` / ``attn_mxu`` / ``rule_mxu`` select the per-dot MXU precision:
# "bfloat16" casts operands to bf16 (1-pass, f32 accumulation), anything else
# runs float32 HIGHEST (6-pass; Mosaic does not implement tf32).
# ---------------------------------------------------------------------------

_EPS = 1e-9

_MXU_LEVEL = {"bfloat16": 1, "tensorfloat32": 2, "float32": 3}


def islands_exceed_base(base: str, *islands) -> bool:
    """True if any weight-consuming precision island asks for MORE mantissa
    than the ``base`` pass the kernels' weights are pre-split for.

    Pre-split weights downgrade exactly (a (hi, mid, lo) triple's pair
    prefix IS the tf32 split, its hi IS the bf16 cast) but cannot upgrade —
    an f32 rule dot against (hi, lo) pair weights would either crash
    (``_kdot``'s HIGHEST emulation takes triples) or silently cap the rule
    at 16-bit weight mantissas. Callers gate the weight-consuming kernels
    off for such combos and take the XLA path, which honors the requested
    precision against the raw f32 weights. ``None`` islands (= follow base)
    are ignored; the attention island never consumes weights, so it is NOT
    passed here."""
    b = _MXU_LEVEL.get(base, 3)
    return any(_MXU_LEVEL.get(m, 3) > b for m in islands if m is not None)


def _vmem_params(interpret: bool, mib: int = 96):
    # Raise the scoped-VMEM cap: the rev-core kernel's unrolled head loop
    # plus its (n, 3D) refs peaks ~20 MiB, above the 16 MiB default; v5e has
    # 128 MiB of VMEM. The BERT attn-rev kernel at S=512 needs the full cap
    # (Mosaic does not reuse stack VMEM across the unrolled head loop).
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=mib * 1024 * 1024)


def _split_hi_lo(x):
    """bf16 head/tail decomposition: x ≈ hi + lo with hi = bf16-rne(x).

    The head is computed with integer bit tricks (round-to-nearest-even into
    the top 16 bits), NOT via an f32→bf16→f32 convert round-trip: this
    program compiles under ``--xla_allow_excess_precision=true``, which folds
    ``convert(convert(x, bf16), f32) -> x`` — turning the residual into zero
    and silently degrading the 3-pass tf32 emulation to 1-pass bf16."""
    xf = x.astype(jnp.float32)
    hi_f32 = _bf16_head_f32(xf)
    # both casts below are exact (8-bit mantissas already) except lo's, which
    # is a genuine rounding the compiler cannot fold away
    return hi_f32.astype(jnp.bfloat16), (xf - hi_f32).astype(jnp.bfloat16)


def _bf16_head_f32(xf):
    """bf16-rne head of an f32 array, kept in f32 (bit-trick; see
    :func:`_split_hi_lo` for why not a convert round-trip)."""
    u = jax.lax.bitcast_convert_type(xf, jnp.uint32)
    rne = (u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))) \
        & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rne, jnp.float32)


def _split3(x):
    """Three-way bf16 decomposition: x ≈ hi + mid + lo (8+8+8 mantissa bits
    covers f32's 24). Feeds the in-kernel bf16×6 emulation of f32-HIGHEST
    dots (see :func:`_kdot`)."""
    xf = x.astype(jnp.float32)
    hi = _bf16_head_f32(xf)
    r1 = xf - hi                               # exact (Sterbenz-style)
    mid = _bf16_head_f32(r1)
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            (r1 - mid).astype(jnp.bfloat16))


def _kabs(w):
    """abs that understands (hi, lo[, …]) weight splits: |Σ parts| decomposed
    as (|hi|, sign(hi)·rest…) — exact wherever sign(hi) == sign(w), i.e.
    everywhere the 8-bit bf16 mantissa doesn't round w across zero
    (|tail| ≤ ulp(hi)/2, so a sign flip needs hi == 0, where all parts are
    ~denormal anyway). The sign test compares in f32 — Mosaic has no bf16
    vector compare."""
    if isinstance(w, tuple):
        hi = w[0]
        neg = hi.astype(jnp.float32) < 0
        return (jnp.abs(hi),) + tuple(jnp.where(neg, -t, t) for t in w[1:])
    return jnp.abs(w)


def _kdot(a, b, dims, mxu: str):
    """dot_general with f32 accumulation; ``mxu`` selects the MXU passes:
    "bfloat16" (1-pass), "tensorfloat32" (3-pass bf16×3 split emulation —
    Mosaic has no native tf32), or "float32" (HIGHEST, 6-pass). ``b`` may be
    a pre-split (hi, lo) bf16 pair (weights): bf16 dots then use ``hi``
    alone (== casting the f32 weight), tf32 dots use the pair directly.
    (f64 operands — interpret-mode tests only — keep f64 accumulation.)"""
    paired = isinstance(b, tuple)
    a_dt = a.dtype
    acc = a_dt if a_dt == jnp.float64 else jnp.float32

    def d(x, y):
        # pin DEFAULT: the ambient tf32 (HIGH) context would otherwise leak
        # in, and Mosaic implements only DEFAULT/HIGHEST
        return jax.lax.dot_general(x, y, (dims, ((), ())),
                                   preferred_element_type=acc,
                                   precision=jax.lax.Precision.DEFAULT)

    if mxu == "bfloat16":
        return d(a.astype(jnp.bfloat16),
                 b[0] if paired else b.astype(jnp.bfloat16))
    # multi-pass modes REQUIRE >=f32 mantissas on unsplit operands: splitting
    # (or HIGHEST-dotting) an already-bf16 array silently degrades to 1-pass
    # bf16 while paying the extra passes — enforce at trace time so a missed
    # caller gate errors instead of quietly capping precision
    _wide = (jnp.float32, jnp.float64)
    assert a_dt in _wide, (mxu, a_dt)
    if mxu == "tensorfloat32":
        # XLA's tf32-on-TPU algorithm (bf16_3x): drop only the lo·lo term
        a_hi, a_lo = _split_hi_lo(a.astype(jnp.float32) if a_dt
                                  == jnp.float64 else a)
        if not paired:
            assert b.dtype in _wide, (mxu, b.dtype)
        b_hi, b_lo = b[:2] if paired else _split_hi_lo(
            b.astype(jnp.float32) if b.dtype == jnp.float64 else b)
        return (d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))).astype(acc)
    if paired:
        # f32-HIGHEST via bf16×6 with a PRE-SPLIT (hi, mid, lo) weight
        # triple: an in-kernel HIGHEST dot on a big f32 weight makes Mosaic
        # split the operand per dot site, and those per-site splits blow up
        # the register allocator (measured: ~127 MiB of spill slots in the
        # f32 MLP kernel regardless of chunking). The activation side is
        # split in-kernel (small operand). Products below 2^-16 significance
        # (m·l, l·m, l·l) are dropped — the same term set as XLA's bf16_6x.
        assert len(b) == 3, "HIGHEST emulation takes (hi, mid, lo) weights"
        a_hi, a_mid, a_lo = _split3(a)
        b_hi, b_mid, b_lo = b
        return (((d(a_hi, b_lo) + d(a_lo, b_hi) + d(a_mid, b_mid))
                 + (d(a_hi, b_mid) + d(a_mid, b_hi)))
                + d(a_hi, b_hi)).astype(acc)
    assert b.dtype in _wide, (mxu, b.dtype)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=acc,
                               precision=jax.lax.Precision.HIGHEST)


def _ksafe_divide(a, b):
    """ops.relprop.safe_divide, inlined for kernel bodies."""
    eps = jnp.asarray(_EPS, b.dtype)
    den = b + eps
    den = jnp.where(den == 0, eps, den)
    return jnp.where(b == 0, jnp.zeros((), a.dtype), a / den)


def _attn_fwd_kernel(qkv_ref, out_ref, *, num_heads: int, head_dim: int,
                     scale: float, mxu: str):
    D = num_heads * head_dim
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = qkv_ref[:, sl]
        k = qkv_ref[:, D + h * head_dim: D + (h + 1) * head_dim]
        v = qkv_ref[:, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim]
        dots = _kdot(q, k, ((1,), (1,)), mxu)                  # (n, n)
        attn = jax.nn.softmax(dots * jnp.asarray(scale, dots.dtype), axis=-1)
        out_ref[:, sl] = _kdot(attn, v, ((1,), (0,)), mxu)


def _attn_rev_kernel(qkv_ref, g_o_ref, cam_o_ref,
                     g_qkv_ref, cam_qkv_ref, gc_ref, *,
                     num_heads: int, head_dim: int, scale: float,
                     attn_mxu: str, rule_mxu: str):
    n = qkv_ref.shape[0]
    D = num_heads * head_dim
    dt = qkv_ref.dtype
    gc = jnp.zeros((n, n), dt)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = qkv_ref[:, sl]
        k = qkv_ref[:, D + h * head_dim: D + (h + 1) * head_dim]
        v = qkv_ref[:, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim]
        g_o = g_o_ref[:, sl]
        cam_o = cam_o_ref[:, sl]

        # forward recompute (VMEM-resident)
        dots = _kdot(q, k, ((1,), (1,)), attn_mxu)             # pre-scale
        attn = jax.nn.softmax(dots * jnp.asarray(scale, dt), axis=-1)
        out = _kdot(attn, v, ((1,), (0,)), attn_mxu)

        # backward: hook gradient + softmax/QK/AV cotangents
        g_attn = _kdot(g_o, v, ((1,), (1,)), attn_mxu)         # (n, n)
        g_v = _kdot(attn, g_o, ((0,), (0,)), attn_mxu)
        inner = (g_attn * attn).sum(axis=-1, keepdims=True)
        g_dots = attn * (g_attn - inner) * jnp.asarray(scale, dt)
        g_q = _kdot(g_dots, k, ((1,), (0,)), attn_mxu)
        g_k = _kdot(g_dots, q, ((0,), (0,)), attn_mxu)

        # LRP z-rules through AV then QK^T, each halved (ViT_LRP.py:160-173)
        S1 = _ksafe_divide(cam_o, out)                         # (n, hd)
        half = jnp.asarray(0.5, dt)
        cam1 = attn * _kdot(S1, v, ((1,), (1,)), rule_mxu) * half
        cam_v = v * _kdot(attn, S1, ((0,), (0,)), rule_mxu) * half
        S2 = _ksafe_divide(cam1, dots)                         # (n, n)
        cam_q = q * _kdot(S2, k, ((1,), (0,)), rule_mxu) * half
        cam_k = k * _kdot(S2, q, ((0,), (0,)), rule_mxu) * half

        # fused (grad ⊙ cam)⁺ accumulation (head-mean at the end)
        gc = gc + jnp.maximum(g_attn * cam1, jnp.zeros((), dt))

        g_qkv_ref[:, sl] = g_q
        g_qkv_ref[:, D + h * head_dim: D + (h + 1) * head_dim] = g_k
        g_qkv_ref[:, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim] = g_v
        cam_qkv_ref[:, sl] = cam_q
        cam_qkv_ref[:, D + h * head_dim: D + (h + 1) * head_dim] = cam_k
        cam_qkv_ref[:, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim] = cam_v
    gc_ref[:] = gc / jnp.asarray(num_heads, dt)


def _split_heads(qkv: jax.Array, num_heads: int, head_dim: int):
    n = qkv.shape[0]
    x = qkv.reshape(n, 3, num_heads, head_dim).transpose(1, 2, 0, 3)
    return x[0], x[1], x[2]                                    # (h, n, d) each


def _attn_fwd_core_jnp(qkv, num_heads, head_dim, scale):
    q, k, v = _split_heads(qkv, num_heads, head_dim)
    dots = jnp.einsum("hid,hjd->hij", q, k)
    attn = jax.nn.softmax(dots * scale, axis=-1)
    out = jnp.einsum("hij,hjd->hid", attn, v)
    h, n, d = out.shape
    return out.transpose(1, 0, 2).reshape(n, h * d)


def _attn_rev_core_jnp(qkv, g_o, cam_o, num_heads, head_dim, scale):
    from transformer_explainability_tpu.ops.relprop import safe_divide
    n = qkv.shape[0]
    q, k, v = _split_heads(qkv, num_heads, head_dim)
    go = g_o.reshape(n, num_heads, head_dim).transpose(1, 0, 2)
    co = cam_o.reshape(n, num_heads, head_dim).transpose(1, 0, 2)
    dots = jnp.einsum("hid,hjd->hij", q, k)
    attn = jax.nn.softmax(dots * scale, axis=-1)
    out = jnp.einsum("hij,hjd->hid", attn, v)
    g_attn = jnp.einsum("hid,hjd->hij", go, v)
    g_v = jnp.einsum("hij,hid->hjd", attn, go)
    inner = (g_attn * attn).sum(axis=-1, keepdims=True)
    g_dots = attn * (g_attn - inner) * scale
    g_q = jnp.einsum("hij,hjd->hid", g_dots, k)
    g_k = jnp.einsum("hij,hid->hjd", g_dots, q)
    S1 = safe_divide(co, out)
    cam1 = attn * jnp.einsum("hid,hjd->hij", S1, v) * 0.5
    cam_v = v * jnp.einsum("hij,hid->hjd", attn, S1) * 0.5
    S2 = safe_divide(cam1, dots)
    cam_q = q * jnp.einsum("hij,hjd->hid", S2, k) * 0.5
    cam_k = k * jnp.einsum("hij,hid->hjd", S2, q) * 0.5
    gc = jnp.clip(g_attn * cam1, min=0).mean(axis=0)

    def merge3(a, b, c):
        x = jnp.stack([a, b, c], axis=0)                       # (3, h, n, d)
        return x.transpose(2, 0, 1, 3).reshape(n, 3 * num_heads * head_dim)

    return merge3(g_q, g_k, g_v), merge3(cam_q, cam_k, cam_v), gc


def attn_fwd_core(qkv: jax.Array, num_heads: int, head_dim: int, scale: float,
                  mxu: str = "float32", use_pallas: Optional[bool] = None,
                  interpret: bool = False) -> jax.Array:
    """Softmax attention from raw qkv (n, 3D) -> merged output (n, D)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas and not interpret:
        return _attn_fwd_core_jnp(qkv, num_heads, head_dim, scale)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n = qkv.shape[0]
    D = num_heads * head_dim
    dt = jnp.float64 if qkv.dtype == jnp.float64 else jnp.float32
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, num_heads=num_heads,
                          head_dim=head_dim, scale=scale, mxu=mxu),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, D), dt),
        compiler_params=_vmem_params(interpret),
        interpret=interpret,
    )(qkv.astype(dt))


def attn_rev_core(qkv: jax.Array, g_o: jax.Array, cam_o: jax.Array,
                  num_heads: int, head_dim: int, scale: float,
                  attn_mxu: str = "float32", rule_mxu: str = "float32",
                  use_pallas: Optional[bool] = None, interpret: bool = False):
    """Fused backward + LRP relprop of the attention core.

    qkv: (n, 3D) raw pre-split layout; g_o/cam_o: (n, D) merged-head gradient
    and relevance arriving at the AV output. Returns
    (g_qkv (n, 3D), cam_qkv (n, 3D), gc (n, n)) — the qkv-layout cotangent,
    the qkv-layout relevance ('qkv h n d -> n (qkv h d)', ViT_LRP.py:175),
    and the head-meaned ``(grad ⊙ cam)⁺`` map.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas and not interpret:
        return _attn_rev_core_jnp(qkv, g_o, cam_o, num_heads, head_dim, scale)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n = qkv.shape[0]
    D = num_heads * head_dim
    dt = jnp.float64 if qkv.dtype == jnp.float64 else jnp.float32
    return pl.pallas_call(
        functools.partial(_attn_rev_kernel, num_heads=num_heads,
                          head_dim=head_dim, scale=scale,
                          attn_mxu=attn_mxu, rule_mxu=rule_mxu),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((n, 3 * D), dt),
                   jax.ShapeDtypeStruct((n, 3 * D), dt),
                   jax.ShapeDtypeStruct((n, n), dt)],
        compiler_params=_vmem_params(interpret),
        interpret=interpret,
    )(qkv.astype(dt), g_o.astype(dt), cam_o.astype(dt))


# ---------------------------------------------------------------------------
# Fused MLP reverse core.
#
# The other big HBM family in the explain profile is the MLP chain: the
# (n, mlp_dim) tensors (hg, |hg|, the rule divides, the α-β products)
# materialize ~8x per block in XLA. This kernel runs the whole MLP part of
# the fused reverse step — LayerNorm fwd+bwd, fc1/gelu/fc2 recompute,
# the hand-written backward, the add2 split, both α-β Linear rules and the
# clone merge (reference ViT_LRP.py:203-213 MLP half) — with every
# (n, mlp_dim) tensor VMEM-resident. Weights enter pre-cast to the dot dtype
# and, having a constant index map under the vmapped grid, are fetched to
# VMEM once and stay resident across the batch.
#
# Restriction: variant="ours" with beta=0 (alpha=1) — the only configuration
# the reference's callers use (ViT_explanation_generator.py:27). Other
# variants keep the XLA path.
# ---------------------------------------------------------------------------


# Mosaic has no erf lowering; this is the XLA ErfExpander / Eigen
# generic_fast_erf_float rational polynomial (the same approximation the
# XLA path evaluates), validated against jax.lax.erf in the tests.
_ERF_ALPHA = (-2.72614225801306e-10, 2.77068142495902e-08,
              -2.10102402082508e-06, -5.69250639462346e-05,
              -7.34990630326855e-04, -2.95459980854025e-03,
              -1.60960333262415e-02)
_ERF_BETA = (-1.45660718464996e-05, -2.13374055278905e-04,
             -1.68282697438203e-03, -7.37332916720468e-03,
             -1.42647390514189e-02)


def _kerf(x):
    if x.dtype == jnp.float64:          # interpret-mode tests run on CPU
        return jax.lax.erf(x)
    xc = jnp.clip(x, -4.0, 4.0)
    x2 = xc * xc
    p = jnp.full_like(x2, _ERF_ALPHA[0])
    for c in _ERF_ALPHA[1:]:
        p = p * x2 + jnp.asarray(c, x.dtype)
    p = p * xc
    q = jnp.full_like(x2, _ERF_BETA[0])
    for c in _ERF_BETA[1:]:
        q = q * x2 + jnp.asarray(c, x.dtype)
    return jnp.clip(p / q, -1.0, 1.0)


def _gelu_exact(x):
    cdf = 0.5 * (1.0 + _kerf(x / jnp.sqrt(2.0).astype(x.dtype)))
    return x * cdf


def _gelu_grad(x):
    cdf = 0.5 * (1.0 + _kerf(x / jnp.sqrt(2.0).astype(x.dtype)))
    pdf = jnp.exp(-0.5 * x * x) / jnp.sqrt(2.0 * jnp.pi).astype(x.dtype)
    return cdf + x * pdf


def _ln_fwd(x, s, b, eps):
    mu = x.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + jnp.asarray(eps, x.dtype))
    return (x - mu) * inv * s + b, mu, inv


def _mlp_rev_math(x_mid, g_out, R, s, b, b1, b2, w1, w2, *,
                  eps: float, mxu: str, rule_mxu: str,
                  mlp_mxu: Optional[str] = None, saved_mlp=None):
    """The MLP half of the fused reverse step, on arrays (shared by the
    standalone MLP kernel and the whole-block megakernel).

    ``mlp_mxu``: optional precision override for the four fc1/fc2
    forward-recompute + backward dots (None = ``mxu``). The MLP dots are
    ~45% of a block's reverse-side fwd/bwd matmul FLOPs; dropping them
    to 1-pass bf16 while the attention-gradient chain stays tf32 is the
    measured sweet spot (see PERF.md).

    ``saved_mlp``: optional (fc1_pre, fc2_pre) forward anchors — skips the
    two forward-recompute dots. The anchors were computed by the forward
    kernel from the SAME x_mid via the same ``_ln_fwd``/dot math, so every
    rule divides by the exact value its numerator was linearized at (the
    round-2b anchor-consistency requirement)."""
    mmx = mlp_mxu or mxu
    dt = x_mid.dtype
    half = jnp.asarray(0.5, dt)

    # forward recompute (LN -> fc1 -> gelu -> fc2), (n, M) stays in VMEM;
    # with saved_mlp only the LN statistics are recomputed (VPU, cheap)
    xn2, mu, inv = _ln_fwd(x_mid, s, b, eps)
    if saved_mlp is not None:
        fc1_pre, fc2_pre = saved_mlp
    else:
        fc1_pre = _kdot(xn2, w1, ((1,), (0,)), mmx)
    h1 = fc1_pre + b1
    hg = _gelu_exact(h1)
    if saved_mlp is None:
        fc2_pre = _kdot(hg, w2, ((1,), (0,)), mmx)
    mlp_out = fc2_pre + b2

    # backward (models/vit.block_backward MLP half)
    g_hg = _kdot(g_out, w2, ((1,), (1,)), mmx)
    g_h1 = g_hg * _gelu_grad(h1)
    g_xn2 = _kdot(g_h1, w1, ((1,), (1,)), mmx)
    gg = g_xn2 * s
    xhat = (x_mid - mu) * inv
    g_ln = inv * (gg - gg.mean(axis=-1, keepdims=True)
                  - xhat * (gg * xhat).mean(axis=-1, keepdims=True))
    g_mid = g_out + g_ln

    # relprop: add2 split with the "ours" renormalization
    Ca, Cb = _add_rule_math(x_mid, mlp_out, R)

    # fc2 α-β rule (abs identity, shared denominator; y_pre = fc2_pre).
    # |W| is recomputed in VMEM per invocation (a VPU pass) rather than
    # passed in — resident weight copies are what overflow scoped VMEM.
    ahg = jnp.abs(hg)
    aw2 = _kabs(w2)
    axw2 = _kdot(ahg, aw2, ((1,), (0,)), rule_mxu)
    Sr = _ksafe_divide(Cb, half * (fc2_pre + axw2))
    R2 = half * (hg * _kdot(Sr, w2, ((1,), (1,)), rule_mxu)
                 + ahg * _kdot(Sr, aw2, ((1,), (1,)), rule_mxu))

    # fc1 α-β rule (y_pre = fc1_pre)
    axn2 = jnp.abs(xn2)
    aw1 = _kabs(w1)
    axw1 = _kdot(axn2, aw1, ((1,), (0,)), rule_mxu)
    S1 = _ksafe_divide(R2, half * (fc1_pre + axw1))
    R2b = half * (xn2 * _kdot(S1, w1, ((1,), (1,)), rule_mxu)
                  + axn2 * _kdot(S1, aw1, ((1,), (1,)), rule_mxu))

    # clone merge (single shared divide — ops/relprop.clone_relprop)
    Rm = x_mid * _ksafe_divide(Ca + R2b, x_mid)
    return g_mid, Rm


def _mlp_rev_math_chunked(x_mid, g_out, R, s, b, b1_chunks, b2, w1, w2, *,
                          eps: float, mxu: str, rule_mxu: str,
                          m_chunks: int):
    """:func:`_mlp_rev_math` restructured as a static Python loop over
    ``m_chunks`` column chunks of the intermediate dim M.

    Same math, re-associated: the (n, M) intermediates and the |W| temps
    that overflow scoped VMEM in the one-shot f32 form never materialize —
    only per-chunk (n, M/c)/(D, M/c) slices plus the persisted fc1
    pre-activations (one (n, M)-equivalent) live at once. This is what lets
    the f32-HIGHEST (exact-parity) mode run the MLP half in-kernel; chunk
    sums accumulate in the activation dtype (f32), i.e. the usual f32
    reassociation, nothing coarser."""
    dt = x_mid.dtype
    half = jnp.asarray(0.5, dt)
    M = (w1[0] if isinstance(w1, tuple) else w1).shape[1]
    assert M % m_chunks == 0, (M, m_chunks)
    C = M // m_chunks
    # the fc1 bias arrives pre-sliced into per-chunk (1, C) operands, each
    # at lane offset 0: Mosaic cannot broadcast a (1, C) column slice
    # carrying a non-zero implicit lane offset ("Invalid input layout" on
    # vector.broadcast), and it folds slice-of-broadcast right back into
    # broadcast-of-slice, so in-kernel repair is impossible
    assert len(b1_chunks) == m_chunks

    xn2, mu, inv = _ln_fwd(x_mid, s, b, eps)
    axn2 = jnp.abs(xn2)

    # phase 1: fc1/gelu/fc2 recompute + backward, accumulated over chunks;
    # fc1 pre-activations persist for phase 2 (small: one (n, M) f32)
    fc2_pre = jnp.zeros_like(g_out)
    axw2 = jnp.zeros_like(g_out)
    g_xn2 = jnp.zeros_like(g_out)
    fc1_pres = []
    def _cols(w, c):
        sl = slice(c * C, (c + 1) * C)
        return (tuple(p[:, sl] for p in w) if isinstance(w, tuple)
                else w[:, sl])

    def _rows(w, c):
        sl = slice(c * C, (c + 1) * C)
        return (tuple(p[sl, :] for p in w) if isinstance(w, tuple)
                else w[sl, :])

    for c in range(m_chunks):
        w1_c = _cols(w1, c)
        w2_c = _rows(w2, c)
        fc1_pre_c = _kdot(xn2, w1_c, ((1,), (0,)), mxu)
        h1_c = fc1_pre_c + b1_chunks[c]
        hg_c = _gelu_exact(h1_c)
        fc2_pre = fc2_pre + _kdot(hg_c, w2_c, ((1,), (0,)), mxu)
        axw2 = axw2 + _kdot(jnp.abs(hg_c), _kabs(w2_c), ((1,), (0,)),
                            rule_mxu)
        g_hg_c = _kdot(g_out, w2_c, ((1,), (1,)), mxu)
        g_h1_c = g_hg_c * _gelu_grad(h1_c)
        g_xn2 = g_xn2 + _kdot(g_h1_c, w1_c, ((1,), (1,)), mxu)
        fc1_pres.append(fc1_pre_c)
    mlp_out = fc2_pre + b2

    gg = g_xn2 * s
    xhat = (x_mid - mu) * inv
    g_ln = inv * (gg - gg.mean(axis=-1, keepdims=True)
                  - xhat * (gg * xhat).mean(axis=-1, keepdims=True))
    g_mid = g_out + g_ln

    Ca, Cb = _add_rule_math(x_mid, mlp_out, R)
    Sr = _ksafe_divide(Cb, half * (fc2_pre + axw2))

    # phase 2: fc2 rule scatter, fc1 rule gather, accumulated over chunks
    num_w = jnp.zeros_like(g_out)
    num_a = jnp.zeros_like(g_out)
    for c in range(m_chunks):
        w1_c = _cols(w1, c)
        w2_c = _rows(w2, c)
        aw1_c = _kabs(w1_c)
        fc1_pre_c = fc1_pres[c]
        hg_c = _gelu_exact(fc1_pre_c + b1_chunks[c])
        ahg_c = jnp.abs(hg_c)
        R2_c = half * (hg_c * _kdot(Sr, w2_c, ((1,), (1,)), rule_mxu)
                       + ahg_c * _kdot(Sr, _kabs(w2_c), ((1,), (1,)),
                                       rule_mxu))
        axw1_c = _kdot(axn2, aw1_c, ((1,), (0,)), rule_mxu)
        S1_c = _ksafe_divide(R2_c, half * (fc1_pre_c + axw1_c))
        num_w = num_w + _kdot(S1_c, w1_c, ((1,), (1,)), rule_mxu)
        num_a = num_a + _kdot(S1_c, aw1_c, ((1,), (1,)), rule_mxu)
    R2b = half * (xn2 * num_w + axn2 * num_a)

    Rm = x_mid * _ksafe_divide(Ca + R2b, x_mid)
    return g_mid, Rm


def _mlp_rev_kernel(*refs, eps: float, mxu: str, rule_mxu: str,
                    wsplit: int, m_chunks: int = 0):
    (x_mid_ref, g_out_ref, R_ref, ln_s_ref, ln_b_ref) = refs[:5]
    nb = max(m_chunks, 1)      # fc1 bias: whole, or one (1, C) ref per chunk
    b1_refs = refs[5:5 + nb]
    b2_ref = refs[5 + nb]
    g_mid_ref, Rm_ref = refs[-2:]
    w_refs = refs[6 + nb:-2]
    if wsplit > 1:             # (hi, lo) pair or (hi, mid, lo) triple
        w1 = tuple(r[:] for r in w_refs[:wsplit])
        w2 = tuple(r[:] for r in w_refs[wsplit:])
    else:
        w1, w2 = w_refs[0][:], w_refs[1][:]
    common = (x_mid_ref[:], g_out_ref[:], R_ref[:], ln_s_ref[:], ln_b_ref[:])
    if m_chunks > 1:
        g_mid, Rm = _mlp_rev_math_chunked(
            *common, tuple(r[:] for r in b1_refs), b2_ref[:], w1, w2,
            eps=eps, mxu=mxu, rule_mxu=rule_mxu, m_chunks=m_chunks)
    else:
        g_mid, Rm = _mlp_rev_math(
            *common, b1_refs[0][:], b2_ref[:], w1, w2,
            eps=eps, mxu=mxu, rule_mxu=rule_mxu)
    g_mid_ref[:] = g_mid
    Rm_ref[:] = Rm


def _mlp_rev_core_jnp(x_mid, g_out, R, ln, bp, eps, variant, alpha):
    """jnp fallback composed from the rule library (same ops as the XLA
    fused step)."""
    from transformer_explainability_tpu.ops import relprop as rel
    mu = x_mid.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x_mid - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + jnp.asarray(eps, x_mid.dtype))
    xn2 = (x_mid - mu) * inv * ln["scale"] + ln["bias"]
    fc1_pre = xn2 @ bp["fc1"]["kernel"]
    h1 = fc1_pre + bp["fc1"]["bias"]
    hg = _gelu_exact(h1)
    fc2_pre = hg @ bp["fc2"]["kernel"]
    mlp_out = fc2_pre + bp["fc2"]["bias"]

    g_hg = g_out @ bp["fc2"]["kernel"].T
    g_h1 = g_hg * _gelu_grad(h1)
    g_xn2 = g_h1 @ bp["fc1"]["kernel"].T
    gg = g_xn2 * ln["scale"]
    xhat = (x_mid - mu) * inv
    g_ln = inv * (gg - gg.mean(axis=-1, keepdims=True)
                  - xhat * (gg * xhat).mean(axis=-1, keepdims=True))
    g_mid = g_out + g_ln

    R1, R2 = rel.add_relprop(x_mid, mlp_out, R, variant)
    R2 = rel.linear_alphabeta(hg, bp["fc2"]["kernel"], R2, alpha, variant,
                              y_pre=fc2_pre)
    R2 = rel.linear_alphabeta(xn2, bp["fc1"]["kernel"], R2, alpha, variant,
                              y_pre=fc1_pre)
    Rm = rel.clone_relprop(x_mid, [R1, R2])
    return g_mid, Rm


def mlp_rev_core(x_mid: jax.Array, g_out: jax.Array, R: jax.Array,
                 ln: dict, bp: dict, eps: float,
                 mxu: str = "float32", rule_mxu: str = "float32",
                 variant: str = "ours", alpha: float = 1.0,
                 use_pallas: Optional[bool] = None,
                 interpret: bool = False,
                 m_chunks: Optional[int] = None):
    """Fused MLP half of the reverse step: returns (g_mid, R_mid).

    x_mid/g_out/R: (n, D); ``ln``: norm2 {scale, bias}; ``bp``: block params
    holding fc1/fc2 {kernel, bias}. Kernel path requires variant="ours",
    alpha=1 (falls back to jnp otherwise).

    ``m_chunks``: split the intermediate dim into this many column chunks
    (static Python loop) so the working set fits scoped VMEM. Default: 4 in
    f32-HIGHEST mode (the one-shot form's (n, M) temps + |W| copies
    overflow), 0 (one-shot) for bf16/tf32.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if (not use_pallas and not interpret) or variant != "ours" or alpha != 1.0:
        return _mlp_rev_core_jnp(x_mid, g_out, R, ln, bp, eps, variant, alpha)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n, D = x_mid.shape
    dt = jnp.float64 if x_mid.dtype == jnp.float64 else jnp.float32
    M = bp["fc1"]["kernel"].shape[1]
    if m_chunks is None:
        m_chunks = 0 if mxu in ("bfloat16", "tensorfloat32") else 4
    if m_chunks > 1 and M % m_chunks != 0:
        # ragged M: pick a nearby divisor — the one-shot f32 form is exactly
        # what chunking exists to avoid (scoped-VMEM overflow on hardware)
        for k in (4, 5, 6, 8, 3, 2):
            if M % k == 0:
                m_chunks = k
                break
        else:
            m_chunks = 0
    # the fc1 bias enters whole (one-shot) or pre-sliced per chunk — each
    # slice lands in VMEM at lane offset 0 (see _mlp_rev_math_chunked)
    b1 = bp["fc1"]["bias"][None].astype(dt)
    if m_chunks > 1:
        C = M // m_chunks
        b1_ops = [b1[:, c * C:(c + 1) * C] for c in range(m_chunks)]
    else:
        b1_ops = [b1]
    # weights enter in the *forward* dot dtype, as (hi, lo) bf16 pairs for
    # emulated tf32, or as (hi, mid, lo) triples for emulated f32-HIGHEST
    # (f64 — interpret-mode tests — keeps true HIGHEST dots on unsplit
    # operands); rule-side casts/abs happen in VMEM
    wk = [bp["fc1"]["kernel"], bp["fc2"]["kernel"]]
    if dt == jnp.float32 and mxu not in ("bfloat16", "tensorfloat32"):
        w_flat = [part for w in wk for part in _split3(w)]
        wsplit = 3
    else:
        w_flat, paired = _flatten_weights(wk, mxu)
        wsplit = 2 if paired else 1
    n_in = 6 + len(b1_ops) + len(w_flat)
    outs = pl.pallas_call(
        functools.partial(_mlp_rev_kernel, eps=eps, mxu=mxu,
                          rule_mxu=rule_mxu, wsplit=wsplit,
                          m_chunks=m_chunks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, D), dt),
                   jax.ShapeDtypeStruct((n, D), dt)],
        # the triple-split f32 form peaks ~96.4 MiB under vmap's
        # double-buffered batch grid — give it the headroom (v5e: 128 MiB)
        compiler_params=_vmem_params(interpret,
                                     mib=112 if wsplit == 3 else 96),
        interpret=interpret,
    )(x_mid.astype(dt), g_out.astype(dt), R.astype(dt),
      ln["scale"][None].astype(dt), ln["bias"][None].astype(dt),
      *b1_ops, bp["fc2"]["bias"][None].astype(dt),
      *w_flat)
    return outs[0], outs[1]


# ---------------------------------------------------------------------------
# Tensor-parallel MLP reverse: the fused MLP core split at its collective
# points. Under TP (parallel/tensor.py) fc1 is column-parallel and fc2
# row-parallel, so the fused reverse step factors into two LOCAL kernels —
# each device runs them on its M/k weight shard with every (n, M/k) tensor
# VMEM-resident — separated by XLA psums of five (n, D) partials:
#
#   phase 1 (local): LN fwd, fc1/gelu recompute, fc2 forward partial, the
#     fc2 rule's |hg|@|w2| denominator partial, and the MLP backward's
#     g_xn2 partial; persists fc1_pre_l as the phase-2 anchor (the same
#     kernel computed it, so every rule divides at its linearization point).
#   XLA (replicated): psum(fc2_pre, axw2, g_xn2) -> LN backward, add-rule
#     split, the shared fc2-rule divide Sr.
#   phase 2 (local): the fc2 rule scatter to (n, M/k), the fc1 rule's
#     divide, and the fc1 rule gather partials num_w/num_a.
#   XLA: psum(num_w, num_a) -> R2b, clone merge.
#
# This is _mlp_rev_math_chunked's chunk loop with "chunk" == "device" and
# the cross-chunk accumulations turned into psums — numerically the same
# re-association. Mosaic cannot express the psums in-kernel; this split is
# the finest kernel granularity TP admits (docs/PARALLELISM.md).
# ---------------------------------------------------------------------------


def _mlp_rev_tp1_kernel(*refs, eps: float, mxu: str, rule_mxu: str,
                        wsplit: int):
    (x_mid_ref, g_out_ref, ls_ref, lb_ref, b1_ref) = refs[:5]
    fc1_ref, fc2p_ref, axw2_ref, gxn2_ref = refs[-4:]
    w_refs = refs[5:-4]
    if wsplit > 1:
        w1 = tuple(r[:] for r in w_refs[:wsplit])
        w2 = tuple(r[:] for r in w_refs[wsplit:])
    else:
        w1, w2 = w_refs[0][:], w_refs[1][:]
    xn2, _, _ = _ln_fwd(x_mid_ref[:], ls_ref[:], lb_ref[:], eps)
    fc1_pre = _kdot(xn2, w1, ((1,), (0,)), mxu)
    h1 = fc1_pre + b1_ref[:]
    hg = _gelu_exact(h1)
    fc2p_ref[:] = _kdot(hg, w2, ((1,), (0,)), mxu)
    axw2_ref[:] = _kdot(jnp.abs(hg), _kabs(w2), ((1,), (0,)), rule_mxu)
    g_hg = _kdot(g_out_ref[:], w2, ((1,), (1,)), mxu)
    gxn2_ref[:] = _kdot(g_hg * _gelu_grad(h1), w1, ((1,), (1,)), mxu)
    fc1_ref[:] = fc1_pre


def _mlp_rev_tp2_kernel(*refs, eps: float, rule_mxu: str, wsplit: int):
    (x_mid_ref, Sr_ref, fc1_ref, ls_ref, lb_ref, b1_ref) = refs[:6]
    numw_ref, numa_ref = refs[-2:]
    w_refs = refs[6:-2]
    if wsplit > 1:
        w1 = tuple(r[:] for r in w_refs[:wsplit])
        w2 = tuple(r[:] for r in w_refs[wsplit:])
    else:
        w1, w2 = w_refs[0][:], w_refs[1][:]
    dt = Sr_ref.dtype
    half = jnp.asarray(0.5, dt)
    xn2, _, _ = _ln_fwd(x_mid_ref[:], ls_ref[:], lb_ref[:], eps)
    fc1_pre = fc1_ref[:]
    hg = _gelu_exact(fc1_pre + b1_ref[:])
    Sr = Sr_ref[:]
    aw2 = _kabs(w2)
    R2 = half * (hg * _kdot(Sr, w2, ((1,), (1,)), rule_mxu)
                 + jnp.abs(hg) * _kdot(Sr, aw2, ((1,), (1,)), rule_mxu))
    aw1 = _kabs(w1)
    axw1 = _kdot(jnp.abs(xn2), aw1, ((1,), (0,)), rule_mxu)
    S1 = _ksafe_divide(R2, half * (fc1_pre + axw1))
    numw_ref[:] = _kdot(S1, w1, ((1,), (1,)), rule_mxu)
    numa_ref[:] = _kdot(S1, aw1, ((1,), (1,)), rule_mxu)


def _mlp_tp_weight_ops(w1_l, w2_l, dt, mxu):
    """Weight operands for the TP MLP kernels, in the forward dot dtype
    (mirrors :func:`mlp_rev_core`: bf16 single / tf32 (hi, lo) pair /
    HIGHEST (hi, mid, lo) triple; f64 = interpret-mode tests, unsplit)."""
    wk = [w1_l, w2_l]
    if dt == jnp.float32 and mxu not in ("bfloat16", "tensorfloat32"):
        return [part for w in wk for part in _split3(w)], 3
    flat, paired = _flatten_weights(wk, mxu)
    return flat, (2 if paired else 1)


def mlp_rev_tp_phase1(x_mid: jax.Array, g_out: jax.Array, ln: dict,
                      b1_l: jax.Array, w1_l: jax.Array, w2_l: jax.Array,
                      eps: float, mxu: str = "bfloat16",
                      rule_mxu: str = "bfloat16",
                      use_pallas: Optional[bool] = None,
                      interpret: bool = False):
    """Local phase 1 on this device's (D, M/k)/(M/k, D) shard: returns
    (fc1_pre_l (n, M/k), fc2_pre_l, axw2_l, g_xn2_l (each (n, D) psum
    partials)). Call under shard_map; psum the three partials."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n, D = x_mid.shape
    Ml = w1_l.shape[1]
    dt = jnp.float64 if x_mid.dtype == jnp.float64 else jnp.float32
    if not use_pallas and not interpret:
        # jnp fallback: exact dots (mirrors _mlp_rev_core_jnp — off-TPU the
        # mxu names select MXU pass counts that don't exist)
        xn2, _, _ = _ln_fwd(x_mid, ln["scale"], ln["bias"], eps)
        fc1_pre = xn2 @ w1_l
        h1 = fc1_pre + b1_l
        hg = _gelu_exact(h1)
        fc2p = hg @ w2_l
        axw2 = jnp.abs(hg) @ jnp.abs(w2_l)
        g_hg = g_out @ w2_l.T
        gxn2 = (g_hg * _gelu_grad(h1)) @ w1_l.T
        return fc1_pre, fc2p, axw2, gxn2
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    w_flat, wsplit = _mlp_tp_weight_ops(w1_l, w2_l, dt, mxu)
    outs = pl.pallas_call(
        functools.partial(_mlp_rev_tp1_kernel, eps=eps, mxu=mxu,
                          rule_mxu=rule_mxu, wsplit=wsplit),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (5 + len(w_flat)),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((n, Ml), dt)]
        + [jax.ShapeDtypeStruct((n, D), dt)] * 3,
        compiler_params=_vmem_params(interpret,
                                     mib=112 if wsplit == 3 else 96),
        interpret=interpret,
    )(x_mid.astype(dt), g_out.astype(dt),
      ln["scale"][None].astype(dt), ln["bias"][None].astype(dt),
      b1_l[None].astype(dt), *w_flat)
    return tuple(outs)


def mlp_rev_tp_phase2(x_mid: jax.Array, Sr: jax.Array, fc1_pre_l: jax.Array,
                      ln: dict, b1_l: jax.Array, w1_l: jax.Array,
                      w2_l: jax.Array, eps: float,
                      mxu: str = "bfloat16", rule_mxu: str = "bfloat16",
                      use_pallas: Optional[bool] = None,
                      interpret: bool = False):
    """Local phase 2: the fc2 rule scatter + fc1 rule on this shard;
    returns (num_w_l, num_a_l) (n, D) psum partials. ``Sr`` is the shared
    fc2-rule divide computed in XLA from the psummed denominators;
    ``fc1_pre_l`` is phase 1's persisted anchor. (``mxu`` only selects the
    weight operand layout — every dot here is a rule dot at ``rule_mxu``.)"""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n, D = x_mid.shape
    dt = jnp.float64 if x_mid.dtype == jnp.float64 else jnp.float32
    if not use_pallas and not interpret:
        half = jnp.asarray(0.5, Sr.dtype)
        xn2, _, _ = _ln_fwd(x_mid, ln["scale"], ln["bias"], eps)
        hg = _gelu_exact(fc1_pre_l + b1_l)
        aw2 = jnp.abs(w2_l)
        R2 = half * (hg * (Sr @ w2_l.T) + jnp.abs(hg) * (Sr @ aw2.T))
        aw1 = jnp.abs(w1_l)
        axw1 = jnp.abs(xn2) @ aw1
        S1 = _ksafe_divide(R2, half * (fc1_pre_l + axw1))
        return S1 @ w1_l.T, S1 @ aw1.T
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    w_flat, wsplit = _mlp_tp_weight_ops(w1_l, w2_l, dt, mxu)
    outs = pl.pallas_call(
        functools.partial(_mlp_rev_tp2_kernel, eps=eps, rule_mxu=rule_mxu,
                          wsplit=wsplit),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (6 + len(w_flat)),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, D), dt)] * 2,
        compiler_params=_vmem_params(interpret,
                                     mib=112 if wsplit == 3 else 96),
        interpret=interpret,
    )(x_mid.astype(dt), Sr.astype(dt), fc1_pre_l.astype(dt),
      ln["scale"][None].astype(dt), ln["bias"][None].astype(dt),
      b1_l[None].astype(dt), *w_flat)
    return tuple(outs)


# ---------------------------------------------------------------------------
# Whole-block reverse megakernel.
#
# Per-program fixed cost (~35us: small-dot pipeline latency + program setup)
# dominates the separate attention/MLP kernels, and the remaining XLA glue
# (LN fwd/bwd, qkv/proj matmuls, add/clone/proj/qkv rules) still round-trips
# (n, D)/(n, 3D) tensors through HBM. This kernel runs the ENTIRE fused
# reverse step of one block — everything between (g_out, R_out) and
# (g_in, R_in, gc) — in a single Pallas program per (sample, block):
# LN1/qkv recompute, the MLP core, backward, the add1/proj/qkv α-β rules,
# the attention core, and the clone merges. bf16-mode only (the f32 weight
# working set overflows scoped VMEM).
# ---------------------------------------------------------------------------


def _add_rule_math(a, b, R, Z=None):
    """'ours' Add rule with in-kernel (per-sample) global sums."""
    dt = R.dtype
    if Z is None:
        Z = a + b
    S = _ksafe_divide(R, Z)
    Ca = a * S
    Cb = b * S
    a_sum = Ca.sum()
    b_sum = Cb.sum()
    tot = jnp.abs(a_sum) + jnp.abs(b_sum)
    r_sum = R.sum()
    a_fact = _ksafe_divide(jnp.abs(a_sum), tot) * r_sum
    b_fact = _ksafe_divide(jnp.abs(b_sum), tot) * r_sum
    return Ca * _ksafe_divide(a_fact, a_sum), Cb * _ksafe_divide(b_fact, b_sum)


def _linear_rule_math(x, w, R, y_pre, rule_mxu):
    """'ours' α-β rule at α=1 (abs identity, shared denominator)."""
    dt = x.dtype
    half = jnp.asarray(0.5, dt)
    ax = jnp.abs(x)
    aw = _kabs(w)
    axw = _kdot(ax, aw, ((1,), (0,)), rule_mxu)
    S = _ksafe_divide(R, half * (y_pre + axw))
    return half * (x * _kdot(S, w, ((1,), (1,)), rule_mxu)
                   + ax * _kdot(S, aw, ((1,), (1,)), rule_mxu))


def _attn_rev_math(qkv, g_o, cam_o, num_heads, head_dim, scale,
                   attn_mxu, rule_mxu, saved_attn=None, out_m=None):
    """Head-loop attention reverse (the _attn_rev_kernel body on arrays);
    returns (g_qkv, cam_qkv, gc) in the raw (n, 3D) layout.

    ``saved_attn``: optional (dots, probs) forward anchors, each (h*n, n)
    row-stacked per head — skips the QK^T recompute and the softmax; with
    ``out_m`` (the merged AV anchor, (n, D)) the AV recompute is skipped
    too. The saved family is internally consistent (forward computed probs
    from dots and out_m from probs⊙v), so every rule divides by the exact
    value its numerator was linearized at — the round-2b anchor-consistency
    requirement."""
    n = qkv.shape[0]
    D = num_heads * head_dim
    dt = qkv.dtype
    half = jnp.asarray(0.5, dt)
    gc = jnp.zeros((n, n), dt)
    gq, gk, gv, cq, ck, cv = [], [], [], [], [], []
    for h in range(num_heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, D + h * head_dim: D + (h + 1) * head_dim]
        v = qkv[:, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim]
        go = g_o[:, h * head_dim:(h + 1) * head_dim]
        co = cam_o[:, h * head_dim:(h + 1) * head_dim]
        if saved_attn is not None:
            sdots, sprobs = saved_attn
            dots = sdots[h * n:(h + 1) * n, :]
            attn = sprobs[h * n:(h + 1) * n, :]
        else:
            dots = _kdot(q, k, ((1,), (1,)), attn_mxu)
            attn = jax.nn.softmax(dots * jnp.asarray(scale, dt), axis=-1)
        if out_m is not None:
            out = out_m[:, h * head_dim:(h + 1) * head_dim]
        else:
            out = _kdot(attn, v, ((1,), (0,)), attn_mxu)
        g_attn = _kdot(go, v, ((1,), (1,)), attn_mxu)
        gv.append(_kdot(attn, go, ((0,), (0,)), attn_mxu))
        inner = (g_attn * attn).sum(axis=-1, keepdims=True)
        g_dots = attn * (g_attn - inner) * jnp.asarray(scale, dt)
        gq.append(_kdot(g_dots, k, ((1,), (0,)), attn_mxu))
        gk.append(_kdot(g_dots, q, ((0,), (0,)), attn_mxu))
        S1 = _ksafe_divide(co, out)
        cam1 = attn * _kdot(S1, v, ((1,), (1,)), rule_mxu) * half
        cv.append(v * _kdot(attn, S1, ((0,), (0,)), rule_mxu) * half)
        S2 = _ksafe_divide(cam1, dots)
        cq.append(q * _kdot(S2, k, ((1,), (0,)), rule_mxu) * half)
        ck.append(k * _kdot(S2, q, ((0,), (0,)), rule_mxu) * half)
        gc = gc + jnp.maximum(g_attn * cam1, jnp.zeros((), dt))
    g_qkv = jnp.concatenate(gq + gk + gv, axis=1)
    cam_qkv = jnp.concatenate(cq + ck + cv, axis=1)
    return g_qkv, cam_qkv, gc / jnp.asarray(num_heads, dt)


def _block_rev_math(x_in, x_mid, out_m, g_out, R,
                    ln1s, ln1b, ln2s, ln2b, bqkv, bproj, b1, b2,
                    wqkv, wproj, w1, w2, *,
                    num_heads, head_dim, scale, eps, mxu, attn_mxu, rule_mxu,
                    mlp_mxu=None, saved=None):
    """The whole fused reverse step of one block (vit.reverse_pass kstep).

    ``saved``: optional (qkv_pre, proj_pre, dots, probs[, fc1_pre,
    fc2_pre]) rich forward anchors (dots/probs row-stacked (h*n, n);
    the ``*_pre`` entries are pre-bias matmul outputs). When given, the
    qkv/proj/QK^T/softmax/AV recomputes are all skipped — ~17% of the
    kernel's MXU passes in the production mode — and, with the 6-tuple,
    the two MLP forward-recompute dots too (~11% more). Every
    linearization point comes from ONE internally-consistent family (the
    forward kernel's own values), which is strictly safer than recompute
    w.r.t. the round-2b anchor-mismatch failure mode."""
    dt = x_in.dtype
    saved_mlp = None
    xn1, mu1, inv1 = _ln_fwd(x_in, ln1s, ln1b, eps)
    if saved is not None:
        s_qkv_pre, s_proj_pre, s_dots, s_probs = saved[:4]
        if len(saved) == 6:
            saved_mlp = saved[4:]
        qkv_pre = s_qkv_pre
        qkv = qkv_pre + bqkv          # same add on the same values as the
        proj_pre = s_proj_pre         # forward kernel -> bitwise equal
        saved_attn = (s_dots, s_probs)
        out_anchor = out_m
    else:
        # recompute LN1 + qkv (out_m is the saved forward anchor)
        qkv_pre = _kdot(xn1, wqkv, ((1,), (0,)), mxu)
        qkv = qkv_pre + bqkv
        proj_pre = _kdot(out_m, wproj, ((1,), (0,)), mxu)
        saved_attn = None
        out_anchor = None
    attn_out = proj_pre + bproj

    # MLP half
    g_mid, Rm = _mlp_rev_math(x_mid, g_out, R, ln2s, ln2b, b1, b2, w1, w2,
                              eps=eps, mxu=mxu, rule_mxu=rule_mxu,
                              mlp_mxu=mlp_mxu, saved_mlp=saved_mlp)

    g_om = _kdot(g_mid, wproj, ((1,), (1,)), mxu)

    # add1 split + proj rule. Z is recomputed as x_in + attn_out IN-KERNEL
    # (not the saved x_mid anchor): the rule's S = R/Z ⊙ {a, b} assumes
    # a + b == Z *bitwise* — with the saved anchor, the kernel's own proj
    # recompute differs from the forward kernel's by an ulp-level δ, and
    # S amplifies δ unboundedly wherever x_mid ≈ 0 elementwise (measured:
    # a ≤1.2e-4 anchor-vs-recompute mismatch flipped whole catdog heatmaps
    # while the bitwise-consistent XLA path was stable — PERF.md round 2b).
    # (On the rich-anchor path attn_out derives from the SAVED proj_pre, so
    # the same consistency holds with x_mid itself — but recomputing the add
    # costs nothing and keeps one code shape.)
    Ra1, Ra2 = _add_rule_math(x_in, attn_out, Rm)
    cam_o = _linear_rule_math(out_m, wproj, Ra2, proj_pre, rule_mxu)

    # attention core
    g_qkv, cam_qkv, gc = _attn_rev_math(qkv, g_om, cam_o, num_heads,
                                        head_dim, scale, attn_mxu, rule_mxu,
                                        saved_attn=saved_attn,
                                        out_m=out_anchor)

    # qkv-side tails
    g_xn1 = _kdot(g_qkv, wqkv, ((1,), (1,)), mxu)
    gg = g_xn1 * ln1s
    xhat = (x_in - mu1) * inv1
    g_in = g_mid + inv1 * (gg - gg.mean(axis=-1, keepdims=True)
                           - xhat * (gg * xhat).mean(axis=-1, keepdims=True))
    R2 = _linear_rule_math(xn1, wqkv, cam_qkv, qkv_pre, rule_mxu)
    R_in = x_in * _ksafe_divide(Ra1 + R2, x_in)
    return g_in, R_in, gc


def _read_weight_refs(w_refs, paired: bool):
    """Materialize kernel weight refs: 4 plain arrays, or — in the emulated
    tf32 mode — 4 (hi, lo) bf16 pairs flattened to 8 refs."""
    if paired:
        return tuple((w_refs[i][:], w_refs[i + 1][:]) for i in range(0, 8, 2))
    return tuple(w_refs[i][:] for i in range(4))


def _flatten_weights(ws, mxu: str):
    """Wrapper-side inverse of :func:`_read_weight_refs`: cast weights to the
    forward dot dtype (bf16 1-pass / f32 HIGHEST), or pre-split each into a
    (hi, lo) bf16 pair for the 3-pass tf32 emulation."""
    if mxu == "tensorfloat32":
        flat = []
        for w in ws:
            flat.extend(_split_hi_lo(w.astype(jnp.float32)))
        return flat, True
    wdt = jnp.bfloat16 if mxu == "bfloat16" else (
        jnp.float64 if ws[0].dtype == jnp.float64 else jnp.float32)
    return [w.astype(wdt) for w in ws], False


def _pair_weights(flat, paired: bool):
    if paired:
        return tuple((flat[i], flat[i + 1])
                     for i in range(0, len(flat), 2))
    return tuple(flat)


def prepare_block_weights(blocks: dict, mxu: str):
    """Pre-cast / pre-split the STACKED (L, ...) block weights once, outside
    the scan. The per-step path then feeds plain arrays to the kernels.

    This is load-bearing for correctness, not just speed: doing the tf32
    RNE bit-trick split inside the scan body makes XLA build
    slice+bitcast fusions feeding the pallas custom-calls, a pattern this
    toolchain's TPU compiler mis-handles (scoped-vmem "should not be
    possible" errors on some program shapes, and silently wrong values in
    the final reverse-scan steps of the fused explain program — see
    PERF.md round 2b).
    """
    ws = [blocks["qkv"]["kernel"], blocks["proj"]["kernel"],
          blocks["fc1"]["kernel"], blocks["fc2"]["kernel"]]
    flat, _ = _flatten_weights(ws, mxu)
    return tuple(flat)


def _block_rev_kernel(*refs, num_heads, head_dim, scale, eps, mxu, attn_mxu,
                      rule_mxu, mlp_mxu, paired, n_saved=0):
    (x_in_ref, x_mid_ref, out_ref, g_out_ref, R_ref,
     ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
     bqkv_ref, bproj_ref, b1_ref, b2_ref) = refs[:13]
    g_in_ref, R_in_ref, gc_ref = refs[-3:]
    w_refs = refs[13:-3]
    saved = None
    if n_saved:
        saved = tuple(r[:] for r in w_refs[-n_saved:])
        w_refs = w_refs[:-n_saved]
    wqkv, wproj, w1, w2 = _read_weight_refs(w_refs, paired)
    g_in, R_in, gc = _block_rev_math(
        x_in_ref[:], x_mid_ref[:], out_ref[:], g_out_ref[:], R_ref[:],
        ln1s_ref[:], ln1b_ref[:], ln2s_ref[:], ln2b_ref[:],
        bqkv_ref[:], bproj_ref[:], b1_ref[:], b2_ref[:],
        wqkv, wproj, w1, w2,
        num_heads=num_heads, head_dim=head_dim, scale=scale, eps=eps,
        mxu=mxu, attn_mxu=attn_mxu, rule_mxu=rule_mxu, mlp_mxu=mlp_mxu,
        saved=saved)
    g_in_ref[:] = g_in
    R_in_ref[:] = R_in
    gc_ref[:] = gc


def block_rev_core(x_in, x_mid, out_m, g_out, R, bp,
                   num_heads: int, head_dim: int, eps: float,
                   mxu: str = "bfloat16", attn_mxu: str = "bfloat16",
                   rule_mxu: str = "bfloat16",
                   mlp_mxu: Optional[str] = None,
                   use_pallas: Optional[bool] = None,
                   interpret: bool = False,
                   ws: Optional[tuple] = None,
                   saved: Optional[tuple] = None):
    """ONE kernel for the entire fused reverse step of a ViT block
    (variant="ours", α=1): returns (g_in, R_in, gc (n, n)).

    ``mlp_mxu``: optional override for the fc1/fc2 forward-recompute +
    backward dots only (None = ``mxu``); see :func:`_mlp_rev_math`.

    ``bp``: the block params dict (norm1/norm2/qkv/proj/fc1/fc2). Weights
    enter pre-cast to the forward dot dtype — bf16 arrays (1-pass), (hi, lo)
    bf16 pairs (3-pass tf32 emulation), or f32 (HIGHEST; overflows scoped
    VMEM on real hardware — interpret/tests only). Rule-side abs/casts happen
    in VMEM. The jnp fallback (and interpret mode) is dtype-exact.

    ``ws``: this block's slice of :func:`prepare_block_weights` — prepared
    OUTSIDE the scan. Callers scanning over blocks should always use it
    (see the prepare_block_weights docstring for why).

    ``saved``: optional rich anchors (qkv_pre, proj_pre, dots, probs) from
    ``block_fwd_core(save_attn=True)`` — skips those recomputes in-kernel;
    the 6-tuple form (… , fc1_pre, fc2_pre from ``save_mlp=True``) also
    skips the MLP forward-recompute dots (see :func:`_block_rev_math`).
    """
    scale = head_dim ** -0.5
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n, D = x_in.shape
    dt = jnp.float64 if x_in.dtype == jnp.float64 else jnp.float32
    bqkv = bp["qkv"].get("bias")
    if bqkv is None:
        bqkv = jnp.zeros((3 * D,), dt)
    args = dict(
        ln1s=bp["norm1"]["scale"][None].astype(dt),
        ln1b=bp["norm1"]["bias"][None].astype(dt),
        ln2s=bp["norm2"]["scale"][None].astype(dt),
        ln2b=bp["norm2"]["bias"][None].astype(dt),
        bqkv=bqkv[None].astype(dt), bproj=bp["proj"]["bias"][None].astype(dt),
        b1=bp["fc1"]["bias"][None].astype(dt),
        b2=bp["fc2"]["bias"][None].astype(dt))
    if ws is not None:
        w_flat, paired = list(ws), mxu == "tensorfloat32"
    else:
        w_flat, paired = _flatten_weights(
            [bp["qkv"]["kernel"], bp["proj"]["kernel"],
             bp["fc1"]["kernel"], bp["fc2"]["kernel"]], mxu)
    if saved is not None:
        saved = tuple(s.astype(dt) for s in saved)
    if not use_pallas and not interpret:
        wqkv, wproj, w1, w2 = _pair_weights(w_flat, paired)
        return _block_rev_math(
            x_in.astype(dt), x_mid.astype(dt), out_m.astype(dt),
            g_out.astype(dt), R.astype(dt), **args,
            wqkv=wqkv, wproj=wproj, w1=w1, w2=w2,
            num_heads=num_heads, head_dim=head_dim, scale=scale, eps=eps,
            mxu=mxu, attn_mxu=attn_mxu, rule_mxu=rule_mxu, mlp_mxu=mlp_mxu,
            saved=saved)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    extra = list(saved) if saved is not None else []
    return pl.pallas_call(
        functools.partial(_block_rev_kernel, num_heads=num_heads,
                          head_dim=head_dim, scale=scale, eps=eps, mxu=mxu,
                          attn_mxu=attn_mxu, rule_mxu=rule_mxu,
                          mlp_mxu=mlp_mxu, paired=paired,
                          n_saved=len(extra)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (
            13 + len(w_flat) + len(extra)),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((n, D), dt),
                   jax.ShapeDtypeStruct((n, D), dt),
                   jax.ShapeDtypeStruct((n, n), dt)],
        # ViT-L (D=1024, MLP 4096) peaks ~120.3 MiB scoped; ViT-B stays
        # under the 96 MiB default (v5e VMEM: 128 MiB)
        compiler_params=_vmem_params(interpret, mib=96 if D <= 768 else 121),
        interpret=interpret,
    )(x_in.astype(dt), x_mid.astype(dt), out_m.astype(dt), g_out.astype(dt),
      R.astype(dt), args["ln1s"], args["ln1b"], args["ln2s"], args["ln2b"],
      args["bqkv"], args["bproj"], args["b1"], args["b2"], *w_flat, *extra)


# ---------------------------------------------------------------------------
# Whole-block forward megakernel (the fused path's forward-scan body).
# ---------------------------------------------------------------------------


def _block_fwd_math(x, ln1s, ln1b, ln2s, ln2b, bqkv, bproj, b1, b2,
                    wqkv, wproj, w1, w2, *,
                    num_heads, head_dim, scale, eps, mxu, attn_mxu,
                    mlp_mxu=None, save_attn=False, save_mlp=False):
    """``save_attn``: additionally return the rich anchors
    (qkv_pre (n, 3D), proj_pre (n, D), dots (h*n, n), probs (h*n, n)) the
    rich-anchor reverse step consumes (see :func:`_block_rev_math`).
    ``save_mlp`` (requires ``save_attn``): also return the MLP anchors
    (fc1_pre (n, M), fc2_pre (n, D)) so the reverse step skips the two
    MLP forward-recompute dots as well (~+3 MB/block/sample)."""
    mmx = mlp_mxu or mxu
    dt = x.dtype
    D = num_heads * head_dim
    xn1, _, _ = _ln_fwd(x, ln1s, ln1b, eps)
    qkv_pre = _kdot(xn1, wqkv, ((1,), (0,)), mxu)
    qkv = qkv_pre + bqkv
    outs, dots_l, probs_l = [], [], []
    for h in range(num_heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, D + h * head_dim: D + (h + 1) * head_dim]
        v = qkv[:, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim]
        dots = _kdot(q, k, ((1,), (1,)), attn_mxu)
        attn = jax.nn.softmax(dots * jnp.asarray(scale, dt), axis=-1)
        outs.append(_kdot(attn, v, ((1,), (0,)), attn_mxu))
        if save_attn:
            dots_l.append(dots)
            probs_l.append(attn)
    out_m = jnp.concatenate(outs, axis=1)
    proj_pre = _kdot(out_m, wproj, ((1,), (0,)), mxu)
    attn_out = proj_pre + bproj
    x_mid = x + attn_out
    xn2, _, _ = _ln_fwd(x_mid, ln2s, ln2b, eps)
    fc1_pre = _kdot(xn2, w1, ((1,), (0,)), mmx)
    hg = _gelu_exact(fc1_pre + b1)
    fc2_pre = _kdot(hg, w2, ((1,), (0,)), mmx)
    x_out = x_mid + (fc2_pre + b2)
    if save_attn:
        outs = (x_out, x_mid, out_m, qkv_pre, proj_pre,
                jnp.concatenate(dots_l, axis=0),
                jnp.concatenate(probs_l, axis=0))
        return outs + (fc1_pre, fc2_pre) if save_mlp else outs
    assert not save_mlp, "save_mlp requires save_attn"
    return x_out, x_mid, out_m


def _block_fwd_kernel(*refs, num_heads, head_dim, scale, eps, mxu, attn_mxu,
                      mlp_mxu, paired, save_attn=False, save_mlp=False):
    (x_ref, ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
     bqkv_ref, bproj_ref, b1_ref, b2_ref) = refs[:9]
    n_out = 3 + (4 if save_attn else 0) + (2 if save_mlp else 0)
    out_refs = refs[-n_out:]
    wqkv, wproj, w1, w2 = _read_weight_refs(refs[9:-n_out], paired)
    outs = _block_fwd_math(
        x_ref[:], ln1s_ref[:], ln1b_ref[:], ln2s_ref[:], ln2b_ref[:],
        bqkv_ref[:], bproj_ref[:], b1_ref[:], b2_ref[:],
        wqkv, wproj, w1, w2,
        num_heads=num_heads, head_dim=head_dim, scale=scale, eps=eps,
        mxu=mxu, attn_mxu=attn_mxu, mlp_mxu=mlp_mxu, save_attn=save_attn,
        save_mlp=save_mlp)
    for r, o in zip(out_refs, outs):
        r[:] = o


def block_fwd_core(x, bp, num_heads: int, head_dim: int, eps: float,
                   mxu: str = "bfloat16", attn_mxu: str = "bfloat16",
                   mlp_mxu: Optional[str] = None,
                   use_pallas: Optional[bool] = None,
                   interpret: bool = False,
                   ws: Optional[tuple] = None,
                   save_attn: bool = False,
                   save_mlp: bool = False):
    """ONE kernel for a full ViT block forward; returns
    (x_out, x_mid, out_merged) — the fused reverse pass's three anchors.
    ``ws``: this block's slice of :func:`prepare_block_weights` (callers
    scanning over blocks should always pass it — see its docstring).

    ``save_attn=True`` additionally returns the rich anchors
    (qkv_pre, proj_pre, dots, probs) for :func:`block_rev_core`'s
    ``saved`` argument — trading ~6 MB/block HBM for ~17% of the reverse
    kernel's MXU passes (the qkv/proj/QK^T/softmax/AV recomputes).
    ``save_mlp=True`` (with ``save_attn``) appends (fc1_pre, fc2_pre),
    letting the reverse also skip the two MLP forward-recompute dots
    (~11% more) for ~+3 MB/block."""
    scale = head_dim ** -0.5
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n, D = x.shape
    dt = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    bqkv = bp["qkv"].get("bias")
    if bqkv is None:
        bqkv = jnp.zeros((3 * D,), dt)
    if ws is not None:
        w_flat, paired = list(ws), mxu == "tensorfloat32"
    else:
        w_flat, paired = _flatten_weights(
            [bp["qkv"]["kernel"], bp["proj"]["kernel"],
             bp["fc1"]["kernel"], bp["fc2"]["kernel"]], mxu)
    flat = (x.astype(dt),
            bp["norm1"]["scale"][None].astype(dt),
            bp["norm1"]["bias"][None].astype(dt),
            bp["norm2"]["scale"][None].astype(dt),
            bp["norm2"]["bias"][None].astype(dt),
            bqkv[None].astype(dt), bp["proj"]["bias"][None].astype(dt),
            bp["fc1"]["bias"][None].astype(dt),
            bp["fc2"]["bias"][None].astype(dt))
    if not use_pallas and not interpret:
        wqkv, wproj, w1, w2 = _pair_weights(w_flat, paired)
        return _block_fwd_math(*flat, wqkv, wproj, w1, w2,
                               num_heads=num_heads, head_dim=head_dim,
                               scale=scale, eps=eps, mxu=mxu,
                               attn_mxu=attn_mxu, mlp_mxu=mlp_mxu,
                               save_attn=save_attn, save_mlp=save_mlp)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    out_shape = [jax.ShapeDtypeStruct((n, D), dt)] * 3
    if save_attn:
        out_shape += [jax.ShapeDtypeStruct((n, 3 * D), dt),
                      jax.ShapeDtypeStruct((n, D), dt),
                      jax.ShapeDtypeStruct((num_heads * n, n), dt),
                      jax.ShapeDtypeStruct((num_heads * n, n), dt)]
    if save_mlp:
        M = bp["fc1"]["kernel"].shape[-1]
        out_shape += [jax.ShapeDtypeStruct((n, M), dt),
                      jax.ShapeDtypeStruct((n, D), dt)]
    return pl.pallas_call(
        functools.partial(_block_fwd_kernel, num_heads=num_heads,
                          head_dim=head_dim, scale=scale, eps=eps, mxu=mxu,
                          attn_mxu=attn_mxu, mlp_mxu=mlp_mxu, paired=paired,
                          save_attn=save_attn, save_mlp=save_mlp),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (9 + len(w_flat)),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        out_shape=out_shape,
        compiler_params=_vmem_params(interpret),
        interpret=interpret,
    )(*flat, *w_flat)


# ---------------------------------------------------------------------------
# BERT encoder-layer kernels (post-norm architecture, masked attention).
#
# Same design as the ViT block kernels: the reverse step of one layer is
# split into an output-block core (intermediate/out denses + final LN) and an
# attention core (q/k/v, masked softmax, attn_out dense + post-attention LN),
# each ONE Pallas program per (sample, layer) with every (S, I)/(h, S, S)
# tensor VMEM-resident. This removes the reverse pass's dominant HBM
# tensors: the saved (L, h, S, S) attention probabilities (151 MB per
# example at S=512) and the stacked (L, h, S, S) cam+grad scan outputs —
# the fused (grad ⊙ cam)⁺ head-mean leaves one (S, S) map per layer.
#
# The attention-mask Add rule (reference BERT.py:342 — relevance split
# between scaled scores and the additive mask) renormalizes with GLOBAL
# sums over the full (h, S, S) tensor; every downstream rule is linear in
# its incoming relevance, so the renormalization is deferred to a scalar
# λ applied after the head loop (no second pass over heads).
#
# Reference: BertSelfAttention.relprop BERT.py:367-409, BertLayer.relprop
# :521-530; variant="ours", alpha=1 only (other configs keep the XLA path).
# ---------------------------------------------------------------------------


def _ln_bwd_math(g_y, x, s, eps):
    mu = x.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + jnp.asarray(eps, x.dtype))
    xhat = (x - mu) * inv
    gg = g_y * s
    return inv * (gg - gg.mean(axis=-1, keepdims=True)
                  - xhat * (gg * xhat).mean(axis=-1, keepdims=True))


def _bert_out_rev_math(att_ln, g_out, R, lns, lnb, b_i, b_o, wi, wo, *,
                       eps, mxu, rule_mxu, mlp_mxu=None, saved_mlp=None):
    """Output sub-block reverse: LN(dense2 + att_ln) backward + the add
    split, both Linear rules and the clone merge. Returns (g_attln, R_att).

    ``mlp_mxu``: optional override for the four inter/out dense fwd/bwd
    dots (None = ``mxu``) — the BERT analog of the ViT MLP-precision
    island (see :func:`_mlp_rev_math` / PERF.md round 2c).

    ``saved_mlp``: optional (inter_pre_nb, dense2_nb) rich forward anchors
    — skips the two dense forward-recompute dots (bit-identical: the
    forward kernel computed them with the same dots on the same operands,
    and the bias adds below repeat on equal values)."""
    mmx = mlp_mxu or mxu
    del lnb  # LN bias does not enter the backward/rules
    if saved_mlp is not None:
        inter_pre_nb, dense2_nb = saved_mlp
    else:
        inter_pre_nb = _kdot(att_ln, wi, ((1,), (0,)), mmx)
    inter_pre = inter_pre_nb + b_i
    inter_g = _gelu_exact(inter_pre)
    if saved_mlp is None:
        dense2_nb = _kdot(inter_g, wo, ((1,), (0,)), mmx)
    dense2 = dense2_nb + b_o

    g_sum2 = _ln_bwd_math(g_out, dense2 + att_ln, lns, eps)
    g_ig = _kdot(g_sum2, wo, ((1,), (1,)), mmx)
    g_h1 = g_ig * _gelu_grad(inter_pre)
    g_attln = g_sum2 + _kdot(g_h1, wi, ((1,), (1,)), mmx)

    R1, R2 = _add_rule_math(dense2, att_ln, R)
    R1 = _linear_rule_math(inter_g, wo, R1, dense2_nb, rule_mxu)
    R1 = _linear_rule_math(att_ln, wi, R1, inter_pre_nb, rule_mxu)
    R_att = att_ln * _ksafe_divide(R1 + R2, att_ln)
    return g_attln, R_att


def _attn_head_fwd(q, k, v, mask_row, inv_s, attn_mxu, save=False):
    raw = _kdot(q, k, ((1,), (1,)), attn_mxu)
    probs = jax.nn.softmax(raw * inv_s + mask_row, axis=-1)
    out = _kdot(probs, v, ((1,), (0,)), attn_mxu)
    if save:
        return out, raw, probs
    return out


def _attn_head_rev(q, k, v, ctx_i, g_o, R1_i, mask_row, inv_s,
                   attn_mxu, rule_mxu, saved_rp=None):
    """One head's backward + z-rules (probs recomputed — bitwise, same dots
    on the same operands as pass 1). Returns the six (S, d) per-head outputs
    plus the gc contribution and the three mask-Add renorm partial sums.

    ``saved_rp``: optional (raw, probs) forward anchors for this head —
    skips the QK^T recompute (multi-pass in the f32 attention island) and
    the softmax; bit-identical by construction (the forward kernel computed
    them with the same dots on the same operands)."""
    dt = q.dtype
    half = jnp.asarray(0.5, dt)
    if saved_rp is not None:
        raw, probs = saved_rp
        scaled = raw * inv_s
    else:
        raw = _kdot(q, k, ((1,), (1,)), attn_mxu)
        scaled = raw * inv_s
        probs = jax.nn.softmax(scaled + mask_row, axis=-1)
    g_probs = _kdot(g_o, v, ((1,), (1,)), attn_mxu)
    gv_i = _kdot(probs, g_o, ((0,), (0,)), attn_mxu)
    inner = (g_probs * probs).sum(axis=-1, keepdims=True)
    g_raw = probs * (g_probs - inner) * inv_s
    gq_i = _kdot(g_raw, k, ((1,), (0,)), attn_mxu)
    gk_i = _kdot(g_raw, q, ((0,), (0,)), attn_mxu)

    S1 = _ksafe_divide(R1_i, ctx_i)
    cam1 = probs * _kdot(S1, v, ((1,), (1,)), rule_mxu) * half
    cv_i = v * _kdot(probs, S1, ((0,), (0,)), rule_mxu) * half
    gc_c = jnp.maximum(g_probs * cam1, jnp.zeros((), dt))

    Zm = scaled + mask_row
    Sm = _ksafe_divide(cam1, Zm)
    M = scaled * Sm
    S2u = _ksafe_divide(M, raw)
    cqu_i = q * _kdot(S2u, k, ((1,), (0,)), rule_mxu) * half
    cku_i = k * _kdot(S2u, q, ((0,), (0,)), rule_mxu) * half
    return (gq_i, gk_i, gv_i, cqu_i, cku_i, cv_i, gc_c,
            M.sum(), (mask_row * Sm).sum(), cam1.sum())


def _wsl(w, sl):
    """Static column slice of a weight that may be a (hi, lo) pair."""
    if isinstance(w, tuple):
        return w[0][:, sl], w[1][:, sl]
    return w[:, sl]


def _linear_rule_cols(x, ax, w_sl, aw_sl, R_sl, y_pre_sl, axw_sl, rule_mxu):
    """One head-column-block's contribution to :func:`_linear_rule_math`:
    the rule's denominator is elementwise in the output columns and its two
    transpose-dots sum over them, so the full-matrix rule is the sum of
    per-block calls (``x``/``ax`` are the full (S, D_in) input and |input|)."""
    half = jnp.asarray(0.5, x.dtype)
    Smat = _ksafe_divide(R_sl, half * (y_pre_sl + axw_sl))
    return half * (x * _kdot(Smat, w_sl, ((1,), (1,)), rule_mxu)
                   + ax * _kdot(Smat, aw_sl, ((1,), (1,)), rule_mxu))


def _head_rev_accum(x_in, ax, qb, kb, vb, q_nb, k_nb, v_nb,
                    axw_q, axw_k, axw_v, ctx_b, g_ctx_b, R1f_b,
                    wq, wk, wv, awq, awk, awv, mask_row, inv_s, head_dim, *,
                    mxu, attn_mxu, rule_mxu, dots_b=None, probs_b=None):
    """Static-unrolled reverse over the heads present in one column block,
    folding each head's six (S, d) outputs into (S, D_in) accumulators via
    sliced-weight dots. All block args (qb..R1f_b, weights) are column
    slices covering the same heads; ``x_in``/``ax`` are full width. Returns
    (g_att, Racc_qk, Racc_v, gc, a_sum, b_sum, r_sum) — the mask-Add λ is
    applied by the caller (the rules are linear in R).

    ``dots_b``/``probs_b``: optional row-stacked ((hb*S, S)) forward
    anchors covering the same heads — each head's QK^T/softmax recompute
    is skipped (see :func:`_attn_head_rev`)."""
    dt = x_in.dtype
    S, D_in = x_in.shape
    d = head_dim
    hb = qb.shape[1] // d
    zero = jnp.zeros((), dt)
    g_att = jnp.zeros((S, D_in), dt)
    Racc_qk = jnp.zeros((S, D_in), dt)
    Racc_v = jnp.zeros((S, D_in), dt)
    gc = jnp.zeros((S, S), dt)
    a_sum = b_sum = r_sum = zero
    for j in range(hb):
        sl = slice(j * d, (j + 1) * d)
        saved_rp = (None if dots_b is None else
                    (dots_b[j * S:(j + 1) * S, :],
                     probs_b[j * S:(j + 1) * S, :]))
        (gq_i, gk_i, gv_i, cqu_i, cku_i, cv_i, gc_c, a_c, b_c, r_c) = \
            _attn_head_rev(qb[:, sl], kb[:, sl], vb[:, sl], ctx_b[:, sl],
                           g_ctx_b[:, sl], R1f_b[:, sl], mask_row, inv_s,
                           attn_mxu, rule_mxu, saved_rp=saved_rp)
        g_att = (g_att + _kdot(gq_i, _wsl(wq, sl), ((1,), (1,)), mxu)
                 + _kdot(gk_i, _wsl(wk, sl), ((1,), (1,)), mxu)
                 + _kdot(gv_i, _wsl(wv, sl), ((1,), (1,)), mxu))
        Racc_qk = (Racc_qk
                   + _linear_rule_cols(x_in, ax, _wsl(wq, sl),
                                       _wsl(awq, sl), cqu_i, q_nb[:, sl],
                                       axw_q[:, sl], rule_mxu)
                   + _linear_rule_cols(x_in, ax, _wsl(wk, sl),
                                       _wsl(awk, sl), cku_i, k_nb[:, sl],
                                       axw_k[:, sl], rule_mxu))
        Racc_v = Racc_v + _linear_rule_cols(
            x_in, ax, _wsl(wv, sl), _wsl(awv, sl), cv_i, v_nb[:, sl],
            axw_v[:, sl], rule_mxu)
        gc = gc + gc_c
        a_sum, b_sum, r_sum = a_sum + a_c, b_sum + b_c, r_sum + r_c
    return g_att, Racc_qk, Racc_v, gc, a_sum, b_sum, r_sum


def _attn_rev_combine(x_in, g_sum1, g_att, Racc_qk, Racc_v, R2, gc,
                      a_sum, b_sum, r_sum, num_heads):
    """Post-head-loop combine: the mask-Add λ renormalization, the q/k/v
    Linear rules' deferred λ scale, the two nested clones (reference
    BERT.py:319, :227) and the backward merge. Plain jnp — runs both inside
    the single fused kernel and in XLA after the chunked kernels."""
    dt = x_in.dtype
    gc = gc / jnp.asarray(num_heads, dt)
    tot = jnp.abs(a_sum) + jnp.abs(b_sum)
    a_fact = _ksafe_divide(jnp.abs(a_sum), tot) * r_sum
    lam = _ksafe_divide(a_fact, a_sum)
    R_lin = lam * Racc_qk + Racc_v
    R_h1 = x_in * _ksafe_divide(R_lin, x_in)
    R_in = x_in * _ksafe_divide(R_h1 + R2, x_in)
    return g_sum1 + g_att, R_in, gc


def _bert_attn_mid_math(x_in, g_attln, R_att, mask_row, lns,
                        bq, bk, bv, bo, wq, wk, wv, wao, *,
                        num_heads, head_dim, eps, mxu, attn_mxu, rule_mxu,
                        saved=None):
    """Stage 1 of the chunked attention reverse: forward-recompute the
    attention output (static head loop, forward only — ~3 (S, S) temps per
    head, so it fits scoped VMEM at any BERT length), then the dense
    backward, LN backward, residual-Add rule and the dense Linear rule.
    Returns (ctx, g_sum1, g_ctx, R1f, R2) — everything the per-head-chunk
    stage needs besides x_in.

    ``saved``: optional (ctx, dense_nb) rich forward anchors — the whole
    qkv + per-head forward recompute and the dense dot are skipped (the
    per-head-chunk stage re-derives its own q/k/v slices, or consumes its
    own saved anchors)."""
    dt = x_in.dtype
    h, d = num_heads, head_dim
    inv_s = jnp.asarray(head_dim ** -0.5, dt)
    if saved is not None:
        ctx, dense_nb = saved
    else:
        qb = _kdot(x_in, wq, ((1,), (0,)), mxu) + bq
        kb = _kdot(x_in, wk, ((1,), (0,)), mxu) + bk
        vb = _kdot(x_in, wv, ((1,), (0,)), mxu) + bv
        ctx = jnp.concatenate([
            _attn_head_fwd(qb[:, i * d:(i + 1) * d],
                           kb[:, i * d:(i + 1) * d],
                           vb[:, i * d:(i + 1) * d], mask_row, inv_s,
                           attn_mxu)
            for i in range(h)], axis=1)
        dense_nb = _kdot(ctx, wao, ((1,), (0,)), mxu)
    dense_out = dense_nb + bo
    g_sum1 = _ln_bwd_math(g_attln, dense_out + x_in, lns, eps)
    g_ctx = _kdot(g_sum1, wao, ((1,), (1,)), mxu)
    R1, R2 = _add_rule_math(dense_out, x_in, R_att)
    R1f = _linear_rule_math(ctx, wao, R1, dense_nb, rule_mxu)
    return ctx, g_sum1, g_ctx, R1f, R2


def _bert_attn_chunk_math(x_in, ctx_b, g_ctx_b, R1f_b, mask_row,
                          bq_b, bk_b, bv_b, wq_b, wk_b, wv_b, *,
                          head_dim, mxu, attn_mxu, rule_mxu, saved=None):
    """Stage 2 of the chunked attention reverse: one chunk of heads'
    backward + z-rules. Block args are this chunk's column slices; the
    chunk's q/k/v projections and |x|@|w| denominators are recomputed
    in-chunk from full-width ``x_in`` and the sliced weights (columns of a
    matmul are independent, so this is the same math at chunk cost).

    ``saved``: optional rich forward anchors for this chunk's heads —
    slim 3-tuple (q_nb_b, k_nb_b, v_nb_b) skips the three projection
    recomputes; fat 5-tuple (..., dots_b, probs_b) skips (per head) the
    QK^T/softmax too. The |x|@|w| rule denominators are NOT saved (the
    forward never computes them) and are still recomputed here."""
    dt = x_in.dtype
    inv_s = jnp.asarray(head_dim ** -0.5, dt)
    dots_b = probs_b = None
    if saved is not None:
        if len(saved) == 5:
            q_nb, k_nb, v_nb, dots_b, probs_b = saved
        else:
            q_nb, k_nb, v_nb = saved
    else:
        q_nb = _kdot(x_in, wq_b, ((1,), (0,)), mxu)
        k_nb = _kdot(x_in, wk_b, ((1,), (0,)), mxu)
        v_nb = _kdot(x_in, wv_b, ((1,), (0,)), mxu)
    qb, kb, vb = q_nb + bq_b, k_nb + bk_b, v_nb + bv_b
    ax = jnp.abs(x_in)
    awq, awk, awv = _kabs(wq_b), _kabs(wk_b), _kabs(wv_b)
    axw_q = _kdot(ax, awq, ((1,), (0,)), rule_mxu)
    axw_k = _kdot(ax, awk, ((1,), (0,)), rule_mxu)
    axw_v = _kdot(ax, awv, ((1,), (0,)), rule_mxu)
    return _head_rev_accum(
        x_in, ax, qb, kb, vb, q_nb, k_nb, v_nb, axw_q, axw_k, axw_v,
        ctx_b, g_ctx_b, R1f_b, wq_b, wk_b, wv_b, awq, awk, awv,
        mask_row, inv_s, head_dim, mxu=mxu, attn_mxu=attn_mxu,
        rule_mxu=rule_mxu, dots_b=dots_b, probs_b=probs_b)


def _bert_attn_rev_math(x_in, g_attln, R_att, mask_row,
                        lns, lnb, bq, bk, bv, bo,
                        wq, wk, wv, wao, *,
                        num_heads, head_dim, eps, mxu, attn_mxu, rule_mxu,
                        unroll=False, saved=None):
    """Attention sub-block reverse; returns (g_in, R_in, gc (S, S)).

    ``unroll=True`` (the Mosaic kernel path) runs the head loop as a static
    Python loop over 2-D column slices, folding each head's six (S, d)
    outputs into (S, D) accumulators immediately via sliced-weight dots —
    no (h, S, d) stacks, no scratch, no dynamic indexing. This shape is
    forced by the TC lowering: ``dynamic_slice`` on values is unimplemented,
    and dynamic scratch-ref indexing (leading-dim or lane ``pl.ds``)
    crashes the remote Mosaic compile helper (probed 2026-08-17). The
    mask-Add renormalization λ and the three linear rules are linear in the
    incoming relevance, so λ is deferred to a post-loop scalar.

    ``unroll=False`` (the XLA path) uses a ``fori_loop`` over a leading
    head axis with value carries.

    ``saved``: optional rich forward anchors — the slim 3-tuple
    (qkv_pre (S, 3D), ctx (S, D), dense_nb (S, D)) skips the q/k/v
    projection, AV and dense recomputes; the fat 5-tuple inserts
    (dots (h*S, S), probs (h*S, S)) after qkv_pre and skips the per-head
    QK^T/softmax too (measured a wash — their HBM costs what the skipped
    passes cost; PERF.md round 3c)."""
    del lnb
    dt = x_in.dtype
    S = x_in.shape[0]
    h, d = num_heads, head_dim
    D = h * d
    inv_s = jnp.asarray(head_dim ** -0.5, dt)

    dots_s = probs_s = None
    if saved is not None:
        if len(saved) == 5:
            qkv_pre, dots_s, probs_s, ctx, dense_nb = saved
        else:
            qkv_pre, ctx, dense_nb = saved
        q_nb = qkv_pre[:, :D]
        k_nb = qkv_pre[:, D:2 * D]
        v_nb = qkv_pre[:, 2 * D:]
    else:
        q_nb = _kdot(x_in, wq, ((1,), (0,)), mxu)
        k_nb = _kdot(x_in, wk, ((1,), (0,)), mxu)
        v_nb = _kdot(x_in, wv, ((1,), (0,)), mxu)
    qb, kb, vb = q_nb + bq, k_nb + bk, v_nb + bv

    def to_heads(x):                         # (S, D) -> (h, S, d)
        return x.reshape(S, h, d).transpose(1, 0, 2)

    def from_heads(x):                       # (h, S, d) -> (S, D)
        return x.transpose(1, 0, 2).reshape(S, h * d)

    if saved is not None:
        if not unroll:
            qh, kh, vh = to_heads(qb), to_heads(kb), to_heads(vb)
            ctx_h = to_heads(ctx)
    elif unroll:
        ctx_parts = [
            _attn_head_fwd(qb[:, i * d:(i + 1) * d], kb[:, i * d:(i + 1) * d],
                           vb[:, i * d:(i + 1) * d], mask_row, inv_s,
                           attn_mxu)
            for i in range(h)]
        ctx = jnp.concatenate(ctx_parts, axis=1)
    else:
        qh, kh, vh = to_heads(qb), to_heads(kb), to_heads(vb)

        def fwd_body(i, ctx_h):
            out = _attn_head_fwd(qh[i], kh[i], vh[i], mask_row, inv_s,
                                 attn_mxu)
            return ctx_h.at[i].set(out)

        ctx_h = jax.lax.fori_loop(0, h, fwd_body, jnp.zeros((h, S, d), dt))
        ctx = from_heads(ctx_h)

    if saved is None:
        dense_nb = _kdot(ctx, wao, ((1,), (0,)), mxu)
    dense_out = dense_nb + bo
    g_sum1 = _ln_bwd_math(g_attln, dense_out + x_in, lns, eps)
    g_ctx = _kdot(g_sum1, wao, ((1,), (1,)), mxu)

    R1, R2 = _add_rule_math(dense_out, x_in, R_att)
    R1f = _linear_rule_math(ctx, wao, R1, dense_nb, rule_mxu)

    # pass 2: backward + rules per head; the mask-add renormalization is a
    # scalar λ applied after the loop (rules are linear in R)
    zero = jnp.zeros((), dt)
    if unroll:
        ax = jnp.abs(x_in)
        awq, awk, awv = _kabs(wq), _kabs(wk), _kabs(wv)
        axw_q = _kdot(ax, awq, ((1,), (0,)), rule_mxu)
        axw_k = _kdot(ax, awk, ((1,), (0,)), rule_mxu)
        axw_v = _kdot(ax, awv, ((1,), (0,)), rule_mxu)
        (g_att, Racc_qk, Racc_v, gc, a_sum, b_sum, r_sum) = _head_rev_accum(
            x_in, ax, qb, kb, vb, q_nb, k_nb, v_nb, axw_q, axw_k, axw_v,
            ctx, g_ctx, R1f, wq, wk, wv, awq, awk, awv, mask_row, inv_s, d,
            mxu=mxu, attn_mxu=attn_mxu, rule_mxu=rule_mxu,
            dots_b=dots_s, probs_b=probs_s)
    else:
        g_ctx_h, R1_h = to_heads(g_ctx), to_heads(R1f)
        zeros_hsd = jnp.zeros((h, S, d), dt)
        if dots_s is not None:
            dots_h = dots_s.reshape(h, S, S)
            probs_h = probs_s.reshape(h, S, S)

        def rev_body(i, carry):
            (gq, gk, gv, cqu, cku, cv, gc, a_sum, b_sum, r_sum) = carry
            saved_rp = (None if dots_s is None
                        else (dots_h[i], probs_h[i]))
            (gq_i, gk_i, gv_i, cqu_i, cku_i, cv_i, gc_c, a_c, b_c, r_c) = \
                _attn_head_rev(qh[i], kh[i], vh[i], ctx_h[i], g_ctx_h[i],
                               R1_h[i], mask_row, inv_s, attn_mxu, rule_mxu,
                               saved_rp=saved_rp)
            return (gq.at[i].set(gq_i), gk.at[i].set(gk_i),
                    gv.at[i].set(gv_i), cqu.at[i].set(cqu_i),
                    cku.at[i].set(cku_i), cv.at[i].set(cv_i),
                    gc + gc_c, a_sum + a_c, b_sum + b_c, r_sum + r_c)

        (gq, gk, gv, cqu, cku, cv, gc, a_sum, b_sum,
         r_sum) = jax.lax.fori_loop(
            0, h, rev_body,
            (zeros_hsd, zeros_hsd, zeros_hsd, zeros_hsd, zeros_hsd,
             zeros_hsd, jnp.zeros((S, S), dt), zero, zero, zero))

    if unroll:
        return _attn_rev_combine(x_in, g_sum1, g_att, Racc_qk, Racc_v, R2,
                                 gc, a_sum, b_sum, r_sum, num_heads)
    gc = gc / jnp.asarray(num_heads, dt)
    tot = jnp.abs(a_sum) + jnp.abs(b_sum)
    a_fact = _ksafe_divide(jnp.abs(a_sum), tot) * r_sum
    lam = _ksafe_divide(a_fact, a_sum)
    cam_q = lam * from_heads(cqu)
    cam_k = lam * from_heads(cku)
    cam_v = from_heads(cv)
    Rq = _linear_rule_math(x_in, wq, cam_q, q_nb, rule_mxu)
    Rk = _linear_rule_math(x_in, wk, cam_k, k_nb, rule_mxu)
    Rv = _linear_rule_math(x_in, wv, cam_v, v_nb, rule_mxu)
    R_lin = Rq + Rk + Rv
    g_in = (g_sum1
            + _kdot(from_heads(gq), wq, ((1,), (1,)), mxu)
            + _kdot(from_heads(gk), wk, ((1,), (1,)), mxu)
            + _kdot(from_heads(gv), wv, ((1,), (1,)), mxu))
    # two nested clones, exactly as the reference (BERT.py:319, :227)
    R_h1 = x_in * _ksafe_divide(R_lin, x_in)
    R_in = x_in * _ksafe_divide(R_h1 + R2, x_in)
    return g_in, R_in, gc


def _bert_fwd_math(x_in, mask_row, ln1s, ln1b, ln2s, ln2b,
                   bq, bk, bv, bo, b_i, b_o2, wq, wk, wv, wao, wi, wo, *,
                   num_heads, head_dim, eps, mxu, attn_mxu, mlp_mxu=None,
                   unroll=False, save_attn=False, save_probs=False,
                   save_mlp=False):
    """One BERT encoder layer forward; returns (out, att_ln).

    ``unroll=True`` (the Mosaic kernel path): static Python head loop over
    2-D column slices — see :func:`_bert_attn_rev_math` for why dynamic
    indexing is off the table in the TC lowering.

    ``save_attn=True``: additionally return the rich anchors
    (qkv_pre (S, 3D), ctx (S, D), dense_nb (S, D)) for the reverse cores'
    ``saved`` arguments — the BERT analog of the ViT rich-anchor path
    (PERF.md round 3c). ``save_probs=True`` (requires ``save_attn``)
    inserts the fat per-head anchors (dots (h*S, S), probs (h*S, S)) after
    qkv_pre so the reverse also skips the QK^T/softmax recomputes —
    measured a wash at S=512 (their HBM traffic costs what the skipped
    passes cost), so default off. ``save_mlp=True`` appends
    (inter_pre_nb (S, I), dense2_nb (S, D))."""
    S = x_in.shape[0]
    h, d = num_heads, head_dim
    q_nb = _kdot(x_in, wq, ((1,), (0,)), mxu)
    k_nb = _kdot(x_in, wk, ((1,), (0,)), mxu)
    v_nb = _kdot(x_in, wv, ((1,), (0,)), mxu)
    qb, kb, vb = q_nb + bq, k_nb + bk, v_nb + bv
    inv_s = jnp.asarray(head_dim ** -0.5, x_in.dtype)

    dots_l, probs_l = [], []
    if unroll:
        ctx_parts = []
        for i in range(h):
            o = _attn_head_fwd(qb[:, i * d:(i + 1) * d],
                               kb[:, i * d:(i + 1) * d],
                               vb[:, i * d:(i + 1) * d], mask_row, inv_s,
                               attn_mxu, save=save_probs)
            if save_probs:
                o, raw_i, probs_i = o
                dots_l.append(raw_i)
                probs_l.append(probs_i)
            ctx_parts.append(o)
        ctx = jnp.concatenate(ctx_parts, axis=1)
    else:
        qh = qb.reshape(S, h, d).transpose(1, 0, 2)
        kh = kb.reshape(S, h, d).transpose(1, 0, 2)
        vh = vb.reshape(S, h, d).transpose(1, 0, 2)
        dt = x_in.dtype

        if save_probs:
            def fwd_body(i, carry):
                ctx_h, dots_h, probs_h = carry
                out, raw_i, probs_i = _attn_head_fwd(
                    qh[i], kh[i], vh[i], mask_row, inv_s, attn_mxu,
                    save=True)
                return (ctx_h.at[i].set(out), dots_h.at[i].set(raw_i),
                        probs_h.at[i].set(probs_i))

            ctx_h, dots_h, probs_h = jax.lax.fori_loop(
                0, h, fwd_body, (jnp.zeros((h, S, d), dt),
                                 jnp.zeros((h, S, S), dt),
                                 jnp.zeros((h, S, S), dt)))
            dots_l = [dots_h.reshape(h * S, S)]
            probs_l = [probs_h.reshape(h * S, S)]
        else:
            def fwd_body(i, ctx_h):
                out = _attn_head_fwd(qh[i], kh[i], vh[i], mask_row, inv_s,
                                     attn_mxu)
                return ctx_h.at[i].set(out)

            ctx_h = jax.lax.fori_loop(0, h, fwd_body,
                                      jnp.zeros((h, S, d), dt))
        ctx = ctx_h.transpose(1, 0, 2).reshape(S, h * d)
    mmx = mlp_mxu or mxu
    dense_nb = _kdot(ctx, wao, ((1,), (0,)), mxu)
    dense_out = dense_nb + bo
    att_ln, _, _ = _ln_fwd(dense_out + x_in, ln1s, ln1b, eps)
    inter_pre_nb = _kdot(att_ln, wi, ((1,), (0,)), mmx)
    inter_g = _gelu_exact(inter_pre_nb + b_i)
    dense2_nb = _kdot(inter_g, wo, ((1,), (0,)), mmx)
    dense2 = dense2_nb + b_o2
    out, _, _ = _ln_fwd(dense2 + att_ln, ln2s, ln2b, eps)
    if save_attn:
        qkv_pre = jnp.concatenate([q_nb, k_nb, v_nb], axis=1)
        outs = (out, att_ln, qkv_pre)
        if save_probs:
            outs = outs + (jnp.concatenate(dots_l, axis=0),
                           jnp.concatenate(probs_l, axis=0))
        outs = outs + (ctx, dense_nb)
        return outs + (inter_pre_nb, dense2_nb) if save_mlp else outs
    assert not save_mlp and not save_probs, \
        "save_mlp/save_probs require save_attn"
    return out, att_ln


def prepare_bert_weights(layers: dict, mxu: str):
    """Pre-cast / pre-split the stacked (L, ...) BERT layer weights once,
    outside the scans (see :func:`prepare_block_weights` for why). Order:
    q, k, v, attn_out, inter, out."""
    ws = [layers["q"]["kernel"], layers["k"]["kernel"],
          layers["v"]["kernel"], layers["attn_out"]["kernel"],
          layers["inter"]["kernel"], layers["out"]["kernel"]]
    flat, _ = _flatten_weights(ws, mxu)
    return tuple(flat)


def _bert_out_rev_kernel(*refs, eps, mxu, rule_mxu, mlp_mxu, paired,
                         n_saved=0):
    att_ln_ref, g_out_ref, R_ref, lns_ref, lnb_ref, bi_ref, bo_ref = refs[:7]
    g_ref, Ra_ref = refs[-2:]
    w = refs[7:-2]
    saved_mlp = None
    if n_saved:
        saved_mlp = tuple(r[:] for r in w[-n_saved:])
        w = w[:-n_saved]
    if paired:
        wi, wo = (w[0][:], w[1][:]), (w[2][:], w[3][:])
    else:
        wi, wo = w[0][:], w[1][:]
    g_attln, R_att = _bert_out_rev_math(
        att_ln_ref[:], g_out_ref[:], R_ref[:], lns_ref[:], lnb_ref[:],
        bi_ref[:], bo_ref[:], wi, wo, eps=eps, mxu=mxu, rule_mxu=rule_mxu,
        mlp_mxu=mlp_mxu, saved_mlp=saved_mlp)
    g_ref[:] = g_attln
    Ra_ref[:] = R_att


def bert_out_rev_core(att_ln, g_out, R, lp, eps: float,
                      mxu: str = "bfloat16", rule_mxu: str = "bfloat16",
                      mlp_mxu: Optional[str] = None,
                      use_pallas: Optional[bool] = None,
                      interpret: bool = False, ws: Optional[tuple] = None,
                      saved: Optional[tuple] = None):
    """Fused output sub-block reverse; ``lp`` is the layer params dict.
    ``ws``: this layer's (inter, out) slice of :func:`prepare_bert_weights`
    entries 4:...

    ``saved``: optional (inter_pre_nb, dense2_nb) rich forward anchors from
    ``bert_layer_fwd_core(save_mlp=True)`` — skips the two dense
    forward-recompute dots (see :func:`_bert_out_rev_math`)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    S, D = att_ln.shape
    dt = jnp.float64 if att_ln.dtype == jnp.float64 else jnp.float32
    if ws is not None:
        w_flat, paired = list(ws), mxu == "tensorfloat32"
    else:
        w_flat, paired = _flatten_weights(
            [lp["inter"]["kernel"], lp["out"]["kernel"]], mxu)
    args = (att_ln.astype(dt), g_out.astype(dt), R.astype(dt),
            lp["out_ln"]["scale"][None].astype(dt),
            lp["out_ln"]["bias"][None].astype(dt),
            lp["inter"]["bias"][None].astype(dt),
            lp["out"]["bias"][None].astype(dt))
    if saved is not None:
        saved = tuple(s.astype(dt) for s in saved)
    if not use_pallas and not interpret:
        if paired:
            wi, wo = (w_flat[0], w_flat[1]), (w_flat[2], w_flat[3])
        else:
            wi, wo = w_flat
        return _bert_out_rev_math(*args, wi, wo, eps=eps, mxu=mxu,
                                  rule_mxu=rule_mxu, mlp_mxu=mlp_mxu,
                                  saved_mlp=saved)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    extra = list(saved) if saved is not None else []
    return pl.pallas_call(
        functools.partial(_bert_out_rev_kernel, eps=eps, mxu=mxu,
                          rule_mxu=rule_mxu, mlp_mxu=mlp_mxu, paired=paired,
                          n_saved=len(extra)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (
            7 + len(w_flat) + len(extra)),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((S, D), dt)] * 2,
        compiler_params=_vmem_params(interpret),
        interpret=interpret,
    )(*args, *w_flat, *extra)


def _bert_attn_rev_kernel(*refs, num_heads, head_dim, eps, mxu, attn_mxu,
                          rule_mxu, paired, n_saved=0):
    (x_in_ref, g_ref, R_ref, mask_ref, lns_ref, lnb_ref,
     bq_ref, bk_ref, bv_ref, bo_ref) = refs[:10]
    nw = 8 if paired else 4
    w = refs[10:10 + nw]
    saved = None
    if n_saved:
        saved = tuple(r[:] for r in refs[10 + nw:10 + nw + n_saved])
    g_in_ref, R_in_ref, gc_ref = refs[10 + nw + n_saved:13 + nw + n_saved]
    if paired:
        wq, wk, wv, wao = ((w[i][:], w[i + 1][:]) for i in range(0, 8, 2))
    else:
        wq, wk, wv, wao = (w[i][:] for i in range(4))
    g_in, R_in, gc = _bert_attn_rev_math(
        x_in_ref[:], g_ref[:], R_ref[:], mask_ref[:],
        lns_ref[:], lnb_ref[:], bq_ref[:], bk_ref[:], bv_ref[:], bo_ref[:],
        wq, wk, wv, wao, num_heads=num_heads, head_dim=head_dim, eps=eps,
        mxu=mxu, attn_mxu=attn_mxu, rule_mxu=rule_mxu, unroll=True,
        saved=saved)
    g_in_ref[:] = g_in
    R_in_ref[:] = R_in
    gc_ref[:] = gc


def _bert_attn_mid_kernel(*refs, num_heads, head_dim, eps, mxu, attn_mxu,
                          rule_mxu, paired, n_saved=0):
    (x_in_ref, g_ref, R_ref, mask_ref, lns_ref,
     bq_ref, bk_ref, bv_ref, bo_ref) = refs[:9]
    # with saved (ctx, dense_nb) anchors the q/k/v weights are not passed
    # at all (only attn_out's) — the forward recompute they fed is skipped
    nw = (8 if paired else 4) if not n_saved else (2 if paired else 1)
    w = refs[9:9 + nw]
    saved = None
    if n_saved:
        saved = tuple(r[:] for r in refs[9 + nw:9 + nw + n_saved])
    out_refs = refs[9 + nw + n_saved:14 + nw + n_saved]
    if n_saved:
        wq = wk = wv = None
        wao = (w[0][:], w[1][:]) if paired else w[0][:]
    elif paired:
        wq, wk, wv, wao = ((w[i][:], w[i + 1][:]) for i in range(0, 8, 2))
    else:
        wq, wk, wv, wao = (w[i][:] for i in range(4))
    outs = _bert_attn_mid_math(
        x_in_ref[:], g_ref[:], R_ref[:], mask_ref[:], lns_ref[:],
        bq_ref[:], bk_ref[:], bv_ref[:], bo_ref[:], wq, wk, wv, wao,
        num_heads=num_heads, head_dim=head_dim, eps=eps, mxu=mxu,
        attn_mxu=attn_mxu, rule_mxu=rule_mxu, saved=saved)
    for r, o in zip(out_refs, outs):
        r[:] = o


def _bert_attn_chunk_kernel(*refs, head_dim, mxu, attn_mxu, rule_mxu,
                            paired, n_saved=0):
    (x_in_ref, ctx_ref, gctx_ref, r1f_ref, mask_ref,
     bq_ref, bk_ref, bv_ref) = refs[:8]
    nw = 6 if paired else 3
    w = refs[8:8 + nw]
    saved = None
    if n_saved:
        saved = tuple(r[:] for r in refs[8 + nw:8 + nw + n_saved])
    ga_ref, rqk_ref, rv_ref, gc_ref, sums_ref = \
        refs[8 + nw + n_saved:13 + nw + n_saved]
    if paired:
        wq, wk, wv = ((w[i][:], w[i + 1][:]) for i in range(0, 6, 2))
    else:
        wq, wk, wv = (w[i][:] for i in range(3))
    (g_att, Racc_qk, Racc_v, gc, a_sum, b_sum, r_sum) = \
        _bert_attn_chunk_math(
            x_in_ref[:], ctx_ref[:], gctx_ref[:], r1f_ref[:], mask_ref[:],
            bq_ref[:], bk_ref[:], bv_ref[:], wq, wk, wv,
            head_dim=head_dim, mxu=mxu, attn_mxu=attn_mxu,
            rule_mxu=rule_mxu, saved=saved)
    ga_ref[:] = g_att
    rqk_ref[:] = Racc_qk
    rv_ref[:] = Racc_v
    gc_ref[:] = gc
    sums_ref[:] = jnp.stack([a_sum, b_sum, r_sum]).reshape(1, 3)


# Heads per chunk kernel on the chunked path. 4 heads × ~10 (S, S)
# register-spilled temps stay well inside the 128 MiB chip VMEM at S=512
# even with multi-pass (tf32/f32) dots; the single fused kernel's 12
# unrolled heads do not (measured 138-143 MiB).
_ATTN_CHUNK_HEADS = 4
# Above this sequence length the fused single-kernel reverse is replaced by
# the chunked mid + per-head-chunk kernels.
_ATTN_CHUNK_MIN_SEQ = 385


def _wslice_flat(w_flat, paired, idx, cols):
    """Column-slice entry ``idx`` (q=0, k=1, v=2, ...) of a flattened
    (possibly (hi, lo)-paired) weight list."""
    if paired:
        return [w_flat[2 * idx][:, cols], w_flat[2 * idx + 1][:, cols]]
    return [w_flat[idx][:, cols]]


def bert_attn_rev_core(x_in, g_attln, R_att, ext_mask, lp,
                       num_heads: int, head_dim: int, eps: float,
                       mxu: str = "bfloat16", attn_mxu: str = "bfloat16",
                       rule_mxu: str = "bfloat16",
                       use_pallas: Optional[bool] = None,
                       interpret: bool = False, ws: Optional[tuple] = None,
                       head_chunk: Optional[int] = None,
                       saved: Optional[tuple] = None):
    """Fused attention sub-block reverse; returns (g_in, R_in, gc).
    ``ext_mask``: (S,) additive mask. ``ws``: this layer's (q, k, v,
    attn_out) slice of :func:`prepare_bert_weights`.

    ``head_chunk``: heads per chunk kernel. ``None`` = auto: one fused
    kernel up to S=384, the chunked mid + per-chunk path beyond (the fused
    kernel's 12 unrolled heads spill past the 128 MiB chip VMEM at S=512);
    0 forces the single kernel.

    ``saved``: optional rich forward anchors from
    ``bert_layer_fwd_core(save_attn=True)`` — the slim 3-tuple
    (qkv_pre, ctx, dense_nb) skips the q/k/v projection, AV and dense
    forward recomputes; the fat 5-tuple (qkv_pre, dots, probs, ctx,
    dense_nb; ``save_probs=True``) skips the per-head QK^T/softmax too.
    On the chunked path the mid kernel consumes (ctx, dense_nb) and each
    chunk kernel its heads' slices."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    S, D = x_in.shape
    dt = jnp.float64 if x_in.dtype == jnp.float64 else jnp.float32
    if ws is not None:
        w_flat, paired = list(ws), mxu == "tensorfloat32"
    else:
        w_flat, paired = _flatten_weights(
            [lp["q"]["kernel"], lp["k"]["kernel"], lp["v"]["kernel"],
             lp["attn_out"]["kernel"]], mxu)
    x_in = x_in.astype(dt)
    mask2d = ext_mask[None].astype(dt)
    bq = lp["q"]["bias"][None].astype(dt)
    bk = lp["k"]["bias"][None].astype(dt)
    bv = lp["v"]["bias"][None].astype(dt)
    args = (x_in, g_attln.astype(dt), R_att.astype(dt), mask2d,
            lp["attn_ln"]["scale"][None].astype(dt),
            lp["attn_ln"]["bias"][None].astype(dt),
            bq, bk, bv,
            lp["attn_out"]["bias"][None].astype(dt))
    kw = dict(num_heads=num_heads, head_dim=head_dim, eps=eps, mxu=mxu,
              attn_mxu=attn_mxu, rule_mxu=rule_mxu)
    if saved is not None:
        saved = tuple(s.astype(dt) for s in saved)
    if not use_pallas and not interpret:
        wp = _pair_weights(w_flat, paired)
        return _bert_attn_rev_math(*args, *wp, **kw, saved=saved)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    if head_chunk is None and S >= _ATTN_CHUNK_MIN_SEQ:
        # all-bf16 dots are 1-pass and the single fused kernel still fits
        # the 127 MiB cap at S=512 — and beats the chunked path there
        # (288 vs 242 expl/s); any multi-pass mode must chunk
        all_bf16 = (mxu == "bfloat16" and attn_mxu == "bfloat16"
                    and rule_mxu == "bfloat16")
        if not all_bf16:
            head_chunk = _ATTN_CHUNK_HEADS
    if not head_chunk:
        extra = list(saved) if saved is not None else []
        return pl.pallas_call(
            functools.partial(_bert_attn_rev_kernel, paired=paired, **kw,
                              n_saved=len(extra)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (
                10 + len(w_flat) + len(extra)),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_shape=[jax.ShapeDtypeStruct((S, D), dt),
                       jax.ShapeDtypeStruct((S, D), dt),
                       jax.ShapeDtypeStruct((S, S), dt)],
            compiler_params=_vmem_params(interpret, mib=127),
            interpret=interpret,
        )(*args, *w_flat, *extra)

    # chunked path: mid kernel -> ceil(h / head_chunk) chunk kernels whose
    # partial accumulators are summed in XLA -> combine in XLA
    mid_args = (args[0], args[1], args[2], args[3], args[4],  # x,g,R,mask,lns
                bq, bk, bv, args[9])
    if saved is not None:
        dots_s = probs_s = None
        if len(saved) == 5:
            qkv_pre, dots_s, probs_s, ctx_s, dense_nb_s = saved
        else:
            qkv_pre, ctx_s, dense_nb_s = saved
        # the mid kernel only needs attn_out's weight when anchored — the
        # q/k/v weights fed the forward recompute it no longer performs
        nao = 2 if paired else 1
        mid_w = w_flat[-nao:]
        mid_extra = [ctx_s, dense_nb_s]
    else:
        mid_w, mid_extra = w_flat, []
    ctx, g_sum1, g_ctx, R1f, R2 = pl.pallas_call(
        functools.partial(_bert_attn_mid_kernel, paired=paired, **kw,
                          n_saved=len(mid_extra)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (
            9 + len(mid_w) + len(mid_extra)),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_shape=[jax.ShapeDtypeStruct((S, D), dt)] * 5,
        compiler_params=_vmem_params(interpret),
        interpret=interpret,
    )(*mid_args, *mid_w, *mid_extra)

    d = head_dim
    g_att = Racc_qk = Racc_v = gc = sums = None
    ckw = dict(head_dim=head_dim, mxu=mxu, attn_mxu=attn_mxu,
               rule_mxu=rule_mxu)
    for h0 in range(0, num_heads, head_chunk):
        h1 = min(h0 + head_chunk, num_heads)
        cols = slice(h0 * d, h1 * d)
        wcols = (_wslice_flat(w_flat, paired, 0, cols)
                 + _wslice_flat(w_flat, paired, 1, cols)
                 + _wslice_flat(w_flat, paired, 2, cols))
        if saved is not None:
            chunk_extra = [qkv_pre[:, cols],
                           qkv_pre[:, D + h0 * d:D + h1 * d],
                           qkv_pre[:, 2 * D + h0 * d:2 * D + h1 * d]]
            if dots_s is not None:
                rows = slice(h0 * S, h1 * S)
                chunk_extra += [dots_s[rows], probs_s[rows]]
        else:
            chunk_extra = []
        outs = pl.pallas_call(
            functools.partial(_bert_attn_chunk_kernel, paired=paired,
                              **ckw, n_saved=len(chunk_extra)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (
                8 + len(wcols) + len(chunk_extra)),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_shape=[jax.ShapeDtypeStruct((S, D), dt)] * 3
            + [jax.ShapeDtypeStruct((S, S), dt),
               jax.ShapeDtypeStruct((1, 3), dt)],
            compiler_params=_vmem_params(interpret, mib=127),
            interpret=interpret,
        )(x_in, ctx[:, cols], g_ctx[:, cols], R1f[:, cols], mask2d,
          bq[:, cols], bk[:, cols], bv[:, cols], *wcols, *chunk_extra)
        if g_att is None:
            g_att, Racc_qk, Racc_v, gc, sums = outs
        else:
            g_att = g_att + outs[0]
            Racc_qk = Racc_qk + outs[1]
            Racc_v = Racc_v + outs[2]
            gc = gc + outs[3]
            sums = sums + outs[4]
    return _attn_rev_combine(x_in, g_sum1, g_att, Racc_qk, Racc_v, R2, gc,
                             sums[0, 0], sums[0, 1], sums[0, 2], num_heads)


def _bert_fwd_kernel(*refs, num_heads, head_dim, eps, mxu, attn_mxu,
                     mlp_mxu, paired, save_attn=False, save_probs=False,
                     save_mlp=False):
    (x_ref, mask_ref, ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
     bq_ref, bk_ref, bv_ref, bo_ref, bi_ref, bo2_ref) = refs[:12]
    nw = 12 if paired else 6
    w = refs[12:12 + nw]
    n_out = (2 + (3 if save_attn else 0) + (2 if save_probs else 0)
             + (2 if save_mlp else 0))
    out_refs = refs[12 + nw:12 + nw + n_out]
    if paired:
        ws = tuple((w[i][:], w[i + 1][:]) for i in range(0, 12, 2))
    else:
        ws = tuple(w[i][:] for i in range(6))
    outs = _bert_fwd_math(
        x_ref[:], mask_ref[:], ln1s_ref[:], ln1b_ref[:], ln2s_ref[:],
        ln2b_ref[:], bq_ref[:], bk_ref[:], bv_ref[:], bo_ref[:],
        bi_ref[:], bo2_ref[:], *ws, num_heads=num_heads, head_dim=head_dim,
        eps=eps, mxu=mxu, attn_mxu=attn_mxu, mlp_mxu=mlp_mxu, unroll=True,
        save_attn=save_attn, save_probs=save_probs, save_mlp=save_mlp)
    for r, o in zip(out_refs, outs):
        r[:] = o


def bert_layer_fwd_core(x_in, ext_mask, lp, num_heads: int, head_dim: int,
                        eps: float, mxu: str = "bfloat16",
                        attn_mxu: str = "bfloat16",
                        mlp_mxu: Optional[str] = None,
                        use_pallas: Optional[bool] = None,
                        interpret: bool = False, ws: Optional[tuple] = None,
                        save_attn: bool = False, save_probs: bool = False,
                        save_mlp: bool = False):
    """ONE kernel for a full BERT encoder layer forward; returns
    (out, att_ln) — the reverse pass's two anchors.

    ``save_attn=True`` additionally returns the slim rich anchors
    (qkv_pre, ctx, dense_nb); ``save_probs=True`` inserts the fat per-head
    (dots, probs) pair; ``save_mlp=True`` appends (inter_pre_nb,
    dense2_nb) — see :func:`_bert_fwd_math` and PERF.md round 3c."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    S, D = x_in.shape
    h = num_heads
    I = lp["inter"]["kernel"].shape[1]
    dt = jnp.float64 if x_in.dtype == jnp.float64 else jnp.float32
    if ws is not None:
        w_flat, paired = list(ws), mxu == "tensorfloat32"
    else:
        w_flat, paired = _flatten_weights(
            [lp["q"]["kernel"], lp["k"]["kernel"], lp["v"]["kernel"],
             lp["attn_out"]["kernel"], lp["inter"]["kernel"],
             lp["out"]["kernel"]], mxu)
    args = (x_in.astype(dt), ext_mask[None].astype(dt),
            lp["attn_ln"]["scale"][None].astype(dt),
            lp["attn_ln"]["bias"][None].astype(dt),
            lp["out_ln"]["scale"][None].astype(dt),
            lp["out_ln"]["bias"][None].astype(dt),
            lp["q"]["bias"][None].astype(dt), lp["k"]["bias"][None].astype(dt),
            lp["v"]["bias"][None].astype(dt),
            lp["attn_out"]["bias"][None].astype(dt),
            lp["inter"]["bias"][None].astype(dt),
            lp["out"]["bias"][None].astype(dt))
    kw = dict(num_heads=num_heads, head_dim=head_dim, eps=eps, mxu=mxu,
              attn_mxu=attn_mxu, mlp_mxu=mlp_mxu)
    if not use_pallas and not interpret:
        wp = _pair_weights(w_flat, paired)
        return _bert_fwd_math(*args, *wp, **kw, save_attn=save_attn,
                              save_probs=save_probs, save_mlp=save_mlp)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    out_shape = [jax.ShapeDtypeStruct((S, D), dt)] * 2
    if save_attn:
        out_shape += [jax.ShapeDtypeStruct((S, 3 * D), dt)]
        if save_probs:
            out_shape += [jax.ShapeDtypeStruct((h * S, S), dt),
                          jax.ShapeDtypeStruct((h * S, S), dt)]
        out_shape += [jax.ShapeDtypeStruct((S, D), dt),
                      jax.ShapeDtypeStruct((S, D), dt)]
    if save_mlp:
        out_shape += [jax.ShapeDtypeStruct((S, I), dt),
                      jax.ShapeDtypeStruct((S, D), dt)]
    # the save_probs path keeps (h, S, S) dots+probs alive as outputs
    # across the whole head loop — at S=512 that alone is ~25 MiB of VMEM
    # on top of the weights; raise the scoped cap accordingly
    mib = 96 if not save_probs else (120 if S >= 384 else 96)
    return pl.pallas_call(
        functools.partial(_bert_fwd_kernel, paired=paired, **kw,
                          save_attn=save_attn, save_probs=save_probs,
                          save_mlp=save_mlp),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (12 + len(w_flat)),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        out_shape=out_shape,
        compiler_params=_vmem_params(interpret, mib=mib),
        interpret=interpret,
    )(*args, *w_flat)
