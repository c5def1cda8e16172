"""LRP relevance-propagation rules as pure functions.

This is the single rule library of the framework (the reference keeps four
near-identical copies: ``modules/layers_ours.py``, ``modules/layers_lrp.py``
and their BERT twins — see reference ``modules/layers_ours.py:5-7``).

Design: the reference implements each rule as a stateful ``nn.Module`` whose
forward hook stashes ``self.X``/``self.Y`` and whose ``relprop`` calls
``torch.autograd.grad`` (reference ``modules/layers_ours.py:16-46``). Here every
rule is a *pure function* ``rule(inputs..., R, ...) -> R_in`` — inputs are the
residuals collected during the forward pass and R is the incoming relevance.
Where the reference needs autograd (``RelPropSimple.relprop``,
``modules/layers_ours.py:48-60``), the ops involved are all (multi)linear, so
the VJPs are written as closed-form einsums that XLA fuses onto the MXU; a
generic :func:`zrule` built on ``jax.vjp`` exists for arbitrary ops
(pooling etc.).

Two rule variants exist in the reference ("ours" vs. vanilla LRP, differing
only in the Add and Linear rules — reference ``modules/layers_lrp.py:98-100,
188-211``); here that is the ``variant`` argument ("ours" | "lrp") so both
compile as separate jit specializations.

All functions are per-example (no batch dim); batch via ``jax.vmap``. This
makes the global-sum semantics of :func:`add_relprop` per-sample, which is
exactly the reference's behaviour at its hard-coded batch size 1 (reference
``baselines/ViT/imagenet_seg_eval.py:34``).

Identity-rule ops (relevance passes through unchanged — what makes this LRP
variant attention-focused): Softmax, LayerNorm, GELU, ReLU, Tanh, Dropout
(reference ``modules/layers_ours.py:67-80``). They need no function here.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-9

Array = jax.Array


def safe_divide(a: Array, b: Array) -> Array:
    """Stabilized ``a / b``; reference ``modules/layers_ours.py:10-13``.

    The reference's ``clamp(b, min=eps) + clamp(b, max=eps)`` equals
    ``b + eps`` for every b (one clamp saturates, the other passes b
    through), nudged to +eps where the sum is exactly zero (b == -eps); the
    result is masked to 0 wherever ``b == 0``. Written with the algebraic
    form + selects: 3 fewer vector passes over the operand (the explain
    program is vector/bandwidth-bound, PERF.md), bitwise-equal denominators.
    """
    den = b + jnp.asarray(EPS, b.dtype)
    den = jnp.where(den == 0, jnp.asarray(EPS, b.dtype), den)
    return jnp.where(b == 0, jnp.zeros((), a.dtype), a / den)


# ---------------------------------------------------------------------------
# Generic z-rule (RelPropSimple) via jax.vjp — for arbitrary ops.
# ---------------------------------------------------------------------------

def zrule(f: Callable, inputs: Sequence[Array], R: Array):
    """Generic z-rule: Z=f(X); S=R/Z; C=vjp(f)(S); R_i = X_i * C_i.

    Reference ``modules/layers_ours.py:48-60`` (``RelPropSimple``). Returns a
    tuple of relevances matching ``inputs`` (single array if one input).
    """
    Z, vjp = jax.vjp(f, *inputs)
    S = safe_divide(R, Z)
    C = vjp(S)
    outs = tuple(x * c for x, c in zip(inputs, C))
    return outs if len(outs) > 1 else outs[0]


# ---------------------------------------------------------------------------
# Add — residual-stream rule.
# ---------------------------------------------------------------------------

def add_relprop(a: Array, b: Array, R: Array, variant: str = "ours",
                Z: Optional[Array] = None) -> Tuple[Array, Array]:
    """Relevance split across a two-way add.

    variant="ours": z-rule then renormalisation so each branch carries a share
    of ``R.sum()`` proportional to |branch total| (reference
    ``modules/layers_ours.py:97-120``) — critical for conservation on the
    residual stream. variant="lrp": plain z-rule (``modules/layers_lrp.py:
    98-100``).

    ``Z`` may be passed when the caller already holds ``a + b`` (the residual
    stream stores every block boundary), skipping one vector pass.
    """
    if Z is None:
        Z = a + b
    S = safe_divide(R, Z)
    Ca = a * S
    Cb = b * S
    if variant == "lrp":
        return Ca, Cb
    a_sum = Ca.sum()
    b_sum = Cb.sum()
    tot = jnp.abs(a_sum) + jnp.abs(b_sum)
    a_fact = safe_divide(jnp.abs(a_sum), tot) * R.sum()
    b_fact = safe_divide(jnp.abs(b_sum), tot) * R.sum()
    Ca = Ca * safe_divide(a_fact, Ca.sum())
    Cb = Cb * safe_divide(b_fact, Cb.sum())
    return Ca, Cb


def add_eye_relprop(x: Array, R: Array) -> Array:
    """z-rule through ``x + I`` (reference ``modules/layers_ours.py:62-65``)."""
    n = x.shape[-1]
    eye = jnp.eye(n, dtype=x.dtype)
    Z = x + eye
    S = safe_divide(R, Z)
    return x * S


# ---------------------------------------------------------------------------
# Clone / Cat / IndexSelect — routing ops.
# ---------------------------------------------------------------------------

def clone_relprop(x: Array, Rs: Sequence[Array]) -> Array:
    """Merge relevances of a fanned-out tensor: X * sum_i safe_divide(R_i, X).

    Reference ``modules/layers_ours.py:151-169`` (the VJP of an N-way fan-out
    is the sum of the branch cotangents). ``safe_divide`` is linear in its
    numerator and every branch divides by the same X, so the branch sum moves
    inside the divide — one divide pass instead of N (1-ulp-equivalent).
    """
    total = Rs[0]
    for r in Rs[1:]:
        total = total + r
    return x * safe_divide(total, x)


def cat_relprop(xs: Sequence[Array], axis: int, R: Array) -> Tuple[Array, ...]:
    """Split relevance of a concatenation back to its parts.

    Reference ``modules/layers_ours.py:171-185``: z-rule; the VJP of concat is
    a split of S.
    """
    Z = jnp.concatenate(xs, axis=axis)
    S = safe_divide(R, Z)
    sizes = [x.shape[axis] for x in xs]
    # static split points (shapes are trace-time constants) — a traced
    # cumsum array would fail under jit
    offsets = []
    total = 0
    for s in sizes[:-1]:
        total += s
        offsets.append(total)
    splits = jnp.split(S, offsets, axis=axis) if len(xs) > 1 else [S]
    return tuple(x * s for x, s in zip(xs, splits))


def index_select_relprop(x: Array, axis: int, indices: Array, R: Array) -> Array:
    """z-rule through an index_select (reference ``modules/layers_ours.py:
    129-147``). Used for CLS-token pooling. The VJP scatters S back."""
    Z = jnp.take(x, indices, axis=axis)
    S = safe_divide(R, Z)
    idx = jnp.atleast_1d(indices)
    S_ = S if S.ndim == x.ndim else jnp.expand_dims(S, axis)
    # the VJP of take is a scatter-add of S along `axis` at `indices`
    C = jnp.zeros_like(x).at[(slice(None),) * axis + (idx,)].add(S_)
    return x * C


# ---------------------------------------------------------------------------
# Bilinear ops — closed-form z-rule (the attention hot path).
# ---------------------------------------------------------------------------

def einsum_qk_relprop(q: Array, k: Array, R: Array) -> Tuple[Array, Array]:
    """z-rule through ``hid,hjd->hij`` (A = Q K^T), reference
    ``baselines/ViT/ViT_LRP.py:86`` + ``modules/layers_ours.py:122-127``."""
    Z = jnp.einsum("hid,hjd->hij", q, k)
    S = safe_divide(R, Z)
    Cq = jnp.einsum("hij,hjd->hid", S, k)
    Ck = jnp.einsum("hij,hid->hjd", S, q)
    return q * Cq, k * Ck


def einsum_av_relprop(attn: Array, v: Array, R: Array) -> Tuple[Array, Array]:
    """z-rule through ``hij,hjd->hid`` (out = A V), reference
    ``baselines/ViT/ViT_LRP.py:88``."""
    Z = jnp.einsum("hij,hjd->hid", attn, v)
    S = safe_divide(R, Z)
    Ca = jnp.einsum("hid,hjd->hij", S, v)
    Cv = jnp.einsum("hij,hid->hjd", attn, S)
    return attn * Ca, v * Cv


def matmul_relprop(a: Array, b: Array, R: Array) -> Tuple[Array, Array]:
    """z-rule through a general batched matmul ``... i k, ... k j -> ... i j``
    (BERT's ``MatMul``, reference ``BERT_explainability/modules/layers_ours.py:
    89-91``)."""
    Z = a @ b
    S = safe_divide(R, Z)
    Ca = S @ jnp.swapaxes(b, -1, -2)
    Cb = jnp.swapaxes(a, -1, -2) @ S
    return a * Ca, b * Cb


def mul_relprop(a: Array, b: Array, R: Array) -> Tuple[Array, Array]:
    """z-rule through elementwise multiply (BERT head-mask ``Mul``, reference
    ``BERT_explainability/modules/layers_ours.py:77-79``)."""
    Z = a * b
    S = safe_divide(R, Z)
    return a * (S * b), b * (S * a)


# ---------------------------------------------------------------------------
# Linear — the α-β rule.
# ---------------------------------------------------------------------------

def linear_alphabeta(x: Array, w: Array, R: Array, alpha: float = 1.0,
                     variant: str = "ours",
                     y_pre: Optional[Array] = None) -> Array:
    """α-β LRP rule for y = x @ w (w is (in, out); bias is ignored by the rule,
    exactly like the reference which calls ``F.linear(x1, w1)`` with no bias).

    variant="ours": ε-stabilized **shared** denominator
    ``S1 = S2 = safe_divide(R, Z1+Z2)`` (reference ``modules/layers_ours.py:
    207-230``). variant="lrp": separate denominators ``S_i = safe_divide(R,
    Z_i)`` (reference ``modules/layers_lrp.py:188-211``) — the only Linear-rule
    difference between the two libraries.

    The reference's per-branch ``autograd.grad(Z1, x1, S1)`` is just
    ``S1 @ w1^T``, written explicitly here.

    MXU optimization (shared-denominator variant): with x = x⁺+x⁻,
    |x| = x⁺−x⁻ (likewise w),

        Z1+Z2 = x⁺@w⁺ + x⁻@w⁻ = (x@w + |x|@|w|) / 2
        C1+C2 = (x ⊙ (S@wᵀ) + |x| ⊙ (S@|w|ᵀ)) / 2

    so the rule needs only the |x|@|w| product plus two transposed products —
    and when the *forward* pre-bias product ``y_pre = x@w`` is passed in (the
    reverse scan has it in its saved activations), the rule costs 3 matmuls
    instead of 4 (2 instead of 4 with ``y_pre``); the inhibitor branch
    (α≠1) reuses the same products: Z1'+Z2' = (x@w − |x|@|w|)/2.
    """
    beta = alpha - 1.0
    if x.ndim == 1:                       # e.g. the pooled-CLS head input
        return linear_alphabeta(
            x[None], w, R[None], alpha, variant,
            None if y_pre is None else y_pre[None])[0]

    if variant != "lrp":
        ax = jnp.abs(x)
        aw = jnp.abs(w)
        xw = x @ w if y_pre is None else y_pre
        axw = ax @ aw
        Z = 0.5 * (xw + axw)
        S = safe_divide(R, Z)
        act = 0.5 * (x * (S @ w.T) + ax * (S @ aw.T))
        if beta == 0.0:
            # beta==0 is the only configuration the reference's callers use
            # (alpha=1 at ``baselines/ViT/ViT_explanation_generator.py:27``).
            return alpha * act
        Zi = 0.5 * (xw - axw)
        Si = safe_divide(R, Zi)
        inh = 0.5 * (x * (Si @ w.T) - ax * (Si @ aw.T))
        return alpha * act - beta * inh

    pw = jnp.maximum(w, 0.0)
    nw = jnp.minimum(w, 0.0)
    px = jnp.maximum(x, 0.0)
    nx = jnp.minimum(x, 0.0)

    def f(w1, w2, x1, x2):
        S1 = safe_divide(R, x1 @ w1)
        S2 = safe_divide(R, x2 @ w2)
        return x1 * (S1 @ w1.T) + x2 * (S2 @ w2.T)

    activator = f(pw, nw, px, nx)
    if beta == 0.0:
        return alpha * activator
    inhibitor = f(nw, pw, px, nx)
    return alpha * activator - beta * inhibitor


def batchnorm2d_relprop(x: Array, weight: Array, running_var: Array,
                        R: Array, eps: float = 1e-5) -> Array:
    """Analytic BatchNorm rule (reference ``modules/layers_ours.py:194-204``,
    unused by the shipped transformer models but part of the rule library):
    ``R_in = x * (w / sqrt(var+eps)) * safe_divide(R, Z)`` with
    ``Z = x * w / sqrt(var+eps)``. x is (C, H, W); weight/var are (C,)."""
    scale = (weight / jnp.sqrt(running_var + eps))[:, None, None]
    Z = x * scale
    S = safe_divide(R, Z)
    return x * scale * S


# ---------------------------------------------------------------------------
# Patch-embedding conv — z^B input rule.
# ---------------------------------------------------------------------------

def patchify(img: Array, patch: int) -> Array:
    """(C, H, W) -> (num_patches, C*patch*patch), matching the channel-major
    flattening of a torch Conv2d weight reshape (o, c*kh*kw)."""
    c, h, w = img.shape
    gh, gw = h // patch, w // patch
    x = img.reshape(c, gh, patch, gw, patch)
    x = x.transpose(1, 3, 0, 2, 4)  # gh, gw, c, ph, pw
    return x.reshape(gh * gw, c * patch * patch)


def unpatchify(x: Array, patch: int, c: int, h: int, w: int) -> Array:
    gh, gw = h // patch, w // patch
    x = x.reshape(gh, gw, c, patch, patch)
    x = x.transpose(2, 0, 3, 1, 4)
    return x.reshape(c, h, w)


def conv_patch_zB_relprop(img: Array, w: Array, R: Array, patch: int) -> Array:
    """z^B rule through the patch-embedding conv, down to bounded pixels.

    Reference ``modules/layers_ours.py:242-259`` (the ``X.shape[1]==3`` input
    branch): per-example pixel bounds L/H are the global min/max over the whole
    image; ``Za = conv(X,W) - conv(L,W+) - conv(H,W-) + 1e-9``; S = R/Za (plain
    division); ``C = X·convT(S,W) - L·convT(S,W+) - H·convT(S,W-)``.

    Because kernel == stride (non-overlapping patches), the conv is a patchify
    + matmul — the TPU-native formulation (one MXU matmul instead of a conv).
    ``img`` is (C, H, W); ``w`` is (C*patch*patch, embed) [patchify layout];
    ``R`` is (num_patches, embed). Returns (C, H, W) pixel relevance.
    """
    c, h, wd = img.shape
    lo = img.min()
    hi = img.max()
    pw = jnp.maximum(w, 0.0)
    nw = jnp.minimum(w, 0.0)

    X = patchify(img, patch)                       # (P, c*k*k)
    L = jnp.full_like(X, lo)
    H = jnp.full_like(X, hi)

    Za = X @ w - L @ pw - H @ nw + EPS
    S = R / Za
    C = X * (S @ w.T) - L * (S @ pw.T) - H * (S @ nw.T)
    return unpatchify(C, patch, c, h, wd)


def conv_patch_alphabeta_relprop(img: Array, w: Array, R: Array, patch: int,
                                 alpha: float = 1.0) -> Array:
    """α-β rule through the patch conv (non-input-layer branch, reference
    ``modules/layers_ours.py:260-279``). Note the reference uses *separate*
    denominators here even in the "ours" library."""
    beta = alpha - 1.0
    c, h, wd = img.shape
    X = patchify(img, patch)
    pw = jnp.maximum(w, 0.0)
    nw = jnp.minimum(w, 0.0)
    px = jnp.maximum(X, 0.0)
    nx = jnp.minimum(X, 0.0)

    def f(w1, w2, x1, x2):
        Z1 = x1 @ w1
        Z2 = x2 @ w2
        S1 = safe_divide(R, Z1)
        S2 = safe_divide(R, Z2)
        return x1 * (S1 @ w1.T) + x2 * (S2 @ w2.T)

    act = f(pw, nw, px, nx)
    if beta == 0.0:
        out = alpha * act
    else:
        out = alpha * act - beta * f(nw, pw, px, nx)
    return unpatchify(out, patch, c, h, wd)


# ---------------------------------------------------------------------------
# Rollout.
# ---------------------------------------------------------------------------

def compute_rollout(cams: Array, start_layer: int = 0,
                    row_normalize: bool = False) -> Array:
    """Rollout matrix chain ``Π_{i=L-1..start} (cams_i + I)``.

    cams: (L, n, n) per-layer token-attribution matrices. The ViT reference
    does NOT row-normalize (reference ``baselines/ViT/ViT_LRP.py:38-49``, the
    normalization is commented out at :44-45); the BERT reference DOES
    (``BERT_explainability/modules/BERT/BERT.py:28-39``).

    start_layer is static under jit. Implemented as an unrolled left-multiply
    chain (L is small and static: 12/24) — each step is one (n,n)x(n,n) MXU
    matmul.
    """
    L, n, _ = cams.shape
    eye = jnp.eye(n, dtype=cams.dtype)
    mats = cams + eye
    if row_normalize:
        mats = mats / mats.sum(axis=-1, keepdims=True)
    joint = mats[start_layer]
    for i in range(start_layer + 1, L):
        joint = mats[i] @ joint
    return joint


__all__ = [
    "EPS", "safe_divide", "zrule", "add_relprop", "add_eye_relprop",
    "clone_relprop", "cat_relprop", "index_select_relprop",
    "einsum_qk_relprop", "einsum_av_relprop", "matmul_relprop", "mul_relprop",
    "linear_alphabeta", "batchnorm2d_relprop", "patchify", "unpatchify",
    "conv_patch_zB_relprop",
    "conv_patch_alphabeta_relprop", "compute_rollout",
]
