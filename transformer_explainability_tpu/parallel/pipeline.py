"""Pipeline parallelism (PP): shard the block stack over a ``stage`` axis.

The reference has no distributed training at all (its only artifact is dead
intra-host DataParallel code, reference ``utils/parallel.py:26-64``). DP and
TP cover every model the reference ships (ViT-B/L and BERT-base fit one
chip); PP is the third classical axis and exists here for depth-dominated
models that do NOT fit — and to make the (dp, tp, pp, sp) design story
complete rather than asserted.

The schedule is GPipe on a ring, written the TPU-native way — one SPMD
program under ``shard_map``, microbatch hand-off as an ICI ``ppermute``
(no host scheduler, no per-stage programs):

  * ``params["blocks"]`` is stacked on a leading depth axis (the same layout
    every other path uses), so stage sharding IS a PartitionSpec on that
    axis: ``P("stage")`` — each device holds ``depth / n_stage`` contiguous
    blocks and runs them as a local ``lax.scan`` (rematerialized per block,
    GPipe's memory trade).
  * the batch is split into ``M`` microbatches; at pipeline step ``t`` stage
    ``s`` processes microbatch ``t - s`` and hands its output to stage
    ``s+1`` with a ring ``ppermute``. A ``lax.scan`` over the
    ``M + n_stage - 1`` steps keeps the program compiler-friendly (one
    traced step, no Python unrolling of the schedule).
  * the embedding runs on stage 0 and the final-norm/head on the last stage
    (SPMD-uniformly: every stage computes them, ``where(s == ...)`` selects;
    the dead branches carry zero gradients, so replicated-param grads just
    ``psum`` over the stage axis). Logits are broadcast with a masked
    ``psum`` — the only collective besides the hand-off ring.
  * the pipeline bubble is the GPipe one: ``(n_stage - 1) / (M + n_stage
    - 1)`` of the steps are idle per device — pick ``M >= 4 * n_stage`` in
    production to amortize it (tests/dryrun use tiny ``M``; correctness is
    schedule-independent).

Backward/training needs no second schedule: the whole pipeline is one
differentiable program, so ``jax.value_and_grad`` through the ``scan`` +
``ppermute`` (whose transpose is the reverse-ring ``ppermute``) yields
exactly the reverse pipeline, with the same bubble.

Composes with DP on a ``(data, stage)`` mesh. Not composed with TP (a
``(data, stage, model)`` mesh would need the tensor rules of
:mod:`.tensor` inside the stage scan; at the model sizes this framework
ships, TP and PP are alternatives, not a product).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transformer_explainability_tpu.models import vit as vit_mod
from transformer_explainability_tpu.models.vit import ViTConfig
from transformer_explainability_tpu.parallel.sequence import shard_map


def make_pipeline_mesh(n_data: Optional[int] = None, n_stage: int = 2,
                       devices=None) -> Mesh:
    """A ``(data, stage)`` mesh. The stage axis is innermost so the hand-off
    ring rides ICI neighbors."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_stage
    assert n_data * n_stage <= len(devices), (n_data, n_stage, len(devices))
    arr = np.asarray(devices[: n_data * n_stage]).reshape(n_data, n_stage)
    return Mesh(arr, ("data", "stage"))


def vit_pipeline_pspecs(cfg: ViTConfig, qkv_bias: Optional[bool] = None):
    """PartitionSpecs for the ViT pytree under a ``(data, stage)`` mesh:
    block leaves sharded on their leading (stacked-depth) axis, everything
    else replicated (the embed/head live on one stage logically; physically
    replicating them is cheap — they are <2% of ViT's parameters)."""
    if qkv_bias is None:
        qkv_bias = cfg.qkv_bias
    blk = P("stage")
    blocks = {
        "norm1": {"scale": blk, "bias": blk},
        "qkv": {"kernel": blk},
        "proj": {"kernel": blk, "bias": blk},
        "norm2": {"scale": blk, "bias": blk},
        "fc1": {"kernel": blk, "bias": blk},
        "fc2": {"kernel": blk, "bias": blk},
    }
    if qkv_bias:
        blocks["qkv"]["bias"] = blk
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


def shard_params_pipeline(params, mesh: Mesh, cfg: ViTConfig):
    pspecs = vit_pipeline_pspecs(cfg, qkv_bias="bias" in params["blocks"]["qkv"])
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings)


def _gpipe_schedule(x0_mb, local_blocks, n_stage: int, M: int):
    """The GPipe ring schedule, model-agnostic. ``x0_mb``: (M, mb, ...) —
    stage 0's microbatch ingest; ``local_blocks(x, mb_idx) -> y`` applies
    this device's depth shard (``mb_idx`` is the traced microbatch index the
    stage is working on — for per-microbatch side inputs like attention
    masks). Returns the (M*mb merged on the leading axes) finished outputs,
    valid on the LAST stage (garbage elsewhere — select/broadcast after).
    Must run inside ``shard_map`` on a mesh with a ``stage`` axis."""
    s = lax.axis_index("stage")
    ring = [(i, (i + 1) % n_stage) for i in range(n_stage)]

    def pipe_step(recv, t):
        fresh = x0_mb[jnp.clip(t, 0, M - 1)]
        x_in = jnp.where(s == 0, fresh, recv)
        y = local_blocks(x_in, jnp.clip(t - s, 0, M - 1))
        nxt = lax.ppermute(y, "stage", ring)
        return nxt, y

    T = M + n_stage - 1
    _, ys = lax.scan(pipe_step, jnp.zeros_like(x0_mb[0]), jnp.arange(T))
    # the last stage's steps [n_stage-1, T) hold the M finished microbatches
    return ys[n_stage - 1:]


def _gpipe_schedule_aux(x0_mb, local_blocks, n_stage: int, M: int):
    """:func:`_gpipe_schedule` variant whose ``local_blocks(x, mb_idx) ->
    (y, aux)`` also emits per-step auxiliaries (e.g. per-block anchors the
    reverse pass will consume). Returns ``(ys, aux)`` where ``aux`` holds
    THIS stage's M valid steps (stage ``s`` works on microbatch ``t - s`` at
    step ``t``, so its window is ``[s, s + M)``), leaves stacked
    ``(M, ...)`` in microbatch order."""
    s = lax.axis_index("stage")
    ring = [(i, (i + 1) % n_stage) for i in range(n_stage)]

    def pipe_step(recv, t):
        fresh = x0_mb[jnp.clip(t, 0, M - 1)]
        x_in = jnp.where(s == 0, fresh, recv)
        y, aux = local_blocks(x_in, jnp.clip(t - s, 0, M - 1))
        nxt = lax.ppermute(y, "stage", ring)
        return nxt, (y, aux)

    T = M + n_stage - 1
    _, (ys, auxs) = lax.scan(pipe_step, jnp.zeros_like(x0_mb[0]),
                             jnp.arange(T))
    aux = jax.tree.map(
        lambda a: lax.dynamic_slice_in_dim(a, s, M, axis=0), auxs)
    return ys[n_stage - 1:], aux


def _gpipe_schedule_rev(c0_mb, local_rev, n_stage: int, M: int):
    """The REVERSE GPipe ring: the mirror schedule of
    :func:`_gpipe_schedule_aux` for walking the block stack backwards
    (relprop / hand-written VJPs — the explicit form of the transpose
    ``ppermute`` the training path's autodiff already exercises).

    ``c0_mb``: pytree of (M, mb, ...) seed carries, ingested by the LAST
    stage; ``local_rev(c, mb_idx) -> (c_out, aux)`` applies this stage's
    depth shard in reverse. Stage ``s`` works on microbatch ``t - (n_stage
    - 1 - s)`` at step ``t`` and hands its carry to stage ``s - 1``.
    Returns ``aux`` for this stage's M valid steps (window
    ``[n_stage - 1 - s, n_stage - 1 - s + M)``), stacked in microbatch
    order. The finished carries land on stage 0 and are not returned —
    transformer_attribution's output is the per-block cam maps, not the
    input relevance."""
    s = lax.axis_index("stage")
    last = n_stage - 1
    ring = [(i, (i - 1) % n_stage) for i in range(n_stage)]

    def pipe_step(recv, t):
        fresh = jax.tree.map(lambda a: a[jnp.clip(t, 0, M - 1)], c0_mb)
        c_in = jax.tree.map(lambda f, r: jnp.where(s == last, f, r),
                            fresh, recv)
        c_out, aux = local_rev(c_in, jnp.clip(t - (last - s), 0, M - 1))
        nxt = lax.ppermute(c_out, "stage", ring)
        return nxt, aux

    T = M + n_stage - 1
    zero = jax.tree.map(lambda a: jnp.zeros_like(a[0]), c0_mb)
    _, auxs = lax.scan(pipe_step, zero, jnp.arange(T))
    return jax.tree.map(
        lambda a: lax.dynamic_slice_in_dim(a, last - s, M, axis=0), auxs)


def _pipeline_logits(params, images, cfg: ViTConfig, n_stage: int,
                     microbatches: int, attn_precision: Optional[str],
                     remat: bool):
    """The per-device SPMD pipeline body: images (B_local, 3, H, W) ->
    logits (B_local, C), identical on every stage after the final psum
    broadcast. Must run inside ``shard_map`` on a mesh with a ``stage``
    axis; ``params["blocks"]`` leaves carry the LOCAL depth shard."""
    s = lax.axis_index("stage")
    B_local = images.shape[0]
    M = microbatches
    assert B_local % M == 0, (B_local, M)
    mb = B_local // M

    # stage 0's ingest: all M microbatch embeddings, computed SPMD-uniformly
    # (the embed matmul is ~0.6% of forward FLOPs; uniformity beats a
    # stage-0-only branch that XLA cannot express SPMD)
    x0 = jax.vmap(lambda im: vit_mod.embed(params, im, cfg)[1])(images)
    x0_mb = x0.reshape(M, mb, cfg.num_tokens, cfg.embed_dim)

    def block_body(x, bp):
        y = jax.vmap(
            lambda xi: vit_mod._block_acts(xi, bp, cfg, None,
                                           attn_precision)[1])(x)
        return y, None

    if remat:
        block_body = jax.checkpoint(block_body)

    def local_blocks(x, _mb_idx):
        y, _ = lax.scan(block_body, x, params["blocks"])
        return y

    ys = _gpipe_schedule(x0_mb, local_blocks, n_stage, M)
    x_final = ys.reshape(B_local, cfg.num_tokens, cfg.embed_dim)

    xn = jax.vmap(lambda x: vit_mod._layernorm(x, params["norm"],
                                               cfg.final_ln_eps))(x_final)
    logits = xn[:, 0] @ params["head"]["kernel"] + params["head"]["bias"]
    if cfg.distilled:
        logits_dist = (xn[:, 1] @ params["head_dist"]["kernel"]
                       + params["head_dist"]["bias"])
        logits = (logits + logits_dist) / 2
    # broadcast the last stage's (only valid) logits to every stage
    return lax.psum(jnp.where(s == n_stage - 1, logits, 0.0), "stage")


def make_pp_forward_fn(cfg: ViTConfig, mesh: Mesh,
                       microbatches: Optional[int] = None,
                       matmul_precision: str = "bfloat16",
                       attn_precision: Optional[str] = None,
                       remat: bool = True):
    """Jitted pipeline-parallel classification forward:
    ``fn(params, images) -> logits``. Batch sharded over ``data`` and split
    into ``microbatches`` per data shard (default: one per stage — raise it
    to shrink the bubble); blocks sharded over ``stage``."""
    n_stage = mesh.shape["stage"]
    assert cfg.depth % n_stage == 0, (cfg.depth, n_stage)
    M = microbatches or n_stage
    pspecs = vit_pipeline_pspecs(cfg)

    def body(params, images):
        with jax.default_matmul_precision(matmul_precision):
            return _pipeline_logits(params, images, cfg, n_stage, M,
                                    attn_precision, remat)

    fn = shard_map(body, mesh, in_specs=(pspecs, P("data")),
                   out_specs=P("data"))
    return jax.jit(fn)


def _pp_explain_heat(params, images, indices, cfg: ViTConfig, n_stage: int,
                     microbatches: int, start_layer: int, variant: str,
                     alpha: float, attn_precision: Optional[str],
                     relprop_precision: Optional[str],
                     rollout_pallas: Optional[bool]):
    """Per-device SPMD body of the pipeline-parallel
    ``transformer_attribution`` explanation: images (B_local, 3, H, W) +
    class indices (B_local,) -> heatmaps (B_local, num_patches), identical
    on every stage.

    Three phases, all inside one program:
      1. forward GPipe ring collecting each block's (x_in, x_mid) anchors
         stage-locally (the same anchor-remat trade the single-device
         reverse uses — block internals are recomputed from anchors, never
         stored);
      2. reverse seeds on the LAST stage (class one-hot gradient + head/
         pool relprop, mirroring ``vit.reverse_pass``'s tail), then the
         reverse GPipe ring: each stage walks its local blocks backwards
         (``block_backward`` + ``block_relprop`` fused per block, emitting
         the (grad ⊙ cam)⁺ head-mean) and hands the (gradient, relevance)
         carry to stage ``s - 1``;
      3. the rollout chain over all L per-block maps — a tiny (n, n)
         matrix product, so the maps are ``all_gather``ed over the stage
         axis and the tail runs replicated rather than pipelined.
    """
    from transformer_explainability_tpu.ops import relprop as rp
    from transformer_explainability_tpu.ops import pallas_kernels as pk

    s = lax.axis_index("stage")
    B_local = images.shape[0]
    M = microbatches
    assert B_local % M == 0, (B_local, M)
    mb = B_local // M
    n, D = cfg.num_tokens, cfg.embed_dim
    L_local = cfg.depth // n_stage

    # ---- phase 1: forward ring, collecting (x_in, x_mid) anchors ----
    x0 = jax.vmap(lambda im: vit_mod.embed(params, im, cfg)[1])(images)
    x0_mb = x0.reshape(M, mb, n, D)

    def local_blocks(x, _mb_idx):
        def body(xc, bp):
            x_mid, x_out, _ = jax.vmap(
                lambda xi: vit_mod._block_acts(xi, bp, cfg, None,
                                               attn_precision))(xc)
            return x_out, (xc, x_mid)
        y, anchors = lax.scan(body, x, params["blocks"])
        return y, anchors

    ys, (x_ins_sv, x_mids_sv) = _gpipe_schedule_aux(x0_mb, local_blocks,
                                                    n_stage, M)
    # anchors: (M, L_local, mb, n, D) each, valid on every stage for its
    # own depth shard; ys: finished outputs, valid on the LAST stage
    x_final = ys.reshape(B_local, n, D)

    # ---- phase 2a: reverse seeds (valid on the last stage only — other
    # stages compute garbage the reverse ingest never reads) ----
    def seed_one(xf, index):
        def tail(x):
            xn = vit_mod._layernorm(x, params["norm"], cfg.final_ln_eps)
            logits = xn[0] @ params["head"]["kernel"] + params["head"]["bias"]
            if cfg.distilled:
                logits = (logits + xn[1] @ params["head_dist"]["kernel"]
                          + params["head_dist"]["bias"]) / 2
            return logits
        logits = tail(xf)
        idx = jnp.where(index >= 0, index, jnp.argmax(logits))
        onehot = jax.nn.one_hot(idx, cfg.num_classes, dtype=logits.dtype)
        g_final = jax.grad(lambda x: jnp.sum(onehot * tail(x)))(xf)
        # relevance seed: head -> pool (mirrors vit.reverse_pass:713-733)
        xn = vit_mod._layernorm(xf, params["norm"], cfg.final_ln_eps)
        if cfg.distilled:
            z1 = xn[0] @ params["head"]["kernel"] + params["head"]["bias"]
            z2 = (xn[1] @ params["head_dist"]["kernel"]
                  + params["head_dist"]["bias"])
            R1, R2 = rp.add_relprop(z1, z2, onehot, variant)
            R_cls = rp.linear_alphabeta(xn[0], params["head"]["kernel"], R1,
                                        alpha, variant)
            R_dist = rp.linear_alphabeta(
                xn[1], params["head_dist"]["kernel"], R2, alpha, variant)
            R = jnp.zeros_like(xn).at[0].set(R_cls).at[1].set(R_dist)
        else:
            R = rp.linear_alphabeta(xn[0], params["head"]["kernel"], onehot,
                                    alpha, variant)
            R = rp.index_select_relprop(xn, 0, jnp.array(0), R[None, :])
        return g_final, R

    g0, R0 = jax.vmap(seed_one)(x_final, indices)
    c0_mb = (g0.reshape(M, mb, n, D), R0.reshape(M, mb, n, D))

    # ---- phase 2b: reverse ring over the local depth shard ----
    def rev_block_one(g_out, Rc, x_in, x_mid, bp):
        acts = vit_mod._block_acts_from_anchors(x_in, x_mid, bp, cfg,
                                                attn_precision)
        g_in, g_tap = vit_mod.block_backward(g_out, x_in, x_mid, acts, bp,
                                             cfg, attn_precision)
        R_in, attn_cam, _ = vit_mod.block_relprop(
            Rc, x_in, x_mid, bp, cfg, alpha, variant, acts=acts,
            relprop_precision=relprop_precision)
        gc = jnp.clip(g_tap * attn_cam, min=0).mean(axis=0)
        return g_in, R_in, gc

    def local_rev(c, mb_idx):
        x_ins = x_ins_sv[mb_idx]          # (L_local, mb, n, D)
        x_mids = x_mids_sv[mb_idx]

        def body(carry, xs):
            g_out, Rc = carry
            x_in, x_mid, bp = xs
            g_in, R_in, gc = jax.vmap(
                lambda go, rc, xi, xm: rev_block_one(go, rc, xi, xm, bp)
            )(g_out, Rc, x_in, x_mid)
            return (g_in, R_in), gc

        c_out, gc = lax.scan(body, c, (x_ins, x_mids, params["blocks"]),
                             reverse=True)
        return c_out, gc                  # gc: (L_local, mb, n, n)

    gc_local = _gpipe_schedule_rev(c0_mb, local_rev, n_stage, M)
    gc_local = gc_local.transpose(0, 2, 1, 3, 4).reshape(
        B_local, L_local, n, n)

    # ---- phase 3: gather the tiny per-block maps; replicated rollout ----
    gc_all = lax.all_gather(gc_local, "stage")      # (n_stage, B, L_local, ...)
    cams = jnp.moveaxis(gc_all, 0, 1).reshape(B_local, cfg.depth, n, n)
    return jax.vmap(
        lambda c: pk.rollout_from_grad_cam(
            c, None, start_layer, use_pallas=rollout_pallas
        )[0, cfg.num_prefix_tokens:])(cams)


def make_pp_explain_fn(cfg: ViTConfig, mesh: Mesh,
                       microbatches: Optional[int] = None,
                       start_layer: int = 0, variant: str = "ours",
                       alpha: float = 1.0,
                       matmul_precision: str = "float32",
                       attn_precision: Optional[str] = None,
                       relprop_precision: Optional[str] = None,
                       rollout_pallas: Optional[bool] = None):
    """Pipeline-parallel ``transformer_attribution`` explanation:
    ``fn(params, images, indices) -> heatmaps (B, num_patches)`` with the
    block stack sharded over ``stage`` and the batch over ``data``
    (``indices``: int32 per-image class, -1 = argmax).

    Completes the parallelism × explain matrix: DP (``parallel.mesh``) and
    TP/SP (``parallel.{tensor,sequence}``) already run the full relprop;
    this is the same math re-scheduled as a forward + reverse GPipe ring
    (see :func:`_pp_explain_heat`), so outputs match the single-device
    :func:`...explain.generator.explain_single` to f32 tolerance for any
    (n_stage, microbatch) schedule."""
    n_stage = mesh.shape["stage"]
    assert cfg.depth % n_stage == 0, (cfg.depth, n_stage)
    M = microbatches or n_stage
    pspecs = vit_pipeline_pspecs(cfg)

    def body(params, images, indices):
        with jax.default_matmul_precision(matmul_precision):
            return _pp_explain_heat(params, images, indices, cfg, n_stage,
                                    M, start_layer, variant, alpha,
                                    attn_precision, relprop_precision,
                                    rollout_pallas)

    fn = shard_map(body, mesh,
                   in_specs=(pspecs, P("data"), P("data")),
                   out_specs=P("data"))
    return jax.jit(fn)


def make_pp_train_step(cfg: ViTConfig, optimizer, mesh: Mesh,
                       microbatches: Optional[int] = None,
                       matmul_precision: str = "bfloat16",
                       attn_precision: Optional[str] = None,
                       remat: bool = True):
    """Pipeline-parallel training step mirroring
    :func:`...train.make_train_step`: ``step(params, opt_state, images,
    labels) -> (params, opt_state, loss)``. Gradients flow through the
    pipeline scan's transpose (the reverse-ring ``ppermute``); block grads
    stay on their owning stage, replicated-param grads ``psum`` over the
    stage axis, and everything ``pmean``s over ``data``."""
    from transformer_explainability_tpu import train as train_mod

    n_stage = mesh.shape["stage"]
    assert cfg.depth % n_stage == 0, (cfg.depth, n_stage)
    M = microbatches or n_stage
    pspecs = vit_pipeline_pspecs(cfg)

    def local_loss(params, images, labels):
        with jax.default_matmul_precision(matmul_precision):
            logits = _pipeline_logits(params, images, cfg, n_stage, M,
                                      attn_precision, remat)
        return train_mod.cross_entropy(logits, labels)

    def loss_and_grads(params, images, labels):
        loss, grads = jax.value_and_grad(local_loss)(params, images, labels)
        loss = lax.pmean(loss, "data")
        # Under check_vma/check_rep=False the transpose of the logits-
        # broadcast psum is psum (shard_map cannot prove the cotangent is
        # replicated), so every upstream gradient arrives EXACTLY n_stage
        # times too large (the per-stage CE cotangents are deterministic-
        # identical; verified x2/x4 at n_stage 2/4). Divide it back out.
        grads = jax.tree.map(lambda g: g / n_stage, grads)
        # block grads live on their owning stage (P("stage") out spec);
        # replicated-leaf contributions live only on the stage(s) that use
        # them (embed on 0, norm/head on the last; zero elsewhere, since the
        # dead SPMD branches never reach the loss) — psum over stage totals
        # them. Everything pmeans over data.
        grads = {
            k: jax.tree.map(
                (lambda g: lax.pmean(g, "data")) if k == "blocks" else
                (lambda g: lax.pmean(lax.psum(g, "stage"), "data")), v)
            for k, v in grads.items()}
        return loss, grads

    lg = shard_map(loss_and_grads, mesh,
                   in_specs=(pspecs, P("data"), P("data")),
                   out_specs=(P(), pspecs))

    psh = jax.tree.map(lambda sp: NamedSharding(mesh, sp), pspecs,
                       is_leaf=lambda x: isinstance(x, P))
    rep = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))

    param_shapes = jax.eval_shape(
        lambda k: vit_mod.init_params(k, cfg), jax.random.PRNGKey(0))
    params_struct = jax.tree_util.tree_structure(param_shapes)

    def _is_param_tree(node):
        try:
            return jax.tree_util.tree_structure(node) == params_struct
        except Exception:
            return False

    opt_shapes = jax.eval_shape(optimizer.init, param_shapes)
    osh = jax.tree.map(lambda n: psh if _is_param_tree(n) else rep,
                       opt_shapes, is_leaf=_is_param_tree)

    def step(params, opt_state, images, labels):
        loss, grads = lg(params, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, in_shardings=(psh, osh, dsh, dsh),
                   out_shardings=(psh, osh, rep))


def init_pp_train_state(key, cfg: ViTConfig, optimizer, mesh: Mesh):
    params = vit_mod.init_params(key, cfg)
    params = shard_params_pipeline(params, mesh, cfg)
    opt_state = optimizer.init(params)
    return params, opt_state


# ---------------------------------------------------------------------------
# BERT pipeline parallelism (same GPipe ring; ``params["layers"]`` is the
# stacked depth axis, the attention mask rides along as a per-microbatch
# side input selected by the schedule's mb_idx).
# ---------------------------------------------------------------------------

from transformer_explainability_tpu.models import bert as bert_mod  # noqa: E402
from transformer_explainability_tpu.models.bert import BertConfig  # noqa: E402


def bert_pipeline_pspecs(cfg: BertConfig):
    """Layer leaves sharded on the stacked depth axis over ``stage``;
    embeddings/pooler/classifier replicated."""
    shapes = jax.eval_shape(lambda k: bert_mod.init_params(k, cfg),
                            jax.random.PRNGKey(0))
    return jax.tree_util.tree_map_with_path(
        lambda path, _: (P("stage") if getattr(path[0], "key", None)
                         == "layers" else P()), shapes)


def shard_bert_params_pipeline(params, mesh: Mesh, cfg: BertConfig):
    pspecs = bert_pipeline_pspecs(cfg)
    shardings = jax.tree.map(lambda sp: NamedSharding(mesh, sp), pspecs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings)


def _bert_pipeline_logits(params, input_ids, attention_mask,
                          cfg: BertConfig, n_stage: int, microbatches: int,
                          attn_precision: Optional[str], remat: bool):
    """(B_local, S) ids/mask -> (B_local, num_labels) logits, identical on
    every stage after the final psum broadcast. Eval-mode layers (the
    explain/scoring forward — dropout-free, like the ViT PP path)."""
    s = lax.axis_index("stage")
    B_local, S = input_ids.shape
    M = microbatches
    assert B_local % M == 0, (B_local, M)
    mb = B_local // M

    tt = jnp.zeros((S,), jnp.int32)
    pos = jnp.arange(S, dtype=jnp.int32)
    x0 = jax.vmap(lambda ids: bert_mod.embed(params, ids, tt, pos, cfg))(
        input_ids)
    x0_mb = x0.reshape(M, mb, S, cfg.hidden_size)
    ext = ((1.0 - attention_mask.astype(x0.dtype)) * cfg.mask_value)
    ext_mb = ext.reshape(M, mb, S)

    def layer_body(carry, lp):
        x, em = carry
        y = jax.vmap(lambda xi, emi: bert_mod._layer_acts(
            xi, None, lp, emi, cfg,
            attn_precision=attn_precision)[1])(x, em)
        return (y, em), None

    if remat:
        layer_body = jax.checkpoint(layer_body)

    def local_blocks(x, mb_idx):
        em = ext_mb[mb_idx]
        (y, _), _ = lax.scan(layer_body, (x, em), params["layers"])
        return y

    ys = _gpipe_schedule(x0_mb, local_blocks, n_stage, M)
    seq_out = ys.reshape(B_local, S, cfg.hidden_size)
    pooled = jnp.tanh(seq_out[:, 0] @ params["pooler"]["kernel"]
                      + params["pooler"]["bias"])
    logits = (pooled @ params["classifier"]["kernel"]
              + params["classifier"]["bias"])
    return lax.psum(jnp.where(s == n_stage - 1, logits, 0.0), "stage")


def make_pp_bert_forward_fn(cfg: BertConfig, mesh: Mesh,
                            microbatches: Optional[int] = None,
                            matmul_precision: str = "bfloat16",
                            attn_precision: Optional[str] = None,
                            remat: bool = True):
    """Pipeline-parallel BERT classification forward:
    ``fn(params, input_ids, attention_mask) -> logits``."""
    n_stage = mesh.shape["stage"]
    assert cfg.num_layers % n_stage == 0, (cfg.num_layers, n_stage)
    M = microbatches or n_stage
    pspecs = bert_pipeline_pspecs(cfg)

    def body(params, ids, mask):
        with jax.default_matmul_precision(matmul_precision):
            return _bert_pipeline_logits(params, ids, mask, cfg, n_stage,
                                         M, attn_precision, remat)

    fn = shard_map(body, mesh, in_specs=(pspecs, P("data"), P("data")),
                   out_specs=P("data"))
    return jax.jit(fn)


def make_pp_bert_train_step(cfg: BertConfig, optimizer, mesh: Mesh,
                            microbatches: Optional[int] = None,
                            matmul_precision: str = "bfloat16",
                            attn_precision: Optional[str] = None,
                            remat: bool = True):
    """Pipeline-parallel BERT classifier fine-tune step (the ERASER
    pipeline's training role, eval-mode forward): ``step(params, opt_state,
    input_ids, attention_mask, labels) -> (params, opt_state, loss)``."""
    from transformer_explainability_tpu import train as train_mod

    n_stage = mesh.shape["stage"]
    assert cfg.num_layers % n_stage == 0, (cfg.num_layers, n_stage)
    M = microbatches or n_stage
    pspecs = bert_pipeline_pspecs(cfg)

    def local_loss(params, ids, mask, labels):
        with jax.default_matmul_precision(matmul_precision):
            logits = _bert_pipeline_logits(params, ids, mask, cfg, n_stage,
                                           M, attn_precision, remat)
        return train_mod.cross_entropy(logits, labels)

    def loss_and_grads(params, ids, mask, labels):
        loss, grads = jax.value_and_grad(local_loss)(params, ids, mask,
                                                     labels)
        loss = lax.pmean(loss, "data")
        # undo the psum-transpose n_stage factor (see make_pp_train_step)
        grads = jax.tree.map(lambda g: g / n_stage, grads)
        grads = {
            k: jax.tree.map(
                (lambda g: lax.pmean(g, "data")) if k == "layers" else
                (lambda g: lax.pmean(lax.psum(g, "stage"), "data")), v)
            for k, v in grads.items()}
        return loss, grads

    lg = shard_map(loss_and_grads, mesh,
                   in_specs=(pspecs, P("data"), P("data"), P("data")),
                   out_specs=(P(), pspecs))

    psh = jax.tree.map(lambda sp: NamedSharding(mesh, sp), pspecs,
                       is_leaf=lambda x: isinstance(x, P))
    rep = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))
    param_shapes = jax.eval_shape(
        lambda k: bert_mod.init_params(k, cfg), jax.random.PRNGKey(0))
    params_struct = jax.tree_util.tree_structure(param_shapes)

    def _is_param_tree(node):
        try:
            return jax.tree_util.tree_structure(node) == params_struct
        except Exception:
            return False

    opt_shapes = jax.eval_shape(optimizer.init, param_shapes)
    osh = jax.tree.map(lambda n: psh if _is_param_tree(n) else rep,
                       opt_shapes, is_leaf=_is_param_tree)

    def step(params, opt_state, ids, mask, labels):
        loss, grads = lg(params, ids, mask, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, in_shardings=(psh, osh, dsh, dsh, dsh),
                   out_shardings=(psh, osh, rep))
