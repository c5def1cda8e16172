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
