"""Training step: classifier fine-tuning, mesh-sharded (dp + tp).

The reference's only training loop is the BERT-classifier fine-tune
(``BERT_rationale_benchmark/models/pipeline/bert_pipeline.py:289-418``: Adam,
grad clipping, patience early-stop). This module provides the TPU-native
equivalent as a pure jitted step usable for both model families; the
data/model mesh shardings come from :mod:`..parallel.mesh`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transformer_explainability_tpu.models import vit as vit_mod
from transformer_explainability_tpu.models.vit import ViTConfig
from transformer_explainability_tpu.parallel.mesh import vit_param_pspecs


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.0,
                   max_grad_norm: Optional[float] = 1.0):
    """Adam + clipping, mirroring the reference's choices
    (bert_pipeline.py:289: Adam(lr); :397: clip_grad_norm(max_grad_norm))."""
    tx = []
    if max_grad_norm:
        tx.append(optax.clip_by_global_norm(max_grad_norm))
    tx.append(optax.adamw(lr, weight_decay=weight_decay))
    return optax.chain(*tx)


def make_train_step(cfg: ViTConfig, optimizer,
                    mesh: Optional[Mesh] = None,
                    matmul_precision: str = "bfloat16"):
    """Build ``step(params, opt_state, images, labels) -> (params, opt_state,
    loss)``. With a mesh: batch sharded over ``data``, parameters laid out per
    ``vit_param_pspecs`` (tensor-parallel over ``model``); XLA inserts the
    gradient psums over ICI from the shardings."""

    def loss_fn(params, images, labels):
        with jax.default_matmul_precision(matmul_precision):
            logits = jax.vmap(
                lambda im: vit_mod.forward(params, im, cfg))(images)
        return cross_entropy(logits, labels)

    def step(params, opt_state, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step)

    pspecs = vit_param_pspecs(cfg)
    psh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                       is_leaf=lambda x: isinstance(x, P))
    dsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    # Lay the optimizer state out explicitly: any param-shaped slot (Adam
    # mu/nu) follows the param shardings; scalar slots (step count) are
    # replicated. Inference from inputs would work on a CPU mesh but leaves
    # the moments' layout to chance on real hardware.
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
    return jax.jit(step,
                   in_shardings=(psh, osh, dsh, dsh),
                   out_shardings=(psh, osh, rep))


def init_train_state(key, cfg: ViTConfig, optimizer,
                     mesh: Optional[Mesh] = None) -> Tuple[Dict, Any]:
    params = vit_mod.init_params(key, cfg)
    if mesh is not None:
        from transformer_explainability_tpu.parallel.mesh import shard_params
        params = shard_params(params, mesh, cfg=cfg)
    opt_state = optimizer.init(params)
    return params, opt_state
