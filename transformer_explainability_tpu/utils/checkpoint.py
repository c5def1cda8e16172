"""Pytree checkpointing (npz + json sidecar).

The TPU analog of the reference's three checkpoint mechanisms
(``baselines/ViT/helpers.py:19-84``: load_state_dict / load_checkpoint /
resume_checkpoint with optimizer state): any JAX pytree (params, optimizer
state, or both) round-trips through a flat ``.npz`` keyed by tree paths, with
scalar metadata (epoch, metrics) in a ``.json`` sidecar. No torch, no orbax
dependency; files are plain numpy archives.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path: str, tree) -> None:
    """Flat .npz export keyed by ``jax.tree_util.keystr`` paths."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    np.savez(path, **{jax.tree_util.keystr(k): np.asarray(v)
                      for k, v in flat})


def load_pytree(path: str, like):
    """Restore into the structure of ``like`` (shapes/keys must match)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(data[jax.tree_util.keystr(k)])
                  for k, _ in leaves])


def save_train_state(path_prefix: str, params, opt_state,
                     metadata: Optional[Dict[str, Any]] = None) -> None:
    """``resume_checkpoint`` analog (reference ``helpers.py:47-84``): model +
    optimizer + metadata. Writes ``{prefix}.params.npz``,
    ``{prefix}.opt.npz``, ``{prefix}.meta.json``."""
    save_pytree(path_prefix + ".params.npz", params)
    save_pytree(path_prefix + ".opt.npz", opt_state)
    with open(path_prefix + ".meta.json", "w") as f:
        json.dump(metadata or {}, f)


def restore_train_state(path_prefix: str, params_like, opt_state_like
                        ) -> Tuple[Any, Any, Dict[str, Any]]:
    params = load_pytree(path_prefix + ".params.npz", params_like)
    opt_state = load_pytree(path_prefix + ".opt.npz", opt_state_like)
    meta_path = path_prefix + ".meta.json"
    metadata = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return params, opt_state, metadata


def has_train_state(path_prefix: str) -> bool:
    return os.path.exists(path_prefix + ".params.npz")


# Optional orbax backend — the standard JAX ecosystem checkpointer (async,
# sharding-aware, multi-host safe), preferred for large sharded train states.
def save_pytree_orbax(path: str, tree) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def load_pytree_orbax(path: str, like):
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer().restore(os.path.abspath(path), like)
