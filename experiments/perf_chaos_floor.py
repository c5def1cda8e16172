"""Chaos floor: corr of f32-highest heatmaps under a ~1e-6 relative input
perturbation, and under a different-but-equivalent summation order (batch
roll). If these decorrelate, precision configs can't be judged below that
floor on random weights."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.models.vit import (
    VIT_BASE_16_224 as cfg, init_params)
from transformer_explainability_tpu.explain.generator import make_explain_fn

params = init_params(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)
B = 64
imgs = np.asarray(rng.randn(B, 3, 224, 224), np.float32)
idx = jnp.asarray(rng.randint(0, 1000, B), jnp.int32)

fn = make_explain_fn(cfg, matmul_precision="float32")
ref = np.asarray(fn(params, jnp.asarray(imgs), idx))


def corr(a, b):
    a = a.reshape(B, -1)
    b = b.reshape(B, -1)
    a = a - a.mean(1, keepdims=True)
    b = b - b.mean(1, keepdims=True)
    return (a * b).sum(1) / np.sqrt((a * a).sum(1) * (b * b).sum(1))


for eps in (1e-7, 1e-6, 1e-5, 1e-4):
    pert = imgs * (1.0 + eps * rng.randn(*imgs.shape).astype(np.float32))
    out = np.asarray(fn(params, jnp.asarray(pert), idx))
    c = corr(out, ref)
    print(f"input pert {eps:.0e}: corr min {c.min():.4f} mean {c.mean():.4f}")

# trained-ish weights proxy: scale down qkv/fc kernels (softmax less
# saturated) — does the chaos shrink?
p2 = jax.tree.map(lambda x: x, params)
out = np.asarray(fn(params, jnp.asarray(imgs), idx))
print("determinism check (same call twice): max |d| =",
      np.abs(out - ref).max())
