"""Precision-island sweep: speed vs heatmap fidelity.

For each (matmul, attn, relprop) precision config, measure expl/s at batch 64
and the per-image Pearson correlation of transformer_attribution heatmaps
against the float32-highest reference, on random weights (the hardest case).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.models.vit import (
    VIT_BASE_16_224 as cfg, init_params)
from transformer_explainability_tpu.explain.generator import make_explain_fn

params = init_params(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)
B = 64
imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
idx = jnp.asarray(rng.randint(0, 1000, B), jnp.int32)


def run(fn, n=8):
    out = np.asarray(fn(params, imgs, idx))
    t0 = time.perf_counter()
    outs = [fn(params, imgs, idx) for _ in range(n)]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / n
    return out, B / dt


ref_fn = make_explain_fn(cfg, matmul_precision="float32")
ref, ref_rate = run(ref_fn)
print(f"{'config':42s} {'expl/s':>8s} {'corr min':>9s} {'corr mean':>9s}")
print(f"{'f32 (reference)':42s} {ref_rate:8.1f} {'exact':>9s}")

CONFIGS = [
    ("tf32 all", dict(matmul_precision="tensorfloat32")),
    ("bf16 all", dict(matmul_precision="bfloat16")),
    ("mixed r1 default (tf32 + bf16 rules)",
     dict(matmul_precision="tensorfloat32", relprop_precision="bfloat16")),
    ("bf16 + attn=f32",
     dict(matmul_precision="bfloat16", attn_precision="float32")),
    ("bf16 + attn=f32 + rules=tf32",
     dict(matmul_precision="bfloat16", attn_precision="float32",
          relprop_precision="tensorfloat32")),
    ("bf16 + attn=f32 + rules=f32",
     dict(matmul_precision="bfloat16", attn_precision="float32",
          relprop_precision="float32")),
    ("bf16 + attn=tf32",
     dict(matmul_precision="bfloat16", attn_precision="tensorfloat32")),
    ("tf32 + attn=f32",
     dict(matmul_precision="tensorfloat32", attn_precision="float32")),
    ("tf32 + attn=f32 + rules=bf16",
     dict(matmul_precision="tensorfloat32", attn_precision="float32",
          relprop_precision="bfloat16")),
]

for name, kw in CONFIGS:
    fn = make_explain_fn(cfg, **kw)
    out, rate = run(fn)
    a = out.reshape(B, -1)
    b = ref.reshape(B, -1)
    a = a - a.mean(1, keepdims=True)
    bb = b - b.mean(1, keepdims=True)
    corr = (a * bb).sum(1) / np.sqrt((a * a).sum(1) * (bb * bb).sum(1))
    print(f"{name:42s} {rate:8.1f} {corr.min():9.4f} {corr.mean():9.4f}")
