"""Measure the mlp_precision knob on the real TPU: throughput (B=64 randn)
and fidelity vs the f64 CPU ground truth (see perf_fidelity_truth.py).

    python experiments/perf_fidelity_truth.py --n 16   # once, CPU, slow
    python experiments/perf_mlp_precision.py
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

T = np.load("/tmp/fidelity_truth.npz")
imgs_t, idx_t, truth = T["imgs"], T["idx"], T["truth"]
N = len(imgs_t)

params = init_params(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)
B = 64
imgs_b = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
idx_b = jnp.asarray(rng.randint(0, 1000, B), jnp.int32)

# pad the truth set to one B=32 batch (compile once)
pad = 32 - N
imgs_p = jnp.asarray(np.concatenate(
    [imgs_t, np.zeros((pad, 3, 224, 224), np.float32)]))
idx_p = jnp.asarray(np.concatenate([idx_t, np.zeros(pad, np.int32)]))


def corr(a, b):
    a = a - a.mean()
    b = b - b.mean()
    return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))


MODES = [
    ("tf32+bf16r+f32a (default)", dict(matmul_precision="tensorfloat32",
                                       relprop_precision="bfloat16",
                                       attn_precision="float32")),
    ("  + mlp=bf16", dict(matmul_precision="tensorfloat32",
                          relprop_precision="bfloat16",
                          attn_precision="float32",
                          mlp_precision="bfloat16")),
    ("tf32+bf16r (attn tf32) + mlp=bf16",
     dict(matmul_precision="tensorfloat32", relprop_precision="bfloat16",
          mlp_precision="bfloat16")),
]

print(f"{'mode':38s} {'expl/s':>8s} {'med':>8s} {'mean':>8s} {'min':>8s} "
      f"{'catdog':>8s}")
for name, kw in MODES:
    fn = make_explain_fn(cfg, "transformer_attribution", **kw)
    out = np.asarray(fn(params, imgs_p, idx_p))[:N]
    cs = np.asarray([corr(out[i].astype(np.float64), truth[i])
                     for i in range(N)])
    # throughput at B=64
    np.asarray(fn(params, imgs_b, idx_b))
    n_iter = 4
    t0 = time.perf_counter()
    outs = [fn(params, imgs_b, idx_b) for _ in range(n_iter)]
    for o in outs:
        np.asarray(o)
    rate = B * n_iter / (time.perf_counter() - t0)
    print(f"{name:38s} {rate:8.1f} {np.median(cs[:-1]):8.5f} "
          f"{cs[:-1].mean():8.5f} {cs[:-1].min():8.5f} {cs[-1]:8.5f}")
