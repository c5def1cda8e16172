"""Perf experiment 1: phase split + XLA cost analysis at batch 64."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.models.vit import (
    VIT_BASE_16_224 as cfg, init_params)
from transformer_explainability_tpu.models import vit as vit_mod
from transformer_explainability_tpu.explain.generator import make_explain_fn

params = init_params(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)
B = 64
imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
idx = jnp.asarray(rng.randint(0, 1000, B), jnp.int32)


def timeit(fn, *args, n=8):
    np.asarray(fn(*args))  # compile+warm
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        np.asarray(o)
    return (time.perf_counter() - t0) / n


MODES = {
    "bf16": dict(matmul_precision="bfloat16", relprop_precision=None),
    "mixed": dict(matmul_precision="tensorfloat32",
                  relprop_precision="bfloat16"),
    "f32": dict(matmul_precision="float32", relprop_precision=None),
}

for name, kw in MODES.items():
    fn = make_explain_fn(cfg, "transformer_attribution", **kw)
    dt = timeit(fn, params, imgs, idx)
    print(f"{name:6s} full explain: {dt*1e3:7.1f} ms/batch "
          f"{B/dt:7.1f} expl/s")

# phase split at bf16
def fwd_only(params, imgs):
    with jax.default_matmul_precision("bfloat16"):
        return jax.vmap(lambda im: vit_mod.forward(params, im, cfg))(imgs)

fwd_j = jax.jit(fwd_only)
dt = timeit(fwd_j, params, imgs)
print(f"bf16 forward-only: {dt*1e3:7.1f} ms/batch  {B/dt:7.1f} img/s")

# cost analysis of the full bf16 program
fn = make_explain_fn(cfg, "transformer_attribution",
                     matmul_precision="bfloat16")
c = jax.jit(fn).lower(params, imgs, idx).compile()
ca = c.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
flops = ca.get("flops", float("nan"))
bytes_ = ca.get("bytes accessed", float("nan"))
print(f"XLA cost: {flops/1e9:.1f} GFLOP/batch ({flops/B/1e9:.2f}/expl), "
      f"{bytes_/1e9:.2f} GB accessed/batch ({bytes_/B/1e6:.1f} MB/expl)")
try:
    ma = c.memory_analysis()
    print("peak temp bytes:", getattr(ma, "temp_size_in_bytes", ma))
except Exception as e:
    print("memory_analysis failed:", e)
