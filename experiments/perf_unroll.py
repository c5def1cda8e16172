"""Test scan unrolling for the explain program (monkeypatched lax.scan
unroll factor) at several precisions."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.models.vit import (
    VIT_BASE_16_224 as cfg, init_params)
from transformer_explainability_tpu.explain import generator as gen
from transformer_explainability_tpu.models import vit as vit_mod

params = init_params(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)
B = 64
imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
idx = jnp.asarray(rng.randint(0, 1000, B), jnp.int32)

orig_scan = jax.lax.scan


def run(prec, unroll):
    def scan_unrolled(*args, **kw):
        kw.setdefault("unroll", unroll)
        return orig_scan(*args, **kw)
    jax.lax.scan = scan_unrolled
    vit_mod.jax.lax.scan = scan_unrolled
    try:
        fn = gen.make_explain_fn(cfg, matmul_precision=prec)
        out = np.asarray(fn(params, imgs, idx))
        t0 = time.perf_counter()
        outs = [fn(params, imgs, idx) for _ in range(8)]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / 8
        print(f"prec={prec:14s} unroll={unroll}: {dt*1e3:7.1f} ms/batch "
              f"{B/dt:7.1f} expl/s")
        return out
    finally:
        jax.lax.scan = orig_scan
        vit_mod.jax.lax.scan = orig_scan


base = run("bfloat16", 1)
for u in (2, 4, 12):
    out = run("bfloat16", u)
    print("   max|diff| vs unroll=1:", np.abs(out - base).max())
run("tensorfloat32", 1)
run("tensorfloat32", 4)
run("tensorfloat32", 12)
run("float32", 1)
run("float32", 12)
