"""Quantify axon-relay per-call overhead vs on-chip compute.

Method: time (a) a trivial program, (b) forward at several batch sizes,
(c) many enqueued iterations vs few — if ms/batch is flat in batch size the
dispatch overhead dominates; if linear, compute dominates.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.models.vit import (
    VIT_BASE_16_224 as cfg, init_params)
from transformer_explainability_tpu.models import vit as vit_mod

params = init_params(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)


def timeit(fn, *args, n=16):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        np.asarray(o)
    return (time.perf_counter() - t0) / n


# (a) trivial program: measures pure dispatch+transfer overhead
x = jnp.zeros((8,), jnp.float32)
triv = jax.jit(lambda x: x + 1.0)
dt = timeit(triv, x, n=32)
print(f"trivial dispatch+sync: {dt*1e3:.2f} ms/call")

# (b) forward at several batch sizes
def make_fwd(B):
    imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
    @jax.jit
    def f(params, imgs):
        with jax.default_matmul_precision("bfloat16"):
            return jax.vmap(lambda im: vit_mod.forward(params, im, cfg))(imgs)
    return f, imgs

for B in (16, 32, 64, 128):
    f, imgs = make_fwd(B)
    dt = timeit(f, params, imgs, n=8)
    print(f"fwd B={B:4d}: {dt*1e3:7.1f} ms/batch  {B/dt:8.1f} img/s  "
          f"({dt/B*1e3:.3f} ms/img)")

# (c) single call vs pipelined train of calls (B=64)
f, imgs = make_fwd(64)
np.asarray(f(params, imgs))
t0 = time.perf_counter()
np.asarray(f(params, imgs))
one = time.perf_counter() - t0
print(f"fwd B=64 single call (sync each): {one*1e3:.1f} ms")

# (d) chain 4 forwards inside ONE jitted program — amortizes dispatch
@jax.jit
def f4(params, imgs):
    with jax.default_matmul_precision("bfloat16"):
        def body(c, _):
            out = jax.vmap(lambda im: vit_mod.forward(params, im, cfg))(
                imgs + c)
            return out.mean(), out.mean()
        c, outs = jax.lax.scan(body, 0.0, None, length=4)
        return outs
dt = timeit(f4, params, imgs, n=8)
print(f"4x fwd fused in one program: {dt*1e3:.1f} ms "
      f"=> {dt/4*1e3:.1f} ms per fwd ({64*4/dt:.0f} img/s)")
