"""Roofline check v2: amortize the ~27ms relay call floor by looping the op
inside one jitted program (data-dependent chain, so XLA can't elide it)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

REPS = 50


def bench(make_fn, *args, n=4):
    f = jax.jit(make_fn)
    float(f(*args))
    t0 = time.perf_counter()
    vals = [f(*args) for _ in range(n)]
    for v in vals:
        float(v)
    dt = (time.perf_counter() - t0) / n
    return (dt - 0.027) / REPS          # subtract the call floor


# HBM bandwidth: chained elementwise over a big array
def ew_chain(x):
    def body(c, _):
        return c * 1.0000001 + 1.0, ()
    c, _ = jax.lax.scan(body, x, None, length=REPS)
    return jnp.sum(c[:1])

for mb in (256,):
    x = jnp.zeros((mb * 1024 * 1024 // 4,), jnp.float32)
    dt = bench(ew_chain, x)
    gb = 2 * x.size * 4 / 1e9
    print(f"elementwise {mb}MB: {dt*1e3:7.3f} ms/op -> {gb/dt:6.1f} GB/s")


def mm_chain(a, b):
    def body(c, _):
        return jnp.dot(c, b, preferred_element_type=jnp.bfloat16), ()
    c, _ = jax.lax.scan(body, a, None, length=REPS)
    return jnp.sum(c.astype(jnp.float32)[:1, :1])

for M in (2048, 4096):
    a = jnp.full((M, M), 0.001, jnp.bfloat16)
    dt = bench(mm_chain, a, a)
    print(f"matmul {M}^3 bf16: {dt*1e3:7.3f} ms/op -> "
          f"{2*M**3/dt/1e12:6.1f} TFLOP/s")


def mm_chain_f32(a, b):
    def body(c, _):
        return jnp.dot(c, b, precision="float32"), ()
    c, _ = jax.lax.scan(body, a, None, length=REPS)
    return jnp.sum(c[:1, :1])

a = jnp.full((2048, 2048), 0.001, jnp.float32)
dt = bench(mm_chain_f32, a, a)
print(f"matmul 2048^3 f32-highest: {dt*1e3:7.3f} ms/op -> "
      f"{2*2048**3/dt/1e12:6.1f} TFLOP/s")

a = jnp.full((2048, 2048), 0.001, jnp.float32)
def mm_chain_tf32(a, b):
    def body(c, _):
        return jnp.dot(c, b, precision="tensorfloat32"), ()
    c, _ = jax.lax.scan(body, a, None, length=REPS)
    return jnp.sum(c[:1, :1])
dt = bench(mm_chain_tf32, a, a)
print(f"matmul 2048^3 tf32: {dt*1e3:7.3f} ms/op -> "
      f"{2*2048**3/dt/1e12:6.1f} TFLOP/s")
