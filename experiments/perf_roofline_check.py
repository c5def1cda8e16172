"""Raw roofline check of the attached chip: HBM copy bandwidth + MXU matmul
rate, to calibrate what 'speed of light' means here."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=8):
    np.asarray(fn(*args)).ravel()[:1]
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        np.asarray(o).ravel()[:1]
    return (time.perf_counter() - t0) / n


# NOTE: np.asarray on the full output would time the host transfer; sync
# with a tiny slice transfer instead.
def sync_timeit(fn, *args, n=8):
    r = fn(*args)
    s = jnp.sum(r) if isinstance(r, jax.Array) else sum(jnp.sum(x) for x in r)
    float(s)
    @jax.jit
    def wrapped(*a):
        rr = fn(*a)
        return jnp.sum(rr)
    float(wrapped(*args))
    t0 = time.perf_counter()
    vals = [wrapped(*args) for _ in range(n)]
    for v in vals:
        float(v)
    return (time.perf_counter() - t0) / n


# HBM bandwidth: elementwise add over a big array (read+write ~ 2x bytes)
for mb in (256, 1024):
    x = jnp.zeros((mb * 1024 * 1024 // 4,), jnp.float32)
    f = jax.jit(lambda x: x * 1.0000001 + 1.0)
    dt = sync_timeit(f, x, n=8)
    gb = 2 * x.size * 4 / 1e9
    print(f"elementwise {mb}MB: {dt*1e3:7.2f} ms -> {gb/dt:6.1f} GB/s")

# reduce: read-only traffic
x = jnp.zeros((1024 * 1024 * 256 // 4,), jnp.float32)
f = jax.jit(lambda x: jnp.sum(x))
dt = sync_timeit(f, x, n=8)
print(f"reduce 256MB read: {dt*1e3:7.2f} ms -> {x.size*4/1e9/dt:6.1f} GB/s")

# MXU: big bf16 matmul
for M, K, N in ((4096, 4096, 4096), (8192, 8192, 8192)):
    a = jnp.zeros((M, K), jnp.bfloat16)
    b = jnp.zeros((K, N), jnp.bfloat16)
    f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
    dt = sync_timeit(f, a, b, n=8)
    fl = 2 * M * K * N
    print(f"matmul {M}x{K}x{N} bf16: {dt*1e3:7.2f} ms -> "
          f"{fl/dt/1e12:6.1f} TFLOP/s")

# f32 (highest) matmul rate
a = jnp.zeros((4096, 4096), jnp.float32)
f = jax.jit(lambda a, b: jnp.dot(a, b, precision="float32"))
dt = sync_timeit(f, a, a, n=8)
print(f"matmul 4096^3 f32-highest: {dt*1e3:7.2f} ms -> "
      f"{2*4096**3/dt/1e12:6.1f} TFLOP/s")
