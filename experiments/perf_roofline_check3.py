"""Roofline check v3: measured chip peaks with enough reps that the relay
call floor is negligible (<1%), data-dependent chains so XLA cannot elide.

Records the numbers PERF.md's MFU claims are normalized against.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp


def bench(make_fn, reps, *args, n=3):
    f = jax.jit(make_fn)
    float(f(*args))                     # compile + warm
    t0 = time.perf_counter()
    vals = [f(*args) for _ in range(n)]
    for v in vals:
        float(v)
    dt = (time.perf_counter() - t0) / n
    return dt / reps


def mm_chain(reps, **dot_kwargs):
    def fn(a, b):
        def body(c, _):
            return jax.lax.dot(c, b, **dot_kwargs), ()
        c, _ = jax.lax.scan(body, a, None, length=reps)
        return jnp.sum(c.astype(jnp.float32)[:1, :1])
    return fn


def run_mm(M, dtype, reps, label, **kw):
    a = jnp.full((M, M), 0.001, dtype)
    dt = bench(mm_chain(reps, **kw), reps, a, a)
    print(f"matmul {M}^3 {label}: {dt*1e3:8.4f} ms/op -> "
          f"{2*M**3/dt/1e12:7.1f} TFLOP/s")
    return 2 * M**3 / dt / 1e12


# MXU peaks (the numbers MFU is normalized against)
bf16_peak = run_mm(4096, jnp.bfloat16, 400, "bf16",
                   preferred_element_type=jnp.bfloat16)
run_mm(8192, jnp.bfloat16, 100, "bf16", preferred_element_type=jnp.bfloat16)
run_mm(2048, jnp.bfloat16, 2000, "bf16", preferred_element_type=jnp.bfloat16)
run_mm(4096, jnp.float32, 200, "tf32", precision="tensorfloat32")
run_mm(4096, jnp.float32, 100, "f32-highest", precision="float32")

# explain-program-shaped dots: (n=256 rows like the padded token count)
for (m, k, n, reps) in ((256, 768, 768, 4000), (256, 768, 3072, 2000)):
    a = jnp.full((m, k), 0.001, jnp.bfloat16)
    b = jnp.full((k, n), 0.001, jnp.bfloat16)
    def fn(a, b, reps=reps, k=k, n=n):
        def body(c, _):
            o = jax.lax.dot(c, b, preferred_element_type=jnp.bfloat16)
            return o[:, :k], ()
        c, _ = jax.lax.scan(body, a, None, length=reps)
        return jnp.sum(c.astype(jnp.float32)[:1, :1])
    f = jax.jit(fn)
    float(f(a, b))
    t0 = time.perf_counter()
    vals = [f(a, b) for _ in range(3)]
    for v in vals:
        float(v)
    dt = (time.perf_counter() - t0) / 3 / reps
    print(f"matmul {m}x{k}x{n} bf16 (+slice): {dt*1e6:8.2f} us/op -> "
          f"{2*m*k*n/dt/1e12:7.1f} TFLOP/s")

# HBM bandwidth: big copy chain (read+write)
for mb in (512, 1024):
    x = jnp.zeros((mb * 1024 * 1024 // 4,), jnp.float32)
    reps = 100
    def ew(x, reps=reps):
        def body(c, _):
            return c * 1.0000001 + 1.0, ()
        c, _ = jax.lax.scan(body, x, None, length=reps)
        return jnp.sum(c[:1])
    dt = bench(ew, reps, x)
    gb = 2 * x.size * 4 / 1e9
    print(f"elementwise {mb}MB: {dt*1e3:8.4f} ms/op -> {gb/dt:7.1f} GB/s")
