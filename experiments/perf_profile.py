"""Capture a jax.profiler trace of one explain batch (bf16) on the TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import glob
import gzip
import json
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

fn = make_explain_fn(cfg, matmul_precision="bfloat16")
np.asarray(fn(params, imgs, idx))  # compile + warm

outdir = "/tmp/jaxprof"
with jax.profiler.trace(outdir):
    for _ in range(3):
        np.asarray(fn(params, imgs, idx))

files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
xplane = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
print("xplane files:", xplane)

if files:
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    evs = [e for e in trace.get("traceEvents", [])
           if e.get("ph") == "X" and e.get("dur", 0) > 0]
    # aggregate by name over device-side tracks
    from collections import defaultdict
    agg = defaultdict(float)
    for e in evs:
        agg[e["name"]] += e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    tot = sum(agg.values())
    print(f"total traced op-time: {tot/1e3:.1f} ms")
    for name, dur in top:
        print(f"{dur/1e3:9.2f} ms  {100*dur/tot:5.1f}%  {name[:90]}")
