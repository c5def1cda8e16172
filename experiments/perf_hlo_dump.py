"""Dump optimized HLO of the explain program and print the hot fusions."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import re
import sys
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

prec = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
fn = make_explain_fn(cfg, matmul_precision=prec)
hlo = jax.jit(fn).lower(params, imgs, idx).compile().as_text()
open(f"/tmp/explain_{prec}.hlo", "w").write(hlo)
print("written /tmp/explain_%s.hlo, %d lines" % (prec, hlo.count("\n")))

# print the definition lines of requested fusions
want = sys.argv[2:] or ["fusion.576", "fusion.617", "fusion.615",
                        "fusion.635", "fusion.619", "fusion.636",
                        "fusion.618", "fusion.628", "fusion.627",
                        "fusion.616"]
for w in want:
    m = re.search(rf"^\s*%?{re.escape(w)} = .*$", hlo, re.M)
    if m:
        print("\n===", w)
        print(m.group(0)[:400])
