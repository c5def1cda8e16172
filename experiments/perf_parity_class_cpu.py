"""Second exact-f32 ordering for the parity-class criterion: CPU XLA.

The TPU attention-kernel "f32" path is bf16x6 *emulated* f32 (round 2d),
so it is not a member of the exact-f32 equivalence class (measured: mean
0.817 vs truth on the 17-sample set — chaos samples collapse). The only
other EXACT f32 ordering available offline is this same program compiled
by XLA:CPU — identical math, different tiling/reassociation. Its
per-sample corr vs the committed f64 truth quantifies how much two exact
f32 programs legitimately spread on each sample.

Runs fully on CPU (no relay). Results to /tmp/perf_parity_class_cpu.json.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json

import numpy as np

TRUTH = _os.path.join(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))), "experiments", "data", "fidelity_truth.npz")
OUT = "/tmp/perf_parity_class_cpu.json"


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from transformer_explainability_tpu.models.vit import (VIT_BASE_16_224,
                                                           init_params)
    from transformer_explainability_tpu.explain.generator import (
        make_explain_fn)
    cfg = VIT_BASE_16_224
    params = init_params(jax.random.PRNGKey(0), cfg)
    d = np.load(TRUTH)
    imgs, idx, truth = d["imgs"], d["idx"], d["truth"]
    fn = make_explain_fn(cfg, "transformer_attribution",
                         matmul_precision="float32")
    out = np.asarray(fn(params, jnp.asarray(imgs), jnp.asarray(idx)))
    cs = []
    for i in range(truth.shape[0]):
        a = out[i].ravel().astype(np.float64)
        b = truth[i].ravel()
        a = a - a.mean()
        b = b - b.mean()
        cs.append(round(float(a @ b / np.sqrt((a @ a) * (b @ b))), 6))
    res = {"f32_cpu": cs, "mean": float(np.mean(cs)),
           "median": float(np.median(cs))}
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(res, flush=True)


if __name__ == "__main__":
    main()
