"""Per-sample parity-class evidence on the committed f64 truth set.

bench.py's round-3 fidelity verdict compares MEAN corr-vs-truth of the
production mode against the exact-f32 path's mean on the fixed 17-sample
set — and the mean is a chaos-sample lottery (PERF.md round 2c). This
script dumps the PER-SAMPLE corrs for

  * prod       : tf32 + f32 attn island + bf16 rules/MLP (kernels on)
  * f32_xla    : exact f32, XLA ordering (the bench parity row)
  * f32_kernel : "f32", attention-kernel ordering (bf16x6 in-kernel
                 HIGHEST emulation — NOT exact f32; neither is f32_xla
                 on TPU, where XLA lowers f32 matmuls to bf16x6 MXU
                 passes. The exact-f32 members of the class live on CPU:
                 see perf_parity_class_cpu.py / _torch.py.)

Historical note (round 3d): the first run of this script called
explain_single(use_attn_kernel=True) WITHOUT
jax.default_matmul_precision — the XLA-side rule dots ran at the TPU's
bf16 default and the row came out 0.817 mean. explain_single now
self-applies the context; the committed json carries both rows.

Results to /tmp/perf_parity_class.json.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json

import numpy as np

TRUTH = _os.path.join(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))), "experiments", "data", "fidelity_truth.npz")
OUT = "/tmp/perf_parity_class.json"
results = {}


def record(k, v):
    results[k] = v
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(k, v, flush=True)


def corrs(out, truth):
    cs = []
    for i in range(truth.shape[0]):
        a = out[i].ravel().astype(np.float64)
        b = truth[i].ravel()
        a = a - a.mean()
        b = b - b.mean()
        cs.append(round(float(a @ b / np.sqrt((a @ a) * (b @ b))), 6))
    return cs


def main():
    import jax
    import jax.numpy as jnp
    assert jax.default_backend() == "tpu"
    from transformer_explainability_tpu.models.vit import (VIT_BASE_16_224,
                                                           init_params)
    from transformer_explainability_tpu.explain.generator import (
        make_explain_fn)
    cfg = VIT_BASE_16_224
    params = init_params(jax.random.PRNGKey(0), cfg)
    d = np.load(TRUTH)
    imgs, idx, truth = d["imgs"], d["idx"], d["truth"]
    n = imgs.shape[0]
    B = 96  # the bench production/parity batch (cached compiles)
    pad = B - n
    imgs_p = jnp.asarray(np.concatenate(
        [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)]))
    idx_p = jnp.asarray(np.concatenate([idx, np.zeros((pad,), idx.dtype)]))

    modes = {
        "prod": dict(matmul_precision="tensorfloat32",
                     relprop_precision="bfloat16",
                     attn_precision="float32", mlp_precision="bfloat16"),
        "f32_xla": dict(matmul_precision="float32"),
        # second exact-f32 ordering: the f32 attention-kernel path
        # (make_explain_fn doesn't expose use_attn_kernel — vmap the
        # single-sample entry point directly)
        "f32_kernel": dict(matmul_precision="float32",
                           use_attn_kernel=True),
    }
    outs = {}
    for name, kw in modes.items():
        try:
            if "use_attn_kernel" in kw:
                from functools import partial
                from transformer_explainability_tpu.explain.generator import (
                    explain_single)
                fn = jax.jit(jax.vmap(
                    partial(explain_single, cfg=cfg,
                            method="transformer_attribution", **kw),
                    in_axes=(None, 0, 0)))
            else:
                fn = make_explain_fn(cfg, "transformer_attribution", **kw)
            outs[name] = np.asarray(fn(params, imgs_p, idx_p))[:n]
            record(name, corrs(outs[name], truth))
        except Exception as e:
            record(f"fail-{name}", str(e)[:2000])

    if "f32_xla" in outs and "f32_kernel" in outs and "prod" in outs:
        cx = np.asarray(results["f32_xla"])
        ck = np.asarray(results["f32_kernel"])
        cp = np.asarray(results["prod"])
        record("summary", {
            "mean": {"prod": float(cp.mean()), "f32_xla": float(cx.mean()),
                     "f32_kernel": float(ck.mean())},
            "median": {"prod": float(np.median(cp)),
                       "f32_xla": float(np.median(cx)),
                       "f32_kernel": float(np.median(ck))},
            # per-sample drop of prod vs f32_xla, against the drop the
            # OTHER exact-f32 program shows vs the same anchor
            "prod_minus_f32xla": [round(float(v), 6) for v in cp - cx],
            "f32kernel_minus_f32xla": [round(float(v), 6) for v in ck - cx],
        })


if __name__ == "__main__":
    main()
