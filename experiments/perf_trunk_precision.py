"""Fwd-trunk vs reverse-side MLP precision ladder (round 3).

With FULL rich anchors (attn + MLP) the reverse megakernel consumes saved
linearization points and never recomputes a forward dot, so the forward
fc1/fc2 precision (the trunk quality every anchor inherits) and the
reverse-side fc precision (the backward-gradient dots) decouple — each can
be swept independently without the round-2b anchor-consistency constraint.

Question: which side drives the chaos-sample flips that keep the production
mode's mean corr-vs-f64 slightly below the exact-f32 path's own mean
(BENCH r3 head run: 0.9916 vs 0.9943 on n=17)? Measures throughput AND
per-sample corr vs f64 CPU truth for each (fwd, bwd) combination.

Usage:
    python experiments/perf_trunk_precision.py \
        [--truth /tmp/fidelity_truth64.npz] [--batches 64]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import os
import time

import numpy as np

DEFAULT_TRUTH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments", "data", "fidelity_truth.npz")
OUT = "/tmp/perf_trunk_precision.json"

# (name, mlp_fwd, mlp_bwd) on the production base
LADDER = [
    ("bf16/bf16", "bfloat16", "bfloat16"),      # shipped round-2c default
    ("tf32/bf16", "tensorfloat32", "bfloat16"),  # trunk up
    ("bf16/tf32", "bfloat16", "tensorfloat32"),  # backward up
    ("tf32/tf32", "tensorfloat32", "tensorfloat32"),  # round-2b default
    ("f32", None, None),                         # exact-f32 floor reference
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--truth", default=DEFAULT_TRUTH)
    ap.add_argument("--batches", default="64")
    ap.add_argument("--modes", default=",".join(m for m, _, _ in LADDER))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from transformer_explainability_tpu.models.vit import (VIT_BASE_16_224,
                                                           init_params)
    from transformer_explainability_tpu.explain.generator import make_explain_fn

    cfg = VIT_BASE_16_224
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    d = np.load(args.truth)
    t_imgs, t_idx, truth = d["imgs"], d["idx"], d["truth"]

    results = {}

    def record(k, v):
        results[k] = v
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(k, v, flush=True)

    want = set(args.modes.split(","))
    for name, fwd, bwd in LADDER:
        if name not in want:
            continue
        if name == "f32":
            fn = make_explain_fn(cfg, "transformer_attribution",
                                 matmul_precision="float32")
        else:
            fn = make_explain_fn(cfg, "transformer_attribution",
                                 matmul_precision="tensorfloat32",
                                 relprop_precision="bfloat16",
                                 attn_precision="float32",
                                 mlp_fwd_precision=fwd,
                                 mlp_bwd_precision=bwd)
        for B in [int(b) for b in args.batches.split(",")]:
            imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
            idx = jnp.asarray(rng.randint(0, 1000, B), jnp.int32)
            np.asarray(fn(params, imgs, idx))
            n_iter = max(4, int(np.ceil(256 / B)))
            t0 = time.perf_counter()
            outs = [fn(params, imgs, idx) for _ in range(n_iter)]
            for o in outs:
                np.asarray(o)
            record(f"{name}/B{B}", round(B * n_iter
                                         / (time.perf_counter() - t0), 1))

            # fidelity vs truth, in B-sized padded chunks (no new shapes)
            n = t_imgs.shape[0]
            corrs = []
            for s in range(0, n, B):
                chunk = slice(s, min(s + B, n))
                ci, cx = t_imgs[chunk], t_idx[chunk]
                pad = B - ci.shape[0]
                if pad:
                    ci = np.concatenate(
                        [ci, np.zeros((pad,) + ci.shape[1:], np.float32)])
                    cx = np.concatenate([cx, np.zeros(pad, cx.dtype)])
                out = np.asarray(fn(params, jnp.asarray(ci),
                                    jnp.asarray(cx)))[:min(B, n - s)]
                for i in range(out.shape[0]):
                    a = out[i].astype(np.float64) - out[i].mean()
                    b = truth[s + i] - truth[s + i].mean()
                    corrs.append(float(a @ b / np.sqrt((a @ a) * (b @ b))))
            corrs = np.asarray(corrs)
            record(f"{name}/B{B}/fid", {
                "median": round(float(np.median(corrs)), 5),
                "mean": round(float(corrs.mean()), 5),
                "min": round(float(corrs.min()), 5),
                "catdog": round(float(corrs[-1]), 5),
                "n_lt_0.9": int((corrs < 0.9).sum()),
                "n": int(corrs.size)})


if __name__ == "__main__":
    main()
