"""Two throughput levers for the bench headline (round 4 continuation).

1. Pipeline depth: ``bench._rate_once`` enqueues ``n_iter`` batches and
   syncs once; at B=104 the default window is only n_iter=2, so the
   pipeline fill/drain (relay dispatch latency) is amortized over just two
   batches. Measure the steady-state rate vs n_iter in {2, 4, 8, 16},
   interleaved in one process (relay drift hits all depths alike).
2. B=108: round 4b named the B=112 wall (HBM, 123.58M over) and moved to
   104; 108 sits between and was never tried (per-sample footprint ~145M
   -> 108 needs ~580M less than 112). Compile it and, if it fits, A/B it
   against 104 interleaved at the best n_iter.

Usage (TPU, serial with other relay work):
    python experiments/perf_pipeline_depth.py [--skip-108]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

PROD = dict(matmul_precision="tensorfloat32", relprop_precision="bfloat16",
            attn_precision="float32", mlp_precision="bfloat16")


def rate_once(fn, args, B, n_iter):
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n_iter)]
    for o in outs:
        np.asarray(o)
    return B * n_iter / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-108", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224, init_params)
    from transformer_explainability_tpu.explain.generator import make_explain_fn

    cfg = VIT_BASE_16_224
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    fn = make_explain_fn(cfg, "transformer_attribution", **PROD)

    def make_args(B):
        imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, cfg.num_classes, B), jnp.int32)
        return (params, imgs, idx)

    results = {}

    # --- lever 1: pipeline depth at B=104 ---
    B = 104
    a104 = make_args(B)
    t0 = time.perf_counter()
    np.asarray(fn(*a104))
    print(f"# B=104 compile+first call {time.perf_counter() - t0:.0f}s",
          flush=True)
    depths = [2, 4, 8, 16]
    rates = {d: [] for d in depths}
    rate_once(fn, a104, B, 2)  # discard one warm rep after compile
    for _ in range(args.reps):
        for d in depths:
            rates[d].append(rate_once(fn, a104, B, d))
    for d in depths:
        med = float(np.median(rates[d]))
        results[f"b104_niter{d}"] = {
            "median": round(med, 1),
            "reps": [round(r, 1) for r in rates[d]]}
        print(f"B=104 n_iter={d}: median {med:.1f} expl/s "
              f"{[round(r, 1) for r in rates[d]]}", flush=True)

    # --- lever 2: B=108 ---
    if not args.skip_108:
        try:
            a108 = make_args(108)
            t0 = time.perf_counter()
            out = np.asarray(fn(*a108))
            print(f"# B=108 compiles ({time.perf_counter() - t0:.0f}s), "
                  f"finite={np.isfinite(out).all()}", flush=True)
            best_d = max(depths, key=lambda d: np.median(rates[d]))
            ab = {104: [], 108: []}
            rate_once(fn, a108, 108, 2)  # warm after program switch
            for _ in range(args.reps):
                ab[104].append(rate_once(fn, a104, 104, best_d))
                ab[108].append(rate_once(fn, a108, 108, best_d))
            for b in (104, 108):
                med = float(np.median(ab[b]))
                results[f"ab_b{b}_niter{best_d}"] = {
                    "median": round(med, 1),
                    "reps": [round(r, 1) for r in ab[b]]}
                print(f"A/B B={b} n_iter={best_d}: median {med:.1f} expl/s "
                      f"{[round(r, 1) for r in ab[b]]}", flush=True)
        except Exception as e:
            print(f"B=108 FAILED: {type(e).__name__}", flush=True)
            print(str(e)[:8000], flush=True)
            results["b108"] = "compile failed (see stdout)"

    out_path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "data", "perf_pipeline_depth.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
