"""Measure the TP explain path's throughput cost (VERDICT r3 weak #4).

The whole-block megakernels are single-device-only under the model axis
(parallel/tensor.py): the TP program keeps the smaller Pallas ATTENTION
cores (shard_map over head slices) but runs the MLP half + rule tails in
XLA. This quantifies that trade on the REAL chip at n_model=1 (trivial
psums — the same program structure TP>1 runs per device, so the per-device
rate is the honest cliff measurement available on one chip), interleaved
in one process against:

  * the single-device production program (megakernels), and
  * the dp shard_map program on a 1-device mesh (isolates the shard_map
    wrapping cost from the megakernel loss).

Usage (TPU): python experiments/perf_tp_cost.py [--batch 32]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

PROD = dict(matmul_precision="tensorfloat32", relprop_precision="bfloat16",
            attn_precision="float32", mlp_precision="bfloat16")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224 as cfg, init_params)
    from transformer_explainability_tpu.explain.generator import make_explain_fn
    from transformer_explainability_tpu.parallel.mesh import (
        make_mesh, shard_params, make_sharded_explain_fn)
    from transformer_explainability_tpu.parallel.tensor import (
        make_tp_explain_fn, tp_reshuffle_params)

    B = args.batch
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, cfg.num_classes, B), jnp.int32)

    mesh = make_mesh(n_data=1, n_model=1)
    entries = {}
    fn1 = make_explain_fn(cfg, "transformer_attribution", **PROD)
    entries["single(megakernels)"] = (fn1, (params, imgs, idx))
    sp = shard_params(params, mesh, cfg=cfg)
    fn2 = make_sharded_explain_fn(cfg, mesh, **PROD)
    entries["dp1-shardmap(megakernels)"] = (fn2, (sp, imgs, idx))
    tpp = tp_reshuffle_params(params, 1)
    fn3 = make_tp_explain_fn(cfg, mesh, **PROD)
    entries["tp1(attn+mlp-kernels)"] = (fn3, (tpp, imgs, idx))
    # round-4 history rows: the islands-but-XLA-MLP state and the
    # no-islands state (ambient tf32 on every rule + MLP dot)
    fn3_xla = make_tp_explain_fn(cfg, mesh, mlp_kernel=False, **PROD)
    entries["tp1-xla-mlp(islands)"] = (fn3_xla, (tpp, imgs, idx))
    fn3_old = make_tp_explain_fn(cfg, mesh, mlp_kernel=False,
                                 matmul_precision=PROD["matmul_precision"],
                                 attn_precision=PROD["attn_precision"])
    entries["tp1-no-islands(r4b)"] = (fn3_old, (tpp, imgs, idx))

    for name, (fn, a) in entries.items():
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        print(f"compiled {name} in {time.perf_counter() - t0:.0f}s",
              flush=True)

    n_iter = max(2, int(np.ceil(128 / B)))
    rates = {k: [] for k in entries}
    for _ in range(args.reps):
        for name, (fn, a) in entries.items():
            t0 = time.perf_counter()
            outs = [fn(*a) for _ in range(n_iter)]
            for o in outs:
                np.asarray(o)
            rates[name].append(B * n_iter / (time.perf_counter() - t0))
    base = None
    for name, r in rates.items():
        med = float(np.median(r))
        if base is None:
            base = med
        print(f"{name:28s} {med:7.1f} expl/s  ({med / base * 100:.0f}% of "
              f"single-device)  reps={[round(x, 1) for x in r]}", flush=True)
    # numerical sanity: all three agree on the headline samples
    h1 = np.asarray(fn1(params, imgs, idx))
    h3 = np.asarray(fn3(tpp, imgs, idx))
    c = np.corrcoef(h1.ravel(), h3.ravel())[0, 1]
    print(f"tp1-vs-single heatmap corr {c:.6f}", flush=True)


if __name__ == "__main__":
    main()
