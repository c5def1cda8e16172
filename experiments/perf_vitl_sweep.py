"""ViT-L explain operating-point sweep on the real chip — INTERLEAVED.

Round 2 measured ViT-L at 121 expl/s (B=32) but that point predates both
the rich forward anchors (round 3b/3c, default-on) and the batch
re-sweep lesson from BERT (round 3c: the per-sample kernel grid at small
B under-fills the chip).  This sweep compiles every batch variant in one
process and alternates timing reps (relay throughput drifts up to ~35%
across processes — see experiments/perf_rich_anchors2.py), then A/Bs
anchors off/on at the best batch.

Results dumped incrementally to /tmp/perf_vitl_sweep.json.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import os
import time

import numpy as np

OUT = "/tmp/perf_vitl_sweep.json"
results = {}


def record(k, v):
    results[k] = v
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(k, v, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32,48,64")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--samples", type=int, default=192,
                    help="approx samples per timing rep")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    assert jax.default_backend() == "tpu", "run on the real chip"
    from transformer_explainability_tpu.models.vit import (VIT_LARGE_16_224,
                                                           init_params)
    from transformer_explainability_tpu.explain.generator import (
        make_explain_fn)

    cfg = VIT_LARGE_16_224
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)

    def build(B, rich):
        os.environ["TE_TPU_RICH_ANCHORS"] = "1" if rich else "0"
        fn = make_explain_fn(cfg, "transformer_attribution",
                             matmul_precision="tensorfloat32",
                             relprop_precision="bfloat16",
                             attn_precision="float32",
                             mlp_precision="bfloat16")
        imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 1000, B), jnp.int32)
        t0 = time.perf_counter()
        out0 = np.asarray(fn(params, imgs, idx))
        record(f"compile-B{B}-rich{int(rich)}",
               round(time.perf_counter() - t0, 1))
        return fn, imgs, idx, out0

    # --- batch sweep, anchors on (the shipped default) -------------------
    variants = {}
    for B in [int(b) for b in args.batches.split(",") if b]:
        try:
            variants[B] = build(B, True)
        except Exception as e:  # OOM / compile-helper failure: record, go on
            record(f"fail-B{B}", str(e)[:600])
    rates = {B: [] for B in variants}
    for _ in range(args.reps):
        for B, (fn, imgs, idx, _) in variants.items():
            n_iter = max(2, int(np.ceil(args.samples / B)))
            t0 = time.perf_counter()
            res = [fn(params, imgs, idx) for _ in range(n_iter)]
            for o in res:
                np.asarray(o)
            rates[B].append(round(B * n_iter / (time.perf_counter() - t0), 1))
    record("batch-sweep-rich1", {str(B): r for B, r in rates.items()})

    best = max(rates, key=lambda B: np.median(rates[B]))
    record("best-batch", best)

    # --- anchors off vs on at the best batch, interleaved ----------------
    fn_on, imgs, idx, out_on = variants[best]
    try:
        fn_off, _, _, _ = build(best, False)
    except Exception as e:
        record("fail-rich0", str(e)[:600])
        return
    out_off = np.asarray(fn_off(params, imgs, idx))
    record("anchor-bitwise-max-abs-diff",
           float(np.abs(out_on - out_off).max()))
    ab = {"off": [], "on": []}
    n_iter = max(2, int(np.ceil(args.samples / best)))
    for _ in range(args.reps):
        for name, fn in [("off", fn_off), ("on", fn_on)]:
            t0 = time.perf_counter()
            res = [fn(params, imgs, idx) for _ in range(n_iter)]
            for o in res:
                np.asarray(o)
            ab[name].append(round(best * n_iter / (time.perf_counter() - t0),
                                  1))
    record(f"anchors-ab-B{best}", ab)


if __name__ == "__main__":
    main()
