"""A/B the rich-anchor megakernel path (round 3): production mode with
TE_TPU_RICH_ANCHORS=0 vs 1 — throughput at B=96/64 and per-sample corr vs
the committed f64 ground truth (experiments/data/fidelity_truth.npz).

The rich path saves qkv_pre/proj_pre/dots/probs from the forward kernel so
the reverse kernel skips those recomputes (~17% of its MXU passes)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import os
import time

import numpy as np

TRUTH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments", "data", "fidelity_truth.npz")
OUT = "/tmp/perf_rich_anchors.json"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="96,64")
    ap.add_argument("--modes", default="prod")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from transformer_explainability_tpu.models.vit import (VIT_BASE_16_224,
                                                           init_params)
    from transformer_explainability_tpu.explain.generator import (
        make_explain_fn, PRECISION_PRESETS)

    cfg = VIT_BASE_16_224
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    d = np.load(TRUTH)
    t_imgs, t_idx, truth = d["imgs"], d["idx"], d["truth"]

    results = {}

    def record(k, v):
        results[k] = v
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(k, v, flush=True)

    for mode in args.modes.split(","):
        for rich in ("0", "1", "1m"):
            os.environ["TE_TPU_RICH_ANCHORS"] = "1" if rich != "0" else "0"
            os.environ["TE_TPU_RICH_MLP"] = "1" if rich == "1m" else "0"
            fn = make_explain_fn(cfg, "transformer_attribution",
                                 **PRECISION_PRESETS[
                                     "production" if mode == "prod" else mode])
            for B in [int(b) for b in args.batches.split(",")]:
                imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
                idx = jnp.asarray(rng.randint(0, 1000, B), jnp.int32)
                np.asarray(fn(params, imgs, idx))
                n_iter = max(4, int(np.ceil(256 / B)))
                t0 = time.perf_counter()
                outs = [fn(params, imgs, idx) for _ in range(n_iter)]
                for o in outs:
                    np.asarray(o)
                rate = B * n_iter / (time.perf_counter() - t0)
                record(f"{mode}/rich{rich}/B{B}", round(rate, 1))

                # fidelity on the truth samples, padded to B (no new shape)
                n = t_imgs.shape[0]
                if n <= B:
                    pad = B - n
                    ip = np.concatenate(
                        [t_imgs, np.zeros((pad,) + t_imgs.shape[1:],
                                          np.float32)]) if pad else t_imgs
                    xp = np.concatenate([t_idx, np.zeros(pad, t_idx.dtype)]) \
                        if pad else t_idx
                    out = np.asarray(fn(params, jnp.asarray(ip),
                                        jnp.asarray(xp)))[:n]
                    corrs = []
                    for i in range(n):
                        a = out[i].astype(np.float64) - out[i].mean()
                        b = truth[i] - truth[i].mean()
                        corrs.append(float(
                            a @ b / np.sqrt((a @ a) * (b @ b))))
                    record(f"{mode}/rich{rich}/B{B}/fid", {
                        "median": round(float(np.median(corrs)), 5),
                        "mean": round(float(np.mean(corrs)), 5),
                        "min": round(float(np.min(corrs)), 5),
                        "catdog": round(corrs[-1], 5)})


if __name__ == "__main__":
    main()
