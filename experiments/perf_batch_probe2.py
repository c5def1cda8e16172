"""Round-4 batch probes above the previously-measured optima, interleaved:
ViT-L B=40 (the named HBM wall sits at B=48 needing 18.76G/15.75G; linear
anchor scaling puts B=40 at ~15.6G — just under), BERT S=512 B=64 and
S=128 B=192 (the round-3c sweep stopped at 48/128 without probing higher).

Usage (TPU): python experiments/perf_batch_probe2.py [--which vitl|bert512|bert128]
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


def interleave(entries, reps=5, target=128):
    for name, (fn, args, B) in entries.items():
        t0 = time.perf_counter()
        try:
            np.asarray(fn(*args))
            print(f"compiled {name} in {time.perf_counter() - t0:.0f}s",
                  flush=True)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}", flush=True)
            print(str(e)[:2500], flush=True)
            entries[name] = None
    live = {k: v for k, v in entries.items() if v is not None}
    rates = {k: [] for k in live}
    for _ in range(reps):
        for name, (fn, args, B) in live.items():
            n_iter = max(2, int(np.ceil(target / B)))
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(n_iter)]
            for o in outs:
                np.asarray(o)
            rates[name].append(B * n_iter / (time.perf_counter() - t0))
    for name, r in rates.items():
        print(f"{name:16s} median {float(np.median(r)):8.1f} expl/s "
              f"reps={[round(x, 1) for x in r]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="vitl,bert512,bert128")
    args = ap.parse_args()
    which = set(args.which.split(","))
    rng = np.random.RandomState(0)

    if "vitl" in which:
        from transformer_explainability_tpu.models.vit import (
            VIT_LARGE_16_224 as cfg, init_params)
        from transformer_explainability_tpu.explain.generator import (
            make_explain_fn)
        params = init_params(jax.random.PRNGKey(0), cfg)
        fn = make_explain_fn(cfg, "transformer_attribution", **PROD)
        entries = {}
        for B in (32, 40):
            imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
            idx = jnp.asarray(rng.randint(0, 1000, B), jnp.int32)
            entries[f"vit_l/B{B}"] = (fn, (params, imgs, idx), B)
        interleave(entries, target=64)

    if which & {"bert512", "bert128"}:
        from transformer_explainability_tpu.models.bert import (
            BertConfig, init_params as bert_init)
        from transformer_explainability_tpu.explain.bert_generator import (
            make_explain_fn as bert_fn)
        cfg = BertConfig()
        params = bert_init(jax.random.PRNGKey(0), cfg)
        fn = bert_fn(cfg, "transformer_attribution", **PROD)
        if "bert512" in which:
            entries = {}
            for B in (48, 64):
                ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, 512)),
                                  jnp.int32)
                mask = np.ones((B, 512), np.float32)
                mask[0, 256:] = 0
                idx = jnp.asarray(rng.randint(0, 2, B), jnp.int32)
                entries[f"bert512/B{B}"] = (
                    fn, (params, ids, jnp.asarray(mask), idx), B)
            interleave(entries, target=128)
        if "bert128" in which:
            entries = {}
            for B in (128, 192):
                ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, 128)),
                                  jnp.int32)
                mask = np.ones((B, 128), np.float32)
                mask[0, 64:] = 0
                idx = jnp.asarray(rng.randint(0, 2, B), jnp.int32)
                entries[f"bert128/B{B}"] = (
                    fn, (params, ids, jnp.asarray(mask), idx), B)
            interleave(entries, target=384)


if __name__ == "__main__":
    main()
