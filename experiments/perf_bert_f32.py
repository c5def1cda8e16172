"""f32 BERT S=512: give the exact-parity mode the ViT treatment
(VERDICT r3 weak #6 — 33.7 expl/s was noted in passing at B=8 and never
analyzed).

Levers probed, interleaved in one process:
  * batch (the tf32 mode's +65% lever was batch fill — never re-swept at
    f32);
  * the fused kernels at f32 (use_kernel=True -> in-kernel HIGHEST =
    bf16x6 Mosaic dots; the ViT verdict — XLA's pipelined HIGHEST beats
    the in-kernel 6-pass emulation — may not transfer at S^2-dominated
    shapes);
  * phase split (forward-only vs full) for a ceiling estimate.

Usage (TPU): python experiments/perf_bert_f32.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--kernel", action="store_true",
                    help="also try the fused kernels at f32 (extra compile)")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    from transformer_explainability_tpu.models.bert import (
        BertConfig, init_params)
    from transformer_explainability_tpu.explain.bert_generator import (
        make_explain_fn, explain_single)

    S = args.seq
    cfg = BertConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)

    def data(B):
        ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)), jnp.int32)
        mask = np.ones((B, S), np.float32)
        mask[0, S // 2:] = 0
        idx = jnp.asarray(rng.randint(0, cfg.num_labels, B), jnp.int32)
        return ids, jnp.asarray(mask), idx

    entries = {}
    f32 = make_explain_fn(cfg, "transformer_attribution",
                          matmul_precision="float32")
    for B in [int(b) for b in args.batches.split(",")]:
        entries[f"xla-f32/B{B}"] = (f32, data(B), B)
    if args.kernel:
        def kfn_single(p, i, m, x):
            return explain_single(p, i, m, x, cfg,
                                  matmul_precision="float32",
                                  use_kernel=True)
        kfn = jax.jit(jax.vmap(kfn_single, in_axes=(None, 0, 0, 0)))
        entries["kernel-f32/B8"] = (kfn, data(8), 8)
    # forward-only ceiling at the largest batch
    from transformer_explainability_tpu.models import bert as bert_mod
    Bmax = max(int(b) for b in args.batches.split(","))

    def fwd_single(p, i, m):
        with jax.default_matmul_precision("float32"):
            return bert_mod.forward(p, i, m, cfg)
    fwd = jax.jit(jax.vmap(fwd_single, in_axes=(None, 0, 0)))
    ids, mask, _ = data(Bmax)
    entries[f"fwd-only-f32/B{Bmax}"] = (
        lambda p, i, m, x: fwd(p, i, m), data(Bmax), Bmax)

    ok = {}
    for name, (fn, d, B) in entries.items():
        t0 = time.perf_counter()
        try:
            np.asarray(fn(params, *d))
            print(f"compiled {name} in {time.perf_counter() - t0:.0f}s",
                  flush=True)
            ok[name] = (fn, d, B)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}", flush=True)
            print(str(e)[:4000], flush=True)

    rates = {k: [] for k in ok}
    for _ in range(args.reps):
        for name, (fn, d, B) in ok.items():
            n_iter = max(2, int(np.ceil(64 / B)))
            t0 = time.perf_counter()
            outs = [fn(params, *d) for _ in range(n_iter)]
            for o in outs:
                np.asarray(o)
            rates[name].append(B * n_iter / (time.perf_counter() - t0))
    for name, r in rates.items():
        print(f"{name:18s} {float(np.median(r)):8.1f} expl/s  "
              f"reps={[round(x, 1) for x in r]}", flush=True)


if __name__ == "__main__":
    main()
