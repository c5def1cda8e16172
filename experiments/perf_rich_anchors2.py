"""A/B round-3 anchor extensions on the real chip — INTERLEAVED.

Methodology note (learned the hard way): sequential measurements in
separate processes drift with relay conditions by up to ~35% (a rich0
baseline measured 206 expl/s in one process and 284 in the next with
identical settings). Every A/B here therefore compiles ALL variants first
and interleaves timing reps within one process; only within-run deltas are
meaningful.

  * BERT rich anchors through the fused layer kernels, S=512 B=8 and
    S=128 B=96 (production mode): off vs slim (qkv_pre/ctx/dense_nb) vs
    fat (+dots/probs) vs slim+mlp. Outputs must be bitwise equal.
  * ViT exact-f32 XLA-path anchors (TE_TPU_RICH_XLA): B=64, off vs on;
    outputs must be bitwise equal. (Measured speed-neutral — that mode is
    bandwidth/VPU-bound; PERF.md round 3c.)

Results dumped incrementally to /tmp/perf_rich_anchors2.json."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import os
import time

import numpy as np

OUT = "/tmp/perf_rich_anchors2.json"
results = {}


def record(k, v):
    results[k] = v
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(k, v, flush=True)


def interleave(fns, call, B, n_iter, reps=3):
    """fns: {name: fn}. Returns {name: [rate per rep]} + bitwise check."""
    rates = {n: [] for n in fns}
    outs = {}
    for _ in range(reps):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            res = [call(fn) for _ in range(n_iter)]
            for o in res:
                np.asarray(o)
            rates[name].append(round(B * n_iter / (time.perf_counter() - t0),
                                     1))
            outs[name] = np.asarray(call(fn))
    base = next(iter(outs))
    diffs = {n: float(np.abs(outs[n] - outs[base]).max()) for n in outs}
    return rates, diffs


def bench_bert(S, B, variants, reps):
    import jax
    import jax.numpy as jnp
    from transformer_explainability_tpu.models.bert import (BertConfig,
                                                            init_params)
    from transformer_explainability_tpu.explain.bert_generator import (
        make_explain_fn)
    cfg = BertConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)), jnp.int32)
    mask = np.ones((B, S), np.float32)
    mask[min(1, B - 1), (3 * S) // 5:] = 0
    mask = jnp.asarray(mask)
    idx = jnp.asarray(rng.randint(0, cfg.num_labels, B), jnp.int32)

    env = {"off": ("0", "0", "0"), "slim": ("1", "0", "0"),
           "fat": ("1", "1", "0"), "slim+mlp": ("1", "0", "1")}
    fns = {}
    for name in variants:
        a, p, m = env[name]
        os.environ["TE_TPU_RICH_ANCHORS"] = a
        os.environ["TE_TPU_RICH_PROBS"] = p
        os.environ["TE_TPU_RICH_MLP"] = m
        fn = make_explain_fn(cfg, "transformer_attribution",
                             matmul_precision="tensorfloat32",
                             relprop_precision="bfloat16",
                             attn_precision="float32",
                             mlp_precision="bfloat16")
        np.asarray(fn(params, ids, mask, idx))          # compile
        fns[name] = fn
    n_iter = max(4, int(np.ceil((128 if S >= 384 else 256) / B)))
    rates, diffs = interleave(fns, lambda f: f(params, ids, mask, idx), B,
                              n_iter, reps)
    record(f"bert-S{S}-B{B}", {"rates": rates, "max_abs_vs_first": diffs})


def bench_vit_f32(B, reps):
    import jax
    import jax.numpy as jnp
    from transformer_explainability_tpu.models.vit import (VIT_BASE_16_224,
                                                           init_params)
    from transformer_explainability_tpu.explain.generator import (
        make_explain_fn)
    cfg = VIT_BASE_16_224
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 1000, B), jnp.int32)
    fns = {}
    for name, flag in [("off", "0"), ("xla-anchors", "1")]:
        os.environ["TE_TPU_RICH_ANCHORS"] = flag
        os.environ["TE_TPU_RICH_XLA"] = flag
        fn = make_explain_fn(cfg, "transformer_attribution",
                             matmul_precision="float32")
        np.asarray(fn(params, imgs, idx))
        fns[name] = fn
    rates, diffs = interleave(fns, lambda f: f(params, imgs, idx), B,
                              max(4, int(np.ceil(256 / B))), reps)
    record(f"vit-f32-B{B}", {"rates": rates, "max_abs_vs_first": diffs})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bert", action="store_true")
    ap.add_argument("--skip-vit", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    import jax
    assert jax.default_backend() == "tpu", "run on the real chip"
    if not args.skip_bert:
        bench_bert(512, 8, ["off", "slim", "fat", "slim+mlp"], args.reps)
        bench_bert(128, 96, ["off", "slim"], args.reps)
    if not args.skip_vit:
        bench_vit_f32(64, args.reps)


if __name__ == "__main__":
    main()
