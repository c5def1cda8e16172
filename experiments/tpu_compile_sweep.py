"""TPU compile-coverage sweep: every kernel-gated (model x precision mode)
combination of the explain path, compiled + run once on the real chip.

CPU tests (interpret-mode kernels) cannot catch hardware-only failures —
scoped-VMEM overflows, Mosaic layout/lowering rejections, register-spill
blowups — which gate on REAL shapes (e.g. the ViT-L D=1024 block-reverse
kernel needed a bigger VMEM cap than ViT-B; only a real compile showed it).
Run after kernel changes; ~2-4 min compile per fresh program.

Usage: python experiments/tpu_compile_sweep.py [--quick]
  --quick: ViT-B + BERT-512 only (the two shipped operating points).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

MODES = {
    # the shipped production default (bench.py)
    "prod": dict(matmul_precision="tensorfloat32",
                 relprop_precision="bfloat16",
                 attn_precision="float32", mlp_precision="bfloat16"),
    # fidelity-tolerant serving
    "bf16": dict(matmul_precision="bfloat16"),
    # exact parity
    "f32": dict(matmul_precision="float32"),
}


_OUT_PATH = "/tmp/tpu_compile_sweep.json"


def _record(results, key, val):
    """Incremental dump: a relay tunnel can die mid-sweep (observed:
    'Connection refused' after ~100 min) — never lose finished combos."""
    results[key] = val
    with open(_OUT_PATH, "w") as f:
        json.dump(results, f, indent=1)
    print(key, val, flush=True)


def run_vit(name, cfg, B, mode_names, results):
    from transformer_explainability_tpu.models.vit import init_params
    from transformer_explainability_tpu.explain.generator import make_explain_fn
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, cfg.num_classes, B), jnp.int32)
    for m in mode_names:
        key = f"{name}/{m}/B{B}"
        t0 = time.perf_counter()
        try:
            fn = make_explain_fn(cfg, "transformer_attribution", **MODES[m])
            out = np.asarray(fn(params, imgs, idx))
            ok = bool(np.isfinite(out).all())
            _record(results, key,
                    {"ok": ok, "compile_s": round(time.perf_counter() - t0, 1)})
        except Exception as e:
            _record(results, key, {"ok": False, "err": str(e)[:300]})


def run_bert(S, B, mode_names, results):
    from transformer_explainability_tpu.models.bert import BertConfig, init_params
    from transformer_explainability_tpu.explain.bert_generator import make_explain_fn
    cfg = BertConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)), jnp.int32)
    mask = np.ones((B, S), np.float32)
    mask[0, S // 2:] = 0
    mask = jnp.asarray(mask)
    idx = jnp.asarray(rng.randint(0, cfg.num_labels, B), jnp.int32)
    for m in mode_names:
        key = f"bert-S{S}/{m}/B{B}"
        t0 = time.perf_counter()
        try:
            fn = make_explain_fn(cfg, "transformer_attribution", **MODES[m])
            out = np.asarray(fn(params, ids, mask, idx))
            ok = bool(np.isfinite(out).all())
            _record(results, key,
                    {"ok": ok, "compile_s": round(time.perf_counter() - t0, 1)})
        except Exception as e:
            _record(results, key, {"ok": False, "err": str(e)[:300]})


def main():
    global _OUT_PATH
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=_OUT_PATH)
    args = ap.parse_args()
    _OUT_PATH = args.out
    assert jax.default_backend() == "tpu", "sweep must run on the real chip"

    from transformer_explainability_tpu.models.registry import VIT_CONFIGS
    results = {}
    if args.quick:
        run_vit("vit_b", VIT_CONFIGS["vit_base_patch16_224"], 8,
                ["prod"], results)
        run_bert(512, 8, ["prod"], results)
    else:
        run_vit("vit_b", VIT_CONFIGS["vit_base_patch16_224"], 8,
                ["prod", "bf16", "f32"], results)
        run_vit("vit_l", VIT_CONFIGS["vit_large_patch16_224"], 8,
                ["prod", "bf16", "f32"], results)
        run_vit("deit_dist", VIT_CONFIGS["deit_base_distilled_patch16_224"],
                8, ["prod"], results)
        run_bert(512, 8, ["prod", "bf16", "f32"], results)
        run_bert(128, 8, ["prod"], results)

    bad = {k: v for k, v in results.items() if not v["ok"]}
    print(f"\n{len(results) - len(bad)}/{len(results)} ok -> {args.out}")
    if bad:
        print("FAILURES:", json.dumps(bad, indent=1))
        raise SystemExit(1)


if __name__ == "__main__":
    main()
