"""Benchmark: ViT-B/16 class-specific explanations/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"parity_value", "parity_vs_baseline"}. ``value`` is the production
mixed-precision mode; ``parity_value`` is the exact-parity float32 mode (the
number the BASELINE "per-pixel fp32 tolerance" bar actually constrains).
Baseline target (BASELINE.md): >=500 transformer_attribution explanations/sec
per chip on TPU v5e; vs_baseline is value/500.

Method benched: the headline ``transformer_attribution`` — full forward +
attention-gradient backward + 12-block LRP relprop + rollout, batched, one
jitted program (random ViT-B/16 weights; the math/FLOPs are weight-agnostic).
"""
import json
import os
import sys
import time

import numpy as np


def _bench_mode(cfg, params, rng, precision, relprop_precision,
                attn_precision, batch_candidates, mlp_precision=None):
    """Best (batch, expl/s) over the candidate batch sizes for one
    precision mode."""
    import jax.numpy as jnp
    from transformer_explainability_tpu.explain.generator import make_explain_fn

    fn = make_explain_fn(cfg, method="transformer_attribution",
                         matmul_precision=precision,
                         relprop_precision=relprop_precision,
                         attn_precision=attn_precision,
                         mlp_precision=mlp_precision)
    best = None
    for B in batch_candidates:
        imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 1000, B), jnp.int32)
        try:
            np.asarray(fn(params, imgs, idx))  # warm-up + compile
            # timed runs, pipelined: dispatch every iteration first (XLA
            # dispatch is async), then sync once per result — overlaps the
            # relay's per-call latency with device compute. NOTE: on the
            # axon-relay backend block_until_ready does not sync, so the
            # host transfer is the sync point.
            n_iter = max(4, int(np.ceil(256 / B)))
            t0 = time.perf_counter()
            outs = [fn(params, imgs, idx) for _ in range(n_iter)]
            for out in outs:
                np.asarray(out)
            dt = time.perf_counter() - t0
            rate = B * n_iter / dt
            print(f"# [{precision}/{relprop_precision}] batch={B}: "
                  f"{rate:.1f} expl/s ({dt / n_iter * 1e3 / B:.2f} ms/expl)",
                  file=sys.stderr)
            if best is None or rate > best[1]:
                best = (B, rate)
        except Exception as e:  # OOM at large batch: fall through to smaller
            print(f"# batch={B} failed: {type(e).__name__}", file=sys.stderr)
            continue
    return best


def main():
    import jax
    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224, init_params)

    # Precision ladder (batch 64, this chip; see PERF.md). Production default:
    # the mixed near-parity point (tf32 fwd/bwd + bf16 LRP rules). The exact-
    # parity float32 mode is ALSO measured and reported as parity_value.
    precision = os.environ.get("BENCH_PRECISION", "tensorfloat32")
    relprop_precision = os.environ.get("BENCH_RELPROP_PRECISION", "bfloat16")
    if relprop_precision in ("", "none"):
        relprop_precision = None
    # the attention island (QK^T/AV + their backward) stays f32-HIGHEST by
    # default: vs-f64 ground truth it halves the rate of chaos-sample flips
    # at ~zero cost (the attention dots are a small FLOP share) — PERF.md
    attn_precision = os.environ.get("BENCH_ATTN_PRECISION", "float32")
    if attn_precision in ("", "none"):
        attn_precision = None
    # the fc1/fc2 fwd/bwd dots sit outside the attention-gradient chain and
    # tolerate 1-pass bf16: +34% throughput at unchanged median fidelity vs
    # f64 ground truth (PERF.md round 2c)
    mlp_precision = os.environ.get("BENCH_MLP_PRECISION", "bfloat16")
    if mlp_precision in ("", "none"):
        mlp_precision = None
    cfg = VIT_BASE_16_224
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)

    # 96 is the measured sweet spot with the megakernels (410.5 vs 401.5 at
    # 64, 407.5 at 128 — PERF.md); 64 stays as the fallback
    batch_candidates = [int(b) for b in
                        os.environ.get("BENCH_BATCHES", "96,64").split(",")]

    best = _bench_mode(cfg, params, rng, precision, relprop_precision,
                       attn_precision, batch_candidates,
                       mlp_precision=mlp_precision)
    if best is None:
        raise SystemExit("all batch sizes failed")
    B, rate = best

    # exact-parity float32 mode (skippable via BENCH_SKIP_PARITY=1); only
    # the production sweep's best batch size is re-run — each extra shape
    # costs a multi-minute compile on the relay
    parity = None
    if os.environ.get("BENCH_SKIP_PARITY", "") != "1":
        if (precision, relprop_precision, mlp_precision) == \
                ("float32", None, None):
            parity = best
        else:
            parity = _bench_mode(cfg, params, rng, "float32", None, None,
                                 [B])

    out = {
        "metric": "vit_b16_transformer_attribution_explanations_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "explanations/s",
        "vs_baseline": round(rate / 500.0, 4),
    }
    if parity is not None:
        out["parity_value"] = round(parity[1], 2)
        out["parity_vs_baseline"] = round(parity[1] / 500.0, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
