"""Diagnose the large-batch relay compile failures (VERDICT r3 weak #5).

ViT-B B=112 (rich megakernel path) and ViT-L B>=48 fail with an opaque
"HTTP 500 tpu_compile_helper subprocess exit code 1" — but the 500 body
carries the real XLA diagnostic (CLAUDE.md). This script compiles the
failing configs one at a time and prints the FULL exception text (8000
chars), then, if the root cause is identifiable (scoped-VMEM cap, HBM OOM,
register spill), tries the obvious mitigations.

Usage (TPU, serial with other relay work):
    python experiments/perf_batch_wall.py [--configs vitb112,vitl48]
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


def try_config(name, cfg, B, env=None, rate_too=False):
    from transformer_explainability_tpu.models.vit import init_params
    from transformer_explainability_tpu.explain.generator import make_explain_fn
    old = {}
    if env:
        old = {k: _os.environ.get(k) for k in env}
        _os.environ.update(env)
    try:
        params = init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, cfg.num_classes, B), jnp.int32)
        fn = make_explain_fn(cfg, "transformer_attribution", **PROD)
        t0 = time.perf_counter()
        out = np.asarray(fn(params, imgs, idx))
        dt = time.perf_counter() - t0
        print(f"[{name}] COMPILES ({dt:.0f}s), finite={np.isfinite(out).all()}",
              flush=True)
        if rate_too:
            n_iter = max(2, int(np.ceil(128 / B)))
            rates = []
            for _ in range(5):
                t0 = time.perf_counter()
                outs = [fn(params, imgs, idx) for _ in range(n_iter)]
                for o in outs:
                    np.asarray(o)
                rates.append(B * n_iter / (time.perf_counter() - t0))
            print(f"[{name}] median {np.median(rates):.1f} expl/s "
                  f"(reps {[round(r, 1) for r in rates]})", flush=True)
        return True
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}", flush=True)
        print(str(e)[:8000], flush=True)
        return False
    finally:
        for k, v in old.items():
            if v is None:
                _os.environ.pop(k, None)
            else:
                _os.environ[k] = v


def main():
    from transformer_explainability_tpu.models.registry import VIT_CONFIGS
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="vitb112,vitl48")
    args = ap.parse_args()
    vit_b = VIT_CONFIGS["vit_base_patch16_224"]
    vit_l = VIT_CONFIGS["vit_large_patch16_224"]
    table = {
        "vitb104": lambda: try_config("vit_b B=104", vit_b, 104,
                                      rate_too=True),
        "vitb112": lambda: try_config("vit_b B=112", vit_b, 112,
                                      rate_too=True),
        "vitb128": lambda: try_config("vit_b B=128", vit_b, 128,
                                      rate_too=True),
        "vitl48": lambda: try_config("vit_l B=48", vit_l, 48, rate_too=True),
        # mitigation probes (run on demand once the 500 body names a cause)
        "vitb112-noanchor": lambda: try_config(
            "vit_b B=112 anchors-off", vit_b, 112,
            env={"TE_TPU_RICH_ANCHORS": "0"}, rate_too=True),
        "vitb112-nomlp": lambda: try_config(
            "vit_b B=112 mlp-anchors-off", vit_b, 112,
            env={"TE_TPU_RICH_MLP": "0"}, rate_too=True),
    }
    for c in args.configs.split(","):
        table[c]()


if __name__ == "__main__":
    main()
