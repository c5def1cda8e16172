"""Device trace of the SHIPPED production program at the round-4 operating
point (B=104, rich attn+MLP anchors, 16-batch steady state = 521 expl/s) —
refreshes the round-2e roofline numbers for the current program.

WARNING (round 4, measured the hard way): this hung before writing any
trace file and took the axon relay down for hours (jax.devices() hangs in
every new process until an external restart). jax.profiler over the relay
is hazardous — run with a small batch and ONE rep, under a timeout, and
only when losing the relay is acceptable (CLAUDE.md).

Usage (TPU): python experiments/perf_profile_r4.py [--batch 104]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import glob
import gzip
import json
import re
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

PROD = dict(matmul_precision="tensorfloat32", relprop_precision="bfloat16",
            attn_precision="float32", mlp_precision="bfloat16")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=104)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"
    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224 as cfg, init_params)
    from transformer_explainability_tpu.explain.generator import make_explain_fn

    B = args.batch
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 1000, B), jnp.int32)
    fn = make_explain_fn(cfg, "transformer_attribution", **PROD)
    np.asarray(fn(params, imgs, idx))  # compile + warm

    outdir = "/tmp/jaxprof_r4"
    with jax.profiler.trace(outdir):
        outs = [fn(params, imgs, idx) for _ in range(4)]
        for o in outs:
            np.asarray(o)

    files = sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    evs = trace["traceEvents"]
    pids = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}

    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        if name.startswith("while"):
            continue
        agg[name] += e.get("dur", 0)
        cnt[name] += 1

    def cat(name):
        if "custom-call" in name or "tpu_custom_call" in name:
            return "pallas kernels"
        if re.search(r"convolution|dot|matmul", name):
            return "MXU (dot/conv, XLA)"
        if re.search(r"copy|bitcast|transpose|dynamic-update|dynamic-slice",
                     name):
            return "data movement"
        if re.search(r"reduce", name):
            return "reduce"
        if re.search(r"fusion", name):
            return "elementwise fusions"
        return "other"

    by_cat = defaultdict(float)
    for name, dur in agg.items():
        by_cat[cat(name)] += dur
    tot = sum(by_cat.values())
    n_reps = 4
    print(f"device op-time per batch (B={B}): {tot / 1e3 / n_reps:.1f} ms "
          f"-> {B * n_reps / (tot / 1e6):.1f} expl/s device-side")
    for c, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {c:24s} {dur / 1e3 / n_reps:7.2f} ms/batch "
              f"({100 * dur / tot:.1f}%)")
    print("\ntop 12 ops:")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {dur / 1e3 / n_reps:8.2f} ms/batch x{cnt[name] // n_reps:4d}"
              f"  {name[:90]}")


if __name__ == "__main__":
    main()
