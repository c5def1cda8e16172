"""Chaos-detector selection for the guarded production mode (VERDICT r3 #1).

Runs the production-mode explain program WITH diagnostics
(generator.DIAG_FIELDS — conservation drift, amplification mass, per-block
cam norms) on:
  * the guarded tuning stress set (128 randn, seed 1 — guarded_truth.py),
  * the committed bench truth set (16 randn seed 0 + catdog,
    fidelity_truth.npz, f64 truth),
  * the realistic set (catdog + mild augmentations),
labels every sample with its corr vs exact truth, and evaluates each
candidate statistic as a detector: the threshold is placed at the lowest
value that flags EVERY sample with corr < CORR_GOAL (zero false negatives),
then the false-positive rate at that threshold is reported per set.

Usage (TPU):
    python experiments/guarded_detector.py            # measure + analyze
    python experiments/guarded_detector.py --analyze  # re-analyze cached
Writes experiments/data/guarded_detector.json (incremental; relay-safe).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json

import numpy as np

DATA = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "data")
TUNING = _os.path.join(DATA, "guarded_tuning.npz")
TRUTH = _os.path.join(DATA, "fidelity_truth.npz")
OUT = _os.path.join(DATA, "guarded_detector.json")

CORR_GOAL = 0.999    # the guarantee bar (VERDICT r3 #1)
B = 32


def _corr(a, b):
    a = a.astype(np.float64).ravel() - a.mean()
    b = b.astype(np.float64).ravel() - b.mean()
    return float(a @ b / np.sqrt((a @ a) * (b @ b)))


def measure():
    import jax
    import jax.numpy as jnp
    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224 as cfg, init_params)
    from transformer_explainability_tpu.explain.generator import (
        make_explain_fn, precision_kwargs, DIAG_FIELDS)

    params = init_params(jax.random.PRNGKey(0), cfg)
    fn = make_explain_fn(cfg, "transformer_attribution",
                         with_diagnostics=True,
                         **precision_kwargs("production"))

    tun = np.load(TUNING)
    tru = np.load(TRUTH)
    sets = {
        "stress_seed1": (tun["stress_imgs"], tun["stress_idx"],
                         tun["stress_truth"]),
        "bench_truth": (tru["imgs"], tru["idx"], tru["truth"]),
        "realistic": (tun["real_imgs"], tun["real_idx"], tun["real_truth"]),
    }
    rows = []
    for name, (imgs, idx, truth) in sets.items():
        n = len(imgs)
        for lo in range(0, n, B):
            hi = min(lo + B, n)
            pad = B - (hi - lo)
            im = np.concatenate([imgs[lo:hi]] + (
                [np.zeros((pad,) + imgs.shape[1:], imgs.dtype)] if pad else []))
            ix = np.concatenate([idx[lo:hi]] + (
                [np.zeros((pad,), idx.dtype)] if pad else []))
            heat, diag = fn(params, jnp.asarray(im), jnp.asarray(ix))
            heat = np.asarray(heat)[:hi - lo]
            diag = np.asarray(diag)[:hi - lo]
            for j in range(hi - lo):
                rows.append({
                    "set": name, "i": lo + j,
                    "corr": round(_corr(heat[j], truth[lo + j]), 6),
                    **{f: float(diag[j, k])
                       for k, f in enumerate(DIAG_FIELDS)}})
            with open(OUT, "w") as f:          # incremental (relay-safe)
                json.dump(rows, f)
            print(f"{name}: {hi}/{n}", flush=True)
    return rows


def analyze(rows):
    """Trust-region framing (round 4): the detector's job is to flag every
    stress sample whose TPU production corr can fall below CORR_GOAL while
    flagging ~no real-image samples — the guarantee is 'flagged -> exact
    CPU recompute; unflagged -> inside the validated envelope'. For each
    statistic we report the zero-FN threshold over stress-bad, the flag
    rates, the gap to the realistic population, and — the honest residual
    — realistic-set samples below the goal that the statistic misses."""
    from transformer_explainability_tpu.explain.generator import DIAG_FIELDS

    def spearman(xs, ys):
        rx = np.argsort(np.argsort(xs)).astype(float)
        ry = np.argsort(np.argsort(ys)).astype(float)
        return float(np.corrcoef(rx, ry)[0, 1])

    stress = [r for r in rows if r["set"] in ("stress_seed1", "bench_truth")]
    real = [r for r in rows if r["set"] == "realistic"]
    bad = [r for r in stress if r["corr"] < CORR_GOAL]
    real_bad = [r for r in real if r["corr"] < CORR_GOAL]
    print(f"stress n={len(stress)}  bad(corr<{CORR_GOAL}): {len(bad)} "
          f"({100 * len(bad) / len(stress):.1f}%)  "
          f"min corr {min(r['corr'] for r in stress):.5f}")
    print(f"realistic n={len(real)}  bad: {len(real_bad)}  min corr "
          f"{min(r['corr'] for r in real):.5f}")
    cands = {f: (lambda r, f=f: abs(r[f])) for f in DIAG_FIELDS
             if f in rows[0]}
    cands["r_drift"] = lambda r: abs(r["r_sum"] - 1.0)
    infid = [1 - r["corr"] for r in stress]
    for name, stat in cands.items():
        tau = min(stat(r) for r in bad)    # zero-FN over stress-bad
        fp_s = sum(stat(r) >= tau for r in stress if r["corr"] >= CORR_GOAL)
        fl_r = sum(stat(r) >= tau for r in real)
        real_max = max(stat(r) for r in real)
        missed_rb = sum(stat(r) < tau for r in real_bad)
        rho = spearman([stat(r) for r in stress], infid)
        print(f"{name:10s} rho={rho:+.2f} tau(zeroFN)={tau:.4g} "
              f"gap(tau/realistic_max)={tau / max(real_max, 1e-30):.3g} "
              f"flags stress-good {fp_s}/{len(stress) - len(bad)} "
              f"realistic {fl_r}/{len(real)} "
              f"(missed realistic-bad {missed_rb}/{len(real_bad)})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--analyze", action="store_true")
    args = ap.parse_args()
    if args.analyze and _os.path.exists(OUT):
        rows = json.load(open(OUT))
    else:
        rows = measure()
    analyze(rows)


if __name__ == "__main__":
    main()
