"""Fix the envelope false-positive economics (round 4d).

BENCH_r4d's realistic batch (catdog x uniform(0.9,1.1) + 0.02 noise) drew
1/32 envelope flags, and each flag costs a ~2.1 s exact-CPU fallback — one
benign false positive per batch destroys the "<=10% option". The committed
bounds came from 96 augments at margin 1.3; a min/max envelope on a finite
calibration sample has a natural FP rate on fresh benign draws.

This script measures the diagnostics (TPU, production preset) for:
  * calib2   — an ENLARGED calibration population (the committed 96-augment
               family + a second seed + the bench's own augment family);
  * holdout  — fresh benign draws NOT used for calibration (both families,
               new seeds) — the FP measurement;
  * stress   — the 128 randn tuning samples + the 17-sample truth set
               (the population the envelope exists to flag);
and evaluates margins 1.2/1.3/1.5/2.0/3.0: stress flag rate vs holdout FP
count. Prints the chosen ENVELOPE_BOUNDS (smallest margin with 0 holdout
FPs) for transplant into explain/generator.py, and saves all diag
matrices to experiments/data/guarded_envelope_margin.npz.

Usage (TPU): python experiments/guarded_envelope_margin.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json

import numpy as np
import jax
import jax.numpy as jnp

DATA = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "data")

from guarded_envelope_calib import diverse_augments  # noqa: E402


def bench_family(n, seed):
    """The bench's realistic augment: global scale + mild sensor noise."""
    from PIL import Image
    img = Image.open("/root/reference/samples/catdog.png").convert(
        "RGB").resize((224, 224))
    base = ((np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5
            ).transpose(2, 0, 1)
    rng = np.random.RandomState(seed)
    return np.stack([
        np.clip(base * rng.uniform(0.9, 1.1)
                + rng.randn(*base.shape).astype(np.float32) * 0.02,
                -1.5, 1.5) for _ in range(n)])


def main():
    assert jax.default_backend() == "tpu"
    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224 as cfg, init_params)
    from transformer_explainability_tpu.explain.generator import (
        make_explain_fn, precision_kwargs, calibrate_envelope,
        _envelope_flags, DIAG_FIELDS)

    params = init_params(jax.random.PRNGKey(0), cfg)
    diag_fn = make_explain_fn(cfg, "transformer_attribution",
                              with_diagnostics=True,
                              **precision_kwargs("production"))
    B = 32

    def diag_of(imgs, idxs):
        out = []
        n = len(imgs)
        for lo in range(0, n, B):
            hi = min(lo + B, n)
            pad = B - (hi - lo)
            im = np.concatenate([imgs[lo:hi]] + ([np.zeros(
                (pad,) + imgs.shape[1:], np.float32)] if pad else []))
            ix = np.concatenate([idxs[lo:hi]] + ([np.zeros(pad, np.int32)]
                                                 if pad else []))
            _, dg = diag_fn(params, jnp.asarray(im), jnp.asarray(ix))
            out.append(np.asarray(dg)[:hi - lo])
            print(f"  diag {hi}/{n}", flush=True)
        return np.concatenate(out)

    print("calib2 population", flush=True)
    calib_imgs = np.concatenate([
        diverse_augments(96, seed=11),      # the committed population
        diverse_augments(32, seed=29),      # second seed, same family
        bench_family(32, seed=3)])          # the bench's family
    calib_idx = np.full(len(calib_imgs), 243, np.int32)
    d_calib = diag_of(calib_imgs, calib_idx)

    print("holdout population", flush=True)
    hold_imgs = np.concatenate([
        diverse_augments(48, seed=41),
        bench_family(48, seed=77)])
    hold_idx = np.full(len(hold_imgs), 243, np.int32)
    d_hold = diag_of(hold_imgs, hold_idx)

    print("stress population", flush=True)
    tun = np.load(_os.path.join(DATA, "guarded_tuning.npz"))
    tru = np.load(_os.path.join(DATA, "fidelity_truth.npz"))
    stress_imgs = np.concatenate([tun["stress_imgs"],
                                  tru["imgs"].astype(np.float32)])
    stress_idx = np.concatenate([tun["stress_idx"],
                                 tru["idx"].astype(np.int32)])
    d_stress = diag_of(stress_imgs, stress_idx)
    # the truth set's last sample is catdog (a real image): exclude it from
    # the "stress" flag-rate denominator
    is_stress = np.ones(len(stress_imgs), bool)
    is_stress[-1] = False

    d_real = diag_of(tun["real_imgs"], tun["real_idx"])

    np.savez(_os.path.join(DATA, "guarded_envelope_margin.npz"),
             d_calib=d_calib, d_hold=d_hold, d_stress=d_stress,
             d_real=d_real)

    rows = {}
    for margin in (1.2, 1.3, 1.5, 2.0, 3.0):
        bounds = calibrate_envelope(d_calib, margin=margin)
        f_stress = _envelope_flags(d_stress, bounds)
        rows[margin] = {
            "stress_flagged": int(f_stress[is_stress].sum()),
            "stress_n": int(is_stress.sum()),
            "catdog_flagged": bool(f_stress[-1]),
            "holdout_fp": int(_envelope_flags(d_hold, bounds).sum()),
            "holdout_n": len(d_hold),
            "real16_fp": int(_envelope_flags(d_real, bounds).sum()),
        }
        print(f"margin {margin}: {rows[margin]}", flush=True)

    ok = [m for m, r in rows.items()
          if r["holdout_fp"] == 0 and r["real16_fp"] == 0]
    chosen = min(ok) if ok else max(rows)
    print(f"\nchosen margin: {chosen}")
    bounds = calibrate_envelope(d_calib, margin=chosen)
    print("ENVELOPE_BOUNDS = {")
    for f in DIAG_FIELDS:
        print(f'    "{f}": ({bounds[f][0]:.6g}, {bounds[f][1]:.6g}),')
    print("}")
    with open(_os.path.join(DATA, "guarded_envelope_margin.json"), "w") as f:
        json.dump({"rows": {str(k): v for k, v in rows.items()},
                   "chosen_margin": chosen,
                   "bounds": {k: list(v) for k, v in bounds.items()}},
                  f, indent=1)


if __name__ == "__main__":
    main()
