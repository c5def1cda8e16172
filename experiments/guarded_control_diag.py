"""Characterize the guarded-envelope MISSES found by the round-5 sustained
load run (experiments/guarded_defer_load.py): an UNFLAGGED benign control
row came back at corr -0.27 vs f64 truth — the in-envelope lottery is real
on random weights. This re-runs the 32 saved rows (24 corrected + 8
controls) through every guard-relevant program on the real chip and
reports, per row:

  * corr(production, f64 truth)      — the fast path's actual fidelity
  * corr(tpu_f32,    f64 truth)      — the strict verifier's fidelity
  * corr(production, tpu_f32)        — the STRICT cross-check statistic
    (strict flags when < STRICT_AGREEMENT = 0.9999)
  * envelope flag under the committed ENVELOPE_BOUNDS

i.e. WOULD strict mode have caught what envelope mode missed? Inputs and
truth come from the committed guarded_defer_load artifacts (rows 0-23
were flagged+corrected in the load run; rows 24-31 were unflagged
controls).

Writes experiments/data/guarded_control_diag.json.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json

import numpy as np

HERE = _os.path.dirname(_os.path.abspath(__file__))
DATA = _os.path.join(HERE, "data")


def main():
    import jax
    import jax.numpy as jnp
    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224, init_params)
    from transformer_explainability_tpu.explain.generator import (
        ENVELOPE_BOUNDS, STRICT_AGREEMENT, _batch_corr, _envelope_flags,
        make_explain_fn, PRECISION_PRESETS)

    d_in = np.load(_os.path.join(DATA, "guarded_defer_load_in.npz"))
    truth = np.load(_os.path.join(DATA, "guarded_defer_load_truth.npz"))["truth"]
    imgs, idx = d_in["images"], d_in["indices"]
    n = imgs.shape[0]
    assert truth.shape[0] == n, (truth.shape, n)

    cfg = VIT_BASE_16_224
    params = init_params(jax.random.PRNGKey(0), cfg)

    prod = make_explain_fn(cfg, "transformer_attribution",
                           with_diagnostics=True,
                           **PRECISION_PRESETS["production"])
    f32 = make_explain_fn(cfg, "transformer_attribution",
                          matmul_precision="float32")

    ji, jx = jnp.asarray(imgs), jnp.asarray(idx)
    heat_p, diag = prod(params, ji, jx)
    heat_p = np.asarray(heat_p)
    diag = np.asarray(diag, np.float64)
    heat_f = np.asarray(f32(params, ji, jx))

    c_pt = _batch_corr(heat_p, truth)
    c_ft = _batch_corr(heat_f, truth)
    c_pf = _batch_corr(heat_p, heat_f)
    env = _envelope_flags(diag, ENVELOPE_BOUNDS)

    rows = []
    for i in range(n):
        rows.append({
            "row": i,
            "kind": "corrected" if i < n - 8 else "control",
            "prod_vs_truth": round(float(c_pt[i]), 6),
            "f32_vs_truth": round(float(c_ft[i]), 6),
            "prod_vs_f32": round(float(c_pf[i]), 6),
            "envelope_flag": bool(env[i]),
            "strict_flag": bool(c_pf[i] < STRICT_AGREEMENT),
        })

    controls = rows[n - 8:]
    # the question: for every control whose production heatmap is bad
    # (truth corr < 0.999), does the strict cross-check fire?
    bad = [r for r in controls if r["prod_vs_truth"] < 0.999]
    summary = {
        "n": n,
        "controls_bad": len(bad),
        "controls_bad_strict_caught": sum(r["strict_flag"] for r in bad),
        "controls_bad_envelope_caught": sum(r["envelope_flag"] for r in bad),
        "controls_bad_f32_vs_truth_min": (min(r["f32_vs_truth"] for r in bad)
                                          if bad else None),
        "control_prod_vs_truth": sorted(
            round(r["prod_vs_truth"], 5) for r in controls),
        "strict_agreement": STRICT_AGREEMENT,
    }
    out = {"summary": summary, "rows": rows}
    path = _os.path.join(DATA, "guarded_control_diag.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
