"""Strict-mode serving economics + the verify-lite cascade (round 5).

Round 5b established that ONLY the strict cross-check guarantees the
per-sample fidelity floor (the envelope is an OOD detector: it missed
6/6 genuinely-bad benign controls that the strict statistic catches).
This experiment prices the guarantee and tests whether a cheaper checker
can carry it:

  * programs: production (the 521/s fast path), f32-HIGHEST (the strict
    checker, 145/s), and two "verify-lite" candidates that keep the
    precision-sensitive attention island at HIGHEST but drop the trunk
    to tf32 — lite_a (rules at tf32) and lite_b (rules at HIGHEST).
    Unlike round 4's `alt` candidate (bf16 rules — its own lottery made
    it disagree with production on 91% of good rows,
    guarded_crosscheck.json), these keep every noise-sensitive op at
    high precision so agreement is informative.
  * labeled set (f64 truth already committed): fidelity_truth.npz
    (16 randn + catdog) + guarded_defer_load_{in,truth}.npz (24 envelope
    FPs + 8 controls, 6 of them truth-bad) = 49 rows. Zero-FN check: at
    the committed STRICT_AGREEMENT, does each checker flag every
    truth-bad row?
  * benign economics: 192 fresh augments (both families, unseen seeds)
    -> per-checker flag rate at STRICT_AGREEMENT = the CPU-fallback /
    escalation load a serving deployment pays.
  * throughput: interleaved steady-state rates (bench methodology) for
    all four programs -> implied rates for the serving policies
    (strict+CPU, strict+f32-deliver, lite cascade).

Writes experiments/data/strict_econ.json. TPU only.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import json

import numpy as np

HERE = _os.path.dirname(_os.path.abspath(__file__))
DATA = _os.path.join(HERE, "data")
OUT = _os.path.join(DATA, "strict_econ.json")
B = 64


def _corrs(a, b):
    a = a.reshape(a.shape[0], -1).astype(np.float64)
    b = b.reshape(b.shape[0], -1).astype(np.float64)
    a = a - a.mean(1, keepdims=True)
    b = b - b.mean(1, keepdims=True)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    return (a * b).sum(1) / np.where(den == 0, 1.0, den)


def main():
    import jax
    assert jax.default_backend() == "tpu", "economics need the real chip"
    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224 as cfg, init_params)
    from transformer_explainability_tpu.explain.generator import (
        PRECISION_PRESETS, STRICT_AGREEMENT, make_explain_fn)
    from guarded_envelope_calib import diverse_augments
    from guarded_envelope_margin import bench_family
    from bench import _interleave_rates

    params = init_params(jax.random.PRNGKey(0), cfg)

    programs = {
        "prod": make_explain_fn(cfg, "transformer_attribution",
                                **PRECISION_PRESETS["production"]),
        "f32": make_explain_fn(cfg, "transformer_attribution",
                               matmul_precision="float32"),
        "lite_a": make_explain_fn(cfg, "transformer_attribution",
                                  matmul_precision="tensorfloat32",
                                  attn_precision="float32"),
        "lite_b": make_explain_fn(cfg, "transformer_attribution",
                                  matmul_precision="tensorfloat32",
                                  attn_precision="float32",
                                  relprop_precision="float32"),
    }

    # ---- sample sets -------------------------------------------------
    fid = np.load(_os.path.join(DATA, "fidelity_truth.npz"))
    dfl_in = np.load(_os.path.join(DATA, "guarded_defer_load_in.npz"))
    dfl_tr = np.load(_os.path.join(DATA, "guarded_defer_load_truth.npz"))
    lab_imgs = np.concatenate([fid["imgs"], dfl_in["images"]])
    lab_idx = np.concatenate([fid["idx"], dfl_in["indices"]]).astype(np.int32)
    # defer-load truth is (n, 196) or (n, heads...)? both stored flat (196,)
    lab_truth = np.concatenate([fid["truth"].reshape(len(fid["truth"]), -1),
                                dfl_tr["truth"].reshape(
                                    len(dfl_tr["truth"]), -1)])
    n_lab = len(lab_imgs)

    ben_imgs = np.concatenate([
        np.asarray(diverse_augments(96, 300), np.float32),
        np.asarray(bench_family(96, 301), np.float32)])
    rng = np.random.RandomState(11)
    ben_idx = rng.randint(0, cfg.num_classes, len(ben_imgs)).astype(np.int32)

    all_imgs = np.concatenate([lab_imgs, ben_imgs])
    all_idx = np.concatenate([lab_idx, ben_idx])
    n_all = len(all_imgs)
    pad = (-n_all) % B
    if pad:
        all_imgs = np.concatenate([all_imgs, all_imgs[:pad]])
        all_idx = np.concatenate([all_idx, all_idx[:pad]])

    # ---- heatmaps from every program ---------------------------------
    import jax.numpy as jnp
    heats = {}
    for name, fn in programs.items():
        outs = []
        for i in range(0, len(all_imgs), B):
            outs.append(np.asarray(fn(params, jnp.asarray(all_imgs[i:i + B]),
                                      jnp.asarray(all_idx[i:i + B]))))
            print(f"{name}: batch {i // B + 1}/{len(all_imgs) // B}",
                  flush=True)
        heats[name] = np.concatenate(outs)[:n_all].reshape(n_all, -1)

    # ---- fidelity + agreement analysis -------------------------------
    tau = STRICT_AGREEMENT
    truth_corr = {name: _corrs(heats[name][:n_lab], lab_truth)
                  for name in programs}
    np.savez(_os.path.join(DATA, "strict_econ_rows.npz"),
             **{f"truth_{n}": truth_corr[n] for n in programs},
             **{f"agree_{n}": _corrs(heats["prod"], heats[n])
                for n in ("f32", "lite_a", "lite_b")})
    bad = truth_corr["prod"] < 0.999
    report = {"n_labeled": n_lab, "n_benign": len(ben_imgs),
              "strict_agreement": tau, "batch": B,
              "labeled_bad_rows": int(bad.sum()),
              "checkers": {}}
    for name in ("f32", "lite_a", "lite_b"):
        agree_lab = _corrs(heats["prod"][:n_lab], heats[name][:n_lab])
        agree_ben = _corrs(heats["prod"][n_lab:], heats[name][n_lab:])
        fn_rows = [int(i) for i in np.nonzero(bad & (agree_lab >= tau))[0]]
        report["checkers"][name] = {
            "false_negatives_at_tau": len(fn_rows),
            "fn_rows": fn_rows,
            "fn_truth_corrs": [round(float(truth_corr["prod"][i]), 5)
                               for i in fn_rows],
            "zero_fn_tau": (round(float(agree_lab[bad].max()), 6)
                            if bad.any() else None),
            "benign_flag_rate_at_tau": round(
                float((agree_ben < tau).mean()), 5),
            "labeled_flag_rate_at_tau": round(
                float((agree_lab < tau).mean()), 5),
            "checker_truth_min": round(float(truth_corr[name].min()), 6),
            "checker_truth_median": round(
                float(np.median(truth_corr[name])), 6),
            # what the checker delivers on rows it flags (the
            # f32-deliver policy floor)
            "checker_truth_min_on_flagged": (
                round(float(truth_corr[name][agree_lab < tau].min()), 6)
                if (agree_lab < tau).any() else None),
        }

    # the tier's delivery question at THIS batch shape's realization:
    # delivered floor (f32 vs truth) inside vs outside the
    # deep-disagreement band (serving.TIER_AGREEMENT = 0.99)
    agree_f32_lab = _corrs(heats["prod"][:n_lab], heats["f32"][:n_lab])
    report["f32_band_floor"] = {}
    for name, mask in (("agree_ge_0.99", agree_f32_lab >= 0.99),
                       ("agree_lt_0.99", agree_f32_lab < 0.99)):
        if mask.any():
            report["f32_band_floor"][name] = {
                "n": int(mask.sum()),
                "f32_truth_min": round(
                    float(truth_corr["f32"][mask].min()), 6),
                "prod_truth_min": round(
                    float(truth_corr["prod"][mask].min()), 6)}

    # ---- throughput (interleaved, steady-state windows) ---------------
    ji = jnp.asarray(all_imgs[:B])
    jx = jnp.asarray(all_idx[:B])
    rates = _interleave_rates({name: (fn, (params, ji, jx), B)
                               for name, fn in programs.items()})
    report["rates_b64"] = rates

    rp = rates["prod"]["value"]
    rf = rates["f32"]["value"]
    policies = {
        "plain_f32": {"rate": rf, "floor": report["checkers"]["f32"][
            "checker_truth_min"]},
        "strict_corun_f32": {"rate": round(1 / (1 / rp + 1 / rf), 1),
                             "cpu_s_per_1k_benign": round(
            report["checkers"]["f32"]["benign_flag_rate_at_tau"]
            * 1000 * 2.6, 1)},
    }
    for name in ("lite_a", "lite_b"):
        rl = rates[name]["value"]
        flag = report["checkers"][name]["benign_flag_rate_at_tau"]
        # cascade: prod + lite on all, f32 micro-batch only on flagged
        policies[f"cascade_{name}"] = {
            "rate": round(1 / (1 / rp + 1 / rl + flag / rf), 1),
            "escalation_rate": flag,
            "viable_zero_fn": report["checkers"][name][
                "false_negatives_at_tau"] == 0,
        }
    report["policies"] = policies

    _os.makedirs(DATA, exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
