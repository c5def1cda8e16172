"""Chaos-detector statistic search, round 2 (CPU instrumentation).

The single-realization magnitude statistics (DIAG_FIELDS) measured by
guarded_detector.py separate nothing (all spearman |rho| <= 0.35, zero-FN
thresholds flag 100% of good samples). This experiment digs at the
mechanism with quantities the fused TPU path cannot cheaply expose, on the
CPU XLA path (identical math, exact f32, fuse_grad_cam=False so the
per-head grad/cam tensors are visible):

  * the CANCELLATION hypothesis: chaos = ulp noise flipping signs across
    the (grad (.) cam).clamp(0) boundary where positive and negative mass
    nearly cancel -> statistic neg_mass/pos_mass per block;
  * per-block grad/cam magnitudes and their growth;
  * the ORACLE: input-sensitivity corr(explain(x), explain(x + 1e-5 noise))
    — PERF.md's bisect says chaos samples are knife-edge to ~1e-5 x0 noise,
    so this should be the ceiling any cheap statistic is judged against
    (and validates the premise that input-sensitivity predicts the TPU
    production mode's truth-corr).

Labels: the TPU production corr from guarded_detector.json.
Writes experiments/data/guarded_stats_cpu.json. CPU, own process:
    python experiments/guarded_stats_cpu.py [--analyze]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json

import numpy as np

DATA = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "data")
OUT = _os.path.join(DATA, "guarded_stats_cpu.json")
SENS_EPS = 1e-5


def measure():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224 as cfg, init_params)
    from transformer_explainability_tpu.models import vit as vit_mod
    from transformer_explainability_tpu.explain.generator import (
        explain_single)
    from transformer_explainability_tpu.ops import pallas_kernels as pk

    params = init_params(jax.random.PRNGKey(0), cfg)

    def collect(params, img, index):
        logits, res = vit_mod.forward_collect(params, img, cfg, unroll=1)
        idx = jnp.where(index >= 0, index, jnp.argmax(logits))
        onehot = jax.nn.one_hot(idx, cfg.num_classes, dtype=logits.dtype)
        R, cams, grads = vit_mod.reverse_pass(
            params, res, onehot, cfg, need_grads=True, need_relprop=True,
            fuse_grad_cam=False, unroll=1)
        gcp = grads * cams                                   # (L, h, n, n)
        pos = jnp.sum(jnp.clip(gcp, min=0), axis=(1, 2, 3))  # (L,)
        neg = jnp.sum(jnp.clip(-gcp, min=0), axis=(1, 2, 3))
        gc = jnp.clip(gcp, min=0).mean(axis=1)               # (L, n, n)
        heat = pk.rollout_from_grad_cam(gc, None, 0)[0, cfg.num_prefix_tokens:]
        stats = {
            "pos": pos, "neg": neg,
            "cam_l1": jnp.sum(jnp.abs(cams), axis=(1, 2, 3)),
            "cam_max": jnp.max(jnp.abs(cams), axis=(1, 2, 3)),
            "grad_l1": jnp.sum(jnp.abs(grads), axis=(1, 2, 3)),
            "grad_max": jnp.max(jnp.abs(grads), axis=(1, 2, 3)),
            "gc_l1": jnp.sum(gc, axis=(1, 2)),
        }
        return heat, stats

    cfn = jax.jit(collect)
    efn = jax.jit(lambda p, im, i: explain_single(
        p, im, i, cfg, matmul_precision="float32"))

    tun = np.load(_os.path.join(DATA, "guarded_tuning.npz"))
    tru = np.load(_os.path.join(DATA, "fidelity_truth.npz"))
    labels = {(r["set"], r["i"]): r["corr"]
              for r in json.load(open(_os.path.join(
                  DATA, "guarded_detector.json")))}
    sets = {
        "stress_seed1": (tun["stress_imgs"], tun["stress_idx"],
                         tun["stress_truth"]),
        "bench_truth": (tru["imgs"], tru["idx"], tru["truth"]),
        "realistic": (tun["real_imgs"], tun["real_idx"], tun["real_truth"]),
    }
    rng = np.random.RandomState(99)
    rows = []
    for name, (imgs, idx, truth) in sets.items():
        for i in range(len(imgs)):
            im = jnp.asarray(imgs[i])
            ix = jnp.asarray(np.int32(idx[i]))
            heat, stats = cfn(params, im, ix)
            heat = np.asarray(heat, np.float64)
            base = truth[i].astype(np.float64).ravel()
            # sanity: this CPU realization vs the cached CPU truth
            self_corr = _corr(heat, base)
            # oracle: input sensitivity at the bisect's noise scale
            noise = rng.randn(*imgs[i].shape).astype(np.float32) * SENS_EPS
            h2 = np.asarray(efn(params, jnp.asarray(imgs[i] + noise), ix),
                            np.float64)
            rows.append({
                "set": name, "i": i,
                "tpu_corr": labels.get((name, i)),
                "self_corr": round(self_corr, 6),
                "sens_corr": round(_corr(h2, heat), 6),
                **{k: np.asarray(v, np.float64).tolist()
                   for k, v in stats.items()}})
            if (i + 1) % 16 == 0:
                with open(OUT, "w") as f:
                    json.dump(rows, f)
                print(f"{name} {i + 1}/{len(imgs)}", flush=True)
    with open(OUT, "w") as f:
        json.dump(rows, f)
    return rows


def _corr(a, b):
    a = a.astype(np.float64).ravel() - a.mean()
    b = b.astype(np.float64).ravel() - b.mean()
    return float(a @ b / np.sqrt((a @ a) * (b @ b)))


def analyze(rows):
    CORR_GOAL = 0.999

    def spearman(xs, ys):
        rx = np.argsort(np.argsort(xs)).astype(float)
        ry = np.argsort(np.argsort(ys)).astype(float)
        return float(np.corrcoef(rx, ry)[0, 1])

    stress = [r for r in rows if r["set"] in ("stress_seed1", "bench_truth")
              and r["tpu_corr"] is not None]
    real = [r for r in rows if r["set"] == "realistic"
            and r["tpu_corr"] is not None]
    lab = np.array([r["tpu_corr"] for r in stress])
    bad = lab < CORR_GOAL
    print(f"stress n={len(stress)} bad(tpu corr<{CORR_GOAL})={bad.sum()}"
          f" ({100 * bad.mean():.0f}%)")
    print(f"self_corr min {min(r['self_corr'] for r in rows):.6f} "
          f"(sanity — should be ~1)")

    cands = {
        "sens_infid": lambda r: 1 - r["sens_corr"],
        "cancel_max": lambda r: max(n / max(p, 1e-30)
                                    for p, n in zip(r["pos"], r["neg"])),
        "cancel_mean": lambda r: float(np.mean(
            [n / max(p, 1e-30) for p, n in zip(r["pos"], r["neg"])])),
        "cancel_l0": lambda r: r["neg"][0] / max(r["pos"][0], 1e-30),
        "grad_growth": lambda r: (max(r["grad_max"])
                                  / max(min(r["grad_max"]), 1e-30)),
        "grad_l1_max": lambda r: max(r["grad_l1"]),
        "cam_growth": lambda r: (max(r["cam_max"])
                                 / max(min(r["cam_max"]), 1e-30)),
        "gc_l1_ratio": lambda r: (r["gc_l1"][0]
                                  / max(r["gc_l1"][-1], 1e-30)),
    }
    infid = 1 - lab
    for name, f in cands.items():
        xs = np.array([f(r) for r in stress])
        rho = spearman(xs, infid)
        tau = xs[bad].min() if bad.any() else float("nan")
        good = xs[~bad]
        fp = float((good >= tau).mean()) if bad.any() else float("nan")
        fpr = float(np.mean([f(r) >= tau for r in real])) if bad.any() else 0
        print(f"{name:12s} spearman={rho:+.3f}  zeroFN-tau={tau:.4g}  "
              f"FP(stress-good)={100 * fp:.0f}%  FP(realistic)="
              f"{100 * fpr:.0f}%")
    # the oracle judged as a detector at a FIXED threshold ladder
    for t in (1e-4, 1e-3, 1e-2, 0.1):
        xs = np.array([1 - r["sens_corr"] for r in stress])
        fn = int((~(xs[bad] >= t)).sum()) if bad.any() else 0
        fp = float((xs[~bad] >= t).mean())
        print(f"sens_infid>={t:g}: misses {fn}/{bad.sum()} bad, "
              f"flags {100 * fp:.0f}% of good")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--analyze", action="store_true")
    args = ap.parse_args()
    rows = (json.load(open(OUT)) if args.analyze and _os.path.exists(OUT)
            else measure())
    analyze(rows)


if __name__ == "__main__":
    main()
