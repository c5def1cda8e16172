"""Measure the envelope defer path END-TO-END under sustained load
(VERDICT r4 weak #4 / next-round #6: the serving claim rested on an
unmeasured async path).

Serves >=1k samples through :class:`GuardedServer` (envelope mode,
production preset, committed ENVELOPE_BOUNDS) on the real TPU while the
background CPU verifier drains flagged samples live:

  * traffic: fresh benign draws from BOTH augment families (seeds disjoint
    from calibration — guarded_envelope_margin.py), so flags are the
    envelope's structural ~1% benign FP rate; one batch carries 8 injected
    randn stress rows (the population the envelope exists to catch);
  * measured: submit-side throughput with the queue live (vs the plain
    production program), drain time, per-flag queue wait / service time /
    depth, verifier busy fraction, flag split (stress vs benign);
  * fidelity: every corrected row + an unflagged control set is compared
    against f64 CPU truth (child process — x64 flips global dtypes):
    end-to-end min-corr INCLUDING deferred corrections.

Writes experiments/data/guarded_defer_load.json (and _truth.npz).

``--mode strict [--strict-policy deliver-f32]`` measures the strict
(per-sample) guarantee's serving shape instead (PERF.md round 5d): the
f32 co-run runs on every sample, flagged rows are delivered with the f32
result, and only deep-disagreement rows queue for exact CPU; fidelity
then also checks a sample of the delivered-f32 rows against f64 truth.

Usage:
    python experiments/guarded_defer_load.py               # real TPU
    python experiments/guarded_defer_load.py --cpu-smoke   # tiny, CPU
    (internal) --truth-child IN OUT                        # f64 child
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import dataclasses
import json
import subprocess
import time

import numpy as np

HERE = _os.path.dirname(_os.path.abspath(__file__))
DATA = _os.path.join(HERE, "data")
OUT_JSON = _os.path.join(DATA, "guarded_defer_load.json")


def _corr(a, b):
    a = a.reshape(-1).astype(np.float64); b = b.reshape(-1).astype(np.float64)
    a -= a.mean(); b -= b.mean()
    d = np.linalg.norm(a) * np.linalg.norm(b)
    return float(a @ b / d) if d else 1.0


def truth_child(in_npz: str, out_npz: str) -> None:
    """f64 CPU truth for (images, indices) — run in its OWN process."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from transformer_explainability_tpu.models.vit import VIT_BASE_16_224
    from transformer_explainability_tpu.explain.generator import (
        explain_single)
    d = np.load(in_npz)
    import jax.numpy as jnp
    import functools
    imgs_in = d["images"]
    if imgs_in.dtype == np.uint8:
        # uint8 wire format: apply the on-device preprocess in f64
        # (generator.preprocess_uint8 semantics, exact)
        imgs_in = ((imgs_in.astype(np.float64) / 255.0 - 0.5) / 0.5
                   ).transpose(0, 3, 1, 2)
    # f64 arrays + matmul_precision="float32" on CPU = native f64 math —
    # the exact methodology of experiments/make_golden.py / PERF.md 3d
    fn = jax.jit(functools.partial(
        explain_single, cfg=VIT_BASE_16_224,
        method="transformer_attribution", matmul_precision="float32",
        unroll=1, use_attn_kernel=False))
    from transformer_explainability_tpu.models.vit import init_params
    params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x), jnp.float64),
                          init_params(jax.random.PRNGKey(0), VIT_BASE_16_224))
    out = [np.asarray(fn(params, jnp.asarray(img, jnp.float64),
                         jnp.int32(ix)))
           for img, ix in zip(imgs_in, d["indices"])]
    np.savez(out_npz, truth=np.stack(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--stress-rows", type=int, default=8,
                    help="randn rows injected into the middle batch")
    ap.add_argument("--max-truth", type=int, default=24,
                    help="cap on f64 truth recomputes (corrected rows)")
    ap.add_argument("--controls", type=int, default=8)
    ap.add_argument("--depth", type=int, default=4,
                    help="serve_stream pipeline depth")
    ap.add_argument("--tier", default="cpu", choices=["cpu", "tpu-f32"],
                    help="verifier tier (tpu-f32: micro-batched f32 "
                         "re-check on the chip, CPU only on escalation)")
    ap.add_argument("--mode", default="envelope",
                    choices=["envelope", "strict"])
    ap.add_argument("--strict-policy", default="deliver-f32",
                    choices=["cpu", "deliver-f32"],
                    help="strict mode only (PERF.md round 5d)")
    ap.add_argument("--escalation-budget", type=int, default=None,
                    help="bound the verification backlog: flagged rows "
                         "beyond it are load-shed with their delivered "
                         "heatmap (PERF.md round 5e)")
    ap.add_argument("--verify-batch", type=int, default=16)
    ap.add_argument("--input-format", default=None,
                    choices=["uint8"],
                    help="uint8: raw HWC frames on the wire, normalized "
                         "on-device (4x less host->device traffic)")
    ap.add_argument("--cpu-smoke", action="store_true",
                    help="tiny config on CPU — validates the harness only")
    ap.add_argument("--skip-truth", action="store_true")
    ap.add_argument("--out", default=OUT_JSON)
    ap.add_argument("--truth-child", nargs=2, default=None)
    args = ap.parse_args()

    if args.truth_child:
        return truth_child(*args.truth_child)

    import jax
    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224, init_params)
    from transformer_explainability_tpu.explain.generator import (
        DIAG_FIELDS, calibrate_envelope, make_explain_fn)
    from transformer_explainability_tpu.explain.serving import GuardedServer
    from guarded_envelope_calib import diverse_augments
    from guarded_envelope_margin import bench_family

    if args.cpu_smoke:
        cfg = dataclasses.replace(VIT_BASE_16_224, img_size=32,
                                  embed_dim=64, depth=3, num_heads=4,
                                  num_classes=10)
        args.batches, args.batch = 3, 8
        args.stress_rows, args.max_truth, args.controls = 2, 4, 2
    else:
        assert jax.default_backend() == "tpu", (
            "sustained-load measurement needs the real chip "
            "(--cpu-smoke for harness validation)")
        cfg = VIT_BASE_16_224

    B, NB = args.batch, args.batches
    rng = np.random.RandomState(7)
    params = init_params(jax.random.PRNGKey(0), cfg)

    def benign(i, n):
        if cfg is not VIT_BASE_16_224:      # smoke: synthetic benign
            return rng.randn(n, 3, cfg.img_size, cfg.img_size).astype(
                np.float32) * 0.3
        fam = diverse_augments if i % 2 == 0 else bench_family
        return np.asarray(fam(n, 200 + i), np.float32)

    batches = []
    stress_batch = NB // 2
    for i in range(NB):
        imgs = benign(i, B)
        is_stress = np.zeros(B, bool)
        if i == stress_batch and args.stress_rows:
            imgs[:args.stress_rows] = rng.randn(
                args.stress_rows, *imgs.shape[1:]).astype(np.float32)
            is_stress[:args.stress_rows] = True
        idx = rng.randint(0, cfg.num_classes, B).astype(np.int32)
        if args.input_format == "uint8":
            # serving wire format: raw HWC uint8 (inverse of the
            # normalize transform, clipped to its representable range)
            imgs = np.clip(np.rint((imgs * 0.5 + 0.5) * 255.0),
                           0, 255).astype(np.uint8).transpose(0, 2, 3, 1)
        batches.append((imgs, idx, is_stress))

    if args.mode == "strict":
        # the co-run IS the checker; the tier applies to envelope only
        srv = GuardedServer(cfg, mode="strict",
                            strict_policy=args.strict_policy,
                            escalation_budget=args.escalation_budget,
                            input_format=args.input_format)
    else:
        bounds = None          # committed ENVELOPE_BOUNDS
        if args.cpu_smoke:     # smoke: calibrate on this traffic, tighten
            diag_fn = make_explain_fn(cfg, "transformer_attribution",
                                      with_diagnostics=True,
                                      preprocess=args.input_format)
            _, diag = diag_fn(params, batches[0][0], batches[0][1])
            bounds = calibrate_envelope(np.asarray(diag), margin=1.02)
        srv = GuardedServer(cfg, mode="envelope", envelope_bounds=bounds,
                            tier=args.tier, verify_batch=args.verify_batch,
                            escalation_budget=args.escalation_budget,
                            input_format=args.input_format)

    # ---- warmup (compile the guard program at batch shape, the tier
    # micro-batch shape, and the exact-CPU verifier)
    w_imgs = benign(97, B)
    w_idx = rng.randint(0, cfg.num_classes, B).astype(np.int32)
    if args.input_format == "uint8":
        w_imgs = np.clip(np.rint((w_imgs * 0.5 + 0.5) * 255.0),
                         0, 255).astype(np.uint8).transpose(0, 2, 3, 1)
    srv.submit(params, w_imgs, w_idx)
    srv.warmup(params, w_imgs[0], int(w_idx[0]))
    srv.drain(timeout=1200)
    srv.reset_stats()      # drop the compile-time service sample

    n_total = B * NB

    def _flag_split(tickets):
        fs = fb = 0
        for t, (_, _, is_stress) in zip(tickets, batches):
            fs += int((t.flagged & is_stress).sum())
            fb += int((t.flagged & ~is_stress).sum())
        return fs, fb

    def _delivered_split(tickets):
        """deliver-f32 policy: (stress, benign) rows delivered with the
        f32 co-run result (i.e. flagged by agreement but NOT escalated)."""
        ds = db = 0
        for t, (_, _, is_stress) in zip(tickets, batches):
            if t.delivered_f32 is None:
                continue
            keep = t.delivered_f32 & ~t.flagged
            ds += int((keep & is_stress).sum())
            db += int((keep & ~is_stress).sum())
        return ds, db

    # ---- phase A: synchronous submit loop (pays the device round-trip
    # per batch — the latency-bound path; measured 35 expl/s round 5)
    tickets_a = []
    t_start = time.monotonic()
    for imgs, idx, _ in batches:
        tickets_a.append(srv.submit(params, imgs, idx))
    # submit() returns numpy heatmaps (host transfer) — already synced
    t_submit_end = time.monotonic()
    srv.drain(timeout=3600)
    t_drain_end = time.monotonic()
    stats_a = srv.stats()
    sync_phase = {
        "submit_expl_s": n_total / (t_submit_end - t_start),
        "e2e_incl_drain_expl_s": n_total / (t_drain_end - t_start),
        "drain_tail_s": t_drain_end - t_submit_end,
        "queue": {k: stats_a[k] for k in stats_a
                  if k.startswith(("queue", "service", "verifier"))
                  or k in ("n_flagged", "flag_rate", "n_tier_cleared",
                           "n_escalated", "n_f32_delivered", "n_shed")},
    }
    srv.reset_stats()

    # ---- phase B: pipelined serve_stream (the sustained-serving path —
    # device compute of batch i+k overlaps host flag processing of i)
    t_start = time.monotonic()
    tickets = list(srv.serve_stream(
        params, ((imgs, idx) for imgs, idx, _ in batches),
        depth=args.depth))
    t_submit_end = time.monotonic()
    srv.drain(timeout=3600)
    t_drain_end = time.monotonic()
    stats = srv.stats()

    flags_stress, flags_benign = _flag_split(tickets)
    n_benign = n_total - args.stress_rows
    report = {
        "config": {"batches": NB, "batch": B, "samples": n_total,
                   "stress_rows": args.stress_rows, "depth": args.depth,
                   "tier": args.tier, "verify_batch": args.verify_batch,
                   "input_format": args.input_format, "mode": args.mode,
                   "escalation_budget": args.escalation_budget,
                   "strict_policy": (args.strict_policy
                                     if args.mode == "strict" else None),
                   "smoke": bool(args.cpu_smoke)},
        "throughput": {
            "stream_expl_s": n_total / (t_submit_end - t_start),
            "stream_e2e_incl_drain_expl_s":
                n_total / (t_drain_end - t_start),
            "stream_drain_tail_s": t_drain_end - t_submit_end,
            "sync_submit_expl_s": sync_phase["submit_expl_s"],
        },
        "sync_phase": sync_phase,
        "flags": {
            "stress_caught": flags_stress,
            "stress_total": args.stress_rows,
            "benign_fp": flags_benign,
            "benign_fp_rate": flags_benign / max(n_benign, 1),
        },
        "queue": {k: stats[k] for k in stats
                  if k.startswith(("queue", "service", "verifier"))
                  or k in ("n_flagged", "flag_rate", "n_tier_cleared",
                           "n_escalated", "n_f32_delivered", "n_shed")},
    }
    dl_stress, dl_benign = _delivered_split(tickets)
    if dl_stress or dl_benign:
        report["delivered_f32"] = {"stress": dl_stress,
                                   "benign": dl_benign}

    # ---- end-to-end fidelity incl. deferred corrections (f64 truth)
    if not args.skip_truth:
        corrected, control, delivered, shed = [], [], [], []
        for t, (imgs, idx, _) in zip(tickets, batches):
            for r in sorted(t.corrections):
                corrected.append((imgs[r], idx[r], t.heatmaps[r]))
            dl = (t.delivered_f32 if t.delivered_f32 is not None
                  else np.zeros_like(t.flagged))
            sh = (t.shed if t.shed is not None
                  else np.zeros_like(t.flagged))
            for r in np.nonzero(dl & ~t.flagged)[0][:2]:
                delivered.append((imgs[r], idx[r], t.heatmaps[r]))
            # load-shed rows: flagged (deep-disagreement in deliver-f32
            # mode) but never verified — the budget's fidelity cost
            for r in np.nonzero(sh)[0][:2]:
                shed.append((imgs[r], idx[r], t.heatmaps[r]))
            # controls: clean rows (neither corrected nor f32-delivered)
            for r in np.nonzero(~t.flagged & ~dl)[0][:1]:
                control.append((imgs[r], idx[r], t.heatmaps[r]))
        corrected = corrected[:args.max_truth]
        delivered = delivered[:args.max_truth]
        shed = shed[:args.max_truth]
        control = control[:args.controls]
        todo = corrected + delivered + shed + control
        if todo:
            _os.makedirs(DATA, exist_ok=True)
            stem = (args.out[:-5] if args.out.endswith(".json")
                    else args.out)
            in_npz = stem + "_in.npz"
            tr_npz = stem + "_truth.npz"
            np.savez(in_npz,
                     images=np.stack([x[0] for x in todo]),
                     indices=np.asarray([x[1] for x in todo], np.int32))
            if args.cpu_smoke:
                print("smoke: skipping the f64 child (full-scale cfg only)")
            else:
                subprocess.run(
                    [_sys.executable, _os.path.abspath(__file__),
                     "--truth-child", in_npz, tr_npz],
                    check=True, timeout=3600)
                truth = np.load(tr_npz)["truth"]
                cc = [_corr(h, tt) for (_, _, h), tt
                      in zip(todo, truth)]
                nc, nd, ns = len(corrected), len(delivered), len(shed)
                report["fidelity"] = {
                    "n_corrected_checked": nc,
                    "n_delivered_checked": nd,
                    "n_shed_checked": ns,
                    "n_control": len(control),
                    "corrected_min_corr": min(cc[:nc]) if nc else None,
                    "delivered_min_corr": (min(cc[nc:nc + nd])
                                           if nd else None),
                    "shed_min_corr": (min(cc[nc + nd:nc + nd + ns])
                                      if ns else None),
                    "control_min_corr": (min(cc[nc + nd + ns:])
                                         if len(cc) > nc + nd + ns
                                         else None),
                }
    srv.close()

    _os.makedirs(DATA, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
