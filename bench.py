"""Benchmark: ViT-B/16 class-specific explanations/sec/chip.

Prints a JSON result line after EVERY completed stage (the driver takes the
LAST parseable line): a provisional headline right after the production
batch sweep, then progressively enriched snapshots (interleaved headline,
fidelity, guarded strict/envelope, extra models) and a final line with
``stage: "complete"``. Optional stages are wall-clock budgeted
(``BENCH_BUDGET_S``, default 2100 s) so a driver timeout or mid-run relay
death still leaves a valid artifact — BENCH_r04 died rc=124 with
parsed:null because the only print was at the very end. Headline fields:
  * ``value`` — the production mixed-precision mode's throughput;
  * ``parity_value`` — the f32-HIGHEST mode's throughput, with
    ``parity_mode: "tpu-f32-highest"`` naming what that program actually
    is: XLA lowers f32 matmuls to 6-pass-bf16 MXU emulation — *exact* f32
    matmul does not exist on this hardware, so this row is the closest
    f32-class program the chip can run, not a bitwise f32 reference;
  * ``fidelity`` — the quantitative fp32-tolerance evidence (PERF.md
    "The parity criterion"): per-sample Pearson correlation vs f64 CPU
    ground truth on 16 randn samples + the catdog acceptance image.
    Measured round 3 (experiments/perf_parity_class_{cpu,torch}.py,
    committed per-sample data in experiments/data/): EXACT-f32 programs —
    jax on XLA:CPU (mean .99998) and the torch reference itself
    (mean .99994) — match the f64 truth on every sample *including* the
    ill-conditioned ones, so f32 "reassociation chaos" is a non-issue;
    the corr drops on random-weight chaos samples are the cost of the
    MXU's bf16xN f32/tf32 *emulation*. ``parity_class`` is therefore
    true when (a) the real-image (catdog) production corr vs truth is
    >= 0.999 AND (b) the production mode's random-weight infidelity
    (1 - mean corr) is <= 2x the TPU f32-HIGHEST program's own — i.e.
    production costs at most one more hardware-f32-floor of error on a
    synthetic stress set the real acceptance regime never enters (the
    2x budget is a declared engineering margin; the raw per-mode stats
    are always emitted alongside so the reader can apply their own).
    Requires the committed truth cache
    (experiments/data/fidelity_truth.npz; regenerate with
    experiments/perf_fidelity_truth.py); skipped if absent or
    BENCH_FIDELITY=0.
  * ``extra_models`` — optional ViT-L and BERT-base rows
    (BENCH_MODELS=vit_l,bert_s512,bert_s128; default all three, set
    BENCH_MODELS= to skip) so the driver history catches regressions on the
    other flagship configs.

Baseline target (BASELINE.md): >=500 transformer_attribution explanations/s
per chip on TPU v5e; vs_baseline is value/500.

Method benched: the headline ``transformer_attribution`` — full forward +
attention-gradient backward + 12-block LRP relprop + rollout, batched, one
jitted program (random weights; the math/FLOPs are weight-agnostic).
"""
import json
import os
import sys
import time

import numpy as np

TRUTH_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "experiments", "data", "fidelity_truth.npz")


def _rate_once(fn, args, B, n_iter):
    """One pipelined timing rep (expl/s). NOTE: on the axon-relay backend
    block_until_ready does not sync; the host transfer is the sync point."""
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n_iter)]
    for out in outs:
        np.asarray(out)
    return B * n_iter / (time.perf_counter() - t0)


def _n_iter(B):
    """Batches per timing window. Steady-state throughput needs the window
    long enough to amortize pipeline fill/drain: at B=104 the old 2-batch
    window measured 479 expl/s where the sustained rate is 520 (n_iter
    2/4/8/16 -> 479/502/516/520, tight spreads —
    experiments/perf_pipeline_depth.py, PERF.md round 4d). 16 batches keeps
    every config's window in the 1-12 s range."""
    return max(2, int(os.environ.get("BENCH_WINDOW_BATCHES", "16")))


def _time_fn(fn, params, imgs, idx, B, reps=None):
    """Median of ``reps`` timing reps in ONE process. Sequential
    cross-process measurements drift with relay conditions by up to ~35%
    (PERF.md round 3c); the median-of-reps headline stops ``vs_baseline``
    being relay weather."""
    np.asarray(fn(params, imgs, idx))  # warm-up + compile
    reps = reps or int(os.environ.get("BENCH_REPS", "5"))
    n_iter = _n_iter(B)
    rates = [_rate_once(fn, (params, imgs, idx), B, n_iter)
             for _ in range(reps)]
    return float(np.median(rates))


def _interleave_rates(entries, reps=None):
    """entries: {name: (fn, args, B)} — alternate timing reps across all
    compiled programs in one process (the perf_rich_anchors2.py
    methodology), so relative numbers (production vs parity) are immune to
    relay drift. Returns {name: {"value": median, "spread": [min, max]}}."""
    reps = reps or int(os.environ.get("BENCH_REPS", "5"))
    rates = {name: [] for name in entries}
    for name, (fn, args, B) in entries.items():   # one discarded warm rep:
        _rate_once(fn, args, B, 2)                # the first rep after a
    for _ in range(reps):                         # program switch dips ~30%
        for name, (fn, args, B) in entries.items():
            n_iter = _n_iter(B)
            rates[name].append(_rate_once(fn, args, B, n_iter))
    return {name: {"value": round(float(np.median(r)), 2),
                   "spread": [round(float(min(r)), 2),
                              round(float(max(r)), 2)]}
            for name, r in rates.items()}


def _bench_mode(cfg, params, rng, precision, relprop_precision,
                attn_precision, batch_candidates, mlp_precision=None,
                reps=None):
    """Best (batch, expl/s, fn, args) over the candidate batch sizes for one
    precision mode (``reps=2`` for the batch sweep — the final headline is
    re-measured interleaved)."""
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
            rate = _time_fn(fn, params, imgs, idx, B, reps=reps)
            print(f"# [{precision}/{relprop_precision}] batch={B}: "
                  f"{rate:.1f} expl/s ({1e3 / rate:.2f} ms/expl)",
                  file=sys.stderr)
            if best is None or rate > best[1]:
                best = (B, rate, fn, (params, imgs, idx))
        except Exception as e:  # OOM at large batch: fall through to smaller
            print(f"# batch={B} failed: {type(e).__name__}", file=sys.stderr)
            continue
    return best


def _corr_stats(fn, params, B):
    """Per-sample Pearson corr vs the committed f64 ground truth, computed
    with ONE call at the already-compiled batch size (truth samples padded
    to B — no new shape, no new relay compile)."""
    import jax.numpy as jnp
    d = np.load(TRUTH_PATH)
    imgs, idx, truth = d["imgs"], d["idx"], d["truth"]
    n = imgs.shape[0]
    if n > B:           # keep catdog (last) + the first B-1 randn samples
        keep = list(range(B - 1)) + [n - 1]
        imgs, idx, truth = imgs[keep], idx[keep], truth[keep]
        n = B
    pad = B - n
    imgs_p = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:],
                                            imgs.dtype)]) if pad else imgs
    idx_p = np.concatenate([idx, np.zeros((pad,), idx.dtype)]) if pad else idx
    out = np.asarray(fn(params, jnp.asarray(imgs_p),
                        jnp.asarray(idx_p)))[:n].astype(np.float64)
    corrs = []
    for i in range(n):
        a, b = out[i].ravel(), truth[i].ravel()
        a = a - a.mean()
        b = b - b.mean()
        corrs.append(float(a @ b / np.sqrt((a @ a) * (b @ b))))
    corrs = np.asarray(corrs)
    return {"median": round(float(np.median(corrs)), 5),
            "mean": round(float(corrs.mean()), 5),
            "min": round(float(corrs.min()), 5),
            "catdog": round(float(corrs[-1]), 5),
            "n": int(n)}


def _bench_extra_models(names, rng):
    """Optional ViT-L / BERT rows (production mode) for the driver history."""
    import jax
    import jax.numpy as jnp
    out = {}
    for name in names:
        try:
            if name == "vit_l":
                from transformer_explainability_tpu.models.vit import (
                    VIT_LARGE_16_224, init_params)
                from transformer_explainability_tpu.explain.generator import (
                    make_explain_fn)
                B = int(os.environ.get("BENCH_VITL_BATCH", "32"))
                params = init_params(jax.random.PRNGKey(0), VIT_LARGE_16_224)
                fn = make_explain_fn(
                    VIT_LARGE_16_224, "transformer_attribution",
                    matmul_precision="tensorfloat32",
                    relprop_precision="bfloat16", attn_precision="float32",
                    mlp_precision="bfloat16")
                imgs = jnp.asarray(rng.randn(B, 3, 224, 224).astype(np.float32))
                idx = jnp.asarray(rng.randint(0, 1000, B), jnp.int32)
                np.asarray(fn(params, imgs, idx))   # warm-up + compile
                reps = int(os.environ.get("BENCH_REPS", "5"))
                rates = [_rate_once(fn, (params, imgs, idx), B, _n_iter(B))
                         for _ in range(reps)]
                out["vit_l16_224"] = {
                    "value": round(float(np.median(rates)), 2), "batch": B,
                    "spread": [round(float(min(rates)), 2),
                               round(float(max(rates)), 2)]}
            elif name.startswith("bert"):
                from transformer_explainability_tpu.models.bert import (
                    BertConfig, init_params as bert_init)
                from transformer_explainability_tpu.explain.bert_generator \
                    import make_explain_fn as bert_fn
                S = int(name.split("_s")[1]) if "_s" in name else 512
                # measured optima (PERF.md round 4f steady-state re-sweep):
                # S=512 plateaus 48-64 (463.5/466.1 — keep 48), S=128 keeps
                # creeping to B=256 (2403 @128 -> 2565 @256)
                B = int(os.environ.get(
                    "BENCH_BERT_BATCH", "48" if S >= 384 else "256"))
                cfg = BertConfig()
                params = bert_init(jax.random.PRNGKey(0), cfg)
                fn = bert_fn(cfg, "transformer_attribution",
                             matmul_precision="tensorfloat32",
                             relprop_precision="bfloat16",
                             attn_precision="float32",
                             mlp_precision="bfloat16")
                ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)),
                                  jnp.int32)
                mask = np.ones((B, S), np.float32)
                mask[0, S // 2:] = 0
                mask = jnp.asarray(mask)
                idx = jnp.asarray(rng.randint(0, cfg.num_labels, B), jnp.int32)
                np.asarray(fn(params, ids, mask, idx))
                n_iter = _n_iter(B)
                reps = int(os.environ.get("BENCH_REPS", "5"))
                rates = [_rate_once(fn, (params, ids, mask, idx), B, n_iter)
                         for _ in range(reps)]
                out[f"bert_base_s{S}"] = {
                    "value": round(float(np.median(rates)), 2), "batch": B,
                    "spread": [round(float(min(rates)), 2),
                               round(float(max(rates)), 2)]}
            else:
                continue
            print(f"# extra model {name}: {json.dumps(out)}", file=sys.stderr)
        except Exception as e:
            print(f"# extra model {name} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
    return out


def _emit(out):
    """Print the current result JSON and flush. Called after EVERY stage:
    the driver takes the LAST parseable JSON line on stdout, so a mid-run
    relay death or driver timeout (BENCH_r04 died rc=124 with parsed:null
    because the only print was at the very end) still leaves the most
    recent complete snapshot as a valid artifact."""
    print(json.dumps(out))
    sys.stdout.flush()


def _preflight_backend(timeout_s=None):
    """Probe the default backend in a SUBPROCESS with a hard timeout.

    When the axon relay is in its hung state, backend init blocks FOREVER
    (uncatchable in-process — it took both round-4 driver artifacts down,
    rc=124 with no output). A sequential subprocess probe is safe (one
    relay client at a time) and lets the bench emit an explicit error
    artifact instead of hanging silently. Returns None if healthy, else
    the error string."""
    import subprocess
    timeout_s = timeout_s or float(os.environ.get("BENCH_PREFLIGHT_S", "240"))
    code = "import jax; print('ndev=%d' % len(jax.devices()))"
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return (f"backend preflight probe hung >{timeout_s:.0f}s — the "
                "axon relay is in its hung state (needs external restart)")
    if proc.returncode != 0 or "ndev=" not in proc.stdout:
        return (f"backend preflight probe failed rc={proc.returncode}: "
                f"{(proc.stderr or proc.stdout)[-300:]}")
    return None


def main():
    err = _preflight_backend()
    if err is not None:
        _emit({
            "metric": ("vit_b16_transformer_attribution_explanations"
                       "_per_sec_per_chip"),
            "value": 0.0,
            "unit": "explanations/s",
            "vs_baseline": 0.0,
            "stage": "preflight-failed",
            "error": err,
        })
        print(f"# {err}", file=sys.stderr)
        return

    import jax
    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224, init_params)

    t_start = time.perf_counter()
    # Wall-clock budget for the OPTIONAL stages (parity/fidelity/guarded/
    # extra models). The headline stage ignores it; each optional stage
    # first checks the time left against its own worst-case cost (relay
    # compiles are minutes each) and is skipped — with the reason on
    # stderr — when it cannot finish inside the budget.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2100"))

    def _left():
        return budget_s - (time.perf_counter() - t_start)

    # Precision ladder (see PERF.md). Production default: emulated-tf32
    # fwd/bwd + f32 attention island + bf16 LRP-rule/MLP dots. The exact-
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

    # 104 is the measured optimum with the megakernels + rich anchors
    # (PERF.md round 4b: B=112 is a named HBM wall — the program needs
    # 15.87G of 15.75G — and interleaved 104 beats 96 by ~1%); 96/64 stay
    # as fallbacks
    batch_candidates = [int(b) for b in
                        os.environ.get("BENCH_BATCHES", "104,96").split(",")]

    # quick sweep (2 reps/batch) to pick the operating batch; the headline
    # is then re-measured interleaved below. One candidate at a time, with
    # a provisional headline emitted as soon as the FIRST batch lands
    # (every batch shape is its own multi-minute relay compile — emitting
    # per-candidate means a valid artifact exists from the earliest
    # possible moment)
    out = {
        "metric": "vit_b16_transformer_attribution_explanations_per_sec_per_chip",
        "unit": "explanations/s",
        "stage": "sweep-provisional",
    }
    best = None
    for Bc in batch_candidates:
        got = _bench_mode(cfg, params, rng, precision, relprop_precision,
                          attn_precision, [Bc],
                          mlp_precision=mlp_precision, reps=2)
        if got is not None and (best is None or got[1] > best[1]):
            best = got
            out["value"] = round(best[1], 2)
            out["vs_baseline"] = round(best[1] / 500.0, 4)
            _emit(out)
    if best is None:
        raise SystemExit("all batch sizes failed")
    B, rate, prod_fn, prod_args = best

    # exact-parity float32 mode (skippable via BENCH_SKIP_PARITY=1),
    # measured at ITS OWN batch optimum (96 — round 4d: the f32 program
    # runs 144.7 expl/s at 96 but only 135.2 at the production pick 104),
    # one compile; 64 as the OOM fallback (e.g. with TE_TPU_RICH_XLA=1
    # anchors, ~113 MB/sample)
    parity = None
    if (os.environ.get("BENCH_SKIP_PARITY", "") != "1"
            and _left() > float(os.environ.get("BENCH_PARITY_MIN_S", "240"))):
        if (precision, relprop_precision, mlp_precision) == \
                ("float32", None, None):
            parity = best
        else:
            Bp = int(os.environ.get("BENCH_PARITY_BATCH", "96"))
            parity = _bench_mode(cfg, params, rng, "float32", None, None,
                                 [Bp], reps=2)
            if parity is None and Bp > 64:
                parity = _bench_mode(cfg, params, rng, "float32", None, None,
                                     [64], reps=2)

    # headline: median of interleaved reps in ONE process (both programs
    # already compiled) — relay drift hits all entries alike, so the
    # production/parity ratio and the headline median are weather-proof
    entries = {"production": (prod_fn, prod_args, B)}
    if parity is not None:
        entries["parity"] = (parity[2], parity[3], parity[0])
    stats = _interleave_rates(entries)
    rate = stats["production"]["value"]

    out["value"] = rate
    out["vs_baseline"] = round(rate / 500.0, 4)
    out["value_spread"] = stats["production"]["spread"]
    out["stage"] = "interleaved"
    if parity is not None:
        out["parity_value"] = stats["parity"]["value"]
        out["parity_vs_baseline"] = round(stats["parity"]["value"] / 500.0, 4)
        out["parity_spread"] = stats["parity"]["spread"]
        # f32-HIGHEST on TPU = XLA's bf16x6 MXU emulation (exact f32
        # matmul does not exist on this hardware); the fidelity block
        # below carries the evidence for the parity-class criterion
        out["parity_mode"] = "tpu-f32-highest"
    _emit(out)

    # fidelity vs f64 ground truth (cheap: 2 extra calls at compiled shapes)
    if (os.environ.get("BENCH_FIDELITY", "1") != "0"
            and os.path.isfile(TRUTH_PATH) and _left() > 30):
        try:
            fid = {"criterion":
                   "parity-class iff the guarded-strict pipeline's "
                   "stress-set MIN corr vs f64 CPU truth >= 0.999 — the "
                   "torch reference's own exact-f32 floor is 0.99936 "
                   "(PERF.md 3d), so meeting 0.999 per-sample matches the "
                   "reference's fp32-tolerance behavior. History: the "
                   "round-3 criterion anchored on catdog>=0.999 and a "
                   "mean-infidelity ratio vs the TPU-f32 mode; round 4 "
                   "showed both anchors were artifacts of a per-sample "
                   "lottery amplified by a weight-mismatch bug (PERF.md "
                   "4a) — on random weights EVERY single TPU realization "
                   "has a heavy per-sample tail (production 42%, TPU-f32 "
                   "9% of samples below 0.999; exact f32 exists only on "
                   "CPU), and only the strict cross-check pipeline "
                   "(production + f32 verifier + exact-CPU fallback) has "
                   "a guaranteed floor. Raw per-mode stats emitted "
                   "alongside; samples: 16 randn + catdog"}
            fid["production_corr_vs_f64"] = _corr_stats(prod_fn, params, B)
            # exact-f32 anchor means, read from the committed evidence
            # (experiments/data/perf_parity_class_{cpu,torch}.json) so
            # regenerating that data cannot desynchronize the bench JSON;
            # round-3 constants as fallback if the files are absent
            data_dir = os.path.join(os.path.dirname(TRUTH_PATH))
            for key, fname, field, fallback in (
                    ("exact_f32_cpu_mean", "perf_parity_class_cpu.json",
                     "mean", 0.99998),
                    ("exact_f32_torch_mean", "perf_parity_class_torch.json",
                     "mean", 0.99994)):
                try:
                    with open(os.path.join(data_dir, fname)) as f:
                        fid[key] = round(float(json.load(f)[field]), 5)
                except (OSError, KeyError, ValueError):
                    fid[key] = fallback
            if parity is not None:
                fid["f32_corr_vs_f64"] = _corr_stats(parity[2], params,
                                                     parity[0])
            # parity_class is decided by the guarded stage below
            # (guarded_strict.min >= 0.999)
            out["fidelity"] = fid
            out["stage"] = "fidelity"
            _emit(out)
        except Exception as e:
            print(f"# fidelity stage failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)

    # production-guarded presets (BENCH_GUARDED=0 skips). Two Pareto points
    # (PERF.md round 4a — no cheaper guarantee exists in the measured
    # design space):
    #   strict   — production + f32 cross-check, exact-CPU fallback on
    #              disagreement: min_corr >= 0.999 on the stress set (the
    #              guarantee; measures ~3.7x + fallbacks);
    #   envelope — free trust-region diagnostics: catches the
    #              out-of-distribution stress regime at ~0 cost (the <=10%
    #              option; cannot see in-envelope lottery samples).
    # worst-case cost: 3 fresh relay compiles (strict pair at Bg, the
    # diagnostics program) at minutes each — needs real headroom
    if (os.environ.get("BENCH_GUARDED", "1") != "0"
            and os.path.isfile(TRUTH_PATH)
            and _left() > float(os.environ.get("BENCH_GUARDED_MIN_S", "420"))):
        try:
            import jax
            import jax.numpy as jnp
            from transformer_explainability_tpu.explain.generator import (
                make_guarded_explain_fn, make_explain_fn, STRICT_AGREEMENT)
            Bg = int(os.environ.get("BENCH_GUARDED_BATCH", "32"))
            d = np.load(TRUTH_PATH)
            imgs, idx, truth = d["imgs"], d["idx"], d["truth"]
            n = len(imgs)
            pad = Bg - n
            imgs_p = np.concatenate(
                [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)]) \
                if pad > 0 else imgs[:Bg]
            idx_p = np.concatenate([idx, np.zeros((pad,), idx.dtype)]) \
                if pad > 0 else idx[:Bg]
            n_eff = min(n, Bg)

            def corr_stats(heat):
                corrs = []
                for i in range(n_eff):
                    a = heat[i].ravel().astype(np.float64)
                    b = truth[i].ravel()
                    a, b = a - a.mean(), b - b.mean()
                    corrs.append(float(a @ b / np.sqrt((a @ a) * (b @ b))))
                return np.asarray(corrs)

            strict = make_guarded_explain_fn(cfg, mode="strict",
                                             return_info=True)
            heat, info = strict(params, jnp.asarray(imgs_p),
                                jnp.asarray(idx_p), n_valid=n_eff)
            corrs = corr_stats(heat)
            g = {"mode": "strict", "agreement": STRICT_AGREEMENT,
                 "min": round(float(corrs.min()), 5),
                 "mean": round(float(corrs.mean()), 5),
                 "catdog": round(float(corrs[n_eff - 1]), 5),
                 "flagged": int(info["flagged"].sum()), "n": n_eff}
            out["min_corr"] = g["min"]
            fid_out = out.setdefault("fidelity", {})
            fid_out["guarded_strict"] = g
            fid_out["parity_class"] = bool(g["min"] >= 0.999)
            out["stage"] = "guarded-strict"
            _emit(out)

            # envelope mode (fallback="defer" — the serving policy: flags
            # route to an async verification queue; a sync fallback costs
            # ~2.1 s/flag, so the envelope's measured ~1% benign FP rate
            # would dominate — PERF.md 4d): flag counts on stress + on 96
            # fresh realistic augments (the FP-rate estimate), and the
            # diagnostics program's PIPELINED overhead vs plain production
            # (the deployment-relevant cost; single-batch sync timing
            # overstates it ~3x by exposing fill/drain)
            if _left() < float(os.environ.get("BENCH_ENVELOPE_MIN_S", "300")):
                raise TimeoutError(
                    f"envelope sub-stage skipped: {_left():.0f}s left")
            env = make_guarded_explain_fn(cfg, mode="envelope",
                                          fallback="defer", return_info=True)
            _, einfo = env(params, jnp.asarray(imgs_p), jnp.asarray(idx_p),
                           n_valid=n_eff)
            rngl = np.random.RandomState(7)
            cat = imgs[-1]
            n_real = 3 * Bg
            reals = np.stack([
                np.clip(cat * rngl.uniform(0.9, 1.1)
                        + rngl.randn(*cat.shape).astype(np.float32) * 0.02,
                        -1.5, 1.5) for _ in range(n_real)])
            ridx_all = np.full(n_real, 243, np.int32)
            flags_real = 0
            for lo in range(0, n_real, Bg):
                _, rinfo = env(params, jnp.asarray(reals[lo:lo + Bg]),
                               jnp.asarray(ridx_all[lo:lo + Bg]))
                flags_real += int(rinfo["flagged"].sum())
            rimgs = jnp.asarray(reals[:Bg])
            ridx = jnp.asarray(ridx_all[:Bg])
            plain32 = make_explain_fn(
                cfg, "transformer_attribution",
                matmul_precision=precision,
                relprop_precision=relprop_precision,
                attn_precision=attn_precision, mlp_precision=mlp_precision)
            diagp = make_explain_fn(
                cfg, "transformer_attribution", with_diagnostics=True,
                matmul_precision=precision,
                relprop_precision=relprop_precision,
                attn_precision=attn_precision, mlp_precision=mlp_precision)

            def _rate_diag(n_iter):
                t0 = time.perf_counter()
                outs = [diagp(params, rimgs, ridx) for _ in range(n_iter)]
                for hh, dd in outs:
                    np.asarray(hh), np.asarray(dd)
                return Bg * n_iter / (time.perf_counter() - t0)

            np.asarray(plain32(params, rimgs, ridx))
            _rate_diag(2)
            reps = int(os.environ.get("BENCH_REPS", "5"))
            niter = _n_iter(Bg)
            gr, pr = [], []
            for _ in range(reps):
                gr.append(_rate_diag(niter))
                pr.append(_rate_once(plain32, (params, rimgs, ridx),
                                     Bg, niter))
            fid_out["guarded_envelope"] = {
                "stress_flagged": int(einfo["flagged"].sum()), "n": n_eff,
                "realistic_flagged": flags_real,
                "realistic_n": n_real,
                "diag_rate": round(float(np.median(gr)), 2),
                "production_rate_same_batch": round(float(np.median(pr)), 2),
                "diag_overhead_pct": round(
                    100.0 * (np.median(pr) / np.median(gr) - 1.0), 2),
                "fallback_policy": "defer (async verification; sync "
                                   "fallback ~2.1 s/flag)"}
            out["stage"] = "guarded-envelope"
            _emit(out)
        except Exception as e:
            print(f"# guarded stage failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)

    extra_names = [m for m in os.environ.get(
        "BENCH_MODELS", "vit_l,bert_s512,bert_s128").split(",") if m]
    # each extra model is one fresh relay compile; take them one at a time
    # while budget remains, emitting after each
    for name in extra_names:
        if _left() < float(os.environ.get("BENCH_EXTRA_MIN_S", "180")):
            print(f"# extra model {name} skipped: {_left():.0f}s left "
                  f"of BENCH_BUDGET_S={budget_s:.0f}", file=sys.stderr)
            continue
        extra = _bench_extra_models([name], rng)
        if extra:
            out.setdefault("extra_models", {}).update(extra)
            out["stage"] = "extra-models"
            _emit(out)

    out["stage"] = "complete"
    out["elapsed_s"] = round(time.perf_counter() - t_start, 1)
    _emit(out)


if __name__ == "__main__":
    main()
