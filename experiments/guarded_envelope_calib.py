"""Calibrate ENVELOPE_BOUNDS on a DIVERSE real-image augment population
(round 4: the first calibration used 16 samples of one augment family and
leaked 2/32 false positives on the bench's different augments), and
measure the diagnostics program's clean overhead (no fallbacks) vs plain
production, interleaved, at serving batch.

Usage (TPU): python experiments/guarded_envelope_calib.py [--n 96]
Prints the new bounds dict (margin 1.3) and the overhead table.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

DATA = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "data")


def diverse_augments(n, seed=11):
    """catdog under a wide augment family: contrast/brightness/tint,
    sensor noise at several scales, small shifts, horizontal flip,
    mild blur (box), channel drop-scale."""
    from PIL import Image
    img = Image.open("/root/reference/samples/catdog.png").convert(
        "RGB").resize((224, 224))
    base = ((np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5
            ).transpose(2, 0, 1)
    rng = np.random.RandomState(seed)
    out = [base]
    while len(out) < n:
        x = base.copy()
        if rng.rand() < 0.5:
            x = x[:, :, ::-1].copy()                       # hflip
        x = x * rng.uniform(0.7, 1.3)                      # contrast
        x = x + rng.uniform(-0.3, 0.3)                     # brightness
        x = x + rng.uniform(-0.15, 0.15, (3, 1, 1))        # tint
        s = rng.choice([0.0, 0.01, 0.02, 0.05])
        x = x + rng.randn(*x.shape).astype(np.float32) * s  # noise
        if rng.rand() < 0.3:                               # box blur
            k = np.ones((1, 3, 3), np.float32) / 9.0
            from scipy.ndimage import convolve
            x = np.stack([convolve(c, k[0]) for c in x])
        dx, dy = rng.randint(-8, 9, 2)                     # shift
        x = np.roll(np.roll(x, dx, axis=1), dy, axis=2)
        out.append(np.clip(x, -2.0, 2.0).astype(np.float32))
    return np.stack(out[:n])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"
    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224 as cfg, init_params)
    from transformer_explainability_tpu.explain.generator import (
        make_explain_fn, precision_kwargs, calibrate_envelope, DIAG_FIELDS)

    params = init_params(jax.random.PRNGKey(0), cfg)
    diag_fn = make_explain_fn(cfg, "transformer_attribution",
                              with_diagnostics=True,
                              **precision_kwargs("production"))
    plain = make_explain_fn(cfg, "transformer_attribution",
                            **precision_kwargs("production"))
    B = args.batch
    imgs = diverse_augments(args.n)
    idxs = np.full(args.n, 243, np.int32)
    diags = []
    for lo in range(0, args.n, B):
        hi = min(lo + B, args.n)
        pad = B - (hi - lo)
        im = np.concatenate([imgs[lo:hi]] + ([np.zeros(
            (pad,) + imgs.shape[1:], np.float32)] if pad else []))
        ix = np.concatenate([idxs[lo:hi]] + ([np.zeros(pad, np.int32)]
                                             if pad else []))
        _, dg = diag_fn(params, jnp.asarray(im), jnp.asarray(ix))
        diags.append(np.asarray(dg)[:hi - lo])
        print(f"diag {hi}/{args.n}", flush=True)
    diag = np.concatenate(diags)
    np.save(_os.path.join(DATA, "guarded_envelope_calib_diag.npy"), diag)
    bounds = calibrate_envelope(diag, margin=1.3)
    print("ENVELOPE_BOUNDS = {")
    for f in DIAG_FIELDS:
        print(f'    "{f}": ({bounds[f][0]:.6g}, {bounds[f][1]:.6g}),')
    print("}")

    # clean overhead: diag vs plain, interleaved, pipelined
    im = jnp.asarray(imgs[:B])
    ix = jnp.asarray(idxs[:B])
    np.asarray(plain(params, im, ix))
    rates = {"diag": [], "plain": []}
    n_iter = max(2, int(np.ceil(128 / B)))
    for _ in range(5):
        t0 = time.perf_counter()
        outs = [diag_fn(params, im, ix) for _ in range(n_iter)]
        for h, dgo in outs:
            np.asarray(h), np.asarray(dgo)
        rates["diag"].append(B * n_iter / (time.perf_counter() - t0))
        t0 = time.perf_counter()
        outs = [plain(params, im, ix) for _ in range(n_iter)]
        for o in outs:
            np.asarray(o)
        rates["plain"].append(B * n_iter / (time.perf_counter() - t0))
    for k, r in rates.items():
        print(f"{k:6s} B={B}: median {float(np.median(r)):.1f} "
              f"reps={[round(x, 1) for x in r]}", flush=True)
    print(f"diag overhead: "
          f"{100 * (np.median(rates['plain']) / np.median(rates['diag']) - 1):.1f}%")


if __name__ == "__main__":
    main()
