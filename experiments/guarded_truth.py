"""Tuning data for the guarded production mode's chaos detector.

Generates exact-f32 CPU truth heatmaps (the valid f32-class anchor — CPU
orderings match f64 truth >= 0.99972 per-sample, PERF.md round 3d) for:

  * a STRESS set: N randn images with random target classes (seed 1 — a
    superset-disjoint draw from the committed fidelity_truth.npz seed-0
    set, so threshold tuning and the bench criterion never share samples);
  * a REALISTIC set: the catdog acceptance image plus mild photometric
    augmentations (noise/brightness/contrast/channel tints at real-image
    scale) — the regime production actually serves, where the guarded
    mode's false-positive (fallback) rate must be ~0.

Writes experiments/data/guarded_tuning.npz. Run on CPU in its own process:
    python experiments/guarded_truth.py --n 128
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse

import numpy as np

OUT = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                    "data", "guarded_tuning.npz")


def realistic_images(n_aug: int = 15) -> np.ndarray:
    """catdog + mild augmentations, normalized like the seg harness."""
    from PIL import Image
    img = Image.open("/root/reference/samples/catdog.png").convert(
        "RGB").resize((224, 224))
    base = ((np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5
            ).transpose(2, 0, 1)
    rng = np.random.RandomState(123)
    out = [base]
    for _ in range(n_aug):
        x = base.copy()
        x = x * rng.uniform(0.8, 1.2)                    # contrast
        x = x + rng.uniform(-0.2, 0.2)                   # brightness
        x = x + rng.uniform(-0.1, 0.1, (3, 1, 1))        # channel tint
        x = x + rng.randn(*x.shape).astype(np.float32) * 0.02   # sensor noise
        out.append(np.clip(x, -1.5, 1.5).astype(np.float32))
    return np.stack(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224 as cfg, init_params)
    from transformer_explainability_tpu.explain.generator import explain_single

    params = init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(1)                 # disjoint from truth seed 0
    stress_imgs = rng.randn(args.n, 3, 224, 224).astype(np.float32)
    stress_idx = rng.randint(0, 1000, args.n).astype(np.int32)
    real_imgs = realistic_images()
    real_idx = np.full(len(real_imgs), 243, np.int32)      # bull mastiff

    fn = jax.jit(lambda p, im, i: explain_single(
        p, im, i, cfg, matmul_precision="float32"))

    def run(imgs, idx, tag):
        outs = []
        for i in range(len(imgs)):
            outs.append(np.asarray(fn(params, jnp.asarray(imgs[i]),
                                      jnp.asarray(idx[i]))))
            if (i + 1) % 16 == 0:
                print(f"{tag} {i + 1}/{len(imgs)}", flush=True)
        return np.stack(outs).astype(np.float32)

    stress_truth = run(stress_imgs, stress_idx, "stress")
    real_truth = run(real_imgs, real_idx, "realistic")
    np.savez(args.out,
             stress_imgs=stress_imgs, stress_idx=stress_idx,
             stress_truth=stress_truth,
             real_imgs=real_imgs, real_idx=real_idx, real_truth=real_truth)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
