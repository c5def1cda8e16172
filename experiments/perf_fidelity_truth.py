"""Compute f64 CPU ground-truth transformer_attribution heatmaps for the
fidelity methodology (PERF.md round 2b): N randn samples + the catdog
acceptance image, ViT-B/16 @ 224 with seed-0 random weights. Caches to
--out (npz: imgs (N+1,3,224,224) f32, idx (N+1,) i32, truth (N+1,196) f64).

Run in its own process (x64 flips global dtypes):
    python experiments/perf_fidelity_truth.py --n 16 --out /tmp/fidelity_truth.npz
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--out", default="/tmp/fidelity_truth.npz")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from PIL import Image
    from transformer_explainability_tpu.models.vit import (
        VIT_BASE_16_224 as cfg, init_params)
    from transformer_explainability_tpu.explain.generator import explain_single

    params32 = init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                          params32)
    rng = np.random.RandomState(0)
    imgs = rng.randn(args.n, 3, 224, 224).astype(np.float32)
    idx = rng.randint(0, 1000, args.n).astype(np.int32)
    cat = Image.open("/root/reference/samples/catdog.png").convert(
        "RGB").resize((224, 224))
    catx = ((np.asarray(cat, np.float32) / 255.0 - 0.5) / 0.5
            ).transpose(2, 0, 1)[None]
    imgs = np.concatenate([imgs, catx], axis=0)
    idx = np.concatenate([idx, np.asarray([243], np.int32)])

    fn = jax.jit(lambda p, im, i: explain_single(
        p, im, i, cfg, matmul_precision="float32"))
    outs = []
    for i in range(len(imgs)):
        hm = np.asarray(fn(params, jnp.asarray(imgs[i], jnp.float64),
                           jnp.asarray(idx[i])))
        outs.append(hm)
        print(f"truth {i + 1}/{len(imgs)} done", flush=True)
    np.savez(args.out, imgs=imgs, idx=idx,
             truth=np.stack(outs).astype(np.float64))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
