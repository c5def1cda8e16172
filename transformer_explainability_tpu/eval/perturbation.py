"""Positive/negative perturbation benchmark — the TPU analog of reference
``baselines/ViT/pertubation_eval_from_hdf5.py``.

Stage B: read results.hdf5 (images in [0,1], normalized heatmaps, targets),
and for 9 perturbation steps (10%..90% of pixels) zero out the most (positive)
or least (negative, ``vis = -vis``) relevant pixels, re-classify with the
frozen ViT, and record accuracy / logit-diff / prob-diff / log(target/second)
dissimilarity per step. The whole perturb->normalize->classify inner loop is
ONE jitted program over all 9 steps (the reference re-launches per step).

AUC over the 9-step accuracy curve is the paper's headline number (positive:
lower better; negative: higher better).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transformer_explainability_tpu.models import vit as vit_mod
from transformer_explainability_tpu.models.vit import ViTConfig, VIT_BASE_16_224
from transformer_explainability_tpu.data.imagenet_seg import MEAN, STD

PERTURB_STEPS = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)


def make_perturb_eval_fn(cfg: ViTConfig = VIT_BASE_16_224,
                         steps=PERTURB_STEPS,
                         matmul_precision: str = "float32"):
    """Build jitted ``fn(params, images01, vis, targets) -> dict of arrays``.

    images01: (B,3,H,W) in [0,1]; vis: (B, H*W) saliency (pre-negated by the
    caller for the negative test); targets: (B,).
    Output arrays: base_{correct,logit,prob,dissim} (B,), and per-step
    pertub_{correct, logit_diff, prob_diff, dissim} (9, B).
    """
    base_size = cfg.img_size * cfg.img_size
    ks = [int(base_size * s) for s in steps]

    def classify(params, images01):
        norm = (images01 - MEAN) / STD
        return jax.vmap(lambda im: vit_mod.forward(params, im, cfg))(norm)

    def stats(logits, targets):
        probs = jax.nn.softmax(logits, axis=-1)
        pred_logit = logits.max(axis=-1)
        pred_prob = probs.max(axis=-1)
        pred_class = logits.argmax(axis=-1)
        correct = (targets == pred_class).astype(jnp.float32)
        tprob = jnp.take_along_axis(probs, targets[:, None], axis=-1)[:, 0]
        second = jax.lax.top_k(probs, 2)[0][:, 1]
        dissim = jnp.log(tprob / second)
        return correct, pred_logit, pred_prob, pred_class, dissim

    def fn(params, images01, vis, targets):
        with jax.default_matmul_precision(matmul_precision):
            B = images01.shape[0]
            logits = classify(params, images01)
            (b_correct, b_logit, b_prob, _, b_dissim) = stats(logits, targets)

            outs = {"base_correct": b_correct, "base_dissim": b_dissim}
            flat = images01.reshape(B, 3, -1)
            order = jnp.argsort(vis, axis=-1, descending=True)

            step_out = []
            for k in ks:
                idx = order[:, :k]                       # (B, k)
                mask = jnp.ones((B, flat.shape[-1]), images01.dtype)
                mask = jax.vmap(lambda m, i: m.at[i].set(0.0))(mask, idx)
                pert = (flat * mask[:, None, :]).reshape(images01.shape)
                lo = classify(params, pert)
                c, pl, pp, _, d = stats(lo, targets)
                step_out.append((c, pl - b_logit, pp - b_prob, d))
            outs["pertub_correct"] = jnp.stack([s[0] for s in step_out])
            outs["pertub_logit_diff"] = jnp.stack([s[1] for s in step_out])
            outs["pertub_prob_diff"] = jnp.stack([s[2] for s in step_out])
            outs["pertub_dissim"] = jnp.stack([s[3] for s in step_out])
            return outs

    return jax.jit(fn)


def run_perturbation_eval(results_ds, params, cfg: ViTConfig = VIT_BASE_16_224,
                          neg: bool = False, batch_size: int = 16,
                          save_dir: Optional[str] = None,
                          limit: Optional[int] = None,
                          progress: bool = True) -> Dict[str, np.ndarray]:
    """results_ds: :class:`...data.expl_hdf5.ImagenetResults` (or anything
    with .batches()). Returns the 6 arrays the reference saves (:123-128)
    plus the step-accuracy curve and its AUC."""
    fn = make_perturb_eval_fn(cfg)
    acc = {k: [] for k in ("model_hits", "model_dissimilarities",
                           "perturbations_hits",
                           "perturbations_dissimilarities",
                           "perturbations_logit_diff",
                           "perturbations_prob_diff")}
    it = results_ds.batches(batch_size)
    if progress:
        try:
            from tqdm import tqdm
            it = tqdm(it, total=(len(results_ds) + batch_size - 1) // batch_size)
        except ImportError:
            pass
    def dispatched():
        # pipeline device dispatch against host accumulation; ragged final
        # batches are padded to batch_size so the 10-forward program compiles
        # ONCE (a second compile costs minutes on the relay) — same
        # discipline as seg.py/visualize.py
        pending = None
        n = 0
        for images, vis, targets in it:
            if limit is not None and n >= limit:
                break
            B = images.shape[0]
            if B < batch_size:
                pad = batch_size - B
                images = np.concatenate(
                    [images, np.repeat(images[-1:], pad, axis=0)])
                vis = np.concatenate([vis, np.repeat(vis[-1:], pad, axis=0)])
                targets = np.concatenate(
                    [targets, np.repeat(targets[-1:], pad)])
            v = vis.reshape(images.shape[0], -1)
            if neg:
                v = -v
            out = fn(params, jnp.asarray(images), jnp.asarray(v),
                     jnp.asarray(targets))
            n += B
            if pending is not None:
                yield pending
            pending = (out, B)
        if pending is not None:
            yield pending

    for out, B in dispatched():
        # slice away batch-padding rows (last axis = examples)
        out = {k: np.asarray(a)[..., :B] for k, a in out.items()}
        acc["model_hits"].append(out["base_correct"])
        acc["model_dissimilarities"].append(out["base_dissim"])
        acc["perturbations_hits"].append(out["pertub_correct"])
        acc["perturbations_dissimilarities"].append(out["pertub_dissim"])
        acc["perturbations_logit_diff"].append(out["pertub_logit_diff"])
        acc["perturbations_prob_diff"].append(out["pertub_prob_diff"])

    res = {k: np.concatenate(v, axis=-1) for k, v in acc.items()}
    curve = res["perturbations_hits"].mean(axis=1)
    res["step_accuracy"] = curve
    # AUC over fraction-removed in [0.1, 0.9] (trapezoid), x100 as in paper
    res["auc"] = float(np.trapezoid(curve, PERTURB_STEPS) /
                       (PERTURB_STEPS[-1] - PERTURB_STEPS[0]) * 100)

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        for k in ("model_hits", "model_dissimilarities", "perturbations_hits",
                  "perturbations_dissimilarities", "perturbations_logit_diff",
                  "perturbations_prob_diff"):
            np.save(os.path.join(save_dir, k + ".npy"), res[k])
    return res


def main(argv=None):
    import argparse
    from transformer_explainability_tpu.data.expl_hdf5 import ImagenetResults
    from transformer_explainability_tpu.params.convert import (
        load_vit_checkpoint)
    from transformer_explainability_tpu.models.vit import init_params

    p = argparse.ArgumentParser(description="Perturbation AUC benchmark")
    p.add_argument("--vis-dir", required=True,
                   help="directory containing results.hdf5 (stage A output)")
    p.add_argument("--neg", action="store_true",
                   help="negative perturbation (remove least relevant first)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--save-dir", default=None)
    args = p.parse_args(argv)

    cfg = VIT_BASE_16_224
    if args.checkpoint:
        params = load_vit_checkpoint(args.checkpoint, cfg)
    else:
        print("WARNING: no checkpoint given — using random weights")
        params = init_params(jax.random.PRNGKey(0), cfg)

    ds = ImagenetResults(args.vis_dir)
    res = run_perturbation_eval(ds, params, cfg, args.neg, args.batch_size,
                                args.save_dir, args.limit)
    print("base accuracy:", res["model_hits"].mean())
    print("steps:", list(PERTURB_STEPS))
    print("step accuracy:", res["step_accuracy"])
    print("AUC:", res["auc"])


if __name__ == "__main__":
    main()
