"""ImageNet-segmentation evaluation harness — the TPU analog of reference
``baselines/ViT/imagenet_seg_eval.py``.

Differences by design: explanations run batched through the jitted (optionally
mesh-sharded) explain program instead of a batch-1 Python loop; post-
processing (bilinear x16 upsample, min-max normalize, mean threshold, NaN
scrub — reference :212-230) is vectorized numpy; metrics accumulate exactly
the reference quantities (pixAcc/mIoU/mAP/mF1 + a final PR curve).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from transformer_explainability_tpu.models.vit import ViTConfig, VIT_BASE_16_224
from transformer_explainability_tpu.explain.generator import make_explain_fn
from transformer_explainability_tpu.utils import metrics as M

# harness method name -> (explain method, rule variant, start_layer)
# (reference imagenet_seg_eval.py:186-210: transformer_attribution uses the
# "ours" model with start_layer=1; full/partial-LRP baselines use the
# orig-LRP model == variant "lrp"; rollout/gradcam use raw attention.)
SEG_METHODS = {
    "rollout": ("rollout_attn", "ours", 1),
    "full_lrp": ("full", "lrp", 0),
    "transformer_attribution": ("transformer_attribution", "ours", 1),
    "lrp_last_layer": ("last_layer", "lrp", 0),
    "attn_last_layer": ("last_layer_attn", "lrp", 0),
    "attn_gradcam": ("attn_gradcam", "ours", 0),
}


def upsample_bilinear(x: np.ndarray, size: int = 224) -> np.ndarray:
    """(B, h, w) -> (B, size, size), torch align_corners=False semantics.

    Native multithreaded host kernel (parity-tested vs jax.image.resize,
    which remains the fallback) — the heatmaps are host-side numpy at this
    point, so resizing here avoids a host->device->host round trip."""
    from transformer_explainability_tpu import native
    x = np.asarray(x, np.float32)
    return native.resize_bilinear_chw(x[:, None], size, size)[:, 0]


def postprocess(res: np.ndarray, thr: float = 0.0):
    """Normalize + threshold one heatmap (H, W); returns
    (Res, Res_1, Res_0, Res_1_AP, Res_0_AP, pred_flat) as in the reference."""
    res = (res - res.min()) / (res.max() - res.min())
    ret = res.mean()
    res_1 = (res > ret).astype(np.float32)
    res_0 = (res <= ret).astype(np.float32)
    res_1_ap = res.copy()
    res_0_ap = 1 - res
    for a in (res_1, res_0, res_1_ap, res_0_ap):
        a[np.isnan(a)] = 0
    pred = np.clip(res, thr, None) / max(res.max(), 1e-30)
    return res, res_1, res_0, res_1_ap, res_0_ap, pred.reshape(-1)


def run_seg_eval(dataset, params, cfg: ViTConfig = VIT_BASE_16_224,
                 method: str = "transformer_attribution",
                 batch_size: int = 16, thr: float = 0.0,
                 is_ablation: bool = False, limit: Optional[int] = None,
                 save_dir: Optional[str] = None,
                 explain_fn=None, progress: bool = True,
                 save_images: int = 0, mesh=None,
                 precision: str = "float32") -> Dict[str, float]:
    """Evaluate a heatmap method against the 4276-image ImageNet-seg GT.

    ``dataset`` yields/indexes (normalized image (3,224,224), label (224,224));
    ``explain_fn`` may override the compiled program; ``mesh`` (a
    ``jax.sharding.Mesh`` with a ``data`` axis) shards the explain batch over
    devices instead — SPMD scale-out, identical metrics (tested on the
    virtual CPU mesh). ``precision`` is a named preset
    (explain.generator.PRECISION_PRESETS: float32 | production | bfloat16).
    Returns {pixAcc, mIoU, mAP, mF1} exactly as the reference prints them.
    """
    from transformer_explainability_tpu.data.imagenet_seg import batches
    from transformer_explainability_tpu.explain.generator import (
        precision_kwargs)

    expl_method, variant, start_layer = SEG_METHODS[method]
    prec_kw = precision_kwargs(precision)
    if explain_fn is None and mesh is not None:
        from transformer_explainability_tpu.parallel.mesh import (
            make_sharded_explain_fn)
        assert batch_size % mesh.shape["data"] == 0, \
            (batch_size, dict(mesh.shape))
        explain_fn = make_sharded_explain_fn(
            cfg, mesh, method=expl_method, start_layer=start_layer,
            is_ablation=is_ablation, variant=variant, **prec_kw)
    if explain_fn is None:
        explain_fn = make_explain_fn(cfg, method=expl_method,
                                     start_layer=start_layer,
                                     is_ablation=is_ablation, variant=variant,
                                     **prec_kw)

    total_inter = np.zeros(2, np.int64)
    total_union = np.zeros(2, np.int64)
    total_correct = np.int64(0)
    total_label = np.int64(0)
    total_ap, total_f1 = [], []
    predictions, targets = [], []

    it = batches(dataset, batch_size, limit)
    if progress:
        try:
            from tqdm import tqdm
            n = len(dataset) if limit is None else min(limit, len(dataset))
            it = tqdm(it, total=(n + batch_size - 1) // batch_size)
        except ImportError:
            pass

    g = cfg.grid
    n_saved = 0

    def dispatched():
        """Pipeline device dispatch against host postprocessing: enqueue the
        next batch's explain before transferring the current one (the axon
        relay's per-call latency hides behind device compute). Ragged final
        batches are padded to ``batch_size`` so one compiled program serves
        the whole run (a second compile costs minutes on a relay)."""
        pending = None
        for imgs, labels in it:
            B = imgs.shape[0]
            if B < batch_size:
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], batch_size - B, axis=0)])
            idx = np.full((imgs.shape[0],), -1, np.int32)  # predicted class
            out = explain_fn(params, jax.numpy.asarray(imgs),
                             jax.numpy.asarray(idx))
            if pending is not None:
                yield pending
            pending = (out, B, labels)
        if pending is not None:
            yield pending

    for out, B, labels in dispatched():
        heat = np.asarray(out, np.float32)[:B]
        if method == "full_lrp":
            maps = heat.reshape(B, cfg.img_size, cfg.img_size)
        else:
            maps = upsample_bilinear(heat.reshape(B, g, g), cfg.img_size)

        if save_dir and n_saved < save_images:
            # heatmap renderings like the reference's per-image dumps
            # (imagenet_seg_eval.py:232-260, hm_to_rgb + mask images)
            from transformer_explainability_tpu.utils import render as RD
            from PIL import Image as PILImage
            img_dir = os.path.join(save_dir, "images")
            os.makedirs(img_dir, exist_ok=True)
            for b in range(min(B, save_images - n_saved)):
                rgb = RD.hm_to_rgb(maps[b], scaling=1)
                PILImage.fromarray(
                    (rgb * 255).astype(np.uint8)).save(
                        os.path.join(img_dir, f"heatmap_{n_saved + b}.png"))
            n_saved += min(B, save_images - n_saved)

        for b in range(B):
            res, r1, r0, r1ap, r0ap, pred = postprocess(maps[b], thr)
            label = labels[b]
            output = np.stack([r0, r1])            # (2, H, W)
            output_ap = np.stack([r0ap, r1ap])
            correct, labeled = M.batch_pix_accuracy(output, label)
            inter, union = M.batch_intersection_union(output, label, 2)
            total_correct += np.int64(correct)
            total_label += np.int64(labeled)
            total_inter += inter.astype(np.int64)
            total_union += union.astype(np.int64)
            total_ap.append(M.get_ap_scores(output_ap[None], label[None])[0])
            total_f1.append(M.get_f1_scores(r1, label)[0])
            predictions.append(pred)
            targets.append(label.reshape(-1))

    pixAcc = float(total_correct / (np.spacing(1, dtype=np.float64)
                                    + total_label))
    iou = total_inter / (np.spacing(1, dtype=np.float64) + total_union)
    results = {
        "pixAcc": pixAcc,
        "mIoU": float(iou.mean()),
        "mAP": float(np.mean(total_ap)),
        "mF1": float(np.mean(total_f1)),
    }

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        from sklearn.metrics import precision_recall_curve
        pr, rc, _ = precision_recall_curve(
            np.concatenate(targets), np.concatenate(predictions))
        np.save(os.path.join(save_dir, "precision.npy"), pr)
        np.save(os.path.join(save_dir, "recall.npy"), rc)
        with open(os.path.join(save_dir,
                               f"result_mIoU_{results['mIoU']:.4f}.txt"),
                  "w") as f:
            f.write("Mean IoU over %d classes: %.4f\n" % (2, results["mIoU"]))
            f.write("Pixel-wise Accuracy: %2.2f%%\n" % (pixAcc * 100))
            f.write("Mean AP over %d classes: %.4f\n" % (2, results["mAP"]))
            f.write("Mean F1 over %d classes: %.4f\n" % (2, results["mF1"]))
    return results


def main(argv=None):
    import argparse
    from transformer_explainability_tpu.data.imagenet_seg import (
        ImagenetSegmentation)
    from transformer_explainability_tpu.params.convert import (
        load_vit_checkpoint)
    from transformer_explainability_tpu.models.vit import init_params

    p = argparse.ArgumentParser(description="ImageNet segmentation eval")
    p.add_argument("--imagenet-seg-path", required=True,
                   help="path to gtsegs_ijcv.mat")
    p.add_argument("--method", default="transformer_attribution",
                   choices=sorted(SEG_METHODS))
    p.add_argument("--checkpoint", default=None,
                   help=".pth/.npz ViT-B/16 checkpoint (random init if unset)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--thr", type=float, default=0.0)
    p.add_argument("--is-ablation", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--save-dir", default="run/imagenet_seg")
    p.add_argument("--save-images", type=int, default=0,
                   help="save the first N heatmap renderings")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the explain batch over N devices (data axis); "
                        "0 = single-device")
    p.add_argument("--precision", default="float32",
                   choices=["float32", "production", "bfloat16"],
                   help="precision preset: float32 = exact reference parity; "
                        "production = the measured speed/fidelity sweet spot "
                        "(tf32 passes, f32 attention island, bf16 rules/MLP "
                        "— PERF.md); bfloat16 = fastest, fidelity-tolerant")
    args = p.parse_args(argv)

    cfg = VIT_BASE_16_224
    if args.checkpoint:
        params = load_vit_checkpoint(args.checkpoint, cfg)
    else:
        import jax as _jax
        print("WARNING: no checkpoint given — using random weights")
        params = init_params(_jax.random.PRNGKey(0), cfg)

    mesh = None
    if args.mesh:
        from transformer_explainability_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_data=args.mesh, n_model=1)

    ds = ImagenetSegmentation(args.imagenet_seg_path)
    results = run_seg_eval(ds, params, cfg, args.method, args.batch_size,
                           args.thr, args.is_ablation, args.limit,
                           os.path.join(args.save_dir, args.method),
                           save_images=args.save_images, mesh=mesh,
                           precision=args.precision)
    print("Mean IoU over 2 classes: %.4f" % results["mIoU"])
    print("Pixel-wise Accuracy: %2.2f%%" % (results["pixAcc"] * 100))
    print("Mean AP over 2 classes: %.4f" % results["mAP"])
    print("Mean F1 over 2 classes: %.4f" % results["mF1"])


if __name__ == "__main__":
    main()
