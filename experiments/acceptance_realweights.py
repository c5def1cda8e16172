"""ONE-command real-checkpoint acceptance run (BASELINE.md's actual bar).

The offline environment has zero egress, so every in-repo parity result uses
shared random weights. THIS is the script to run the day a public checkpoint
is available (timm jx_vit_base_p16_224 `.pth`, DeiT hub checkpoint, or an
`.npz` export — URLs in params/convert.py DEFAULT_CFGS):

    python experiments/acceptance_realweights.py --checkpoint vit_b16.pth
        [--model vit_base_patch16_224]
        [--gtsegs /data/gtsegs_ijcv.mat --seg-limit 512]
        [--imagenet-val /data/imagenet/val --pert-limit 2000]
        [--out /tmp/acceptance]

Stages (each prints PASS/FAIL + numbers):
  A. golden heatmaps — ours (exact-f32 preset) vs the torch reference
     (reference example.ipynb cell 2 semantics) on samples/catdog.png
     (classes 243 bull mastiff / 282 tiger cat) and samples/dogbird.png
     (161 basset / 87 grey parrot), compared at the 196-token level
     (pre-upsample — strictly harder than pixel comparison after the
     common bilinear x16). fp32 tolerance: per-image Pearson corr >= 0.999
     AND max |diff| / max |ref| <= 1e-3. Also checks top-5 logits equality.
     (Skipped for `.npz` checkpoints if torch can't rebuild the reference.)
     NOTE: the thresholds assume TRAINED weights — with random weights the
     f32 reassociation-chaos floor (~0.985 corr between two exact f32
     programs, PERF.md "The f32 chaos floor") sits below them by design.
  B. ImageNet-segmentation subset — pixAcc/mIoU/mAP vs the paper's
     79.70 / 61.95 / 86.03 (reference imagenet_seg_eval.py:322-328).
  C. perturbation mini-curve — hdf5 saliency dump + positive/negative
     9-step curves and AUC vs the paper's 17.03 (pos, lower better) /
     54.16 (neg, higher better) (reference pertubation_eval_from_hdf5.py).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import os

import numpy as np

REFERENCE = os.environ.get("TE_REFERENCE_DIR", "/root/reference")
# (image, [target classes]) — the reference notebook's acceptance pairs
GOLDEN = [("catdog.png", [243, 282]), ("dogbird.png", [161, 87])]
PAPER = {"pixAcc": 79.70, "mIoU": 61.95, "mAP": 86.03,
         "pos_auc": 17.03, "neg_auc": 54.16}


def _load_sample(name):
    from PIL import Image
    from transformer_explainability_tpu.demo import preprocess
    path = os.path.join(REFERENCE, "samples", name)
    return preprocess(Image.open(path))


def stage_a(args, cfg, params):
    import jax.numpy as jnp
    from transformer_explainability_tpu.explain.generator import make_explain_fn

    fn = make_explain_fn(cfg, method="transformer_attribution",
                         matmul_precision="float32")
    results, all_ok = [], True

    # reference side: rebuild the torch model from the same checkpoint
    ref = None
    if not args.checkpoint.endswith(".npz"):
        import torch
        _sys.path.insert(0, REFERENCE)
        from baselines.ViT import ViT_LRP
        kw = dict(patch_size=cfg.patch_size, embed_dim=cfg.embed_dim,
                  depth=cfg.depth, num_heads=cfg.num_heads,
                  mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                  num_classes=cfg.num_classes)
        ref = ViT_LRP.VisionTransformer(**kw)
        ckpt = torch.load(args.checkpoint, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
        missing = ref.load_state_dict(
            {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()},
            strict=False)
        print(f"# reference load: missing={list(missing.missing_keys)} "
              f"unexpected={list(missing.unexpected_keys)}")
        ref.eval()
    else:
        print("# .npz checkpoint: reference-side comparison skipped "
              "(golden renders only)")

    for name, classes in GOLDEN:
        img = _load_sample(name)
        imgs = jnp.asarray(img[None])
        # ours: logits + per-class heatmaps
        from transformer_explainability_tpu.models import vit as vit_mod
        logits = np.asarray(vit_mod.forward(params, jnp.asarray(img), cfg))
        top5 = np.argsort(-logits)[:5].tolist()
        row = {"image": name, "top5": top5}
        if ref is not None:
            import torch
            # no torch.no_grad(): the reference forward registers grad hooks
            ref_logits = ref(torch.tensor(img[None], requires_grad=True)
                             ).detach().numpy()[0]
            row["ref_top5"] = np.argsort(-ref_logits)[:5].tolist()
            fwd_ok = row["ref_top5"] == top5
            all_ok &= fwd_ok
        for c in classes + [int(top5[0])]:
            ours = np.asarray(fn(params, imgs,
                                 jnp.asarray([c], jnp.int32)))[0]
            entry = {"class": int(c)}
            if ref is not None:
                import torch
                xt = torch.tensor(img[None], requires_grad=True)
                out_t = ref(xt)
                onehot = np.zeros((1, cfg.num_classes), np.float32)
                onehot[0, c] = 1
                score = torch.sum(torch.from_numpy(onehot) * out_t)
                ref.zero_grad()
                score.backward(retain_graph=True)
                want = ref.relprop(torch.tensor(onehot),
                                   method="transformer_attribution",
                                   alpha=1, start_layer=0)
                want = want.detach().numpy().reshape(-1)
                a = ours.reshape(-1).astype(np.float64)
                b = want.astype(np.float64)
                corr = float(np.corrcoef(a, b)[0, 1])
                relmax = float(np.abs(a - b).max() / max(np.abs(b).max(),
                                                         1e-30))
                ok = corr >= 0.999 and relmax <= 1e-3
                all_ok &= ok
                entry.update(corr=round(corr, 6), rel_max_diff=relmax,
                             ok=ok)
            if args.out:
                os.makedirs(args.out, exist_ok=True)
                np.save(os.path.join(
                    args.out, f"{name.split('.')[0]}_cls{c}.npy"), ours)
            row.setdefault("classes", []).append(entry)
        results.append(row)
        print(f"# A {name}: {json.dumps(row)}")
    print(f"STAGE A (golden heatmaps): "
          f"{'PASS' if all_ok and ref is not None else ('RENDER-ONLY' if ref is None else 'FAIL')}")
    return {"ok": bool(all_ok), "results": results}


def stage_b(args, cfg, params):
    from transformer_explainability_tpu.data.imagenet_seg import (
        ImagenetSegmentation)
    from transformer_explainability_tpu.eval.seg import run_seg_eval
    ds = ImagenetSegmentation(args.gtsegs)
    m = run_seg_eval(ds, params, cfg, method="transformer_attribution",
                     batch_size=16, limit=args.seg_limit,
                     precision=args.precision)
    print(f"# B seg subset (n={args.seg_limit}): {json.dumps(m)}")
    print(f"#   paper (full 4276): pixAcc {PAPER['pixAcc']} "
          f"mIoU {PAPER['mIoU']} mAP {PAPER['mAP']}")
    ok = m["mIoU"] * 100 >= PAPER["mIoU"] - args.seg_tol
    print(f"STAGE B (segmentation): {'PASS' if ok else 'FAIL'} "
          f"(mIoU within {args.seg_tol} pts of paper)")
    return {"ok": bool(ok), **{k: float(v) for k, v in m.items()}}


def stage_c(args, cfg, params):
    from transformer_explainability_tpu.data.folder import folder_batches
    from transformer_explainability_tpu.eval.visualize import (
        compute_saliency_and_save)
    from transformer_explainability_tpu.data.expl_hdf5 import ImagenetResults
    from transformer_explainability_tpu.eval.perturbation import (
        run_perturbation_eval)
    out_dir = args.out or "/tmp/acceptance"
    os.makedirs(out_dir, exist_ok=True)
    h5 = os.path.join(out_dir, "results.hdf5")
    data = folder_batches(args.imagenet_val, batch_size=16,
                          limit=args.pert_limit)
    compute_saliency_and_save(data, params, h5, cfg=cfg,
                              method="transformer_attribution",
                              vis_class="top", precision=args.precision,
                              batch_size=16)
    res = {}
    for neg in (False, True):
        r = run_perturbation_eval(ImagenetResults(h5), params, cfg, neg=neg,
                                  batch_size=16)
        auc = float(r["auc"]) * 100
        res["neg_auc" if neg else "pos_auc"] = auc
        print(f"# C {'neg' if neg else 'pos'} perturbation AUC: {auc:.2f} "
              f"(paper {'%.2f' % PAPER['neg_auc' if neg else 'pos_auc']}, "
              f"{'higher' if neg else 'lower'} better)")
    ok = (res["pos_auc"] <= PAPER["pos_auc"] + args.pert_tol
          and res["neg_auc"] >= PAPER["neg_auc"] - args.pert_tol)
    print(f"STAGE C (perturbation): {'PASS' if ok else 'FAIL'} "
          f"(within {args.pert_tol} pts of paper)")
    return {"ok": bool(ok), **res}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="timm/DeiT .pth or repo .npz")
    ap.add_argument("--model", default="vit_base_patch16_224")
    ap.add_argument("--gtsegs", default=None,
                    help="gtsegs_ijcv.mat path (stage B)")
    ap.add_argument("--seg-limit", type=int, default=512)
    ap.add_argument("--seg-tol", type=float, default=2.0)
    ap.add_argument("--imagenet-val", default=None,
                    help="ImageNet val dir (stage C)")
    ap.add_argument("--pert-limit", type=int, default=2000)
    ap.add_argument("--pert-tol", type=float, default=3.0)
    ap.add_argument("--precision", default="float32",
                    help="preset for stages B/C (A always exact-f32)")
    ap.add_argument("--out", default="/tmp/acceptance")
    args = ap.parse_args()

    from transformer_explainability_tpu.models.registry import create_model
    cfg, params = create_model(args.model, checkpoint=args.checkpoint)

    report = {"checkpoint": args.checkpoint, "model": args.model,
              "A": stage_a(args, cfg, params)}
    if args.gtsegs:
        report["B"] = stage_b(args, cfg, params)
    else:
        print("STAGE B skipped (--gtsegs not given)")
    if args.imagenet_val:
        report["C"] = stage_c(args, cfg, params)
    else:
        print("STAGE C skipped (--imagenet-val not given)")
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "acceptance.json"), "w") as f:
            json.dump(report, f, indent=1)
        print(f"report -> {os.path.join(args.out, 'acceptance.json')}")


if __name__ == "__main__":
    main()
