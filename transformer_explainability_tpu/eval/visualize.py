"""Saliency-map pre-generation -> results.hdf5 — the TPU analog of reference
``baselines/ViT/generate_visualizations.py``.

Stage A of the two-stage perturbation benchmark: compute heatmaps for a
(sub)set of ImageNet-val-like images and append them (with the *unnormalized*
images and targets) into ``results.hdf5`` — the file contract Stage B
(:mod:`.perturbation`) consumes. Heatmaps are min-max normalized after x16
bilinear upsample exactly as the reference (:98-101).
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_explainability_tpu.models.vit import ViTConfig, VIT_BASE_16_224
from transformer_explainability_tpu.explain.generator import make_explain_fn
from transformer_explainability_tpu.data.expl_hdf5 import ResultsWriter
from transformer_explainability_tpu.data.imagenet_seg import MEAN, STD

# harness method -> (explain method, variant, start_layer)
# (reference generate_visualizations.py:70-96; 'lrp' and
# 'transformer_attribution' are the same computation — "grad" is a legacy
# alias, ViT_LRP.py:357)
VIS_METHODS = {
    "rollout": ("rollout_attn", "ours", 1),
    "lrp": ("transformer_attribution", "ours", 1),
    "transformer_attribution": ("transformer_attribution", "ours", 1),
    "full_lrp": ("full", "lrp", 0),
    "lrp_last_layer": ("last_layer", "lrp", 0),
    "attn_last_layer": ("last_layer_attn", "ours", 0),
    "attn_gradcam": ("attn_gradcam", "ours", 0),
}


def compute_saliency_and_save(data_iter: Iterable[Tuple[np.ndarray, np.ndarray]],
                              params, out_path: str,
                              cfg: ViTConfig = VIT_BASE_16_224,
                              method: str = "transformer_attribution",
                              vis_class: str = "top",
                              class_id: int = 0,
                              is_ablation: bool = False,
                              explain_fn=None, mesh=None,
                              precision: str = "float32",
                              batch_size: Optional[int] = None) -> int:
    """data_iter yields (images (B,3,H,W) in [0,1] UNnormalized, targets (B,)).

    vis_class: 'top' (predicted class), 'target' (ground truth), or 'index'
    (fixed ``class_id``) — reference ``--vis-class`` (:66-68,136-140).
    ``mesh`` (a Mesh with a ``data`` axis) shards each explain batch over
    devices (batch sizes must divide by the data-axis size). ``precision``
    is a named preset (explain.generator.PRECISION_PRESETS).
    ``batch_size``: the compiled batch size; short batches (including a
    short FIRST batch, e.g. --limit < --batch-size) are padded to it.
    Defaults to the first yielded batch's size.
    Returns the number of examples written.
    """
    from transformer_explainability_tpu.explain.generator import (
        precision_kwargs)
    expl_method, variant, start_layer = VIS_METHODS[method]
    prec_kw = precision_kwargs(precision)
    if explain_fn is None and mesh is not None:
        from transformer_explainability_tpu.parallel.mesh import (
            make_sharded_explain_fn)
        explain_fn = make_sharded_explain_fn(
            cfg, mesh, method=expl_method, start_layer=start_layer,
            is_ablation=is_ablation, variant=variant, **prec_kw)
    if explain_fn is None:
        explain_fn = make_explain_fn(cfg, method=expl_method,
                                     start_layer=start_layer,
                                     is_ablation=is_ablation, variant=variant,
                                     **prec_kw)
    if mesh is not None and batch_size is not None:
        assert batch_size % mesh.shape["data"] == 0, \
            (batch_size, dict(mesh.shape))
    g = cfg.grid
    n_written = 0

    def dispatched():
        # pipeline device dispatch against the gzip-compressed hdf5 writes;
        # ragged batches (incl. a short first batch) padded to batch_size
        # (one compile; a second costs minutes on a relay)
        nonlocal batch_size
        pending = None
        for images, targets in data_iter:
            B = images.shape[0]
            if batch_size is None:
                batch_size = B
            if B < batch_size:
                images = np.concatenate(
                    [images, np.repeat(images[-1:], batch_size - B, axis=0)])
            if vis_class == "top":
                idx = np.full((images.shape[0],), -1, np.int32)
            elif vis_class == "target":
                idx = np.full((images.shape[0],), 0, np.int32)
                idx[:B] = np.asarray(targets, np.int32)
            elif vis_class == "index":
                idx = np.full((images.shape[0],), class_id, np.int32)
            else:
                raise ValueError(vis_class)
            norm = (np.asarray(images, np.float32) - MEAN) / STD
            out = explain_fn(params, jnp.asarray(norm), jnp.asarray(idx))
            if pending is not None:
                yield pending
            pending = (out, B, images, targets)
        if pending is not None:
            yield pending

    with ResultsWriter(out_path, cfg.img_size) as w:
        for out, B, images, targets in dispatched():
            heat = np.asarray(out, np.float32)[:B]
            images = images[:B]
            if method == "full_lrp":
                res = heat.reshape(B, 1, cfg.img_size, cfg.img_size)
            else:
                # native multithreaded host resize (numpy is host-side here;
                # jax.image fallback inside when the toolchain is absent)
                from transformer_explainability_tpu import native
                res = native.resize_bilinear_chw(
                    heat.reshape(B, 1, g, g), cfg.img_size, cfg.img_size)
            # per-image min-max: the reference's normalization line (:100)
            # runs at its default batch_size=1, i.e. per image — a batch
            # min-max would make each stored map depend on which images
            # shared its batch (not reproducible across batch sizes)
            mn = res.min(axis=(1, 2, 3), keepdims=True)
            mx = res.max(axis=(1, 2, 3), keepdims=True)
            res = (res - mn) / (mx - mn)
            w.append(np.asarray(images, np.float32), res,
                     np.asarray(targets, np.int32))
            n_written += B
    return n_written


def main(argv=None):
    import argparse
    from transformer_explainability_tpu.params.convert import (
        load_vit_checkpoint)
    from transformer_explainability_tpu.models.vit import init_params

    p = argparse.ArgumentParser(description="Pre-generate saliency maps")
    p.add_argument("--imagenet-dir", "--imagenet-validation-path",
                   dest="imagenet_dir", required=True,
                   help="directory of class-subdir images (ImageNet-val style)")
    # Reference-CLI compatibility: the reference parses --lmd/--cls-agn and
    # five --no-* ablation switches but never reads any of them anywhere
    # (generate_visualizations.py:115-145 — add_argument only, grep-verified)
    # — accepted here so reference command lines run unchanged; inert by
    # construction, exactly as upstream.
    p.add_argument("--lmd", type=float, default=10, help=argparse.SUPPRESS)
    p.add_argument("--cls-agn", action="store_true", help=argparse.SUPPRESS)
    for flag in ("no-ia", "no-fx", "no-fgx", "no-m", "no-reg"):
        p.add_argument(f"--{flag}", action="store_true",
                       help=argparse.SUPPRESS)
    p.add_argument("--method", default="transformer_attribution",
                   choices=sorted(VIS_METHODS))
    p.add_argument("--vis-class", default="top",
                   choices=["top", "target", "index"])
    p.add_argument("--class-id", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--is-ablation", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--out-dir", default="visualizations")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the explain batch over N devices (data axis); "
                        "0 = single-device")
    p.add_argument("--precision", default="float32",
                   choices=["float32", "production", "bfloat16"],
                   help="precision preset (see explain.generator."
                        "PRECISION_PRESETS / PERF.md)")
    args = p.parse_args(argv)

    cfg = VIT_BASE_16_224
    if args.checkpoint:
        params = load_vit_checkpoint(args.checkpoint, cfg)
    else:
        print("WARNING: no checkpoint given — using random weights")
        params = init_params(jax.random.PRNGKey(0), cfg)

    if args.vis_class == "index":
        method_dir = os.path.join(args.out_dir, args.method,
                                  f"{args.vis_class}_{args.class_id}")
    else:
        ablation = "ablation" if args.is_ablation else "not_ablation"
        method_dir = os.path.join(args.out_dir, args.method, args.vis_class,
                                  ablation)
    os.makedirs(method_dir, exist_ok=True)

    mesh = None
    if args.mesh:
        from transformer_explainability_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_data=args.mesh, n_model=1)
        assert args.batch_size % args.mesh == 0, (args.batch_size, args.mesh)

    from transformer_explainability_tpu.data.folder import folder_batches
    it = folder_batches(args.imagenet_dir, args.batch_size, cfg.img_size,
                        limit=args.limit)
    n = compute_saliency_and_save(
        it, params, os.path.join(method_dir, "results.hdf5"), cfg,
        args.method, args.vis_class, args.class_id, args.is_ablation,
        mesh=mesh, precision=args.precision, batch_size=args.batch_size)
    print(f"wrote {n} examples to {method_dir}/results.hdf5")


if __name__ == "__main__":
    main()
