"""Runnable analog of the reference's ``example.ipynb``: explain an image
with every method and save the overlays.

    python examples/vit_explain.py --image catdog.png --class-index 243 \
        [--checkpoint jx_vit_base_p16_224.pth] [--out-dir out]

Without a checkpoint the model runs with random weights (still exercises the
full pipeline; heatmaps are meaningless)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--class-index", type=int, default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--methods", nargs="+",
                   default=["transformer_attribution", "rollout_attn",
                            "attn_gradcam", "full"])
    p.add_argument("--out-dir", default="out")
    args = p.parse_args()

    import jax
    from PIL import Image
    from transformer_explainability_tpu import demo
    from transformer_explainability_tpu.models.vit import (VIT_BASE_16_224,
                                                           init_params)

    if args.checkpoint:
        d = demo.Demo.from_checkpoint(args.checkpoint)
    else:
        print("WARNING: no checkpoint — random weights")
        d = demo.Demo(init_params(jax.random.PRNGKey(0), VIT_BASE_16_224))

    img = Image.open(args.image)
    d.print_top_classes(img)

    os.makedirs(args.out_dir, exist_ok=True)
    for method in args.methods:
        overlay = d.generate_visualization(img, args.class_index, method)
        path = os.path.join(args.out_dir, f"{method}.png")
        Image.fromarray((overlay * 255).astype(np.uint8)).save(path)
        print("wrote", path)


if __name__ == "__main__":
    main()
