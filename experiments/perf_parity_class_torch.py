"""Independent exact-f32 ordering #2: the torch reference itself.

Loads the committed truth set's seed-0 jax weights INTO the reference
``baselines/ViT/ViT_LRP.py`` model (via params.convert.
vit_state_dict_from_params) and measures its f32 transformer_attribution
per-sample corr vs the committed f64 truth. The torch reference is an
EXACT f32 program with a completely independent op ordering (different
framework, different BLAS) — its corr-vs-truth distribution is the
honest scale for how much exact-f32 members of the reference's
equivalence class spread on each sample.

CPU-only (no relay). Results to /tmp/perf_parity_class_torch.json.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json

import numpy as np

TRUTH = _os.path.join(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))), "experiments", "data", "fidelity_truth.npz")
OUT = "/tmp/perf_parity_class_torch.json"


def main():
    import sys
    import torch
    sys.path.insert(0, "/root/reference")
    from baselines.ViT import ViT_LRP
    import jax
    jax.config.update("jax_platforms", "cpu")
    from transformer_explainability_tpu.models.vit import (VIT_BASE_16_224,
                                                           init_params)
    from transformer_explainability_tpu.params.convert import (
        vit_state_dict_from_params)

    cfg = VIT_BASE_16_224
    params = init_params(jax.random.PRNGKey(0), cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in vit_state_dict_from_params(params, cfg).items()}
    ref = ViT_LRP.vit_base_patch16_224(pretrained=False)
    ref.eval()
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    print("missing:", missing, "unexpected:", unexpected, flush=True)
    assert not unexpected

    d = np.load(TRUTH)
    imgs, idx, truth = d["imgs"], d["idx"], d["truth"]
    cs = []
    for i in range(truth.shape[0]):
        xt = torch.tensor(imgs[i:i + 1], requires_grad=True)
        out = ref(xt)
        onehot = np.zeros((1, cfg.num_classes), dtype=np.float32)
        onehot[0, int(idx[i])] = 1
        ref.zero_grad()
        torch.sum(torch.from_numpy(onehot) * out).backward(retain_graph=True)
        cam = ref.relprop(torch.tensor(onehot),
                          method="transformer_attribution",
                          alpha=1).detach().numpy()
        a = cam.ravel().astype(np.float64)
        b = truth[i].ravel()
        a = a - a.mean()
        b = b - b.mean()
        cs.append(round(float(a @ b / np.sqrt((a @ a) * (b @ b))), 6))
        print(i, cs[-1], flush=True)
    res = {"torch_f32": cs, "mean": float(np.mean(cs)),
           "median": float(np.median(cs))}
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(res, flush=True)


if __name__ == "__main__":
    main()
