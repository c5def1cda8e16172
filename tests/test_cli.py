"""CLI entry-point smoke tests: every harness main() runs end-to-end on tiny
synthetic inputs (random weights, CPU)."""

import json
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from test_imagenet_seg_data import _make_mat  # noqa: E402


def test_metrics_cli(tmp_path, capsys):
    from transformer_explainability_tpu.rationale import metrics as rmetrics
    from test_rationale import _mk_dataset, _mk_results
    from transformer_explainability_tpu.rationale import data as rdata

    anns = _mk_dataset(tmp_path)
    flat = rdata.load_flattened_documents(str(tmp_path))
    results = _mk_results(anns, flat)
    res_file = tmp_path / "results.jsonl"
    rdata.write_jsonl(results, str(res_file))
    score_file = tmp_path / "scores.json"

    scores = rmetrics.main(["--data_dir", str(tmp_path), "--split", "test",
                            "--results", str(res_file),
                            "--score_file", str(score_file)])
    assert "iou_scores" in scores
    assert json.load(open(score_file))["rationale_prf"]


def test_visualize_and_perturbation_cli(tmp_path, monkeypatch):
    """Stage A CLI -> results.hdf5 -> stage B CLI, tiny ViT via monkeypatched
    default config."""
    from PIL import Image
    from transformer_explainability_tpu.eval import visualize as vis_mod
    from transformer_explainability_tpu.eval import perturbation as pert_mod
    from transformer_explainability_tpu.models.vit import ViTConfig

    tiny = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                     num_heads=2, num_classes=10)
    monkeypatch.setattr(vis_mod, "VIT_BASE_16_224", tiny)
    monkeypatch.setattr(pert_mod, "VIT_BASE_16_224", tiny)

    # class-subdir image folder
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imagenet"
    for c in ("n01", "n02"):
        os.makedirs(img_dir / c)
        for i in range(2):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
                img_dir / c / f"{i}.png")

    out_dir = tmp_path / "vis"
    vis_mod.main(["--imagenet-dir", str(img_dir), "--method", "rollout",
                  "--batch-size", "2", "--out-dir", str(out_dir)])
    method_dir = out_dir / "rollout" / "top" / "not_ablation"
    assert (method_dir / "results.hdf5").exists()

    pert_mod.main(["--vis-dir", str(method_dir), "--batch-size", "2",
                   "--save-dir", str(tmp_path / "pert")])
    assert (tmp_path / "pert" / "perturbations_hits.npy").exists()
    pert_mod.main(["--vis-dir", str(method_dir), "--neg", "--batch-size",
                   "4"])


def test_seg_cli(tmp_path, monkeypatch):
    from transformer_explainability_tpu.eval import seg as seg_mod
    from transformer_explainability_tpu.models.vit import ViTConfig

    tiny = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                     num_heads=2, num_classes=10)
    monkeypatch.setattr(seg_mod, "VIT_BASE_16_224", tiny)
    mat = tmp_path / "gtsegs.mat"
    _make_mat(str(mat), n=3, H=16, W=16)
    # the synthetic mat is 16x16; ImagenetSegmentation resizes to cfg size
    import transformer_explainability_tpu.data.imagenet_seg as ds_mod
    orig = ds_mod.ImagenetSegmentation

    def patched(path, size=224):
        return orig(path, size=32)

    monkeypatch.setattr(
        "transformer_explainability_tpu.data.imagenet_seg."
        "ImagenetSegmentation", patched)
    seg_mod.main(["--imagenet-seg-path", str(mat), "--method",
                  "transformer_attribution", "--batch-size", "2",
                  "--save-dir", str(tmp_path / "run"), "--save-images", "2"])
    run_dir = tmp_path / "run" / "transformer_attribution"
    names = os.listdir(run_dir)
    assert any(n.startswith("result_mIoU_") for n in names)
    assert os.path.exists(run_dir / "images" / "heatmap_0.png")
