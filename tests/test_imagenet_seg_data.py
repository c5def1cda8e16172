"""gtsegs_ijcv.mat loader: synthesize the MATLAB-v7.3 object-ref layout and
check orientation/transpose handling (reference data/Imagenet.py:56-72)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from transformer_explainability_tpu.data.imagenet_seg import (
    ImagenetSegmentation, batches)


def _make_mat(path, n=3, H=16, W=16, seed=0):
    """MATLAB HxWx3 arrays are stored (3, W, H) in the v7.3 HDF5 file; masks
    (H, W) are stored (W, H); /value/img and /value/gt are (N, 1) object-ref
    tables, gt with one extra indirection (cell of cells)."""
    rng = np.random.RandomState(seed)
    truth = []
    with h5py.File(path, "w") as f:
        val = f.create_group("value")
        img_refs = val.create_dataset(
            "img", (n, 1), dtype=h5py.ref_dtype)
        gt_refs = val.create_dataset(
            "gt", (n, 1), dtype=h5py.ref_dtype)
        for i in range(n):
            img_hwc = rng.randint(0, 255, (H, W, 3), np.uint8)
            mask_hw = (rng.rand(H, W) > 0.5).astype(np.uint8)
            truth.append((img_hwc, mask_hw))
            dimg = f.create_dataset(f"img_{i}",
                                    data=img_hwc.transpose(2, 1, 0))
            dmask = f.create_dataset(f"mask_{i}", data=mask_hw.T)
            cell = f.create_dataset(f"gtcell_{i}", (1, 1),
                                    dtype=h5py.ref_dtype)
            cell[0, 0] = dmask.ref
            img_refs[i, 0] = dimg.ref
            gt_refs[i, 0] = cell.ref
    return truth


def test_mat_loader_orientation(tmp_path):
    path = str(tmp_path / "gtsegs.mat")
    truth = _make_mat(path, n=3, H=16, W=16)
    ds = ImagenetSegmentation(path, size=16)
    assert len(ds) == 3
    for i, (img_hwc, mask_hw) in enumerate(truth):
        img_p, tgt_p = ds[i]
        assert img_p.shape == (3, 16, 16) and tgt_p.shape == (16, 16)
        # identity resize -> exact normalization round-trip
        want = ((img_hwc.astype(np.float32) / 255.0) - 0.5) / 0.5
        np.testing.assert_allclose(img_p, want.transpose(2, 0, 1), atol=1e-6)
        np.testing.assert_array_equal(tgt_p, mask_hw)


def test_mat_loader_batches(tmp_path):
    path = str(tmp_path / "gtsegs.mat")
    _make_mat(path, n=5, H=16, W=16)
    ds = ImagenetSegmentation(path, size=16)
    got = list(batches(ds, 2, limit=4))
    assert [b[0].shape[0] for b in got] == [2, 2]
    assert got[0][0].dtype == np.float32
    assert got[0][1].dtype == np.int64
