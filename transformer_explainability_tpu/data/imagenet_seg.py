"""ImageNet-segmentation dataset (gtsegs_ijcv.mat) — behavioral port of
reference ``data/Imagenet.py:42-81``: lazy h5py over the MATLAB object-ref
layout (``/value/img``, ``/value/gt``, with the transpose quirks), PIL-based
resize, no torch/torchvision dependency.

Preprocessing matches the seg harness (``imagenet_seg_eval.py:122-130``):
images resized 224x224 bilinear, scaled to [0,1], normalized mean/std 0.5;
labels resized with NEAREST and binarized by the loader's consumer.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image

MEAN = 0.5
STD = 0.5


def preprocess_image(img: Image.Image, size: int = 224) -> np.ndarray:
    """PIL -> normalized (3, size, size) float32 (torchvision Resize+ToTensor+
    Normalize(0.5, 0.5) equivalent)."""
    img = img.convert("RGB").resize((size, size), Image.BILINEAR)
    x = np.asarray(img, np.float32) / 255.0
    return ((x - MEAN) / STD).transpose(2, 0, 1)


def preprocess_label(lbl: Image.Image, size: int = 224) -> np.ndarray:
    lbl = lbl.resize((size, size), Image.NEAREST)
    return np.asarray(lbl).astype(np.int64)


class ImagenetSegmentation:
    """Iterable over (image (3,224,224) float32 normalized, target (224,224)
    int64) pairs from gtsegs_ijcv.mat."""

    CLASSES = 2

    def __init__(self, path: str, size: int = 224):
        import h5py
        self.path = path
        self.size = size
        self._h5 = None
        with h5py.File(path, "r") as f:
            self.length = len(f["/value/img"])

    def __len__(self):
        return self.length

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        import h5py
        if self._h5 is None:
            self._h5 = h5py.File(self.path, "r")
        f = self._h5
        img = np.array(f[f["/value/img"][index, 0]]).transpose((2, 1, 0))
        target = np.array(f[f[f["/value/gt"][index, 0]][0, 0]]).transpose((1, 0))
        img_p = preprocess_image(Image.fromarray(img), self.size)
        tgt_p = preprocess_label(Image.fromarray(target), self.size)
        return img_p, tgt_p


def batches(dataset, batch_size: int, limit: Optional[int] = None):
    """Simple host-side batcher (the reference uses a num_workers=1 DataLoader;
    on TPU the device is the bottleneck, so a plain generator suffices)."""
    n = len(dataset) if limit is None else min(limit, len(dataset))
    for start in range(0, n, batch_size):
        items = [dataset[i] for i in range(start, min(start + batch_size, n))]
        imgs = np.stack([it[0] for it in items])
        tgts = np.stack([it[1] for it in items])
        yield imgs, tgts
