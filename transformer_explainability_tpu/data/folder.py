"""ImageFolder-style loader (class-subdirectory layout, the torchvision
ImageNet convention the reference's ``generate_visualizations.py:200`` relies
on) with background-thread prefetch — the jax-friendly replacement for
DataLoader workers (SURVEY §2.9 'multi-process host parallel')."""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np
from PIL import Image

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def list_folder(root: str):
    """Returns (paths, targets, class_names); classes sorted by name."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    paths, targets = [], []
    for ci, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for fn in sorted(os.listdir(cdir)):
            if os.path.splitext(fn)[1].lower() in IMG_EXTS:
                paths.append(os.path.join(cdir, fn))
                targets.append(ci)
    return paths, np.asarray(targets, np.int64), classes


def load_image(path: str, size: int = 224) -> np.ndarray:
    """-> (3, size, size) float32 in [0,1] (resize bilinear, NO normalize —
    the hdf5 contract stores unnormalized images)."""
    img = Image.open(path).convert("RGB").resize((size, size), Image.BILINEAR)
    return (np.asarray(img, np.float32) / 255.0).transpose(2, 0, 1)


def _load_image_u8(path: str, size: int) -> np.ndarray:
    """-> (size, size, 3) uint8 — decode/resize only; the float conversion
    happens batched in the native library."""
    img = Image.open(path).convert("RGB").resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def folder_batches(root: str, batch_size: int, size: int = 224,
                   limit: Optional[int] = None, prefetch: int = 2,
                   normalize=None) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (images (B,3,S,S), targets (B,)) with a prefetch thread.

    ``normalize=None`` yields [0,1] floats (the hdf5 contract);
    ``normalize=(mean, std)`` yields normalized floats via the native
    multithreaded uint8->CHW kernel
    (:mod:`transformer_explainability_tpu.native`)."""
    paths, targets, _ = list_folder(root)
    n = len(paths) if limit is None else min(limit, len(paths))

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    DONE = object()

    def worker():
        from transformer_explainability_tpu import native
        for s in range(0, n, batch_size):
            e = min(s + batch_size, n)
            if normalize is not None:
                u8 = np.stack([_load_image_u8(p, size) for p in paths[s:e]])
                imgs = native.normalize_chw(u8, *normalize)
            else:
                imgs = np.stack([load_image(p, size) for p in paths[s:e]])
            q.put((imgs, targets[s:e]))
        q.put(DONE)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is DONE:
            break
        yield item
