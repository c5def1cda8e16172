"""Heatmap rendering — behavioral port of reference ``utils/render.py``
(``hm_to_rgb`` :153, seismic colormap). The reference's digit/border helpers
and its optional contour/gaussian-blur rendering paths are omitted: nothing
in the live harnesses exercises them (the seg eval calls ``hm_to_rgb`` with
defaults only, ``imagenet_seg_eval.py:255``)."""

from __future__ import annotations

import numpy as np
import matplotlib.cm as _cm


def vec2im(V: np.ndarray, shape=()):
    """Reshape a vector to a 2D map (square if no shape given), reference
    ``render.py`` vec2im."""
    V = np.asarray(V)
    if V.ndim == 2 and not shape:
        return V
    if not shape:
        n = int(np.sqrt(V.size))
        shape = (n, n)
    return V.reshape(shape)


def enlarge_image(img: np.ndarray, scaling: int = 3):
    """Nearest-neighbor upscale by integer factor."""
    if scaling < 1:
        raise ValueError("scaling factor needs to be an int >= 1")
    H, W = img.shape
    return img.repeat(scaling, axis=0).repeat(scaling, axis=1)


def repaint_corner_pixels(rgbimg: np.ndarray, scaling: int = 3):
    """Average-out the scaling-block corners used as color anchors."""
    rgbimg[0:scaling, 0:scaling] = (
        rgbimg[0, scaling] + rgbimg[scaling, 0] + rgbimg[scaling, scaling]) / 3.0
    rgbimg[-scaling:, -scaling:] = (
        rgbimg[-1, -1 - scaling] + rgbimg[-1 - scaling, -1]
        + rgbimg[-1 - scaling, -1 - scaling]) / 3.0
    return rgbimg


def hm_to_rgb(R: np.ndarray, X=None, scaling: int = 3, shape=(), sigma: int = 2,
              cmap: str = "bwr", normalize: bool = True) -> np.ndarray:
    """Heatmap -> RGB image via a diverging colormap (reference
    ``render.py:153-…``: normalize to [-1,1] by max |R|, shift to [0,1],
    enlarge, colorize)."""
    cmap_obj = getattr(_cm, cmap)
    R = vec2im(np.asarray(R, np.float64), shape)
    if normalize:
        m = np.max(np.abs(R))
        if m > 0:
            R = R / m
        R = (R + 1.0) / 2.0
    R = enlarge_image(R, scaling)
    rgb = cmap_obj(R.flatten())[..., 0:3].reshape(R.shape[0], R.shape[1], 3)
    return rgb


def normalize_inverse(img_chw: np.ndarray, mean, std) -> np.ndarray:
    """Undo a mean/std normalization (reference ``misc_functions.py``
    NormalizeInverse): returns the [0,1]-range image."""
    mean = np.asarray(mean, np.float32).reshape(-1, 1, 1)
    std = np.asarray(std, np.float32).reshape(-1, 1, 1)
    return np.clip(np.asarray(img_chw, np.float32) * std + mean, 0.0, 1.0)


def save_saliency_map(image: np.ndarray, saliency_map: np.ndarray,
                      filename: str):
    """JET-overlay saliency save (reference ``baselines/ViT/misc_functions.py:
    37-68``): normalize both, apply cv2 JET colormap to the saliency, add."""
    import cv2
    image = np.asarray(image, np.float32)
    saliency_map = np.asarray(saliency_map, np.float32)

    saliency_map = saliency_map - saliency_map.min()
    saliency_map = saliency_map / (saliency_map.max() + 1e-20)
    saliency_map = np.clip(saliency_map, 0, 1)

    image = image - image.min()
    image = image / (image.max() + 1e-20)

    if saliency_map.shape[:2] != image.shape[:2]:
        saliency_map = cv2.resize(saliency_map, (image.shape[1], image.shape[0]))

    color_heatmap = cv2.applyColorMap(
        np.uint8(255 * saliency_map), cv2.COLORMAP_JET)[..., ::-1] / 255.0
    img_with_heatmap = np.clip(0.5 * color_heatmap + 0.5 * image, 0, 1)
    cv2.imwrite(filename, np.uint8(255 * img_with_heatmap[..., ::-1]))
