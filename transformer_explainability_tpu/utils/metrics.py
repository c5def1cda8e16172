"""Segmentation metrics (numpy) — behavioral port of reference
``utils/metrices.py`` (sic): pixel accuracy, intersection/union histograms,
per-image AP and F1, IoU. Inputs are numpy arrays; no torch.
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import (average_precision_score, f1_score,
                             precision_recall_curve, roc_curve)

SMOOTH = 1e-6


def batch_pix_accuracy(predict: np.ndarray, target: np.ndarray):
    """predict: (K, H, W) class scores; target: (H, W) int labels.
    Returns (pixel_correct, pixel_labeled). Reference ``metrices.py:135-151``:
    argmax over classes, +1 shift, unlabeled (<0 after shift... <=0) ignored."""
    pred = predict.argmax(axis=0) + 1
    tgt = np.asarray(target) + 1
    pixel_labeled = np.sum(tgt > 0)
    pixel_correct = np.sum((pred == tgt) * (tgt > 0))
    assert pixel_correct <= pixel_labeled
    return pixel_correct, pixel_labeled


def batch_intersection_union(predict: np.ndarray, target: np.ndarray,
                             nclass: int):
    """Per-class intersection/union areas via histograms
    (reference ``metrices.py:154-177``)."""
    pred = predict.argmax(axis=0) + 1
    tgt = np.asarray(target) + 1
    pred = pred * (tgt > 0).astype(pred.dtype)
    intersection = pred * (pred == tgt)
    area_inter, _ = np.histogram(intersection, bins=nclass, range=(1, nclass))
    area_pred, _ = np.histogram(pred, bins=nclass, range=(1, nclass))
    area_lab, _ = np.histogram(tgt, bins=nclass, range=(1, nclass))
    area_union = area_pred + area_lab - area_inter
    assert (area_inter <= area_union).all()
    return area_inter, area_union


def get_ap_scores(predict: np.ndarray, target: np.ndarray,
                  ignore_index: int = -1):
    """predict: (B, K, H, W) scores; target: (B, H, W) int. Per-image AP on
    the one-hot expansion (reference ``metrices.py:81-99``)."""
    total = []
    for pred, tgt in zip(predict, target):
        K = pred.shape[0]
        tgt_exp = np.broadcast_to(tgt[None], pred.shape).reshape(-1)
        onehot = (np.arange(K)[:, None, None] ==
                  np.clip(tgt, 0, None)[None]).astype(np.float64)
        p = pred.reshape(-1)[tgt_exp != ignore_index]
        t = onehot.reshape(-1)[tgt_exp != ignore_index]
        total.append(np.nan_to_num(average_precision_score(t, p)))
    return total


def get_f1_scores(predict: np.ndarray, target: np.ndarray,
                  ignore_index: int = -1):
    """predict: binary (H, W) (or batched); target: same shape int
    (reference ``metrices.py:26-38``)."""
    predict = np.asarray(predict)
    target = np.asarray(target)
    if predict.ndim == 2:
        predict, target = predict[None], target[None]
    total = []
    for p, t in zip(predict, target):
        p, t = p.reshape(-1), t.reshape(-1)
        keep = t != ignore_index
        total.append(np.nan_to_num(f1_score(t[keep], p[keep])))
    return total


def get_iou(outputs: np.ndarray, labels: np.ndarray):
    """Boolean IoU per image, smoothed (reference ``metrices.py:11-23``)."""
    outputs = np.asarray(outputs).astype(bool)
    labels = np.asarray(labels).astype(bool)
    if outputs.ndim == 4:
        outputs = outputs.squeeze(1)
    if labels.ndim == 4:
        labels = labels.squeeze(1)
    inter = (outputs & labels).sum((1, 2)).astype(np.float64)
    union = (outputs | labels).sum((1, 2)).astype(np.float64)
    return (inter + SMOOTH) / (union + SMOOTH)


def get_pr(predict, target, ignore_index=-1):
    """Per-image precision-recall curves (reference ``metrices.py:61-78``)."""
    out = []
    for pred, tgt in zip(predict, target):
        K = pred.shape[0]
        tgt_exp = np.broadcast_to(tgt[None], pred.shape).reshape(-1)
        onehot = (np.arange(K)[:, None, None] ==
                  np.clip(tgt, 0, None)[None]).astype(np.float64)
        p = pred.reshape(-1)[tgt_exp != ignore_index]
        t = onehot.reshape(-1)[tgt_exp != ignore_index]
        out.append(precision_recall_curve(t, p))
    return out


def get_roc(predict, target, ignore_index=-1):
    out = []
    for pred, tgt in zip(predict, target):
        K = pred.shape[0]
        tgt_exp = np.broadcast_to(tgt[None], pred.shape).reshape(-1)
        onehot = (np.arange(K)[:, None, None] ==
                  np.clip(tgt, 0, None)[None]).astype(np.float64)
        p = pred.reshape(-1)[tgt_exp != ignore_index]
        t = onehot.reshape(-1)[tgt_exp != ignore_index]
        out.append(roc_curve(t, p))
    return out


def get_ap_multiclass(predict, target):
    return [np.nan_to_num(average_precision_score(t.reshape(-1), p.reshape(-1)))
            for p, t in zip(predict, target)]


def batch_precision_recall(predict, target, thr: float = 0.5):
    """(reference ``metrices.py:113-132``)."""
    pred = (np.asarray(predict) > thr).astype(np.int64) + 1
    tgt = np.asarray(target) + 1
    tp = np.sum(((pred == 2) & (tgt == 2)) & (tgt > 0))
    fp = np.sum(((pred == 2) & (tgt == 1)) & (tgt > 0))
    fn = np.sum(((pred == 1) & (tgt == 2)) & (tgt > 0))
    precision = float(np.nan_to_num(tp / (tp + fp) if (tp + fp) else 0.0))
    recall = float(np.nan_to_num(tp / (tp + fn) if (tp + fn) else 0.0))
    return precision, recall
