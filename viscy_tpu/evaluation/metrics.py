"""Image and segmentation metrics (reference ``evaluation/metrics.py``).

The SSIM family lives in :mod:`viscy_tpu.ops.ssim` (device-side,
bf16-safe); this module holds the host-side metrics: VOI, POD, Pearson,
and segmentation utilities.
"""

from __future__ import annotations

import numpy as np

from viscy_tpu.ops.ssim import ms_ssim_25d, ssim_25d  # re-export  # noqa: F401

__all__ = [
    "ssim_25d",
    "ms_ssim_25d",
    "pearson_correlation",
    "voi_score",
    "pod_metric",
    "labels_to_masks",
    "mean_average_precision",
]


def pearson_correlation(pred: np.ndarray, target: np.ndarray) -> float:
    """Global Pearson correlation between two arrays."""
    p = np.asarray(pred, np.float64).ravel()
    t = np.asarray(target, np.float64).ravel()
    p -= p.mean()
    t -= t.mean()
    denom = np.linalg.norm(p) * np.linalg.norm(t)
    return float(p @ t / denom) if denom > 0 else 0.0


def voi_score(pred_labels: np.ndarray, target_labels: np.ndarray) -> tuple[float, float]:
    """Variation of information between two label images
    (reference ``metrics.py`` VOI): returns (H(pred|target), H(target|pred))."""
    p = np.asarray(pred_labels).ravel().astype(np.int64)
    t = np.asarray(target_labels).ravel().astype(np.int64)
    n = p.size
    # joint histogram via contingency
    pu, pi = np.unique(p, return_inverse=True)
    tu, ti = np.unique(t, return_inverse=True)
    joint = np.zeros((len(pu), len(tu)), np.float64)
    np.add.at(joint, (pi, ti), 1.0)
    joint /= n
    pm = joint.sum(axis=1, keepdims=True)
    tm = joint.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        h_p_given_t = -np.nansum(joint * np.log(joint / tm, where=joint > 0))
        h_t_given_p = -np.nansum(joint * np.log(joint / pm, where=joint > 0))
    return float(h_p_given_t), float(h_t_given_p)


def pod_metric(
    pred_labels: np.ndarray, target_labels: np.ndarray, iou_threshold: float = 0.5
) -> dict:
    """Probability of detection over instance labels: matches instances by
    IoU and reports detection rate / precision / recall."""
    pred_ids = [i for i in np.unique(pred_labels) if i != 0]
    target_ids = [i for i in np.unique(target_labels) if i != 0]
    matched_t = set()
    tp = 0
    for pid in pred_ids:
        pm = pred_labels == pid
        overlap_ids = np.unique(target_labels[pm])
        best_iou, best_t = 0.0, None
        for tid in overlap_ids:
            if tid == 0 or tid in matched_t:
                continue
            tm = target_labels == tid
            inter = np.logical_and(pm, tm).sum()
            union = np.logical_or(pm, tm).sum()
            iou = inter / union if union else 0.0
            if iou > best_iou:
                best_iou, best_t = iou, tid
        if best_t is not None and best_iou >= iou_threshold:
            matched_t.add(best_t)
            tp += 1
    fp = len(pred_ids) - tp
    fn = len(target_ids) - tp
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    return {
        "true_positives": tp,
        "false_positives": fp,
        "false_negatives": fn,
        "precision": precision,
        "recall": recall,
        "f1": 2 * precision * recall / max(precision + recall, 1e-8),
    }


def labels_to_masks(labels: np.ndarray) -> np.ndarray:
    """Integer label image -> (N, H, W) boolean instance masks, skipping
    background 0 (reference ``metrics.py:117``)."""
    labels = np.asarray(labels)
    if labels.ndim != 2:
        raise ValueError(f"Labels must be 2D, got shape {labels.shape}.")
    segments = np.unique(labels)
    segments = segments[segments != 0]
    return labels[None] == segments[:, None, None]


def _mask_iou_matrix(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Pairwise IoU between (P, H, W) and (T, H, W) boolean mask stacks."""
    # explicit flat extent: reshape(n, -1) cannot infer -1 when n == 0
    # (no predicted/target instances must yield an empty IoU, not a crash)
    p = pred.reshape(pred.shape[0], int(np.prod(pred.shape[1:]))).astype(np.float64)
    t = target.reshape(target.shape[0], int(np.prod(target.shape[1:]))).astype(np.float64)
    inter = p @ t.T
    union = p.sum(1)[:, None] + t.sum(1)[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def _ap_at_threshold(iou: np.ndarray, thr: float) -> tuple[float, float]:
    """COCO-style AP/AR at one IoU threshold with uniform scores: greedy
    match each prediction (in order) to its best unmatched GT, then
    101-point-interpolated AP over the cumulative PR curve."""
    n_pred, n_tgt = iou.shape
    if n_tgt == 0:
        return (0.0, 0.0) if n_pred else (float("nan"), float("nan"))
    if n_pred == 0:
        return 0.0, 0.0
    matched = np.zeros(n_tgt, bool)
    tp = np.zeros(n_pred, bool)
    for i in range(n_pred):
        cand = np.where(~matched & (iou[i] >= thr))[0]
        if cand.size:
            j = cand[np.argmax(iou[i, cand])]
            matched[j] = True
            tp[i] = True
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(~tp)
    recall = tp_cum / n_tgt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1)
    # monotone non-increasing precision envelope
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    rec_grid = np.linspace(0.0, 1.0, 101)
    idx = np.searchsorted(recall, rec_grid, side="left")
    p_interp = np.where(idx < n_pred, precision[np.minimum(idx, n_pred - 1)], 0.0)
    return float(p_interp.mean()), float(recall[-1])


def mean_average_precision(
    pred_labels: np.ndarray,
    target_labels: np.ndarray,
    iou_thresholds: np.ndarray | None = None,
) -> dict:
    """COCO-style instance-segmentation mAP over a single label-image pair
    (reference ``metrics.py:155``, torchmetrics ``MeanAveragePrecision``
    with ``iou_type="segm"`` and uniform dummy scores — reimplemented in
    numpy because pycocotools is not in this image)."""
    if iou_thresholds is None:
        iou_thresholds = np.arange(0.5, 1.0, 0.05)
    pred_masks = labels_to_masks(np.asarray(pred_labels))
    tgt_masks = labels_to_masks(np.asarray(target_labels))
    iou = _mask_iou_matrix(pred_masks, tgt_masks)
    aps, ars = [], []
    for thr in iou_thresholds:
        ap, ar = _ap_at_threshold(iou, float(thr))
        aps.append(ap)
        ars.append(ar)
    ap50, _ = _ap_at_threshold(iou, 0.5)
    ap75, _ = _ap_at_threshold(iou, 0.75)
    return {
        "map": float(np.nanmean(aps)),
        "map_50": ap50,
        "map_75": ap75,
        "mar_100": float(np.nanmean(ars)),
        "num_pred": int(pred_masks.shape[0]),
        "num_target": int(tgt_masks.shape[0]),
    }
