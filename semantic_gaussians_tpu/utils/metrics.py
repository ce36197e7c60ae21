"""Segmentation metrics: confusion matrix, IoU, accuracy.

Parity: /root/reference/utils/metric.py — bincount confusion with an
"unlabeled" class appended at index num_classes whose row is dropped, per-class
IoU from the confusion matrix, and the eval_result.log style report.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def confusion_matrix(pred_ids: np.ndarray, gt_ids: np.ndarray, num_classes: int):
    """[num_classes, num_classes+1] confusion; row=gt excl. unlabeled, col=pred.

    `pred_ids`/`gt_ids` are flat int arrays in [0, num_classes]; id ==
    num_classes means "unlabeled". Matches metric.py:6-17 (gt-unlabeled row is
    dropped; a predicted-unlabeled column is kept so totals still add up).
    """
    pred_ids = np.asarray(pred_ids).reshape(-1)
    gt_ids = np.asarray(gt_ids).reshape(-1)
    assert pred_ids.shape == gt_ids.shape
    idxs = gt_ids * (num_classes + 1) + pred_ids
    counts = np.bincount(idxs, minlength=(num_classes + 1) ** 2)
    full = counts.reshape(num_classes + 1, num_classes + 1)
    return full[:num_classes, :]


def confusion_matrix_device(pred_ids, gt_ids, num_classes: int):
    """jnp twin of confusion_matrix for use inside jitted view scans.

    Same semantics (row=gt excl. unlabeled, col=pred incl. unlabeled) but
    stays on device — the batched eval path sums these per view so only a
    [num_classes, num_classes+1] matrix ever leaves the chip instead of a
    full [H, W] label image per view.
    """
    import jax.numpy as jnp

    pred_ids = pred_ids.reshape(-1)
    gt_ids = gt_ids.reshape(-1)
    idxs = gt_ids * (num_classes + 1) + pred_ids
    counts = jnp.zeros(((num_classes + 1) ** 2,), jnp.int32).at[idxs].add(1)
    full = counts.reshape(num_classes + 1, num_classes + 1)
    return full[:num_classes, :]


def get_iou(label_id: int, confusion: np.ndarray):
    """(iou, tp, denom) for one class; metric.py:20-32."""
    tp = np.longlong(confusion[label_id, label_id])
    fn = np.longlong(confusion[label_id, :].sum()) - tp
    fp = np.longlong(confusion[:, label_id].sum()) - tp
    denom = tp + fp + fn
    if denom == 0:
        return False
    return float(tp) / denom, tp, denom


def evaluate_confusion(
    confusion: np.ndarray,
    class_names: Sequence[str],
    stdout: bool = False,
    dataset: str = "scannet_3d",
    log_file: Optional[str] = None,
):
    """Per-class IoU/Acc + means; mirrors metric.py:35-105 output shape.

    Returns (mean_iou, mean_acc).
    """
    num_classes = len(class_names)
    ious, accs = np.zeros(num_classes), np.zeros(num_classes)
    valid = np.zeros(num_classes, dtype=bool)
    lines = [f"classes  IoU  Acc  ({dataset})"]
    for i in range(num_classes):
        out = get_iou(i, confusion)
        row_sum = confusion[i, :].sum()
        accs[i] = confusion[i, i] / max(float(row_sum), 1.0)
        # Reference protocol (metric.py:56): classes with ZERO ground-truth
        # points are skipped entirely — a predicted-but-absent class must
        # not drag a 0 into mean IoU/Acc or the numbers stop being
        # comparable with published results.
        if out is not False and row_sum > 0:
            ious[i], tp, denom = out
            valid[i] = True
            lines.append(
                f"{class_names[i]:<14s}: {ious[i]:>5.3f}   "
                f"({tp:>6d}/{denom:<6d})  acc {accs[i]:>5.3f}"
            )
        else:
            lines.append(f"{class_names[i]:<14s}: -")
    mean_iou = float(ious[valid].mean()) if valid.any() else 0.0
    mean_acc = float(accs[valid].mean()) if valid.any() else 0.0
    lines.append(f"mean IoU: {mean_iou:.4f}  mean Acc: {mean_acc:.4f}")
    report = "\n".join(lines)
    if stdout:
        print(report)
    if log_file:
        with open(log_file, "a") as f:
            f.write(report + "\n")
    return mean_iou, mean_acc
