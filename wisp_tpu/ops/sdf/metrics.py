"""SDF validation metrics (reference wisp/ops/sdf/metrics.py:12-50)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def compute_sdf_iou(pred_sdf, gt_sdf) -> float:
    """Volumetric IoU over inside/outside classification (reference metrics.py:12-29)."""
    pred_inside = np.asarray(pred_sdf).reshape(-1) < 0
    gt_inside = np.asarray(gt_sdf).reshape(-1) < 0
    inter = np.logical_and(pred_inside, gt_inside).sum()
    union = np.logical_or(pred_inside, gt_inside).sum()
    return float(inter) / max(float(union), 1.0)


def compute_sparse_sdf_iou(nef_sdf_fn, coords, gt_sdf) -> float:
    """IoU over a sparse (narrowband) sample set where the field is queried on the fly
    (reference metrics.py:32-50)."""
    pred = np.asarray(nef_sdf_fn(jnp.asarray(coords))).reshape(-1)
    return compute_sdf_iou(pred, gt_sdf)
