"""Jitted segmentation metrics as confusion-matrix accumulators.

Replaces torchmetrics ``MulticlassF1Score(num_classes, ignore_index=0)``
(ref /root/reference/src/model.py:85-93) with a pure-JAX confusion matrix:
update is a scatter-add (one ``segment_sum`` over B·H·W pixels), compute is a
tiny host-side reduction. Under a data-sharded jit the matrix sum is an XLA
``psum`` over the mesh — the TPU-native version of Lightning's
``sync_dist=True`` (ref src/model.py:316,327).

Semantics matched to torchmetrics (average="macro"):
  - pixels whose *target* equals ``ignore_index`` are dropped from the update;
  - per-class F1 = 2·TP / (2·TP + FP + FN), defined as 0 when the denominator
    is 0 (zero_division=0);
  - macro mean runs over all classes, but classes with zero support AND zero
    predictions are excluded from the average (torchmetrics drops
    no-support/no-pred classes from macro averaging).
"""

from __future__ import annotations

import jax.numpy as jnp


def confusion_update(
    pred: jnp.ndarray, target: jnp.ndarray, num_classes: int, ignore_index: int | None = 0
) -> jnp.ndarray:
    """(…) int preds/targets → (C, C) int32 confusion matrix [target, pred]."""
    p = pred.reshape(-1).astype(jnp.int32)
    t = target.reshape(-1).astype(jnp.int32)
    valid = jnp.ones_like(t, dtype=jnp.bool_) if ignore_index is None else (t != ignore_index)
    idx = t * num_classes + p
    idx = jnp.where(valid, idx, num_classes * num_classes)  # overflow bin
    counts = jnp.zeros((num_classes * num_classes + 1,), jnp.int32).at[idx].add(1)
    return counts[:-1].reshape(num_classes, num_classes)


def f1_from_confusion(cm: jnp.ndarray) -> jnp.ndarray:
    """Macro F1 from a (C, C) confusion matrix (torchmetrics semantics)."""
    cm = cm.astype(jnp.float32)
    tp = jnp.diagonal(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    denom = 2 * tp + fp + fn
    f1 = jnp.where(denom > 0, 2 * tp / jnp.maximum(denom, 1), 0.0)
    support = cm.sum(axis=1)
    pred_count = cm.sum(axis=0)
    seen = (support > 0) | (pred_count > 0)
    return jnp.where(seen.sum() > 0, (f1 * seen).sum() / jnp.maximum(seen.sum(), 1), 0.0)


def iou_from_confusion(cm: jnp.ndarray) -> jnp.ndarray:
    """Per-class IoU (C,) — used by the reference-parity harness (BASELINE.md)."""
    cm = cm.astype(jnp.float32)
    tp = jnp.diagonal(cm)
    union = cm.sum(axis=0) + cm.sum(axis=1) - tp
    return jnp.where(union > 0, tp / jnp.maximum(union, 1), 0.0)
