"""Segmentation metrics via an accumulated confusion matrix.

Capability parity with reference utils/metrics.py:4-46 (Evaluator): same
method names and formulas — Pixel_Accuracy, Pixel_Accuracy_Class (nanmean),
Mean_Intersection_over_Union (returns (mIoU, per-class IoU), nanmean over
NaN classes), Frequency_Weighted_Intersection_over_Union, add_batch, reset.

TPU-native design: the reference's numpy bincount trick (metrics.py:34-39)
becomes a one-hot contraction — confusion = onehot(gt)^T @ onehot(pred) with
invalid pixels masked — i.e. a single [C, Npix] x [Npix, C] matmul on the MXU,
jitted and accumulated on device.  Host transfer happens once per epoch (the
19x19 matrix), not once per batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np



@functools.partial(jax.jit, static_argnums=(2,))
def confusion_matrix(gt: jnp.ndarray, pred: jnp.ndarray,
                     num_classes: int) -> jnp.ndarray:
    """[C, C] counts: rows = ground truth, cols = prediction.

    Pixels with gt outside [0, num_classes) (e.g. ignore_index 255) are
    excluded — the mask semantics of reference metrics.py:35.
    """
    gt = gt.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_classes)
    gt_c = jnp.clip(gt, 0, num_classes - 1)
    pred_c = jnp.clip(pred, 0, num_classes - 1)
    onehot_gt = jax.nn.one_hot(gt_c, num_classes, dtype=jnp.float32)
    onehot_gt = onehot_gt * valid[:, None].astype(jnp.float32)
    onehot_pred = jax.nn.one_hot(pred_c, num_classes, dtype=jnp.float32)
    return jnp.einsum("ng,np->gp", onehot_gt, onehot_pred,
                      precision="highest")


@functools.partial(jax.jit, static_argnums=(2,))
def confusion_from_logits(logits: jnp.ndarray, gt: jnp.ndarray,
                          num_classes: int) -> jnp.ndarray:
    """Fused argmax + confusion update, so only a [C, C] matrix ever leaves
    the device during validation (reference ships full logit tensors to host,
    train_adapt.py:225-227)."""
    pred = jnp.argmax(logits, axis=-1)
    return confusion_matrix(gt, pred, num_classes)


class Evaluator:
    """Drop-in equivalent of the reference Evaluator (utils/metrics.py)."""

    def __init__(self, num_class: int):
        self.num_class = num_class
        self.reset()

    def reset(self):
        self._device_cm = jnp.zeros((self.num_class, self.num_class),
                                    jnp.float32)

    @property
    def confusion_matrix(self) -> np.ndarray:
        return np.asarray(self._device_cm, dtype=np.float64)

    def add_batch(self, gt_image, pre_image):
        """gt/pred as [N, H, W] arrays (numpy or jax) of class ids."""
        assert gt_image.shape == pre_image.shape, (gt_image.shape,
                                                   pre_image.shape)
        self._device_cm = self._device_cm + confusion_matrix(
            jnp.asarray(gt_image), jnp.asarray(pre_image), self.num_class)

    def add_batch_from_logits(self, logits, gt_image):
        self._device_cm = self._device_cm + confusion_from_logits(
            jnp.asarray(logits), jnp.asarray(gt_image), self.num_class)

    def merge(self, cm: jnp.ndarray):
        """Accumulate a precomputed [C, C] confusion matrix (e.g. the one a
        jitted eval step returns) without leaving the device."""
        self._device_cm = self._device_cm + cm

    # --- metric formulas (reference metrics.py:9-32) ---
    def Pixel_Accuracy(self) -> float:
        cm = self.confusion_matrix
        return float(np.diag(cm).sum() / cm.sum())

    def Pixel_Accuracy_Class(self) -> float:
        cm = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.diag(cm) / cm.sum(axis=1)
        return float(np.nanmean(acc))

    def Mean_Intersection_over_Union(self):
        cm = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = np.diag(cm) / (cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm))
        return float(np.nanmean(iou)), iou

    def Frequency_Weighted_Intersection_over_Union(self) -> float:
        cm = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            freq = cm.sum(axis=1) / cm.sum()
            iu = np.diag(cm) / (cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm))
        return float((freq[freq > 0] * iu[freq > 0]).sum())
