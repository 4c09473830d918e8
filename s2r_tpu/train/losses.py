"""Loss functions (jit-traceable, NHWC logits).

Capability parity with reference utils/loss.py:
- `cross_entropy`: pixel CE with ignore_index=255, optional class weights,
  torch 'mean' reduction — the weighted mean divides by the summed weights of
  counted pixels (loss.py:21-30).
- `focal_loss`: the reference's quirky focal variant built on the *already
  reduced* CE scalar (loss.py:32-46): logpt = -CE; loss = -(1-pt)^g * a * logpt.
- `domain_loss`: 2-class per-pixel CE with constant labels (source=0,
  target=1), returning (loss, domain accuracy) (loss.py:57-69).
- `bce_with_logits`: numerically-stable BCE for the output-space
  discriminator (train_adapt.py:75,153-176 uses torch BCEWithLogitsLoss).

All reductions are computed in f32.  Under a GSPMD-sharded batch the means
are global means (XLA inserts the cross-replica reduction), which reproduces
the reference's DataParallel gradient averaging.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  weight: Optional[jnp.ndarray] = None,
                  ignore_index: int = 255) -> jnp.ndarray:
    """Pixel cross-entropy.  logits [N,H,W,C] (any float), labels [N,H,W] int.

    Pixels with labels outside [0, C) — in particular ignore_index=255 — do
    not contribute and do not enter the normalizer.
    """
    c = logits.shape[-1]
    f = jnp.promote_types(logits.dtype, jnp.float32)
    logits = logits.astype(f)
    labels = labels.astype(jnp.int32)
    valid = (labels >= 0) & (labels < c) & (labels != ignore_index)
    labels_c = jnp.clip(labels, 0, c - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot contraction (MXU/VPU-friendly; avoids gather)
    onehot = jax.nn.one_hot(labels_c, c, dtype=f)
    nll = -jnp.sum(logp * onehot, axis=-1)
    if weight is not None:
        w = jnp.sum(onehot * weight.astype(f), axis=-1)
    else:
        w = jnp.ones_like(nll)
    w = w * valid.astype(f)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
               weight: Optional[jnp.ndarray] = None,
               ignore_index: int = 255,
               gamma: float = 2.0, alpha: Optional[float] = 0.5) -> jnp.ndarray:
    """Reference focal variant applied to the reduced CE scalar
    (loss.py:32-46) — preserved as-is for parity."""
    ce = cross_entropy(logits, labels, weight, ignore_index)
    logpt = -ce
    pt = jnp.exp(logpt)
    if alpha is not None:
        logpt = logpt * alpha
    return -((1.0 - pt) ** gamma) * logpt


def build_seg_loss(mode: str, weight: Optional[jnp.ndarray] = None,
                   ignore_index: int = 255):
    """Mirror of SegmentationLosses.build_loss('ce'|'focal') (loss.py:12-19)."""
    if mode == "ce":
        return lambda logits, labels: cross_entropy(logits, labels, weight,
                                                    ignore_index)
    if mode == "focal":
        return lambda logits, labels: focal_loss(logits, labels, weight,
                                                 ignore_index)
    raise NotImplementedError(mode)


def _const_label_ce(logits: jnp.ndarray, label: int) -> jnp.ndarray:
    """Mean CE of [N,H,W,2] logits against a constant class label."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(logp[..., label])


def domain_loss(src_logits: jnp.ndarray, tgt_logits: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2-class per-pixel domain CE: src labeled 0, tgt labeled 1.

    Returns (loss, accuracy); the accuracy formula mirrors loss.py:67, which
    is only meaningful for the 2-channel DomainClassifier.
    """
    assert src_logits.shape == tgt_logits.shape, (src_logits.shape,
                                                  tgt_logits.shape)
    loss = _const_label_ce(src_logits, 0) + _const_label_ce(tgt_logits, 1)
    n, h, w = src_logits.shape[0], src_logits.shape[1], src_logits.shape[2]
    src_pred = jnp.argmax(src_logits, axis=-1)
    tgt_pred = jnp.argmax(tgt_logits, axis=-1)
    acc = (jnp.sum(1 - src_pred) + jnp.sum(tgt_pred)).astype(jnp.float32) \
        / 2.0 / n / h / w
    return loss, acc


def bce_with_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Mean BCE-with-logits against a constant target (0.0 or 1.0),
    numerically stable: max(x,0) - x*z + log1p(exp(-|x|))."""
    x = logits.astype(jnp.float32)
    z = jnp.float32(target)
    loss = jnp.maximum(x, 0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(loss)
