"""Shared validation / test sweep logic for the val*/test* CLI drivers.

Capability parity with reference val.py / val_adapt.py / test.py /
test_adapt.py:
- validation_sep: per-image forward, per-image mIoU print, save grayscale
  labelId PNG + color PNG upscaled to 1280x640 NEAREST
  (val_adapt.py:179-218,222-242)
- validation: aggregate metrics + per-class IoU appended to val_info.txt
  (val.py:146-211)
- test sweep: label-free inference saving labelId + color PNGs to result/
  (test_adapt.py:118-178)
The reference's missing-'name'-key crash (SURVEY.md §2.6) is fixed: datasets
emit 'name'.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from s2r_tpu.config import Config
from s2r_tpu.data.loader import make_data_loader
from s2r_tpu.data.palette import decode_segmap_u8
from s2r_tpu.eval.metrics import Evaluator
from s2r_tpu.train.setup import build_method

EXPORT_SIZE = (1280, 640)  # (w, h) — val.py:214-254 / test_adapt.py:118-157

# trainId -> original Cityscapes labelId for the grayscale export
# (val.py imgsaver:219-224 maps predictions back through valid_classes).
_TRAINID_TO_LABELID = np.zeros(256, np.uint8)
for _i, _v in enumerate(
        (7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 31,
         32, 33)):
    _TRAINID_TO_LABELID[_i] = _v

# Short class names used by the val_info.txt report (val.py:177-195).
REPORT_CLASS_NAMES = ("road", "sidewalk", "building", "wall", "fence",
                      "pole", "light", "sign", "vegetation", "terrain",
                      "sky", "person", "rider", "car", "truck", "bus",
                      "train", "motocycle", "bicycle")


def build_eval(cfg: Config, method: str):
    train_loader, val_loader, test_loader, nclass = make_data_loader(cfg)
    m = build_method(cfg, max(len(train_loader), 1), method=method)
    state = m.init_state(jax.random.PRNGKey(cfg.seed))
    if cfg.resume:
        from s2r_tpu.train.trainer import Trainer  # reuse resume logic
        t = object.__new__(Trainer)
        t.cfg = cfg
        t.method = m
        t.state = state
        t.best_pred = 0.0
        t.start_epoch = 0
        from s2r_tpu.core.mesh import make_mesh
        t.mesh = make_mesh(1)
        t._resume(cfg.resume)
        state = t.state
    params, bstats = m.eval_variables(state)
    eval_step = jax.jit(m.eval_step)
    return m, params, bstats, eval_step, val_loader, test_loader, nclass


def _save_prediction(pred: np.ndarray, name: str, out_dir: str,
                     dataset: str, miou: Optional[float] = None):
    """Grayscale labelId PNG (trainIds mapped back to Cityscapes labelIds)
    + color PNG, both upscaled to 1280x640 NEAREST; the color filename
    carries the per-image mIoU when given (val.py imgsaver:246-247)."""
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(name))[0]
    gray = Image.fromarray(_TRAINID_TO_LABELID[pred.astype(np.uint8)],
                           mode="L")
    gray = gray.resize(EXPORT_SIZE, Image.NEAREST)
    gray.save(os.path.join(out_dir, f"{stem}_labelId.png"))
    color = Image.fromarray(decode_segmap_u8(pred, dataset))
    color = color.resize(EXPORT_SIZE, Image.NEAREST)
    tag = f"_color_{miou:.4f}_" if miou is not None else "_color"
    color.save(os.path.join(out_dir, f"{stem}{tag}.png"))


def validation_sep(cfg: Config, params, bstats, eval_step, val_loader,
                   nclass: int, out_dir: str):
    """Per-image predictions + per-image mIoU (val*.py validationSep)."""
    for batch in val_loader:
        loss, cm, pred = eval_step(params, bstats,
                                   jnp.asarray(batch["image"]),
                                   jnp.asarray(batch["label"]))
        pred = np.asarray(pred)
        for j in range(pred.shape[0]):
            ev = Evaluator(nclass)
            ev.add_batch(np.asarray(batch["label"][j:j + 1]), pred[j:j + 1])
            miou, _ = ev.Mean_Intersection_over_Union()
            name = batch["name"][j]
            _save_prediction(pred[j], name, out_dir, cfg.dataset, miou)
            print(f"{name}: mIoU {miou:.4f}")


def validation(cfg: Config, params, bstats, eval_step, val_loader,
               nclass: int, report_path: Optional[str] = None):
    """Aggregate metrics + per-class IoU report (val.py:146-211)."""
    ev = Evaluator(nclass)
    test_loss = 0.0
    for batch in val_loader:
        loss, cm, _ = eval_step(params, bstats, jnp.asarray(batch["image"]),
                                jnp.asarray(batch["label"]))
        ev.merge(cm)
        test_loss += float(loss)
    acc = ev.Pixel_Accuracy()
    acc_class = ev.Pixel_Accuracy_Class()
    miou, iou = ev.Mean_Intersection_over_Union()
    fwiou = ev.Frequency_Weighted_Intersection_over_Union()
    # report format mirrors val.py:196-203
    lines = ["Validation:",
             f"Acc:{acc}, Acc_class:{acc_class}, mIoU:{miou}, fwIoU: {fwiou}",
             f"Loss: {test_loss:.3f}", "", "Class IOU: "]
    for c in range(nclass):
        name = REPORT_CLASS_NAMES[c]
        sep = ": \t" if len(name) > 5 else ": \t\t"
        lines.append(f"\t{name}{sep}{iou[c]}")
    report = "\n".join(lines)
    print(report)
    if report_path:
        os.makedirs(os.path.dirname(report_path) or ".", exist_ok=True)
        with open(report_path, "a") as f:
            f.write(report + "\n\n")
    return miou, iou


def test_sweep(cfg: Config, params, bstats, eval_step, test_loader,
               out_dir: str):
    """Label-free inference sweep (test*.py:150-178)."""
    for batch in test_loader:
        _, _, pred = eval_step(params, bstats, jnp.asarray(batch["image"]),
                               jnp.asarray(batch["label"]))
        pred = np.asarray(pred)
        for j in range(pred.shape[0]):
            _save_prediction(pred[j], batch["name"][j], out_dir, cfg.dataset)
    print(f"saved predictions to {out_dir}")
