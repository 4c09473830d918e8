"""Full-scale real-data dress rehearsal (VERDICT r2 item 2).

GTA5/Cityscapes are not on disk in this environment, so this script makes
a dataset that is SHAPED exactly like them — native resolutions (1914x1052
source frames, 2048x1024 target/val/test), reference file naming
(`*_leftImg8bit.png` images, `*_gtFine_labelIds.png` val labels, flat GTA5
`NNNNN.png` source/label pairs), 34-class RAW labelIds (void classes
included, remapped to 19 trainIds by the loaders) — then drives the EXACT
reference command lines end-to-end on the TPU:

  1. train_adapt --use_balanced_weights (exercises the class-weights pass
     over every label at native size) for a few epochs
  2. val_adapt full-resolution sweep with per-image labelId + color PNG
     export and val_info.txt
  3. test_adapt label-free sweep
  4. servable export (--format servable, rgb8 ingest) + cli.infer sweep
     over the native-res test frames — the framework-free deployment path
  5. checkpoint export back to the reference torch schema + strict-load
     into the actual reference modules

so day-one of real data landing is a rerun of this script with different
roots.  Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python exp/rehearsal.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SRC, N_TGT, N_VAL, N_TEST = 240, 120, 60, 30


def make_data(root: str) -> dict:
    """Reference-shaped dataset on disk (stamped; rerun-safe)."""
    from PIL import Image

    from s2r_tpu.data.datasets import VALID_CLASSES
    from s2r_tpu.data.synthetic import _scene

    dirs = {k: os.path.join(root, k) for k in
            ("GTA_V/train_img", "GTA_V/train_label", "CItyscapes/train_img",
             "CItyscapes/val_img", "CItyscapes/val_label",
             "CItyscapes/test_img")}
    stamp = os.path.join(root, f".stamp_{N_SRC}_{N_TGT}_{N_VAL}_{N_TEST}")
    if os.path.exists(stamp):
        return dirs
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    inv = np.asarray(VALID_CLASSES, np.uint8)  # trainId -> raw labelId
    # void ids sprinkled like real boundaries (ignore -> a real void class)
    rng = np.random.RandomState(7)

    def raw_label(lbl):
        return np.where(lbl == 255, 0,
                        inv[np.clip(lbl, 0, 18)]).astype(np.uint8)

    t0 = time.time()
    for i in range(N_SRC):  # GTA5 source: flat NNNNN.png image/label pairs
        img, lbl = _scene(rng, 1052, 1914)
        Image.fromarray(img).save(
            os.path.join(dirs["GTA_V/train_img"], f"{i:05d}.png"))
        Image.fromarray(raw_label(lbl)).save(
            os.path.join(dirs["GTA_V/train_label"], f"{i:05d}.png"))
    cities = ("aachen", "bochum", "cologne", "erfurt")
    for i in range(N_TGT):  # Cityscapes-style target train frames
        img, _ = _scene(rng, 1024, 2048)
        name = f"{cities[i % 4]}_{i:06d}_000019_leftImg8bit.png"
        Image.fromarray(img).save(
            os.path.join(dirs["CItyscapes/train_img"], name))
    for i in range(N_VAL):  # val: image + gtFine_labelIds pairs
        img, lbl = _scene(rng, 1024, 2048)
        stem = f"frankfurt_{i:06d}_000294_"
        Image.fromarray(img).save(os.path.join(
            dirs["CItyscapes/val_img"], stem + "leftImg8bit.png"))
        Image.fromarray(raw_label(lbl)).save(os.path.join(
            dirs["CItyscapes/val_label"], stem + "gtFine_labelIds.png"))
    for i in range(N_TEST):
        img, _ = _scene(rng, 1024, 2048)
        Image.fromarray(img).save(os.path.join(
            dirs["CItyscapes/test_img"],
            f"berlin_{i:06d}_000019_leftImg8bit.png"))
    with open(stamp, "w") as f:
        f.write("ok")
    print(f"[rehearsal] dataset built in {time.time() - t0:.0f}s -> {root}")
    return dirs


def run(cmd, log):
    print(f"\n[rehearsal] $ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, text=True, capture_output=True,
                          env={**os.environ,
                               "PYTHONPATH": REPO + os.pathsep
                               + os.environ.get("PYTHONPATH", "")})
    dt = time.time() - t0
    log.append({"cmd": " ".join(cmd), "seconds": round(dt, 1),
                "rc": proc.returncode,
                "tail": proc.stdout[-2000:] + proc.stderr[-1000:]})
    print(proc.stdout[-3000:])
    if proc.returncode != 0:
        print(proc.stderr[-4000:])
        raise SystemExit(f"[rehearsal] FAILED ({dt:.0f}s): {cmd}")
    print(f"[rehearsal] ok in {dt:.0f}s")
    return proc.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="1 epoch, smaller sweeps")
    ap.add_argument("--root", default=os.environ.get(
        "S2R_REHEARSAL_DATA", "/tmp/s2r_rehearsal"))
    ap.add_argument("--run-root", default="/tmp/s2r_rehearsal_run")
    ap.add_argument("--data-backend", default="native",
                    choices=["pil", "native"])
    args = ap.parse_args()

    dirs = make_data(args.root)
    roots = [
        "--src_img_root", dirs["GTA_V/train_img"],
        "--src_label_root", dirs["GTA_V/train_label"],
        "--tgt_img_root", dirs["CItyscapes/train_img"],
        "--val_img_root", dirs["CItyscapes/val_img"],
        "--val_label_root", dirs["CItyscapes/val_label"],
        "--test_img_root", dirs["CItyscapes/test_img"],
    ]
    epochs = "1" if args.quick else "3"
    log = []
    py = [sys.executable, "-m"]

    # 1) output-space adaption training, reference defaults (base 512,
    #    crop 512, lr 5e-4, poly) + balanced weights at native label size
    run(py + ["s2r_tpu.cli.train_adapt", "--dataset", "gtav2cityscapes",
              *roots, "--use_balanced_weights", "--epochs", epochs,
              "--batch-size", "8", "--workers", "4",
              "--data-backend", args.data_backend,
              "--run-root", args.run_root, "--checkname", "rehearsal",
              "--eval-interval", epochs], log)

    ckpt_dir = os.path.join(args.run_root, "gtav2cityscapes", "rehearsal")
    import glob as _g
    ckpts = sorted(_g.glob(os.path.join(ckpt_dir, "experiment_*",
                                        "checkpoint.ckpt")),
                   key=os.path.getmtime)
    assert ckpts, f"no checkpoint under {ckpt_dir}"
    ckpt = ckpts[-1]

    # 2) full val sweep: per-image export (validationSep) + aggregate mIoU
    run(py + ["s2r_tpu.cli.val_adapt", "--dataset", "gtav2cityscapes",
              *roots, "--resume", ckpt, "--batch-size", "8",
              "--workers", "4", "--run-root", args.run_root,
              "--checkname", "rehearsal_val",
              "--out-dir", os.path.join(args.run_root, "run_val")], log)

    # 3) label-free test sweep -> labelId + color PNGs
    run(py + ["s2r_tpu.cli.test_adapt", "--dataset", "gtav2cityscapes",
              *roots, "--resume", ckpt, "--batch-size", "4",
              "--workers", "4", "--run-root", args.run_root,
              "--checkname", "rehearsal_test",
              "--out-dir", os.path.join(args.run_root, "result")], log)

    # 4) deployment: servable export + framework-free inference sweep over
    #    the native-resolution test frames (the serving path's day-one run)
    shlo = os.path.join(args.run_root, "rehearsal.shlo")
    serve_n = "2" if args.quick else "4"
    run(py + ["s2r_tpu.cli.export", "--resume", ckpt, "--format",
              "servable", "--out", shlo, "--serve-shape", serve_n,
              "1024", "2048", "--serve-input", "rgb8"], log)
    run(py + ["s2r_tpu.cli.infer", "--servable", shlo,
              "--images", dirs["CItyscapes/test_img"],
              "--out-dir", os.path.join(args.run_root, "result_servable")],
        log)

    # 5) export to the reference torch schema + strict-load parity
    exported = os.path.join(args.run_root, "rehearsal_export.pth.tar")
    run(py + ["s2r_tpu.cli.export", "--resume", ckpt, "--out", exported,
              "--method", "output_adapt"], log)
    check = (
        "import torch, sys; sys.path.insert(0, '/root/reference');"
        "from modeling.backbone import mobilenet as refmb;"
        # the reference ctor force-loads its pretrained blob, absent from
        # this snapshot (.MISSING_LARGE_BLOBS); strict-load overwrites
        # every weight anyway
        "refmb.MobileNetV2._load_pretrained_model = lambda self: None;"
        "from modeling.deeplab import DeepLab;"
        f"ck = torch.load('{exported}', map_location='cpu');"
        "m = DeepLab(backbone='mobilenet', output_stride=16, num_classes=19,"
        "            sync_bn=False, freeze_bn=False);"
        "m.load_state_dict(ck['state_dict'], strict=True);"
        "print('strict-load ok, epoch', ck['epoch'])")
    run([sys.executable, "-c", check], log)

    out = os.path.join(args.run_root, "rehearsal_log.json")
    with open(out, "w") as f:
        json.dump(log, f, indent=1)
    print(f"\n[rehearsal] ALL PHASES PASSED -> {out}")


if __name__ == "__main__":
    main()
