"""Trainer: the host-side orchestration loop shared by all methods.

Capability parity with the reference Trainer classes (train.py:26-312,
train_adapt.py:29-255): data loaders, model/optimizer wiring (delegated to
s2r_tpu.train.setup), class-balanced weights, experiment saver, summaries,
checkpoint resume, the epoch loop with per-epoch validation and best-mIoU
checkpointing.

TPU-native differences:
- the entire train iteration is one jitted step; the host loop only feeds
  batches (prefetched + batch-sharded over the mesh) and logs
- metrics come back as device scalars; they are accumulated lazily and only
  synced for logging, so logging never stalls the device pipeline
- validation keeps the confusion matrix on device (Evaluator)
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from s2r_tpu.config import Config
from s2r_tpu.core.mesh import make_mesh, replicate
from s2r_tpu.data.loader import make_data_loader
from s2r_tpu.eval.metrics import Evaluator
from s2r_tpu.io.checkpoint import load_checkpoint
from s2r_tpu.io.saver import Saver
from s2r_tpu.io.torch_import import import_reference_checkpoint
from s2r_tpu.parallel.feed import prefetch_to_device
from s2r_tpu.train.setup import Method, build_method
from s2r_tpu.utils.calculate_weights import load_or_compute_weights
from s2r_tpu.utils.summaries import TensorboardSummary


def pick_num_devices(batch_size: int, requested: Optional[int],
                     spatial: int = 1, log: bool = True) -> int:
    """Largest device count <= available (and <= requested) dividing the
    batch.  Multi-host: the mesh must span every process's devices, so the
    global batch must divide evenly.  With `spatial > 1`, the batch only
    needs to divide the data-parallel rows (devices // spatial)."""
    if spatial > 1:
        if jax.process_count() > 1:
            raise NotImplementedError(
                "--spatial-shard is single-process; multi-host runs use "
                "per-host batch sharding")
        avail = len(jax.devices())
        if requested:
            avail = min(avail, requested)
        if avail % spatial:
            raise ValueError(f"--spatial-shard {spatial} must divide the "
                             f"device count ({avail})")
        dp = pick_num_devices(batch_size, avail // spatial, log=False)
        if log and dp * spatial < avail:
            print(f"[s2r_tpu] using {dp * spatial}/{avail} devices "
                  f"({dp} data x {spatial} spatial): batch_size "
                  f"{batch_size} is not divisible by {avail // spatial} "
                  f"rows (consider --batch-pad auto or a divisible batch)",
                  flush=True)
        return dp * spatial
    avail = len(jax.devices())
    if jax.process_count() > 1:
        if batch_size % avail:
            raise ValueError(
                f"multi-host runs need global batch_size ({batch_size}) "
                f"divisible by total devices ({avail})")
        return avail
    limit = min(avail, requested or avail)
    for d in range(limit, 0, -1):
        if batch_size % d == 0:
            if d < limit and log:
                print(f"[s2r_tpu] using {d}/{limit} devices: batch_size "
                      f"{batch_size} is not divisible by {limit} "
                      f"(consider --batch-pad auto or a divisible batch)",
                      flush=True)
            return d
    return 1


class _NullWriter:
    """Summary-writer stand-in for non-main processes."""

    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass

    def close(self):
        pass


class Trainer:
    def __init__(self, cfg: Config, method: Optional[str] = None):
        self.cfg = cfg
        if cfg.prng_impl:
            jax.config.update("jax_default_prng_impl", cfg.prng_impl)
        # Only process 0 owns the experiment directory, checkpoints and
        # summaries; other hosts compute/train identically but write nothing.
        self.is_main = jax.process_index() == 0
        self.saver = Saver(cfg, create=self.is_main)
        if self.is_main:
            self.saver.save_experiment_config()
            self.summary = TensorboardSummary(self.saver.experiment_dir)
            self.writer = self.summary.create_summary()
        else:
            self.summary = None
            self.writer = _NullWriter()

        self.train_loader, self.val_loader, self.test_loader, self.nclass = \
            make_data_loader(cfg)

        weights = None
        if cfg.use_balanced_weights:
            weights = jnp.asarray(
                load_or_compute_weights(cfg, self.train_loader, self.nclass))

        sp = max(1, cfg.spatial_shard)
        n_dev = pick_num_devices(cfg.batch_size, cfg.num_devices, sp)
        # batch-pad rounds to the DATA-parallel width (batch shards), not
        # the total device count — H sharding doesn't split the batch.
        self.method: Method = build_method(cfg, len(self.train_loader),
                                           weights, method,
                                           n_devices=n_dev // sp)
        self.mesh = make_mesh(n_dev, spatial=sp)
        self.state = replicate(
            self.method.init_state(jax.random.PRNGKey(cfg.seed)), self.mesh)
        self.train_step = jax.jit(self.method.step_fn, donate_argnums=0)
        self.eval_step = jax.jit(self.method.eval_step)
        self._finish_u8 = None  # lazy jitted u8->f32 normalize (u8 feeds)
        self.evaluator = Evaluator(self.nclass)
        self.best_pred = 0.0
        self.start_epoch = cfg.start_epoch

        if cfg.backbone_init:
            self._init_backbone(cfg.backbone_init)
        if cfg.resume:
            self._resume(cfg.resume)

    def _init_backbone(self, path: str):
        """Load a torch backbone state dict — the reference's pretrained
        mobilenet_VOC.pth path (mobilenet.py:113-132, which silently keeps
        only matching keys); resnet takes torchvision layout; xception/drn
        take the canonical schemas defined by torch_export (the reference
        factory ships no modules for those names)."""
        import torch

        from s2r_tpu.io.torch_import import _backbone_importer

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        bp, bs = _backbone_importer(self.cfg.backbone)(sd,
                                                       self.cfg.out_stride)
        params = dict(self.state.params)
        params["G"] = {**params["G"], "backbone": jax.tree.map(jnp.asarray, bp)}
        if self.method.name == "output_adapt":
            batch_stats = {**self.state.batch_stats,
                           "backbone": jax.tree.map(jnp.asarray, bs)}
        else:
            batch_stats = dict(self.state.batch_stats)
            batch_stats["G"] = {**batch_stats["G"],
                                "backbone": jax.tree.map(jnp.asarray, bs)}
        self.state = replicate(
            self.state.replace(params=params, batch_stats=batch_stats),
            self.mesh)
        print(f"=> initialized backbone from '{path}'")

    # ------------------------------------------------------------------
    def _resume(self, path: str):
        """Resume from an s2r_tpu checkpoint or import a reference torch one.

        Mirrors train_adapt.py:94-113: with --ft (default True) optimizer
        state is not restored and start_epoch resets to 0."""
        if path == "auto":
            path = self._latest_checkpoint()
            if path is None:
                print("=> --resume auto: no prior checkpoint found, "
                      "starting fresh")
                return
        if not os.path.isfile(path):
            raise RuntimeError(f"=> no checkpoint found at '{path}'")
        cfg = self.cfg
        if path.endswith((".pth", ".pth.tar")):
            imported = import_reference_checkpoint(path, cfg.out_stride,
                                                   backbone=cfg.backbone)
            g_params, g_stats = imported["G"]
            params = dict(self.state.params)
            params["G"] = jax.tree.map(jnp.asarray, g_params)
            if imported["D"] is not None and self.method.name != "output_adapt":
                d_params, d_stats = imported["D"]
                params["D"] = jax.tree.map(jnp.asarray, d_params)
                batch_stats = {"G": jax.tree.map(jnp.asarray, g_stats),
                               "D": jax.tree.map(jnp.asarray, d_stats)}
            elif self.method.name == "output_adapt":
                batch_stats = jax.tree.map(jnp.asarray, g_stats)
            else:
                batch_stats = dict(self.state.batch_stats)
                batch_stats["G"] = jax.tree.map(jnp.asarray, g_stats)
            self.state = self.state.replace(params=params,
                                            batch_stats=batch_stats)
            self.best_pred = imported["best_pred"]
            if not cfg.ft:
                self.start_epoch = imported["epoch"]
                # torch optimizer-state restore (train.py:138-142,
                # train_adapt.py:105-106): momentum buffers / Adam moments
                # map onto the fused flat-buffer layout.
                if imported.get("opt"):
                    from s2r_tpu.io.torch_import import merge_torch_opt_state
                    self.state = self.state.replace(
                        opt_state=merge_torch_opt_state(
                            imported["opt"], self.state.params,
                            self.state.opt_state))
            print(f"=> imported reference checkpoint '{path}' "
                  f"(epoch {imported['epoch']}, schema {imported['schema']})")
        else:
            payload = load_checkpoint(path, state_template=self.state)
            restored = payload["state"]
            if cfg.ft:
                # params + stats only; fresh optimizer and step counter
                self.state = self.state.replace(
                    params=restored.params, batch_stats=restored.batch_stats)
            else:
                self.state = restored
                self.start_epoch = payload["epoch"]
            self.best_pred = payload["best_pred"]
            print(f"=> loaded checkpoint '{path}' (epoch {payload['epoch']})")
        self.state = replicate(self.state, self.mesh)

    def _latest_checkpoint(self) -> Optional[str]:
        """Newest checkpoint across this run directory's experiments
        (`--resume auto` — crash/preemption recovery the reference lacks)."""
        import glob

        pattern = os.path.join(self.saver.directory, "experiment_*",
                               "checkpoint.ckpt")
        candidates = glob.glob(pattern)
        if not candidates:
            return None
        return max(candidates, key=os.path.getmtime)

    # ------------------------------------------------------------------
    def training(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        self.train_loader.set_epoch(epoch)
        num_img_tr = len(self.train_loader)
        # ~10 image summaries per epoch (reference: train_adapt.py:189);
        # short epochs log once instead of every step.
        vis_every = max(num_img_tr // 10, 1) if num_img_tr >= 10 \
            else max(num_img_tr, 1)
        sums: Dict[str, float] = {}
        pending = []  # device scalars; synced lazily
        t0 = time.time()
        images_seen = 0

        aug_key = jax.random.PRNGKey((cfg.seed, epoch).__hash__() & 0x7FFFFFFF)
        for i, batch in enumerate(
                prefetch_to_device(self.train_loader, self.mesh)):
            arrays = {k: v for k, v in batch.items()
                      if not isinstance(v, list)}
            if cfg.device_aug:
                from s2r_tpu.data import device_aug as DA

                key = jax.random.fold_in(aug_key, i)
                if "src_image" in arrays:
                    arrays = DA.augment_paired_batch(arrays, key,
                                                     cfg.base_size,
                                                     cfg.crop_size)
                else:
                    arrays = DA.augment_batch(arrays, key, cfg.base_size,
                                              cfg.crop_size)
            else:
                img_key = "src_image" if "src_image" in arrays else "image"
                if arrays[img_key].dtype == jnp.uint8:
                    # u8-staged feed (hostcrop/native emit_u8 paths):
                    # normalization finishes on device
                    from s2r_tpu.data.device_aug import normalize_u8_batch
                    if self._finish_u8 is None:
                        self._finish_u8 = jax.jit(normalize_u8_batch)
                    arrays = self._finish_u8(arrays)
            self.state, metrics = self.train_step(self.state, arrays)
            pending.append(metrics)
            images_seen += cfg.batch_size
            if i % vis_every == 0:
                self._log_train_images(arrays, epoch * num_img_tr + i)

        for metrics in pending:
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        dt = time.time() - t0
        means = {k: v / max(len(pending), 1) for k, v in sums.items()}
        means["images_per_sec"] = images_seen / max(dt, 1e-9)
        for k, v in means.items():
            self.writer.add_scalar(f"train/{k}", v, epoch)
        loss_keys = [k for k in ("seg_loss", "task_loss", "adv_loss",
                                 "d_loss", "d_inv_loss") if k in sums]
        print(f"[Epoch: {epoch}, numImages: {images_seen:5d}] "
              + " ".join(f"{k}: {means[k]:.3f}" for k in loss_keys)
              + f" ({means['images_per_sec']:.1f} img/s)")

        if cfg.no_val and self.is_main:
            self.saver.save_checkpoint(self.state, epoch + 1, self.best_pred,
                                       is_best=False)
        return means

    def _log_train_images(self, arrays, global_step: int):
        if not self.is_main or jax.process_count() > 1:
            # multi-host: batch arrays are only partially addressable here
            return
        try:
            params, bstats = self.method.eval_variables(self.state)
            img_key = "image" if "image" in arrays else "src_image"
            lbl_key = "label" if "label" in arrays else "src_label"
            image = np.asarray(arrays[img_key][:3])
            label = np.asarray(arrays[lbl_key][:3])
            _, _, pred = self.eval_step(params, bstats,
                                        jnp.asarray(image),
                                        jnp.asarray(label))
            onehot = np.eye(self.nclass, dtype=np.float32)[np.asarray(pred)]
            self.summary.visualize_image(self.writer, self.cfg.dataset,
                                         image, label, onehot, global_step)
        except Exception as e:  # visualization must never kill training
            print(f"[warn] train image logging failed: {e}")

    # ------------------------------------------------------------------
    def validation(self, epoch: int) -> float:
        from s2r_tpu.core.mesh import shard_spatial

        self.evaluator.reset()
        params, bstats = self.method.eval_variables(self.state)
        test_loss = 0.0
        n_batches = 0
        val_iter = (
            (shard_spatial({k: v for k, v in b.items()
                            if not isinstance(v, list)}, self.mesh)
             for b in self.val_loader)
            if self.cfg.eval_spatial_shard
            else prefetch_to_device(self.val_loader, self.mesh))
        for batch in val_iter:
            loss, cm, _ = self.eval_step(params, bstats, batch["image"],
                                         batch["label"])
            self.evaluator.merge(cm)
            test_loss += float(loss)
            n_batches += 1

        acc = self.evaluator.Pixel_Accuracy()
        acc_class = self.evaluator.Pixel_Accuracy_Class()
        miou, _ = self.evaluator.Mean_Intersection_over_Union()
        fwiou = self.evaluator.Frequency_Weighted_Intersection_over_Union()
        self.writer.add_scalar("val/total_loss_epoch", test_loss, epoch)
        self.writer.add_scalar("val/mIoU", miou, epoch)
        self.writer.add_scalar("val/Acc", acc, epoch)
        self.writer.add_scalar("val/Acc_class", acc_class, epoch)
        self.writer.add_scalar("val/fwIoU", fwiou, epoch)
        print("Validation:")
        print(f"[Epoch: {epoch}] Acc:{acc:.4f}, Acc_class:{acc_class:.4f}, "
              f"mIoU:{miou:.4f}, fwIoU: {fwiou:.4f}, Loss: {test_loss:.3f}")

        if miou > self.best_pred:
            self.best_pred = miou
            if self.is_main:
                self.saver.save_checkpoint(self.state, epoch + 1,
                                           self.best_pred, is_best=True)
        return miou

    # ------------------------------------------------------------------
    def fit(self):
        from s2r_tpu.utils.profiling import trace

        cfg = self.cfg
        print(f"Starting Epoch: {self.start_epoch}")
        print(f"Total Epoches: {cfg.epochs}")
        epoch = self.start_epoch
        try:
            with trace(cfg.profile_dir):
                for epoch in range(self.start_epoch, cfg.epochs):
                    self.training(epoch)
                    if not cfg.no_val and \
                            epoch % cfg.eval_interval == \
                            (cfg.eval_interval - 1):
                        self.validation(epoch)
        except KeyboardInterrupt:
            # salvage the run: an interrupt should not cost the epoch
            print(f"\n=> interrupted at epoch {epoch}; saving checkpoint")
            if self.is_main:
                self.saver.save_checkpoint(self.state, epoch, self.best_pred,
                                           is_best=False)
            raise
        finally:
            # join the async checkpoint writer: every submitted save must
            # be on disk (and any write error raised) before fit() returns
            self.saver.wait()
            self.writer.close()
