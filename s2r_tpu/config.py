"""Shared experiment configuration.

The reference duplicates ~120 lines of argparse flags in each of its six CLI
drivers (reference: train.py:315-404, train_adapt.py:258-346, val.py, ...).
Here a single dataclass holds the union of that flag surface; each CLI driver
overlays it with argparse using the same flag names, so reference command
lines keep working.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass
from typing import Optional


@dataclass
class Config:
    # --- model (reference: train_adapt.py:259-263) ---
    backbone: str = "mobilenet"
    out_stride: int = 16
    num_classes: int = 19
    freeze_bn: bool = False
    sync_bn: Optional[bool] = None  # auto: True iff >1 device (train.py:413-417)

    # --- dataset / paths (reference: train_adapt.py:264-283) ---
    dataset: str = "gtav2cityscapes"  # or 'gtav' (source-only)
    src_img_root: str = ""
    src_label_root: str = ""
    tgt_img_root: str = ""
    val_img_root: str = ""
    val_label_root: str = ""
    test_img_root: str = ""
    test_label_root: str = ""
    workers: int = 4
    base_size: int = 512
    crop_size: int = 512
    # 'pil' is the reference-exact path; 'native' uses the C++ pipeline
    # (libs2rpipe) for val/test decode+resize+normalize (1-LSB-identical).
    data_backend: str = "pil"
    # Run flip/scale-crop/normalize as a fused jitted warp on device
    # (data/device_aug.py); hosts ship raw uint8 frames.
    device_aug: bool = False

    # --- loss (reference: train_adapt.py:294-298) ---
    loss_type: str = "ce"  # 'ce' | 'focal'
    use_balanced_weights: bool = False
    no_d_loss: bool = False

    # --- training hyper-params (reference: train_adapt.py:300-325) ---
    epochs: int = 200
    start_epoch: int = 0
    batch_size: int = 4
    test_batch_size: int = 1
    optimizer: str = "SGD"  # train.py supports 'SGD'|'Adam' (train.py:63-82)
    lr: float = 5e-4
    lr_scheduler: str = "poly"  # 'poly' | 'step' | 'cos'
    lr_step: int = 0
    warmup_epochs: int = 0
    momentum: float = 0.9
    weight_decay: float = 5e-4
    nesterov: bool = False

    # --- devices / precision (TPU-native; replaces --no-cuda/--gpu-ids) ---
    num_devices: Optional[int] = None  # default: all local devices
    # Pad the per-chip batch up to a multiple of 8 inside the jitted step
    # (N is the 8-wide sublane dim in XLA's TPU layouts; batch 4 runs ~2.5x
    # slower than batch 8 unpadded).  Pad samples are masked out of BN
    # statistics and every loss — exact small-batch semantics at
    # padded-batch speed.  'auto' pads on TPU backends only.
    batch_pad: str = "auto"  # 'auto' | 'off'
    # Memoize decoded u8 frames on the train path (tf.data .cache() idea):
    # epoch >= 2 skips host PNG decode entirely.  Without --device-aug the
    # augmentation also runs directly from the cache at crop resolution
    # (data/hostcrop.py) and ships uint8 crops.  Frames beyond the byte
    # budget decode per access (graceful degradation — full GTA5 ~145 GB
    # never fits; Cityscapes ~19 GB does).
    data_cache: bool = False
    data_cache_gb: float = 32.0
    precision: str = "bf16"  # 'bf16' compute / f32 params, or 'f32'
    # Reproduce the reference's fixed_padding BN-statistics quirk exactly
    # (expand-BN train stats include the padded zero ring — see
    # models/mobilenet.py).  False trades exact torch train dynamics for
    # ~10% faster steps (ring-free tensors tile better).
    pad_stats: bool = True
    # Rematerialize blocks in the backward pass (identical numerics).
    # Measured SLOWER at 512x1024/batch-8 on v5e (45 vs 54 img/s): the
    # recomputed intermediates exceed VMEM so they round-trip HBM anyway.
    # Enable for larger-than-memory configs (e.g. full-res 2048x1024 train).
    remat: bool = False
    seed: int = 1
    # PRNG implementation for dropout masks: 'rbg' is the TPU-native fast
    # generator (threefry counts ~10 ops/element and shows up at 512x1024
    # dropout sizes).  'threefry2x32' gives sharding-invariant masks.
    prng_impl: str = "rbg"

    # --- observability (no reference equivalent — SURVEY.md §5) ---
    profile_dir: Optional[str] = None  # jax.profiler trace output dir

    # --- checkpointing (reference: train_adapt.py:334-341) ---
    resume: Optional[str] = None
    # Initialize the backbone from a torch MobileNetV2 state dict, the
    # equivalent of the reference's bundled mobilenet_VOC.pth
    # (mobilenet.py:113-132).
    backbone_init: Optional[str] = None
    checkname: Optional[str] = None
    ft: bool = True  # reference default (train.py:398): optimizer state NOT restored
    run_root: str = "run"
    # Async checkpointing: snapshot the state on-device, then transfer +
    # serialize + write on a background thread so the train loop never
    # stalls on checkpoint IO (the device->host pull alone is ~10 s for a
    # resnet101 state over the axon tunnel).  Files are byte-identical to
    # sync saves; the Trainer joins the writer before exiting.
    async_save: bool = True

    # --- evaluation (reference: train_adapt.py:343-346) ---
    eval_interval: int = 1
    no_val: bool = False
    # Shard the image H axis over the mesh during validation (GSPMD inserts
    # conv halo exchanges) — for full-res sweeps that don't fit one chip.
    eval_spatial_shard: bool = False
    # Train-time spatial sharding: split the image H axis over this many
    # devices (a 2-D data x space mesh; GSPMD halo exchanges in the convs
    # and BN/grad reductions span both axes).  1 = pure data parallelism
    # (the reference scope).  For full-res crops too large for one chip.
    spatial_shard: int = 1
    # dtype of the full-res upsampled logits: 'f32' (reference semantics —
    # CE/softmax consume f32 maps) or 'bf16' (opt-in fast mode: halves the
    # HBM traffic of every full-res 19-channel tensor — resize write,
    # adversarial softmax maps, discriminator input + layout copies, CE
    # input, and their gradients).  Loss reductions stay f32 either way.
    logits_dtype: str = "f32"
    # Compute the ASPP/decoder concat convs as split-kernel sums instead of
    # materializing the 1280/304-channel concats (models/deeplab.py
    # split_concat).  Identical parameter tree and checkpoints; float-sum
    # reassociation only.  Off by default (exact concat-order arithmetic).
    split_concat: bool = False

    # --- faithful-quirk switches (reference behaviors preserved by default,
    #     see SURVEY.md §2.6; flip to fix) ---
    # F.softmax(output, dim=0) over the *batch* axis feeding the output-space
    # discriminator (reference: train_adapt.py:151,166,174).  'batch' is the
    # faithful setting; 'class' is the AdaptSegNet-correct one.
    adv_softmax_axis: str = "batch"
    # drop_last=True on val/test loaders silently drops tail images
    # (reference: dataloders/__init__.py:12-13).
    val_drop_last: bool = True

    def __post_init__(self):
        if self.checkname is None:
            self.checkname = "deeplab-" + str(self.backbone)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        d = json.loads(text)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def _str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("1", "true", "yes", "y")


def add_common_flags(parser: argparse.ArgumentParser) -> None:
    """Register the reference's shared flag surface on an argparse parser.

    Flag names and defaults mirror reference train_adapt.py:258-346; flags the
    reference spells with dashes (--out-stride) keep the dashed spelling.
    """
    d = Config()
    p = parser
    # the reference's factory names resnet/xception/drn but ships no
    # modules for them (backbone/__init__.py:4-9 crash if selected); here
    # every factory choice is actually implemented
    p.add_argument("--backbone", type=str, default=d.backbone,
                   choices=["mobilenet", "resnet", "resnet101", "resnet50",
                            "xception", "drn"])
    p.add_argument("--out-stride", type=int, default=d.out_stride, dest="out_stride")
    p.add_argument("--dataset", type=str, default=d.dataset,
                   choices=["gtav2cityscapes", "gtav", "synthetic"])
    p.add_argument("--src_img_root", type=str, default=d.src_img_root)
    p.add_argument("--src_label_root", type=str, default=d.src_label_root)
    p.add_argument("--tgt_img_root", type=str, default=d.tgt_img_root)
    p.add_argument("--val_img_root", type=str, default=d.val_img_root)
    p.add_argument("--val_label_root", type=str, default=d.val_label_root)
    p.add_argument("--test_img_root", type=str, default=d.test_img_root)
    p.add_argument("--test_label_root", type=str, default=d.test_label_root)
    p.add_argument("--workers", type=int, default=d.workers, metavar="N")
    p.add_argument("--data-backend", type=str, default=d.data_backend,
                   choices=["pil", "native"], dest="data_backend")
    p.add_argument("--device-aug", action="store_true",
                   default=d.device_aug, dest="device_aug")
    p.add_argument("--base-size", type=int, default=d.base_size, dest="base_size")
    p.add_argument("--crop-size", type=int, default=d.crop_size, dest="crop_size")
    p.add_argument("--sync-bn", type=_str2bool, default=None, dest="sync_bn")
    p.add_argument("--freeze-bn", type=_str2bool, default=d.freeze_bn, dest="freeze_bn")
    p.add_argument("--loss-type", type=str, default=d.loss_type,
                   choices=["ce", "focal"], dest="loss_type")
    p.add_argument("--no_d_loss", type=_str2bool, default=d.no_d_loss)
    p.add_argument("--epochs", type=int, default=d.epochs, metavar="N")
    p.add_argument("--optimizer", type=str, default=d.optimizer)
    p.add_argument("--start_epoch", type=int, default=d.start_epoch, metavar="N")
    p.add_argument("--batch-size", type=int, default=d.batch_size, dest="batch_size")
    p.add_argument("--test-batch-size", type=int, default=d.test_batch_size,
                   dest="test_batch_size")
    p.add_argument("--lr", type=float, default=d.lr, metavar="LR")
    p.add_argument("--lr-scheduler", type=str, default=d.lr_scheduler,
                   choices=["poly", "step", "cos"], dest="lr_scheduler")
    p.add_argument("--lr-step", type=int, default=d.lr_step, dest="lr_step",
                   help="epochs per 0.1x decay for --lr-scheduler step")
    p.add_argument("--warmup-epochs", type=int, default=d.warmup_epochs,
                   dest="warmup_epochs",
                   help="linear LR warmup epochs (0 = off)")
    p.add_argument("--momentum", type=float, default=d.momentum, metavar="M")
    p.add_argument("--weight-decay", type=float, default=d.weight_decay,
                   dest="weight_decay", metavar="M")
    p.add_argument("--nesterov", action="store_true", default=d.nesterov)
    p.add_argument("--use_balanced_weights", action="store_true",
                   default=d.use_balanced_weights)
    p.add_argument("--num-devices", type=int, default=None, dest="num_devices")
    p.add_argument("--batch-pad", type=str, default=d.batch_pad,
                   dest="batch_pad", choices=["auto", "off"],
                   help="pad per-chip batch to a multiple of 8 inside the "
                        "step (masked — exact semantics); 'auto' = TPU only")
    p.add_argument("--data-cache", action="store_true", dest="data_cache",
                   default=d.data_cache,
                   help="memoize decoded frames on the train path; without "
                        "--device-aug, augmentation runs from the cache at "
                        "crop resolution and ships uint8")
    p.add_argument("--data-cache-gb", type=float, default=d.data_cache_gb,
                   dest="data_cache_gb",
                   help="frame-cache byte budget; over-budget frames decode "
                        "per access")
    p.add_argument("--precision", type=str, default=d.precision,
                   choices=["bf16", "f32"])
    p.add_argument("--remat", action="store_true", dest="remat",
                   default=d.remat)
    p.add_argument("--fast-pad-stats", action="store_false", dest="pad_stats",
                   default=d.pad_stats,
                   help="skip the reference's padded-ring BN statistics "
                        "(~10%% faster steps, same eval function)")
    p.add_argument("--seed", type=int, default=d.seed, metavar="S")
    p.add_argument("--prng-impl", type=str, default=d.prng_impl,
                   choices=["rbg", "threefry2x32", "unsafe_rbg"],
                   dest="prng_impl")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--backbone-init", type=str, default=None,
                   dest="backbone_init",
                   help="torch MobileNetV2 state-dict .pth to initialize the "
                        "backbone (reference: mobilenet_VOC.pth)")
    p.add_argument("--profile-dir", type=str, default=None,
                   dest="profile_dir")
    p.add_argument("--checkname", type=str, default=None)
    p.add_argument("--ft", action="store_true", default=d.ft)
    p.add_argument("--eval-interval", type=int, default=d.eval_interval,
                   dest="eval_interval")
    p.add_argument("--eval-spatial-shard", action="store_true",
                   default=d.eval_spatial_shard, dest="eval_spatial_shard")
    p.add_argument("--spatial-shard", type=int, default=d.spatial_shard,
                   dest="spatial_shard",
                   help="shard the image H axis over this many devices "
                        "during training (data x space mesh)")
    p.add_argument("--logits-dtype", type=str, default=d.logits_dtype,
                   choices=["f32", "bf16"], dest="logits_dtype",
                   help="dtype of the full-res upsampled logits (bf16 = "
                        "opt-in fast mode; f32 = reference semantics)")
    p.add_argument("--split-concat", action="store_true",
                   default=d.split_concat, dest="split_concat",
                   help="compute the ASPP/decoder concat convs as "
                        "split-kernel sums (no materialized concat; same "
                        "checkpoints, float-sum reassociation only)")
    p.add_argument("--no-val", action="store_true", default=d.no_val, dest="no_val")
    p.add_argument("--no-async-save", action="store_false", dest="async_save",
                   default=d.async_save,
                   help="write checkpoints synchronously in the train loop "
                        "(default: overlap checkpoint IO with training)")
    p.add_argument("--run-root", type=str, default=d.run_root, dest="run_root")
    p.add_argument("--adv-softmax-axis", type=str, default=d.adv_softmax_axis,
                   choices=["batch", "class"], dest="adv_softmax_axis")
    p.add_argument("--no-val-drop-last", action="store_false",
                   dest="val_drop_last", default=d.val_drop_last,
                   help="evaluate the tail val/test batch too (the "
                        "reference's loaders silently drop it — quirk "
                        "preserved by default)")


def config_from_args(args: argparse.Namespace) -> Config:
    known = {f.name for f in dataclasses.fields(Config)}
    return Config(**{k: v for k, v in vars(args).items() if k in known})


def apply_platform_override() -> None:
    """Honor S2R_PLATFORM=cpu|tpu|... for CLI runs.

    Some TPU plugin environments pin JAX_PLATFORMS so the env var alone can't
    select the CPU backend; jax.config.update can.  Must run before first
    backend use."""
    import os

    plat = os.environ.get("S2R_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    # Multi-host process-group bootstrap (no-op unless JAX_COORDINATOR_ADDRESS
    # / JAX_NUM_PROCESSES / JAX_PROCESS_ID are set).  Must also run before
    # first backend use, so it lives in the same CLI bootstrap hook.
    from s2r_tpu.core.distributed import maybe_initialize

    maybe_initialize()
