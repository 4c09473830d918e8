"""Importer: reference torch checkpoints -> s2r_tpu parameter pytrees.

Handles both reference checkpoint schemas (SURVEY.md §2.5):
- single-dict (train_adapt.py:204-209): {'state_dict': DeepLab, 'epoch',
  'optimizer', 'best_pred'}
- 4-model dict (train.py:242-253): {'backbone_model_state_dict',
  'assp_model_state_dict', 'y_model_state_dict', 'd_model_state_dict', ...}

Weight layout conversion: torch conv weights are OIHW, ours HWIO — the
transpose (2, 3, 1, 0) covers both regular and depthwise (torch depthwise is
[C,1,kh,kw] -> ours [kh,kw,1,C]).  BatchNorm maps weight/bias ->
params.scale/bias and running_mean/var -> batch_stats.mean/var
(num_batches_tracked is dropped — the reference never uses it since
momentum is fixed).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from s2r_tpu.models.mobilenet import block_plan


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        arr = t
    else:
        arr = t.detach().cpu().numpy()  # torch tensor
    # float16/bf16 sources widen to f32; f32/f64 pass through (f64 matters
    # for the float64 parity harness)
    if arr.dtype not in (np.float32, np.float64):
        arr = arr.astype(np.float32)
    return arr


def _conv_w(t) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(_np(t), (2, 3, 1, 0)))


class _TreeBuilder:
    def __init__(self):
        self.params: Dict = {}
        self.stats: Dict = {}

    def _set(self, root, path, value):
        d = root
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = value

    def conv(self, sd, torch_key, path, bias=False):
        self._set(self.params, path + ("kernel",),
                  _conv_w(sd[torch_key + ".weight"]))
        if bias:
            self._set(self.params, path + ("bias",),
                      _np(sd[torch_key + ".bias"]))

    def bn(self, sd, torch_key, path):
        self._set(self.params, path + ("scale",),
                  _np(sd[torch_key + ".weight"]))
        self._set(self.params, path + ("bias",),
                  _np(sd[torch_key + ".bias"]))
        self._set(self.stats, path + ("mean",),
                  _np(sd[torch_key + ".running_mean"]))
        self._set(self.stats, path + ("var",),
                  _np(sd[torch_key + ".running_var"]))


def import_backbone(sd: Dict, output_stride: int = 16,
                    prefix: str = "") -> Tuple[Dict, Dict]:
    """torch MobileNetV2 state dict -> (params, batch_stats).

    torch key layout (mobilenet.py:37-60,91): features.0.{0,1} is the stem
    conv/bn; features.i.conv.<j> with j = (0 dw, 1 bn, 3 pw, 4 bn) when
    expand_ratio==1 else (0 pw, 1 bn, 3 dw, 4 bn, 6 pw, 7 bn).
    """
    b = _TreeBuilder()
    p = prefix
    b.conv(sd, f"{p}features.0.0", ("features_0_conv",))
    b.bn(sd, f"{p}features.0.1", ("features_0_bn",))
    for i, (_, _, _, _, t) in enumerate(block_plan(output_stride)):
        tk = f"{p}features.{i + 1}.conv"
        name = f"features_{i + 1}"
        if t == 1:
            idx = {"dw_conv": 0, "dw_bn": 1, "project_conv": 3,
                   "project_bn": 4}
        else:
            idx = {"expand_conv": 0, "expand_bn": 1, "dw_conv": 3,
                   "dw_bn": 4, "project_conv": 6, "project_bn": 7}
        for sub, j in idx.items():
            if sub.endswith("_bn"):
                b.bn(sd, f"{tk}.{j}", (name, sub))
            else:
                b.conv(sd, f"{tk}.{j}", (name, sub))
    return b.params, b.stats


def import_aspp(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    b = _TreeBuilder()
    p = prefix
    for k in range(1, 5):
        b.conv(sd, f"{p}aspp{k}.atrous_conv", (f"aspp{k}", "atrous_conv"))
        b.bn(sd, f"{p}aspp{k}.bn", (f"aspp{k}", "bn"))
    b.conv(sd, f"{p}global_avg_pool.1", ("gap_conv",))
    b.bn(sd, f"{p}global_avg_pool.2", ("gap_bn",))
    b.conv(sd, f"{p}conv1", ("conv1",))
    b.bn(sd, f"{p}bn1", ("bn1",))
    return b.params, b.stats


def import_decoder(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    b = _TreeBuilder()
    p = prefix
    b.conv(sd, f"{p}conv1", ("conv1",))
    b.bn(sd, f"{p}bn1", ("bn1",))
    b.conv(sd, f"{p}last_conv.0", ("last_conv_0",))
    b.bn(sd, f"{p}last_conv.1", ("last_bn_0",))
    b.conv(sd, f"{p}last_conv.4", ("last_conv_1",))
    b.bn(sd, f"{p}last_conv.5", ("last_bn_1",))
    b.conv(sd, f"{p}last_conv.8", ("classifier",), bias=True)
    return b.params, b.stats


def import_domain(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    b = _TreeBuilder()
    p = prefix
    b.conv(sd, f"{p}DC_adnn1.0", ("adnn1_conv",))
    b.bn(sd, f"{p}DC_adnn1.1", ("adnn1_bn",))
    b.conv(sd, f"{p}DC_adnn2.0", ("adnn2_conv",))
    b.bn(sd, f"{p}DC_adnn2.1", ("adnn2_bn",))
    b.conv(sd, f"{p}DC_adnn3", ("adnn3_conv",), bias=True)
    return b.params, b.stats


def import_resnet(sd: Dict, depth: str = "resnet101",
                  prefix: str = "") -> Tuple[Dict, Dict]:
    """torch(vision)-layout ResNet state dict -> (params, batch_stats).

    Key layout: conv1/bn1 stem; layer{L}.{B}.{conv1,bn1,conv2,bn2,conv3,
    bn3[,downsample.0,downsample.1]} -> our layer{L}_{B}/... names
    (s2r_tpu/models/resnet.py).  Classifier fc.* keys are ignored.
    """
    blocks = {"resnet101": (3, 4, 23, 3), "resnet50": (3, 4, 6, 3)}[depth]
    b = _TreeBuilder()
    p = prefix
    b.conv(sd, f"{p}conv1", ("conv1",))
    b.bn(sd, f"{p}bn1", ("bn1",))
    for li in range(4):
        for bi in range(blocks[li]):
            tk = f"{p}layer{li + 1}.{bi}"
            name = f"layer{li + 1}_{bi}"
            for sub in ("conv1", "conv2", "conv3"):
                b.conv(sd, f"{tk}.{sub}", (name, sub))
            for sub in ("bn1", "bn2", "bn3"):
                b.bn(sd, f"{tk}.{sub}", (name, sub))
            if f"{tk}.downsample.0.weight" in sd:
                b.conv(sd, f"{tk}.downsample.0", (name, "downsample_conv"))
                b.bn(sd, f"{tk}.downsample.1", (name, "downsample_bn"))
    return b.params, b.stats


def import_discriminator(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    b = _TreeBuilder()
    p = prefix
    for k in ("conv1", "conv2", "conv3", "conv4", "classifier"):
        b.conv(sd, f"{p}{k}", (k,), bias=True)
    return b.params, b.stats


def import_deeplab(sd: Dict, output_stride: int = 16) -> Tuple[Dict, Dict]:
    """Composite DeepLab state dict (train_adapt schema) -> (params,
    batch_stats) with top-level keys backbone/aspp/decoder."""
    bp, bs = import_backbone(sd, output_stride, prefix="backbone.")
    ap, as_ = import_aspp(sd, prefix="aspp.")
    dp, ds = import_decoder(sd, prefix="decoder.")
    params = {"backbone": bp, "aspp": ap, "decoder": dp}
    stats = {"backbone": bs, "aspp": as_, "decoder": ds}
    return params, stats


def import_reference_checkpoint(path: str, output_stride: int = 16) -> Dict:
    """Load a reference .pth.tar and return pytrees for whichever schema it
    holds:
      {'G': (params, stats), 'D': (params, stats) or None,
       'epoch': int, 'best_pred': float, 'schema': 'single'|'four'}
    """
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {"epoch": int(ckpt.get("epoch", 0)),
           "best_pred": float(ckpt.get("best_pred", 0.0))}
    if "state_dict" in ckpt:
        out["schema"] = "single"
        out["G"] = import_deeplab(ckpt["state_dict"], output_stride)
        out["D"] = None
    else:
        out["schema"] = "four"
        bp, bs = import_backbone(ckpt["backbone_model_state_dict"],
                                 output_stride)
        ap, as_ = import_aspp(ckpt["assp_model_state_dict"])
        dp, ds = import_decoder(ckpt["y_model_state_dict"])
        out["G"] = ({"backbone": bp, "aspp": ap, "decoder": dp},
                    {"backbone": bs, "aspp": as_, "decoder": ds})
        out["D"] = import_domain(ckpt["d_model_state_dict"])
    return out
