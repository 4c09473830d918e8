"""Exporter: s2r_tpu parameter pytrees -> reference torch checkpoints.

The inverse of torch_import — lets reference tooling (its val*/test* drivers
or any torch DeepLab-V3+ stack) consume weights trained here.  Both
reference schemas are supported:
- single-dict (train_adapt.py:204-209): {'state_dict', 'epoch', 'optimizer',
  'best_pred'}
- 4-model dict (train.py:242-253)

Layouts are transposed back (HWIO -> OIHW); every BatchNorm also gets the
`num_batches_tracked` buffer torch's strict load_state_dict expects.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from s2r_tpu.models.mobilenet import block_plan


def _t(a) -> "object":
    import torch

    return torch.from_numpy(np.asarray(a, np.float32).copy())


def _conv(out: Dict, key: str, leaf: Dict):
    import torch

    out[f"{key}.weight"] = _t(np.transpose(np.asarray(leaf["kernel"]),
                                           (3, 2, 0, 1)))
    if "bias" in leaf:
        out[f"{key}.bias"] = _t(leaf["bias"])


def _bn(out: Dict, key: str, p: Dict, s: Dict):
    import torch

    out[f"{key}.weight"] = _t(p["scale"])
    out[f"{key}.bias"] = _t(p["bias"])
    out[f"{key}.running_mean"] = _t(s["mean"])
    out[f"{key}.running_var"] = _t(s["var"])
    out[f"{key}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)


def export_backbone(params: Dict, stats: Dict, output_stride: int = 16,
                    prefix: str = "") -> Dict:
    out: Dict = {}
    _conv(out, f"{prefix}features.0.0", params["features_0_conv"])
    _bn(out, f"{prefix}features.0.1", params["features_0_bn"],
        stats["features_0_bn"])
    for i, (_, _, _, _, t) in enumerate(block_plan(output_stride)):
        name = f"features_{i + 1}"
        tk = f"{prefix}features.{i + 1}.conv"
        if t == 1:
            idx = {"dw_conv": 0, "dw_bn": 1, "project_conv": 3,
                   "project_bn": 4}
        else:
            idx = {"expand_conv": 0, "expand_bn": 1, "dw_conv": 3,
                   "dw_bn": 4, "project_conv": 6, "project_bn": 7}
        for sub, j in idx.items():
            if sub.endswith("_bn"):
                _bn(out, f"{tk}.{j}", params[name][sub], stats[name][sub])
            else:
                _conv(out, f"{tk}.{j}", params[name][sub])
    # The reference registers features[0:4] / features[4:] a second time as
    # low_level_features / high_level_features (mobilenet.py:116-117), so a
    # strict load_state_dict expects alias keys for every tensor.
    aliases = {}
    for k, v in out.items():
        rest = k[len(prefix):]
        if not rest.startswith("features."):
            continue
        idx_str = rest.split(".")[1]
        tail = rest[len(f"features.{idx_str}."):]
        i = int(idx_str)
        alias_root = "low_level_features" if i < 4 else "high_level_features"
        aliases[f"{prefix}{alias_root}.{i}.{tail}"] = v
    out.update(aliases)
    return out


def export_resnet(params: Dict, stats: Dict, prefix: str = "") -> Dict:
    """ResNet backbone -> torchvision-layout state dict (the inverse of
    torch_import.import_resnet): conv1/bn1 stem; layer{L}.{B}.{conv1..bn3,
    downsample.0/.1}.  Block counts and downsample presence are read off
    the param tree, so one exporter covers resnet50/101."""
    out: Dict = {}
    _conv(out, f"{prefix}conv1", params["conv1"])
    _bn(out, f"{prefix}bn1", params["bn1"], stats["bn1"])
    for name in sorted(k for k in params if k.startswith("layer")):
        li, bi = name[5:].split("_")  # layer{L}_{B}
        tk = f"{prefix}layer{li}.{bi}"
        bp, bs = params[name], stats[name]
        for sub in ("conv1", "conv2", "conv3"):
            _conv(out, f"{tk}.{sub}", bp[sub])
        for sub in ("bn1", "bn2", "bn3"):
            _bn(out, f"{tk}.{sub}", bp[sub], bs[sub])
        if "downsample_conv" in bp:
            _conv(out, f"{tk}.downsample.0", bp["downsample_conv"])
            _bn(out, f"{tk}.downsample.1", bp["downsample_bn"],
                bs["downsample_bn"])
    return out


def export_any_backbone(backbone: str, params: Dict, stats: Dict,
                        output_stride: int = 16, prefix: str = "") -> Dict:
    """Dispatch to the right backbone exporter by factory name."""
    if backbone == "mobilenet":
        return export_backbone(params, stats, output_stride, prefix)
    if backbone in ("resnet", "resnet101", "resnet50"):
        return export_resnet(params, stats, prefix)
    if backbone == "xception":
        return export_xception(params, stats, prefix)
    if backbone == "drn":
        return export_drn(params, stats, prefix)
    raise NotImplementedError(backbone)


def _xception_block_specs():
    """(name, reps, has_skip) per XceptionBlock — the structural rules of
    models/xception.py (param structure is output_stride-independent:
    strides/dilations carry no weights)."""
    specs = [("block1", 2, True), ("block2", 2, True), ("block3", 2, True)]
    specs += [(f"block{i + 4}", 3, False) for i in range(16)]
    specs += [("block20", 2, True)]
    return specs


def _sep_export(out: Dict, key: str, p: Dict, s: Dict):
    """SeparableConv -> torch keys {key}.conv1 (depthwise), {key}.bn
    (the between-dw-and-pw BN), {key}.pointwise."""
    _conv(out, f"{key}.conv1", p["dw"])
    _bn(out, f"{key}.bn", p["dw_bn"], s["dw_bn"])
    _conv(out, f"{key}.pointwise", p["pw"])


def export_xception(params: Dict, stats: Dict, prefix: str = "") -> Dict:
    """AlignedXception -> torch state dict.

    No torch ground truth exists (the reference factory crashes on
    'xception', modeling/backbone/__init__.py:6-7), so this defines the
    canonical torch schema for checkpoint interop — the natural nn.Module
    mirror of models/xception.py: conv1/bn1, conv2/bn2 stem;
    block{k}.sep{r}.{conv1,bn,pointwise} + block{k}.bn{r} (+ skip/skipbn);
    exit conv{3,4,5}.{conv1,bn,pointwise} + bn{3,4,5}.  SeparableConv
    internals use the conv1/bn/pointwise names of the standard
    DeepLab-V3+ torch implementations.  import_xception is the inverse
    (tests/test_torch_xcept_drn.py pins torch-forward parity)."""
    out: Dict = {}
    _conv(out, f"{prefix}conv1", params["conv1"])
    _bn(out, f"{prefix}bn1", params["bn1"], stats["bn1"])
    _conv(out, f"{prefix}conv2", params["conv2"])
    _bn(out, f"{prefix}bn2", params["bn2"], stats["bn2"])
    for name, reps, has_skip in _xception_block_specs():
        bp, bs = params[name], stats[name]
        for r in range(1, reps + 1):
            _sep_export(out, f"{prefix}{name}.sep{r}",
                        bp[f"sep{r}"], bs[f"sep{r}"])
            _bn(out, f"{prefix}{name}.bn{r}", bp[f"bn{r}"], bs[f"bn{r}"])
        if has_skip:
            _conv(out, f"{prefix}{name}.skip", bp["skip_conv"])
            _bn(out, f"{prefix}{name}.skipbn", bp["skip_bn"],
                bs["skip_bn"])
    for name in ("conv3", "conv4", "conv5"):
        _sep_export(out, f"{prefix}{name}", params[name], stats[name])
        _bn(out, f"{prefix}bn{name[-1]}", params[f"{name}_bn"],
            stats[f"{name}_bn"])
    return out


def export_drn(params: Dict, stats: Dict, prefix: str = "") -> Dict:
    """DRN-D-54 -> torch state dict.

    Same situation as export_xception: the reference factory's 'drn' has
    no module, so this defines the interop schema — the nn.Module mirror
    of models/drn.py: level{L}.conv{r}/bn{r} for the plain conv levels
    (1, 2, 7, 8); level{L}.block{B}.{conv1..bn3,downsample.0,downsample.1}
    for the Bottleneck levels 3-6 (torchvision residual-block names)."""
    from s2r_tpu.models.drn import LAYERS_D54

    out: Dict = {}
    conv_levels = {1: LAYERS_D54[0], 2: LAYERS_D54[1],
                   7: LAYERS_D54[6], 8: LAYERS_D54[7]}
    for lv, reps in conv_levels.items():
        lp, ls = params[f"level{lv}"], stats[f"level{lv}"]
        for r in range(1, reps + 1):
            _conv(out, f"{prefix}level{lv}.conv{r}", lp[f"conv{r}"])
            _bn(out, f"{prefix}level{lv}.bn{r}", lp[f"bn{r}"],
                ls[f"bn{r}"])
    res_levels = {3: LAYERS_D54[2], 4: LAYERS_D54[3],
                  5: LAYERS_D54[4], 6: LAYERS_D54[5]}
    for lv, reps in res_levels.items():
        for bi in range(1, reps + 1):
            name = f"level{lv}_block{bi}"
            tk = f"{prefix}level{lv}.block{bi}"
            bp, bs = params[name], stats[name]
            for sub in ("conv1", "conv2", "conv3"):
                _conv(out, f"{tk}.{sub}", bp[sub])
            for sub in ("bn1", "bn2", "bn3"):
                _bn(out, f"{tk}.{sub}", bp[sub], bs[sub])
            if "downsample_conv" in bp:
                _conv(out, f"{tk}.downsample.0", bp["downsample_conv"])
                _bn(out, f"{tk}.downsample.1", bp["downsample_bn"],
                    bs["downsample_bn"])
    return out


def export_aspp(params: Dict, stats: Dict, prefix: str = "") -> Dict:
    out: Dict = {}
    for k in range(1, 5):
        _conv(out, f"{prefix}aspp{k}.atrous_conv",
              params[f"aspp{k}"]["atrous_conv"])
        _bn(out, f"{prefix}aspp{k}.bn", params[f"aspp{k}"]["bn"],
            stats[f"aspp{k}"]["bn"])
    _conv(out, f"{prefix}global_avg_pool.1", params["gap_conv"])
    _bn(out, f"{prefix}global_avg_pool.2", params["gap_bn"], stats["gap_bn"])
    _conv(out, f"{prefix}conv1", params["conv1"])
    _bn(out, f"{prefix}bn1", params["bn1"], stats["bn1"])
    return out


def export_decoder(params: Dict, stats: Dict, prefix: str = "") -> Dict:
    out: Dict = {}
    _conv(out, f"{prefix}conv1", params["conv1"])
    _bn(out, f"{prefix}bn1", params["bn1"], stats["bn1"])
    _conv(out, f"{prefix}last_conv.0", params["last_conv_0"])
    _bn(out, f"{prefix}last_conv.1", params["last_bn_0"], stats["last_bn_0"])
    _conv(out, f"{prefix}last_conv.4", params["last_conv_1"])
    _bn(out, f"{prefix}last_conv.5", params["last_bn_1"], stats["last_bn_1"])
    _conv(out, f"{prefix}last_conv.8", params["classifier"])
    return out


def export_domain(params: Dict, stats: Dict, prefix: str = "") -> Dict:
    out: Dict = {}
    _conv(out, f"{prefix}DC_adnn1.0", params["adnn1_conv"])
    _bn(out, f"{prefix}DC_adnn1.1", params["adnn1_bn"], stats["adnn1_bn"])
    _conv(out, f"{prefix}DC_adnn2.0", params["adnn2_conv"])
    _bn(out, f"{prefix}DC_adnn2.1", params["adnn2_bn"], stats["adnn2_bn"])
    _conv(out, f"{prefix}DC_adnn3", params["adnn3_conv"])
    return out


def export_deeplab(params: Dict, stats: Dict,
                   output_stride: int = 16,
                   backbone: str = "mobilenet") -> Dict:
    """Composite {'backbone','aspp','decoder'} trees -> single state dict
    with reference key names (train_adapt schema)."""
    out: Dict = {}
    out.update(export_any_backbone(backbone, params["backbone"],
                                   stats["backbone"], output_stride,
                                   prefix="backbone."))
    out.update(export_aspp(params["aspp"], stats["aspp"], prefix="aspp."))
    out.update(export_decoder(params["decoder"], stats["decoder"],
                              prefix="decoder."))
    return out


def save_reference_checkpoint(path: str, params: Dict, stats: Dict,
                              epoch: int = 0, best_pred: float = 0.0,
                              output_stride: int = 16,
                              domain: Optional[Tuple[Dict, Dict]] = None,
                              schema: str = "single",
                              backbone: str = "mobilenet") -> None:
    """Write a reference-format .pth.tar.

    schema='single': train_adapt.py:204-209 layout.
    schema='four':   train.py:242-253 layout (stats trees keyed like the
                     feature-method TrainState: params/stats are the
                     composite G trees; `domain` supplies the d_model).
    backbone: which exporter keys the backbone tree (the reference's own
    modules are mobilenet-only; the other names use the canonical schemas
    this module defines).
    """
    import torch

    if schema == "single":
        ckpt = {"state_dict": export_deeplab(params, stats, output_stride,
                                             backbone),
                "optimizer": {}, "epoch": int(epoch),
                "best_pred": float(best_pred)}
    elif schema == "four":
        ckpt = {
            "backbone_model_state_dict": export_any_backbone(
                backbone, params["backbone"], stats["backbone"],
                output_stride),
            "assp_model_state_dict": export_aspp(params["aspp"],
                                                 stats["aspp"]),
            "y_model_state_dict": export_decoder(params["decoder"],
                                                 stats["decoder"]),
            "d_model_state_dict": (export_domain(*domain) if domain
                                   else {}),
            "task_optimizer": {}, "d_optimizer": {}, "d_inv_optimizer": {},
            "c_optimizer": {}, "epoch": int(epoch),
            "best_pred": float(best_pred),
        }
    else:
        raise ValueError(schema)
    torch.save(ckpt, path)
