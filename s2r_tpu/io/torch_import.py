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
    """Also records `order`: (our_path, is_conv_weight) per torch parameter,
    in torch `named_parameters()` order (builder call order mirrors module
    definition order) — the key to mapping torch optimizer state, whose
    param ids index that order (torch.optim state_dict format)."""

    def __init__(self):
        self.params: Dict = {}
        self.stats: Dict = {}
        self.order = []  # [(path, is_conv_weight)]

    def _set(self, root, path, value):
        d = root
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = value

    def conv(self, sd, torch_key, path, bias=False):
        self._set(self.params, path + ("kernel",),
                  _conv_w(sd[torch_key + ".weight"]))
        self.order.append((path + ("kernel",), True))
        if bias:
            self._set(self.params, path + ("bias",),
                      _np(sd[torch_key + ".bias"]))
            self.order.append((path + ("bias",), False))

    def bn(self, sd, torch_key, path):
        self._set(self.params, path + ("scale",),
                  _np(sd[torch_key + ".weight"]))
        self._set(self.params, path + ("bias",),
                  _np(sd[torch_key + ".bias"]))
        self.order.append((path + ("scale",), False))
        self.order.append((path + ("bias",), False))
        self._set(self.stats, path + ("mean",),
                  _np(sd[torch_key + ".running_mean"]))
        self._set(self.stats, path + ("var",),
                  _np(sd[torch_key + ".running_var"]))


def import_backbone(sd: Dict, output_stride: int = 16,
                    prefix: str = "", order_sink=None,
                    path_prefix: Tuple = ()) -> Tuple[Dict, Dict]:
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
    if order_sink is not None:
        order_sink.extend((path_prefix + p, c) for p, c in b.order)
    return b.params, b.stats


def import_aspp(sd: Dict, prefix: str = "", order_sink=None,
                path_prefix: Tuple = ()) -> Tuple[Dict, Dict]:
    b = _TreeBuilder()
    p = prefix
    for k in range(1, 5):
        b.conv(sd, f"{p}aspp{k}.atrous_conv", (f"aspp{k}", "atrous_conv"))
        b.bn(sd, f"{p}aspp{k}.bn", (f"aspp{k}", "bn"))
    b.conv(sd, f"{p}global_avg_pool.1", ("gap_conv",))
    b.bn(sd, f"{p}global_avg_pool.2", ("gap_bn",))
    b.conv(sd, f"{p}conv1", ("conv1",))
    b.bn(sd, f"{p}bn1", ("bn1",))
    if order_sink is not None:
        order_sink.extend((path_prefix + p, c) for p, c in b.order)
    return b.params, b.stats


def import_decoder(sd: Dict, prefix: str = "", order_sink=None,
                   path_prefix: Tuple = ()) -> Tuple[Dict, Dict]:
    b = _TreeBuilder()
    p = prefix
    b.conv(sd, f"{p}conv1", ("conv1",))
    b.bn(sd, f"{p}bn1", ("bn1",))
    b.conv(sd, f"{p}last_conv.0", ("last_conv_0",))
    b.bn(sd, f"{p}last_conv.1", ("last_bn_0",))
    b.conv(sd, f"{p}last_conv.4", ("last_conv_1",))
    b.bn(sd, f"{p}last_conv.5", ("last_bn_1",))
    b.conv(sd, f"{p}last_conv.8", ("classifier",), bias=True)
    if order_sink is not None:
        order_sink.extend((path_prefix + p, c) for p, c in b.order)
    return b.params, b.stats


def import_domain(sd: Dict, prefix: str = "", order_sink=None,
                  path_prefix: Tuple = ()) -> Tuple[Dict, Dict]:
    b = _TreeBuilder()
    p = prefix
    b.conv(sd, f"{p}DC_adnn1.0", ("adnn1_conv",))
    b.bn(sd, f"{p}DC_adnn1.1", ("adnn1_bn",))
    b.conv(sd, f"{p}DC_adnn2.0", ("adnn2_conv",))
    b.bn(sd, f"{p}DC_adnn2.1", ("adnn2_bn",))
    b.conv(sd, f"{p}DC_adnn3", ("adnn3_conv",), bias=True)
    if order_sink is not None:
        order_sink.extend((path_prefix + p, c) for p, c in b.order)
    return b.params, b.stats


def import_resnet(sd: Dict, depth: str = "resnet101",
                  prefix: str = "", order_sink=None,
                  path_prefix: Tuple = ()) -> Tuple[Dict, Dict]:
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
    if order_sink is not None:
        order_sink.extend((path_prefix + p, c) for p, c in b.order)
    return b.params, b.stats


def _sep_import(b: "_TreeBuilder", sd: Dict, torch_key: str, path):
    """torch {key}.{conv1 (depthwise), bn, pointwise} -> flax SeparableConv
    {dw, dw_bn, pw} (models/xception.py:37-54)."""
    b.conv(sd, f"{torch_key}.conv1", path + ("dw",))
    b.bn(sd, f"{torch_key}.bn", path + ("dw_bn",))
    b.conv(sd, f"{torch_key}.pointwise", path + ("pw",))


def import_xception(sd: Dict, prefix: str = "", order_sink=None,
                    path_prefix: Tuple = ()) -> Tuple[Dict, Dict]:
    """torch AlignedXception state dict -> (params, batch_stats).

    Key schema: the canonical torch mirror defined by
    torch_export.export_xception (the reference factory ships no xception
    module, modeling/backbone/__init__.py:6-7): conv1/bn1, conv2/bn2;
    block{k}.sep{r}.{conv1,bn,pointwise} + block{k}.bn{r} (+ skip/skipbn);
    exit conv{3,4,5}.{conv1,bn,pointwise} + bn{3,4,5}.  Param structure is
    output_stride-independent."""
    from s2r_tpu.io.torch_export import _xception_block_specs

    b = _TreeBuilder()
    p = prefix
    b.conv(sd, f"{p}conv1", ("conv1",))
    b.bn(sd, f"{p}bn1", ("bn1",))
    b.conv(sd, f"{p}conv2", ("conv2",))
    b.bn(sd, f"{p}bn2", ("bn2",))
    for name, reps, has_skip in _xception_block_specs():
        for r in range(1, reps + 1):
            _sep_import(b, sd, f"{p}{name}.sep{r}", (name, f"sep{r}"))
            b.bn(sd, f"{p}{name}.bn{r}", (name, f"bn{r}"))
        if has_skip:
            b.conv(sd, f"{p}{name}.skip", (name, "skip_conv"))
            b.bn(sd, f"{p}{name}.skipbn", (name, "skip_bn"))
    for name in ("conv3", "conv4", "conv5"):
        _sep_import(b, sd, f"{p}{name}", (name,))
        b.bn(sd, f"{p}bn{name[-1]}", (f"{name}_bn",))
    if order_sink is not None:
        order_sink.extend((path_prefix + pa, c) for pa, c in b.order)
    return b.params, b.stats


def import_drn(sd: Dict, prefix: str = "", order_sink=None,
               path_prefix: Tuple = ()) -> Tuple[Dict, Dict]:
    """torch DRN-D-54 state dict -> (params, batch_stats).

    Key schema: the canonical torch mirror defined by
    torch_export.export_drn: level{L}.conv{r}/bn{r} for plain conv levels
    (1, 2, 7, 8); level{L}.block{B}.{conv1..bn3,downsample.0/.1} for the
    Bottleneck levels 3-6 (torchvision residual-block names) -> our
    level{L}_block{B} trees (models/drn.py)."""
    from s2r_tpu.models.drn import LAYERS_D54

    b = _TreeBuilder()
    p = prefix
    for lv, reps in ((1, LAYERS_D54[0]), (2, LAYERS_D54[1]),
                     (7, LAYERS_D54[6]), (8, LAYERS_D54[7])):
        for r in range(1, reps + 1):
            b.conv(sd, f"{p}level{lv}.conv{r}", (f"level{lv}", f"conv{r}"))
            b.bn(sd, f"{p}level{lv}.bn{r}", (f"level{lv}", f"bn{r}"))
    for lv, reps in ((3, LAYERS_D54[2]), (4, LAYERS_D54[3]),
                     (5, LAYERS_D54[4]), (6, LAYERS_D54[5])):
        for bi in range(1, reps + 1):
            tk = f"{p}level{lv}.block{bi}"
            name = f"level{lv}_block{bi}"
            for sub in ("conv1", "conv2", "conv3"):
                b.conv(sd, f"{tk}.{sub}", (name, sub))
            for sub in ("bn1", "bn2", "bn3"):
                b.bn(sd, f"{tk}.{sub}", (name, sub))
            if f"{tk}.downsample.0.weight" in sd:
                b.conv(sd, f"{tk}.downsample.0", (name, "downsample_conv"))
                b.bn(sd, f"{tk}.downsample.1", (name, "downsample_bn"))
    if order_sink is not None:
        order_sink.extend((path_prefix + pa, c) for pa, c in b.order)
    return b.params, b.stats


def import_discriminator(sd: Dict, prefix: str = "", order_sink=None,
                         path_prefix: Tuple = ()) -> Tuple[Dict, Dict]:
    b = _TreeBuilder()
    p = prefix
    for k in ("conv1", "conv2", "conv3", "conv4", "classifier"):
        b.conv(sd, f"{p}{k}", (k,), bias=True)
    if order_sink is not None:
        order_sink.extend((path_prefix + p, c) for p, c in b.order)
    return b.params, b.stats


def import_deeplab(sd: Dict, output_stride: int = 16,
                   backbone: str = "mobilenet") -> Tuple[Dict, Dict]:
    """Composite DeepLab state dict (train_adapt schema) -> (params,
    batch_stats) with top-level keys backbone/aspp/decoder."""
    bp, bs = _backbone_importer(backbone)(sd, output_stride,
                                          prefix="backbone.")
    ap, as_ = import_aspp(sd, prefix="aspp.")
    dp, ds = import_decoder(sd, prefix="decoder.")
    params = {"backbone": bp, "aspp": ap, "decoder": dp}
    stats = {"backbone": bs, "aspp": as_, "decoder": ds}
    return params, stats


# ---------------------------------------------------------------------------
# torch optimizer-state import (--ft false resume parity)
# ---------------------------------------------------------------------------
#
# The reference restores optimizer state dicts on resume unless --ft
# (train.py:138-142, train_adapt.py:105-106).  torch.optim state_dict format:
# {'state': {id: {per-param tensors}}, 'param_groups': [{'params': [ids]}]}
# where ids index the parameters in construction (group-concatenated) order —
# exactly the `order` lists the importers record.  Buffers shaped like conv
# weights get the same OIHW->HWIO transpose as the weights themselves.
# torch SGD's momentum_buffer equals our zero-initialized buffer after the
# same steps (buf_1 = d either way), so values copy over directly; Adam's
# exp_avg/exp_avg_sq/step map to m/v/count.


def _ordered_param_ids(opt_sd: Dict):
    ids = []
    for g in opt_sd["param_groups"]:
        ids.extend(g["params"])
    return ids


def _get_tree(root: Dict, path):
    for p in path:
        root = root[p]
    return root


def _state_value(entry_value, is_conv: bool) -> np.ndarray:
    return _conv_w(entry_value) if is_conv else _np(entry_value)


def import_optimizer_state(opt_sd: Dict, order, params_template) -> Dict:
    """torch optimizer state dict -> per-leaf trees over `params_template`
    (the imported numpy params tree the optimizer covers).

    Returns {'kind': 'sgd'|'adam'|'empty', ...trees}.  Missing per-param
    entries (e.g. never-stepped optimizers, or SGD before its first step)
    come back zero — identical to fresh init."""
    ids = _ordered_param_ids(opt_sd)
    if len(ids) != len(order):
        raise ValueError(
            f"optimizer covers {len(ids)} params but architecture order has "
            f"{len(order)} — checkpoint/architecture mismatch")
    state = opt_sd.get("state", {})
    kind = "empty"
    for st in state.values():
        if "exp_avg" in st:
            kind = "adam"
            break
        if st.get("momentum_buffer") is not None:
            kind = "sgd"
            break
    zeros = lambda: jax_tree_zeros(params_template)  # noqa: E731
    if kind == "empty":
        return {"kind": "empty"}
    if kind == "sgd":
        mom = zeros()
        for pid, (path, is_conv) in zip(ids, order):
            st = state.get(pid)
            if st is None or st.get("momentum_buffer") is None:
                continue
            _set_tree(mom, path, _state_value(st["momentum_buffer"], is_conv))
        return {"kind": "sgd", "momentum": mom}
    m, v = zeros(), zeros()
    count = 0
    for pid, (path, is_conv) in zip(ids, order):
        st = state.get(pid)
        if st is None:
            continue
        _set_tree(m, path, _state_value(st["exp_avg"], is_conv))
        _set_tree(v, path, _state_value(st["exp_avg_sq"], is_conv))
        count = max(count, int(st.get("step", 0)))
    return {"kind": "adam", "m": m, "v": v, "count": count}


def jax_tree_zeros(template):
    """Nested-dict deep copy with zero leaves (numpy)."""
    if isinstance(template, dict):
        return {k: jax_tree_zeros(v) for k, v in template.items()}
    return np.zeros_like(np.asarray(template), dtype=np.float32)


def _set_tree(root: Dict, path, value: np.ndarray):
    for p in path[:-1]:
        root = root[p]
    assert root[path[-1]].shape == value.shape, (path, root[path[-1]].shape,
                                                 value.shape)
    root[path[-1]] = value


def merge_torch_opt_state(opt_imports: Dict, params, opt_state: Dict) -> Dict:
    """Imported torch optimizer trees -> the fused flat-buffer opt_state.

    `params` is the (already-imported) TrainState.params; `opt_state` the
    current state whose entries get replaced.  The flat layout is
    jax.tree.flatten order over the params subtree each optimizer covers
    (train/optim.py::_FlatSpec) — identical to what the train step's
    FusedOptimizer rebuilds from the same params.
    """
    import jax.numpy as jnp

    from s2r_tpu.train.optim import _FlatSpec

    new_opt = dict(opt_state)
    for key, imp in opt_imports.items():
        if key not in new_opt or imp["kind"] == "empty":
            continue  # zeros == fresh init (e.g. the never-stepped 'c')
        cur = new_opt[key]
        want = "sgd" if "momentum" in cur else "adam"
        if imp["kind"] != want:
            raise ValueError(
                f"checkpoint optimizer '{key}' is {imp['kind']} but the run "
                f"is configured for {want} — pass --optimizer to match or "
                f"resume with --ft")
        if key in ("G", "task", "c"):
            sub = params["G"]
        elif key in ("D", "d"):
            sub = params["D"]
        else:  # d_inv covers f = backbone + aspp
            sub = {"backbone": params["G"]["backbone"],
                   "aspp": params["G"]["aspp"]}
        spec = _FlatSpec(sub)
        if imp["kind"] == "sgd":
            new_opt[key] = {"momentum": spec.flatten(imp["momentum"])}
        else:
            new_opt[key] = {"m": spec.flatten(imp["m"]),
                            "v": spec.flatten(imp["v"]),
                            "count": jnp.asarray(imp["count"], jnp.int32)}
    return new_opt


def _backbone_importer(backbone: str):
    """Backbone-state-dict importer by factory name.  mobilenet is the
    reference's own layout; resnet is torchvision; xception/drn use the
    canonical schemas defined by torch_export."""
    if backbone == "mobilenet":
        return import_backbone
    if backbone in ("resnet", "resnet101", "resnet50"):
        depth = "resnet50" if backbone == "resnet50" else "resnet101"
        def imp(sd, output_stride=16, prefix="", order_sink=None,
                path_prefix=()):
            return import_resnet(sd, depth, prefix, order_sink, path_prefix)
        return imp
    if backbone in ("xception", "drn"):
        fn = import_xception if backbone == "xception" else import_drn
        def imp(sd, output_stride=16, prefix="", order_sink=None,
                path_prefix=()):
            return fn(sd, prefix, order_sink, path_prefix)
        return imp
    raise NotImplementedError(backbone)


def import_reference_checkpoint(path: str, output_stride: int = 16,
                                backbone: str = "mobilenet") -> Dict:
    """Load a reference .pth.tar and return pytrees for whichever schema it
    holds:
      {'G': (params, stats), 'D': (params, stats) or None,
       'epoch': int, 'best_pred': float, 'schema': 'single'|'four',
       'opt': {name: import_optimizer_state result} for optimizer states
              present in the checkpoint (names match our opt_state keys:
              'G' for single schema; 'task'/'d'/'d_inv'/'c' for four)}

    `backbone` keys the backbone sub-importer (the reference's own
    checkpoints are mobilenet-only; the others accept checkpoints written
    by torch_export / cli.export for those factory names).
    """
    import torch
    import_backbone_fn = _backbone_importer(backbone)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {"epoch": int(ckpt.get("epoch", 0)),
           "best_pred": float(ckpt.get("best_pred", 0.0)),
           "opt": {}}
    if "state_dict" in ckpt:
        out["schema"] = "single"
        # torch param-id order for the G optimizer: 1x group (backbone) then
        # 10x group (aspp + decoder) — train_adapt.py:54-58 /
        # deeplab.py:42-72.
        order = []
        sd = ckpt["state_dict"]
        bp, bs = import_backbone_fn(sd, output_stride, prefix="backbone.",
                                    order_sink=order,
                                    path_prefix=("backbone",))
        ap, as_ = import_aspp(sd, prefix="aspp.", order_sink=order,
                              path_prefix=("aspp",))
        dp, ds = import_decoder(sd, prefix="decoder.", order_sink=order,
                                path_prefix=("decoder",))
        params = {"backbone": bp, "aspp": ap, "decoder": dp}
        out["G"] = (params, {"backbone": bs, "aspp": as_, "decoder": ds})
        out["D"] = None
        # train_adapt.py:207 (D's Adam is not saved)
        if isinstance(ckpt.get("optimizer"), dict) and \
                "param_groups" in ckpt["optimizer"]:
            out["opt"]["G"] = import_optimizer_state(ckpt["optimizer"],
                                                     order, params)
    else:
        out["schema"] = "four"
        b_order, a_order, y_order, d_order = [], [], [], []
        bp, bs = import_backbone_fn(ckpt["backbone_model_state_dict"],
                                    output_stride, order_sink=b_order,
                                    path_prefix=("backbone",))
        ap, as_ = import_aspp(ckpt["assp_model_state_dict"],
                              order_sink=a_order, path_prefix=("aspp",))
        dp, ds = import_decoder(ckpt["y_model_state_dict"],
                                order_sink=y_order, path_prefix=("decoder",))
        g_params = {"backbone": bp, "aspp": ap, "decoder": dp}
        out["G"] = (g_params,
                    {"backbone": bs, "aspp": as_, "decoder": ds})
        out["D"] = import_domain(ckpt["d_model_state_dict"],
                                 order_sink=d_order)
        # torch param-id orders (train.py:58-82): f = backbone + assp params,
        # task/c over f+y, d over the domain classifier, d_inv over f.
        f_order = b_order + a_order
        fy_order = f_order + y_order
        f_params = {"backbone": g_params["backbone"],
                    "aspp": g_params["aspp"]}
        for name, key, order, tmpl in (
                ("task", "task_optimizer", fy_order, g_params),
                ("d", "d_optimizer", d_order, out["D"][0]),
                ("d_inv", "d_inv_optimizer", f_order, f_params),
                ("c", "c_optimizer", fy_order, g_params)):
            if isinstance(ckpt.get(key), dict) and "param_groups" in ckpt[key]:
                out["opt"][name] = import_optimizer_state(ckpt[key], order,
                                                          tmpl)
    return out
