"""Reference (PyTorch) checkpoint importer.

The reference's artifact of record is a torch ``.ckpt`` dict
``{'epoch', 'model', 'optimizer'}`` (train_whu.py:169-173) whose ``model``
state_dict follows the ``AdaMVSNet`` module tree (models/adamvs.py:316-341:
``feature`` = FeatureNet0, ``DepthNet.{0,1,2}`` = DepthNet0 with ``reg`` =
CostRegNet2D and ``reg_fuse`` = CostRegNetRED). This module maps that naming
onto this framework's flax tree so published reference weights run here with
NUMERICALLY IDENTICAL forwards (the conv blocks are torch-grid-aligned — see
nn/fastconv.py).

Value transforms:
- conv weight   torch [O,I,kh,kw]  -> flax kernel [kh,kw,I,O]
- convT weight  torch [I,O,kh,kw]  -> spatial FLIP, then [kh,kw,I,O]
  (torch's transposed conv convolves; this runtime correlates)
- BatchNorm     weight/bias -> scale/bias; running_mean/var -> batch_stats

Quirks handled:
- the reference instantiates a CostRegNet2D inside EVERY DepthNet0 but only
  stage 1's is ever run (adamvs.py:268-288 vs 292-302); ``DepthNet.1.reg`` /
  ``DepthNet.2.reg`` weights are dead and are skipped with a note.
- ``module.`` prefixes from nn.DataParallel are stripped.

Use ``import_adamvs_checkpoint(path_or_state_dict, variables)`` with the
variables of a freshly-initialized ``AdaMVS`` (base=8, cr_base=(8,8,8), the
reference's fixed sizes) — the import validates every shape against the init
tree and reports unconsumed reference weights.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _conv_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _convt_kernel(w) -> np.ndarray:
    w = _np(w)[:, :, ::-1, ::-1]  # spatial flip (convolution -> correlation)
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))  # IOHW -> HWIO


def _feature_plan() -> list[tuple[str, str, str]]:
    """(torch prefix, flax path under 'feature', kind) — kind in
    {conv, convt, bn} with conv/convt meaning the weight (+bias if present)."""
    plan = []
    trunk = [
        ("conv0.0", "ConvBlock_0"), ("conv0.1", "ConvBlock_1"),
        ("conv1.0", "ConvBlock_2"), ("conv1.1", "ConvBlock_3"), ("conv1.2", "ConvBlock_4"),
        ("conv2.0", "ConvBlock_5"), ("conv2.1", "ConvBlock_6"), ("conv2.2", "ConvBlock_7"),
    ]
    for t, f in trunk:
        plan.append((f"{t}.conv", f"{f}/FastConv_0", "conv"))
        plan.append((f"{t}.bn", f"{f}/BatchNorm_0", "bn"))
    spp = [
        ("branch1_1", "_SPPBranch_0"), ("branch1_2", "_SPPBranch_1"),
        ("branch2_1", "_SPPBranch_2"), ("branch2_2", "_SPPBranch_3"),
        ("branch3_1", "_SPPBranch_4"), ("branch3_2", "_SPPBranch_5"),
    ]
    for t, f in spp:  # index 1: element 0 is the AvgPool
        plan.append((f"{t}.1.conv", f"{f}/ConvBlock_0/FastConv_0", "conv"))
        plan.append((f"{t}.1.bn", f"{f}/ConvBlock_0/BatchNorm_0", "bn"))
    for i, (t, f) in enumerate([("deconv1", "DeConvFuse_0"), ("deconv2", "DeConvFuse_1")]):
        plan.append((f"{t}.deconv.conv", f"{f}/DeconvBlock_0/FastConvTranspose_0", "convt"))
        plan.append((f"{t}.deconv.bn", f"{f}/DeconvBlock_0/BatchNorm_0", "bn"))
        plan.append((f"{t}.conv.conv", f"{f}/ConvBlock_0/FastConv_0", "conv"))
        plan.append((f"{t}.conv.bn", f"{f}/ConvBlock_0/BatchNorm_0", "bn"))
    for i in range(3):
        plan.append((f"out{i+1}", f"FastConv_{i}", "conv"))
    return plan


def _reg2d_plan() -> list[tuple[str, str, str]]:
    plan = []
    for i in range(7):  # conv0..conv6 are ConvBnReLU
        plan.append((f"conv{i}.conv", f"FastConv_{i}", "conv"))
        plan.append((f"conv{i}.bn", f"BatchNorm_{i}", "bn"))
    for j, t in enumerate(("conv7", "conv9", "conv11")):  # Sequential(convT, BN)
        plan.append((f"{t}.0", f"FastConvTranspose_{j}", "convt"))
        plan.append((f"{t}.1", f"BatchNorm_{7+j}", "bn"))
    plan.append(("prob", "FastConv_7", "conv"))
    return plan


def _reg_fuse_plan(up: bool) -> list[tuple[str, str, str]]:
    plan = [
        ("conv1.conv", "cell/ConvReLU_0/FastConv_0", "conv"),
        ("conv_gru1.conv_gates.0", "cell/ConvGRUCell_0/FastConv_0", "conv"),
        ("conv_gru1.convc.0", "cell/ConvGRUCell_0/FastConv_1", "conv"),
        ("conv2.conv", "cell/ConvReLU_1/FastConv_0", "conv"),
        ("conv_gru2.conv_gates.0", "cell/ConvGRUCell_1/FastConv_0", "conv"),
        ("conv_gru2.convc.0", "cell/ConvGRUCell_1/FastConv_1", "conv"),
        ("upconv1", "cell/FastConvTranspose_0", "convt"),
    ]
    if up:
        plan.append(("upconv2d", "cell/FastConvTranspose_1", "convt"))
    else:
        plan.append(("upconv2d", "cell/FastConv_0", "conv"))
    return plan


def _red_feature_plan() -> list[tuple[str, str, str]]:
    """Reference FeatureNet (msrednet.py:29-130, arch_mode='unet') -> flax
    RedFeatureNet (nn/featurenet.py:96-150)."""
    plan = []
    trunk = [
        ("conv0.0", "ConvBlock_0"), ("conv0.1", "ConvBlock_1"),
        ("conv1.0", "ConvBlock_2"), ("conv1.1", "ConvBlock_3"), ("conv1.2", "ConvBlock_4"),
        ("conv2.0", "ConvBlock_5"), ("conv2.1", "ConvBlock_6"), ("conv2.2", "ConvBlock_7"),
    ]
    for t, f in trunk:
        plan.append((f"{t}.conv", f"{f}/FastConv_0", "conv"))
        plan.append((f"{t}.bn", f"{f}/BatchNorm_0", "bn"))
    for t, f in [("deconv1", "DeConvFuse_0"), ("deconv2", "DeConvFuse_1")]:
        plan.append((f"{t}.deconv.conv", f"{f}/DeconvBlock_0/FastConvTranspose_0", "convt"))
        plan.append((f"{t}.deconv.bn", f"{f}/DeconvBlock_0/BatchNorm_0", "bn"))
        plan.append((f"{t}.conv.conv", f"{f}/ConvBlock_0/FastConv_0", "conv"))
        plan.append((f"{t}.conv.bn", f"{f}/ConvBlock_0/BatchNorm_0", "bn"))
    for i in range(3):
        plan.append((f"out{i+1}", f"FastConv_{i}", "conv"))
    return plan


def _red_reg_plan() -> list[tuple[str, str, str]]:
    """Reference RED_Regularization (msrednet.py:134-148, torch ConvGRUCell2 =
    module.py:54-106) -> flax RedCell (nn/costreg.py:108-143). The flax cell
    instantiates deepest-GRU-first, so conv_gru4 -> GNConvGRUCell_0 ...
    conv_gru1 -> GNConvGRUCell_3. ``upconv2d`` is a stride-1 ConvTranspose2d,
    which equals a correlation with the flipped kernel -> the flax cell's
    plain FastConv_0 head via the 'convt' transform."""
    plan = [
        ("conv1.conv", "cell/ConvReLU_0/FastConv_0", "conv"),
        ("conv2.conv", "cell/ConvReLU_1/FastConv_0", "conv"),
        ("conv3.conv", "cell/ConvReLU_2/FastConv_0", "conv"),
        ("upconv3.conv", "cell/ConvTransReLU_0/FastConvTranspose_0", "convt"),
        ("upconv2.conv", "cell/ConvTransReLU_1/FastConvTranspose_0", "convt"),
        ("upconv1.conv", "cell/ConvTransReLU_2/FastConvTranspose_0", "convt"),
        ("upconv2d", "cell/FastConv_0", "convt"),
    ]
    for gru, cellname in [("conv_gru4", "GNConvGRUCell_0"), ("conv_gru3", "GNConvGRUCell_1"),
                          ("conv_gru2", "GNConvGRUCell_2"), ("conv_gru1", "GNConvGRUCell_3")]:
        plan += [
            (f"{gru}.gate_conv", f"cell/{cellname}/FastConv_0", "conv"),
            (f"{gru}.reset_gate_norm", f"cell/{cellname}/GroupNorm_0", "gn"),
            (f"{gru}.update_gate_norm", f"cell/{cellname}/GroupNorm_1", "gn"),
            (f"{gru}.output_conv", f"cell/{cellname}/FastConv_1", "conv"),
            (f"{gru}.output_norm", f"cell/{cellname}/GroupNorm_2", "gn"),
        ]
    return plan


def _set(tree: dict, path: str, leaf_name: str, value: np.ndarray):
    node = tree
    for part in path.split("/"):
        node = node[part]
    old = node[leaf_name]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {path}/{leaf_name}: ckpt {value.shape} vs model {old.shape}"
        )
    node[leaf_name] = value.astype(np.asarray(old).dtype)


def _apply_plan(sd: Mapping[str, Any], prefix: str, plan, params: dict,
                stats: dict, consumed: set):
    for tname, fpath, kind in plan:
        full = f"{prefix}{tname}"
        if kind == "gn":
            _set(params, fpath, "scale", _np(sd[f"{full}.weight"]))
            _set(params, fpath, "bias", _np(sd[f"{full}.bias"]))
            consumed.update({f"{full}.weight", f"{full}.bias"})
        elif kind == "bn":
            _set(params, fpath, "scale", _np(sd[f"{full}.weight"]))
            _set(params, fpath, "bias", _np(sd[f"{full}.bias"]))
            _set(stats, fpath, "mean", _np(sd[f"{full}.running_mean"]))
            _set(stats, fpath, "var", _np(sd[f"{full}.running_var"]))
            consumed.update({f"{full}.weight", f"{full}.bias",
                             f"{full}.running_mean", f"{full}.running_var"})
            consumed.add(f"{full}.num_batches_tracked")
        else:
            kern = _conv_kernel(sd[f"{full}.weight"]) if kind == "conv" \
                else _convt_kernel(sd[f"{full}.weight"])
            _set(params, fpath, "kernel", kern)
            consumed.add(f"{full}.weight")
            if f"{full}.bias" in sd:
                _set(params, fpath, "bias", _np(sd[f"{full}.bias"]))
                consumed.add(f"{full}.bias")


def import_adamvs_state_dict(sd: Mapping[str, Any], variables: dict) -> tuple[dict, list[str]]:
    """Map a reference AdaMVSNet state_dict into flax ``variables`` (from a
    default-config ``AdaMVS.init``). Returns (new_variables, skipped_keys)."""
    import copy

    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    variables = copy.deepcopy(jax_to_mutable(variables))
    params, stats = variables["params"], variables["batch_stats"]
    consumed: set = set()

    _apply_plan(sd, "feature.",
                [(t, f"feature/{f}", k) for t, f, k in _feature_plan()],
                params, stats, consumed)
    _apply_plan(sd, "DepthNet.0.reg.",
                [(t, f"reg2d/{f}", k) for t, f, k in _reg2d_plan()],
                params, stats, consumed)
    for i in range(3):
        up = i < 2
        _apply_plan(sd, f"DepthNet.{i}.reg_fuse.",
                    [(t, f"reg_fuse{i+1}/{f}", k) for t, f, k in _reg_fuse_plan(up)],
                    params, stats, consumed)

    skipped = sorted(k for k in sd if k not in consumed)
    # the only expected leftovers are the dead stage-2/3 CostRegNet2Ds
    unexpected = [k for k in skipped
                  if not (k.startswith("DepthNet.1.reg.") or k.startswith("DepthNet.2.reg."))]
    if unexpected:
        raise ValueError(f"unmapped reference weights: {unexpected[:10]}")
    return variables, skipped


def import_msrednet_state_dict(sd: Mapping[str, Any], variables: dict) -> tuple[dict, list[str]]:
    """Map a reference CascadeREDNet state_dict (msrednet.py:246-277:
    ``feature`` = FeatureNet-unet, ``cost_regularization.{0,1,2}`` =
    RED_Regularization; ``DepthNet`` is parameter-free) into flax
    ``variables`` from a default-config ``MSREDNet.init``.
    Returns (new_variables, skipped_keys)."""
    import copy

    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    variables = copy.deepcopy(jax_to_mutable(variables))
    params, stats = variables["params"], variables["batch_stats"]
    consumed: set = set()

    _apply_plan(sd, "feature.",
                [(t, f"feature/{f}", k) for t, f, k in _red_feature_plan()],
                params, stats, consumed)
    for i in range(3):
        _apply_plan(sd, f"cost_regularization.{i}.",
                    [(t, f"reg{i+1}/{f}", k) for t, f, k in _red_reg_plan()],
                    params, stats, consumed)

    skipped = sorted(k for k in sd if k not in consumed)
    if skipped:
        raise ValueError(f"unmapped reference weights: {skipped[:10]}")
    return variables, skipped


def import_msrednet_checkpoint(path_or_sd, variables: dict) -> tuple[dict, list[str]]:
    """Accepts a reference .ckpt path, a full ckpt dict, or a bare state_dict."""
    sd = path_or_sd
    if isinstance(sd, str):
        import torch

        sd = torch.load(sd, map_location="cpu", weights_only=False)
    if isinstance(sd, Mapping) and "model" in sd and not any("." in k for k in sd):
        sd = sd["model"]
    return import_msrednet_state_dict(sd, variables)


def jax_to_mutable(tree):
    """Deep-convert FrozenDict/dict-of-arrays to plain nested dicts of numpy."""
    if hasattr(tree, "items"):
        return {k: jax_to_mutable(v) for k, v in tree.items()}
    return np.asarray(tree)


def import_adamvs_checkpoint(path_or_sd, variables: dict) -> tuple[dict, list[str]]:
    """Accepts a reference .ckpt path, a full ckpt dict, or a bare state_dict."""
    sd = path_or_sd
    if isinstance(sd, str):
        import torch

        sd = torch.load(sd, map_location="cpu", weights_only=False)
    if isinstance(sd, Mapping) and "model" in sd and not any("." in k for k in sd):
        sd = sd["model"]
    return import_adamvs_state_dict(sd, variables)
