"""PyTorch .pth checkpoint <-> flax variables conversion.

The reference ships / produces torch state dicts (encoder.pth + depth.pth,
see depth_model.py:121-153 and my_utils.py:107-125). These converters map
them mechanically onto our flax module trees (whose submodule names mirror
the torch paths) so pretrained Niantic weights — and checkpoints produced
by the reference pipeline — load into the TPU framework and vice versa.

Conventions:
  * conv weight OIHW -> HWIO kernel; linear weight (out,in) -> (in,out).
  * BN weight/bias -> scale/bias (params); running_mean/var ->
    batch_stats mean/var; num_batches_tracked dropped.
  * Non-tensor metadata keys (height/width/use_stereo/min|max_depth_bin)
    are returned separately.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from .depth_decoder import torch_decoder_index_name

_METADATA_KEYS = {"height", "width", "use_stereo", "min_depth_bin",
                  "max_depth_bin"}


def _to_np(v):
    if hasattr(v, "detach"):  # torch tensor
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_kernel(w):
    return np.transpose(_to_np(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _linear_kernel(w):
    return np.transpose(_to_np(w), (1, 0))


def _place_bn(params, stats, scope, leaf, value):
    if leaf == "weight":
        _set(params, scope + ["scale"], _to_np(value))
    elif leaf == "bias":
        _set(params, scope + ["bias"], _to_np(value))
    elif leaf == "running_mean":
        _set(stats, scope + ["mean"], _to_np(value))
    elif leaf == "running_var":
        _set(stats, scope + ["var"], _to_np(value))
    # num_batches_tracked: dropped


_BN_LEAVES = {"weight", "bias", "running_mean", "running_var",
              "num_batches_tracked"}


def convert_resnet_encoder(state_dict) -> Tuple[Dict, Dict[str, Any]]:
    """torch ResnetEncoder state dict -> {'params':…, 'batch_stats':…}.

    Accepts both bare torchvision-resnet keys and the reference's
    "encoder."-prefixed keys (resnet_encoder.py:82 wraps the trunk in an
    `encoder` attribute). Returns (variables, metadata).
    """
    params: Dict = {}
    stats: Dict = {}
    meta: Dict[str, Any] = {}
    for key, value in state_dict.items():
        if key in _METADATA_KEYS:
            meta[key] = value
            continue
        name = key[len("encoder."):] if key.startswith("encoder.") else key
        if name.startswith("fc."):
            continue  # classifier head unused (resnet_encoder.py:87-98)
        parts = name.split(".")
        # layerL.B.xxx -> layerL_B / xxx ; downsample.0 -> downsample_0
        m = re.match(r"layer(\d+)", parts[0])
        if m:
            scope = [f"{parts[0]}_{parts[1]}"]
            rest = parts[2:]
            if rest[0] == "downsample":
                scope.append(f"downsample_{rest[1]}")
                rest = rest[2:]
            else:
                scope.append(rest[0])
                rest = rest[1:]
        else:
            scope = [parts[0]]
            rest = parts[1:]
        leaf = rest[-1]
        is_bn = leaf in _BN_LEAVES and not (
            leaf == "weight" and _to_np(value).ndim == 4)
        if is_bn:
            _place_bn(params, stats, scope, leaf, value)
        elif leaf == "weight":
            _set(params, scope + ["kernel"], _conv_kernel(value))
        elif leaf == "bias":
            _set(params, scope + ["bias"], _to_np(value))
    return {"params": params, "batch_stats": stats}, meta


def convert_depth_decoder(state_dict, scales=(0, 1, 2, 3)) -> Dict:
    """torch DepthDecoder state dict ("decoder.<idx>...") -> variables."""
    params: Dict = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        assert parts[0] == "decoder", key
        name = torch_decoder_index_name(int(parts[1]), scales)
        if name.startswith("upconv"):
            # decoder.N.conv.conv.{weight,bias} (ConvBlock -> Conv3x3 -> Conv2d)
            scope = [name, "conv", "conv"]
        else:
            # decoder.N.conv.{weight,bias} (Conv3x3)
            scope = [name, "conv"]
        leaf = parts[-1]
        if leaf == "weight":
            _set(params, scope + ["kernel"], _conv_kernel(value))
        else:
            _set(params, scope + ["bias"], _to_np(value))
    return {"params": params}


def convert_pose_decoder(state_dict) -> Dict:
    """torch PoseDecoder ("net.<i>...") -> variables; order
    [squeeze, pose_0, pose_1, pose_2] (pose_decoder.py:25-33)."""
    order = ["squeeze", "pose_0", "pose_1", "pose_2"]
    params: Dict = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        name = order[int(parts[1])]
        leaf = parts[-1]
        if leaf == "weight":
            _set(params, [name, "kernel"], _conv_kernel(value))
        else:
            _set(params, [name, "bias"], _to_np(value))
    return {"params": params}


def convert_pose_cnn(state_dict) -> Dict:
    params: Dict = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[0] == "net":
            name = f"convs_{parts[1]}"
        else:
            name = "pose_conv"
        leaf = parts[-1]
        if leaf == "weight":
            _set(params, [name, "kernel"], _conv_kernel(value))
        else:
            _set(params, [name, "bias"], _to_np(value))
    return {"params": params}


def convert_simsiam(state_dict) -> Dict:
    """torch SimSiam (projector.*/predictor.* Sequentials) -> variables."""
    params: Dict = {}
    stats: Dict = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        name = f"{parts[0]}_{parts[1]}"
        leaf = parts[-1]
        v = _to_np(value)
        if leaf in ("running_mean", "running_var") or (
                leaf in ("weight", "bias") and v.ndim == 1 and
                _is_bn_index(parts[0], int(parts[1]))):
            _place_bn(params, stats, [name], leaf, value)
        elif leaf == "weight":
            _set(params, [name, "kernel"], _linear_kernel(value))
        elif leaf == "bias":
            _set(params, [name, "bias"], v)
    return {"params": params, "batch_stats": stats}


def _is_bn_index(seq: str, idx: int) -> bool:
    # projector: BN at 1, 4, 7; predictor: BN at 1 (contrastive.py:46-60)
    return idx in ((1, 4, 7) if seq == "projector" else (1,))


# ---------------------------------------------------------------------------
# Export (flax -> torch state dict), the save_depth_model counterpart.
# ---------------------------------------------------------------------------


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def export_resnet_encoder(variables, height=320, width=1024,
                          use_stereo=True, prefix="encoder.") -> Dict:
    """flax encoder variables -> torch-style flat state dict (numpy values)
    with the height/width/use_stereo metadata keys my_utils.py:107-125
    appends."""
    out: Dict[str, Any] = {}
    merged = [("params", variables["params"]),
              ("batch_stats", variables.get("batch_stats", {}))]
    for col, tree in merged:
        for path, v in _flatten(tree).items():
            scope = list(path)
            m = re.match(r"layer(\d+)_(\d+)", scope[0])
            torch_parts = []
            if m:
                torch_parts.append(f"layer{m.group(1)}.{m.group(2)}")
                rest = scope[1:]
                dm = re.match(r"downsample_(\d+)", rest[0])
                if dm:
                    torch_parts.append(f"downsample.{dm.group(1)}")
                    rest = rest[1:]
                else:
                    torch_parts.append(rest[0])
                    rest = rest[1:]
            else:
                torch_parts.append(scope[0])
                rest = scope[1:]
            leaf = rest[-1]
            if leaf == "kernel":
                torch_parts.append("weight")
                v = np.transpose(v, (3, 2, 0, 1))
            elif leaf == "scale":
                torch_parts.append("weight")
            elif leaf == "mean":
                torch_parts.append("running_mean")
            elif leaf == "var":
                torch_parts.append("running_var")
            else:
                torch_parts.append(leaf)
            out[prefix + ".".join(torch_parts)] = v
    out["height"] = height
    out["width"] = width
    out["use_stereo"] = use_stereo
    return out


def export_depth_decoder(variables, scales=(0, 1, 2, 3)) -> Dict:
    name_to_idx = {}
    idx = 0
    for i in range(4, -1, -1):
        name_to_idx[f"upconv_{i}_0"] = idx; idx += 1
        name_to_idx[f"upconv_{i}_1"] = idx; idx += 1
    for s in scales:
        name_to_idx[f"dispconv_{s}"] = idx; idx += 1

    out: Dict[str, Any] = {}
    for path, v in _flatten(variables["params"]).items():
        name = path[0]
        n = name_to_idx[name]
        inner = ".".join(["conv"] * (len(path) - 2))
        leaf = "weight" if path[-1] == "kernel" else "bias"
        if leaf == "weight":
            v = np.transpose(v, (3, 2, 0, 1))
        out[f"decoder.{n}.{inner}.{leaf}"] = v
    return out


def load_pth(path: str) -> Dict:
    """Load a torch .pth state dict on CPU (requires torch)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


_MATCHING_META_KEYS = ("height", "width", "min_depth_bin",
                       "max_depth_bin", "use_stereo", "depth_binning")


def convert_matching_encoder(state_dict) -> Tuple[Dict, Dict[str, Any]]:
    """torch ResnetEncoderMatching state dict -> variables for our
    ResnetEncoderMatching (models/matching_encoder.py).

    The reference regroups the trunk into Sequentials
    (manydepth2/networks/resnet_encoder.py:104-108):
      layer0.0 = conv1, layer0.1 = bn1 (layer0.2 relu has no params),
      layer1.0 = maxpool, layer1.1 = resnet layer1,
      layer{2,3,4} = resnet layers directly,
    plus prematching_conv.0 and reduce_conv.0 (Sequential(conv, relu)).
    Checkpoints additionally carry min/max_depth_bin etc.
    (manydepth2/trainer.py:811-813).
    """
    params: Dict = {}
    stats: Dict = {}
    meta: Dict[str, Any] = {}
    for key, value in state_dict.items():
        if key in _MATCHING_META_KEYS:
            meta[key] = value
            continue
        name = key[len("encoder."):] if key.startswith("encoder.") else key
        parts = name.split(".")
        head = parts[0]
        if head == "layer0":
            scope = ["conv1"] if parts[1] == "0" else ["bn1"]
            rest = parts[2:]
        elif head == "layer1":
            # layer1.1.<b>.<...>
            scope = [f"layer1_{parts[2]}"]
            rest = parts[3:]
        elif re.match(r"layer[234]$", head):
            scope = [f"{head}_{parts[1]}"]
            rest = parts[2:]
        elif head in ("prematching_conv", "reduce_conv"):
            scope = [head]
            rest = parts[2:]  # drop the Sequential index
        else:
            continue
        if rest and rest[0] == "downsample":
            scope.append(f"downsample_{rest[1]}")
            rest = rest[2:]
        elif len(rest) > 1:
            scope.append(rest[0])
            rest = rest[1:]
        leaf = rest[-1]
        is_bn = leaf in _BN_LEAVES and not (
            leaf == "weight" and _to_np(value).ndim == 4)
        if is_bn:
            _place_bn(params, stats, scope, leaf, value)
        elif leaf == "weight":
            _set(params, scope + ["kernel"], _conv_kernel(value))
        elif leaf == "bias":
            _set(params, scope + ["bias"], _to_np(value))
    return {"params": params, "batch_stats": stats}, meta
