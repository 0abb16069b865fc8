"""Checkpoint save/restore: Orbax natively, .pth interop for parity.

Reference checkpointing (trainer.py:765-812, my_utils.py:107-125):
per-epoch `weights_<epoch>/{encoder,depth,pose_encoder,pose}.pth` plus
`adam.pth`, with the encoder dict augmented by height/width/use_stereo;
loading is a name-filtered partial state-dict merge; options snapshot to
`opt.json` (trainer.py:754-763).

Here the native format is an Orbax checkpoint of the whole TrainState
(params/batch_stats/opt_state/step) — restore-resumable including Adam
moments — while models/torch_import.py provides the .pth bridge for the
pretrained Niantic models and for exporting back to reference-compatible
files.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_state(ckpt_dir: str, step: int, state, keep: int = 5) -> str:
    """Save a TrainState under <ckpt_dir>/<step>. Returns the path."""
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), str(step))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    _prune(ckpt_dir, keep)
    return path


def restore_state(ckpt_dir: str, state_like, step: Optional[int] = None):
    """Restore into the structure of `state_like` (an abstract or
    concrete TrainState). step=None -> latest."""
    ocp = _ocp()
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), str(step))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, jax.device_get(state_like))


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def _prune(ckpt_dir: str, keep: int) -> None:
    import shutil

    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    for s in steps[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, str(s)), ignore_errors=True)


def save_options(log_dir: str, cfg) -> None:
    """Options snapshot (trainer.py:754-763 save_opts -> opt.json)."""
    os.makedirs(log_dir, exist_ok=True)

    def enc(o):
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        return str(o)

    with open(os.path.join(log_dir, "opt.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg)
                  else cfg, f, indent=2, default=enc)


def export_reference_pth(save_dir: str, epoch, variables,
                         height: int = 320, width: int = 1024,
                         use_stereo: bool = True) -> str:
    """Write reference-compatible weights_<epoch>/{encoder,depth}.pth
    (my_utils.py:107-125: encoder dict gains height/width/use_stereo)."""
    from ..models.torch_import import (
        export_depth_decoder, export_resnet_encoder,
    )
    import torch

    folder = os.path.join(save_dir, f"weights_{epoch}")
    os.makedirs(folder, exist_ok=True)
    enc = export_resnet_encoder(
        {"params": variables["params"]["encoder"],
         "batch_stats": variables.get("batch_stats", {}).get(
             "encoder", {})},
        height=height, width=width, use_stereo=use_stereo)
    dec = export_depth_decoder(
        {"params": variables["params"]["decoder"]})
    torch.save(enc, os.path.join(folder, "encoder.pth"))
    torch.save(dec, os.path.join(folder, "depth.pth"))
    return folder


def load_manydepth_reference(weights_folder: str,
                             height: int = 192, width: int = 640):
    """Load a ManyDepth weights folder (encoder.pth with the Sequential
    layer0/layer1 regrouping + min/max_depth_bin metadata, depth.pth)
    into a ManyDepthModel variables pytree (depth_model.py:108-134).

    Returns (model, variables, meta)."""
    from ..models.torch_import import (
        convert_depth_decoder, convert_matching_encoder, load_pth,
    )
    from ..models.wrappers import ManyDepthModel

    enc_sd = load_pth(os.path.join(weights_folder, "encoder.pth"))
    dec_sd = load_pth(os.path.join(weights_folder, "depth.pth"))
    enc_vars, meta = convert_matching_encoder(enc_sd)
    dec_vars = convert_depth_decoder(dec_sd)
    height = int(meta.get("height", height))
    width = int(meta.get("width", width))
    model = ManyDepthModel(input_height=height, input_width=width)
    variables = {
        "params": {"encoder": enc_vars["params"],
                   "decoder": dec_vars["params"]},
        "batch_stats": {"encoder": enc_vars["batch_stats"],
                        "decoder": {}},
    }
    return model, variables, meta


def load_reference_pth(weights_folder: str, model, height: int = 320,
                       width: int = 1024):
    """Load reference weights_*/encoder.pth + depth.pth into a
    MonodepthModel variables pytree (depth_model.py:89-161 semantics:
    name-filtered merge of encoder/decoder state dicts)."""
    from ..models.torch_import import (
        convert_depth_decoder, convert_resnet_encoder, load_pth,
    )
    import flax

    enc_sd = load_pth(os.path.join(weights_folder, "encoder.pth"))
    dec_sd = load_pth(os.path.join(weights_folder, "depth.pth"))
    enc_params, enc_meta = convert_resnet_encoder(enc_sd)
    dec_params = convert_depth_decoder(dec_sd)
    variables = {
        "params": {"encoder": enc_params["params"],
                   "decoder": dec_params["params"]},
        "batch_stats": {"encoder": enc_params["batch_stats"],
                        "decoder": {}},
    }
    return flax.core.freeze(variables).unfreeze(), enc_meta
