"""Generate tests/golden/monodepth2_rand.npz (torch-side, run once).

Loads the deterministic numpy state dicts from tests/golden_common.py
into the torch oracle modules (STRICT key/shape check — any drift
between the recipe and the real checkpoint layout fails here), runs the
oracle encoder+decoder on the fixed golden input in eval mode, and
freezes the outputs. tests/test_golden_fixtures.py replays the flax
side against this file with no torch/network dependency.

Run: PYTHONPATH=/root/repo:/root/repo/tests python scripts/gen_golden_fixtures.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_common import (  # noqa: E402
    FEAT_CROP, depth_decoder_state_dict, golden_input,
    resnet18_encoder_state_dict,
)
from torch_oracles import (  # noqa: E402
    TorchDepthDecoder, TorchResNet18Features,
)


def main():
    enc_sd = resnet18_encoder_state_dict(seed=0)
    dec_sd = depth_decoder_state_dict(seed=0)

    enc = TorchResNet18Features()
    bare = {k[len("encoder."):]: torch.from_numpy(np.asarray(v))
            for k, v in enc_sd.items()}
    missing, unexpected = enc.load_state_dict(bare, strict=False)
    assert not missing, missing
    assert all(k.startswith("fc.") for k in unexpected), unexpected

    dec = TorchDepthDecoder()
    dec.load_state_dict({k: torch.from_numpy(np.asarray(v))
                         for k, v in dec_sd.items()})
    enc.eval(), dec.eval()

    img = golden_input(seed=0)
    with torch.no_grad():
        feats = enc(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        outs = dec(feats)

    out = {"input_seed": np.asarray(0)}
    for i, f in enumerate(feats):
        out[f"feat{i}_crop"] = f.permute(0, 2, 3, 1).numpy()[FEAT_CROP]
    for s in range(4):
        out[f"disp{s}"] = outs[("disp", s)].permute(0, 2, 3, 1).numpy()
    dest = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "golden", "monodepth2_rand.npz")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} ({os.path.getsize(dest)} bytes)")
    print({k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()
