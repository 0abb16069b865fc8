"""Checkpoint-conversion parity against committed torch-oracle outputs.

No torch, no network, no skip (the VERDICT r3 hedge for the offline
environment where test_zoo_golden can never run): rebuild the
reference-layout state dicts deterministically (tests/golden_common.py),
convert them with models/torch_import.py exactly as load_reference_pth
does for real Niantic .pth files, and pin the flax encoder features +
all four disparity scales against tests/golden/monodepth2_rand.npz —
outputs frozen from the torch oracles by scripts/gen_golden_fixtures.py.
Reference layout: monodepth2/trainer.py:765-785 (save) +
depth_model.py:121-153 (load); oracle modules mirror torchvision /
monodepth2 module naming (tests/torch_oracles.py).
"""

import os

import numpy as np

import jax.numpy as jnp

from depthmodelhardening_tpu.models import DepthDecoder, ResnetEncoder
from depthmodelhardening_tpu.models.torch_import import (
    convert_depth_decoder, convert_resnet_encoder,
)

from golden_common import (
    FEAT_CROP, depth_decoder_state_dict, golden_input,
    resnet18_encoder_state_dict,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "monodepth2_rand.npz")


def test_conversion_parity_against_committed_oracle_outputs():
    data = np.load(GOLDEN)
    enc_sd = resnet18_encoder_state_dict(seed=0)
    # metadata keys ride along in real encoder.pth files
    enc_sd["height"] = 96
    enc_sd["width"] = 320
    enc_sd["use_stereo"] = True
    dec_sd = depth_decoder_state_dict(seed=0)

    enc_vars, meta = convert_resnet_encoder(enc_sd)
    assert meta == {"height": 96, "width": 320, "use_stereo": True}
    dec_vars = convert_depth_decoder(dec_sd)

    img = golden_input(seed=int(data["input_seed"]))
    enc = ResnetEncoder(num_layers=18)
    feats = enc.apply({"params": enc_vars["params"],
                       "batch_stats": enc_vars["batch_stats"]},
                      jnp.asarray(img), train=False)
    for i, f in enumerate(feats):
        # deep features reach O(100) under the random init — compare
        # with a relative tolerance (conversion bugs are O(1) relative)
        np.testing.assert_allclose(
            np.asarray(f)[FEAT_CROP], data[f"feat{i}_crop"],
            rtol=5e-4, atol=2e-4, err_msg=f"feat{i}")

    dec = DepthDecoder()
    outs = dec.apply(dec_vars, [jnp.asarray(f) for f in feats])
    for s in range(4):
        np.testing.assert_allclose(
            np.asarray(outs[("disp", s)]), data[f"disp{s}"],
            atol=2e-4, err_msg=f"disp{s}")
