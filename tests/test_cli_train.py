"""End-to-end CLI training smoke (slow): cmd_train_hardening over
synthetic KITTI raw + object trees exercises the full orchestration
layer — split loading, PrefetchLoader, fine-tune init, periodic
robustness val, checkpointing/resume — none of which the trainer-level
tests touch."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from depthmodelhardening_tpu.cli.main import main

pytestmark = pytest.mark.slow

ORI_H, ORI_W = 96, 320
H, W = 64, 192


def _png(path, h, w, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.random.RandomState(seed).randint(0, 255, (h, w, 3),
                                              np.uint8)
    Image.fromarray(arr).save(path)


def _build_trees(tmp_path):
    # KITTI raw: one drive, stereo, frames 0..3
    raw = tmp_path / "raw"
    date = "2011_09_26"
    drive = f"{date}/{date}_drive_0001_sync"
    for cam in (2, 3):
        for fr in range(4):
            _png(str(raw / drive / f"image_0{cam}" / "data" /
                     f"{fr:010d}.png"), 120, 400, seed=cam * 10 + fr)
    # split
    splits = tmp_path / "splits"
    os.makedirs(splits / "tiny", exist_ok=True)
    with open(splits / "tiny" / "train_files.txt", "w") as f:
        for fr in (1, 2):
            f.write(f"{drive} {fr} l\n{drive} {fr} r\n")
    # KITTI object scenes
    obj_root = tmp_path / "object"
    names = [f"{i:06d}" for i in range(4)]
    for i, n in enumerate(names):
        _png(str(obj_root / "training" / "image_2" / f"{n}.png"),
             125, 414, seed=40 + i)
        os.makedirs(obj_root / "training" / "label_2", exist_ok=True)
        with open(obj_root / "training" / "label_2" / f"{n}.txt",
                  "w") as f:
            f.write("Car 0 0 0 1 2 3 4 1 2 3 4 5 6 7\n")
    with open(obj_root / "trainval.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    with open(obj_root / "test.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    # car object image + mask, low aspect so the 300-wide resize fits
    # the 96x320 native scene (see .claude verify notes)
    car = tmp_path / "BMW.png"
    _png(str(car), 60, 300, seed=7)
    mask = np.zeros((60, 300), np.uint8)
    mask[10:50, 40:260] = 255
    Image.fromarray(mask).save(str(tmp_path / "BMW_CarMask.png"))
    return str(raw), str(splits), str(obj_root), str(car)


def test_cli_train_hardening_smoke(tmp_path):
    raw, splits, obj_root, car = _build_trees(tmp_path)
    log_dir = str(tmp_path / "logs")
    argv = [
        "train-hardening",
        "--data-path", raw, "--split-dir", splits, "--split", "tiny",
        "--object-data-root", obj_root, "--object-image", car,
        "--height", str(H), "--width", str(W),
        "--ori-h", str(ORI_H), "--ori-w", str(ORI_W),
        "--norm-type", "l_inf", "--step", "1",
        "--attack-batch-size", "2", "--batch-size", "2",
        "--epochs", "1", "--log-frequency", "1",
        "--val-frequency", "1", "--val-eval-count", "1",
        "--compute-dtype", "float32",
        "--log-dir", log_dir,
    ]
    main(argv)

    # metrics JSONL includes train scalars AND the periodic val suite
    import glob

    jsonl = glob.glob(os.path.join(log_dir, "*metrics.jsonl"))
    assert jsonl, os.listdir(log_dir)
    with open(jsonl[0]) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    keys = set().union(*(r.keys() for r in rows))
    assert "loss" in keys
    assert any(k.startswith("val/mean_abs_err") for k in keys), keys
    # checkpoints written -> second invocation resumes
    ckpts = os.listdir(os.path.join(log_dir, "ckpts"))
    assert ckpts, "no checkpoint written"
    main(argv)  # resume path (prints "resumed from step ...")


def test_cli_train_distill_smoke(tmp_path):
    _, _, obj_root, car = _build_trees(tmp_path)
    log_dir = str(tmp_path / "dlogs")
    main([
        "train-distill",
        "--object-data-root", obj_root, "--object-image", car,
        "--height", str(H), "--width", str(W),
        "--ori-h", str(ORI_H), "--ori-w", str(ORI_W),
        "--adv-type", "object", "--step", "1",
        "--batch-size", "2", "--epochs", "1",
        "--eval-count", "1", "--compute-dtype", "float32",
        "--log-dir", log_dir,
    ])
    import glob

    jsonl = glob.glob(os.path.join(log_dir, "*metrics.jsonl"))
    assert jsonl, os.listdir(log_dir)
    with open(jsonl[0]) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    keys = set().union(*(r.keys() for r in rows))
    assert "loss" in keys
    assert "eval/atk_perf" in keys, keys  # per-epoch eval_atk_perf
    # reference-format export written
    assert glob.glob(os.path.join(log_dir, "weights_*")), \
        os.listdir(log_dir)
