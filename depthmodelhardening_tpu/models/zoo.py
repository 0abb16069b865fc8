"""Pretrained model zoo: download + convert the Niantic checkpoints.

Re-design of download_model_if_doesnt_exist (monodepth2/utils.py:51-114):
the 9 Monodepth2 release checkpoints (URL + md5), fetched with urllib,
md5-verified, unzipped, and convertible straight into flax variables via
training.checkpoints.load_reference_pth.
"""

from __future__ import annotations

import hashlib
import os
import zipfile
from typing import Optional

# (google cloud URL, md5) — monodepth2/utils.py:55-87
DOWNLOAD_PATHS = {
    "mono_640x192": (
        "https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono_640x192.zip",
        "a964b8356e08a02d009609d9e3928f7c"),
    "stereo_640x192": (
        "https://storage.googleapis.com/niantic-lon-static/research/monodepth2/stereo_640x192.zip",
        "3dfb76bcff0786e4ec07ac00f658dd07"),
    "mono+stereo_640x192": (
        "https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono%2Bstereo_640x192.zip",
        "c024d69012485ed05d7eaa9617a96b81"),
    "mono_no_pt_640x192": (
        "https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono_no_pt_640x192.zip",
        "9c2f071e35027c895a4728358ffc913a"),
    "stereo_no_pt_640x192": (
        "https://storage.googleapis.com/niantic-lon-static/research/monodepth2/stereo_no_pt_640x192.zip",
        "41ec2de112905f85541ac33a854742d1"),
    "mono+stereo_no_pt_640x192": (
        "https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono%2Bstereo_no_pt_640x192.zip",
        "46c3b824f541d143a45c37df65fbab0a"),
    "mono_1024x320": (
        "https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono_1024x320.zip",
        "0ab0766efdfeea89a0d9ea8ba90e1e63"),
    "stereo_1024x320": (
        "https://storage.googleapis.com/niantic-lon-static/research/monodepth2/stereo_1024x320.zip",
        "afc2f2126d70cf3fdf26b550898b501a"),
    "mono+stereo_1024x320": (
        "https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono%2Bstereo_1024x320.zip",
        "cdc5fc9b23513c07d5b19235d9ef08f7"),
}


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_model_if_doesnt_exist(model_name: str,
                                   models_dir: str = "models") -> str:
    """Fetch + verify + unzip a pretrained checkpoint; returns the
    folder holding encoder.pth/depth.pth."""
    if model_name not in DOWNLOAD_PATHS:
        raise KeyError(f"unknown model {model_name}; options: "
                       f"{sorted(DOWNLOAD_PATHS)}")
    url, md5 = DOWNLOAD_PATHS[model_name]
    model_path = os.path.join(models_dir, model_name)
    if os.path.exists(os.path.join(model_path, "encoder.pth")):
        return model_path

    os.makedirs(models_dir, exist_ok=True)
    zip_path = model_path + ".zip"
    if not os.path.isfile(zip_path) or _md5(zip_path) != md5:
        import urllib.request

        print(f"-> Downloading {model_name} ...")
        urllib.request.urlretrieve(url, zip_path)
    if _md5(zip_path) != md5:
        raise RuntimeError(
            f"md5 mismatch for {zip_path}; delete and retry")
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(model_path)
    return model_path


def load_pretrained(model_name: str, models_dir: str = "models",
                    height: Optional[int] = None,
                    width: Optional[int] = None):
    """Download (if needed) + convert to flax variables.
    Returns (model, variables, meta)."""
    from ..models.wrappers import make_monodepth2
    from ..training.checkpoints import load_reference_pth

    folder = download_model_if_doesnt_exist(model_name, models_dir)
    model = make_monodepth2()
    variables, meta = load_reference_pth(folder, model,
                                         height=height or 320,
                                         width=width or 1024)
    return model, variables, meta
