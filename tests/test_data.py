"""Data-layer tests on synthetic KITTI-layout temp trees."""

import os

import numpy as np
import pytest

from depthmodelhardening_tpu.data.kitti_object import (
    KittiObjectScenes, center_bottom_crop, read_path_files, seperate_sets,
)
from depthmodelhardening_tpu.data.kitti_raw import (
    KittiRawDataset, SplitLine, collate,
)
from depthmodelhardening_tpu.data.loader import PrefetchLoader
from depthmodelhardening_tpu.data.velodyne import (
    depth_to_disparity, generate_depth_map, lin_interp,
    load_velodyne_points,
)

from PIL import Image

ORI_H, ORI_W = 96, 320


def _write_png(path, h, w, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.random.RandomState(seed).randint(0, 255, (h, w, 3), np.uint8)
    Image.fromarray(arr).save(path)
    return arr


@pytest.fixture()
def raw_tree(tmp_path):
    """KITTI raw layout: one drive, frames 0..3, both cameras + calib +
    velodyne."""
    root = tmp_path / "raw"
    date = "2011_09_26"
    drive = f"{date}/{date}_drive_0001_sync"
    for cam in (2, 3):
        for fr in range(4):
            _write_png(str(root / drive / f"image_0{cam}" / "data" /
                           f"{fr:010d}.png"), 120, 400,
                       seed=cam * 10 + fr)
    # calib
    os.makedirs(root / date, exist_ok=True)
    K = "100.0 0.0 200.0 0.0 " \
        "0.0 100.0 60.0 0.0 " \
        "0.0 0.0 1.0 0.0"
    with open(root / date / "calib_cam_to_cam.txt", "w") as f:
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write(f"P_rect_02: {K}\nP_rect_03: {K}\n")
        f.write("S_rect_02: 400 120\n")
    with open(root / date / "calib_velo_to_cam.txt", "w") as f:
        f.write("R: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n")
    # velodyne: points in front of the camera (x forward)
    pts = np.zeros((50, 4), np.float32)
    rs = np.random.RandomState(0)
    pts[:, 0] = rs.uniform(5, 30, 50)  # forward
    pts[:, 1] = rs.uniform(-5, 5, 50)  # left
    pts[:, 2] = rs.uniform(-1.5, 0.5, 50)  # up
    for fr in range(4):
        vdir = root / drive / "velodyne_points" / "data"
        os.makedirs(vdir, exist_ok=True)
        pts.astype(np.float32).tofile(str(vdir / f"{fr:010d}.bin"))
    return str(root), drive


@pytest.fixture()
def object_tree(tmp_path):
    root = tmp_path / "object"
    names = [f"{i:06d}" for i in range(6)]
    for i, n in enumerate(names):
        _write_png(str(root / "training" / "image_2" / f"{n}.png"),
                   375 // 3, 1242 // 3, seed=i)
        os.makedirs(root / "training" / "label_2", exist_ok=True)
        label = "Car 0 0 0 1 2 3 4 1 2 3 4 5 6 7\n" if i % 2 == 0 \
            else "Pedestrian 0 0 0 1 2 3 4 1 2 3 4 5 6 7\n"
        with open(root / "training" / "label_2" / f"{n}.txt", "w") as f:
            f.write(label)
    with open(root / "trainval.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    return str(root), names


def test_split_line_parse():
    ln = SplitLine.parse("2011_09_26/d_0001_sync 42 l")
    assert ln.frame_index == 42 and ln.side == "l"
    ln2 = SplitLine.parse("folder_only")
    assert ln2.frame_index == 0 and ln2.side is None


def test_raw_dataset_item_and_collate(raw_tree):
    root, drive = raw_tree
    lines = [f"{drive} 1 l", f"{drive} 2 r"]
    ds = KittiRawDataset(root, lines, frame_ids=("0", "-1", "1", "s"),
                         ori_h=ORI_H, ori_w=ORI_W)
    items = [ds.get_item(i, np.random.RandomState(0)) for i in range(2)]
    batch = collate(items)
    for fid in ("0", "-1", "1", "s"):
        assert batch["frames"][fid].shape == (2, ORI_H, ORI_W, 3)
    assert batch["side_is_l"].tolist() == [True, False]
    assert batch["frames"]["0"].dtype == np.float32
    assert 0.0 <= batch["frames"]["0"].min() \
        and batch["frames"]["0"].max() <= 1.0


def test_raw_dataset_depth(raw_tree):
    root, drive = raw_tree
    ds = KittiRawDataset(root, [f"{drive} 1 l"], ori_h=ORI_H, ori_w=ORI_W)
    item = ds.get_item(0, np.random.RandomState(0), load_depth=True)
    d = item["depth_gt"]
    assert d.shape == (ORI_H, ORI_W)
    assert (d > 0).sum() > 0
    assert d.max() <= 31.0  # points sampled in [5, 30]


def test_generate_depth_map_min_dupe(raw_tree, tmp_path):
    """Duplicate pixels must take the minimum depth (kitti_utils.py:90-96)."""
    root, drive = raw_tree
    calib_dir = os.path.join(root, "2011_09_26")
    # two points projecting to the same pixel, different depths
    pts = np.array([[10.0, 0.0, 0.0, 1.0],
                    [20.0, 0.0, 0.0, 1.0]], np.float32)
    f = tmp_path / "dupe.bin"
    pts.tofile(str(f))
    depth = generate_depth_map(calib_dir, str(f), cam=2)
    vals = depth[depth > 0]
    assert len(vals) >= 1
    assert np.isclose(vals.min(), 10.0, atol=0.5)


def test_lin_interp_and_disp():
    sparse = np.zeros((20, 30), np.float32)
    sparse[5, 5] = 10.0
    sparse[5, 25] = 10.0
    sparse[15, 5] = 20.0
    sparse[15, 25] = 20.0
    dense = lin_interp(sparse)
    assert 10.0 <= dense[10, 15] <= 20.0
    disp = depth_to_disparity(sparse, focal=721.0)
    assert np.isclose(disp[5, 5], 721.0 * 0.54 / 10.0)


def test_object_scenes_and_split(object_tree):
    root, names = object_tree
    seperate_sets(root, "trainval.txt")
    train = read_path_files(root, "vehicle_detection/training.txt")
    test = read_path_files(root, "vehicle_detection/testing.txt")
    assert len(train) + len(test) == 6  # 3 vehicle + 3 non-vehicle
    labels = {l for _, l in train + test}
    assert labels == {0, 1}

    ds = KittiObjectScenes(root, mode="train", size=(300, 100),
                           train_list="vehicle_detection/training.txt")
    img, label = ds[0]
    assert img.shape == (100, 300, 3)
    assert img.dtype == np.float32
    batches = list(ds.batches(2, seed=0))
    assert all(b[0].shape == (2, 100, 300, 3) for b in batches)


def test_center_bottom_crop():
    img = np.arange(12 * 20 * 3, dtype=np.float32).reshape(12, 20, 3)
    out = center_bottom_crop(img, 6, 10)
    np.testing.assert_array_equal(out, img[6:12, 5:15])


def test_prefetch_loader(raw_tree):
    root, drive = raw_tree
    lines = [f"{drive} 1 l", f"{drive} 2 l", f"{drive} 1 r",
             f"{drive} 2 r"]
    ds = KittiRawDataset(root, lines, frame_ids=("0", "s"),
                         ori_h=ORI_H, ori_w=ORI_W)
    loader = PrefetchLoader(
        ds, batch_size=2, collate=collate, seed=1, num_threads=2,
        item_fn=lambda d, i, rng: d.get_item(i, rng))
    seen = 0
    for batch in loader:
        assert batch["frames"]["0"].shape == (2, ORI_H, ORI_W, 3)
        seen += 1
    assert seen == 2


def test_prefetch_loader_early_break_no_hang(raw_tree):
    """Abandoning iteration must not leave the producer thread blocked
    (it re-checks the stop flag while the queue is full)."""
    import threading
    import time

    root, drive = raw_tree
    lines = [f"{drive} 1 l"] * 12
    ds = KittiRawDataset(root, lines, frame_ids=("0",),
                         ori_h=ORI_H, ori_w=ORI_W)
    loader = PrefetchLoader(ds, batch_size=2, collate=collate,
                            num_threads=2, prefetch=1)
    before = threading.active_count()
    for i, batch in enumerate(loader):
        if i == 0:
            break
    # give the producer a moment to observe stop and exit
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before + 1


def test_splits_import_and_odom_generation(tmp_path):
    from depthmodelhardening_tpu.data import splits as sp

    # fake monodepth2-style checkout
    src = tmp_path / "src" / "eigen"
    src.mkdir(parents=True)
    (src / "test_files.txt").write_text(
        "2011_09_26/2011_09_26_drive_0002_sync 69 l\n"
        "2011_09_26/2011_09_26_drive_0002_sync 54 r\n")
    dest = tmp_path / "dest"
    copied = sp.import_splits(str(tmp_path / "src"), str(dest))
    assert len(copied) == 1
    assert (dest / "eigen" / "test_files.txt").read_text().startswith(
        "2011_09_26")

    # malformed frame index rejected
    (src / "test_files.txt").write_text("folder notanumber l\n")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sp.import_splits(str(tmp_path / "src"), str(dest))

    # odom split generated locally with neighbor-safe frame ranges
    written = sp.make_odom_split(str(dest))
    assert len(written) == 4
    lines09 = (dest / "odom" / "test_files_09.txt").read_text()
    assert lines09.splitlines()[0] == "09 0 l"
    train = (dest / "odom" / "train_files.txt").read_text().splitlines()
    seqs = {ln.split()[0] for ln in train}
    assert seqs <= {f"{i:02d}" for i in range(9)}
    frames0 = [int(ln.split()[1]) for ln in train
               if ln.split()[0] == "00"]
    assert min(frames0) >= 1 and max(frames0) <= 4539


def test_odom_and_depth_dataset_paths(tmp_path):
    import numpy as np
    from PIL import Image
    from depthmodelhardening_tpu.data.kitti_raw import (
        KittiOdomDataset, KittiDepthDataset)

    odom = KittiOdomDataset(str(tmp_path), ["09 7 l"])
    assert odom.image_path("09", 7, "l").endswith(
        "sequences/09/image_2/000007.png")
    assert odom.image_path("9", 7, "r").endswith(
        "sequences/09/image_3/000007.png")
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        odom.get_depth("09", 7, "l")

    ds = KittiDepthDataset(str(tmp_path), ["drive_x 3 l"],
                           ori_h=4, ori_w=6)
    gt_dir = tmp_path / "drive_x" / "proj_depth" / "groundtruth" \
        / "image_02"
    gt_dir.mkdir(parents=True)
    arr = (np.arange(12).reshape(3, 4) * 256).astype(np.uint16)
    Image.fromarray(arr, mode="I;16").save(gt_dir / "0000000003.png")
    depth = ds.get_depth("drive_x", 3, "l")
    assert depth.shape == (4, 6)
    assert float(depth.max()) == 11.0  # /256 scaling applied
