"""Real-data file-layout paths: R2V2 frame-cache globbing/pickling, Kinetics
annotation pickles + contiguous windows, SUN-397 file lists, ImageFolder
layout — exercised against small fake trees on disk."""

import json
import os

import cv2
import numpy as np


class Args:
    input_width = input_height = 32
    num_frames = 2
    batch_size = 8
    multi_frame = True


def _write_jpg(path, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = np.random.RandomState(seed).randint(0, 256, (48, 64, 3), np.uint8)
    cv2.imwrite(path, img)


def _make_r2v2_tree(root, split="train", videos=("AAvidone0000", "ABvidtwo0000", "AAshort000000")):
    for vid in videos:
        n = 1 if "short" in vid else 4
        for f in range(n):
            _write_jpg(os.path.join(root, split, vid[:2], f"{vid}_{f:06d}.jpg"), seed=f)


def test_r2v2_dataset_index_and_sampling(tmp_path):
    from vince_tpu.data.r2v2_dataset import R2V2Dataset

    args = Args()
    args.data_path = str(tmp_path)
    _make_r2v2_tree(str(tmp_path))
    ds = R2V2Dataset(args, "train")
    # min-frames filter drops the 1-frame video (base_multi_frame_dataset.py:20-24)
    assert len(ds) == 2
    # index pickled for reuse
    assert os.path.exists(tmp_path / "train_names.pkl")
    item = ds[0]
    assert item["data"].shape == (2, 36, 36, 3)  # canvas = 32/0.875
    assert item["queue_data"].shape == (2, 36, 36, 3)
    assert item["id"] in ("AAvidone0000", "ABvidtwo0000")

    # repeatable mode: same idx → same frame choice
    ds_r = R2V2Dataset(args, "train", repeatable=True)
    a, b = ds_r[0], ds_r[0]
    np.testing.assert_array_equal(a["data"], b["data"])


def test_kinetics_dataset_annotations_and_windows(tmp_path):
    from vince_tpu.data.kinetics_dataset import Kinetics400Dataset

    args = Args()
    args.data_path = str(tmp_path)
    vids = ["AAclipone000", "ABcliptwo000"]
    for vid in vids:
        for f in range(6):
            _write_jpg(os.path.join(str(tmp_path), "train", vid[:2], f"{vid}_{f:06d}.jpg"), seed=f)
    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()
    with open(ann_dir / "train.json", "w") as f:
        json.dump(
            {
                vids[0]: {"annotations": {"label": "juggling"}},
                vids[1]: {"annotations": {"label": "archery"}},
            },
            f,
        )
    ds = Kinetics400Dataset(args, "train", num_images_to_return=3)
    assert len(ds) == 2
    item = ds[0]
    assert item["data"].shape == (3, 36, 36, 3)
    # labels: sorted class names → archery=0, juggling=1
    labels = {ds.index.path_info[i][0]: int(ds[i]["labels"]) for i in range(2)}
    assert labels[vids[0]] == 1 and labels[vids[1]] == 0
    assert os.path.exists(ann_dir / "train.pkl")


def test_sun_scene_dataset_lists(tmp_path):
    from vince_tpu.data.imagenet_dataset import SunSceneDataset

    args = Args()
    args.data_path = str(tmp_path)
    rels = ["/a/abbey/sun_001.jpg", "/a/abbey/sun_002.jpg", "/b/beach/sun_003.jpg"]
    for r in rels:
        _write_jpg(str(tmp_path) + r)
    with open(tmp_path / "Training_01.txt", "w") as f:
        f.write("\n".join(rels))
    ds = SunSceneDataset(args, "train")
    assert len(ds) == 3
    assert ds.class_to_idx == {"/a/abbey": 0, "/b/beach": 1}
    item = ds[2]
    assert int(item["classifier_labels"]) == 1
    assert item["data"].shape == (1, 36, 36, 3)


def test_imagenet_dataset_folder_layout(tmp_path):
    from vince_tpu.data.imagenet_dataset import ImagenetDataset

    args = Args()
    args.imagenet_data_path = str(tmp_path)
    for wnid, n in (("n01440764", 2), ("n01443537", 3)):
        for i in range(n):
            _write_jpg(os.path.join(str(tmp_path), "train", wnid, f"img_{i}.JPEG"), seed=i)
    ds = ImagenetDataset(args, "train")
    assert len(ds) == 5
    item = ds[0]
    assert item["data"].shape == (2, 36, 36, 3)  # num_frames=2 views
    assert item["imagenet_labels"].shape == (2,)
    ds_sub = ImagenetDataset(args, "train", num_data_points=3)
    assert len(ds_sub) == 3


def test_got10k_sequences_layout(tmp_path):
    from vince_tpu.tracking.sequences import GOT10kSequences

    seq_dir = tmp_path / "train" / "GOT-10k_Train_000001"
    for f in range(3):
        _write_jpg(str(seq_dir / f"{f + 1:08d}.jpg"), seed=f)
    np.savetxt(seq_dir / "groundtruth.txt", np.array([[10, 10, 20, 20]] * 3), delimiter=",")
    with open(tmp_path / "train" / "list.txt", "w") as f:
        f.write("GOT-10k_Train_000001\n")
    seqs = GOT10kSequences(str(tmp_path), "train")
    assert len(seqs) == 1
    img_files, anno = seqs[0]
    assert len(img_files) == 3 and anno.shape == (3, 4)
