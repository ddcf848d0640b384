"""Offline data tools: yolo2coco, cocosplit, split_csv, split_images, convert_weights."""

import json
import os

import cv2
import numpy as np
import pandas as pd
import pytest

from vehicle_counting_tpu.tools.cocosplit import split_coco
from vehicle_counting_tpu.tools.split_csv import split_csv
from vehicle_counting_tpu.tools.split_images import split_images
from vehicle_counting_tpu.tools.yolo2coco import yolo_to_coco


@pytest.fixture
def yolo_dataset(tmp_path, rng):
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    for i in range(6):
        img = rng.integers(0, 255, size=(60, 80, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        lines = []
        for _ in range(int(rng.integers(1, 4))):
            cls = int(rng.integers(0, 3))
            cx, cy = rng.uniform(0.3, 0.7, 2)
            w, h = rng.uniform(0.1, 0.25, 2)
            lines.append(f"{cls} {cx:.4f} {cy:.4f} {w:.4f} {h:.4f}")
        (lbl_dir / f"im{i}.txt").write_text("\n".join(lines))
    return str(img_dir), str(lbl_dir)


def test_yolo2coco_and_split(yolo_dataset, tmp_path):
    img_dir, lbl_dir = yolo_dataset
    coco = yolo_to_coco(img_dir, lbl_dir, ["a", "b", "c"], str(tmp_path / "coco.json"))
    assert len(coco["images"]) == 6
    assert len(coco["categories"]) == 3
    assert all(a["bbox"][2] > 0 and a["bbox"][3] > 0 for a in coco["annotations"])
    # boxes are absolute pixels within image bounds
    for a in coco["annotations"]:
        img = next(im for im in coco["images"] if im["id"] == a["image_id"])
        assert 0 <= a["bbox"][0] <= img["width"]
        assert a["bbox"][0] + a["bbox"][2] <= img["width"] + 1e-6

    train, val = split_coco(coco, ratio=0.67)
    assert len(train["images"]) == 4 and len(val["images"]) == 2
    train_ids = {im["id"] for im in train["images"]}
    assert all(a["image_id"] in train_ids for a in train["annotations"])
    # disjoint split
    assert train_ids.isdisjoint({im["id"] for im in val["images"]})


def test_split_csv_stratified(rng):
    rows = []
    for img in range(20):
        cls = img % 4
        rows.append({"image_id": f"im{img}", "class_id": cls})
    df = pd.DataFrame(rows)
    out = split_csv(df, ratio=0.75)
    assert set(out.fold.unique()) <= {0, 1}
    # every class appears in train
    assert set(out[out.fold == 0].class_id.unique()) == {0, 1, 2, 3}
    # val non-empty
    assert (out.fold == 1).sum() > 0


def test_split_images(yolo_dataset, tmp_path):
    img_dir, lbl_dir = yolo_dataset
    counts = split_images(img_dir, str(tmp_path / "out"), ratio=0.5, label_dir=lbl_dir)
    assert counts == {"train": 3, "val": 3}
    assert len(os.listdir(tmp_path / "out" / "train" / "images")) == 3
    assert len(os.listdir(tmp_path / "out" / "train" / "labels")) == 3


def test_convert_weights_npz_roundtrip(tmp_path):
    import jax

    from vehicle_counting_tpu.models.reid import init_reid
    from vehicle_counting_tpu.tools.convert_weights import _flatten_to_npz, load_npz_pytree

    params, stats = init_reid(jax.random.PRNGKey(0), num_classes=8)
    path = str(tmp_path / "reid.npz")
    n = _flatten_to_npz((params, stats), path)
    assert n > 50
    like = init_reid(jax.random.PRNGKey(1), num_classes=8)
    restored = load_npz_pytree(path, like)
    a = jax.tree.leaves((params, stats))
    b = jax.tree.leaves(restored)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
