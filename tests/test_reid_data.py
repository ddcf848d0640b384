import os

import cv2
import numpy as np
import pytest

from vehicle_counting_tpu.train.data import ImageFolderDataset


@pytest.fixture
def folder(tmp_path, rng):
    for cls in ["0001", "0002"]:
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(5):
            img = rng.integers(0, 255, size=(64, 32, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"{i}.jpg"), img)
    return str(tmp_path / "train")


def test_image_folder_dataset(folder):
    ds = ImageFolderDataset(folder)
    assert len(ds) == 10
    assert ds.num_classes == 2
    assert ds.classes == ["0001", "0002"]
    images, labels = ds.all()
    assert images.shape == (10, 50, 50, 3)
    assert set(labels.tolist()) == {0, 1}
    # ImageNet-normalized range
    assert -3.0 < images.min() and images.max() < 3.0

    batches = list(ds.batches(4, seed=0))
    assert len(batches) == 2  # 10 // 4
    assert batches[0][0].shape == (4, 50, 50, 3)


def test_image_folder_deterministic_shuffle(folder):
    ds = ImageFolderDataset(folder)
    a = [l.tolist() for _, l in ds.batches(4, seed=7)]
    b = [l.tolist() for _, l in ds.batches(4, seed=7)]
    assert a == b


def test_empty_folder_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError):
        ImageFolderDataset(str(tmp_path / "empty"))
