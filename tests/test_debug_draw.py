"""Matplotlib debug drawers (reference utilities/utils.py:52-137 parity).

The reference functions are dead code on its main path, so the contract is
structural: files written, panels laid out, negative GT labels skipped.
"""

import numpy as np

from vehicle_counting_tpu.utils.debug_draw import draw_detections, draw_pred_gt


def _img(rng):
    return rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)


def test_draw_detections_writes_figure(tmp_path, rng):
    out = str(tmp_path / "dets.jpg")
    boxes = np.array([[10, 10, 40, 30], [60, 50, 50, 40]], np.float32)
    draw_detections(
        out, _img(rng), boxes, [0, 2], [0.91, 0.45], obj_list=["car", "x", "truck"]
    )
    assert (tmp_path / "dets.jpg").stat().st_size > 1000


def test_draw_detections_accepts_chw_and_int_labels(tmp_path, rng):
    out = str(tmp_path / "chw.png")
    img = _img(rng).transpose(2, 0, 1)  # CHW tolerated like the torch path
    draw_detections(out, img, np.array([[5, 5, 20, 20]]), [1], [0.5])
    assert (tmp_path / "chw.png").stat().st_size > 1000


def test_draw_pred_gt_two_panels_and_negative_gt_skipped(tmp_path, rng):
    out = str(tmp_path / "pair.jpg")
    draw_pred_gt(
        out,
        _img(rng),
        np.array([[10, 10, 30, 30]], np.float32), [0], [0.8],
        np.array([[12, 12, 28, 28], [0, 0, 10, 10]], np.float32), [0, -1],
    )
    assert (tmp_path / "pair.jpg").stat().st_size > 1000
