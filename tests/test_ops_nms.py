"""NMS parity vs sequential-greedy oracles.

The oracles below re-implement the exact sequential semantics the fixpoint
kernel must reproduce: torchvision-style IoU greedy NMS (what AutoShape used)
and the SORT suppression rule (preprocessing.py:6-73 semantics: +1 areas,
intersection-over-other-box, ties to higher index).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_counting_tpu.ops import batched_nms, greedy_suppress, sort_nms_mask
from vehicle_counting_tpu.ops.boxes import iou_matrix


def greedy_iou_nms_oracle(boxes, scores, thr):
    """Sequential greedy IoU NMS; returns kept indices (descending score)."""
    order = np.argsort(-scores, kind="stable")
    kept = []
    for i in order:
        ok = True
        for j in kept:
            if _iou(boxes[i], boxes[j]) > thr:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept


def _iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def sort_nms_oracle(tlwh, scores, max_overlap):
    """Reference-semantics SORT NMS (ascending argsort, take last)."""
    n = len(tlwh)
    if n == 0:
        return []
    x1 = tlwh[:, 0]
    y1 = tlwh[:, 1]
    x2 = tlwh[:, 2] + tlwh[:, 0]
    y2 = tlwh[:, 3] + tlwh[:, 1]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    idxs = list(np.argsort(scores, kind="stable"))
    pick = []
    while idxs:
        i = idxs.pop()
        pick.append(i)
        rest = []
        for j in idxs:
            w = max(0.0, min(x2[i], x2[j]) - max(x1[i], x1[j]) + 1)
            h = max(0.0, min(y2[i], y2[j]) - max(y1[i], y1[j]) + 1)
            if (w * h) / area[j] <= max_overlap:
                rest.append(j)
        idxs = rest
    return sorted(pick)


def random_boxes(rng, n, size=200.0):
    xy = rng.uniform(0, size, size=(n, 2))
    wh = rng.uniform(5, 60, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1)


def test_greedy_suppress_matches_sequential(rng):
    for trial in range(10):
        n = 64
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0.01, 1.0, size=n).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        iou = np.asarray(iou_matrix(jnp.asarray(boxes[order]), jnp.asarray(boxes[order])))
        keep = np.asarray(
            greedy_suppress(jnp.asarray(iou), jnp.ones(n, bool), 0.5)
        )
        got = sorted(order[keep].tolist())
        want = sorted(greedy_iou_nms_oracle(boxes, scores, 0.5))
        assert got == want


def test_batched_nms_shapes_and_content(rng):
    n, b = 128, 3
    boxes = np.stack([random_boxes(rng, n) for _ in range(b)])
    scores = rng.uniform(0, 1, size=(b, n)).astype(np.float32)
    classes = rng.integers(0, 4, size=(b, n))
    out = batched_nms(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.asarray(classes),
        iou_threshold=0.45,
        score_threshold=0.25,
        max_det=32,
        pre_nms_topk=128,
    )
    assert out["boxes"].shape == (b, 32, 4)
    assert out["scores"].shape == (b, 32)
    assert out["valid"].dtype == bool
    sc = np.asarray(out["scores"])
    va = np.asarray(out["valid"])
    # scores sorted descending among valid; invalid rows zeroed
    for i in range(b):
        v = sc[i][va[i]]
        assert np.all(np.diff(v) <= 0)
        assert np.all(v > 0.25)
        assert np.all(sc[i][~va[i]] == 0)
        assert np.all(np.asarray(out["classes"])[i][~va[i]] == -1)


def test_batched_nms_class_aware(rng):
    # identical overlapping boxes, different classes -> both survive
    box = np.array([10.0, 10.0, 50.0, 50.0])
    boxes = jnp.asarray(np.stack([box, box + 1.0])[None])
    scores = jnp.asarray(np.array([[0.9, 0.8]], dtype=np.float32))
    classes = jnp.asarray(np.array([[0, 1]]))
    out = batched_nms(boxes, scores, classes, max_det=8, pre_nms_topk=2)
    assert int(np.sum(np.asarray(out["valid"]))) == 2
    # same class -> one suppressed
    out2 = batched_nms(boxes, scores, jnp.asarray(np.array([[1, 1]])), max_det=8, pre_nms_topk=2)
    assert int(np.sum(np.asarray(out2["valid"]))) == 1


def test_batched_nms_against_oracle_per_class(rng):
    n = 96
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0.3, 1.0, size=n).astype(np.float32)
    classes = rng.integers(0, 3, size=n)
    out = batched_nms(
        jnp.asarray(boxes[None]),
        jnp.asarray(scores[None]),
        jnp.asarray(classes[None]),
        iou_threshold=0.5,
        score_threshold=0.0,
        max_det=96,
        pre_nms_topk=96,
    )
    va = np.asarray(out["valid"])[0]
    got_boxes = np.asarray(out["boxes"])[0][va]
    want_idx = []
    for c in range(3):
        mask = classes == c
        sub = np.where(mask)[0]
        kept = greedy_iou_nms_oracle(boxes[mask], scores[mask], 0.5)
        want_idx += [sub[k] for k in kept]
    want_boxes = boxes[sorted(want_idx, key=lambda i: -scores[i])]
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-5)


def test_sort_nms_matches_reference_oracle(rng):
    for trial in range(10):
        n = 40
        xy = rng.uniform(0, 100, size=(n, 2))
        wh = rng.uniform(5, 40, size=(n, 2))
        tlwh = np.concatenate([xy, wh], axis=1)
        scores = rng.uniform(0, 1, size=n).astype(np.float32)
        keep = np.asarray(
            sort_nms_mask(jnp.asarray(tlwh), jnp.asarray(scores), jnp.ones(n, bool), 0.5)
        )
        got = sorted(np.where(keep)[0].tolist())
        want = sort_nms_oracle(tlwh, scores, 0.5)
        assert got == want


def test_sort_nms_tie_higher_index_first():
    # two identical boxes, identical scores: reference picks the LAST index
    tlwh = jnp.asarray(np.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]]))
    scores = jnp.asarray(np.array([0.5, 0.5], dtype=np.float32))
    keep = np.asarray(sort_nms_mask(tlwh, scores, jnp.ones(2, bool), 0.5))
    assert keep.tolist() == [False, True]


def test_sort_nms_invalid_rows_never_kept():
    tlwh = jnp.asarray(np.array([[0.0, 0.0, 10.0, 10.0], [100.0, 100.0, 10.0, 10.0]]))
    scores = jnp.asarray(np.array([0.9, 0.9], dtype=np.float32))
    valid = jnp.asarray(np.array([True, False]))
    keep = np.asarray(sort_nms_mask(tlwh, scores, valid, 0.5))
    assert keep.tolist() == [True, False]
