"""Annotated-video second pass (the MP4 artifact).

Reproduces the reference visualize_merged contract
(utilities/counting/utils.py:250-331): a second decode pass over the source
video; per frame, the CSV rows of that frame are drawn (track arrow from the
track's first center to its current center, labeled box with id/class), the
zone polygon and direction arrows are overlaid, per-direction/per-class
counts increment on each track's LAST frame (lframe == frame_id,
utils.py:285-287), and the running count text is displayed delayed by one
frame (utils.py:306-328). A frame counter is stamped top-left.
"""

from __future__ import annotations

import ast
from typing import Dict

import cv2
import numpy as np
import pandas as pd


def _parse(v):
    return ast.literal_eval(v) if isinstance(v, str) else v


def draw_anno(img, zone, directions: Dict) -> np.ndarray:
    pts = np.asarray(zone, np.int32).reshape(-1, 1, 2)
    cv2.polylines(img, [pts], True, (0, 255, 255), 2)
    for key, path in directions.items():
        p0 = tuple(int(v) for v in path[0])
        p1 = tuple(int(v) for v in path[1])
        cv2.arrowedLine(img, p0, p1, (255, 0, 255), 2, tipLength=0.05)
        cv2.putText(img, str(key), p1, cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 0, 255), 2)
    return img


def draw_one_box(img, box, key: str, value: str, color) -> np.ndarray:
    x1, y1, x2, y2 = (int(v) for v in box)
    c = tuple(int(v) for v in color)
    cv2.rectangle(img, (x1, y1), (x2, y2), c, 2)
    cv2.putText(img, f"{key} {value}", (x1, max(y1 - 5, 12)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, c, 1, cv2.LINE_AA)
    return img


def visualize_one_frame(img, frame_df: pd.DataFrame) -> np.ndarray:
    for _, row in frame_df.iterrows():
        box = _parse(row.box)
        color = _parse(row.color)
        fpoint = np.asarray(_parse(row.fpoint)).astype(int)
        cpoint = np.asarray(
            [(box[2] + box[0]) / 2, (box[3] + box[1]) / 2]
        ).astype(int)
        c = tuple(int(v) for v in color)
        cv2.arrowedLine(img, tuple(fpoint), tuple(cpoint), c, 2, tipLength=0.03)
        draw_one_box(img, box, key=f"id: {row.track_id}", value=f"cls: {row.label}", color=color)
    return img


def count_frame_directions(frame_df: pd.DataFrame, count_dict: Dict) -> str:
    """Increment counts for tracks ENDING this frame; return display text."""
    for _, row in frame_df.iterrows():
        if row.lframe == row.frame_id:
            key = str(row.direction)
            if key.isdigit():
                key = key.zfill(2)
            if key in count_dict:
                count_dict[key][int(row.label)] += 1
    lines = []
    for d, per_class in count_dict.items():
        parts = " | ".join(f"{c}:{n}" for c, n in per_class.items())
        lines.append(f"direction:{d} || {parts}")
    return "\n".join(lines)


def visualize_merged(reader, csv_path: str, directions: Dict, zone, num_classes: int, writer) -> Dict:
    """Second pass over `reader`, drawing tracks + counts into `writer`.

    Returns the final per-direction count dict.
    """
    df = pd.read_csv(csv_path)
    count_dict = {str(d).zfill(2): {c: 0 for c in range(num_classes)} for d in directions}
    prev_text = None

    for frames, frame_ids, valid in reader.batches():
        for i in range(len(frames)):
            if not valid[i]:
                continue
            fid = int(frame_ids[i])
            img = cv2.cvtColor(frames[i], cv2.COLOR_RGB2BGR)
            frame_df = df[df.frame_id.astype(int) == fid]
            text = count_frame_directions(frame_df, count_dict)
            img = draw_anno(img, zone, directions)
            if len(frame_df) > 0:
                img = visualize_one_frame(img, frame_df)
            if prev_text:  # reference displays counts delayed one frame
                y = 55
                for line in prev_text.split("\n"):
                    cv2.putText(img, line, (10, y), cv2.FONT_HERSHEY_PLAIN, 1.5, (0, 0, 255), 2)
                    y += 25
            prev_text = text
            cv2.putText(img, f"Frame:{fid}", (10, 25), cv2.FONT_HERSHEY_PLAIN, 1.5, (0, 255, 0), 2)
            writer.write_bgr(img)
    return count_dict
