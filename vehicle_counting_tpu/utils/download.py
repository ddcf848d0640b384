"""Pretrained-weight download (reference: utilities/utils.py:189-213).

Same model zoo: ultralytics YOLOv5 v6.0 release checkpoints, cached under
./.cache (networks/yolo.py:14-17). Downloads degrade gracefully in
air-gapped environments — the caller falls back to random init or a local
path.
"""

from __future__ import annotations

import os
from typing import Optional

WEIGHT_URLS = {
    "yolov5n": "https://github.com/ultralytics/yolov5/releases/download/v6.0/yolov5n.pt",
    "yolov5s": "https://github.com/ultralytics/yolov5/releases/download/v6.0/yolov5s.pt",
    "yolov5m": "https://github.com/ultralytics/yolov5/releases/download/v6.0/yolov5m.pt",
    "yolov5l": "https://github.com/ultralytics/yolov5/releases/download/v6.0/yolov5l.pt",
    "yolov5x": "https://github.com/ultralytics/yolov5/releases/download/v6.0/yolov5x.pt",
}


def download_pretrained_weights(name: str, cached: Optional[str] = None) -> Optional[str]:
    """Fetch `name` into ./ .cache (or `cached`); returns the local path.

    Returns None (with a warning) when the environment has no egress.
    """
    if name not in WEIGHT_URLS:
        raise ValueError(f"unknown model {name!r}; choose from {sorted(WEIGHT_URLS)}")
    cached = cached or os.path.join(".cache", f"{name}.pt")
    if os.path.exists(cached):
        return cached
    os.makedirs(os.path.dirname(cached) or ".", exist_ok=True)
    url = WEIGHT_URLS[name]
    try:
        import urllib.request

        urllib.request.urlretrieve(url, cached)  # noqa: S310
        return cached
    except Exception as e:
        print(f"[download] could not fetch {url}: {e}")
        return None


def get_model_weights(name: str, weight_path: Optional[str] = None) -> Optional[str]:
    """Reference get_model resolution order (networks/yolo.py:11-34):
    explicit --weight path wins; otherwise download the COCO checkpoint."""
    if weight_path:
        return weight_path
    return download_pretrained_weights(name)
