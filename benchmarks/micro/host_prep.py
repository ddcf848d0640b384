"""Host-side budget: decode + letterbox + I420 pack vs the device rate.

The device-resident pipeline runs ~0.76 ms/frame (1313 fps/chip, B=128
yolov5s @ 384x640, ROADMAP r4). On a real PCIe host the producer thread
must keep up: this measures each host stage standalone at the flagship
geometry so the budget accounting in ROADMAP is numbers, not vibes.

    python benchmarks/micro/host_prep.py [--frames 256] [--height 720]

Stages measured (ms/frame, serial AND through the shared _cv_pool):
  decode     cv2.VideoCapture read of an H.264-ish mp4 (synthetic traffic)
  letterbox  cv2 resize to the AutoShape minimal pad + gray strip fill
  i420       RGB -> planar YUV420 content-row pack (the upload encoding)
  prep       host_letterbox_yuv420(content_only=True)  (letterbox+i420 fused)

No TPU involved; run anywhere.
"""

import argparse
import os
import sys
import tempfile
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from vehicle_counting_tpu.ops.letterbox import (  # noqa: E402
    autoshape_hw,
    host_letterbox_yuv420,
)


def make_video(path, n, h, w, fps=30):
    """Synthetic traffic-ish content: moving rectangles over a textured road
    (compresses like real footage, unlike noise)."""
    rng = np.random.default_rng(0)
    base = rng.integers(60, 90, (h, w, 3), np.uint8)  # static texture
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    cars = rng.integers(0, 255, (12, 3)).tolist()
    for t in range(n):
        img = base.copy()
        for i, c in enumerate(cars):
            x = int((t * (9 + i) + i * 157) % (w + 160)) - 80
            y = int(h * (0.3 + 0.05 * i))
            cv2.rectangle(img, (x, y), (x + 90, y + 50), tuple(int(v) for v in c), -1)
        writer.write(img)
    writer.release()


def bench(fn, n, warm=8):
    for _ in range(warm):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    sh = args.height
    sw = sh * 16 // 9
    net = autoshape_hw((sh, sw), 640)
    print(f"source {sh}x{sw} -> net {net[0]}x{net[1]}, "
          f"batch {args.batch}, {os.cpu_count()} CPUs")

    with tempfile.TemporaryDirectory() as td:
        vp = os.path.join(td, "v.mp4")
        make_video(vp, args.frames, sh, sw)
        sz = os.path.getsize(vp) / args.frames / 1024
        print(f"video: {sz:.0f} KiB/frame encoded")

        # ---- decode ------------------------------------------------------
        cap = cv2.VideoCapture(vp)
        frames = []
        t0 = time.perf_counter()
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(f)
        dt = time.perf_counter() - t0
        cap.release()
        n = len(frames)
        print(f"decode: {dt / n * 1e3:.3f} ms/frame ({n / dt:.0f} fps) [{n} frames]")

        batch = np.stack(frames[: args.batch])[..., ::-1].copy()  # BGR->RGB

        # ---- prep (letterbox + I420 content pack), pooled then serial ----
        ms_pool = bench(lambda: host_letterbox_yuv420(batch, net, content_only=True),
                        max(4, 64 // args.batch)) / args.batch
        import sys as _sys
        lb = _sys.modules["vehicle_counting_tpu.ops.letterbox"]
        pool, lb._CV_POOL = lb._CV_POOL, None
        ncpu = os.cpu_count()
        os_cpu = os.cpu_count
        os.cpu_count = lambda: 1  # force the serial path
        try:
            ms_serial = bench(
                lambda: host_letterbox_yuv420(batch, net, content_only=True),
                max(2, 32 // args.batch)) / args.batch
        finally:
            os.cpu_count = os_cpu
            lb._CV_POOL = pool

        print(f"prep (letterbox+i420 content): serial {ms_serial:.3f} ms/frame, "
              f"pooled {ms_pool:.3f} ms/frame (x{ms_serial / ms_pool:.1f} on {ncpu} CPUs)")

        # ---- stage split (serial, single frame) ---------------------------
        one = batch[0]
        ms_lb = bench(lambda: cv2.resize(one, (net[1], net[0])), 64)
        strip = cv2.resize(one, (net[1], net[0]))
        ms_i420 = bench(lambda: cv2.cvtColor(strip, cv2.COLOR_RGB2YUV_I420), 64)
        print(f"  resize-to-net alone: {ms_lb:.3f} ms/frame; "
              f"RGB->I420 alone: {ms_i420:.3f} ms/frame")

        # ---- budget statement ---------------------------------------------
        device_ms = 0.762  # ROADMAP r4 device-resident e2e at this geometry
        host_ms = dt / n * 1e3 + ms_pool
        print(f"host total (decode + pooled prep): {host_ms:.3f} ms/frame "
              f"vs device {device_ms} ms/frame -> "
              f"{'HOST-BOUND' if host_ms > device_ms else 'device-bound'} "
              f"(host supports {1e3 / host_ms:.0f} fps)")


if __name__ == "__main__":
    main()
