#!/usr/bin/env python
"""Convert torch checkpoints to framework-native .npz pytrees.

    python -m vehicle_counting_tpu.tools.convert_weights \
        --kind yolov5 --input yolov5s.pt --output yolov5s_fused.npz
    python -m vehicle_counting_tpu.tools.convert_weights \
        --kind reid --input ckpt.t7 --output reid.npz

YOLO conversion folds BatchNorm into the convs (models/convert.py); ReID keeps
BN explicit so the trainer can resume. The .npz stores flattened pytree
leaves with path-encoded keys, loadable without torch installed.
"""

from __future__ import annotations

import argparse

import numpy as np

import jax


def _flatten_to_npz(tree, output: str):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        arrays[key] = np.asarray(leaf)
    np.savez(output, **arrays)
    return len(arrays)


def load_npz_pytree(path: str, like):
    """Restore an npz produced by _flatten_to_npz into the structure of `like`."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in flat:
        key = "/".join(str(getattr(q, "key", getattr(q, "idx", q))) for q in p)
        leaves.append(data[key])
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(like), leaves)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", choices=["yolov5", "reid"], required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    if args.kind == "yolov5":
        from vehicle_counting_tpu.models.convert import load_yolov5_weights

        tree = load_yolov5_weights(args.input)
    else:
        from vehicle_counting_tpu.models.reid import load_reid_weights

        tree = load_reid_weights(args.input)  # (params, stats) tuple
    n = _flatten_to_npz(tree, args.output)
    print(f"wrote {n} arrays to {args.output}")


if __name__ == "__main__":
    main()
