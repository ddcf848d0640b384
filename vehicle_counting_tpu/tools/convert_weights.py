#!/usr/bin/env python
"""Convert torch checkpoints to torch-free .npz weight files.

    python -m vehicle_counting_tpu.tools.convert_weights \
        --kind yolov5 --input yolov5s.pt --output yolov5s.npz
    python -m vehicle_counting_tpu.tools.convert_weights \
        --kind reid --input ckpt.t7 --output reid.npz

The output .npz stores the checkpoint's STATE DICT (torch parameter names,
float32) — exactly what `run.py --weight yolov5s.npz` / the cam-config
`checkpoint:` key accept: models/convert.load_yolov5_weights and
models/reid.load_reid_weights read state-dict .npz directly (BN folding /
name mapping happen at load, same as for a .pt). Converting once means
torch never has to be installed on the serving host.

_flatten_to_npz / load_npz_pytree below are the lower-level pytree dump
utilities (used for already-converted JAX trees, e.g. trainer outputs).
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

    from vehicle_counting_tpu.models.convert import (
        extract_state_dict,
        load_torch_checkpoint,
    )

    sd = extract_state_dict(load_torch_checkpoint(args.input))
    # validate the conversion end-to-end before writing: the same loaders
    # run.py will use must accept the dict
    if args.kind == "yolov5":
        from vehicle_counting_tpu.models.convert import yolov5_state_dict_to_pytree

        yolov5_state_dict_to_pytree(sd)
    else:
        from vehicle_counting_tpu.models.reid import reid_state_dict_to_pytree

        reid_state_dict_to_pytree(sd)
    np.savez(args.output, **sd)
    print(f"wrote {len(sd)} arrays to {args.output}")


if __name__ == "__main__":
    main()
