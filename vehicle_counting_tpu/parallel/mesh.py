"""Device-mesh helpers for multi-chip scale-out.

The reference has no distributed backend at all (`--gpus` is cosmetic,
run.py:15-17; SURVEY.md §2 'native code statement'). The TPU-native scaling
model (SURVEY.md §5): cameras/videos are fully independent units, so the
pipeline shards WHOLE per-camera states over a 1-D mesh axis ('cam') with no
collectives; ReID training shards its batch over a 'data' axis and lets XLA
insert the gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("cam",)) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)} "
                f"({[d.platform for d in devices[:4]]}...)"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names)
