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


# ---------------------------------------------------------------------------
# multi-host (DCN) scale-out
# ---------------------------------------------------------------------------

def initialize_multihost(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
) -> None:
    """Join this process to a multi-host jax runtime over DCN.

    The camera fleet spans hosts: each host decodes and feeds its own
    cameras, jax.distributed stitches every host's chips into one global
    device set, and the camera-sharded step needs NO cross-host collectives
    (per-camera pipelines are independent — SURVEY.md §5 'distributed
    communication backend'), so only control-plane traffic crosses DCN.
    Call BEFORE any jax array op. Idempotent per process.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(axis_names: Sequence[str] = ("cam",)) -> Mesh:
    """1-D mesh over ALL global devices (every process's chips)."""
    return Mesh(np.asarray(jax.devices()), axis_names)


def host_local_to_global(mesh: Mesh, spec, local_array: np.ndarray) -> jax.Array:
    """Assemble a global sharded array from this process's local shard.

    local_array is the slice this host owns along the sharded axis (its own
    cameras' frames/states); the returned jax.Array is globally addressable
    by jit/shard_map over `mesh` without any data crossing DCN.
    """
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    axis = next((i for i, name in enumerate(spec) if name is not None), 0)
    # global extent along the sharded axis = sum of equal per-process extents
    global_shape = list(local_array.shape)
    global_shape[axis] = local_array.shape[axis] * jax.process_count()
    return jax.make_array_from_process_local_data(
        sharding, local_array, tuple(global_shape)
    )


def global_to_host_local(global_array: jax.Array, axis: int = 0) -> np.ndarray:
    """This process's rows of a 1-D-sharded global array, in device order."""
    shards = sorted(
        global_array.addressable_shards, key=lambda s: s.index[axis].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=axis)
