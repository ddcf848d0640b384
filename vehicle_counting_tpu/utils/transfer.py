"""Host->device transfer helpers.

The dev tunnel to the TPU moves ~5-60 MB/s depending on congestion and is
the e2e pipeline's bottleneck (device compute is ~1 ms/frame; a 720p->640
thin-upload frame is ~345 KB, ~7 ms at 50 MB/s). A single `jax.device_put`
uses one stream; splitting the batch into a few chunks uploaded from
concurrent threads measurably raises effective bandwidth on the tunnel
(+~25% at 4 streams when congested — multiple TCP streams share fairer).
On real TPU hosts (PCIe DMA, GB/s) the split is harmless noise, and
single-chunk inputs take the plain path.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

_POOL = None


def _pool(n: int) -> ThreadPoolExecutor:
    global _POOL
    if _POOL is None or _POOL._max_workers < n:
        _POOL = ThreadPoolExecutor(max_workers=n)
    return _POOL


def upload_streams_default() -> int:
    return int(os.environ.get("VCT_UPLOAD_STREAMS", "4"))


def parallel_device_put(x: np.ndarray, streams: int | None = None):
    """`jax.device_put(x)` over several concurrent chunk streams.

    Splits along axis 0 and re-concatenates on device (one ~HBM-bandwidth
    copy, negligible vs the transfer). Falls back to a plain device_put for
    small arrays, 1-stream config, or unsplittable inputs.
    """
    n = upload_streams_default() if streams is None else int(streams)
    if (
        n <= 1
        or not isinstance(x, np.ndarray)
        or x.ndim < 1
        or x.shape[0] < n
        or x.nbytes < (1 << 21)
    ):
        return jax.device_put(x)
    chunks = np.array_split(x, n, axis=0)
    futs = [_pool(n).submit(jax.device_put, c) for c in chunks]
    parts = [f.result() for f in futs]
    return jnp.concatenate(parts, axis=0)
