"""Interpret-mode parity for the layer-1 conv Pallas kernel (conv_s2.py).

The kernel is a recorded NEGATIVE result (it loses 1.9x to XLA's native
lowering on the v5e — see the module docstring) and is not wired into the
detector, but it stays in the tree with the measurement; these tests keep
it correct so the numbers remain reproducible.

Parity target: models/layers.conv_block(stride=2, dtype=x.dtype), i.e. the
native implementation of ultralytics YOLOv5 v6.0 Conv(32, 64, 3, 2)
(the reference imports it via torch.hub, /root/reference/networks/yolo.py:58).
Tolerance is f32-summation-order only: identical operand dtypes and f32
accumulation, different accumulation order.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vehicle_counting_tpu.models.layers import conv_block
from vehicle_counting_tpu.ops.pallas.conv_s2 import (
    conv1_s2_silu_pallas,
    conv1_shape_ok,
)

pytestmark = pytest.mark.fast


@pytest.mark.parametrize(
    "b,h,w", [(1, 32, 64), (2, 64, 128), (1, 96, 192)]
)
def test_conv1_s2_matches_conv_block(b, h, w):
    rng = np.random.default_rng(h + w)
    x = jnp.asarray(rng.standard_normal((b, h, w, 32)) * 0.5, jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((3, 3, 32, 64)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(64) * 0.05, jnp.float32)

    ref = np.asarray(
        conv_block({"w": wt, "b": bias}, x, stride=2, dtype=jnp.bfloat16),
        np.float32,
    )
    got = np.asarray(
        conv1_s2_silu_pallas(x, wt, bias, interpret=True), np.float32
    )
    assert got.shape == ref.shape == (b, h // 2, w // 2, 64)
    rel = np.abs(ref - got) / np.maximum(np.abs(ref), 1e-2)
    assert rel.max() < 0.05
    # after the bf16 output cast almost all entries round identically
    assert (ref == got).mean() > 0.99


def test_conv1_shape_gate():
    assert conv1_shape_ok((128, 320, 320, 32), (3, 3, 32, 64))
    assert not conv1_shape_ok((1, 320, 320, 16), (3, 3, 16, 64))
    assert not conv1_shape_ok((1, 300, 320, 32), (3, 3, 32, 64))  # H%32
    assert not conv1_shape_ok((1, 320, 300, 32), (3, 3, 32, 64))  # W%64
