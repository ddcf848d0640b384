"""Functional NHWC building blocks for detection/ReID models.

Pure functions over param pytrees — no module classes, no framework. All
convs are stored pre-fused (BatchNorm folded into weight/bias at load time,
see models/convert.py), so inference is conv + bias + SiLU: exactly the shape
XLA fuses into a single MXU pass on TPU. Layout is NHWC / HWIO (TPU-native),
with `preferred_element_type=float32` so bf16 activations accumulate in f32
on the MXU.

Reference behavior being reproduced (not the code): the Conv-BN-SiLU /
C3 / SPPF / Detect graph of ultralytics YOLOv5 v6.0, which the reference
loads externally via torch.hub at networks/yolo.py:58.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

DN = ("NHWC", "HWIO", "NHWC")


def autopad(k: int, p: Optional[int] = None) -> int:
    """Default 'same-ish' padding: k // 2 unless explicitly given."""
    return k // 2 if p is None else p


def conv2d(x, w, *, stride=1, padding=None, groups=1, dtype=None):
    """Plain conv. x [B,H,W,Cin], w [kh,kw,Cin/groups,Cout]."""
    k = w.shape[0]
    p = autopad(k, padding)
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(p, p), (p, p)],
        dimension_numbers=DN,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )


def conv_block(params, x, *, stride=1, padding=None, groups=1, act=True, dtype=None):
    """Fused Conv(+folded BN) + SiLU. params = {"w": [kh,kw,cin,cout], "b": [cout]}."""
    y = conv2d(x, params["w"], stride=stride, padding=padding, groups=groups, dtype=dtype)
    y = y + params["b"].astype(jnp.float32)
    if act:
        y = jax.nn.silu(y)
    return y if dtype is None else y.astype(dtype)


def max_pool(x, k: int, stride: int = 1, padding: Optional[int] = None):
    """Max pool matching torch MaxPool2d(k, stride, padding) semantics."""
    p = autopad(k, padding)
    # -inf (not finfo.min) so JAX recognizes the max monoid and keeps the
    # pooling differentiable for the ReID trainer
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )


def upsample2x_nearest(x):
    """Nearest-neighbor 2x upsample (torch nn.Upsample(2, 'nearest'))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


# ---------------------------------------------------------------------------
# parameter initializers (He-normal conv, zero bias) for training-from-scratch
# and for shape-complete random models in tests/benchmarks.
# ---------------------------------------------------------------------------

def init_conv(key, k: int, cin: int, cout: int, groups: int = 1):
    fan_in = k * k * cin // groups
    w = jax.random.normal(key, (k, k, cin // groups, cout), jnp.float32)
    w = w * jnp.sqrt(2.0 / fan_in)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}
