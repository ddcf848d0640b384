"""Train-time augmentation for the ReID trainer.

Reference recipe (deep/train.py:34-53): random crop-context, horizontal
flip, ~10-degree rotation; plus the MEAN/STD normalize contract from
augmentations/transforms.py:6-27 (Denormalize inverse included). Implemented
as pure-JAX batched ops so augmentation runs jitted on device alongside the
train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


def normalize(images: jax.Array) -> jax.Array:
    """uint8/float 0..255 RGB -> ImageNet-normalized float32."""
    import numpy as np

    x = images.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(np.asarray(_MEAN, "float32"))) / jnp.asarray(
        np.asarray(_STD, "float32")
    )


def denormalize(images: jax.Array) -> jax.Array:
    """Inverse of normalize (augmentations/transforms.py:9-27 role)."""
    import numpy as np

    x = images * jnp.asarray(np.asarray(_STD, "float32")) + jnp.asarray(
        np.asarray(_MEAN, "float32")
    )
    return jnp.clip(x * 255.0, 0, 255)


def random_flip(key, images: jax.Array) -> jax.Array:
    """Per-sample horizontal flip with p=0.5."""
    flip = jax.random.bernoulli(key, 0.5, (images.shape[0],))
    return jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)


def random_rotate(key, images: jax.Array, max_deg: float = 10.0) -> jax.Array:
    """Per-sample small rotation (bilinear, edge clamp), torch rot10-style."""
    b, h, w, c = images.shape
    theta = jax.random.uniform(key, (b,), minval=-max_deg, maxval=max_deg) * (
        jnp.pi / 180.0
    )
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx

    def rot_one(img, t):
        cos, sin = jnp.cos(t), jnp.sin(t)
        sx = cx + cos * xx - sin * yy
        sy = cy + sin * xx + cos * yy
        x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        fx = jnp.clip(sx, 0, w - 1) - x0
        fy = jnp.clip(sy, 0, h - 1) - y0
        i00 = img[y0, x0]
        i01 = img[y0, x1]
        i10 = img[y1, x0]
        i11 = img[y1, x1]
        top = i00 * (1 - fx)[..., None] + i01 * fx[..., None]
        bot = i10 * (1 - fx)[..., None] + i11 * fx[..., None]
        return top * (1 - fy)[..., None] + bot * fy[..., None]

    return jax.vmap(rot_one)(images, theta)


@jax.jit
def augment_batch(key, images: jax.Array) -> jax.Array:
    """flip + rot10 pipeline on normalized images (deep/train.py contract)."""
    k1, k2 = jax.random.split(key)
    return random_rotate(k2, random_flip(k1, images))
