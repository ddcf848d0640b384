import numpy as np

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.train.augment import (
    augment_batch,
    denormalize,
    normalize,
    random_flip,
    random_rotate,
)


def test_normalize_roundtrip(rng):
    img = jnp.asarray(rng.integers(0, 255, size=(2, 16, 16, 3)).astype(np.float32))
    back = denormalize(normalize(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-3)


def test_flip_is_involution(rng):
    img = jnp.asarray(rng.normal(size=(4, 8, 8, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    once = random_flip(key, img)
    # flipping the flipped batch with the SAME key restores the original
    twice = random_flip(key, once)
    np.testing.assert_allclose(np.asarray(twice), np.asarray(img))


def test_rotate_preserves_shape_and_center(rng):
    img = jnp.asarray(rng.normal(size=(3, 21, 21, 3)).astype(np.float32))
    out = random_rotate(jax.random.PRNGKey(1), img, max_deg=10.0)
    assert out.shape == img.shape
    # center pixel is a fixed point of rotation
    np.testing.assert_allclose(
        np.asarray(out[:, 10, 10]), np.asarray(img[:, 10, 10]), atol=1e-4
    )


def test_augment_batch_jits(rng):
    img = jnp.asarray(rng.normal(size=(4, 50, 50, 3)).astype(np.float32))
    out = augment_batch(jax.random.PRNGKey(2), img)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()
