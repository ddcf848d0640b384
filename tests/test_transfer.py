"""parallel_device_put must be a bit-exact drop-in for jax.device_put."""

import numpy as np

import jax

from vehicle_counting_tpu.utils.transfer import parallel_device_put


def test_parallel_device_put_matches_plain():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, size=(13, 480, 640), dtype=np.uint8)
    y = parallel_device_put(x, streams=4)
    assert y.shape == x.shape and y.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(y), x)


def test_parallel_device_put_small_and_unsplittable():
    # below the size threshold -> plain path
    x = np.arange(10, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(parallel_device_put(x)), x)
    # fewer leading rows than streams -> plain path
    x = np.zeros((2, 8), np.float32)
    np.testing.assert_array_equal(
        np.asarray(parallel_device_put(x, streams=4)), x
    )
    # non-ndarray passthrough
    y = parallel_device_put(jax.numpy.ones((3,)), streams=4)
    np.testing.assert_array_equal(np.asarray(y), np.ones((3,), np.float32))
