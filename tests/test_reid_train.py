"""ReID trainer: loss decreases, checkpoint round-trip, DP sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.train import (
    ReidTrainConfig,
    create_train_state,
    eval_step,
    fit,
    train_step,
)
from vehicle_counting_tpu.train.reid_train import (
    extract_features,
    load_checkpoint,
    save_checkpoint,
    top1_retrieval_accuracy,
)


def _toy_data(rng, n, num_classes, hw=50):
    """Class-colored noise images: trivially separable."""
    labels = rng.integers(0, num_classes, n)
    images = rng.normal(0, 0.3, size=(n, hw, hw, 3)).astype(np.float32)
    for i, l in enumerate(labels):
        images[i, :, :, l % 3] += (1.0 + l)
    return images, labels.astype(np.int32)


CFG = ReidTrainConfig(num_classes=4, lr=0.05, batch_size=16, num_epochs=2)


def test_train_step_reduces_loss(rng):
    params, stats, opt, opt_state = create_train_state(jax.random.PRNGKey(0), CFG, 10)
    images, labels = _toy_data(rng, 16, CFG.num_classes)
    im, lb = jnp.asarray(images), jnp.asarray(labels)
    losses = []
    for i in range(12):
        params, stats, opt_state, m = train_step(
            params, stats, opt_state, im, lb, jax.random.PRNGKey(i), opt=opt
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7


def test_fit_best_checkpoint(tmp_path, rng):
    images, labels = _toy_data(rng, 48, CFG.num_classes)

    def train_data(epoch):
        for i in range(0, 48, 16):
            yield images[i : i + 16], labels[i : i + 16]

    eval_data = [(images[:16], labels[:16])]
    out = fit(
        train_data, eval_data, CFG, steps_per_epoch=3,
        checkpoint_dir=str(tmp_path), seed=0,
    )
    assert len(out["history"]["loss"]) == CFG.num_epochs
    assert (tmp_path / "new_ckpt.npz").exists()
    # training-curve artifact next to the checkpoint (reference train.py:161-176)
    assert (tmp_path / "train.jpg").exists()
    assert (tmp_path / "train.jpg").stat().st_size > 1000

    # round-trip restores bitwise-equal params
    params, stats, opt, opt_state = create_train_state(jax.random.PRNGKey(9), CFG, 3)
    p2, s2, o2, epoch, acc = load_checkpoint(
        str(tmp_path / "new_ckpt.npz"), params, stats, opt_state
    )
    flat_a = jax.tree.leaves(out["params"])
    flat_b = jax.tree.leaves(p2)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dp_sharded_train_step_matches_single(rng):
    from vehicle_counting_tpu.parallel.mesh import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    images, labels = _toy_data(rng, 16, CFG.num_classes)
    params, stats, opt, opt_state = create_train_state(jax.random.PRNGKey(0), CFG, 10)

    # single-device result
    p1, s1, o1, m1 = train_step(
        params, stats, opt_state, jnp.asarray(images), jnp.asarray(labels),
        jax.random.PRNGKey(5), opt=opt,
    )

    # 8-way data parallel: same math, batch sharded
    mesh = make_mesh(8, axis_names=("data",))
    params2, stats2, opt2, opt_state2 = create_train_state(jax.random.PRNGKey(0), CFG, 10)
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    p2, s2, o2, m2 = train_step(
        jax.device_put(params2, rep), jax.device_put(stats2, rep),
        jax.device_put(opt_state2, rep),
        jax.device_put(jnp.asarray(images), dp), jax.device_put(jnp.asarray(labels), dp),
        jax.random.PRNGKey(5), opt=opt,
    )
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    a = jax.tree.leaves(p1)[0]
    b = jax.tree.leaves(p2)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_retrieval_eval(rng):
    CFG2 = ReidTrainConfig(num_classes=4)
    params, stats, opt, opt_state = create_train_state(jax.random.PRNGKey(0), CFG2, 10)
    images, labels = _toy_data(rng, 12, 4, hw=50)
    feats = extract_features(params, stats, jnp.asarray(images))
    assert feats.shape == (12, 512)
    acc = top1_retrieval_accuracy(feats, labels, feats, labels)
    assert acc == 1.0  # self-retrieval trivially perfect
