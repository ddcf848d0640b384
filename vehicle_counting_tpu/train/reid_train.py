"""ReID classifier training — TPU-native equivalent of deep/train.py.

Reference training recipe (networks/deepsort/deep/train.py): SGD lr 0.1,
momentum 0.9, weight decay 5e-4, cross-entropy loss, 40 epochs with x0.1
decay every 20 (train.py:16-23,71-72,179-196), best-accuracy checkpointing
(train.py:144-156), resume support (train.py:59-67).

TPU-native design: one functional `train_step` (grads + BN batch-stat
updates in a single jit), optax SGD chain, and data parallelism expressed by
sharding the batch over a `jax.sharding.Mesh` axis — XLA inserts the
gradient all-reduce; there is no hand-written collective. Checkpoints are
plain .npz pytrees ({params, stats, opt, epoch, acc}).

Crops train at 50x50 — the size the inference extractor actually uses
(feature_extractor.py:18) — so the classifier head shapes stay consistent.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from vehicle_counting_tpu.models.reid import init_reid, reid_forward


@dataclass(frozen=True)
class ReidTrainConfig:
    num_classes: int = 751
    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 5e-4
    num_epochs: int = 40
    lr_decay_every: int = 20  # x0.1 (train.py:179-184)
    batch_size: int = 64
    crop_hw: Tuple[int, int] = (50, 50)


def make_optimizer(cfg: ReidTrainConfig, steps_per_epoch: int = 1000):
    sched = optax.exponential_decay(
        cfg.lr,
        transition_steps=cfg.lr_decay_every * steps_per_epoch,
        decay_rate=0.1,
        staircase=True,
    )
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(sched, momentum=cfg.momentum),
    )


def create_train_state(key, cfg: ReidTrainConfig, steps_per_epoch: int = 1000):
    params, stats = init_reid(key, num_classes=cfg.num_classes)
    opt = make_optimizer(cfg, steps_per_epoch)
    return params, stats, opt, opt.init(params)


def _loss_fn(params, stats, images, labels, dropout_key):
    logits, new_stats = reid_forward(
        params, stats, images, train=True, reid=False, dropout_key=dropout_key
    )
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    acc = (jnp.argmax(logits, -1) == labels).mean()
    return loss, (new_stats, acc)


@partial(jax.jit, static_argnames=("opt",), donate_argnums=(0, 1, 2))
def train_step(params, stats, opt_state, images, labels, step_key, *, opt):
    """One SGD step. images [B, H, W, 3] normalized, labels [B] int32.

    Shard `images`/`labels` over a mesh data axis for DP; params stay
    replicated and XLA all-reduces the grads.
    """
    (loss, (new_stats, acc)), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
        params, stats, images, labels, step_key
    )
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_stats, opt_state, {"loss": loss, "acc": acc}


@jax.jit
def eval_step(params, stats, images, labels):
    logits, _ = reid_forward(params, stats, images, train=False, reid=False)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    acc = (jnp.argmax(logits, -1) == labels).mean()
    return {"loss": loss, "acc": acc}


@jax.jit
def extract_features(params, stats, images):
    """Batch embeddings for retrieval eval (deep/test.py:55-66 role)."""
    emb, _ = reid_forward(params, stats, images, train=False, reid=True)
    return emb


def top1_retrieval_accuracy(query_f, query_l, gallery_f, gallery_l) -> float:
    """deep/evaluate.py:9-13: dot-product ranking, top-1 match."""
    scores = np.asarray(query_f) @ np.asarray(gallery_f).T
    idx = scores.argmax(axis=1)
    return float((np.asarray(gallery_l)[idx] == np.asarray(query_l)).mean())


# ---------------------------------------------------------------------------
# host loop
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, params, stats, opt_state, epoch: int, acc: float):
    flat, treedef = jax.tree.flatten((params, stats, opt_state))
    np.savez(
        path,
        __meta__=np.array([epoch, acc]),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
    )


def load_checkpoint(path: str, params, stats, opt_state):
    data = np.load(path)
    flat, treedef = jax.tree.flatten((params, stats, opt_state))
    flat = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(flat))]
    params, stats, opt_state = jax.tree.unflatten(treedef, flat)
    epoch, acc = data["__meta__"]
    return params, stats, opt_state, int(epoch), float(acc)


def save_train_curves(history: Dict, path: str) -> None:
    """Loss / top-1 error curves to a JPG (reference train.py:161-176:
    draw_curve plots per-epoch train/test loss and error to train.jpg)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = list(range(len(history["loss"])))
    fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(9, 4))
    ax0.plot(epochs, history["loss"], "bo-", label="train")
    ax0.set_title("loss")
    ax0.legend()
    ax1.plot(epochs, [1.0 - a for a in history["acc"]], "bo-", label="train")
    ax1.plot(epochs, [1.0 - a for a in history["val_acc"]], "ro-", label="val")
    ax1.set_title("top1err")
    ax1.legend()
    fig.savefig(path)
    plt.close(fig)


def fit(
    train_data: Iterator,
    eval_data,
    cfg: ReidTrainConfig,
    *,
    steps_per_epoch: int,
    checkpoint_dir: Optional[str] = None,
    resume: Optional[str] = None,
    seed: int = 0,
    mesh=None,
) -> Dict:
    """Best-acc-checkpointing train loop (train.py:186-196 semantics).

    train_data: callable(epoch) -> iterator of (images, labels) numpy batches.
    eval_data: list of (images, labels) batches.
    mesh: optional jax Mesh with a 'data' axis for multi-chip DP.
    """
    key = jax.random.PRNGKey(seed)
    params, stats, opt, opt_state = create_train_state(key, cfg, steps_per_epoch)
    start_epoch, best_acc = 0, 0.0
    if resume and os.path.exists(resume):
        params, stats, opt_state, start_epoch, best_acc = load_checkpoint(
            resume, params, stats, opt_state
        )

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, rep)
        stats = jax.device_put(stats, rep)
        opt_state = jax.device_put(opt_state, rep)

    history = {"loss": [], "acc": [], "val_acc": []}
    for epoch in range(start_epoch, cfg.num_epochs):
        losses, accs = [], []
        for step, (images, labels) in enumerate(train_data(epoch)):
            key, sk = jax.random.split(key)
            im = jnp.asarray(images)
            lb = jnp.asarray(labels)
            if sharding is not None:
                im = jax.device_put(im, sharding)
                lb = jax.device_put(lb, sharding)
            params, stats, opt_state, m = train_step(
                params, stats, opt_state, im, lb, sk, opt=opt
            )
            losses.append(float(m["loss"]))
            accs.append(float(m["acc"]))
        val_accs = [
            float(eval_step(params, stats, jnp.asarray(x), jnp.asarray(y))["acc"])
            for x, y in eval_data
        ]
        val_acc = float(np.mean(val_accs)) if val_accs else 0.0
        history["loss"].append(float(np.mean(losses)) if losses else 0.0)
        history["acc"].append(float(np.mean(accs)) if accs else 0.0)
        history["val_acc"].append(val_acc)
        if checkpoint_dir and val_acc >= best_acc:
            best_acc = val_acc
            os.makedirs(checkpoint_dir, exist_ok=True)
            save_checkpoint(
                os.path.join(checkpoint_dir, "new_ckpt.npz"),
                params, stats, opt_state, epoch, best_acc,
            )
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            save_train_curves(history, os.path.join(checkpoint_dir, "train.jpg"))
    return {"params": params, "stats": stats, "history": history, "best_acc": best_acc}
