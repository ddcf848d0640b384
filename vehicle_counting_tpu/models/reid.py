"""ReID appearance CNN in pure JAX (train + inference).

Same network family as the reference's DeepSORT appearance model
(networks/deepsort/deep/model.py:5-98): conv3x3(+bias)+BN+ReLU+maxpool(3,2,1)
stem, then 4 stages of 2 residual BasicBlocks (64->64, 64->128/s2,
128->256/s2, 256->512/s2), 4x4 avg-pool, and either an L2-normalized 512-d
embedding (reid mode, model.py:93-95) or a 512->256->num_classes classifier
head with BN+dropout (model.py:75-81).

Unlike the YOLO path (fused at load), BatchNorm stays explicit here because
this model is *trained* in-framework (train/reid_train.py mirrors
deep/train.py); XLA fuses the BN epilogue into the conv at compile time, so
inference pays nothing for it. Params and batch stats are separate pytrees
(functional train step).

Embedding inputs are 50x50 crops, ImageNet-normalized (the reference's
feature_extractor.py:18-22 contract); crop gathering is in ops/crops.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.models.layers import conv2d, max_pool

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
EMBED_DIM = 512
BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch convention: new = (1-m)*old + m*batch

STAGES = ((64, 64, False), (64, 128, True), (128, 256, True), (256, 512, True))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_bn(c: int) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
    }


def _init_bn_stats(c: int) -> Dict[str, jnp.ndarray]:
    return {
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def _he(key, k, cin, cout):
    w = jax.random.normal(key, (k, k, cin, cout), jnp.float32)
    return w * jnp.sqrt(2.0 / (k * k * cin))


def init_reid(key, num_classes: int = 751) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (params, batch_stats)."""
    keys = iter(jax.random.split(key, 64))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["stem"] = {
        "w": _he(next(keys), 3, 3, 64),
        "b": jnp.zeros((64,), jnp.float32),
        "bn": _init_bn(64),
    }
    stats["stem"] = _init_bn_stats(64)

    for si, (cin, cout, ds) in enumerate(STAGES):
        for bi in range(2):
            name = f"layer{si + 1}_{bi}"
            b_cin = cin if bi == 0 else cout
            b_ds = ds and bi == 0
            p = {
                "conv1": {"w": _he(next(keys), 3, b_cin, cout)},
                "bn1": _init_bn(cout),
                "conv2": {"w": _he(next(keys), 3, cout, cout)},
                "bn2": _init_bn(cout),
            }
            s = {"bn1": _init_bn_stats(cout), "bn2": _init_bn_stats(cout)}
            if b_ds or b_cin != cout:
                p["down"] = {"w": _he(next(keys), 1, b_cin, cout), "bn": _init_bn(cout)}
                s["down"] = _init_bn_stats(cout)
            params[name] = p
            stats[name] = s

    k1, k2 = next(keys), next(keys)
    params["fc1"] = {
        "w": jax.random.normal(k1, (EMBED_DIM, 256), jnp.float32) / jnp.sqrt(EMBED_DIM),
        "b": jnp.zeros((256,), jnp.float32),
        "bn": _init_bn(256),
    }
    stats["fc1"] = _init_bn_stats(256)
    params["fc2"] = {
        "w": jax.random.normal(k2, (256, num_classes), jnp.float32) / jnp.sqrt(256.0),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    return params, stats


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _bn(x, p, s, train: bool, axes=(0, 1, 2)):
    if train:
        mean = jnp.mean(x, axes)
        var = jnp.var(x, axes)
    else:
        mean, var = s["mean"], s["var"]
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x - mean) * inv * p["scale"] + p["bias"]
    if train:
        n = x.size / mean.size
        unbiased = var * n / max(n - 1, 1)
        new_s = {
            "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * unbiased,
        }
        return y, new_s
    return y, s


def _conv3_even(x, w, stride, dtype):
    """3x3 pad-1 conv with odd spatial dims zero-padded to EVEN first.

    Exact: the pad-1 conv already reads zeros past the last row/col, so an
    explicit zero row/col contributes the same zero terms (x + 0 == x in
    any summation order), and the output is sliced back to the native
    size (stride-2 output sizes are unchanged by the +1 pad). Measured on
    v5e: the ReID stages' odd 25x25 / 13x13 activations tile ~11% faster
    padded even ([3840, 25, 25, 64] 3x3: 45.7 -> 40.7 us/frame;
    benchmarks/micro/reid_pad.py, bitwise-equal asserted on-chip).
    """
    b, h, wd, c = x.shape
    ph, pw = h % 2, wd % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    y = conv2d(x, w, stride=stride, dtype=dtype)
    oh = (h + 2 - 3) // stride + 1
    ow = (wd + 2 - 3) // stride + 1
    return y[:, :oh, :ow, :]


# None: auto = OFF — the fused stage-1 block kernel measured a WASH vs
# XLA's lowering at the production config (ROADMAP r3; both generations,
# 0.300-0.301 ms/frame embed_cnn either way), so auto never probes it.
# True / env FORCE_PALLAS_REID_BLOCK=1: force the kernel (interpret mode
# off-TPU — used by CPU parity tests); False / =0: force the XLA conv path.
FORCE_PALLAS_REID_BLOCK = None


def _reid_block_mode() -> str:
    """'off' | 'compile' | 'interpret' — trace-time dispatch decision for
    the fused stage-1 BasicBlock kernel (ops/pallas/reid_block.py)."""
    import os

    env = os.environ.get("FORCE_PALLAS_REID_BLOCK")
    if FORCE_PALLAS_REID_BLOCK is False or env == "0":
        return "off"
    if FORCE_PALLAS_REID_BLOCK is True or env == "1":
        return "interpret" if jax.default_backend() != "tpu" else "compile"
    # auto: OFF. The kernel direct-compiles on the axon TPU and is bitwise-
    # verified, but the on-chip A/B is a WASH at the production config
    # (bf16, chunk 64, B=128) across BOTH kernel generations: 0.300 vs
    # XLA's 0.299 ms/frame for the per-tap-mask patch build, and 0.301 vs
    # 0.301 for the gap-padded build that halves the patch VPU work — the
    # stage-1 blocks are at the c_out=64 MXU stream's practical ceiling
    # (~57 TF/s effective), which XLA's lowering already reaches. Prefer
    # the simpler XLA path when equal; the kernel stays behind this flag
    # for future shapes/hardware.
    return "off"


def _block_pallas(p, s, x, dtype, mode: str):
    """Inference stage-1 block via the fused Pallas kernel (BN folded)."""
    from vehicle_counting_tpu.ops.pallas.reid_block import reid_block64_pallas

    def fold(bn_p, bn_s):
        a = jax.lax.rsqrt(bn_s["var"] + BN_EPS) * bn_p["scale"]
        return a, bn_p["bias"] - bn_s["mean"] * a

    a1, b1 = fold(p["bn1"], s["bn1"])
    a2, b2 = fold(p["bn2"], s["bn2"])
    xk = x if dtype is None else x.astype(dtype)
    return reid_block64_pallas(
        xk, p["conv1"]["w"], p["conv2"]["w"], a1, b1, a2, b2,
        use_bf16=dtype == jnp.bfloat16,
        interpret=mode == "interpret",
    ).astype(jnp.float32)


def _basic_block(p, s, x, stride: int, train: bool, dtype=None):
    y = _conv3_even(x, p["conv1"]["w"], stride, dtype)
    y, s1 = _bn(y, p["bn1"], s["bn1"], train)
    y = jax.nn.relu(y)
    y = _conv3_even(y, p["conv2"]["w"], 1, dtype)
    y, s2 = _bn(y, p["bn2"], s["bn2"], train)
    if "down" in p:
        x = conv2d(x, p["down"]["w"], stride=stride, padding=0, dtype=dtype)
        x, sd = _bn(x, p["down"]["bn"], s["down"], train)
        new_s = {"bn1": s1, "bn2": s2, "down": sd}
    else:
        new_s = {"bn1": s1, "bn2": s2}
    return jax.nn.relu(x + y), new_s


def reid_forward(
    params,
    stats,
    x,
    *,
    train: bool = False,
    reid: bool = True,
    dropout_key: Optional[jax.Array] = None,
    dtype=None,
):
    """x: [B, H, W, 3] normalized crops. Returns (out, new_stats).

    reid=True  -> L2-normalized [B, 512] embeddings.
    reid=False -> [B, num_classes] logits (training head).
    dtype: MXU compute dtype for the convs (e.g. bf16 on TPU, matching the
    detector's AMP stance); accumulation and all BN/normalization math stay
    f32. None = f32 throughout (the CPU-parity default).
    """
    new_stats: Dict[str, Any] = {}
    y = conv2d(x, params["stem"]["w"], dtype=dtype) + params["stem"]["b"]
    y, new_stats["stem"] = _bn(y, params["stem"]["bn"], stats["stem"], train)
    y = jax.nn.relu(y)
    y = max_pool(y, 3, 2, 1)

    blk_mode = _reid_block_mode() if not train else "off"
    for si, (cin, cout, ds) in enumerate(STAGES):
        for bi in range(2):
            name = f"layer{si + 1}_{bi}"
            stride = 2 if (ds and bi == 0) else 1
            if (
                blk_mode != "off"
                and stride == 1
                and "down" not in params[name]
                and y.shape[1:] == (25, 25, 64)
                and (dtype == jnp.bfloat16 or blk_mode == "interpret")
            ):
                # bf16 only on TPU: f32 patches [G*625, 576] blow the 16 MB
                # scoped VMEM (measured OOM at G=8 f32), and f32 is the
                # CPU-parity path where XLA stays authoritative anyway
                # fused whole-block Pallas kernel (ops/pallas/reid_block.py):
                # the stage-1 64-ch 25x25 convs are the embed CNN's measured
                # outlier (~93 us/frame at 15% of peak through XLA — layout,
                # not FLOPs); inference only, running BN stats pass through
                y = _block_pallas(
                    params[name], stats[name], y, dtype, blk_mode
                )
                new_stats[name] = stats[name]
                continue
            y, new_stats[name] = _basic_block(
                params[name], stats[name], y, stride, train, dtype=dtype
            )

    y = jax.lax.reduce_window(
        y, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 1, 1, 1), "VALID"
    ) / 16.0
    emb = y.reshape(y.shape[0], -1)  # [B, 512] (input 50x50 -> 1x1 spatial)

    if reid:
        norm = jnp.linalg.norm(emb, axis=1, keepdims=True)
        new_stats["fc1"] = stats["fc1"]
        return emb / jnp.maximum(norm, 1e-12), new_stats

    h = emb @ params["fc1"]["w"] + params["fc1"]["b"]
    h, new_stats["fc1"] = _bn(h, params["fc1"]["bn"], stats["fc1"], train, axes=(0,))
    h = jax.nn.relu(h)
    if train and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 0.5, h.shape)
        h = jnp.where(keep, h / 0.5, 0.0)
    logits = h @ params["fc2"]["w"] + params["fc2"]["b"]
    return logits, new_stats


@partial(jax.jit, static_argnames=())
def reid_embed(params, stats, crops):
    """Inference embeddings for pre-normalized [D, 50, 50, 3] crops."""
    emb, _ = reid_forward(params, stats, crops, train=False, reid=True)
    return emb


# ---------------------------------------------------------------------------
# torch .t7 conversion (name-mapped, BN kept explicit)
# ---------------------------------------------------------------------------

def reid_state_dict_to_pytree(sd) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Map the reference's `net_dict` names onto (params, batch_stats).

    Torch layout: conv.0/conv.1 stem; layer{1..4}.{0,1}.conv1/bn1/conv2/bn2
    (+ .downsample.0/.1); classifier.0 (linear), .1 (bn1d), .4 (linear).
    """
    import numpy as np

    def t(w):  # OIHW -> HWIO
        return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))

    def bn(prefix):
        return (
            {"scale": jnp.asarray(sd[f"{prefix}.weight"]), "bias": jnp.asarray(sd[f"{prefix}.bias"])},
            {"mean": jnp.asarray(sd[f"{prefix}.running_mean"]), "var": jnp.asarray(sd[f"{prefix}.running_var"])},
        )

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    bn_p, bn_s = bn("conv.1")
    params["stem"] = {"w": t(sd["conv.0.weight"]), "b": jnp.asarray(sd["conv.0.bias"]), "bn": bn_p}
    stats["stem"] = bn_s

    for si in range(4):
        for bi in range(2):
            name = f"layer{si + 1}_{bi}"
            tbase = f"layer{si + 1}.{bi}"
            bn1_p, bn1_s = bn(f"{tbase}.bn1")
            bn2_p, bn2_s = bn(f"{tbase}.bn2")
            p = {
                "conv1": {"w": t(sd[f"{tbase}.conv1.weight"])},
                "bn1": bn1_p,
                "conv2": {"w": t(sd[f"{tbase}.conv2.weight"])},
                "bn2": bn2_p,
            }
            s = {"bn1": bn1_s, "bn2": bn2_s}
            if f"{tbase}.downsample.0.weight" in sd:
                dbn_p, dbn_s = bn(f"{tbase}.downsample.1")
                p["down"] = {"w": t(sd[f"{tbase}.downsample.0.weight"]), "bn": dbn_p}
                s["down"] = dbn_s
            params[name] = p
            stats[name] = s

    if "classifier.0.weight" in sd:
        import numpy as np

        cbn_p, cbn_s = bn("classifier.1")
        params["fc1"] = {
            "w": jnp.asarray(np.transpose(sd["classifier.0.weight"])),
            "b": jnp.asarray(sd["classifier.0.bias"]),
            "bn": cbn_p,
        }
        stats["fc1"] = cbn_s
        params["fc2"] = {
            "w": jnp.asarray(np.transpose(sd["classifier.4.weight"])),
            "b": jnp.asarray(sd["classifier.4.bias"]),
        }
    return params, stats


def load_reid_weights(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load the reference `ckpt.t7` (or an .npz) into (params, stats)."""
    if path.endswith(".npz"):
        import numpy as np

        data = np.load(path)
        sd = {k: data[k] for k in data.files}
    else:
        from vehicle_counting_tpu.models.convert import (
            extract_state_dict,
            load_torch_checkpoint,
        )

        sd = extract_state_dict(load_torch_checkpoint(path))
    return reid_state_dict_to_pytree(sd)
