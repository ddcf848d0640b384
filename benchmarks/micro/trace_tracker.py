import numpy as np, jax, jax.numpy as jnp
from functools import partial
from vehicle_counting_tpu.pipeline import enable_compilation_cache
enable_compilation_cache()
from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, init_states
from vehicle_counting_tpu.tracking.deepsort import deepsort_frame_core

B, H, W, n_det, k = 32, 720, 1280, 300, 30
hp = DeepSortParams(tracker=TrackerParams(capacity=64), num_classes=4, class_mode="scan")
r = np.random.default_rng(7)
cx = r.uniform(100, W-100, (1, n_det)); cy = r.uniform(100, H-100, (1, n_det))
bw = r.uniform(40, 160, (1, n_det)); bh = r.uniform(40, 160, (1, n_det))
base = np.stack([cx-bw/2, cy-bh/2, cx+bw/2, cy+bh/2], -1)[0]
drift = np.cumsum(np.random.default_rng(8).normal(0, 2.0, (B, n_det, 4)), 0)
bx = jnp.asarray(base[None] + drift, jnp.float32)
feats_h = np.random.default_rng(4).normal(size=(B, n_det, 512))
feats_h /= np.linalg.norm(feats_h, axis=-1, keepdims=True)
feats = jnp.asarray(feats_h, jnp.float32)
dv = jnp.asarray(np.arange(n_det)[None, :].repeat(B, 0) < k)
cls = jnp.asarray(np.random.default_rng(1).integers(0, 4, (B, n_det)), np.int32)
sco = jnp.asarray(np.random.default_rng(2).uniform(0.3, 0.9, (B, n_det)), np.float32)

@partial(jax.jit, static_argnames=("hp_",))
def tracker_scan(states_, feats_, boxes_, scores_, classes_, valid_, hp_):
    def body(st, inp):
        f, b_, s_, c_, v_ = inp
        st, o = deepsort_frame_core(st, f, b_, s_, c_, v_, hp_, (H, W))
        return st, o
    return jax.lax.scan(body, states_, (feats_, boxes_, scores_, classes_, valid_))

states = init_states(hp)
states, _ = tracker_scan(states, feats, bx, sco, cls, dv, hp)
states = jax.block_until_ready(states)
out = tracker_scan(states, feats, bx, sco, cls, dv, hp)
np.asarray(out[1].mask[0,0,:1])

with jax.profiler.trace("/tmp/tracker_trace"):
    for _ in range(4):
        out = tracker_scan(states, feats, bx, sco, cls, dv, hp)
    np.asarray(out[1].mask[0,0,:1])
print("trace done")
