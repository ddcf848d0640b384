"""Attribute tracker_steady cost: full vs no-solver vs no-match-stage."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

from vehicle_counting_tpu.pipeline import enable_compilation_cache
enable_compilation_cache()
import vehicle_counting_tpu.tracking.tracker as T
from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, init_states
from vehicle_counting_tpu.tracking.deepsort import deepsort_frame_core

B, H, W, n_det, k = 32, 720, 1280, 300, 30
hp = DeepSortParams(tracker=TrackerParams(capacity=64), num_classes=4)

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

def make_scan():
    @partial(jax.jit, static_argnames=("hp_",))
    def tracker_scan(states_, feats_, boxes_, scores_, classes_, valid_, hp_):
        def body(st, inp):
            f, b_, s_, c_, v_ = inp
            st, o = deepsort_frame_core(st, f, b_, s_, c_, v_, hp_, (H, W))
            return st, o
        return jax.lax.scan(body, states_, (feats_, boxes_, scores_, classes_, valid_))
    return tracker_scan

def measure(name, chain=8, reps=5):
    scan = make_scan()
    states = init_states(hp)
    states, _ = scan(states, feats, bx, sco, cls, dv, hp)  # warm into steady
    states = jax.block_until_ready(states)
    out = scan(states, feats, bx, sco, cls, dv, hp)
    np.asarray(out[1].mask[0, 0, :1])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = scan(states, feats, bx, sco, cls, dv, hp)
        np.asarray(out[1].mask[0, 0, :1])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:24s} {best*1000/(B*chain):7.3f} ms/frame")

if len(sys.argv) > 2 and sys.argv[2] == "batched":
    hp = DeepSortParams(tracker=TrackerParams(capacity=64), num_classes=4, class_mode="batched")
else:
    hp = DeepSortParams(tracker=TrackerParams(capacity=64), num_classes=4, class_mode="scan")

mode = sys.argv[1]
if mode == "full":
    measure("full")
elif mode == "stub_solver":
    orig = T.solve_assignment_sub_fast
    def stub(c, nr, nc):
        kk = c.shape[0]
        a = jnp.arange(kk, dtype=jnp.int32)
        return jnp.where(a < jnp.minimum(nr, nc), a, -1)
    T.solve_assignment_sub_fast = stub
    measure("stub_solver")
elif mode == "one_class":
    cls = jnp.zeros_like(cls)
    measure("one_class_full")
elif mode == "no_match":
    def nop(cost, rows, det_free, track_col, threshold, row_order, det_key, stage_base):
        return det_free, track_col, det_key
    T._match_stage = nop
    measure("no_match_stage")
