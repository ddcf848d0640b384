"""On-TPU check: fused cascade kernel (compiled Mosaic) vs staged XLA path."""
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from test_pallas_cascade import _random_scenario, _run_xla, _track_col_from_out_row
from vehicle_counting_tpu.ops.pallas.cascade import (
    LVL_SENTINEL, cascade_match_batched, cascade_match_classparallel,
    pallas_cascade_supported, pallas_cascade_cp_supported,
)
from vehicle_counting_tpu.tracking.tracker import TrackerParams, _stable_rank

print("backend:", jax.default_backend())
print("pallas_cascade_supported:", pallas_cascade_supported())
print("pallas_cascade_cp_supported:", pallas_cascade_cp_supported())
import os
KERNEL = (cascade_match_classparallel if os.environ.get("CP", "1") == "1"
          else cascade_match_batched)
print("kernel:", KERNEL.__wrapped__.__name__ if hasattr(KERNEL, "__wrapped__") else KERNEL)

k, max_age = 64, 30
hp = TrackerParams(capacity=k, max_age=max_age)
g = np.random.default_rng(5)
bad = 0
for trial in range(12):
    nt = int(g.integers(0, 40))
    nd = int(g.integers(0, 40))
    scen = _random_scenario(g, k, max_age, nt, nd, n_classes=4,
                            clamp_frac=float(g.uniform(0, 0.9)),
                            tie_frac=float(g.uniform(0, 0.9)))
    det_free, det_key, out_row = KERNEL(
        jnp.asarray(np.stack([s["gated"] for s in scen])),
        jnp.asarray(np.stack([s["iou"] for s in scen])),
        jnp.asarray(np.minimum(np.stack([s["lvl_of"] for s in scen]), LVL_SENTINEL), jnp.int32),
        jnp.asarray(np.stack([s["tentative"] for s in scen]), jnp.int32),
        jnp.stack([_stable_rank(jnp.asarray(s["track_id"], jnp.int32)) for s in scen]),
        jnp.stack([_stable_rank(jnp.asarray(s["iou_order"], jnp.int32)) for s in scen]),
        jnp.asarray(np.stack([s["det_valid"] for s in scen]), jnp.int32),
        jnp.asarray(np.stack([s["det_order"] for s in scen]), jnp.int32),
        hp.max_dist, hp.max_iou_distance, max_age=hp.max_age,
    )
    det_free, det_key, out_row = map(np.asarray, (det_free, det_key, out_row))
    for c, s in enumerate(scen):
        wf, wc, wk = map(np.asarray, _run_xla(s, hp))
        ok = (np.array_equal(det_free[c], wf) and np.array_equal(det_key[c], wk)
              and np.array_equal(_track_col_from_out_row(out_row[c], k), wc))
        if not ok:
            bad += 1
            print(f"MISMATCH trial {trial} class {c}")
print("done, mismatches:", bad)
