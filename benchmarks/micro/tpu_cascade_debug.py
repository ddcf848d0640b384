"""Phase 1 (TPU): dump compiled kernel outputs for all trials to npz.
Phase 2 (CPU): compare vs interpret + XLA. Select with argv[1] = tpu|cpu."""
import sys
import numpy as np
import jax

if sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, "tests")
from test_pallas_cascade import _random_scenario, _run_xla, _track_col_from_out_row
from vehicle_counting_tpu.ops.pallas.cascade import (
    LVL_SENTINEL, cascade_match_batched,
)
from vehicle_counting_tpu.tracking.tracker import TrackerParams, _stable_rank

k, max_age = 64, 30
hp = TrackerParams(capacity=k, max_age=max_age)
g = np.random.default_rng(5)
scens = []
for trial in range(12):
    nt = int(g.integers(0, 40))
    nd = int(g.integers(0, 40))
    scens.append(_random_scenario(g, k, max_age, nt, nd, n_classes=4,
                                  clamp_frac=float(g.uniform(0, 0.9)),
                                  tie_frac=float(g.uniform(0, 0.9))))


def run(scen, interpret):
    return tuple(map(np.asarray, cascade_match_batched(
        jnp.asarray(np.stack([s["gated"] for s in scen])),
        jnp.asarray(np.stack([s["iou"] for s in scen])),
        jnp.asarray(np.minimum(np.stack([s["lvl_of"] for s in scen]), LVL_SENTINEL), jnp.int32),
        jnp.asarray(np.stack([s["tentative"] for s in scen]), jnp.int32),
        jnp.stack([_stable_rank(jnp.asarray(s["track_id"], jnp.int32)) for s in scen]),
        jnp.stack([_stable_rank(jnp.asarray(s["iou_order"], jnp.int32)) for s in scen]),
        jnp.asarray(np.stack([s["det_valid"] for s in scen]), jnp.int32),
        jnp.asarray(np.stack([s["det_order"] for s in scen]), jnp.int32),
        hp.max_dist, hp.max_iou_distance, max_age=hp.max_age, interpret=interpret,
    )))


if sys.argv[1] == "tpu":
    out = {}
    for t, scen in enumerate(scens):
        f, kk, r = run(scen, False)
        out[f"f{t}"] = f; out[f"k{t}"] = kk; out[f"r{t}"] = r
    np.savez("/tmp/casc_tpu.npz", **out)
    print("saved")
else:
    z = np.load("/tmp/casc_tpu.npz")
    for t, scen in enumerate(scens):
        inf, ink, inr = run(scen, True)
        for c in range(4):
            ok_int = (np.array_equal(z[f"f{t}"][c], inf[c])
                      and np.array_equal(z[f"k{t}"][c], ink[c])
                      and np.array_equal(z[f"r{t}"][c], inr[c]))
            wf, wc, wk = map(np.asarray, _run_xla(scen[c], hp))
            ok_xla = (np.array_equal(inf[c], wf) and np.array_equal(ink[c], wk)
                      and np.array_equal(_track_col_from_out_row(inr[c], k), wc))
            if not (ok_int and ok_xla):
                print(f"trial {t} class {c}: compiled==interp {ok_int}, interp==xla {ok_xla}")
                if not ok_int:
                    d = np.nonzero(z[f"r{t}"][c] != inr[c])[0]
                    print("  out_row diff:", d[:8], "tpu", z[f"r{t}"][c][d[:8]],
                          "int", inr[c][d[:8]])
                    d2 = np.nonzero(z[f"k{t}"][c] != ink[c])[0]
                    print("  det_key diff:", d2[:8], "tpu", z[f"k{t}"][c][d2[:8]],
                          "int", ink[c][d2[:8]])
                    d3 = np.nonzero(z[f"f{t}"][c] != inf[c])[0]
                    print("  det_free diff:", d3[:8])
    print("done")
