"""Summarize a jax.profiler trace: device self-time by op and by category.

Companion to the pipeline's --profile flag (utils/profiling.py) and
stage_bench.py --trace: turns the captured .xplane.pb into the two tables
that actually matter for optimizing this workload on TPU — top HLO ops by
device self time (with their JAX framework-op path and source line) and
self time aggregated by HLO category.

Usage:
    python -m vehicle_counting_tpu.tools.xprof_summary <trace_dir_or_xplane.pb> [-n TOP]

Requires the `xprof` package (bundled with tensorboard-plugin-profile).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import defaultdict


def find_xplane(path: str) -> str:
    if path.endswith(".xplane.pb"):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True))
    if not hits:
        raise SystemExit(f"no .xplane.pb under {path}")
    return hits[-1]  # latest capture


def load_hlo_stats(xplane: str):
    try:
        from xprof.convert import raw_to_tool_data as r
    except ImportError as e:  # pragma: no cover - env without xprof
        raise SystemExit(f"xprof not available: {e}")
    data, _ = r.xspace_to_tool_data([xplane], "hlo_stats", {})
    j = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["label"] for c in j["cols"]]
    rows = [[c.get("v") for c in row["c"]] for row in j["rows"]]
    return cols, rows


_V5E_BF16_TFLOPS = 197.0  # MXU peak, one v5e chip
_SHAPE_RE = re.compile(r"(bf16|f32|f16|s8|u8|s32)\[([\d,]*)\]")


def _parse_conv_flops(expr: str):
    """(flops_per_exec, lhs_shape, rhs_shape) from an HLO conv expression.

    Expression shapes appear as `out = conv(lhs, rhs)`; XLA conv FLOPs =
    2 * prod(out spatial+batch+out_ch) * (kernel spatial * in_ch). We parse
    the first three typed shapes (out, lhs, rhs): rhs is the kernel
    [kh, kw, ci, co] (HWIO) or a layout thereof; out gives positions.
    """
    shapes = _SHAPE_RE.findall(expr or "")
    if len(shapes) < 3:
        return None
    dims = [
        [int(x) for x in s.split(",") if x] for _, s in shapes[:3]
    ]
    out, _lhs, ker = dims
    if len(ker) < 3 or not out:
        return None
    import numpy as _np

    # conv FLOPs: every output element does prod(kernel dims except
    # out-channels) MACs; out-channels is the kernel dim matching an out dim
    ker_sorted = sorted(ker)
    co = None
    for d in ker:
        if d in out:
            co = d
    if co is None:
        co = ker_sorted[-1]
    macs = float(_np.prod(out)) * float(_np.prod(ker)) / float(co)
    return 2.0 * macs, dims[1], ker


def print_conv_roofline(cols, rows, div, unit):
    i_self = cols.index("Total self time (us)")
    i_cat = cols.index("HLO op category")
    i_occ = cols.index("#Occurrences")
    i_expr = cols.index("HLO op text")
    i_gf = cols.index("Model GFLOP/s") if "Model GFLOP/s" in cols else None
    i_bound = cols.index("Bound by") if "Bound by" in cols else None
    i_hbm = cols.index("HBM BW (GiB/s)") if "HBM BW (GiB/s)" in cols else None
    print("\n== convolution roofline (v5e bf16 peak 197 TFLOP/s) ==")
    total_t = 0.0
    total_fl = 0.0
    items = []
    for row in rows:
        if "convolution" not in str(row[i_cat]):
            continue
        t_us = row[i_self] or 0
        occ = row[i_occ] or 1
        parsed = _parse_conv_flops(str(row[i_expr] or ""))
        if not parsed or t_us <= 0:
            items.append((t_us, None, row))
            continue
        flops_exec, lhs, ker = parsed
        tflops = flops_exec * occ / (t_us * 1e-6) / 1e12
        total_t += t_us
        total_fl += flops_exec * occ
        items.append((t_us, (tflops, lhs, ker), row))
    items.sort(key=lambda x: -x[0])
    for t_us, info, row in items[:20]:
        extra = ""
        if i_gf is not None and row[i_gf]:
            extra += f" xprof={row[i_gf] / 1000.0:6.1f}TF/s"
        if i_hbm is not None and row[i_hbm]:
            extra += f" hbm={row[i_hbm]:6.0f}GiB/s"
        if i_bound is not None and row[i_bound]:
            extra += f" bound={row[i_bound]}"
        if info:
            tflops, lhs, ker = info
            pct = 100.0 * tflops / _V5E_BF16_TFLOPS
            print(
                f"  {t_us / div:9.1f} {unit}  {tflops:7.1f} TF/s ({pct:5.1f}%)"
                f"  lhs={lhs} ker={ker}{extra}"
            )
        else:
            print(
                f"  {t_us / div:9.1f} {unit}  (unparsed){extra} "
                f"{str(row[i_expr])[:70]}"
            )
    if total_t:
        agg = total_fl / (total_t * 1e-6) / 1e12
        print(
            f"  ALL convs: {total_t / div:.1f} {unit}, {agg:.1f} TF/s "
            f"({100.0 * agg / _V5E_BF16_TFLOPS:.1f}% of peak)"
        )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("trace", help="trace dir (from jax.profiler.trace) or .xplane.pb")
    ap.add_argument("-n", "--top", type=int, default=25)
    ap.add_argument("--frames", type=int, default=None,
                    help="divide times by this frame count (prints us/frame)")
    ap.add_argument("--convs", action="store_true",
                    help="per-convolution roofline table: parse shapes from "
                    "the HLO expression, print achieved TFLOP/s and %% of "
                    "the v5e bf16 MXU peak per distinct conv shape")
    args = ap.parse_args(argv)

    xplane = find_xplane(args.trace)
    cols, rows = load_hlo_stats(xplane)
    i_self = cols.index("Total self time (us)")
    i_name = cols.index("HLO op name")
    i_cat = cols.index("HLO op category")
    i_occ = cols.index("#Occurrences")
    i_fw = cols.index("Framework op name")
    i_src = cols.index("Source Info")

    div = args.frames or 1
    unit = "us/frame" if args.frames else "us"
    total = sum(r[i_self] or 0 for r in rows)
    print(f"{xplane}\ntotal device self time: {total / div:.1f} {unit}\n")

    bycat = defaultdict(float)
    for row in rows:
        bycat[row[i_cat]] += row[i_self] or 0
    print("== by HLO category ==")
    for c, t in sorted(bycat.items(), key=lambda kv: -kv[1]):
        if t / total > 0.005:
            print(f"  {t / div:10.1f} {unit}  {c}")

    print("\n== by source line (top 30) ==")
    byline = defaultdict(float)
    for row in rows:
        src = re.search(r"title='([^']*)'", str(row[i_src] or ""))
        key = (src.group(1).splitlines() or [""])[0] if src else "(unattributed)"
        byline[key] += row[i_self] or 0
    for k, t in sorted(byline.items(), key=lambda kv: -kv[1])[:30]:
        if t / total > 0.003:
            print(f"  {t / div:10.1f} {unit}  {k}")

    if args.convs:
        print_conv_roofline(cols, rows, div, unit)

    print(f"\n== top {args.top} ops by self time ==")
    rows.sort(key=lambda r: -(r[i_self] or 0))
    for row in rows[: args.top]:
        src = re.search(r"title='([^']*)'", str(row[i_src] or ""))
        src_line = (src.group(1).splitlines() or [""])[0] if src else ""
        fw = str(row[i_fw] or "")
        # keep the tail of the fw path - the leading jit/while prefix repeats
        fw = "/".join(fw.split("/")[-3:])
        print(
            f"  {(row[i_self] or 0) / div:9.1f} {unit} x{row[i_occ]:7.0f}"
            f"  {str(row[i_name])[:34]:34s} {fw[:60]:60s} {src_line}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
