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


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("trace", help="trace dir (from jax.profiler.trace) or .xplane.pb")
    ap.add_argument("-n", "--top", type=int, default=25)
    ap.add_argument("--frames", type=int, default=None,
                    help="divide times by this frame count (prints us/frame)")
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
