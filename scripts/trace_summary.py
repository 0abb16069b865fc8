"""Aggregate a jax.profiler trace into the buckets that matter:

  - self-time by source file:line (top N)
  - self-time by HLO category
  - self-time by bound-by class (HBM / MXU-ish / Unknown)
  - per-bucket achieved GFLOP/s and HBM BW

Usage: python scripts/trace_summary.py <tracedir> [topN]
"""

import glob
import json
import re
import sys
from collections import defaultdict


def rows_from(tmpdir):
    paths = glob.glob(f"{tmpdir}/**/*.xplane.pb", recursive=True)
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tab = json.loads(data)
    if isinstance(tab, list):
        tab = tab[0]
    labels = [c.get("label") or c.get("id") for c in tab["cols"]]
    rows = [[c.get("v") if isinstance(c, dict) else c for c in r["c"]]
            for r in tab["rows"]]
    return labels, rows


def main():
    tmpdir = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    labels, rows = rows_from(tmpdir)
    i = {k: labels.index(k) for k in (
        "HLO op category", "Total self time (us)", "Model GFLOP/s",
        "Measured memory BW (GiB/s)", "Bound by", "Source Info",
        "Framework op name", "#Occurrences")}

    def src(r):
        m = re.search(r"title=''>([^<]*)</div>", str(r[i["Source Info"]]))
        s = m.group(1) if m else ""
        return s.replace("/root/repo/", "") or "(none)"

    by_src = defaultdict(float)
    by_cat = defaultdict(float)
    by_bound = defaultdict(float)
    flops_by_src = defaultdict(float)  # time-weighted GFLOP/s
    tot = 0.0
    for r in rows:
        t = float(r[i["Total self time (us)"]] or 0)
        tot += t
        by_src[src(r)] += t
        by_cat[str(r[i["HLO op category"]])] += t
        by_bound[str(r[i["Bound by"]])] += t
        gf = float(r[i["Model GFLOP/s"]] or 0)
        flops_by_src[src(r)] += t * gf

    print(f"total device self-time: {tot/1e3:.2f} ms\n")
    print("== by HLO category ==")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {v/1e3:8.2f} ms  {k}")
    print("\n== by bound-by ==")
    for k, v in sorted(by_bound.items(), key=lambda kv: -kv[1]):
        print(f"  {v/1e3:8.2f} ms  {k}")
    print(f"\n== by source line (top {top}) ==")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]:
        gf = flops_by_src[k] / v if v else 0
        print(f"  {v/1e3:8.2f} ms  {gf/1e3:7.2f} TF/s  {k}")


if __name__ == "__main__":
    main()
