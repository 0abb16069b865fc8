"""Print top HLO ops (by self time) from a jax.profiler trace dir.

Usage: python scripts/hlo_stats.py /tmp/jaxprof_step_* [top]
Complements profile_step.py's framework-op view with HLO-level names
(fusion roots carry source metadata), which is what you need to tell
WHICH mul/add_any in the step a hot row actually is.
"""

import glob
import json
import sys


def main():
    tmpdir = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 60
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
    print(labels)
    rows = [[c.get("v") if isinstance(c, dict) else c for c in r["c"]]
            for r in tab["rows"]]
    self_i = next(i for i, l in enumerate(labels)
                  if "self" in str(l).lower() and "time" in str(l).lower()
                  and "%" not in str(l) and "frac" not in str(l).lower())
    rows.sort(key=lambda r: -float(r[self_i] or 0))
    for r in rows[:top]:
        print(r)


if __name__ == "__main__":
    main()
