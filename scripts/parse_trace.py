"""Summarize a jax.profiler trace into per-kernel device times.

Usage:
    python scripts/parse_trace.py <trace_dir> [n_iters]

where <trace_dir> is the directory passed to ``jax.profiler.trace`` (the
script finds ``plugins/profile/*/ *.trace.json.gz`` under it) and
``n_iters`` divides the totals into per-iteration costs (default 1).

Works through the remote-TPU tunnel: the profile plugin still writes a
parseable Perfetto-style JSON. Events are filtered to the TPU device
pid, grouped by kernel name, and printed by descending total time —
this is how the round-2 decode/train bottlenecks (unfused pad/slice
chains, reduce-window cumsums, vmapped-dynamic-slice while loops) were
found; see CLAUDE.md "TPU lowering facts".
"""

import collections
import glob
import gzip
import json
import sys


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    trace_dir = sys.argv[1]
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print(f"no *.trace.json.gz under {trace_dir}/plugins/profile/")
        return 1
    data = json.load(gzip.open(paths[-1]))
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    by = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            by[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    print(f"{paths[-1]}  (totals / {n_iters} iters)")
    for name, dur in sorted(by.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur / 1e3 / n_iters:9.3f} ms  x{cnt[name]:5d}  {name[:80]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
