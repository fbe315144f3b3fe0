#!/usr/bin/env python3
"""Build SOAK_r{N}.json — the per-round scale artifact of record:
the soak's machine-readable per-key task ratios (soak.json, written by
graft.Soak) joined with the PREVIOUS round's ratios so scale
regressions gate like wall regressions.

Usage: tools/soak_artifact.py <round> [<prev SOAK.md or SOAK_r{N-1}.json>]
"""
import json, re, sys

rnd = int(sys.argv[1])
prev_path = sys.argv[2] if len(sys.argv) > 2 else None

cur = json.load(open("soak.json"))

prev = {}
if prev_path:
    if prev_path.endswith(".json"):
        pj = json.load(open(prev_path))
        prev = {k: (v.get("cpu_ratio"), v.get("task_ratio"))
                for k, v in pj.get("keys", {}).items()}
    else:
        # parse the markdown ratio table: | key | 1x | 10x | R.Rx | ...
        for line in open(prev_path):
            m = re.match(r"\|\s*(\S+)\s*\|\s*(\d+)\s*\|\s*(\d+)\s*\|\s*([\d.]+)", line)
            if m:
                prev[m.group(1)] = float(m.group(4))

out = {"round": rnd, "heap_mb": cur.get("heap_mb"), "n_failed": cur.get("n_failed"),
       "protocol": ("each (key, scale) measured twice post-warmup, min-task run kept; "
                    "executorCpuTime (deschedule-immune) recorded per key and cpu_ratio "
                    "is the scale gate once both rounds carry it. task_ratio deltas "
                    "against a pre-cpu round reflect the protocol change too (quieter "
                    "1x denominators), not necessarily 10x regressions — read them "
                    "next to cpu_ratio."),
       "keys": {}}
for k, v in sorted(cur["keys"].items()):
    e = dict(v)
    # Gate on cpu_ratio when the previous round recorded it
    # (executorCpuTime, deschedule-immune); fall back to task_ratio
    # against rounds that predate the cpu metric.
    if k in prev and prev[k]:
        pc, pt = prev[k] if isinstance(prev[k], tuple) else (None, prev[k])
        if pc and v.get("cpu_ratio"):
            e["prev_cpu_ratio"] = pc
            e["ratio_delta"] = round(v["cpu_ratio"] - pc, 2)
        elif pt and v.get("task_ratio"):
            e["prev_task_ratio"] = pt
            e["ratio_delta"] = round(v["task_ratio"] - pt, 2)
    out["keys"][k] = e

path = f"SOAK_r{rnd:02d}.json"
json.dump(out, open(path, "w"), indent=1)
worse = [(k, v["ratio_delta"]) for k, v in out["keys"].items()
         if v.get("ratio_delta", 0) > 2.0]
print(f"wrote {path}; {len(out['keys'])} keys; ratio regressions >2.0: {worse or 'none'}")
