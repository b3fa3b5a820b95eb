"""Parse the captured .trace.json.gz files: per-lane totals + top ops."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "prof")


def summarize(tag, top=45):
    files = glob.glob(os.path.join(BASE, tag, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print(f"{tag}: no trace found")
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    pid_name = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "?")
    lane_tot = defaultdict(float)
    op_tot = defaultdict(float)
    op_cnt = defaultdict(int)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            lane = pid_name.get(ev.get("pid"), "?")
            lane_tot[lane] += ev["dur"]
            if "TPU" in lane or "tpu" in lane.lower():
                op_tot[ev.get("name", "?")] += ev["dur"]
                op_cnt[ev.get("name", "?")] += 1
    print(f"=== {tag} ===")
    for lane, us in sorted(lane_tot.items(), key=lambda kv: -kv[1]):
        print(f"  lane {lane}: {us:.0f} us")
    dev_total = sum(op_tot.values())
    print(f"  device op total: {dev_total:.0f} us over 4 steps "
          f"=> {dev_total/4:.0f} us/step")
    for name, us in sorted(op_tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us/4:9.1f} us/step x{op_cnt[name]//4:4d}  {name[:100]}")


if __name__ == "__main__":
    for tag in sys.argv[1:] or ["polar", "cholqr1"]:
        summarize(tag)
