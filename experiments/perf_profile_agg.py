"""Aggregate the captured trace by op category (device tracks only)."""
import glob
import gzip
import json
import re
from collections import defaultdict

files = sorted(glob.glob("/tmp/jaxprof/**/*.trace.json.gz", recursive=True))
with gzip.open(files[-1], "rt") as f:
    trace = json.load(f)

evs = trace["traceEvents"]
# identify device process ids: process_name metadata containing 'TPU'/'Device'
pids = {}
for e in evs:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in pids.items()
            if "TPU" in n or "Device" in n or "/device" in n.lower()}
print("processes:", pids)

agg = defaultdict(float)
cnt = defaultdict(int)
for e in evs:
    if e.get("ph") != "X" or e.get("pid") not in dev_pids:
        continue
    name = e["name"]
    if name.startswith("while"):      # containers; members counted directly
        continue
    agg[name] += e.get("dur", 0)
    cnt[name] += 1

def cat(name):
    if re.search(r"convolution|dot|matmul", name):
        return "MXU (dot/conv)"
    if re.search(r"copy|bitcast|transpose|dynamic-update|dynamic-slice",
                 name):
        return "data movement"
    if re.search(r"reduce", name):
        return "reduce"
    if re.search(r"fusion", name):
        return "elementwise fusion"
    return "other"

bycat = defaultdict(float)
for n, d in agg.items():
    bycat[cat(n)] += d
tot = sum(bycat.values())
print(f"\ntotal device op time: {tot/3e3:.1f} ms/run (3 runs)")
for c, d in sorted(bycat.items(), key=lambda kv: -kv[1]):
    print(f"{d/3e3:9.2f} ms/run {100*d/tot:5.1f}%  {c}")

print("\ntop 30 device ops (per run):")
for n, d in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{d/3e3:8.2f} ms {cnt[n]//3:5d}x  [{cat(n)[:4]}] {n[:80]}")
