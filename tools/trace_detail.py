"""Detail view: top individual copy/pad/fusion ops with long names from the
most recent /tmp/trace_eval capture."""
import glob, gzip, json
from collections import defaultdict

files = glob.glob("/tmp/trace_eval/**/*.trace.json.gz", recursive=True)
ev = json.load(gzip.open(sorted(files)[-1]))
agg = defaultdict(lambda: [0.0, 0])
for e in ev.get("traceEvents", []):
    if e.get("ph") != "X":
        continue
    args = e.get("args", {})
    if not args or "hlo_category" not in args:
        continue
    c = args.get("hlo_category", "?")
    if c not in ("data formatting", "pad", "concatenate", "custom-call"):
        continue
    ln = args.get("long_name", e.get("name", ""))[:200]
    agg[(c, ln)][0] += e.get("dur", 0) / 1000.0
    agg[(c, ln)][1] += 1
rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
for (c, ln), (ms, n) in rows[:28]:
    print(f"{ms/16:8.3f} ms/iter x{n:4d} {c:16s} {ln}")
