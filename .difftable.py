"""Shared-row bench diff table with canary normalization (verdict ask
#2): join two bench JSONs, print a markdown table of per-query ratios,
raw and normalized by the sessions' long-canary means."""
import json
import sys

a = json.load(open(sys.argv[1]))   # start (prev)
b = json.load(open(sys.argv[2]))   # end (now)


def canary(d):
    vals = [d.get("calibration_long_sec"), d.get("calibration_long_end_sec")]
    vals = [v for v in vals if isinstance(v, (int, float))]
    return sum(vals) / len(vals) if vals else None


ca, cb = canary(a), canary(b)
# if the END session's canary is slower, its rows are inflated and the
# true speedup is HIGHER than raw: speedup_norm = raw * (cb / ca)
norm = (cb / ca) if (ca and cb) else 1.0
qa, qb = a["queries"], b["queries"]
shared = [k for k in qa if k in qb
          and isinstance(qa[k], (int, float))
          and isinstance(qb[k], (int, float))]
rows = []
for k in shared:
    raw = qa[k] / qb[k] if qb[k] else None
    rows.append((k, qa[k], qb[k], raw, raw * norm if raw else None))
rows.sort(key=lambda r: -(r[3] or 0))
import math
g = math.exp(sum(math.log(r[3]) for r in rows if r[3]) / len(rows))
gn = math.exp(sum(math.log(r[4]) for r in rows if r[4]) / len(rows))
print(f"| query | start s | end s | speedup | canary-norm |")
print("|---|---|---|---|---|")
for k, s, e, raw, n in rows:
    if raw and (raw > 1.1 or raw < 0.9):
        print(f"| {k} | {s:.3f} | {e:.3f} | {raw:.2f} | {n:.2f} |")
print(f"\nshared rows: {len(rows)}; geomean raw {g:.3f}, "
      f"canary-normalized {gn:.3f} (canary start {ca:.2f}s end {cb:.2f}s, "
      f"norm factor {norm:.3f})")
print(f"totals: start {a['value']} end {b['value']} "
      f"(end has {len(qb)} rows vs {len(qa)})")
new = [k for k in qb if k not in qa]
if new:
    print("new rows:", {k: qb[k] for k in new})
