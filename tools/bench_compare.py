#!/usr/bin/env python3
"""Compare a Bench output (or BENCH_LAST.json) against a reference
artifact (BENCH3.json medians or a driver BENCH_r*.json tail).

  python3 tools/bench_compare.py <bench_out_or_json> <ref> [topN]

Prints total/canary, median per-query ratio over shared queries with
ref >= 50 ms, the worst/best movers, and the slowest queries now.
"""
import json, re, sys, statistics

def load_queries(path):
    txt = open(path).read()
    try:
        d = json.loads(txt)
        if "queries" in d:
            return {q: float(v) for q, v in d["queries"].items()}, d
    except ValueError:
        pass
    # raw bench stdout: take the last full line with a queries map
    lines = [l for l in txt.splitlines()
             if l.startswith("{") and '"queries"' in l]
    if lines:
        d = json.loads(lines[-1])
        return {q: float(v) for q, v in d["queries"].items()}, d
    # fallback: regex scrape (driver tail)
    q = {m.group(1): float(m.group(2)) for m in re.finditer(
        r'"(q[0-9]+[a-z0-9_]*)"\s*:\s*([0-9]+\.[0-9]+)',
        txt.replace('\\"', '"'))}
    return q, {}

now, dnow = load_queries(sys.argv[1])
ref, _ = load_queries(sys.argv[2])
topn = int(sys.argv[3]) if len(sys.argv) > 3 else 12

total = sum(now.values())
print(f"now: {total:.1f}s over {len(now)} queries; "
      f"canary q01 {now.get('q01_tpch_q1', -1):.3f}")
shared = [q for q in now if q in ref and ref[q] >= 0.05]
if shared:
    ratios = sorted((now[q] / ref[q], q) for q in shared)
    med = ratios[len(ratios) // 2][0]
    print(f"shared {len(shared)} (ref>=50ms): median ratio {med:.3f}")
    print("best movers:")
    for r, q in ratios[:topn]:
        print(f"  {q}: {ref[q]:.2f} -> {now[q]:.2f}  ({r:.2f}x)")
    print("worst movers:")
    for r, q in ratios[-topn:]:
        print(f"  {q}: {ref[q]:.2f} -> {now[q]:.2f}  ({r:.2f}x)")
print("slowest now:")
for q, v in sorted(now.items(), key=lambda kv: -kv[1])[:topn]:
    print(f"  {q}: {v:.2f}s" + (f"  (ref {ref[q]:.2f})" if q in ref else ""))
