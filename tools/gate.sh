#!/usr/bin/env bash
# The FULL pre-snapshot gate in one command — round 4 shipped 15 broken
# queries because nobody re-ran all of this against current testdata.
#   tools/gate.sh            # compile, test, verify+check sf0.01, bench sf0.1
#   tools/gate.sh --sweep    # additionally: full verify+check at sf0.1
#   tools/gate.sh --sweep --bench3  # record the 3-run median artifact
#                            # (BENCH3.json) instead of a single bench
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/5] sbt compile =="
sbt -batch compile

echo "== [2/5] sbt test =="
sbt -batch test

echo "== [3/5] Verify + DuckDB check @ sf0.01 =="
SPARK_GRAFT_CPUS=8 tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate_sf001
python3 tools/check.py /root/testdata/sf0.01 /tmp/gate_sf001 | tail -2

echo "== [3b/5] plan lint (scale-shape audit over every query plan) =="
tools/run.sh graft.tools.PlanLint | grep planlint

echo "== [3c/5] EXPLAINS.md freshness (every pinned query has a dumped plan) =="
# the round-9 slip: the PIN REGISTRY gained entries but the artifact
# was never regenerated — ExplainPinSpec alone cannot catch that.
python3 - <<'EOF'
import re, subprocess, sys
pins = subprocess.run(
    ["grep", "-oE", '"q[0-9]+[a-z0-9_]*" ->', "src/main/scala/graft/tools/Explain.scala"],
    capture_output=True, text=True).stdout
pinned = set(re.findall(r'"(q[0-9][a-z0-9_]*)"', pins))
dumped = set(re.findall(r'^## (q[0-9][a-z0-9_]*)$', open("EXPLAINS.md").read(), re.M))
missing = pinned - dumped
if missing:
    print(f"STALE EXPLAINS.md: {len(missing)} pinned plans not dumped: {sorted(missing)[:8]}")
    print("run: tools/run.sh graft.tools.Explain")
    sys.exit(1)
print(f"EXPLAINS.md fresh: {len(pinned)} pinned, all dumped")
EOF

if [[ "${1:-}" == "--sweep" ]]; then
  echo "== [4/5] cross-scale Verify + check @ sf0.1 =="
  SPARK_GRAFT_CPUS=16 tools/run.sh graft.Verify /root/testdata/sf0.1 /tmp/gate_sf01
  python3 tools/check.py /root/testdata/sf0.1 /tmp/gate_sf01 | tail -2
else
  echo "== [4/5] (skipped sf0.1 sweep — pass --sweep) =="
fi

if [[ "${1:-}" == "--bench3" || "${2:-}" == "--bench3" ]]; then
  echo "== [5/5] bench3 @ sf0.1 (3 runs, per-query medians + ratio vs recorded tail) =="
  tools/bench3.sh
  echo "== gate complete (bench3 artifact: BENCH3.json) =="
  exit 0
fi

echo "== [5/5] bench @ sf0.1 (watch the q01 canary: ~0.5s quiet) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 tools/run.sh graft.Bench \
  | python3 -c '
import json, sys
# the FULL line (with per-query map); Bench also emits a trailing
# total_summary line for tail-truncating harnesses - skip it here
line = [l for l in sys.stdin if l.startswith("{") and "\"queries\"" in l][-1]
d = json.loads(line)
q = d["queries"]
total, canary = d["value"], q["q01_tpch_q1"]
print(f"total {total:.1f}s over {len(q)} queries; canary q01 {canary:.2f}s")
errs = d.get("errors")
print("errors:", errs if errs else "none")
top = sorted(q.items(), key=lambda kv: -kv[1])[:5]
print("slowest:", ", ".join(f"{k} {v:.1f}s" for k, v in top))
if errs: sys.exit(1)
'
echo "== gate complete =="
