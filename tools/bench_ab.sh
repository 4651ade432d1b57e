#!/usr/bin/env bash
# Same-host A/B bench: interleaved runs of the current HEAD and a prior
# ref (scratch worktree), so round-over-round deltas compare like for
# like. Host state drifts more between rounds than code does — the r11/r12
# committed totals differed +15% while same-host re-runs measured parity —
# so the trend's round column is only meaningful as a RATIO of a same-host
# pair. Output: one compact JSON line (default bench/ab_latest.json),
# which graft.Bench embeds into its own line as "same_host_ab" so the
# round's BENCH artifact carries both numbers.
#
# Usage: tools/bench_ab.sh <prev-ref> [runs-per-side=2] [out=bench/ab_latest.json]
set -euo pipefail
PREV_REF=${1:?usage: bench_ab.sh <prev-ref> [runs-per-side] [out.json]}
RUNS=${2:-2}
OUT=${3:-bench/ab_latest.json}
SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
ROOT=$(git rev-parse --show-toplevel)
CUR_REF=$(git -C "$ROOT" rev-parse --short HEAD)
WT=${BENCH_AB_WORKTREE:-/tmp/bench_ab_prev}

git -C "$ROOT" worktree remove -f "$WT" 2>/dev/null || true
git -C "$ROOT" worktree add -f "$WT" "$PREV_REF" >/dev/null

run_one() { # $1 = repo dir; echoes the bench total (seconds)
  local dir=$1 out
  out=$(mktemp)
  (cd "$dir" && SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_OUT="$out" \
    sbt -batch 'runMain graft.Bench' >/dev/null 2>&1)
  python3 -c "import json;print(json.load(open('$out'))['value'])"
}

echo "compiling prev worktree ($PREV_REF)..." >&2
(cd "$WT" && sbt -batch compile >/dev/null 2>&1)

prev=(); cur=()
for i in $(seq "$RUNS"); do
  # interleave prev/cur so slow host drift hits both sides equally
  p=$(run_one "$WT");   prev+=("$p"); echo "prev[$i]=$p" >&2
  c=$(run_one "$ROOT"); cur+=("$c");  echo "cur[$i]=$c" >&2
done

python3 - "$OUT" "$CUR_REF" "$PREV_REF" "${cur[@]}" -- "${prev[@]}" <<'PYEOF'
import json, sys
out, cur_ref, prev_ref = sys.argv[1:4]
rest = sys.argv[4:]
sep = rest.index("--")
cur = [float(x) for x in rest[:sep]]
prev = [float(x) for x in rest[sep + 1:]]
doc = {
    "cur_ref": cur_ref, "prev_ref": prev_ref,
    "cur_secs": cur, "prev_secs": prev,
    "cur_best": min(cur), "prev_best": min(prev),
    "same_host_ratio": round(min(cur) / min(prev), 4),
}
with open(out, "w") as f:
    f.write(json.dumps(doc, separators=(",", ":")) + "\n")
print(json.dumps(doc, separators=(",", ":")))
PYEOF

git -C "$ROOT" worktree remove -f "$WT"
