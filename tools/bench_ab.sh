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
# The pair reports TWO ratios (r14 judge finding: comparing totals across
# different query sets conflates code delta with battery growth):
#  - gross_ratio: best cur total / best prev total — what a user pays;
#  - carried_ratio: the same ratio over the INTERSECTION of query names
#    (infrastructure lines `_warmup`/`_mart_build` excluded), so rows the
#    prev side doesn't run cannot masquerade as a code regression. The
#    pair also itemizes new/dropped rows and the per-side `_mart_build`
#    (whose content may legitimately differ — shared builds move between
#    rounds by design).
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
RUNDIR=$(mktemp -d)

git -C "$ROOT" worktree remove -f "$WT" 2>/dev/null || true
git -C "$ROOT" worktree add -f "$WT" "$PREV_REF" >/dev/null

run_one() { # $1 = repo dir, $2 = output json path (kept for the diff)
  (cd "$1" && SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_OUT="$2" \
    sbt -batch 'runMain graft.Bench' >/dev/null 2>&1)
  python3 -c "import json;print(json.load(open('$2'))['value'])"
}

echo "compiling prev worktree ($PREV_REF)..." >&2
(cd "$WT" && sbt -batch compile >/dev/null 2>&1)

for i in $(seq "$RUNS"); do
  # interleave prev/cur so slow host drift hits both sides equally
  p=$(run_one "$WT" "$RUNDIR/prev_$i.json");  echo "prev[$i]=$p" >&2
  c=$(run_one "$ROOT" "$RUNDIR/cur_$i.json"); echo "cur[$i]=$c" >&2
done

python3 - "$OUT" "$CUR_REF" "$PREV_REF" "$RUNDIR" "$RUNS" <<'PYEOF'
import json, sys
out, cur_ref, prev_ref, rundir, runs = sys.argv[1:6]

def load(side):
    docs = [json.load(open(f"{rundir}/{side}_{i}.json"))
            for i in range(1, int(runs) + 1)]
    best = min(docs, key=lambda d: d["value"])  # best run per side
    return [d["value"] for d in docs], best

prev_secs, prev_best = load("prev")
cur_secs, cur_best = load("cur")

infra = {"_warmup", "_mart_build"}
pq, cq = prev_best["queries"], cur_best["queries"]
carried = sorted((set(pq) & set(cq)) - infra)
carried_cur = sum(cq[q] for q in carried)
carried_prev = sum(pq[q] for q in carried)

# per-query MIN across each side's runs: on a host whose per-row
# attribution swings several-fold between runs (r15: one row 3.9 -> 19.4 s
# run-over-run at a stable total), a best-TOTAL run still carries other
# rows' unlucky draws; the min-per-row envelope converges on the code's
# actual floor much faster, so the pair reports this ratio alongside
def minq(side):
    docs = [json.load(open(f"{rundir}/{side}_{i}.json"))["queries"]
            for i in range(1, int(runs) + 1)]
    return {q: min(d[q] for d in docs) for q in docs[0]}
pmin, cmin = minq("prev"), minq("cur")
carried_cur_min = sum(cmin[q] for q in carried)
carried_prev_min = sum(pmin[q] for q in carried)
new_q = sorted(set(cq) - set(pq) - infra)
dropped_q = sorted(set(pq) - set(cq) - infra)

doc = {
    "cur_ref": cur_ref, "prev_ref": prev_ref,
    "cur_secs": cur_secs, "prev_secs": prev_secs,
    "cur_best": min(cur_secs), "prev_best": min(prev_secs),
    "gross_ratio": round(min(cur_secs) / min(prev_secs), 4),
    # kept as an alias so older trend tooling keeps reading the pair
    "same_host_ratio": round(min(cur_secs) / min(prev_secs), 4),
    # None (JSON null) when the intersection is empty/all-zero — e.g. a
    # prev ref whose rows all errored; never a ZeroDivisionError after
    # both sides' expensive runs already happened
    "carried_ratio": (round(carried_cur / carried_prev, 4)
                      if carried_prev > 0 else None),
    "carried_n": len(carried),
    "carried_cur_sec": round(carried_cur, 2),
    "carried_prev_sec": round(carried_prev, 2),
    "carried_minq_ratio": (round(carried_cur_min / carried_prev_min, 4)
                           if carried_prev_min > 0 else None),
    "carried_minq_cur_sec": round(carried_cur_min, 2),
    "carried_minq_prev_sec": round(carried_prev_min, 2),
    "new_queries": {q: round(cq[q], 2) for q in new_q},
    "dropped_queries": {q: round(pq[q], 2) for q in dropped_q},
    "mart_build": {"cur": round(cq.get("_mart_build", 0.0), 2),
                   "prev": round(pq.get("_mart_build", 0.0), 2)},
}
with open(out, "w") as f:
    f.write(json.dumps(doc, separators=(",", ":")) + "\n")
print(json.dumps(doc, separators=(",", ":")))
PYEOF

# keep the per-run JSONs beside the pair: the per-query diff is the
# round's diagnosis surface, and a swept rundir made it unrecoverable
KEEP="${OUT%.json}_runs"
rm -rf "$KEEP"; mkdir -p "$KEEP"; cp "$RUNDIR"/*.json "$KEEP"/ || true
rm -rf "$RUNDIR"
git -C "$ROOT" worktree remove -f "$WT"
