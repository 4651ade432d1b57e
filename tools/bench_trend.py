#!/usr/bin/env python3
"""Build the per-query bench trend table (BASELINE.md appendix) from the
driver's BENCH_r{N}.json snapshots plus a local current-round run.

Usage: tools/bench_trend.py BENCH_r05.json BENCH_r06.json bench/r7.json
Committed bench artifacts (bench/r{N}.json, written by graft.Bench itself)
are full JSON lines and parse directly. The driver's BENCH_r{N}.json
snapshots store a front-truncated "tail" of the same line; per-query
entries are recovered by regex, so such a round may be missing its first
few queries (rendered as "-").
"""
import json
import re
import sys

PAIR = re.compile(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)')


def load(path):
    with open(path) as f:
        text = f.read()
    out = {}
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and isinstance(doc.get("queries"), dict):
            return {k: float(v) for k, v in doc["queries"].items()}
        text = doc.get("tail", "") if isinstance(doc, dict) else ""
    except json.JSONDecodeError:
        pass
    for name, sec in PAIR.findall(text):
        # skip envelope fields that match the pattern
        if name in ("value", "sf"):
            continue
        out[name] = float(sec)
    return out


def load_ab(path):
    """The same-host A/B pair embedded by graft.Bench (tools/bench_ab.sh):
    the only round-over-round comparison that controls for host state."""
    try:
        with open(path) as f:
            doc = json.load(f)
        ab = doc.get("same_host_ab") if isinstance(doc, dict) else None
        return ab if isinstance(ab, dict) else None
    except (json.JSONDecodeError, OSError):
        return None


def main():
    paths = sys.argv[1:]
    rounds = [(re.sub(r".*BENCH_|.*bench_|.*/|\.json|_local", "", p) or p,
               load(p)) for p in paths]
    names = sorted({n for _, qs in rounds for n in qs},
                   key=lambda n: -rounds[-1][1].get(n, 0.0))
    header = "| query | " + " | ".join(label for label, _ in rounds) + " |"
    print(header)
    print("|" + "---|" * (len(rounds) + 1))
    for n in names:
        cells = " | ".join(
            f"{qs[n]:.2f}" if n in qs else "-" for _, qs in rounds)
        print(f"| {n} | {cells} |")
    totals = " | ".join(f"{sum(qs.values()):.1f}" for _, qs in rounds)
    counts = " / ".join(str(len(qs)) for _, qs in rounds)
    print(f"| **total (visible)** | {totals} |")
    print(f"(queries visible per round: {counts})")
    for path in paths:
        ab = load_ab(path)
        if ab:
            print(f"(same-host Δ in {path}: {ab['cur_ref']} = "
                  f"{ab['same_host_ratio']:.2f}× of {ab['prev_ref']} — "
                  f"best {ab['cur_best']:.1f}s vs {ab['prev_best']:.1f}s, "
                  f"interleaved on one host; trust this ratio over the "
                  f"raw cross-host columns)")


if __name__ == "__main__":
    main()
