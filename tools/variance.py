#!/usr/bin/env python3
"""Build VARIANCE.json from two back-to-back Bench runs of the identical
build (target/BENCH_runA.json, target/BENCH_runB.json): per-query spread
between the two min-of-3 results, plus the comparison against the last
COMMITTED BENCH_FULL numbers (label: prev), to establish the noise band that
makes round-over-round deltas interpretable."""
import json, subprocess, sys

runA = json.load(open("target/BENCH_runA.json"))
runB = json.load(open("target/BENCH_runB.json"))

# previous round's committed table (pre-variance-experiment HEAD)
prev_ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
prev_raw = subprocess.run(
    ["git", "show", f"{prev_ref}:BENCH_FULL.json"], capture_output=True, text=True)
prev = json.loads(prev_raw.stdout)["queries"] if prev_raw.returncode == 0 else {}

qa, qb = runA["queries"], runB["queries"]
common = sorted(set(qa) & set(qb))
rows = {}
spreads = []
for q in common:
    a, b = qa[q], qb[q]
    m = min(a, b)
    spread = abs(a - b) / m if m > 0 else 0.0
    spreads.append(spread)
    rows[q] = {
        "runA": round(a, 4), "runB": round(b, 4),
        "rel_spread": round(spread, 4),
        **({"prev": prev[q], "delta_vs_prev": round((m - prev[q]) / prev[q], 4)}
           if q in prev else {}),
    }

ta, tb = runA["value"], runB["value"]
tprev = sum(prev.values()) if prev else None
out = {
    "prev_note": f"prev = committed BENCH_FULL at {prev_ref}; quantiles "
                 "re-measured at r18 HEAD over the 167-query table on THIS "
                 "round's container (runA/runB = back-to-back exclusive 32g "
                 "runs late in the r18 session). NOTE the r18 container "
                 "QUIETED through the session - earlier exclusive full runs "
                 "measured 161.0 and 145.6 s vs runA's 139.8 - so same-day "
                 "adjacent-run spreads (below) are the floor, and "
                 "hours-apart drift on this instance class can reach ~15 "
                 "pct uniformly. Read spreads (same-container, adjacent) "
                 "for the noise band, not delta_vs_prev (cross-container).",
    "protocol": "two back-to-back exclusive `runMain graft.Bench` runs of the "
                "identical build, cpus=32, each min-of-3 after untimed warmup",
    "total_runA_sec": round(ta, 2),
    "total_runB_sec": round(tb, 2),
    "total_rel_spread": round(abs(ta - tb) / min(ta, tb), 4),
    "median_query_rel_spread": round(sorted(spreads)[len(spreads) // 2], 4),
    "p90_query_rel_spread": round(sorted(spreads)[int(len(spreads) * 0.9)], 4),
    **({"total_prev_sec": round(tprev, 2),
        "delta_best_vs_prev": round((min(ta, tb) - tprev) / tprev, 4)}
       if tprev else {}),
    "queries": rows,
}
json.dump(out, open("VARIANCE.json", "w"), indent=1)
print(json.dumps({k: v for k, v in out.items() if k != "queries"}, indent=1))
worst = sorted(common, key=lambda q: -rows[q]["rel_spread"])[:8]
for q in worst:
    print(q, rows[q])
