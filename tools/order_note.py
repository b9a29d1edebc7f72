#!/usr/bin/env python3
"""Bench-order independence check (VERDICT r11 item 8): given a forward-
sorted run (target/BENCH_runA.json) and a reverse-sorted run
(target/BENCH_runR.json) of the identical build, measure how much each
query's number moves with run order (neighbor GC-debt effects), and merge
an `order_note` section into VARIANCE.json."""
import json

fwd = json.load(open("target/BENCH_runFwd.json"))
rev = json.load(open("target/BENCH_runR.json"))
qa, qr = fwd["queries"], rev["queries"]
common = sorted(set(qa) & set(qr))
rows = {}
spreads = []
for q in common:
    a, r = qa[q], qr[q]
    m = min(a, r)
    spread = abs(a - r) / m if m > 0 else 0.0
    spreads.append((spread, q))
    rows[q] = {"fwd": round(a, 4), "rev": round(r, 4),
               "rel_spread": round(spread, 4)}
spreads.sort(reverse=True)

var = json.load(open("VARIANCE.json"))
p90_same_order = var.get("p90_query_rel_spread")
vals = sorted(s for s, _ in spreads)
order_p90 = vals[int(len(vals) * 0.9)]
order_median = vals[len(vals) // 2]
beyond = [q for s, q in spreads if p90_same_order and s > p90_same_order]
var["order_note"] = {
    "protocol": "one reverse-sorted Bench run (SPARK_GRAFT_BENCH_ORDER="
                "reverse) diffed against the forward-sorted run of the "
                "identical build, back-to-back on the same machine; both "
                "under the FIXED-ORDER protocol (every pass same order) - "
                "this experiment is what motivated switching the standard "
                "protocol to per-pass randomized order in r12",
    "median_order_spread": round(order_median, 4),
    "p90_order_spread": round(order_p90, 4),
    "p90_same_order_spread_for_reference": p90_same_order,
    "queries_beyond_same_order_p90": beyond,
    "conclusion": ("ordering moves some queries beyond the same-order p90 "
                   "band - per-query numbers inherit neighbor GC debt; "
                   "totals are the robust comparable"
                   if beyond else
                   "ordering effects sit inside the same-order noise band; "
                   "the sorted-order protocol stands"),
    "worst": {q: rows[q] for _, q in spreads[:8]},
}
json.dump(var, open("VARIANCE.json", "w"), indent=1)
print(json.dumps(var["order_note"], indent=1))
