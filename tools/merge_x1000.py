#!/usr/bin/env python3
"""Fold SCALE_CHECK_X1000.json rows (the targeted three-decade mode,
SPARK_GRAFT_SCALE_X1000) into SCALE_CHECK.json's x1000 section, so the
full artifact stays the one place scale evidence lives. Existing rows
for the same query are replaced; the x1000 protocol note records that
rows may come from targeted runs. Notes carried by the targeted
artifact (e.g. the gr_pagerank scaled-twin note) merge into the top
"notes" object under the query name prefixed 'x1000_'."""
import json, sys

full = json.load(open("SCALE_CHECK.json"))
part = json.load(open("SCALE_CHECK_X1000.json"))

x = full.setdefault("x1000", {"reps": 1000, "queries": {}})
x["queries"].update(part["queries"])
x["protocol"] = (
    "per-query table synthesis (each three-decade candidate touches one "
    "fact table); same purge + noop-sink + min-of-3 sf0.1 / min-of-2 "
    "x1000 protocol as the x10/x100 tables; slope is "
    "log(t_x1000/t_sf01)/log(1000). Rows added after r19 come from the "
    "targeted SPARK_GRAFT_SCALE_X1000 mode (SCALE_CHECK_X1000.json is "
    "the raw artifact), measured exclusively at the then-current HEAD; "
    "sf0.1 baselines are re-measured in the same session, so each row "
    "is internally paired even when the HEAD differs from the full "
    "table's.")
for name, note in part.get("notes", {}).items():
    full.setdefault("notes", {})["x1000_" + name] = note

json.dump(full, open("SCALE_CHECK.json", "w"))
print("merged:", ", ".join(sorted(part["queries"])))
