#!/usr/bin/env python3
"""Fold SCALE_CHECK_X100.json rows (the targeted two-decade mode,
SPARK_GRAFT_SCALE_X100) into SCALE_CHECK.json's x100 section, the
merge_x1000.py discipline one decade down. Existing rows for the same
query are replaced; the protocol note records that post-full-run rows
may come from targeted refreshes (measured exclusively at the
then-current HEAD, with the sf0.1 baseline re-measured in the same
session so each row stays internally paired)."""
import json

full = json.load(open("SCALE_CHECK.json"))
part = json.load(open("SCALE_CHECK_X100.json"))

x = full.setdefault("x100", {"reps": 100, "queries": {}})
x["queries"].update(part["queries"])
NOTE = (
    " Rows refreshed after the full run come from the targeted "
    "SPARK_GRAFT_SCALE_X100 mode (SCALE_CHECK_X100.json is the raw "
    "artifact), measured exclusively at the then-current HEAD with the "
    "sf0.1 baseline re-measured in the same session — each row is "
    "internally paired even when the HEAD differs from the full "
    "table's; default lz4 codec, shuffle MB comparable.")
if NOTE not in x.get("protocol", ""):
    x["protocol"] = x.get("protocol", "") + NOTE

json.dump(full, open("SCALE_CHECK.json", "w"))
print("merged:", ", ".join(sorted(part["queries"])))
