#!/usr/bin/env python3
"""Merge N BENCH_LATEST.json-style runs into FLOORS.json.

Usage: python3 dev/make_floors.py run1.json run2.json [...] > FLOORS.json

Each input is one full warmed Bench pass on a quiet box; the floor for a
query is the MIN across passes (the least-contended observation is the
closest to the query's true cost). Negative timings (failed queries) are
skipped. The emitted file records the sf it was measured at; Bench only
gates runs whose SPARK_GRAFT_SF_DIR ends with that sf.
"""
import json
import sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
assert runs, "need at least one bench json"
sf = runs[0]["sf"].rstrip("/").split("/")[-1]
for r in runs:
    assert r["sf"].rstrip("/").split("/")[-1] == sf, "sf mismatch across runs"

floors = {}
for r in runs:
    for q, t in r["queries"].items():
        if t <= 0:
            continue
        floors[q] = min(floors.get(q, float("inf")), t)

out = {"sf": sf, "passes": len(runs), "note":
       "per-query quiet-box floors; min across warmed Bench passes; "
       "Bench gates each row at max(floor, 0.3s) so sub-noise trivial "
       "floors cannot flag (r17)",
       **{k: round(v, 3) for k, v in sorted(floors.items())}}
print(json.dumps(out, indent=0))
