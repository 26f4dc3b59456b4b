#!/usr/bin/env python3
"""Generate src/test/resources/linkage_ratios.parquet: CPython
difflib.SequenceMatcher ratios for every (dirty nation name, clean nation
name) pair used by the t_linkage record-linkage workload.

The nation table is fixed (25 rows, NATION_0..NATION_24) at every scale
factor, and the dirty variants are a deterministic in-query perturbation
(underscore removed), so the pair universe is closed and SF-independent.
The fixture lets the DuckDB oracle join exact CPython ratios instead of
expressing difflib in SQL (same approach as difflib_ratios.parquet).
Regenerate with: python3 scripts/gen_linkage_fixture.py
(Dev-only tooling; the fixture parquet is committed.)
"""
import difflib
import os

import pandas as pd

CLEAN = [f"NATION_{i}" for i in range(25)]
DIRTY = [c.replace("_", "") for c in CLEAN]

rows = [
    {"a": a, "b": b, "ratio": difflib.SequenceMatcher(None, a, b).ratio()}
    for a in DIRTY
    for b in CLEAN
]

out = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "linkage_ratios.parquet")
os.makedirs(os.path.dirname(out), exist_ok=True)
pd.DataFrame(rows).to_parquet(out, index=False)
print(f"wrote {len(rows)} pairs to {out}")
