#!/usr/bin/env python3
"""Generate src/test/resources/difflib_ratios.parquet: CPython
difflib.SequenceMatcher ratios for every pair over the (fixed, categorical)
TPC-H o_orderpriority domain plus the 'X'-appended perturbations used by the
v_diff_string_fuzzy workload.

The fixture lets DuckDB oracle-check the fuzzy-diff operator without being
able to express difflib in SQL: the oracle joins (check_first, check_second)
against this table. Valid at ANY scale factor because the value domain is
fixed. Regenerate with: python3 scripts/gen_difflib_fixture.py
(Dev-only tooling; the fixture parquet is committed.)
"""
import difflib
import os

import pandas as pd

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
DOMAIN = PRIORITIES + [p + "X" for p in PRIORITIES]

rows = [
    {"a": a, "b": b, "ratio": difflib.SequenceMatcher(None, a, b).ratio()}
    for a in DOMAIN
    for b in DOMAIN
]

out = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "difflib_ratios.parquet")
os.makedirs(os.path.dirname(out), exist_ok=True)
pd.DataFrame(rows).to_parquet(out, index=False)
print(f"wrote {len(rows)} pairs to {out}")
