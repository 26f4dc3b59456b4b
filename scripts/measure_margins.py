#!/usr/bin/env python3
"""Class 2b margin audit (dev-only tooling, not part of the shipped lib):
for every hashed column that floors an ENGINE-COMPUTED double fold
(cosine_ppm / sq_sum_ppm / l2_ppm) and every ranking ordered by such a
fold, measure how far the data actually sits from the two flip points:

  - floor margin: min over emitted values of |x*1e6 + 0.5 - nearest_int|
    (a cross-engine 1-ulp fold difference flips the floored value only
    when the argument is within ~1e-10 of an integer boundary);
  - rank-tie margin: min NONZERO |cos_a - cos_b| gap between candidates
    of the same query (an exact tie is safe - broken by corpus_id - but
    a near-tie below fold divergence would flip a rank).

Margins are measured over a SUPERSET of each query's candidate pool
(all query x corpus pairs; all corpus pairs for the near-dup twins
corpus), so the reported minimum is conservative. Fold divergence
between engines/versions is a few ulps (~1e-16 relative, ~1e-10 in ppm
units); a margin orders of magnitude above that certifies the column.

Usage: python3 scripts/measure_margins.py [sfdir ...]
"""
import sys

import duckdb
import numpy as np

DIRS = sys.argv[1:] or [f"/root/testdata/sf{s}" for s in
                        ("0.001", "0.01", "0.1")]


def floor_margin(x):
    """min distance of x*1e6 + 0.5 to its nearest integer."""
    v = x * 1e6 + 0.5
    return float(np.abs(v - np.rint(v)).min())


def report(sfdir):
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sfdir}/embeddings.parquet')"
        " ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in emb])
    m = np.array([r[1] for r in emb], dtype=np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    qmask = ids < 10

    # --- query x corpus cosine pool (t_ann_topk/lsh/ivf/pq_rerank) ---
    q, c = m[qmask], m
    cos = (q @ c.T) / np.outer(norms[qmask], norms)
    self_cols = np.searchsorted(ids, ids[qmask])
    pool = []
    gaps = []
    for i in range(cos.shape[0]):
        row = np.delete(cos[i], self_cols[i])
        pool.append(row)
        s = np.sort(row)
        d = np.diff(s)
        nz = d[d > 0]
        if nz.size:
            gaps.append(nz.min())
    pool = np.concatenate(pool)
    print(f"{sfdir}  ann query-pool ({pool.size} pairs):")
    print(f"  cosine_ppm floor margin: {floor_margin(pool):.3e}")
    print(f"  min nonzero per-query cosine gap: {min(gaps):.3e}")

    # --- near-dup corpus (base + perturbed twins, all pairs) ---
    twins = m[qmask].copy()
    # the engines compute CAST(x * CAST(1.05 AS REAL) AS REAL) — a
    # float32-ROUNDED product; measuring on the unrounded float64 product
    # would certify margins ~1e-8 off the values the engines actually rank
    twins[:, 0] = (twins[:, 0].astype(np.float32) *
                   np.float32(1.05)).astype(np.float64)
    allv = np.vstack([m, twins])
    an = np.sqrt((allv * allv).sum(axis=1))
    cc = (allv @ allv.T) / np.outer(an, an)
    iu = np.triu_indices(cc.shape[0], k=1)
    pairs = cc[iu]
    print(f"  neardup all-pairs ({pairs.size}):")
    print(f"  cosine_ppm floor margin: {floor_margin(pairs):.3e}")
    # threshold is now an exact integer test; distance to 0.95 is
    # informational only
    print(f"  min |cos - 0.95|: {np.abs(pairs - 0.95).min():.3e}")

    # --- vector stats ---
    sq = (m * m).sum(axis=1)
    print(f"  sq_sum_ppm floor margin: {floor_margin(sq):.3e}")
    print(f"  l2_ppm floor margin:     {floor_margin(np.sqrt(sq)):.3e}")


for d in DIRS:
    report(d)
