"""Distributed skyline (Pareto frontier) operator.

Multi-objective curation keeps the documents no other document beats
on EVERY axis at once (longer AND more lexically diverse AND
higher-quality…): the skyline of the metric space. One axis alone
over-selects its extreme; the skyline is the set every monotone
scoring function's argmax lives in, so it is the right shortlist when
the final quality weighting is still undecided (the
"don't-commit-to-a-mixture-yet" stage of corpus assembly).

Algorithm — the classic two-phase distributed skyline:

1. LOCAL phase (``mapInPandas``, narrow — NO shuffle): each Arrow
   batch is reduced to its local skyline. Sound because dominance is
   transitive and batch-local: a point dominated within its batch is
   dominated globally, so filtering it early never removes a skyline
   member; ``skyline(∪ batch skylines) = skyline(all)``.
2. GLOBAL phase: the surviving candidates (typically orders of
   magnitude fewer than the input — the frontier of n random points
   in d dims is O(log^{d-1} n) in expectation) are brought to one
   partition and reduced once more with the same kernel.

Per-batch kernel: sort-filter-skyline (SFS; Chomicki et al., ICDE
2003) — sort by the dim-sum (a monotone preference function), so a
point can only be dominated by points BEFORE it in the order; stream
points, testing each against the kept frontier only (vectorized
NumPy compare against the frontier array). Worst case O(n·s) with s
the frontier size — the m×m all-pairs matrix is never built, so a
partition of millions of rows stays linear when the frontier is
small (the common case; a pathological anti-correlated input degrades
gracefully to quadratic IN THE FRONTIER, not the partition).

At 100 TB: phase 1 is embarrassingly parallel over whatever
partitioning the scan produced (no repartition), and the only data
movement is the candidate set. If a hostile input made candidates too
large for one partition, the same kernel composes hierarchically
(tree-reduce by repartitioning candidates and re-running phase 1) —
not needed at any tested scale, documented here for the operator's
scale ceiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _skyline_kernel(pts, dims):
    """pandas DataFrame → its skyline rows (maximization on every
    dim). Ties: a point equal to a frontier point on EVERY dim is NOT
    dominated (dominance requires a strict improvement somewhere) —
    duplicates of a frontier point all survive."""
    import numpy as np

    if len(pts) == 0:
        return pts
    m = pts[list(dims)].to_numpy()
    order = np.argsort(-m.sum(axis=1), kind="stable")
    m = m[order]
    keep_rows = []          # indices into the sorted order
    frontier = np.empty((0, m.shape[1]), dtype=m.dtype)
    for i in range(len(m)):
        p = m[i]
        if len(frontier):
            ge = (frontier >= p).all(axis=1)
            gt = (frontier > p).any(axis=1)
            if (ge & gt).any():
                continue  # dominated by an earlier (≥-sum) point
        keep_rows.append(i)
        frontier = np.vstack([frontier, p])
    return pts.iloc[order[keep_rows]]


def skyline(df: DataFrame, dims: list[str]) -> DataFrame:
    """Rows of ``df`` not dominated on the numeric columns ``dims``
    (all maximized; negate a column upstream to minimize it). Row set
    is exact and partitioning-invariant; row ORDER is not defined —
    callers sort."""
    if not dims:
        raise ValueError("skyline needs at least one dimension")
    missing = [d for d in dims if d not in df.columns]
    if missing:
        raise ValueError(f"skyline dims not in frame: {missing}")

    def local(batches):
        for pdf in batches:
            yield _skyline_kernel(pdf, dims)

    def global_(batches):
        # The single global partition still arrives as MULTIPLE Arrow
        # batches (spark.sql.execution.arrow.maxRecordsPerBatch, default
        # 10k). Reducing each batch independently would let a point
        # dominated only across a batch boundary survive, so fold the
        # batches into ONE running frontier: skyline(A ∪ B) =
        # skyline(skyline(A) ∪ B) by transitivity, and memory stays
        # bounded by frontier + one batch, never the candidate union.
        import pandas as pd

        frontier = None
        for pdf in batches:
            merged = pdf if frontier is None else pd.concat(
                [frontier, pdf], ignore_index=True)
            frontier = _skyline_kernel(merged, dims)
        if frontier is not None:
            yield frontier

    candidates = df.mapInPandas(local, df.schema)
    # global pass over the (small) candidate union; repartition(1) is
    # a shuffle of candidates only, never the input
    return candidates.repartition(1).mapInPandas(global_, df.schema)
