"""Distributed skyline (Pareto-front) operator.

Spark has no native skyline; the scalable formulation (the shape used
by skyline-on-Spark work, e.g. "Integration of Skyline Queries into
Spark SQL", EDBT 2023) is two-phase:

1. **local phase** — each partition computes its own skyline with a
   vectorized dominance filter (Arrow-batched ``mapInPandas``; numpy,
   no per-row Python). A point dominated within its partition is
   dominated globally, so this is lossless and cuts the candidate set
   to ~the skyline size per partition;
2. **merge phase** — local skylines are tiny, so they coalesce to one
   partition and the same filter runs once more for the global answer.

Cost: one full scan plus a one-partition shuffle of a few hundred
candidate rows, O(n·s) work per partition where ``s`` is the local
skyline size — the dominance-heavy datasets that make s large are
exactly the ones where a skyline is not a useful summary.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame


def _local_skyline(pdf, cols: list[str], sense: list[int]):
    import numpy as np

    if len(pdf) == 0:
        return pdf
    # orient every objective to "smaller is better"
    vals = np.column_stack(
        [pdf[c].to_numpy(dtype="float64") * s for c, s in zip(cols, sense)]
    )
    # sorting by the first objective means a point can only be dominated
    # by an EARLIER point — one forward pass against the kept set
    order = np.lexsort(tuple(vals[:, i] for i in range(vals.shape[1] - 1, -1, -1)))
    vals = vals[order]
    keep_idx: list[int] = []
    kept: list = []
    for i in range(len(vals)):
        v = vals[i]
        dominated = False
        for u in kept:
            if (u <= v).all() and (u < v).any():
                dominated = True
                break
        if not dominated:
            kept.append(v)
            keep_idx.append(order[i])
    return pdf.iloc[sorted(keep_idx)]


def skyline(
    df: DataFrame,
    cols: list[str],
    maximize: list[str] | None = None,
) -> DataFrame:
    """Rows not dominated in the ``cols`` objectives (smaller is better
    unless the column is listed in ``maximize``). Strict dominance:
    another row is <= in every objective and < in at least one.
    """
    maximize = maximize or []
    sense = [-1 if c in maximize else 1 for c in cols]

    def local(batches: Iterator) -> Iterator:
        # per-Arrow-batch is lossless (dominated-in-batch ⇒ dominated
        # globally); it only leaves a few extra candidates for the merge
        for pdf in batches:
            yield _local_skyline(pdf, cols, sense)

    def merge(batches: Iterator) -> Iterator:
        import pandas as pd

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        # the merge MUST see all candidates at once — a partition can
        # arrive as several Arrow batches
        yield _local_skyline(pd.concat(pdfs, ignore_index=True), cols, sense)

    candidates = df.mapInPandas(local, df.schema)
    # repartition (NOT coalesce): coalesce(1) is a narrow dependency, so
    # Spark would fold the local phase into the same single task and the
    # whole scan would run serially. The shuffle boundary keeps the local
    # phase at the input's parallelism and moves only the tiny candidate
    # set to the merge task.
    return candidates.repartition(1).mapInPandas(merge, df.schema)
