"""Pareto frontier (skyline) operator: rows not dominated on a set of
objective columns.

The multi-objective "best tradeoffs" query — cheapest-vs-best-quality
suppliers, shortest-vs-highest-scoring documents — that single-key
top_ranking (operators/aggregation.py) cannot express: no scalar
ordering exists over conflicting objectives.

Spark-first, 100 TB shape (the distributive skyline from the BNL/D&C
skyline literature):

    local    = skyline of each Arrow batch (mapInPandas, vectorized
               numpy, O(batch x |local skyline|)).  Correct because the
               global skyline is a subset of the union of local
               skylines over ANY partitioning: if y dominates x, then
               some point of y's local skyline also dominates x
               (dominance is transitive).
    global   = exact dominance anti-join over the surviving candidates
               only — broadcast both sides (candidate sets are tiny in
               practice: O(log^(d-1) n) expected for independent dims).

So the full corpus is touched exactly once, with NO shuffle at all in
the local pass (narrow mapInPandas over the scan), and the quadratic
step runs only on the pruned candidates.  A 2-objective special case
could run as a pure window (sort by obj1, running-max of obj2), but the
general-d batch prune is already scan-bound.

Dominance: y dominates x iff y is >= x on every objective (after
direction normalization) and > on at least one.  Duplicate points do
not dominate each other — all copies survive (standard skyline
semantics; dedupe upstream if unwanted).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


def _local_skyline(pdf: pd.DataFrame, cols: Sequence[str],
                   signs: Sequence[int]) -> pd.DataFrame:
    import numpy as np

    if pdf.empty:
        return pdf
    m = pdf[list(cols)].to_numpy(dtype="float64") * np.array(signs)
    # presort by first objective desc (then the rest desc as tiebreak):
    # a point can only be dominated by one sorted BEFORE it, so one
    # forward pass against the kept-so-far set suffices
    order = np.lexsort(tuple(-m[:, d] for d in reversed(range(m.shape[1]))))
    m = m[order]
    kept_rows: list[int] = []
    kept: list = []
    for i in range(m.shape[0]):
        if kept:
            K = np.asarray(kept)
            dom = ((K >= m[i]).all(axis=1) & (K > m[i]).any(axis=1)).any()
            if dom:
                continue
        kept.append(m[i])
        kept_rows.append(i)
    return pdf.iloc[order[kept_rows]]


@register("pareto_frontier", PluginType.TRANSFORMER)
def pareto_frontier(df: DataFrame, objectives: dict[str, str]) -> DataFrame:
    """Skyline of ``df`` under ``objectives``: {column: 'max'|'min'}.

    Returns the full input rows (all columns) of non-dominated points.
    """
    cols = list(objectives)
    signs = []
    for c, d in objectives.items():
        if d not in ("max", "min"):
            raise ValueError(f"objective {c!r}: direction must be "
                             f"'max' or 'min', got {d!r}")
        signs.append(1 if d == "max" else -1)
    clean = df.dropna(subset=cols)
    schema = clean.schema

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _local_skyline(pdf, cols, signs)

    # one scan: the candidate set is referenced twice below (probe and
    # dominator side), and it is small by construction — materialize it
    # instead of running the full-table prune twice
    candidates = (clean.mapInPandas(prune, schema=schema)
                  .localCheckpoint(eager=True))

    # exact global prune over candidates only: anti-join on dominance.
    # Both sides are the (small) candidate set; broadcast the dominator
    # side so the theta join never shuffles.
    a = candidates.alias("a")
    b = candidates.select(*[F.col(c).alias(f"__b_{c}") for c in cols])
    geq = [
        (F.col(f"__b_{c}") >= F.col(f"a.{c}")) if s == 1
        else (F.col(f"__b_{c}") <= F.col(f"a.{c}"))
        for c, s in zip(cols, signs)
    ]
    gt = [
        (F.col(f"__b_{c}") > F.col(f"a.{c}")) if s == 1
        else (F.col(f"__b_{c}") < F.col(f"a.{c}"))
        for c, s in zip(cols, signs)
    ]
    all_geq = geq[0]
    for e in geq[1:]:
        all_geq = all_geq & e
    any_gt = gt[0]
    for e in gt[1:]:
        any_gt = any_gt | e
    return a.join(F.broadcast(b), on=all_geq & any_gt, how="left_anti")
