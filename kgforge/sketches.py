"""Mergeable frequency sketches: distributed Misra-Gries heavy hitters
with exact verification.

The scale problem this solves: "which tokens exceed 1/k of the corpus"
over 100 TB with billions of DISTINCT values. A plain
``groupBy(value).count()`` shuffles the full value cardinality; the
sketch route never does — each partition keeps a bounded k-entry
Misra-Gries summary (Misra & Gries 1982; merged per Arrow batch with
the subtract-offset compression of Agarwal et al., "Mergeable
Summaries", PODS 2012), whose union provably CONTAINS every global
heavy hitter (pigeonhole: an item with global count > n/k must exceed
n_p/k in at least one partition). A second pass then counts ONLY the
candidate set exactly (broadcast semi-filter, candidate-sized agg), so
the reported set is exact and partitioning-independent even though the
intermediate summaries are not.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_compress(summary: dict, k: int) -> None:
    """Shrink ``summary`` to at most ``k`` entries by subtracting the
    (k+1)-th largest count from every entry and dropping non-positive
    remainders — the mergeable-summaries compression (error grows by
    the subtracted offset, total bounded by n_p/(k+1))."""
    if len(summary) <= k:
        return
    off = sorted(summary.values(), reverse=True)[k]
    for key in list(summary):
        v = summary[key] - off
        if v > 0:
            summary[key] = v
        else:
            del summary[key]


def misra_gries_partials(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``df[col]``: rows
    ``(value, est)`` per surviving candidate plus ONE sentinel row
    ``(NULL, partition_row_count)`` per partition, so a single narrow
    scan yields both the candidate union and the exact global total.

    ``mapInPandas`` with Arrow batches: each batch contributes its
    exact ``value_counts`` (vectorized — no per-row Python), merged
    into the bounded summary and compressed. Output size is at most
    ``(k + 1) × partitions`` — parameter-scale, never data-scale.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        n_part = 0
        for pdf in batches:
            s = pdf[col].dropna()
            n_part += len(s)
            for val, c in s.value_counts().items():
                summary[val] = summary.get(val, 0) + int(c)
            _mg_compress(summary, k)
        yield pd.DataFrame(
            {
                "value": list(summary.keys()) + [None],
                "est": [int(v) for v in summary.values()] + [n_part],
            }
        )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        fn, "value string, est long"
    )


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact heavy hitters: every value of ``df[col]`` whose count
    strictly exceeds ``n / k`` (n = non-null rows), as
    ``(value, n_count, n_total)`` — computed WITHOUT a full-cardinality
    shuffle.

    Two passes: (1) one narrow sketch scan
    (:func:`misra_gries_partials` — bounded memory, no shuffle), whose
    tiny output is localCheckpointed (it feeds both the candidate
    filter and the total; a twice-referenced lazy DF would re-run the
    big scan twice, docs/PLANS.md); (2) one scan counting only the
    broadcast candidate set — the aggregation key space is at most
    ``(k+1) × partitions`` values regardless of true cardinality. The
    threshold compares ``n_count * k > n_total`` in exact integers, so
    the output is engine- and partitioning-independent.
    """
    partials = misra_gries_partials(df, col, k).localCheckpoint()
    total = partials.where(F.col("value").isNull()).agg(
        F.coalesce(F.sum("est"), F.lit(0)).alias("n")
    ).collect()[0]["n"]
    cand = partials.where(F.col("value").isNotNull()).select("value").distinct()
    counts = (
        df.select(F.col(col).cast("string").alias("value"))
        .where(F.col("value").isNotNull())
        .join(F.broadcast(cand), "value")
        .groupBy("value")
        .agg(F.count(F.lit(1)).cast("long").alias("n_count"))
    )
    return counts.where(
        F.col("n_count") * F.lit(int(k)) > F.lit(int(total))
    ).select("value", "n_count", F.lit(int(total)).cast("long").alias("n_total"))
