"""Structural statistics over constructed KGs (``(h, t, r)`` tables).

The construction pipeline's output is a graph; these are the profiling
queries a KG owner runs first — degree distribution (hub detection,
skew planning for downstream joins) and top hubs. Pure DataFrame
aggregations: endpoint union → per-entity degree (one shuffle) →
histogram (second agg is degree-cardinality-sized with map-side
partials). No driver materialization, no Python row work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_degrees(triples: DataFrame) -> DataFrame:
    """``(e, out_degree, in_degree, degree)`` per entity: out = rows as
    head, in = rows as tail.

    ONE scan: each triple row inlines into its two endpoint rows
    (``inline`` of a 2-struct array) — a union of two selects over the
    same input would reference it twice, and a twice-referenced
    DataFrame executes twice (no ReusedExchange for this shape;
    docs/PLANS.md round-3 audit). Then one hash aggregation."""
    pairs = F.array(
        F.struct(F.col("h").alias("e"), F.lit(1).alias("_out"), F.lit(0).alias("_in")),
        F.struct(F.col("t").alias("e"), F.lit(0).alias("_out"), F.lit(1).alias("_in")),
    )
    return triples.select(F.inline(pairs)).groupBy("e").agg(
        F.sum("_out").cast("long").alias("out_degree"),
        F.sum("_in").cast("long").alias("in_degree"),
        F.count(F.lit(1)).cast("long").alias("degree"),
    )


def degree_histogram(triples: DataFrame) -> DataFrame:
    """``(degree, n_entities)`` — the degree distribution of the KG
    (total endpoint appearances per entity). The histogram aggregation
    groups on the degree value itself, so its cardinality is the number
    of DISTINCT degrees — tiny even for 10^12-edge graphs (power-law
    tails are long but sparse)."""
    return (
        entity_degrees(triples)
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_entities"))
    )


def top_hubs(triples: DataFrame, k: int = 10) -> DataFrame:
    """Top-``k`` entities by total degree — ``orderBy + limit`` compiles
    to TakeOrdered (per-partition top-k, k-row driver merge), never a
    global sort or a single-partition window."""
    return entity_degrees(triples).orderBy(
        F.col("degree").desc(), F.col("e")
    ).limit(k)
