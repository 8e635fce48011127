"""Temporal dimension modeling: SCD Type-2 interval builds from change
streams and point-in-time snapshot reads — the warehouse layer that
turns an append-only event log into "what was this entity's state at
time T", which both training-data reproducibility (join features as-of
the label time, no leakage) and the catalog's time-travel story need at
the ROW level rather than the snapshot level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse an append-only change stream into SCD Type-2 validity
    intervals: one row per (key, attribute-state) RUN, with
    ``valid_from`` / ``valid_to`` (NULL = still open), ``is_current``,
    and a per-key ``version`` counter.

    Semantics: rows are ordered per key by ``(ts_col, *order_cols)``
    (pass a unique tie-breaker like an event id — determinism must not
    depend on partition order); a new version opens exactly when the
    tracked attribute tuple DIFFERS from the previous row's
    (null-safely: NULL -> value and value -> NULL both open versions);
    repeated identical states collapse into the run they continue.

    Plan shape: two window passes over the SAME ``partitionBy(keys)``
    — the change-point filter (lag over a packed attr struct) and the
    interval close (lead + row_number) — so Catalyst plans ONE Exchange
    on the key columns and both sorts ride it. Per-key state is
    window-local: nothing is collected, no iterative joins; at 100 TB
    the single shuffle on the entity key is the irreducible cost, and a
    skewed hot entity bounds a partition at its own change count (the
    same profile the as-of join in joins.py carries).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # pack the tracked attrs into ONE struct so the change test is a
    # single null-safe comparison (eqNullSafe on structs compares
    # field-wise with NULL == NULL), not a per-column boolean chain
    state = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        changes.withColumn("__prev", F.lag(state).over(w))
        .where(F.col("__prev").isNull() | ~state.eqNullSafe(F.col("__prev")))
        .drop("__prev")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return changed.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


def snapshot_at(scd2: DataFrame, ts) -> DataFrame:
    """Point-in-time read of an SCD2 table: the one version per key
    active at ``ts`` (``valid_from <= ts < valid_to``, open intervals
    included). A narrow filter — no shuffle, no window: the SCD2 build
    already guarantees at most one interval per key covers any instant.
    Keys whose first version opens after ``ts`` simply don't appear
    (they didn't exist yet)."""
    t = F.lit(ts).cast("timestamp")
    return scd2.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def scd2_join(
    facts: DataFrame,
    scd2: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Point-in-time dimension join: each fact row gains the SCD2
    attribute version valid AT its timestamp (``valid_from <= ts <
    valid_to``) — the leakage-safe feature join (features as-of the
    label time) that the SCD2 build exists to serve.

    Because a key's intervals partition time contiguously, "the
    version covering ts" == "the latest valid_from at-or-before ts",
    so this composes :func:`kgforge.joins.asof_join` — union + ONE
    window pass on the key, never an interval-inequality join that
    explodes per-key candidates. Facts older than the key's first
    version keep NULL attributes. Output: facts plus
    ``<attr>_at_<ts_col>`` columns.
    """
    from .joins import asof_join

    right = scd2.select(
        F.col(key), F.col("valid_from").alias(ts_col), *attr_cols
    )
    out = asof_join(facts, right, key, ts_col, list(attr_cols))
    for a in attr_cols:
        out = out.withColumnRenamed(f"{a}_right", f"{a}_at_{ts_col}")
    return out.drop(f"{ts_col}_right")
