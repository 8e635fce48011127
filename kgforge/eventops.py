"""Event-log product analytics: ordered funnels and cohort retention.

These are the two canonical questions asked of any large event stream
("how many users make it through view -> click -> purchase?", "of the
users who arrived in week W, how many were still active k weeks
later?") and both are shuffle-discipline traps at 100 TB if written
naively (self-join per funnel step, or a join per retention week).
Both operators here run on ONE data-sized shuffle keyed by the user.

Semantics follow the public "ordered funnel" definition (ClickHouse
windowFunnel / Amplitude): a step counts only if it happens at-or-after
the first completion of the previous step, in a total per-user event
order — so determinism never depends on partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Ordered-funnel user counts: for each step i, the number of users
    with a ``steps[i]`` event at-or-after their first qualifying
    ``steps[i-1]`` event (chained; step 0 is unconditional).

    Output: ``(step, step_name, n_users)`` — one row per step, counts
    monotone non-increasing by construction.

    Plan shape: ONE Exchange on the user key. Each step is a running
    ``min(CASE)`` window over the same ``partitionBy(user)
    .orderBy(ts, *order_cols)`` sort, chained through a Project (step
    i's CASE reads step i-1's running min), so Catalyst plans a single
    Exchange + a single Sort with k cheap window passes riding it —
    never a self-join per step. Per-user state is O(k) running
    timestamps; a hot user bounds a partition at its own event count,
    the same skew contract as sessionization. The event order is total
    (``order_cols`` must make ties unique, e.g. an event id), so the
    result is partitioning-independent.
    """
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = events
    seen_cols: list[str] = []
    prev_seen: Column | None = None
    for i, step in enumerate(steps):
        qual = F.col(type_col) == F.lit(step)
        if prev_seen is not None:
            qual = qual & prev_seen.isNotNull()
        seen = f"_seen_{i}"
        cur = cur.withColumn(seen, F.min(F.when(qual, F.col(ts_col))).over(w))
        seen_cols.append(seen)
        prev_seen = F.col(seen)
    per_user = cur.groupBy(user_col).agg(
        *[
            F.max(F.col(c).isNotNull().cast("int")).alias(f"_r_{i}")
            for i, c in enumerate(seen_cols)
        ]
    )
    totals = per_user.agg(
        *[
            F.coalesce(F.sum(f"_r_{i}"), F.lit(0)).cast("long").alias(f"_n_{i}")
            for i in range(len(steps))
        ]
    )
    stack_args = ", ".join(
        f"CAST({i} AS BIGINT), '{s}', _n_{i}" for i, s in enumerate(steps)
    )
    return totals.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step, step_name, n_users)"
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: cohort = the Monday-truncated week of a
    user's FIRST event; for each (cohort_week, week_offset), the number
    of cohort users active (>= 1 event) in cohort_week + offset weeks.

    Output: ``(cohort_week DATE, week_offset BIGINT, n_active BIGINT)``;
    ``week_offset = 0`` rows equal the cohort sizes.

    Plan shape: ONE data-sized shuffle. Instead of the textbook
    distinct-activity self-join (3 shuffles), a single
    ``groupBy(user)`` collects each user's distinct active-week SET and
    its min — per-user state is bounded by the calendar length of the
    log (a 10-year hourly log is <= 522 distinct weeks), not by the
    user's event count, so the agg is skew-safe with map-side partials.
    The explode + final (cohort, offset) agg runs over user-count-sized
    data. Offsets are exact: both week stamps are Monday-truncated, so
    the day difference is a multiple of 7.
    """
    wk = F.date_trunc("week", F.col(ts_col).cast("timestamp")).cast("date")
    per_user = (
        events.select(F.col(user_col).alias("_u"), wk.alias("_wk"))
        .groupBy("_u")
        .agg(
            F.min("_wk").alias("cohort_week"),
            F.collect_set("_wk").alias("_weeks"),
        )
    )
    return (
        per_user.select(
            "cohort_week", F.explode("_weeks").alias("_act_week")
        )
        .select(
            "cohort_week",
            F.floor(F.datediff("_act_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
