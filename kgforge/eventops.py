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
    max_gap_hours: float | None = None,
) -> DataFrame:
    """Ordered-funnel user counts: for each step i, the number of users
    with a ``steps[i]`` event at-or-after their first qualifying
    ``steps[i-1]`` event (chained; step 0 is unconditional). With
    ``max_gap_hours`` set, step i must ALSO land within that many hours
    of the first qualifying step i-1 event (the windowed-funnel /
    conversion-window variant; per-step gap, not total span).

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
            if max_gap_hours is not None:
                qual = qual & (
                    F.col(ts_col)
                    <= prev_seen
                    + F.expr(f"INTERVAL {int(max_gap_hours * 3600)} SECONDS")
                )
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


def session_stats(
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Corpus-level session profile: sessionize by inactivity gap, then
    report one row ``(n_sessions, n_bounces, bounce_rate, avg_events,
    avg_duration_sec, max_duration_sec)`` — the engagement summary a
    product team reads next to the funnel.

    Exactness contract: timestamps become MICROSECOND offsets from a
    fixed epoch (bigint — Spark's ``timestampdiff(MICROSECOND, …)`` and
    DuckDB's ``date_diff('microsecond', …)`` agree exactly at the
    storage resolution, unlike second-granularity diffs, where Spark
    truncates and DuckDB counts boundary crossings), so gaps, durations
    and their sums are exact integers; the two averages are single
    double divisions over them. Plan shape: ONE data-sized shuffle on
    the user key (the session window), a per-session agg riding the
    same partitioning, then a session-count-sized global agg.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    pos = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP'2000-01-01 00:00:00', {ts_col})"
    ).cast("long")
    gap_us = int(gap_sec) * 1_000_000
    cur = events.withColumn("_pos", pos).withColumn(
        "_new",
        F.when(
            F.lag("_pos").over(w).isNull()
            | ((F.col("_pos") - F.lag("_pos").over(w)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    cur = cur.withColumn(
        "_sess",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = cur.groupBy(user_col, "_sess").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        (F.max("_pos") - F.min("_pos")).alias("_dur_us"),
    )
    return per_session.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.coalesce(F.sum((F.col("_n") == 1).cast("int")), F.lit(0))
        .cast("long")
        .alias("n_bounces"),
        F.try_divide(
            F.coalesce(F.sum((F.col("_n") == 1).cast("int")), F.lit(0)).cast(
                "double"
            ),
            F.count(F.lit(1)).cast("double"),
        ).alias("bounce_rate"),
        F.try_divide(
            F.coalesce(F.sum("_n"), F.lit(0)).cast("double"),
            F.count(F.lit(1)).cast("double"),
        ).alias("avg_events"),
        F.try_divide(
            (F.coalesce(F.sum("_dur_us"), F.lit(0)) / F.lit(1000000.0)),
            F.count(F.lit(1)).cast("double"),
        ).alias("avg_duration_sec"),
        (F.max("_dur_us") / F.lit(1000000.0)).alias("max_duration_sec"),
    )


def trailing_value_sum(
    events: DataFrame,
    days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event trailing-window feature: for every event, the exact
    decimal sum of the user's ``value`` over the preceding ``days``
    days INCLUDING the event — a RANGE frame over microsecond integer
    positions (event-count frames can't express "last 7 days"; range
    frames size the window by the time axis). The standard rolling
    feature a training pipeline joins leakage-free at label time.

    Plan shape: one Exchange on the user key, one sort, one running
    range frame — per-user state is the frame content, bounded by the
    user's event rate x window, never the full history. Sums are
    decimal-exact (no float order), emitted as double.
    """
    pos = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP'2000-01-01 00:00:00', {ts_col})"
    ).cast("long")
    span = int(days) * 86_400_000_000
    w = (
        Window.partitionBy(user_col)
        .orderBy("_pos")
        .rangeBetween(-span, 0)
    )
    return (
        events.withColumn("_pos", pos)
        .withColumn(
            "trailing_sum",
            F.sum(F.col(value_col).cast("decimal(12,2)")).over(w)
            .cast("double"),
        )
        .select(user_col, id_col, "trailing_sum")
    )
