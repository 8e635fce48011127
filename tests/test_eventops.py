"""Funnel + retention semantics on hand-built logs: ordered-step
chaining (a purchase BEFORE the click must not count), monotone step
counts, cohort/offset arithmetic, and empty-input behavior."""

import datetime as dt

from pyspark.sql import functions as F

from kgforge.eventops import funnel_counts, retention_cohorts


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )


def test_funnel_requires_step_order(spark):
    rows = [
        # user 1: full ordered funnel
        (1, "view", _ts(1, 9), 1),
        (1, "click", _ts(1, 10), 2),
        (1, "purchase", _ts(1, 11), 3),
        # user 2: purchase BEFORE its click -> reaches click only
        (2, "view", _ts(2, 9), 4),
        (2, "purchase", _ts(2, 10), 5),
        (2, "click", _ts(2, 11), 6),
        # user 3: click with no prior view -> reaches nothing
        (3, "click", _ts(3, 9), 7),
        (3, "purchase", _ts(3, 10), 8),
        # user 4: view only
        (4, "view", _ts(4, 9), 9),
        # user 5: late purchase after an early full chain + noise
        (5, "view", _ts(5, 9), 10),
        (5, "error", _ts(5, 10), 11),
        (5, "click", _ts(5, 11), 12),
        (5, "purchase", _ts(5, 12), 13),
    ]
    out = {
        r["step_name"]: r["n_users"]
        for r in funnel_counts(
            _events(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {"view": 4, "click": 3, "purchase": 2}


def test_funnel_same_ts_ties_use_event_id_order(spark):
    # view and click share a timestamp; event_id orders view first, so
    # the click qualifies (at-or-after in the TOTAL order).
    rows = [
        (1, "view", _ts(1, 9), 1),
        (1, "click", _ts(1, 9), 2),
        # user 2: ids reversed -> the click precedes its view, disqualified
        (2, "click", _ts(1, 9), 3),
        (2, "view", _ts(1, 9), 4),
    ]
    out = {
        r["step_name"]: r["n_users"]
        for r in funnel_counts(_events(spark, rows), ["view", "click"]).collect()
    }
    assert out == {"view": 2, "click": 1}


def test_funnel_counts_monotone_on_fixture(spark):
    ev = spark.createDataFrame(
        [(u, t, _ts(1 + i % 20, i % 24), i) for i, (u, t) in enumerate(
            (u, ["view", "click", "purchase", "error"][(u * 7 + j) % 4])
            for u in range(25) for j in range(8)
        )],
        "user_id long, event_type string, ts timestamp, event_id long",
    )
    rows = funnel_counts(ev, ["view", "click", "purchase"]).orderBy("step").collect()
    ns = [r["n_users"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert ns[0] >= 1


def test_retention_cohorts_offsets(spark):
    # user 1 first active week of Jan 1 (Mon), again 2 weeks later;
    # user 2 same cohort, week 0 only; user 3 cohort of Jan 8.
    rows = [
        (1, "view", _ts(2), 1),    # week of Jan 1
        (1, "view", _ts(3), 2),    # same week -> single week-0 activity
        (1, "click", _ts(16), 3),  # week of Jan 15 -> offset 2
        (2, "view", _ts(5), 4),    # week of Jan 1
        (3, "view", _ts(9), 5),    # week of Jan 8
    ]
    out = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_active"]
        for r in retention_cohorts(_events(spark, rows)).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_eventops_empty_inputs(spark):
    empty = spark.createDataFrame(
        [], "user_id long, event_type string, ts timestamp, event_id long"
    )
    fun = funnel_counts(empty, ["view", "click"]).collect()
    assert {(r["step_name"], r["n_users"]) for r in fun} == {
        ("view", 0), ("click", 0),
    }
    assert retention_cohorts(empty).count() == 0


def test_funnel_single_shuffle_plan(spark):
    # the chained windows must ride ONE Exchange on the user key — a
    # per-step self-join would show several data-sized Exchanges.
    ev = _events(spark, [(1, "view", _ts(1), 1)])
    plan = funnel_counts(
        ev, ["view", "click", "purchase"]
    )._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning(user_id")
    assert n_exchange == 1, plan


def test_windowed_funnel_enforces_gap(spark):
    from kgforge.eventops import funnel_counts

    rows = [
        # user 1: click 1h after view -> inside a 2h window
        (1, "view", _ts(1, 9), 1),
        (1, "click", _ts(1, 10), 2),
        # user 2: click 3 days after view -> outside the 2h window
        (2, "view", _ts(2, 9), 3),
        (2, "click", _ts(5, 9), 4),
        # user 3: first view too early, but a SECOND view does not help:
        # the window anchors on the FIRST qualifying prior step
        (3, "view", _ts(3, 0), 5),
        (3, "view", _ts(3, 22), 6),
        (3, "click", _ts(3, 23), 7),
    ]
    out = {
        r["step_name"]: r["n_users"]
        for r in funnel_counts(
            _events(spark, rows), ["view", "click"], max_gap_hours=2
        ).collect()
    }
    assert out == {"view": 3, "click": 1}


def test_session_stats_manual(spark):
    from kgforge.eventops import session_stats

    rows = [
        # user 1: two sessions — [9:00, 9:10] (2 events) and [11:00] (bounce)
        (1, "view", _ts(1, 9, 0), 1),
        (1, "click", _ts(1, 9, 10), 2),
        (1, "view", _ts(1, 11, 0), 3),
        # user 2: one 3-event session 10:00-10:40 (gaps 20min <= 30min)
        (2, "view", _ts(2, 10, 0), 4),
        (2, "click", _ts(2, 10, 20), 5),
        (2, "purchase", _ts(2, 10, 40), 6),
    ]
    r = session_stats(_events(spark, rows), gap_sec=1800).collect()[0]
    assert r["n_sessions"] == 3
    assert r["n_bounces"] == 1
    assert abs(r["bounce_rate"] - 1 / 3) < 1e-12
    assert abs(r["avg_events"] - 6 / 3) < 1e-12
    assert abs(r["avg_duration_sec"] - (600 + 0 + 2400) / 3) < 1e-9
    assert abs(r["max_duration_sec"] - 2400.0) < 1e-9

    empty = spark.createDataFrame(
        [], "user_id long, event_type string, ts timestamp, event_id long"
    )
    er = session_stats(empty).collect()[0]
    assert er["n_sessions"] == 0 and er["n_bounces"] == 0


def test_trailing_value_sum_range_frame(spark):
    from kgforge.eventops import trailing_value_sum

    rows = [
        (1, "view", _ts(1), 1, 10.0),
        (1, "view", _ts(5), 2, 20.0),   # day 5: day 1 within 7d -> 30
        (1, "view", _ts(9), 3, 40.0),   # day 9: days 5,9 within 7d -> 60
        (1, "view", _ts(20), 4, 5.0),   # nothing trailing -> 5
        (2, "view", _ts(9), 5, 7.0),    # other user isolated
    ]
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_type string, ts timestamp, event_id long, value double",
    )
    got = {r["event_id"]: r["trailing_sum"]
           for r in trailing_value_sum(ev, days=7).collect()}
    assert got == {1: 10.0, 2: 30.0, 3: 60.0, 4: 5.0, 5: 7.0}
