"""SCD2 build + point-in-time snapshot: semantics vs a Python replay
(including NULL attribute states), the one-Exchange plan shape, and the
at-most-one-interval-per-instant invariant."""

import datetime as dt

import pandas as pd

from kgforge.temporal import scd2_build, snapshot_at


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _fixture(spark):
    rows = [
        # key 1: A A B B A  -> versions A, B, A
        (1, "A", _ts(1), 1),
        (1, "A", _ts(2), 2),
        (1, "B", _ts(3), 3),
        (1, "B", _ts(4), 4),
        (1, "A", _ts(5), 5),
        # key 2: NULL NULL X NULL -> versions NULL, X, NULL
        (2, None, _ts(1), 6),
        (2, None, _ts(2), 7),
        (2, "X", _ts(3), 8),
        (2, None, _ts(4), 9),
        # key 3: single row, stays current
        (3, "Z", _ts(2), 10),
        # same-ts tie broken by event_id: C (id 11) then D (id 12)
        (4, "C", _ts(1), 11),
        (4, "D", _ts(1), 12),
    ]
    return spark.createDataFrame(
        rows, "k long, state string, ts timestamp, eid long"
    )


def test_scd2_build_matches_manual_replay(spark):
    out = scd2_build(_fixture(spark), ["k"], ["state"], "ts", ["eid"]).collect()
    got = {
        (r["k"], r["version"]): (
            r["state"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in out
    }
    assert got == {
        (1, 1): ("A", _ts(1), _ts(3), False),
        (1, 2): ("B", _ts(3), _ts(5), False),
        (1, 3): ("A", _ts(5), None, True),
        # NULL -> X and X -> NULL both open versions (null-safe compare)
        (2, 1): (None, _ts(1), _ts(3), False),
        (2, 2): ("X", _ts(3), _ts(4), False),
        (2, 3): (None, _ts(4), None, True),
        (3, 1): ("Z", _ts(2), None, True),
        (4, 1): ("C", _ts(1), _ts(1), False),
        (4, 2): ("D", _ts(1), None, True),
    }


def test_scd2_plan_has_one_exchange(spark):
    plan = (
        scd2_build(_fixture(spark), ["k"], ["state"], "ts", ["eid"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_snapshot_at_one_interval_per_key(spark):
    scd = scd2_build(_fixture(spark), ["k"], ["state"], "ts", ["eid"])
    # at Jan 3 noon: key1 in B, key2 in X, key3 in Z, key4 in D
    snap = {
        r["k"]: r["state"] for r in snapshot_at(scd, "2024-01-03 12:00:00").collect()
    }
    assert snap == {1: "B", 2: "X", 3: "Z", 4: "D"}
    # before any row for key 3 existed at Jan 1: key3 absent
    early = {r["k"]: r["state"] for r in snapshot_at(scd, "2024-01-01 06:00:00").collect()}
    assert early == {1: "A", 2: None, 4: "D"}
    # invariant: at EVERY probed instant, at most one version per key
    for day in range(1, 7):
        per_key = (
            snapshot_at(scd, dt.datetime(2024, 1, day, 12))
            .groupBy("k")
            .count()
            .collect()
        )
        assert all(r["count"] == 1 for r in per_key)


def test_scd2_empty_input(spark):
    empty = spark.createDataFrame([], "k long, state string, ts timestamp, eid long")
    assert scd2_build(empty, ["k"], ["state"], "ts", ["eid"]).count() == 0


def test_scd2_join_picks_interval_at_fact_time(spark):
    from kgforge.temporal import scd2_build, scd2_join

    changes = _fixture(spark)
    scd = scd2_build(changes, ["k"], ["state"], "ts", ["eid"])
    facts = spark.createDataFrame(
        [
            (1, 101, _ts(2, 12)),  # inside version A (days 1-3)
            (1, 102, _ts(3)),      # exactly at the A->B boundary -> B
            (1, 103, _ts(9)),      # after the last change -> current A
            (2, 104, _ts(3, 1)),   # key 2 inside state X
            (9, 105, _ts(5)),      # unknown key -> NULL state
        ],
        "k long, fid long, ts timestamp",
    )
    got = {
        r["fid"]: r["state_at_ts"]
        for r in scd2_join(facts, scd, "k", "ts", ["state"]).collect()
    }
    assert got == {101: "A", 102: "B", 103: "A", 104: "X", 105: None}
