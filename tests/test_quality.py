"""Data-quality pack: the report operators must CATCH injected
problems (nulls, out-of-range, duplicate keys, orphan FKs) — the
contract queries run on clean TPC-H data and only show passing rows,
so these tests own the failure paths."""

import pandas as pd

from kgforge import quality as Q


def test_profile_columns_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "a": [1, 1, 2, None, None],
                "b": ["x", "y", "z", "z", "w"],
            }
        ).astype({"a": "Int64"})
    )
    got = {
        r["column"]: (r["n_rows"], r["n_null"], r["null_frac"], r["n_distinct"])
        for r in Q.profile_columns(df, ["a", "b"]).collect()
    }
    assert got == {"a": (5, 2, 0.4, 2), "b": (5, 0, 0.0, 4)}
    # approx path: HLL++ is exact at this cardinality; plan has no Expand
    approx = Q.profile_columns(df, ["a", "b"], exact_distinct=False)
    got2 = {r["column"]: r["n_distinct"] for r in approx.collect()}
    assert got2 == {"a": 2, "b": 4}
    assert "Expand" not in approx._jdf.queryExecution().executedPlan().toString()


def test_check_expectations_catches_each_rule(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2, 3, 4],  # dup key
                "q": [5.0, 150.0, None, 20.0, -1.0],  # 2 out of [0,100]
                "f": ["A", "B", "Q", None, "A"],  # 1 not in {A,B}
                "s": ["ok", "ok", "bad!", "ok", None],  # 1 fails regex
            }
        )
    )
    rules = [
        Q.expect_not_null("q"),
        Q.expect_between("q", 0, 100),
        Q.expect_in("f", ["A", "B"]),
        Q.expect_rlike("s", "^[a-z]+$"),
        Q.expect_unique(["k"]),
    ]
    got = {
        (r["rule"], r["column"]): (r["n_violations"], r["passed"])
        for r in Q.check_expectations(df, rules).collect()
    }
    assert got == {
        ("not_null", "q"): (1, False),
        ("between", "q"): (2, False),
        ("accepted_values", "f"): (1, False),
        ("rlike", "s"): (1, False),
        ("unique", "k"): (1, False),
    }
    # all-row-rules case still one scan; clean data passes
    clean = spark.createDataFrame(pd.DataFrame({"q": [1.0, 2.0]}))
    rep = Q.check_expectations(clean, [Q.expect_between("q", 0, 100)]).collect()
    assert [(r["n_violations"], r["passed"]) for r in rep] == [(0, True)]


def test_referential_integrity_counts_orphans_and_null_keys(spark):
    child = spark.createDataFrame(
        pd.DataFrame({"fk": [1, 1, 2, 9, None]}).astype({"fk": "Int64"})
    )
    parent = spark.createDataFrame(pd.DataFrame({"pk": [1, 2, 3]}))
    rep = Q.check_referential_integrity(
        [(child, "fk", parent, "pk", "child.fk->parent")]
    ).collect()
    assert len(rep) == 1
    r = rep[0]
    # orphans: the 9 and the NULL key (a NULL FK cannot resolve)
    assert (r["constraint"], r["n_child"], r["n_orphans"], r["passed"]) == (
        "child.fk->parent",
        5,
        2,
        False,
    )


def test_quality_handles_empty_input(spark):
    empty = spark.createDataFrame([], "a long, b string")
    prof = {r["column"]: r["n_rows"] for r in Q.profile_columns(empty, ["a"]).collect()}
    assert prof == {"a": 0}
    rep = Q.check_expectations(
        empty, [Q.expect_not_null("a"), Q.expect_unique(["b"])]
    ).collect()
    assert [(r["n_violations"], r["passed"]) for r in rep] == [(0, True), (0, True)]


def test_check_expectations_rejects_empty_rules(spark):
    import pytest as _pt

    with _pt.raises(ValueError, match="at least one rule"):
        Q.check_expectations(spark.range(3), [])


def test_table_diff_classifies_all_statuses(spark):
    import pandas as pd

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 3, 4, 5],
                "a": ["x", "y", "z", "w", None],
                "b": [10, 20, 30, 40, 50],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 3, 6, 5],
                "a": ["x", "Y", None, "new", None],   # 2 changed, 3 changed(a->NULL)
                "b": [10, 20, 31, 60, 50],            # 3 changed b too
            }
        )
    )
    got = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in Q.table_diff(left, right, ["k"]).collect()
    }
    assert got == {
        1: ("unchanged", ""),
        2: ("changed", "a"),
        3: ("changed", "a,b"),
        4: ("removed", ""),
        5: ("unchanged", ""),  # NULL == NULL under eqNullSafe
        6: ("added", ""),
    }
    # explicit compare_cols subset: b-only diff ignores a
    got_b = {
        r["k"]: r["status"]
        for r in Q.table_diff(left, right, ["k"], ["b"]).collect()
    }
    assert got_b[2] == "unchanged" and got_b[3] == "changed"
