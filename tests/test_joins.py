

def test_interval_join_matches_bruteforce(spark):
    import pandas as pd

    from kgforge.joins import interval_join

    rng = __import__("numpy").random.default_rng(11)
    pts = pd.DataFrame(
        {"pid": range(200), "pos": rng.integers(0, 10_000, 200)}
    )
    ivs = pd.DataFrame(
        {
            "iid": range(40),
            "start": rng.integers(0, 9_500, 40),
        }
    )
    ivs["end"] = ivs["start"] + rng.integers(0, 800, 40)  # some empty
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            spark.createDataFrame(pts.assign(pos=pts["pos"].astype("int64"))),
            spark.createDataFrame(ivs.astype("int64")),
            bucket_width=256,
        ).collect()
    }
    want = {
        (p.pid, i.iid)
        for p in pts.itertuples()
        for i in ivs.itertuples()
        if i.start <= p.pos < i.end
    }
    assert got == want and len(want) > 50  # overlapping intervals multi-match
    # bucket width must not change the result
    got2 = {
        (r["pid"], r["iid"])
        for r in interval_join(
            spark.createDataFrame(pts.astype("int64")),
            spark.createDataFrame(ivs.astype("int64")),
            bucket_width=7,
        ).collect()
    }
    assert got2 == want


def test_interval_join_plan_is_equi_join_not_nested_loop(spark):
    """The bucketization must surface as an EQUI-join on the bucket
    key — never a BroadcastNestedLoopJoin / cartesian theta join (the
    naive range-join plans that melt at scale)."""
    import pandas as pd

    from kgforge.joins import interval_join

    pts = spark.createDataFrame(
        pd.DataFrame({"pid": range(100), "pos": range(0, 10_000, 100)}).astype("int64")
    )
    ivs = spark.createDataFrame(
        pd.DataFrame(
            {"iid": range(10), "start": range(0, 5000, 500)}
        ).assign(end=lambda d: d["start"] + 300).astype("int64")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the chosen strategy is visible: the
        # bucket key must make a shuffled EQUI join legal
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            interval_join(pts, ivs, bucket_width=512)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
