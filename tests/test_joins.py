

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
