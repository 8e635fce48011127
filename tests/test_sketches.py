"""Misra-Gries heavy hitters: exactness vs a Python count on a skewed
long-tail corpus, partitioning-independence, the sketch coverage
guarantee, and bounded summary size."""

import numpy as np
import pandas as pd

from kgforge.sketches import _mg_compress, heavy_hitters, misra_gries_partials


def _skewed_df(spark, n_parts):
    rng = np.random.default_rng(29)
    # zipf-ish: 3 heavy values on a 2000-unique long tail
    vals = (
        ["alpha"] * 500 + ["beta"] * 300 + ["gamma"] * 150
        + [f"tail{i}" for i in rng.integers(0, 2000, 1050)]
    )
    rng.shuffle(vals)
    return spark.createDataFrame(
        pd.DataFrame({"v": vals}), "v string"
    ).repartition(n_parts)


def test_heavy_hitters_exact_and_partition_independent(spark):
    for parts in (1, 7):
        df = _skewed_df(spark, parts)
        got = {
            r["value"]: (r["n_count"], r["n_total"])
            for r in heavy_hitters(df, "v", k=10).collect()
        }
        # exact check: n = 2000 rows; threshold n/10 = 200
        assert got == {"alpha": (500, 2000), "beta": (300, 2000)}


def test_partials_bounded_and_cover_heavy(spark):
    df = _skewed_df(spark, 5)
    p = misra_gries_partials(df, "v", k=10).collect()
    per_part_candidates = [r for r in p if r["value"] is not None]
    sentinels = [r for r in p if r["value"] is None]
    assert sum(r["est"] for r in sentinels) == 2000
    # bounded: at most k candidates per partition (5 partitions)
    assert len(per_part_candidates) <= 10 * 5
    # the guarantee: every TRUE heavy hitter appears among candidates
    cands = {r["value"] for r in per_part_candidates}
    assert {"alpha", "beta"} <= cands


def test_mg_compress_keeps_top_counts():
    s = {f"v{i}": i + 1 for i in range(12)}  # counts 1..12
    _mg_compress(s, 4)
    assert len(s) <= 4
    # survivors are the largest, offset-subtracted (offset = 5th largest = 8)
    assert s == {"v8": 1, "v9": 2, "v10": 3, "v11": 4}


def test_heavy_hitters_empty(spark):
    empty = spark.createDataFrame([], "v string")
    assert heavy_hitters(empty, "v", k=5).count() == 0
