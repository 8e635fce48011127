"""B7 MinHash-LSH + B8 connected components.

CC oracle: union-find in pure Python (independent implementation).
LSH gate: alias groups from the fixture gazetteer must be recovered
(recall on true alias pairs; precision via the exact-Jaccard verify).
"""

import pandas as pd
import pytest

from kgforge.fixtures import gazetteer
from kgforge.stages.canonicalize import (
    alias_pairs,
    canonical_groups,
    connected_components,
    exact_jaccard_filter,
    minhash_signatures,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("d", "e"), ("f", "f2"), ("e", "g"), ("x", "y"),
        ("c", "a"),  # cycle
    ]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    want = _union_find(edges)
    assert got == want


def test_cc_long_chain_converges(spark):
    n = 40  # diameter 40 > default rounds? hash-min halves distance each round via min over neighbors
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    got = connected_components(df, max_iter=50).toPandas()
    assert (got["component"] == 0).all()


def test_star_cc_matches_hashmin_and_scales_deep_graphs(spark):
    """connected_components_star (big/small-star, O(log n) rounds) must
    produce identical labels to hash-min on every topology — and
    converge on a chain whose diameter exceeds hash-min's round budget."""
    import numpy as np

    from kgforge.stages.canonicalize import connected_components_star

    cases = {
        "cycle": [(i, (i + 1) % 50) for i in range(50)],
        "stars": [(0, i) for i in range(1, 20)] + [(100, 100 + i) for i in range(1, 5)],
    }
    rng = np.random.default_rng(3)
    cases["random"] = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 300, 400), rng.integers(0, 300, 400))
        if a != b
    ]
    for name, edges in cases.items():
        df = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
        hm = connected_components(df, max_iter=200).toPandas().sort_values("node").reset_index(drop=True)
        st = connected_components_star(df).toPandas().sort_values("node").reset_index(drop=True)
        pd.testing.assert_frame_equal(hm, st, check_dtype=False), name
        uf = _union_find(edges)
        # min-of-component labels: union-find roots path-compress toward
        # the min because we always parent the larger root
        got = dict(zip(hm["node"], hm["component"]))
        assert got == uf, name

    # diameter-199 chain: star converges in O(log n); hash-min at the
    # same budget must fail LOUDLY, never return wrong labels
    chain = pd.DataFrame([(i, i + 1) for i in range(199)], columns=["a", "b"])
    df = spark.createDataFrame(chain)
    st = connected_components_star(df, max_iter=25).toPandas()
    assert (st["component"] == 0).all()
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=25)


def test_minhash_recovers_alias_groups(spark):
    gaz = gazetteer()
    names = spark.createDataFrame(gaz[["surface"]].rename(columns={"surface": "name"}))
    pairs = alias_pairs(names, threshold=0.5).toPandas()
    got_pairs = set(map(tuple, pairs[["a", "b"]].itertuples(index=False)))

    # golden alias pairs: same canonical entity
    want = set()
    for _, grp in gaz.groupby("canonical"):
        ss = sorted(grp["surface"])
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                want.add((ss[i], ss[j]))
    tp = len(got_pairs & want)
    recall = tp / len(want)
    precision = tp / len(got_pairs) if got_pairs else 0.0
    # alias variants are case/punct tweaks -> near-identical shingle sets
    assert recall >= 0.95, f"recall {recall}"
    assert precision >= 0.90, f"precision {precision} (cross-entity near-dups allowed)"


def test_canonical_groups_merge_aliases(spark):
    gaz = gazetteer()
    names = spark.createDataFrame(gaz[["surface"]].rename(columns={"surface": "name"}))
    groups = canonical_groups(names, threshold=0.5).toPandas()
    by_comp = groups.groupby("component")["name"].apply(set)
    surf2canon = dict(zip(gaz["surface"], gaz["canonical"]))
    # each fixture alias group should land in one component
    merged = 0
    total = 0
    for canon, grp in gaz.groupby("canonical"):
        total += 1
        comps = {groups.set_index("name").loc[s, "component"] for s in grp["surface"]}
        if len(comps) == 1:
            merged += 1
    assert merged / total >= 0.95, f"only {merged}/{total} alias groups merged"
    assert len(by_comp) > 1


def test_signatures_deterministic_across_partitioning(spark):
    gaz = gazetteer()
    names = pd.DataFrame({"name": gaz["surface"]})
    a = minhash_signatures(spark.createDataFrame(names)).toPandas()
    b = minhash_signatures(spark.createDataFrame(names).repartition(9)).toPandas()
    a = a.sort_values("name").reset_index(drop=True)
    b = b.sort_values("name").reset_index(drop=True)
    assert (a["name"] == b["name"]).all()
    assert all(list(x) == list(y) for x, y in zip(a["sig"], b["sig"]))


def test_link_local_select_equals_min_by(spark):
    """B6's two selection plans — fused zero-shuffle local argmin vs
    min_by hash aggregation — must be row-identical (same deterministic
    (link_score, s, o) tie-break)."""
    from kgforge.fixtures import (
        gazetteer,
        gen_embeddings,
        gen_transcripts,
        patterns_df,
    )
    from kgforge.stages import extract as ex
    from kgforge.stages import link as lk
    from kgforge.stages.materialize import dense_ids
    from pyspark.sql import functions as F

    t = spark.createDataFrame(gen_transcripts(40)[0])
    gaz_pdf = gazetteer()
    gaz = spark.createDataFrame(gaz_pdf)
    tri = ex.surface_triples_dedup(ex.extract_triples(t, gaz_pdf, patterns_df()))
    e2id = dense_ids(gaz.select(F.col("canonical").alias("name")))
    r2id = dense_ids(spark.createDataFrame(patterns_df()).select(F.col("pred").alias("name")))
    emb = gen_embeddings(n_ent=60, n_rel=12, dim=16)

    cols = ["conv_id", "turn_idx", "subj", "pred", "obj", "s", "p", "o", "link_score"]
    a = (
        lk.link_triples(spark, tri, gaz, e2id, r2id, emb, local_select=True)
        .select(cols).toPandas().sort_values(cols).reset_index(drop=True)
    )
    b = (
        lk.link_triples(spark, tri, gaz, e2id, r2id, emb, local_select=False)
        .select(cols).toPandas().sort_values(cols).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_asof_join_manual_case(spark):
    """As-of semantics on a hand-checked case: inclusive tie (right row
    at the SAME instant matches), carry-forward across later lefts,
    null before any right row, keys independent."""
    from kgforge.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 11, 305), (1, 12, 300), (2, 20, 150)],
        "user_id long, event_id long, ts long",
    )
    right = spark.createDataFrame(
        [(1, 200, 9.0), (1, 300, 42.0), (2, 400, 7.0)],
        "user_id long, ts long, value double",
    )
    got = (
        asof_join(left, right, "user_id", "ts", ["value"])
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    # event 10 @100: no purchase <= 100 -> null
    assert pd.isna(got.loc[0, "value_right"]) and pd.isna(got.loc[0, "ts_right"])
    # event 11 @305: latest right <= 305 is ts=300
    assert got.loc[1, "value_right"] == 42.0 and got.loc[1, "ts_right"] == 300
    # event 12 @300: INCLUSIVE tie matches ts=300
    assert got.loc[2, "value_right"] == 42.0 and got.loc[2, "ts_right"] == 300
    # key 2 independent: event 20 @150: no right <= 150 for user 2 (400 > 150)
    assert pd.isna(got.loc[3, "value_right"])


def test_asof_join_null_in_matched_row(spark):
    """DuckDB ASOF parity: when the MATCHED right row carries a null
    value column, the output keeps that null — it must not mix in the
    value of an older right row (regression for the per-column
    carry-forward bug: struct-packed carry)."""
    from kgforge.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, 400)], "user_id long, event_id long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 100, 9.0, "a"), (1, 300, None, "b")],
        "user_id long, ts long, value double, tag string",
    )
    got = asof_join(left, right, "user_id", "ts", ["value", "tag"]).toPandas()
    # matched row is ts=300 whose value is NULL; tag comes from the same row
    assert got.loc[0, "ts_right"] == 300
    assert pd.isna(got.loc[0, "value_right"])
    assert got.loc[0, "tag_right"] == "b"


def test_connected_components_empty_edges(spark):
    """Empty edge set converges immediately to an empty label table
    (the observe-fused convergence sum is NULL over an empty set —
    regression guard for the coalesce)."""
    from kgforge.stages.canonicalize import connected_components_star

    empty = spark.createDataFrame([], "a string, b string")
    assert connected_components(empty).count() == 0
    assert connected_components_star(empty).count() == 0


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized independent oracle: pandas merge_asof(direction=
    'backward') implements the same latest-at-or-before semantics —
    compare on random keyed event sets (unique (key, ts) on the right,
    nulls where no prior right row)."""
    import numpy as np

    from kgforge.joins import asof_join

    rng = np.random.default_rng(11)
    for trial in range(3):
        nl, nr = 120, 60
        left = pd.DataFrame(
            {
                "user_id": rng.integers(0, 8, nl),
                "event_id": np.arange(nl),
                "ts": rng.integers(0, 500, nl),
            }
        )
        right = (
            pd.DataFrame(
                {
                    "user_id": rng.integers(0, 8, nr),
                    "ts": rng.integers(0, 500, nr),
                    "value": rng.normal(size=nr).round(3),
                }
            )
            .drop_duplicates(["user_id", "ts"])
            .reset_index(drop=True)
        )
        got = (
            asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                "user_id", "ts", ["value"],
            )
            .toPandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts", by="user_id", direction="backward",
        ).sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_series_equal(
            got["value_right"], want["value"], check_names=False
        )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join: two tables bucketed on the same key with the
    same bucket count join with ZERO Exchange in the physical plan —
    the write-once-shuffle layout for repeatedly-joined fact tables."""
    from kgforge.joins import write_bucketed

    a = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 1000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "bkt_a", "k", buckets=4)
    write_bucketed(b, "bkt_b", "k", buckets=4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 1000
        # same join WITHOUT bucketing does shuffle — the baseline
        jj = a.join(b, "k")
        plan2 = jj._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_driver_unionfind_equals_distributed_cc(spark):
    """The scale-adaptive union-find fast path must return EXACTLY the
    distributed hash-min labels (component = min member), including on
    string nodes, chains, and isolated pairs; above the threshold the
    distributed path still runs."""
    import pandas as pd

    from kgforge.stages.canonicalize import connected_components

    edges = spark.createDataFrame(
        pd.DataFrame(
            {
                "a": ["b", "c", "x", "m", "n", "q"],
                "b": ["a", "b", "y", "n", "o", "q"],
            }
        )
    )
    stats_fast, stats_dist = {}, {}
    fast = {
        (r["node"], r["component"])
        for r in connected_components(
            edges, stats=stats_fast, driver_threshold=1000
        ).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(edges, stats=stats_dist).collect()
    }
    assert fast == dist
    assert stats_fast["mode"] == "driver-unionfind" and stats_fast["rounds"] == 0
    assert stats_dist["rounds"] > 0
    # threshold smaller than the edge list -> distributed path taken
    stats_big = {}
    big = {
        (r["node"], r["component"])
        for r in connected_components(
            edges, stats=stats_big, driver_threshold=3
        ).collect()
    }
    assert big == dist and "mode" not in stats_big


def test_driver_alias_pairs_equals_distributed(spark):
    """The alias_pairs driver fast path (driver_threshold) must produce
    exactly the distributed chain's verified pairs — same candidates
    (band-slice buckets, max_bucket cap) and same jaccard doubles."""
    gaz = gazetteer()
    names = spark.createDataFrame(gaz[["surface"]].rename(columns={"surface": "name"}))
    dist = alias_pairs(names, threshold=0.5).toPandas()
    drv = alias_pairs(names, threshold=0.5, driver_threshold=10_000).toPandas()
    key = ["a", "b"]
    dist = dist.sort_values(key).reset_index(drop=True)
    drv = drv.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(dist, drv, check_like=True)
    # above the gate the distributed path must run unchanged
    over = alias_pairs(names, threshold=0.5, driver_threshold=2).toPandas()
    over = over.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(dist, over, check_like=True)
