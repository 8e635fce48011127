"""A3–A5: bern stats + negative sampling invariants."""

import pandas as pd
import pytest

from kgforge.fixtures import gen_openke_split
from kgforge.sampling import bern_stats, negative_samples

SPLIT = gen_openke_split(n_ent=60, n_rel=5, n_train=400, n_valid=40, n_test=40)


def _pandas_bern(train: pd.DataFrame) -> pd.DataFrame:
    tph = train.groupby(["r", "h"])["t"].nunique().groupby("r").mean().rename("tph")
    hpt = train.groupby(["r", "t"])["h"].nunique().groupby("r").mean().rename("hpt")
    return pd.concat([tph, hpt], axis=1).reset_index()


def test_bern_stats_match_pandas(spark):
    train = SPLIT["train2id"]
    got = bern_stats(spark.createDataFrame(train)).toPandas().sort_values("r").reset_index(drop=True)
    want = _pandas_bern(train).sort_values("r").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-12)


def _check_negatives(neg: pd.DataFrame, train: pd.DataFrame):
    known = set(map(tuple, train[["h", "t", "r"]].itertuples(index=False)))
    got = set(map(tuple, neg[["h", "t", "r"]].itertuples(index=False)))
    assert got, "no negatives produced"
    assert not (got & known), "negative equals a known triple"
    assert (neg["y"] == -1).all()


def test_uniform_negatives_exact_count(spark):
    """Reference Corrupt.h semantics: exactly neg_per_pos negatives per
    positive, never a known triple."""
    train = SPLIT["train2id"]
    df = spark.createDataFrame(train)
    neg = negative_samples(df, n_ent=60, neg_per_pos=2, mode="uniform", seed=42).toPandas()
    _check_negatives(neg, train)
    assert len(neg) == 2 * len(train)
    neg1 = negative_samples(df, n_ent=60, neg_per_pos=1, mode="uniform", seed=42).toPandas()
    assert len(neg1) == len(train)


def test_negatives_duplicate_positives(spark):
    """Non-distinct train input: each duplicate row contributes its own
    neg_per_pos negatives (slots carry a per-duplicate ordinal), so the
    'exactly neg_per_pos * count(triples)' contract holds verbatim."""
    train = SPLIT["train2id"].head(50)
    dup = pd.concat([train, train.head(10)], ignore_index=True)  # 10 dup rows
    neg = negative_samples(spark.createDataFrame(dup), 60, 2, "uniform", seed=3).toPandas()
    assert len(neg) == 2 * len(dup)
    _check_negatives(neg, dup)
    # the distinct-input run is reproduced verbatim inside the dup run:
    # multiplicity-1 slots keep their k ordinals, so every negative the
    # base run draws also appears in the dup run (counter-based RNG)
    base = negative_samples(spark.createDataFrame(train), 60, 2, "uniform", seed=3).toPandas()
    key = ["h", "t", "r"]
    base_set = set(map(tuple, base[key].itertuples(index=False)))
    got_set = set(map(tuple, neg[key].itertuples(index=False)))
    assert base_set <= got_set


def test_bern_negatives_deterministic_across_partitioning(spark):
    train = SPLIT["train2id"]
    a = negative_samples(spark.createDataFrame(train), 60, 1, "bern", seed=1).toPandas()
    b = negative_samples(
        spark.createDataFrame(train).repartition(13), 60, 1, "bern", seed=1
    ).toPandas()
    key = ["h", "t", "r"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    _check_negatives(a, train)


def test_negative_rel_samples(spark):
    from kgforge.sampling import negative_rel_samples

    train = SPLIT["train2id"]
    neg = negative_rel_samples(spark.createDataFrame(train), n_rel=5, neg_per_pos=1).toPandas()
    assert len(neg) == len(train)  # exactly one per positive
    known = set(map(tuple, train[["h", "t", "r"]].itertuples(index=False)))
    got = set(map(tuple, neg[["h", "t", "r"]].itertuples(index=False)))
    assert got and not (got & known)
    # only the relation is corrupted: every (h, t) must exist in train
    ht = set(map(tuple, train[["h", "t"]].itertuples(index=False)))
    assert all((h, t) in ht for h, t, _ in got)


def test_training_batches(spark):
    from kgforge.sampling import training_batches

    train = SPLIT["train2id"]
    b = training_batches(
        spark.createDataFrame(train), n_ent=60, n_rel=5, nbatches=4, neg_ent=1, neg_rel=1
    ).toPandas()
    assert set(b["batch_id"]) == {0, 1, 2, 3}
    assert set(b["y"]) == {1, -1}
    assert (b[b["y"] == 1].groupby(["h", "t", "r"]).size() == 1).all()
    assert len(b[b["y"] == 1]) == len(train)
    assert len(b[b["y"] == -1]) >= len(train)  # ent + rel negatives


def test_weighted_sample_matches_python_replay_and_proportionality(spark):
    """Efraimidis-Spirakis sample == python md5 replay (exact rows AND
    keys); aggregate selection frequency tracks weights."""
    import hashlib
    import math

    import pandas as pd

    from kgforge.sampling import weighted_sample

    n = 400
    pdf = pd.DataFrame({"k": range(n), "w": [10.0 if i % 4 == 0 else 1.0 for i in range(n)]})
    got = (
        weighted_sample(spark.createDataFrame(pdf), "k", "w", k=100, seed=7)
        .toPandas()
        .sort_values("sample_key")
        .reset_index(drop=True)
    )

    def key(i, w):
        h = hashlib.md5(f"7:{i}".encode()).hexdigest()[:15]
        u = (int(h, 16) + 1.0) / 16**15
        return round(-math.log(u) / w, 12)

    want = sorted(((key(i, w), i) for i, w in zip(pdf["k"], pdf["w"])))[:100]
    assert list(got["k"]) == [i for _, i in want]
    assert list(got["sample_key"]) == pytest.approx([s for s, _ in want], abs=0)
    # proportionality: weight-10 rows are 25% of the population but must
    # dominate the sample (expected ~77%)
    frac_heavy = (got["k"] % 4 == 0).mean()
    assert frac_heavy > 0.55
    # zero/negative weights never sampled
    pdf.loc[0, "w"] = 0.0
    pdf.loc[1, "w"] = -3.0
    got2 = weighted_sample(spark.createDataFrame(pdf), "k", "w", k=n, seed=7).toPandas()
    assert 0 not in set(got2["k"]) and 1 not in set(got2["k"])
    assert len(got2) == n - 2


def test_assign_splits_deterministic_and_proportional(spark):
    import hashlib

    from kgforge.sampling import assign_splits

    n = 2000
    df = spark.range(n).withColumnRenamed("id", "k")
    got = assign_splits(
        df, "k", {"train": 0.8, "valid": 0.1, "test": 0.1}, seed=9
    ).toPandas()

    def bucket(i):
        return int(hashlib.md5(f"9:{i}".encode()).hexdigest()[:15], 16) % 1000

    for r in got.itertuples(index=False):
        b = bucket(r.k)
        assert r.bucket == b
        assert r.split == ("train" if b < 800 else "valid" if b < 900 else "test")
    frac = got["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["valid"] - 0.1) < 0.03
    # partitioning-independent
    got2 = assign_splits(
        df.repartition(13), "k", {"train": 0.8, "valid": 0.1, "test": 0.1}, seed=9
    ).toPandas()
    assert got.sort_values("k").reset_index(drop=True).equals(
        got2.sort_values("k").reset_index(drop=True)
    )
    with pytest.raises(ValueError):
        assign_splits(df, "k", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        assign_splits(df, "k", {"a": 0.5, "b": 0.4995, "c": 0.0005})


def test_constrained_negatives_respect_domain_range(spark):
    """Type-constrained corruption: every corrupted head sits in the
    relation's domain and every corrupted tail in its range (both
    derived from train, so the UNcorrupted side trivially satisfies its
    map too — the checkable property), exact count and known-rejection
    unchanged, deterministic across partitioning."""
    import numpy as np

    train = SPLIT["train2id"]
    df = spark.createDataFrame(train)
    domains = {int(r): np.unique(g["h"].to_numpy()) for r, g in train.groupby("r")}
    ranges = {int(r): np.unique(g["t"].to_numpy()) for r, g in train.groupby("r")}
    neg = negative_samples(
        df, n_ent=60, neg_per_pos=2, mode="uniform", seed=7,
        constraints=(domains, ranges),
    ).toPandas()
    _check_negatives(neg, train)
    assert len(neg) == 2 * len(train)
    for row in neg.itertuples(index=False):
        assert row.h in domains[int(row.r)], (row, "head outside domain")
        assert row.t in ranges[int(row.r)], (row, "tail outside range")
    # partition-independent determinism (counter-based RNG contract)
    neg2 = negative_samples(
        df.repartition(13), n_ent=60, neg_per_pos=2, mode="uniform", seed=7,
        constraints=(domains, ranges),
    ).toPandas()
    key = ["h", "t", "r"]
    assert sorted(map(tuple, neg[key].values)) == sorted(map(tuple, neg2[key].values))
    # bern mode composes with constraints
    negb = negative_samples(
        df, n_ent=60, neg_per_pos=1, mode="bern", seed=7,
        constraints=(domains, ranges),
    ).toPandas()
    _check_negatives(negb, train)
    assert len(negb) == len(train)
    # a relation missing from the maps falls back to the full space
    dom_part = {k: v for k, v in domains.items() if k != 0}
    rng_part = {k: v for k, v in ranges.items() if k != 0}
    negf = negative_samples(
        df, n_ent=60, neg_per_pos=1, mode="uniform", seed=7,
        constraints=(dom_part, rng_part),
    ).toPandas()
    _check_negatives(negf, train)
    assert len(negf) == len(train)
