"""A15–A18: eval protocol vs an exact, independent NumPy oracle.

The oracle re-implements the reference's rank semantics (strict <,
filtered excludes known-true candidates except the target itself)
directly with loops — no code shared with kgforge.evaluate.
"""

import numpy as np
import pandas as pd
import pytest

from kgforge import kernels
from kgforge.evaluate import (
    link_prediction_metrics,
    link_prediction_ranks,
    top_k_completions,
    triple_classification,
)
from kgforge.fixtures import gen_embeddings, gen_openke_split

N_ENT, N_REL = 60, 5
SPLIT = gen_openke_split(n_ent=N_ENT, n_rel=N_REL, n_train=400, n_valid=40, n_test=40)
EMB = gen_embeddings(n_ent=N_ENT, n_rel=N_REL, dim=8)
KNOWN = pd.concat([SPLIT["train2id"], SPLIT["valid2id"], SPLIT["test2id"]])


def _oracle_ranks(test: pd.DataFrame, model="transe", norm=1) -> pd.DataFrame:
    known_set = set(map(tuple, KNOWN[["h", "t", "r"]].itertuples(index=False)))
    rows = []
    for h, t, r in test[["h", "t", "r"]].itertuples(index=False):
        def sc(hh, tt):
            return float(
                kernels.score_batch(
                    model, EMB,
                    np.array([hh]), np.array([r]), np.array([tt]), norm,
                )[0]
            )
        true_head = sc(h, t)
        rh_raw = rh_filt = 1
        for e in range(N_ENT):
            if sc(e, t) < true_head:
                rh_raw += 1
                if e == h or (e, t, r) not in known_set:
                    rh_filt += 1
        true_tail = sc(h, t)
        rt_raw = rt_filt = 1
        for e in range(N_ENT):
            if sc(h, e) < true_tail:
                rt_raw += 1
                if e == t or (h, e, r) not in known_set:
                    rt_filt += 1
        rows.append((h, t, r, rh_raw, rh_filt, rt_raw, rt_filt))
    return pd.DataFrame(
        rows,
        columns=["h", "t", "r", "rank_head_raw", "rank_head_filt", "rank_tail_raw", "rank_tail_filt"],
    )


def _oracle_relation_ranks(test: pd.DataFrame, norm=1) -> pd.DataFrame:
    """Loop oracle for relation prediction: rank true r among all |R|
    relation candidates, strict <, filtered skips known (h, cand, t)
    except the target itself. No code shared with kgforge.evaluate."""
    known_set = set(map(tuple, KNOWN[["h", "t", "r"]].itertuples(index=False)))
    rows = []
    for h, t, r in test[["h", "t", "r"]].itertuples(index=False):
        def sc(rr):
            return float(
                kernels.score_batch(
                    "transe", EMB,
                    np.array([h]), np.array([rr]), np.array([t]), norm,
                )[0]
            )
        true = sc(r)
        raw = filt = 1
        for cand in range(N_REL):
            if sc(cand) < true:
                raw += 1
                if cand == r or (h, t, cand) not in known_set:
                    filt += 1
        rows.append((h, t, r, raw, filt))
    return pd.DataFrame(
        rows, columns=["h", "t", "r", "rank_rel_raw", "rank_rel_filt"]
    )


def test_relation_ranks_match_oracle(spark):
    from kgforge.evaluate import relation_prediction_ranks

    test = SPLIT["test2id"]
    got = (
        relation_prediction_ranks(spark, spark.createDataFrame(test), EMB, KNOWN)
        .toPandas()
        .sort_values(["h", "t", "r"])
        .reset_index(drop=True)
    )
    want = (
        _oracle_relation_ranks(test)
        .drop_duplicates(["h", "t", "r"])
        .sort_values(["h", "t", "r"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_like=True
    )


@pytest.mark.parametrize(
    "model",
    ["transe", "transd", "distmult", "complex", "rotate", "simple", "rescal", "analogy", "hole"],
)
def test_ranks_match_oracle(spark, model):
    test = SPLIT["test2id"].head(15)
    got = (
        link_prediction_ranks(spark, spark.createDataFrame(test), EMB, KNOWN, model=model, norm=1)
        .toPandas()
        .sort_values(["h", "t", "r"])
        .reset_index(drop=True)
    )
    want = _oracle_ranks(test, model=model).sort_values(["h", "t", "r"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_metrics_match_manual(spark):
    test = SPLIT["test2id"].head(20)
    ranks = link_prediction_ranks(spark, spark.createDataFrame(test), EMB, KNOWN)
    m = link_prediction_metrics(ranks).toPandas().iloc[0]
    rp = ranks.toPandas()
    allr = np.concatenate([rp["rank_head_raw"], rp["rank_tail_raw"]]).astype(float)
    allf = np.concatenate([rp["rank_head_filt"], rp["rank_tail_filt"]]).astype(float)
    assert m["mr_raw"] == pytest.approx(allr.mean())
    assert m["mrr_raw"] == pytest.approx((1 / allr).mean())
    assert m["hits10_filt"] == pytest.approx((allf <= 10).mean())
    # filtered ranks never exceed raw ranks
    assert (rp["rank_head_filt"] <= rp["rank_head_raw"]).all()
    assert (rp["rank_tail_filt"] <= rp["rank_tail_raw"]).all()


def test_topk_matches_bruteforce(spark):
    q = SPLIT["test2id"].head(8)[["h", "r"]]
    got = top_k_completions(spark, spark.createDataFrame(q), EMB, k=5).toPandas()
    for (h, r), grp in got.groupby(["h", "r"]):
        s = kernels.score_batch(
            "transe", EMB,
            np.full(N_ENT, h), np.full(N_ENT, r), np.arange(N_ENT), 1,
        )
        want = np.argsort(s, kind="stable")[:5]
        assert list(grp.sort_values("rk")["candidate"]) == list(want)


BLOCKED_CASES = [
    ("transe", 1, None),
    ("transe", 2, 6),
    ("transh", 1, 6),
    ("transh", 2, 6),
    ("transd", 1, 6),
    ("transd", 2, 6),
    ("transr", 1, 6),
    ("transr", 2, 6),
    ("distmult", 1, 6),
    ("complex", 1, 6),
]


@pytest.mark.parametrize("model,norm,dec", BLOCKED_CASES)
def test_blocked_ranks_equal_broadcast(spark, model, norm, dec):
    """The relational block-nested-loop path must reproduce the broadcast
    protocol for every supported model × norm (score_decimals rounds
    both engines identically where float sums are order-dependent)."""
    from kgforge.evaluate import link_prediction_ranks_blocked

    test = spark.createDataFrame(SPLIT["test2id"].head(12))
    key = ["h", "t", "r"]
    a = (
        link_prediction_ranks(spark, test, EMB, KNOWN, model=model, norm=norm, score_decimals=dec)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    b = (
        link_prediction_ranks_blocked(
            spark, test, EMB, KNOWN, norm=norm, model=model, score_decimals=dec
        ).toPandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_blocked_category_metrics_equal_broadcast(spark):
    """The 1-1/1-N/N-1/N-N breakdown must agree between the broadcast
    and blocked rank paths — the category composition is path-agnostic."""
    from kgforge.evaluate import (
        link_prediction_metrics_by_category,
        link_prediction_ranks_blocked,
        relation_categories,
    )

    test = spark.createDataFrame(SPLIT["test2id"].head(12))
    cats = relation_categories(spark.createDataFrame(SPLIT["train2id"]))
    a = link_prediction_metrics_by_category(
        link_prediction_ranks(spark, test, EMB, KNOWN), cats
    ).toPandas().sort_values("category").reset_index(drop=True)
    b = link_prediction_metrics_by_category(
        link_prediction_ranks_blocked(spark, test, EMB, KNOWN), cats
    ).toPandas().sort_values("category").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_with_score_unknown_model_raises(spark):
    from kgforge.evaluate import link_prediction_ranks_blocked

    with pytest.raises(NotImplementedError):
        link_prediction_ranks_blocked(
            spark, spark.createDataFrame(SPLIT["test2id"].head(2)), EMB, KNOWN, model="rescal"
        ).collect()


def test_blocked_ranks_from_parquet_checkpoint(spark, tmp_path):
    """A20 + blocked eval end to end: embeddings and the known set enter
    as Parquet-backed DataFrames — zero data-sized driver pulls."""
    from kgforge.evaluate import link_prediction_ranks_blocked
    from kgforge.io_openke import read_embedding_df, write_embeddings_parquet

    d = str(tmp_path / "ckpt")
    write_embeddings_parquet(spark, EMB, d)
    known_df = spark.createDataFrame(KNOWN[["h", "t", "r"]])
    test = spark.createDataFrame(SPLIT["test2id"].head(12))
    key = ["h", "t", "r"]

    emb_dfs = {k: read_embedding_df(spark, d, k) for k in ("ent", "rel")}
    a = (
        link_prediction_ranks(spark, test, EMB, KNOWN)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    b = (
        link_prediction_ranks_blocked(spark, test, emb_dfs, known_df)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # TransR too: the checkpoint's flat (id, vec) mat component feeds the
    # relational matmul directly — all four kernels DataFrame-native
    emb_r = {k: read_embedding_df(spark, d, k) for k in ("ent", "rel", "mat")}
    ar = (
        link_prediction_ranks(spark, test, EMB, KNOWN, model="transr", score_decimals=6)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    br = (
        link_prediction_ranks_blocked(
            spark, test, emb_r, known_df, model="transr", score_decimals=6
        ).toPandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ar, br, check_dtype=False)


@pytest.mark.parametrize("model,norm", [("transe", 1), ("transh", 1), ("transr", 1), ("transd", 2)])
def test_relfilter_ranks_equal_broadcast(spark, model, norm):
    """The relational known-filter decomposition (raw broadcast ranks −
    join-scored correction) must equal the broadcast filter for every
    model, including TransR (which the blocked path can't express)."""
    from kgforge.evaluate import link_prediction_ranks_relfilter

    dec = 6 if (norm == 2 or model != "transe") else None
    test = spark.createDataFrame(SPLIT["test2id"].head(12))
    known_df = spark.createDataFrame(KNOWN[["h", "t", "r"]])
    key = ["h", "t", "r"]
    a = (
        link_prediction_ranks(spark, test, EMB, KNOWN, model=model, norm=norm, score_decimals=dec)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    b = (
        link_prediction_ranks_relfilter(
            spark, test, EMB, known_df, model=model, norm=norm, score_decimals=dec
        ).toPandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_embedding_checkpoint_roundtrip(spark, tmp_path):
    """A20: save → load → bit-identical float32 parameters, all
    components (incl. the reshaped TransR matrices), and identical
    downstream scores."""
    from kgforge.evaluate import score_triples
    from kgforge.io_openke import read_embeddings_parquet, write_embeddings_parquet

    d = str(tmp_path / "ckpt")
    write_embeddings_parquet(spark, EMB, d)
    back = read_embeddings_parquet(spark, d)
    assert set(back) == set(EMB)
    for k in EMB:
        np.testing.assert_array_equal(back[k], EMB[k].astype("float32"))
    test = spark.createDataFrame(SPLIT["test2id"].head(10))
    s0 = score_triples(spark, test, EMB, model="transr").toPandas().sort_values(["h", "t", "r"])
    s1 = score_triples(spark, test, back, model="transr").toPandas().sort_values(["h", "t", "r"])
    np.testing.assert_array_equal(s0["score"].to_numpy(), s1["score"].to_numpy())


def test_triple_classification_reasonable(spark):
    rng = np.random.default_rng(3)

    def scored(df):
        pos = df.copy()
        pos["y"] = 1
        neg = df.copy()
        neg["h"] = rng.integers(0, N_ENT, len(df))
        neg["y"] = -1
        both = pd.concat([pos, neg], ignore_index=True)
        s = kernels.score_batch(
            "transe", EMB,
            both["h"].to_numpy(), both["r"].to_numpy(), both["t"].to_numpy(), 1,
        )
        both["score"] = s.astype(float)
        return both

    sv = spark.createDataFrame(scored(SPLIT["valid2id"]))
    st = spark.createDataFrame(scored(SPLIT["test2id"]))
    thresholds, acc = triple_classification(sv, st)
    assert thresholds.count() <= N_REL
    assert 0.0 <= acc <= 1.0
    # with random embeddings accuracy hovers near chance; just sanity-band it
    assert acc >= 0.3


def test_blocked_constrained_equals_broadcast_constrained(spark):
    """Type-constrained protocol on the blocked path: domain/range
    semi-joins on the candidate table must reproduce the broadcast
    kernel's constrained ranks exactly (incl. relations ABSENT from the
    constraint maps staying unconstrained)."""
    from kgforge.evaluate import link_prediction_ranks_blocked

    # constraints for relations 0..2 only; 3..4 unconstrained on purpose
    domains = {
        int(r): np.unique(g["h"].to_numpy())
        for r, g in KNOWN.groupby("r") if int(r) < 3
    }
    ranges = {
        int(r): np.unique(g["t"].to_numpy())
        for r, g in KNOWN.groupby("r") if int(r) < 3
    }
    test = spark.createDataFrame(SPLIT["test2id"].head(15))
    key = ["h", "t", "r"]
    a = (
        link_prediction_ranks(
            spark, test, EMB, KNOWN, constraints=(domains, ranges)
        ).toPandas().sort_values(key).reset_index(drop=True)
    )
    b = (
        link_prediction_ranks_blocked(
            spark, test, EMB, KNOWN, constraints=(domains, ranges)
        ).toPandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_kernel_leaderboard_consistent_with_individual_metrics(spark):
    """a17_kernel_leaderboard must agree with the standalone metric
    query kernel-by-kernel: the transe row (unrounded scores, same as
    a17_link_prediction_metrics) is pinned exactly, every oracle-backed
    kernel appears exactly once, and the filtered protocol dominates the
    raw protocol on every row (filtering can only remove competitors
    ranked above the gold candidate)."""
    import __spark_entry__ as em

    qs = em.queries()
    lb = qs["a17_kernel_leaderboard"](spark, "fixtures/sf0.01").toPandas()
    assert list(lb["model"]) == [
        "transe", "transh", "distmult", "complex", "rotate", "analogy", "hole"
    ]
    single = qs["a17_link_prediction_metrics"](spark, "fixtures/sf0.01").toPandas()
    transe_row = (
        lb[lb["model"] == "transe"].drop(columns=["model"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(transe_row, single, check_dtype=False)
    assert (lb["mrr_filt"] >= lb["mrr_raw"] - 1e-12).all()
    assert (lb["mr_filt"] <= lb["mr_raw"] + 1e-12).all()
    for k in (1, 3, 10):
        assert (lb[f"hits{k}_filt"] >= lb[f"hits{k}_raw"] - 1e-12).all()
