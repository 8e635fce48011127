"""A3–A6 — relation skew stats + negative sampling (uniform & bern).

Reference semantics (OpenKEonSpark ``base/Corrupt.h::corrupt_head/
corrupt_tail`` + ``base/Base.cpp::sampling``, recalled — SURVEY.md §0):

* A3: per-relation mean tails-per-head (tph) and heads-per-tail (hpt).
* A4 uniform: corrupt h or t with a uniform random entity; reject
  corruptions that form a *known* triple (the reference binary-searches
  its sorted triple arrays; we use a distributed ``left_anti`` join).
* A5 bern (Wang et al. 2014): corrupt the head with probability
  ``tph/(tph+hpt)`` for the triple's relation, else the tail — fewer
  false negatives on skewed relations.

Determinism without partition-dependence: candidate entities come from a
counter-based hash (splitmix64 over (h, t, r, seed, attempt)) computed
vectorized in NumPy — the same row yields the same corruption no matter
how Spark partitions the data. Rejection via one ``left_anti`` join per
attempt round, oversampling absorbs most rejections in round one.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NEG_SCHEMA = "h long, t long, r long, y int"


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the counter-based RNG for sampling."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def bern_stats(triples: DataFrame) -> DataFrame:
    """A3: per-relation ``tph`` and ``hpt`` via two-level aggregation.

    Output: ``r, tph, hpt`` (doubles). Two hash aggregations, partial
    map-side combine automatic; result is relation-cardinality small →
    broadcast into the sampling UDF.
    """
    tph = (
        triples.groupBy("r", "h").agg(F.countDistinct("t").alias("n"))
        .groupBy("r").agg(F.avg("n").alias("tph"))
    )
    hpt = (
        triples.groupBy("r", "t").agg(F.countDistinct("h").alias("n"))
        .groupBy("r").agg(F.avg("n").alias("hpt"))
    )
    return tph.join(hpt, "r")


def _corrupt_pandas(
    pdf: pd.DataFrame,
    n_ent: int,
    neg_per_pos: int,
    seed: int,
    bern_p: dict[int, float] | None,
    attempt: int,
) -> pd.DataFrame:
    """One vectorized corruption round for a batch of positive triples."""
    B = len(pdf)
    h = pdf["h"].to_numpy(np.uint64)
    t = pdf["t"].to_numpy(np.uint64)
    r = pdf["r"].to_numpy(np.uint64)
    # tile for neg_per_pos corruptions per positive
    k = np.arange(neg_per_pos, dtype=np.uint64)
    H = np.repeat(h, neg_per_pos)
    T = np.repeat(t, neg_per_pos)
    R = np.repeat(r, neg_per_pos)
    K = np.tile(k, B)
    base = (
        H * np.uint64(0x100000001B3)
        ^ T * np.uint64(0x1000193)
        ^ R * np.uint64(0x9E3779B1)
        ^ K
        ^ np.uint64(seed * 2654435761 + attempt * 0x5DEECE66D)
    )
    cand = (splitmix64(base) % np.uint64(n_ent)).astype(np.int64)
    # decide which side to corrupt
    if bern_p is None:
        corrupt_head = (splitmix64(base ^ np.uint64(0xABCDEF)) & np.uint64(1)).astype(bool)
    else:
        p = np.array([bern_p.get(int(x), 0.5) for x in R], dtype=np.float64)
        u = (splitmix64(base ^ np.uint64(0xABCDEF)) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        corrupt_head = u < p
    nh = np.where(corrupt_head, cand, H.astype(np.int64))
    nt = np.where(corrupt_head, T.astype(np.int64), cand)
    out = pd.DataFrame({"h": nh, "t": nt, "r": R.astype(np.int64)})
    out["y"] = np.int32(-1)
    # drop degenerate corruptions equal to the positive
    keep = ~((out["h"].to_numpy() == H.astype(np.int64)) & (out["t"].to_numpy() == T.astype(np.int64)))
    return out[keep]


def negative_samples(
    triples: DataFrame,
    n_ent: int,
    neg_per_pos: int = 1,
    mode: str = "uniform",
    seed: int = 42,
    stats: DataFrame | None = None,
    known: DataFrame | None = None,
) -> DataFrame:
    """A4/A5: negatives for each positive, filtered against known triples.

    Returns ``(h, t, r, y=-1)``. ``known`` defaults to ``triples``.
    Oversample-and-reject: each attempt round regenerates only for the
    shortfall via a different counter offset; the known-triple rejection
    is one ``left_anti`` join per round (broadcast when small, sort-merge
    + AQE otherwise — never a driver-side set at scale).
    """
    if mode not in ("uniform", "bern"):
        raise ValueError(mode)
    bern_p: dict[int, float] | None = None
    if mode == "bern":
        st = (stats if stats is not None else bern_stats(triples)).toPandas()
        bern_p = {int(row.r): float(row.tph / (row.tph + row.hpt)) for row in st.itertuples()}
    known = known if known is not None else triples
    pos = triples.select("h", "t", "r")

    # oversample 2x, reject known/degenerate, dedup — absorbs rejections in
    # one pass (the reference retries per-row in C++; a distributed engine
    # batches the retry as oversampling).
    n_gen = max(neg_per_pos * 2, neg_per_pos + 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _corrupt_pandas(pdf, n_ent, n_gen, seed, bern_p, 0)

    cand = pos.mapInPandas(gen, _NEG_SCHEMA)
    good = cand.join(known.select("h", "t", "r"), ["h", "t", "r"], "left_anti")
    return good.dropDuplicates(["h", "t", "r"])


def negative_rel_samples(
    triples: DataFrame,
    n_rel: int,
    neg_per_pos: int = 1,
    seed: int = 42,
    known: DataFrame | None = None,
) -> DataFrame:
    """A6's ``negative_rel`` path: corrupt the *relation* uniformly,
    rejecting corruptions that form a known triple (reference
    ``base/Base.cpp::sampling`` negRel branch, recalled — SURVEY.md §0).
    """
    known = known if known is not None else triples
    n_gen = max(neg_per_pos * 2, neg_per_pos + 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["h"].to_numpy(np.uint64)
            t = pdf["t"].to_numpy(np.uint64)
            r = pdf["r"].to_numpy(np.uint64)
            H = np.repeat(h, n_gen)
            T = np.repeat(t, n_gen)
            R = np.repeat(r, n_gen)
            K = np.tile(np.arange(n_gen, dtype=np.uint64), len(pdf))
            base = (
                H * np.uint64(0x100000001B3)
                ^ T * np.uint64(0x1000193)
                ^ R * np.uint64(0x9E3779B1)
                ^ K
                ^ np.uint64(seed * 0x5DEECE66D + 0xC0FFEE)
            )
            nr = (splitmix64(base) % np.uint64(n_rel)).astype(np.int64)
            out = pd.DataFrame(
                {"h": H.astype(np.int64), "t": T.astype(np.int64), "r": nr}
            )
            out["y"] = np.int32(-1)
            yield out[out["r"].to_numpy() != R.astype(np.int64)]

    cand = triples.select("h", "t", "r").mapInPandas(gen, _NEG_SCHEMA)
    good = cand.join(known.select("h", "t", "r"), ["h", "t", "r"], "left_anti")
    return good.dropDuplicates(["h", "t", "r"])


def training_batches(
    triples: DataFrame,
    n_ent: int,
    n_rel: int,
    nbatches: int = 8,
    neg_ent: int = 1,
    neg_rel: int = 0,
    mode: str = "uniform",
    seed: int = 42,
) -> DataFrame:
    """A6 batch builder: positives + entity/relation negatives with
    labels, assigned to ``nbatches`` deterministic batch ids.

    Output: ``batch_id, h, t, r, y`` — positives (y=1) first per the
    reference's batch layout, negatives y=-1; batch assignment is a
    content hash so it is partition-independent.
    """
    pos = triples.select("h", "t", "r").withColumn("y", F.lit(1))
    parts = [pos]
    if neg_ent > 0:
        parts.append(negative_samples(triples, n_ent, neg_ent, mode, seed))
    if neg_rel > 0:
        parts.append(negative_rel_samples(triples, n_rel, neg_rel, seed))
    allrows = parts[0]
    for p in parts[1:]:
        allrows = allrows.unionByName(p)
    return allrows.withColumn(
        "batch_id", F.pmod(F.hash("h", "t", "r", F.lit(seed)), F.lit(nbatches))
    ).select("batch_id", "h", "t", "r", "y")
