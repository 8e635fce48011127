"""Stages B4–B6 — entity-linking: candidate generation, translational
kernel scoring, best-link selection.

* B4: normalize the mention surface (casefold, strip punctuation) and
  broadcast-join the alias dictionary → candidate canonical entities.
  The dictionary is small; the mention table never shuffles for this.
* B5: score candidate (subj, pred, obj) id-combinations with a
  translational kernel (A7–A10) — embedding matrices broadcast once as
  NumPy, scores computed vectorized per Arrow batch
  (BASELINE.json north_star: "vectorized NumPy inside pandas UDFs —
  never per-row Python").
* B6: ``row_number() over (partition by triple order by score, s, o)``
  → rank 1 wins; deterministic tie-break on ids.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import kernels
from .extract import normalize_surface

#: session-lifetime pins for sc.broadcast handles: releasing them mid-job
#: triggers a Spark-4 ContextCleaner race ("Block broadcast_N does not
#: exist") in task-completion listeners. Bounded by #stage invocations.
_PINNED: list = []


def candidate_links(surfaced: DataFrame, gazetteer: DataFrame, col: str, out: str) -> DataFrame:
    """B4: add candidate canonical names for surface column ``col``.

    ``gazetteer``: (surface, canonical[, mtype]) Spark DF. Join is on the
    normalized surface; broadcast (dictionary-scale right side).
    """
    alias = (
        gazetteer.select(
            normalize_surface(F.col("surface")).alias("_norm"),
            F.col("canonical").alias(out),
        )
        .dropDuplicates(["_norm", out])
    )
    return (
        surfaced.withColumn("_norm", normalize_surface(F.col(col)))
        .join(F.broadcast(alias), "_norm", "left")
        .drop("_norm")
    )


def link_triples(
    spark: SparkSession,
    surface_triples: DataFrame,
    gazetteer: DataFrame,
    entity2id: DataFrame,
    relation2id: DataFrame,
    emb: dict[str, np.ndarray] | None = None,
    model: str = "transe",
    norm: int = 1,
    local_select: bool = True,
) -> DataFrame:
    """B4+B5+B6: surface triples → linked ``(..., s, p, o, link_score)``.

    Every (subj-candidate × obj-candidate) combination is scored with the
    kernel over broadcast embeddings; rank-1 per extracted triple wins.
    Unlinkable triples (no candidate for either side) are dropped — they
    feed the canonicalization stage's unseen-alias path instead.
    """
    cands = candidate_links(surface_triples, gazetteer, "subj", "subj_canon")
    cands = candidate_links(cands, gazetteer, "obj", "obj_canon")
    cands = cands.where(F.col("subj_canon").isNotNull() & F.col("obj_canon").isNotNull())

    e2 = F.broadcast(entity2id)
    r2 = F.broadcast(relation2id)
    withids = (
        cands.join(e2.withColumnRenamed("name", "subj_canon").withColumnRenamed("id", "s"), "subj_canon")
        .join(e2.withColumnRenamed("name", "obj_canon").withColumnRenamed("id", "o"), "obj_canon")
        .join(r2.withColumnRenamed("name", "pred").withColumnRenamed("id", "p"), "pred")
        # slim before the scoring UDF and the selection shuffle: every
        # byte here crosses Arrow AND the min_by exchange — canon strings
        # are recoverable from ids downstream.
        .select("conv_id", "turn_idx", "subj", "pred", "obj", "s", "p", "o")
    )

    # B6 best-link selection. Two scale-aware plans, same semantics
    # (min over (link_score, s, o) per extracted triple):
    #
    # * local_select=True (default): candidate rows for one extracted
    #   triple are *born co-partitioned* — they fan out of a single input
    #   row via broadcast joins, which never move rows — so the argmin is
    #   computable per partition with ZERO shuffle (mapInPandas groupby).
    #   The b5 oracle check guards the co-partitioning assumption.
    #   Scoring and selection are FUSED into one mapInPandas: two
    #   back-to-back pandas stages would ship the full candidate table
    #   across the Arrow boundary twice (JVM→Py→JVM→Py→JVM) for no plan
    #   benefit — both are partition-local.
    # * local_select=False: general-input path — score as its own pandas
    #   pass, then min_by hash aggregation (partial map-side combine, one
    #   shuffle, no sort; still strictly better than a window row_number
    #   which must shuffle AND sort).
    keys = ["conv_id", "turn_idx", "subj", "pred", "obj"]

    def _score(pdf: pd.DataFrame, E) -> pd.DataFrame:
        pdf["link_score"] = kernels.score_batch(
            model, E,
            pdf["s"].to_numpy(np.int64),
            pdf["p"].to_numpy(np.int64),
            pdf["o"].to_numpy(np.int64),
            norm,
        ).astype("float64")
        return pdf

    scored_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in withids.schema.fields
    ) + ", link_score double"

    if emb is not None and local_select:
        b_emb = spark.sparkContext.broadcast(emb)
        _PINNED.append(b_emb)

        def score_select(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            E = b_emb.value
            parts = [_score(p, E) for p in batches if len(p)]
            if not parts:
                return
            pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
            pdf = pdf.sort_values(["link_score", "s", "o"], kind="stable")
            yield pdf.drop_duplicates(subset=keys, keep="first")

        return withids.mapInPandas(score_select, scored_schema)

    if emb is not None:
        b_emb = spark.sparkContext.broadcast(emb)
        _PINNED.append(b_emb)

        def score_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            E = b_emb.value
            for pdf in batches:
                if len(pdf):
                    yield _score(pdf, E)

        scored = withids.mapInPandas(score_fn, scored_schema)
    else:
        scored = withids.withColumn("link_score", F.lit(0.0))

    rest = [c for c in scored.columns if c not in keys]
    if local_select:
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in scored.schema.fields
        )

        def best_local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            parts = [p for p in batches if len(p)]
            if not parts:
                return
            pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
            pdf = pdf.sort_values(["link_score", "s", "o"], kind="stable")
            yield pdf.drop_duplicates(subset=keys, keep="first")

        return scored.mapInPandas(best_local, out_schema)
    return (
        scored.groupBy(*keys)
        .agg(
            F.min_by(
                F.struct(*rest), F.struct("link_score", "s", "o")
            ).alias("_best")
        )
        .select(*keys, "_best.*")
    )
