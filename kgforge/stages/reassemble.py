"""Stage B1 — turn reassembly under stable (conv_id, turn_idx) ordering.

The per-row invariant of the driver contract (BASELINE.json input_hint):
per-turn text equality under stable turn ordering. The total order is
``(turn_idx, ts, role)`` — turn_idx is the primary key within a
conversation, ts and role are deterministic tie-breaks so the order is
total even on malformed input with duplicate turn_idx.

Scale: ``row_number`` over a window partitioned by ``conv_id`` shuffles
once on conv_id; AQE skew handling splits hot conversations
(fixtures have ~2% conversations at ~40× median turns). The
``conversations`` rollup uses ``collect_list`` + ``array_sort`` — one
shuffle, no window sort needed, and sorting happens post-aggregation on
each conversation's own array (bounded by max conversation length, not
partition size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Transcripts + ``turn_rank`` (1-based stable position within conv)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts", "role")
    return transcripts.withColumn("turn_rank", F.row_number().over(w).cast("long"))


def conversations(transcripts: DataFrame) -> DataFrame:
    """One row per conversation with its turns as an ordered struct array.

    ``array_sort`` on ``struct(turn_idx, ts, role, text, tool)`` sorts by
    the struct fields left-to-right — the same total order as
    :func:`ordered_turns`, but without a window (single shuffle on the
    groupBy, partial aggregation map-side).
    """
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "ts", "role", "text", "tool"))
            ).alias("turns"),
            F.count("*").alias("n_turns"),
        )
    )


def conversation_text(transcripts: DataFrame, sep: str = "\n") -> DataFrame:
    """Reassembled full-conversation text (ordered), for downstream NLP.

    Output: ``conv_id, n_turns, text``.
    """
    convs = conversations(transcripts)
    return convs.select(
        "conv_id",
        "n_turns",
        F.array_join(F.transform("turns", lambda t: t["text"]), sep).alias("text"),
    )


def conversation_profile(transcripts: DataFrame) -> DataFrame:
    """Per-conversation structural profile of the transcript table —
    the input-side analytics a pipeline owner reads before extraction:
    ``(conv_id, n_turns, n_roles, n_user, n_assistant, n_tool_turns,
    n_tool_calls, duration_sec, avg_turn_chars, max_gap_sec)``.

    * ``n_tool_turns`` counts role='tool' turns; ``n_tool_calls``
      counts turns with a non-null ``tool`` column (an assistant turn
      that invoked a tool also counts) — the two disagree exactly where
      tool output was inlined, which is worth surfacing;
    * ``duration_sec`` / ``max_gap_sec``: wall span and the largest
      inter-turn gap under the stable (ts, turn_idx) ordering — the
      session-boundary signal for long-running agent conversations.
      Whole-second integer diffs (``timestampdiff``): timezone-free on
      TIMESTAMP_NTZ columns (an epoch cast would route through the
      session timezone) and exact on the second-aligned fixture.

    Plan: ONE window pass (lag over the conv partition, the same
    ordering contract B1 uses) feeding ONE groupBy(conv_id) with every
    metric as a conditional aggregate — a single shuffle on conv_id;
    conversation skew bounds a partition at the conversation's own turn
    count (the pipeline's documented hot-key profile). Fractions round
    at 9; counts are BIGINT — the oracle contract."""
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    gap = F.expr("timestampdiff(SECOND, _prev_ts, ts)")
    return (
        transcripts.withColumn("_prev_ts", F.lag("ts").over(w))
        .withColumn("_gap", gap)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.count_distinct("role").cast("long").alias("n_roles"),
            F.sum((F.col("role") == "user").cast("long")).cast("long").alias("n_user"),
            F.sum((F.col("role") == "assistant").cast("long"))
            .cast("long")
            .alias("n_assistant"),
            F.sum((F.col("role") == "tool").cast("long"))
            .cast("long")
            .alias("n_tool_turns"),
            F.sum(F.col("tool").isNotNull().cast("long"))
            .cast("long")
            .alias("n_tool_calls"),
            F.min("ts").alias("_min_ts"),
            F.max("ts").alias("_max_ts"),
            F.round(F.avg(F.length("text")), 9).alias("avg_turn_chars"),
            F.coalesce(F.max("_gap"), F.lit(0)).cast("long").alias("max_gap_sec"),
        )
        .withColumn(
            "duration_sec",
            F.expr("timestampdiff(SECOND, _min_ts, _max_ts)").cast("long"),
        )
        .select(
            "conv_id", "n_turns", "n_roles", "n_user", "n_assistant",
            "n_tool_turns", "n_tool_calls", "duration_sec",
            "avg_turn_chars", "max_gap_sec",
        )
    )
