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
