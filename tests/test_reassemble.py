"""B1: stable turn ordering — per-turn text equality invariant
(BASELINE.json input_hint: 'per-turn text equality under stable turn
ordering')."""

import pandas as pd
from pyspark.sql import functions as F

from kgforge.fixtures import gen_transcripts
from kgforge.stages.reassemble import conversation_text, conversations, ordered_turns


def test_ordered_turns_recovers_generation_order(spark):
    t, _, _m = gen_transcripts(30)
    df = spark.createDataFrame(t)  # rows arrive shuffled (generator shuffles)
    got = (
        ordered_turns(df)
        .select("conv_id", "turn_idx", "turn_rank", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # turn_rank must equal turn_idx+1 (contiguous turns in fixture)
    assert (got["turn_rank"] == got["turn_idx"] + 1).all()
    # per-turn text equality vs the unshuffled source of truth
    want = t.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_series_equal(got["text"], want["text"], check_names=False)


def test_conversations_array_is_sorted(spark):
    t, _, _m = gen_transcripts(10)
    df = spark.createDataFrame(t)
    convs = conversations(df).toPandas()
    assert (convs["n_turns"] > 0).all()
    for _, row in convs.iterrows():
        idxs = [turn["turn_idx"] for turn in row["turns"]]
        assert idxs == sorted(idxs)
        assert len(idxs) == row["n_turns"]


def test_conversation_text_matches_pandas_oracle(spark):
    t, _, _m = gen_transcripts(10)
    df = spark.createDataFrame(t)
    got = conversation_text(df).toPandas().set_index("conv_id")["text"].to_dict()
    want = (
        t.sort_values(["conv_id", "turn_idx", "ts", "role"])
        .groupby("conv_id")["text"]
        .apply(lambda s: "\n".join(s))
        .to_dict()
    )
    assert got == want


def test_ordering_ignores_input_partitioning(spark):
    """Stable order is independent of physical row layout (repartition)."""
    t, _, _m = gen_transcripts(15)
    df = spark.createDataFrame(t).repartition(7)
    a = conversation_text(df).toPandas().sort_values("conv_id").reset_index(drop=True)
    b = (
        conversation_text(spark.createDataFrame(t).repartition(3, "role"))
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
