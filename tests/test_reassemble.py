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


def test_conversation_profile_matches_manual(spark):
    import datetime as dt

    from kgforge.stages.reassemble import conversation_profile

    def ts(m, s=0):
        return dt.datetime(2026, 1, 1, 0, m, s)

    rows = [
        # c1: gaps 60s then 180s; one tool call on an assistant turn
        ("c1", 0, "user", "hi there", None, ts(0)),
        ("c1", 1, "assistant", "hello!", "calc", ts(1)),
        ("c1", 2, "tool", "42", "calc", ts(4)),
        # c2: single turn -> duration 0, gap 0
        ("c2", 0, "user", "solo", None, ts(10)),
        # c3: same-ts turns ordered by turn_idx -> gap 0 then 30
        ("c3", 1, "assistant", "b", None, ts(20)),
        ("c3", 0, "user", "aaaa", None, ts(20)),
        ("c3", 2, "user", "c", None, ts(20, 30)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {r["conv_id"]: r.asDict() for r in conversation_profile(df).collect()}
    assert got["c1"]["n_turns"] == 3 and got["c1"]["n_roles"] == 3
    assert got["c1"]["n_user"] == 1 and got["c1"]["n_assistant"] == 1
    assert got["c1"]["n_tool_turns"] == 1 and got["c1"]["n_tool_calls"] == 2
    assert got["c1"]["duration_sec"] == 240 and got["c1"]["max_gap_sec"] == 180
    assert got["c1"]["avg_turn_chars"] == round((8 + 6 + 2) / 3, 9)
    assert got["c2"]["duration_sec"] == 0 and got["c2"]["max_gap_sec"] == 0
    assert got["c3"]["n_turns"] == 3 and got["c3"]["max_gap_sec"] == 30
    assert got["c3"]["duration_sec"] == 30
