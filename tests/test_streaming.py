"""Structured Streaming: streaming extraction == batch extraction;
watermarked windowed counts."""

import os

import pandas as pd

from kgforge import streaming
from kgforge.fixtures import gazetteer, gen_transcripts, patterns_df
from kgforge.stages.extract import extract_triples


def _stage_files(tmp_path, n_convs=25, parts=3):
    t, _, _m = gen_transcripts(n_convs)
    d = tmp_path / "in"
    d.mkdir()
    step = (len(t) + parts - 1) // parts
    for i in range(parts):
        t.iloc[i * step:(i + 1) * step].to_parquet(d / f"part-{i}.parquet", index=False)
    return str(d), t


def test_streaming_extraction_matches_batch(spark, tmp_path):
    in_dir, t = _stage_files(tmp_path)
    stream = streaming.stream_transcripts(spark, in_dir)
    tri = streaming.stream_triples(stream, gazetteer(), patterns_df())
    streaming.run_to_memory(tri, "tri_stream")
    got = (
        spark.sql("select * from tri_stream").toPandas()
        .sort_values(["conv_id", "turn_idx", "subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    want = (
        extract_triples(spark.createDataFrame(t), gazetteer(), patterns_df())
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_windowed_counts(spark, tmp_path):
    in_dir, t = _stage_files(tmp_path)
    stream = streaming.stream_transcripts(spark, in_dir)
    from pyspark.sql import functions as F

    counts = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    streaming.run_to_memory(counts, "turn_counts", mode="append")
    got = spark.sql("select * from turn_counts").toPandas()
    # availableNow + append only emits windows closed by the watermark;
    # totals must never exceed the batch count and windows are disjoint
    assert got["n"].sum() <= len(t)
    assert got["ws"].is_unique
