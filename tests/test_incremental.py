"""B13 — incremental KG construction over catalog append snapshots."""

import os

import pytest
from pyspark.sql import functions as F

from kgforge.catalog import IcebergLiteTable
from kgforge.fixtures import ensure_fixtures, gazetteer, patterns_df
from kgforge.incremental import build_triples, incremental_build
from kgforge.stages.materialize import dense_ids


def test_added_data_dirs_is_the_commit_diff(spark, tmp_path):
    t = IcebergLiteTable(str(tmp_path / "tab"))
    for i in range(4):
        t.append(spark.createDataFrame([(i,)], "id long"))
    assert t.added_data_dirs(2) == ["data/v3", "data/v4"]
    assert t.added_data_dirs(2, as_of=3) == ["data/v3"]
    assert t.added_data_dirs(4) == []
    # across a compaction the diff is the rewritten dir (old dirs are
    # replaced wholesale) — a consumer diffing across a compact sees the
    # full rewrite, which is correct: those files ARE new
    t.compact(spark, target_files=1)
    assert t.added_data_dirs(4) == ["data/v5"]
    # row-level diff pinned as-of the pre-compaction snapshot (diffing
    # ACROSS the compact correctly re-includes the rewritten rows)
    assert sorted(r["id"] for r in t.read_added(spark, 2, as_of=4).collect()) == [2, 3]
    assert t.read_added(spark, 4, as_of=4).count() == 0  # empty diff, schema kept


def _dicts(spark):
    gaz = spark.createDataFrame(gazetteer())
    pats = spark.createDataFrame(patterns_df())
    e2id = dense_ids(gaz.select(F.col("canonical").alias("name")))
    r2id = dense_ids(pats.select(F.col("pred").alias("name")))
    return gaz, e2id, r2id


def test_incremental_build_equals_full_rebuild(spark, tmp_path):
    """incremental(snapshot1 + appended diff) must be SET-equal to
    rebuilding from the full current snapshot — the exactly-once
    property of the catalog-diff consumption."""
    fdir = ensure_fixtures("unit")
    trans = spark.read.parquet(os.path.join(fdir, "transcripts.parquet"))
    gaz, e2id, r2id = _dicts(spark)
    gaz_pdf, pat_pdf = gazetteer(), patterns_df()

    t = IcebergLiteTable(str(tmp_path / "tab"))
    gate = F.md5(F.col("conv_id").cast("string").cast("binary")) < "8"
    t.append(trans.where(gate))
    snap1 = t.current_snapshot_id()
    t.append(trans.where(~gate))
    # both slices are non-trivial, else the test proves nothing
    assert t.read(spark, snap1).count() > 0
    assert t.read_added(spark, snap1).count() > 0

    out1 = build_triples(t.read(spark, snap1), gaz_pdf, pat_pdf, gaz, e2id, r2id)
    inc = incremental_build(
        spark, t, snap1, out1, gaz_pdf, pat_pdf, gaz, e2id, r2id
    )
    full = build_triples(t.read(spark), gaz_pdf, pat_pdf, gaz, e2id, r2id)
    got = sorted(map(tuple, inc.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want and len(want) > 0


def test_incremental_noop_diff_is_identity(spark, tmp_path):
    fdir = ensure_fixtures("unit")
    trans = spark.read.parquet(os.path.join(fdir, "transcripts.parquet"))
    gaz, e2id, r2id = _dicts(spark)
    t = IcebergLiteTable(str(tmp_path / "tab"))
    t.append(trans)
    cur = t.current_snapshot_id()
    out = build_triples(t.read(spark), gazetteer(), patterns_df(), gaz, e2id, r2id)
    again = incremental_build(
        spark, t, cur, out, gazetteer(), patterns_df(), gaz, e2id, r2id
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))
