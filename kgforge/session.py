"""SparkSession builder tuned for the kgforge pipeline.

Scale stance (100 TB / 1000 executors): AQE on (skew-join splitting +
partition coalescing for the hot ``conv_id`` keys), Arrow on (every
pandas UDF ships Arrow record batches), shuffle partitions sized to the
cluster not hard-coded per query, and broadcast threshold left to AQE's
runtime statistics. On a real cluster only ``master`` changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "kgforge",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with kgforge defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    in the sandbox; on a cluster pass None and let spark-submit decide.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_MASTER_SET"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)

    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("KGFORGE_SHUFFLE_PARTITIONS", "32"))

    conf = {
        # Arrow transport for every pandas UDF / toPandas boundary.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # measured: 4096-row batches make pandas-UDF per-batch overhead the
        # dominant extraction cost (45.6s -> 26.7s at 16k on the bench
        # corpus); 32k keeps batches ~MB-sized for transcript-length text
        "spark.sql.execution.arrow.maxRecordsPerBatch": "16384",
        # AQE: runtime coalescing + skew-join splitting (conv_id hot keys).
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # Keep timestamps deterministic across JVM/Arrow/DuckDB comparisons.
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        # Quieter driver in tests.
        "spark.ui.enabled": os.environ.get("KGFORGE_SPARK_UI", "false"),
        "spark.driver.memory": os.environ.get("KGFORGE_DRIVER_MEM", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tiny_df(spark, rows, schema: str):
    """``createDataFrame`` for SMALL driver-side row lists via a pandas
    frame (Arrow path). The plain list path parallelizes into
    ``defaultParallelism`` pickled slices — measured ~4 s per call for a
    32-row frame at local[32] vs ~0.15 s through pandas. Values are kept
    as Python objects (object dtype), so the non-Arrow fallback never
    sees numpy scalars (the round-3 incident class)."""
    import pandas as pd

    if not rows:
        return spark.createDataFrame([], schema)
    cols = [f.split()[0] for f in schema.split(",")]
    pdf = pd.DataFrame(list(rows), columns=cols, dtype=object)
    return spark.createDataFrame(pdf, schema)


def ensure_min_partitions(df, n: int | None = None):
    """Repartition ``df`` up to ``n`` partitions if it has fewer.

    Guard for compute-heavy pandas-UDF stages fed by a small file count:
    a single-file parquet read arrives as 1 split, serializing the UDF
    onto one core (measured 5.7 s vs 1.6 s for MinHash signatures at
    sf0.1). At corpus scale inputs carry thousands of splits and this is
    a no-op — the shuffle only ever happens on inputs small enough for
    it to be cheap.
    """
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
