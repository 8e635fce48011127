"""Data-quality validation over tabular inputs — the gate a 100 TB
training-data pipeline runs BEFORE spending cluster-hours on a corrupt
drop: column profiling, declarative expectation checks, and
referential-integrity (foreign-key) validation, each emitted as a tall
report table a scheduler can assert on.

Scale posture shared by every operator here:

* **Single scan.** Each report derives from ONE pass over the input
  (conditional aggregates folded into one ``agg``); the only extra
  exchanges are the inherent ones (distinct counts, uniqueness
  group-bys, the FK anti-join).
* **JVM-side only.** Pure built-in column expressions — no Python UDFs
  anywhere, so the whole report stays in whole-stage codegen.
* **Mergeable metrics.** Counts and conditional counts are map-side
  partial; the approximate-distinct path uses HyperLogLog++
  (``approx_count_distinct``), the same mergeable-sketch contract as
  ``textops.length_quantiles(exact=False)``.
* **Deterministic output.** Fractions are ``round(…, 9)``; report rows
  carry explicit BIGINT counts so any engine (and the DuckDB oracles)
  reproduce them hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, columns: list[str], exact_distinct: bool = True
) -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_null, null_frac,
    n_distinct)`` — one report row per requested column.

    One aggregation computes every metric in a single scan; the tall
    shape is produced by ``stack`` over the one-row wide aggregate
    (driver-side literal k, data never re-read). ``exact_distinct=True``
    uses ``count(distinct)`` — Spark plans k distinct aggregates via one
    Expand (k× row multiplication, still one scan), the right trade at
    report cardinality; at 100 TB pass ``False`` for HyperLogLog++
    sketches (no Expand, default 5 % relative error), mirroring the
    exact/approx switch on ``textops.length_quantiles``.

    ``n_distinct`` counts distinct NON-NULL values (both engines' count
    semantics), so an all-null column profiles as ``(n, n, 1.0, 0)``.
    """
    nd = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in columns:
        aggs.append(
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0))
            .cast("long")
            .alias(f"__null_{c}")
        )
        aggs.append(nd(c).cast("long").alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __nd_{c}" for c in columns
    )
    return wide.select(
        F.expr(
            f"stack({len(columns)}, {stack_args}) AS (column, n_null, n_distinct)"
        ),
        "n_rows",
    ).select(
        "column",
        "n_rows",
        "n_null",
        # try_divide: a zero-row input profiles as null_frac NULL
        # instead of an ANSI DIVIDE_BY_ZERO error
        F.round(F.try_divide(F.col("n_null"), F.col("n_rows")), 9).alias("null_frac"),
        "n_distinct",
    )


def expect_not_null(column: str) -> dict:
    return {"rule": "not_null", "column": column, "cond": F.col(column).isNull()}


def expect_between(column: str, lo, hi) -> dict:
    """Violation = value outside [lo, hi] (NULLs pass — pair with
    ``expect_not_null`` to forbid them; keeping the two independent is
    what lets a report distinguish missing from out-of-range)."""
    return {
        "rule": "between",
        "column": column,
        "cond": F.col(column).isNotNull()
        & ~F.col(column).between(F.lit(lo), F.lit(hi)),
    }


def expect_in(column: str, values: list) -> dict:
    return {
        "rule": "accepted_values",
        "column": column,
        "cond": F.col(column).isNotNull() & ~F.col(column).isin(values),
    }


def expect_rlike(column: str, pattern: str) -> dict:
    return {
        "rule": "rlike",
        "column": column,
        "cond": F.col(column).isNotNull() & ~F.col(column).rlike(pattern),
    }


def expect_unique(columns: list[str]) -> dict:
    return {"rule": "unique", "column": ",".join(columns), "key": columns}


def check_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Declarative expectation report: ``(rule, column, n_violations,
    passed)`` — one row per rule, ordered (rule, column) for a stable
    report.

    All ROW-level rules (not_null / between / accepted_values / rlike)
    fold into ONE conditional-sum aggregation — a single scan no matter
    how many rules. Each ``unique`` rule is inherently a groupBy on its
    key: counted as ``n_rows - n_distinct_keys`` (number of surplus
    rows), one exchange per key set. Violation counts, not failing rows:
    at 100 TB the report must stay report-sized; drill-down is a
    follow-up filter with the same predicate.
    """
    row_rules = [r for r in rules if "cond" in r]
    uniq_rules = [r for r in rules if r.get("rule") == "unique"]
    if not row_rules and not uniq_rules:
        raise ValueError("check_expectations needs at least one rule")
    parts = []
    if row_rules:
        wide = df.agg(
            *[
                F.sum(r["cond"].cast("long")).cast("long").alias(f"__v{i}")
                for i, r in enumerate(row_rules)
            ]
        )
        stack_args = ", ".join(
            f"'{r['rule']}', '{r['column']}', coalesce(__v{i}, 0L)"
            for i, r in enumerate(row_rules)
        )
        parts.append(
            wide.select(
                F.expr(
                    f"stack({len(row_rules)}, {stack_args})"
                    " AS (rule, column, n_violations)"
                )
            )
        )
    for r in uniq_rules:
        parts.append(
            df.agg(
                (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in r["key"]]))
                .cast("long")
                .alias("n_violations")
            ).select(
                F.lit("unique").alias("rule"),
                F.lit(r["column"]).alias("column"),
                "n_violations",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "column", "n_violations", (F.col("n_violations") == 0).alias("passed")
    ).orderBy("rule", "column")


def check_referential_integrity(
    pairs: list[tuple[DataFrame, str, DataFrame, str, str]],
) -> DataFrame:
    """Foreign-key validation report: for each ``(child, child_key,
    parent, parent_key, name)`` pair, one row ``(constraint, n_child,
    n_orphans, passed)`` — ``n_orphans`` counts child rows (NULL keys
    included: a NULL FK can't resolve) whose key has no parent.

    Plan per pair: one left-anti join child⋈parent on the key plus two
    count aggregates. Dimension-sized parents broadcast (AQE); a
    fact-fact pair (lineitem→orders) shuffles on the key — the
    irreducible FK-check communication, and exactly the join that
    pre-bucketing both tables by the key (``joins.write_bucketed``)
    makes exchange-free. Reports union driver-side: pair-count-sized,
    never data-sized.
    """
    parts = []
    for child, ck, parent, pk, name in pairs:
        keys = parent.select(F.col(pk).alias(ck)).dropDuplicates()
        orphans = child.select(ck).join(keys, ck, "left_anti")
        parts.append(
            child.agg(F.count(F.lit(1)).cast("long").alias("n_child")).crossJoin(
                orphans.agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
            ).select(
                F.lit(name).alias("constraint"),
                "n_child",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("passed"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("constraint")


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level reconciliation of two versions of a table (CDC /
    regression diff): full-outer join on ``keys`` classifying every
    key as ``added`` (only in right), ``removed`` (only in left),
    ``changed`` (both present, some compared column differs,
    NULL-safe) or ``unchanged``. ``changed_cols`` lists the differing
    column names comma-joined, in ``compare_cols`` order ('' unless
    changed). ``compare_cols`` defaults to the non-key columns shared
    by both sides.

    Scale shape: exactly ONE shuffle — the full-outer key join (zero
    if both sides are bucketed on the keys); the per-column compare is
    a narrow NULL-safe equality mask. This is the validation step for
    catalog upserts and incremental rebuilds: diff(incremental, full
    rebuild) must come back all-unchanged.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in left.columns if c in set(right.columns) and c not in keys
        ]
    l = left.select(*keys, *compare_cols, F.lit(1).alias("_in_l"))
    r = right.select(
        *[F.col(k).alias(f"_r_{k}") for k in keys],
        *[F.col(c).alias(f"_r_{c}") for c in compare_cols],
        F.lit(1).alias("_in_r"),
    )
    cond = None
    for k in keys:
        eq = F.col(k).eqNullSafe(F.col(f"_r_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = l.join(r, cond, "full_outer")
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(c).eqNullSafe(F.col(f"_r_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    )
    status = (
        F.when(F.col("_in_l").isNull(), F.lit("added"))
        .when(F.col("_in_r").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[F.coalesce(F.col(k), F.col(f"_r_{k}")).alias(k) for k in keys],
        status.alias("status"),
        F.when(status == "changed", F.array_join(diffs, ","))
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )


def value_anomalies(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    z: float = 3.0,
) -> DataFrame:
    """Per-group z-score outlier gate: for each ``group_col`` value,
    count rows whose ``value_col`` sits more than ``z`` population
    standard deviations from the group mean — the statistical
    drop-validation a pipeline runs on metric-bearing event streams
    (sudden sensor spikes, corrupted ingestion batches).

    Output: ``(group_key, n_events, mean_value, std_value, n_anomalies)``.

    Scale + determinism: the textbook single-pass window formulation
    would shuffle the WHOLE stream by a handful of group keys (maximal
    skew); instead this is the two-pass broadcast plan — one scan
    aggregates EXACT decimal moments per group (sum and sum-of-squares
    of the decimal(12,2)-cast values: no float accumulation order
    anywhere, map-side partials, group-count-sized result), the tiny
    stats table broadcasts back for the flag pass. Mean/std/threshold
    are one fixed double expression over the exact moments, so any
    engine replaying the formula reproduces the counts hash-exactly.
    """
    d = F.col(value_col).cast("decimal(12,2)")
    stats = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(d).alias("_sx"),
        F.sum(d * d).alias("_sx2"),
    )
    n = F.col("n_events").cast("double")
    sx = F.col("_sx").cast("double")
    sx2 = F.col("_sx2").cast("double")
    stats = stats.select(
        "_g",
        "n_events",
        (sx / n).alias("mean_value"),
        F.sqrt(F.greatest((sx2 - sx * sx / n) / n, F.lit(0.0))).alias(
            "std_value"
        ),
    )
    flagged = df.join(
        F.broadcast(stats), df[group_col] == F.col("_g")
    ).withColumn(
        "_is_anom",
        (
            F.abs(d.cast("double") - F.col("mean_value"))
            > F.lit(float(z)) * F.col("std_value")
        ).cast("int"),
    )
    return (
        flagged.groupBy(
            F.col(group_col).alias("group_key"), "n_events", "mean_value", "std_value"
        )
        .agg(F.sum("_is_anom").cast("long").alias("n_anomalies"))
        .select("group_key", "n_events", "mean_value", "std_value", "n_anomalies")
    )
