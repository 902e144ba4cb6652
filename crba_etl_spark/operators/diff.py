"""Cross-run / cross-snapshot table diff (SURVEY §3.3): the Spark
re-expression of the reference's final-file comparison tool
(``/root/reference/validation/comparison_of_final_files/
compare_two_final_csvs.py:3``) — per-key adds / drops / changes between
two table states, with the changed column names identified.

One FULL OUTER equi-join on the key (AQE-sized; at 100 TB both sides are
bucket-partitioned icelite reads of the SAME table, so the join is
co-partitioned and prunes to the buckets that exist) — no driver-side
row comparison anywhere.
"""

from __future__ import annotations

from functools import reduce as _reduce

from pyspark.sql import DataFrame, SparkSession, functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two table states keyed by ``key_cols``.

    Output: key cols + ``status`` ('added' | 'dropped' | 'changed') +
    ``changed_cols`` (array of column names whose values differ,
    null-safe) + ``old_<c>`` / ``new_<c>`` for every compared column.
    Unchanged rows are excluded. A column present only in ``new``
    (additive schema evolution) reads as NULL on the old side.
    """
    compare = compare_cols or [c for c in new.columns if c not in key_cols]
    aligned_old = old
    for c in compare:
        if c not in aligned_old.columns:
            dtype = dict(zip(new.columns, [f.dataType for f in new.schema.fields]))[c]
            aligned_old = aligned_old.withColumn(c, F.lit(None).cast(dtype))
    o = aligned_old.select(
        *key_cols,
        *[F.col(c).alias(f"old_{c}") for c in compare],
        F.lit(1).alias("_old_present"),
    )
    n = new.select(
        *key_cols,
        *[F.col(c).alias(f"new_{c}") for c in compare],
        F.lit(1).alias("_new_present"),
    )
    j = o.join(n, key_cols, "full_outer")
    col_diff = {
        c: ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")) for c in compare
    }
    any_diff = _reduce(lambda a, b: a | b, col_diff.values())
    status = (
        F.when(F.col("_old_present").isNull(), "added")
        .when(F.col("_new_present").isNull(), "dropped")
        .when(any_diff, "changed")
    )
    # only meaningful for 'changed' rows — an added/dropped row trivially
    # differs in every column
    changed_cols = F.when(
        F.col("_old_present").isNotNull() & F.col("_new_present").isNotNull(),
        F.array_compact(F.array(*[F.when(col_diff[c], F.lit(c)) for c in compare])),
    ).otherwise(F.array().cast("array<string>"))
    return (
        j.select(
            *key_cols,
            status.alias("status"),
            changed_cols.alias("changed_cols"),
            *[F.col(f"old_{c}") for c in compare],
            *[F.col(f"new_{c}") for c in compare],
        )
        .filter(F.col("status").isNotNull())
    )


def snapshot_diff(
    spark: SparkSession,
    table,
    v_old: int,
    v_new: int | None = None,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two retained snapshot versions of an icelite table (time
    travel): what a replayed epoch range added / dropped / changed."""
    old = table.read(spark, version=v_old)
    new = table.read(spark, version=v_new)
    return table_diff(old, new, table.key_cols(), compare_cols)


def diff_summary(diff: DataFrame) -> dict:
    """{'added': n, 'dropped': n, 'changed': n} in one aggregation."""
    row = diff.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    out = {"added": 0, "dropped": 0, "changed": 0}
    out.update({r["status"]: int(r["n"]) for r in row})
    return out
