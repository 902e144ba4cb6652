"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row (key, t_l) find the latest right row with
t_r <= t_l. Implemented as a composition of existing DataFrame ops
(SURVEY.md §2.3 "custom operators: composition first"): tag and union
both sides, then a single window pass carries the most recent right-side
values forward (`last(..., ignorenulls=True)` over rows-unbounded-
preceding). One shuffle on the key, O(n log n) per key for the sort —
the same cost profile as Flink's temporal join / DuckDB's ASOF JOIN,
and it inherits AQE skew handling on the shuffle.

Equal timestamps: the right row sorts BEFORE the left row (<= semantics,
matching DuckDB ASOF). Right-side ties on (key, t) are broken by the
highest tie_col for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + the latest ``right_values``
    as of ``left_ts`` (null when no prior right row exists)."""
    l_tag = left.withColumn("_t", F.col(left_ts)).withColumn("_is_r", F.lit(0))
    r_cols = on + [right_ts] + right_values + ([tie_col] if tie_col and tie_col not in right_values else [])
    r_tag = (
        right.select(*r_cols)
        .withColumn("_t", F.col(right_ts))
        .withColumn("_is_r", F.lit(1))
        .withColumnRenamed(right_ts, "_rts")
        .select(
            *on,
            "_t",
            "_is_r",
            F.col("_rts").alias("_r_ts"),
            *[F.col(c).alias(f"_r_{c}") for c in right_values],
        )
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    order = [F.col("_t").asc(), F.col("_is_r").desc()]
    if tie_col:
        order.append(F.col(f"_r_{tie_col}").asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # carry the WHOLE most-recent right row as one struct, not each value
    # column independently: per-column last(..., ignorenulls=True) would
    # backfill a NULL value in the newest right row from an older right
    # row, mixing fields of different rows (diverges from ASOF semantics).
    # The struct is non-null exactly for right rows — even when every
    # value inside it is null — so one carried struct = one right row.
    r_row = F.when(
        F.col("_is_r") == 1,
        F.struct(
            F.col("_r_ts").alias("ts"),
            *[F.col(f"_r_{c}").alias(c) for c in right_values],
        ),
    )
    carried = u.withColumn("_rrow", r_row).select(
        "*", F.last("_rrow", ignorenulls=True).over(w).alias("_m")
    )
    keep = (
        [c for c in left.columns]
        + [F.col("_m.ts").alias("asof_ts")]
        + [F.col(f"_m.{c}").alias(f"asof_{c}") for c in right_values]
    )
    return carried.filter(F.col("_is_r") == 0).select(*keep)
