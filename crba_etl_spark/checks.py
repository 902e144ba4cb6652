"""Declarative invariant suite → quality_report (M-checks).

The Spark re-expression of the reference's great_expectations validation
stage (``/root/reference/validation/run_sdmx_indicator_check.py:1-3``,
suites ``sdmx_indicator_suite.json:3 (size=15322)`` /
``crba_final_file_suite.json:3 (size=738)``): each check is one Spark
aggregation over the live table; results land in a ``quality_report``
JSON/table, and the CLI exit code reflects pass/fail (CI-gateable).

Every check computes a violation COUNT in a single pass where possible —
no per-row Python, no collect of data rows.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

ALLOWED_ROLES = ("user", "assistant", "system", "tool")


def _violations(df: DataFrame) -> list[tuple[str, F.Column]]:
    """check name → violation-count aggregate column (0 == pass)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    with_prev = df.withColumn("_prev_ts", F.lag("ts").over(w))
    return with_prev, [
        ("non_null_keys", F.sum(
            (F.col("conv_id").isNull() | F.col("turn_idx").isNull()).cast("long"))),
        ("non_null_role", F.sum(F.col("role").isNull().cast("long"))),
        ("role_in_domain", F.sum(
            (~F.col("role").isin(*ALLOWED_ROLES)).cast("long"))),
        ("ts_monotone_per_conv", F.sum(
            (F.col("_prev_ts") > F.col("ts")).cast("long"))),
    ]


def run_checks(
    spark: SparkSession, table, report_dir: str | None = None
) -> dict:
    """Run the invariant suite over the table's live view. Returns (and
    optionally persists) the quality report."""
    t0 = time.monotonic()
    df = table.read(spark)

    with_prev, checks = _violations(df)
    agg = with_prev.agg(
        F.count(F.lit(1)).alias("_rows"),
        *[c.alias(name) for name, c in checks],
    ).collect()[0]

    # key uniqueness needs its own aggregation shape
    dup_keys = (
        df.groupBy("conv_id", "turn_idx")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )

    results = [
        {"check": name, "violations": int(agg[name] or 0), "passed": not (agg[name] or 0)}
        for name, _ in checks
    ]
    results.append(
        {"check": "key_uniqueness", "violations": int(dup_keys), "passed": dup_keys == 0}
    )

    report = {
        "table": table.root,
        "snapshot_version": table.snapshot()["version"],
        "rows": int(agg["_rows"]),
        "checks": results,
        "all_passed": all(r["passed"] for r in results),
        "elapsed_s": round(time.monotonic() - t0, 3),
    }
    if report_dir:
        os.makedirs(report_dir, exist_ok=True)
        path = os.path.join(
            report_dir, f"quality_report_v{report['snapshot_version']:06d}.json"
        )
        with open(path, "w") as f:
            json.dump(report, f, indent=1)
    return report
