"""Regenerate PLANS.md: captured physical plans for the load-bearing
queries, with commentary on what each plan proves at scale. Run:
    python scripts/dump_plans.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from crba_etl_spark import queries as Q
from crba_etl_spark.operators.dedup import reduce_batch
from crba_etl_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    spark = get_spark(master="local[4]", app_name="dump-plans")
    sections = []

    # 1. the CDC epoch apply (single-shuffle path)
    from __spark_entry__ import _events_as_cdc

    cdc = _events_as_cdc(spark, SF).repartition(8, F.col("conv_id"))
    red = reduce_batch(cdc)
    from crba_etl_spark.icelite import BUCKET_COL, bucket_expr

    delta = red.withColumn(BUCKET_COL, bucket_expr(8))
    sections.append((
        "CDC epoch apply (repartition → reduce → bucketed delta)",
        """What to look for: exactly ONE `Exchange hashpartitioning(conv_id, N)`
(the repartition); `partial_max` + final aggregate with NO second
exchange (map-side combine = the Zipf-hot-key defense); the write adds
no shuffle because rows already sit in their bucket's partition.""",
        plan_of(delta),
    ))

    # 2. filter pushdown + column pruning
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") < "1995-01-01").select("l_orderkey")
    sections.append((
        "Predicate pushdown + column pruning",
        """`PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate, ...)]`
reaches the parquet scan and `ReadSchema` carries only the two needed
columns — at 100 TB the scan reads a fraction of the table.""",
        plan_of(q),
    ))

    # 3. broadcast star join
    sections.append((
        "Star join with broadcast dimensions (revenue_by_nation)",
        """Dimension sides show `BroadcastHashJoin` / `BroadcastExchange` —
no shuffle of the fact table against small dims.""",
        plan_of(Q.q_revenue_by_nation(spark, SF)),
    ))

    # 4. minhash LSH candidates
    sections.append((
        "MinHash + banded LSH candidate pairs",
        """All hashing is Catalyst expressions (md5/conv) inside
WholeStageCodegen; candidates come from an equi-join on (band_idx,
band_hash) — uniform keys, no skew; the quadratic Jaccard verification
join runs only on candidates.""",
        plan_of(Q.q_minhash_lsh_candidates(spark, SF)),
    ))

    with open("/root/repo/PLANS.md", "w") as f:
        f.write(
            "# PLANS — captured physical plans for the load-bearing operators\n\n"
            "Regenerate with `python scripts/dump_plans.py` (sf0.01 inputs; plan\n"
            "shapes are scale-independent). Commentary first, raw plan after.\n"
        )
        for title, why, plan in sections:
            f.write(f"\n## {title}\n\n{why}\n\n```\n{plan}\n```\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
