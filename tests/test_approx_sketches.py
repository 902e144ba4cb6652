"""Accuracy of the sketch-based approximate aggregates against their
exact oracle-verified twins (round-2 VERDICT missing #6: at 100 TB the
approx forms are the ones actually run, so they must exist as registry
queries with a measured accuracy bound — the cross-engine oracle is
impossible by design, sketch internals differ per engine)."""

from crba_etl_spark import queries as Q
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_percentiles_close_to_exact(spark):
    exact = {
        r.o_orderpriority: (r.p50, r.p90, r.p99)
        for r in Q.q_order_price_quantiles(spark, SF).collect()
    }
    approx = {
        r.o_orderpriority: (r.p50, r.p90, r.p99)
        for r in Q.q_order_price_quantiles_approx(spark, SF).collect()
    }
    assert approx.keys() == exact.keys()
    for grp, ex in exact.items():
        for e, a in zip(ex, approx[grp]):
            rel = abs(a - e) / abs(e)
            assert rel <= 1e-3, f"{grp}: approx {a} vs exact {e} (rel {rel})"


def test_approx_count_distinct_close_to_exact(spark):
    ev = Q.load(spark, SF, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in Q.q_distinct_users_approx(spark, SF).collect()
    }
    assert approx.keys() == exact.keys()
    for grp, n in exact.items():
        rel = abs(approx[grp] - n) / n
        # rsd=0.01 -> typical error well under 3%; 5% is the hard bound
        assert rel <= 0.05, f"{grp}: approx {approx[grp]} vs exact {n}"
