"""Physical-plan invariants, asserted on LIVE plans (round-1 lesson:
PLANS.md drifted after an operator change because it was prose-only).
This test also rewrites PLANS.md from the same captured plans, so the
committed document always matches the code that passed CI."""

import re
import sys

sys.path.insert(0, "/root/repo/scripts")

from dump_plans import SF, build_sections, plan_of, write_plans_md

from crba_etl_spark import queries as Q


def _by_title(sections):
    return {t.split(" (")[0]: p for t, _w, p in sections}


def test_plan_invariants_and_regenerate_plans_md(spark):
    sections = build_sections(spark)
    plans = _by_title(sections)

    # --- CDC apply: ONE exchange, partial max_by map-side combine ------
    cdc = plans["CDC epoch apply"]
    assert len(re.findall(r"Exchange hashpartitioning", cdc)) == 1
    assert "partial_max_by" in cdc  # map-side combine (hot-key defense)
    assert "max_by" in cdc

    # --- scan: pushdown + pruning ---------------------------------------
    scan = plans["Predicate pushdown + column pruning"]
    assert "LessThan(l_shipdate" in scan  # PushedFilters reached parquet
    assert "l_comment" not in scan  # ReadSchema pruned to needed columns

    # --- star join: dims broadcast, fact not shuffled against them ------
    star = plans["Star join with broadcast dimensions"]
    assert "BroadcastHashJoin" in star

    # --- every LSH path: equi-joins only, never nested-loop/cartesian ---
    for name in (
        "MinHash + banded LSH candidate pairs",
        "Hyperplane-LSH embedding near-dup",
        "SimHash Hamming-radius search",
    ):
        p = plans[name]
        assert "BroadcastNestedLoopJoin" not in p, name
        assert "CartesianProduct" not in p, name

    # the exact all-pairs baseline is the ONLY place a nested-loop join
    # is allowed to exist (it is the verification oracle, not the path)
    exact = plan_of(Q.q_cosine_near_dup_exact(spark, SF))
    assert "BroadcastNestedLoopJoin" in exact or "CartesianProduct" in exact

    write_plans_md(sections)
