"""Every declarative check class has a violating fixture that (a) fails
that check in the report and (b) flips the CLI exit code — the reference
pattern of one expectation file per failure mode (SURVEY §5.2)."""

import os

from conftest import make_events
from crba_etl_spark.__main__ import main
from crba_etl_spark.checks import CheckSpec, default_suite, run_checks
from crba_etl_spark.engine import CDCEngine


def _engine_with(spark, tmpdir_, rows):
    eng = CDCEngine(spark, os.path.join(tmpdir_, "t"), n_buckets=4)
    if rows:
        eng.apply_epoch(make_events(spark, rows), 0)
    return eng


def _report_by(spark, eng, suite=None):
    rep = run_checks(spark, eng.table, suite=suite)
    return rep, {r["check"]: r for r in rep["checks"]}


GOOD = (1, 0, "I", "c1", 0, "user", "fine", None, 0, 0)


def test_in_set_violation(spark, tmpdir_):
    eng = _engine_with(spark, tmpdir_, [
        GOOD, (2, 0, "I", "c2", 0, "marsian", "bad role", None, 0, 1),
    ])
    rep, by = _report_by(spark, eng)
    assert not by["role_in_domain"]["passed"]
    assert by["role_in_domain"]["violations"] == 1
    assert not rep["all_passed"]


def test_numeric_range_violation(spark, tmpdir_):
    eng = _engine_with(spark, tmpdir_, [
        GOOD, (2, 0, "I", "c2", -7, "user", "negative turn", None, 0, 1),
    ])
    rep, by = _report_by(spark, eng)
    assert not by["turn_idx_range"]["passed"]
    assert by["turn_idx_range"]["violations"] == 1


def test_null_fraction_violation(spark, tmpdir_):
    eng = _engine_with(spark, tmpdir_, [
        GOOD,
        (2, 0, "I", "c2", 0, "user", None, None, 0, 1),
        (3, 0, "I", "c3", 0, "user", None, None, 0, 2),
    ])
    rep, by = _report_by(spark, eng)
    # 2/3 null texts > 0.5 bound
    assert not by["text_null_fraction"]["passed"]
    assert by["text_null_fraction"]["observed"] > 0.5


def test_row_count_bounds_violation(spark, tmpdir_):
    eng = _engine_with(spark, tmpdir_, [])  # empty table: min_rows=1 fails
    rep, by = _report_by(spark, eng)
    assert not by["row_count_bounds"]["passed"]
    assert by["row_count_bounds"]["observed"] == 0


def test_monotonic_violation(spark, tmpdir_):
    eng = _engine_with(spark, tmpdir_, [
        (1, 0, "I", "c1", 0, "user", "later ts", None, 100, 0),
        (2, 0, "I", "c1", 1, "user", "earlier ts", None, 5, 1),
    ])
    rep, by = _report_by(spark, eng)
    assert not by["ts_monotone_per_conv"]["passed"]


def test_custom_suite_and_max_rows(spark, tmpdir_):
    eng = _engine_with(spark, tmpdir_, [GOOD, (2, 0, "I", "c2", 0, "user", "x", None, 0, 1)])
    suite = default_suite() + [
        CheckSpec("tiny_table", "row_count", max_rows=1),
    ]
    rep, by = _report_by(spark, eng, suite=suite)
    assert not by["tiny_table"]["passed"]
    assert by["tiny_table"]["observed"] == 2


def test_cli_exit_code_flips_on_violation(spark, tmpdir_):
    bad = _engine_with(spark, tmpdir_, [
        (1, 0, "I", "c1", 0, "marsian", "bad", None, 0, 0),
    ])
    good = _engine_with(spark, os.path.join(tmpdir_, "g"), [GOOD])
    assert main(["check", "--table", bad.table.root, "--master", "local[4]"]) == 1
    assert main(["check", "--table", good.table.root, "--master", "local[4]"]) == 0
