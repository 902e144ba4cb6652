"""Declarative invariant suite → quality_report (M-checks).

The Spark re-expression of the reference's great_expectations validation
stage (``/root/reference/validation/run_sdmx_indicator_check.py:1-3``,
suites ``sdmx_indicator_suite.json:3 (size=15322)`` /
``crba_final_file_suite.json:3 (size=738)``): a suite is a list of
:class:`CheckSpec` rows — the declarative form the reference keeps in
JSON — compiled into Spark aggregations over the live table. Results
land in a ``quality_report`` JSON, and the CLI exit code reflects
pass/fail (CI-gateable).

Check classes (each one a violating-fixture test in
tests/test_checks_suite.py):

- ``not_null``       — no NULLs in the given columns
- ``in_set``         — values restricted to an allowed domain
- ``range``          — numeric values within [lo, hi]
- ``null_fraction``  — NULL share of a column bounded
- ``row_count``      — table row count within [min_rows, max_rows]
- ``monotonic``      — a column non-decreasing per key group
- ``unique_key``     — no duplicate key tuples

Compilation: every single-row check class folds into ONE aggregation
pass over the table (violation counts as conditional sums — no per-row
Python, no collect of data rows); ``monotonic`` adds a lag window before
that pass; ``unique_key`` is its own two-phase hash agg.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import SparkSession, Window, functions as F

ALLOWED_ROLES = ("user", "assistant", "system", "tool")


@dataclass(frozen=True)
class CheckSpec:
    """One declarative expectation (the reference's JSON-suite row)."""

    name: str
    kind: str
    columns: tuple = ()
    allowed: tuple = ()
    lo: float | None = None
    hi: float | None = None
    max_null_fraction: float | None = None
    min_rows: int | None = None
    max_rows: int | None = None
    key_cols: tuple = ()
    order_col: str | None = None


def default_suite() -> list[CheckSpec]:
    """The transcript-table suite (the graft's sdmx_indicator_suite)."""
    return [
        CheckSpec("non_null_keys", "not_null", columns=("conv_id", "turn_idx")),
        CheckSpec("non_null_role", "not_null", columns=("role",)),
        CheckSpec("role_in_domain", "in_set", columns=("role",), allowed=ALLOWED_ROLES),
        CheckSpec("turn_idx_range", "range", columns=("turn_idx",), lo=0, hi=1_000_000),
        CheckSpec(
            "text_null_fraction",
            "null_fraction",
            columns=("text",),
            max_null_fraction=0.5,
        ),
        CheckSpec("row_count_bounds", "row_count", min_rows=1),
        CheckSpec(
            "ts_monotone_per_conv",
            "monotonic",
            columns=("ts",),
            key_cols=("conv_id",),
            order_col="turn_idx",
        ),
        CheckSpec("key_uniqueness", "unique_key", key_cols=("conv_id", "turn_idx")),
    ]


def _agg_expr(spec: CheckSpec):
    """Violation-count aggregate for the single-pass check kinds."""
    if spec.kind == "not_null":
        cond = None
        for c in spec.columns:
            n = F.col(c).isNull()
            cond = n if cond is None else (cond | n)
        return F.sum(cond.cast("long"))
    if spec.kind == "in_set":
        (c,) = spec.columns
        return F.sum((~F.col(c).isin(*spec.allowed)).cast("long"))
    if spec.kind == "range":
        (c,) = spec.columns
        cond = F.lit(False)
        if spec.lo is not None:
            cond = cond | (F.col(c) < spec.lo)
        if spec.hi is not None:
            cond = cond | (F.col(c) > spec.hi)
        return F.sum(cond.cast("long"))
    if spec.kind == "null_fraction":
        (c,) = spec.columns
        return F.sum(F.col(c).isNull().cast("long"))
    if spec.kind == "monotonic":
        (c,) = spec.columns
        return F.sum((F.col(f"_prev_{spec.name}") > F.col(c)).cast("long"))
    raise ValueError(f"not a single-pass check kind: {spec.kind}")


def run_checks(
    spark: SparkSession,
    table,
    suite: list[CheckSpec] | None = None,
    report_dir: str | None = None,
) -> dict:
    """Run the invariant suite over the table's live view. Returns (and
    optionally persists) the quality report."""
    t0 = time.monotonic()
    suite = suite if suite is not None else default_suite()
    df = table.read(spark)

    # lag columns for monotonic checks, then ONE aggregation pass
    single_pass = [
        s for s in suite if s.kind not in ("row_count", "unique_key")
    ]
    for s in single_pass:
        if s.kind == "monotonic":
            w = Window.partitionBy(*s.key_cols).orderBy(s.order_col)
            df = df.withColumn(f"_prev_{s.name}", F.lag(s.columns[0]).over(w))
    agg = df.agg(
        F.count(F.lit(1)).alias("_rows"),
        *[_agg_expr(s).alias(s.name) for s in single_pass],
    ).collect()[0]
    rows = int(agg["_rows"])

    results = []
    for s in suite:
        if s.kind == "unique_key":
            dups = (
                table.read(spark)
                .groupBy(*s.key_cols)
                .count()
                .filter(F.col("count") > 1)
                .count()
            )
            results.append(
                {"check": s.name, "violations": int(dups), "passed": dups == 0}
            )
        elif s.kind == "row_count":
            ok = (s.min_rows is None or rows >= s.min_rows) and (
                s.max_rows is None or rows <= s.max_rows
            )
            results.append(
                {
                    "check": s.name,
                    "violations": 0 if ok else 1,
                    "observed": rows,
                    "passed": ok,
                }
            )
        elif s.kind == "null_fraction":
            nulls = int(agg[s.name] or 0)
            frac = nulls / rows if rows else 0.0
            ok = frac <= (s.max_null_fraction or 0.0)
            results.append(
                {
                    "check": s.name,
                    "violations": 0 if ok else nulls,
                    "observed": round(frac, 6),
                    "passed": ok,
                }
            )
        else:
            v = int(agg[s.name] or 0)
            results.append({"check": s.name, "violations": v, "passed": v == 0})

    report = {
        "table": table.root,
        "snapshot_version": table.snapshot()["version"],
        "rows": rows,
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


def render_report_html(report: dict) -> str:
    """Self-contained HTML data-docs page for a quality report — the
    reference's user-facing validation surface (great_expectations data
    docs, ``/root/reference/validation/great_expectations/
    great_expectations.yml:3`` with custom CSS plugins), reduced to one
    dependency-free document: a summary banner plus one row per check
    with a pass/fail badge, violation count, and observed value."""
    import html as _html

    def esc(x) -> str:
        return _html.escape(str(x))

    badge_css = (
        ".pass{background:#1a7f37;color:#fff}.fail{background:#b42318;color:#fff}"
        ".badge{display:inline-block;padding:2px 10px;border-radius:10px;"
        "font-size:12px;font-weight:600}"
    )
    status = "PASSED" if report["all_passed"] else "FAILED"
    rows_html = []
    for r in report["checks"]:
        cls = "pass" if r["passed"] else "fail"
        obs = r.get("observed", "")
        rows_html.append(
            f"<tr><td>{esc(r['check'])}</td>"
            f"<td><span class='badge {cls}'>{'pass' if r['passed'] else 'FAIL'}</span></td>"
            f"<td>{esc(r['violations'])}</td><td>{esc(obs)}</td></tr>"
        )
    return f"""<!doctype html>
<html><head><meta charset="utf-8"><title>quality report — {esc(report['table'])}</title>
<style>
body{{font-family:system-ui,sans-serif;margin:2rem;color:#1f2328}}
table{{border-collapse:collapse;min-width:40rem}}
th,td{{border:1px solid #d0d7de;padding:6px 12px;text-align:left}}
th{{background:#f6f8fa}}
.summary{{margin-bottom:1rem}}
{badge_css}
</style></head><body>
<h1>Quality report <span class="badge {'pass' if report['all_passed'] else 'fail'}">{status}</span></h1>
<p class="summary">table <code>{esc(report['table'])}</code> ·
snapshot v{esc(report['snapshot_version'])} · {esc(report['rows'])} rows ·
{sum(1 for r in report['checks'] if r['passed'])}/{len(report['checks'])} checks passed ·
{esc(report['elapsed_s'])}s</p>
<table>
<tr><th>check</th><th>status</th><th>violations</th><th>observed</th></tr>
{''.join(rows_html)}
</table></body></html>
"""


def write_report_html(report: dict, path: str) -> None:
    with open(path, "w") as f:
        f.write(render_report_html(report))
