"""pandas_files source adapter: the distributed whole-file-per-worker
ingest for non-splittable formats (SRC-XLS / SRC-DTA, SURVEY §2.1).

- A REAL Stata (.dta) golden round-trip — read_stata is pure pandas, so
  this format is exercised end-to-end, not just its dispatch seam;
- the error surfaces: typo'd parser (plan time), missing optional
  engine (openpyxl for xlsx — executor time, clear message), schema
  columns the file lacks.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from crba_etl_spark.sources.registry import SourceSpec, read_source

SCHEMA = T.StructType(
    [
        T.StructField("country", T.StringType()),
        T.StructField("year", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_dta_files(d, n_files=3):
    os.makedirs(d, exist_ok=True)
    frames = []
    for i in range(n_files):
        df = pd.DataFrame(
            {
                "country": [f"C{i}{j}" for j in range(4)],
                "year": [2020 + j for j in range(4)],
                "value": [i * 10.0 + j for j in range(4)],
                "extra_col": ["dropme"] * 4,  # projected away by the schema
            }
        )
        df.to_stata(os.path.join(d, f"part{i}.dta"), write_index=False)
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def test_stata_files_distributed_golden(spark, tmpdir_):
    exp = _write_dta_files(os.path.join(tmpdir_, "dta"))
    spec = SourceSpec(
        source_id="who_dta",
        fmt="pandas_files",
        path=os.path.join(tmpdir_, "dta", "*.dta"),
        options={"parser": "read_stata"},
        schema=SCHEMA,
    )
    got = read_source(spark, spec).toPandas().sort_values(
        ["country"]).reset_index(drop=True)
    exp = exp[["country", "year", "value"]].sort_values(
        ["country"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert [f.name for f in read_source(spark, spec).schema.fields] == [
        "country", "year", "value",
    ]


def test_unknown_parser_rejected_at_plan_time(spark, tmpdir_):
    spec = SourceSpec(
        source_id="x", fmt="pandas_files", path=os.path.join(tmpdir_, "*"),
        options={"parser": "read_flurble"}, schema=SCHEMA,
    )
    with pytest.raises(ValueError, match="read_flurble"):
        read_source(spark, spec)


def test_excel_missing_engine_surfaces_clearly(spark, tmpdir_):
    # openpyxl is not installed in this environment: the xlsx path must
    # fail with a message naming the parser and dependency, not a bare
    # worker traceback (if openpyxl ever appears, read_excel will fail
    # on the junk bytes instead — either way a clear error, so only the
    # missing-engine message is asserted conditionally)
    p = os.path.join(tmpdir_, "junk.xlsx")
    open(p, "wb").write(b"not really a workbook")
    spec = SourceSpec(
        source_id="x", fmt="pandas_files", path=p,
        options={"parser": "read_excel"}, schema=SCHEMA,
    )
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl present; missing-engine path not reachable")
    except ImportError:
        pass
    with pytest.raises(Exception, match="read_excel"):
        read_source(spark, spec).collect()


def test_schema_mismatch_names_missing_columns(spark, tmpdir_):
    d = os.path.join(tmpdir_, "csv")
    os.makedirs(d)
    pd.DataFrame({"country": ["A"], "year": [2020]}).to_csv(
        os.path.join(d, "f.csv"), index=False
    )
    spec = SourceSpec(
        source_id="x", fmt="pandas_files", path=os.path.join(d, "*.csv"),
        options={"parser": "read_csv"}, schema=SCHEMA,  # wants `value` too
    )
    with pytest.raises(Exception, match="value"):
        read_source(spark, spec).collect()
