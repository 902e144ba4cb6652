"""The `api` source adapter (SRC-API-*): distributed page fetch through
urllib + mapInPandas parse. Driven offline via file:// URLs — the exact
code path an https:// URL takes (the sandbox has no network)."""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from crba_etl_spark.sources.registry import SourceSpec, read_source

SCHEMA = T.StructType(
    [
        T.StructField("geo", T.StringType()),
        T.StructField("year", T.LongType()),
        T.StructField("obs_value", T.DoubleType()),
    ]
)


def _write_pages(d, n_pages=3):
    os.makedirs(d, exist_ok=True)
    urls, frames = [], []
    for i in range(n_pages):
        recs = [
            {"geo": f"G{i}{j}", "year": 2019 + j, "obs_value": i + j / 10.0,
             "noise": "ignored"}
            for j in range(4)
        ]
        p = os.path.join(d, f"page{i}.json")
        with open(p, "w") as f:
            json.dump({"meta": {"page": i}, "data": recs}, f)
        urls.append("file://" + p)
        frames.append(pd.DataFrame(recs))
    return urls, pd.concat(frames, ignore_index=True)


def test_api_json_paginated(spark, tmpdir_):
    urls, exp = _write_pages(os.path.join(tmpdir_, "api"))
    spec = SourceSpec(
        source_id="who_api", fmt="api", path=urls[0],
        options={"urls": urls, "record_path": "data"}, schema=SCHEMA,
    )
    got = (
        read_source(spark, spec).toPandas()
        .sort_values("geo").reset_index(drop=True)
    )
    exp = exp[["geo", "year", "obs_value"]].sort_values("geo").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_api_csv_payload(spark, tmpdir_):
    p = os.path.join(tmpdir_, "data.csv")
    pd.DataFrame(
        {"geo": ["A", "B"], "year": [2020, 2021], "obs_value": [1.5, 2.5]}
    ).to_csv(p, index=False)
    spec = SourceSpec(
        source_id="wb_csv", fmt="api", path="file://" + p,
        options={"payload": "csv"}, schema=SCHEMA,
    )
    got = read_source(spark, spec).toPandas().sort_values("geo").reset_index(drop=True)
    assert got["obs_value"].tolist() == [1.5, 2.5]


def test_api_fetch_failure_names_url_and_attempts(spark, tmpdir_):
    missing = "file://" + os.path.join(tmpdir_, "nope.json")
    spec = SourceSpec(
        source_id="x", fmt="api", path=missing,
        options={"retries": 2, "record_path": "data"}, schema=SCHEMA,
    )
    with pytest.raises(Exception, match="after 2 attempts"):
        read_source(spark, spec).collect()


def test_api_schema_mismatch_names_columns(spark, tmpdir_):
    p = os.path.join(tmpdir_, "short.json")
    with open(p, "w") as f:
        json.dump({"data": [{"geo": "A", "year": 2020}]}, f)
    spec = SourceSpec(
        source_id="x", fmt="api", path="file://" + p,
        options={"record_path": "data"}, schema=SCHEMA,
    )
    with pytest.raises(Exception, match="obs_value"):
        read_source(spark, spec).collect()


def test_api_rejects_unknown_payload(spark):
    spec = SourceSpec(
        source_id="x", fmt="api", path="file:///x",
        options={"payload": "xml"}, schema=SCHEMA,
    )
    with pytest.raises(ValueError, match="xml"):
        read_source(spark, spec)
