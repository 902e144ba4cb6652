"""Source adapters: format → reader, config-row driven.

Spark-first mapping of the reference's adapter classes (SURVEY.md §2.1):

- SRC-CSV / SRC-JSON / parquet → native ``spark.read`` with explicit
  schema when given (no inference in production paths);
- SRC-XLS / SRC-DTA (pandas-only formats) → driver-side pandas read for
  small dimension files, or distributed ``mapInPandas`` over a file list
  for many files (each worker parses whole files — the format is not
  splittable, the *file list* is the parallelism unit);
- change-stream source → the epoch-partitioned parquet tail
  (streaming variant in crba_etl_spark.streaming.tail).

Every reader returns a DataFrame; everything downstream is engine-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, types as T


@dataclass
class SourceSpec:
    """One row of the source-selection config (reference:
    config/<year>/in/source_selection.json)."""

    source_id: str
    fmt: str  # csv | json | parquet | pandas_files | events
    path: str
    options: dict = field(default_factory=dict)
    schema: T.StructType | None = None


_READERS: dict[str, Callable[[SparkSession, SourceSpec], DataFrame]] = {}


def register_source(fmt: str):
    def deco(fn):
        _READERS[fmt] = fn
        return fn

    return deco


def read_source(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    try:
        reader = _READERS[spec.fmt]
    except KeyError:
        raise ValueError(
            f"unknown source format {spec.fmt!r}; registered: {sorted(_READERS)}"
        ) from None
    return reader(spark, spec)


@register_source("csv")
def _csv(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    r = spark.read.options(header="true", **spec.options)
    if spec.schema is not None:
        r = r.schema(spec.schema)
    return r.csv(spec.path)


@register_source("json")
def _json(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    r = spark.read.options(**spec.options)
    if spec.schema is not None:
        r = r.schema(spec.schema)
    return r.json(spec.path)


@register_source("parquet")
def _parquet(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    r = spark.read.options(**spec.options)
    if spec.schema is not None:
        r = r.schema(spec.schema)
    return r.parquet(spec.path)


@register_source("pandas_files")
def _pandas_files(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    """Distributed ingest of pandas-only formats (xlsx/dta/...): the file
    list is parallelized; each partition parses whole files with pandas
    inside ``mapInPandas`` (Arrow-batched). ``spec.options['parser']``
    names the pandas reader (read_excel / read_stata / read_csv...).

    Reference analog: the excel/Stata adapters
    (/root/reference/etl/source_adapter/{excel,manual,wpa}.py:1-3).
    """
    import glob as _glob

    import pandas as _pd

    if spec.schema is None:
        raise ValueError("pandas_files requires an explicit schema")
    parser_name = spec.options.get("parser", "read_csv")
    # fail at PLAN time for a typo'd parser name, not inside an executor
    if not callable(getattr(_pd, parser_name, None)):
        raise ValueError(
            f"unknown pandas parser {parser_name!r} "
            "(expected a pandas reader such as read_csv/read_excel/read_stata)"
        )
    parser_kwargs = {
        k: v for k, v in spec.options.items() if k not in ("parser",)
    }
    files = sorted(_glob.glob(spec.path))
    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        max(len(files), 1)
    )
    schema = spec.schema
    wanted = [f.name for f in schema.fields]

    def parse(batches):
        import pandas as pd

        parser = getattr(pd, parser_name)
        for pdf in batches:
            for p in pdf["path"]:
                try:
                    out = parser(p, **parser_kwargs)
                except ImportError as e:
                    # surface optional-engine gaps (openpyxl etc.) clearly
                    # instead of a bare worker traceback
                    raise RuntimeError(
                        f"pandas parser {parser_name!r} needs an optional "
                        f"dependency that is missing on the workers while "
                        f"reading {p}: {e}"
                    ) from e
                missing = [c for c in wanted if c not in out.columns]
                if missing:
                    raise ValueError(
                        f"{p}: parsed columns {list(out.columns)} lack "
                        f"declared schema columns {missing}"
                    )
                yield out[wanted]

    return fdf.mapInPandas(parse, schema=schema)


@register_source("events")
def _events(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    """The change-stream tail as a batch source (epoch dirs)."""
    r = spark.read.options(**spec.options)
    if spec.schema is not None:
        r = r.schema(spec.schema)
    return r.option("basePath", spec.path).parquet(spec.path + "/epoch=*")
