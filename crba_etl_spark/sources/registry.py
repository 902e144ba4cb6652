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


def _xlsx_parser(path, **kwargs):
    """Stdlib .xlsx reader (see sources/xlsx.py) — openpyxl-free, so
    SRC-XLS works in environments where pandas.read_excel cannot."""
    from .xlsx import read_xlsx

    return read_xlsx(path, **kwargs)


#: parsers resolvable by name in ``pandas_files`` that are NOT pandas
#: attributes — each takes (path, **kwargs) and returns a pd.DataFrame
CUSTOM_PARSERS: dict[str, Callable] = {"xlsx": _xlsx_parser}


@register_source("pandas_files")
def _pandas_files(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    """Distributed ingest of pandas-only formats (xlsx/dta/...): the file
    list is parallelized; each partition parses whole files with pandas
    inside ``mapInPandas`` (Arrow-batched). ``spec.options['parser']``
    names either a pandas reader (read_excel / read_stata / read_csv...)
    or a CUSTOM_PARSERS entry ('xlsx' → the stdlib zip+XML sheet reader).

    Reference analog: the excel/Stata adapters
    (/root/reference/etl/source_adapter/{excel,manual,wpa}.py:1-3).
    """
    import glob as _glob

    import pandas as _pd

    if spec.schema is None:
        raise ValueError("pandas_files requires an explicit schema")
    parser_name = spec.options.get("parser", "read_csv")
    # fail at PLAN time for a typo'd parser name, not inside an executor
    if parser_name not in CUSTOM_PARSERS and not callable(
        getattr(_pd, parser_name, None)
    ):
        raise ValueError(
            f"unknown parser {parser_name!r} (expected a pandas reader such "
            f"as read_csv/read_stata, or one of {sorted(CUSTOM_PARSERS)})"
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

        from crba_etl_spark.sources.registry import CUSTOM_PARSERS as _custom

        parser = _custom.get(parser_name) or getattr(pd, parser_name)
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


@register_source("api")
def _api(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    """Paginated HTTP API ingest (SRC-API-UN/WHO/ILO/WB, SURVEY §2.1):
    the page-URL list is the parallelism unit — each partition fetches
    its URLs with stdlib urllib (retry + exponential backoff) and parses
    the payload (json records / csv) to the declared schema inside
    ``mapInPandas``. ``file://`` URLs go through the identical code path,
    which is how the offline tests drive it (the sandbox has no network;
    the reference analog is the per-source API adapter classes,
    /root/reference/etl/source_adapter/api.py:1-3).

    options:
      urls         explicit page-URL list (else ``spec.path`` is the one URL)
      payload      'json' (default) or 'csv'
      record_path  key holding the record list in a JSON payload
      retries      fetch attempts per URL (default 3)
    """
    if spec.schema is None:
        raise ValueError("api source requires an explicit schema")
    urls = list(spec.options.get("urls") or [spec.path])
    payload = spec.options.get("payload", "json")
    if payload not in ("json", "csv"):
        raise ValueError(f"api payload must be json|csv, got {payload!r}")
    record_path = spec.options.get("record_path")
    retries = int(spec.options.get("retries", 3))
    schema = spec.schema
    wanted = [f.name for f in schema.fields]

    udf_input = spark.createDataFrame([(u,) for u in urls], "url string").repartition(
        max(len(urls), 1)
    )

    def fetch(batches):
        import io
        import json as _json
        import time as _time
        import urllib.error
        import urllib.request

        import pandas as pd

        def get(url: str) -> bytes:
            last: Exception | None = None
            for attempt in range(retries):
                try:
                    with urllib.request.urlopen(url, timeout=30) as r:
                        return r.read()
                except (urllib.error.URLError, OSError, TimeoutError) as e:
                    last = e
                    _time.sleep(min(2**attempt * 0.1, 2.0))
            raise RuntimeError(
                f"api fetch failed after {retries} attempts: {url}: {last}"
            )

        for pdf in batches:
            for url in pdf["url"]:
                raw = get(url)
                if payload == "json":
                    doc = _json.loads(raw)
                    recs = doc[record_path] if record_path else doc
                    out = pd.json_normalize(recs)
                else:
                    out = pd.read_csv(io.BytesIO(raw))
                missing = [c for c in wanted if c not in out.columns]
                if missing:
                    raise ValueError(
                        f"{url}: payload columns {list(out.columns)} lack "
                        f"declared schema columns {missing}"
                    )
                yield out[wanted]

    return udf_input.mapInPandas(fetch, schema=schema)


@register_source("events")
def _events(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    """The change-stream tail as a batch source (epoch dirs)."""
    r = spark.read.options(**spec.options)
    if spec.schema is not None:
        r = r.schema(spec.schema)
    return r.option("basePath", spec.path).parquet(spec.path + "/epoch=*")
