"""Additive schema evolution (M5).

Mirrors the reference's edition-over-edition source/column drift handled
by config instead of code forks (staging inventories
``/root/reference/config/2020/in/data/staging/`` 45 files vs
``/root/reference/config/2023/in/data/staging/`` 31 files, new sources
added per edition — SURVEY.md §1.3): new payload columns (e.g. ``tool``)
may appear mid-stream. Policy: **additive only** — a new nullable column
widens the table schema; type changes and drops are rejected loudly.
Old data files are never rewritten; they project to the evolved schema
on read with nulls (icelite manifest schema + Spark parquet behavior —
the `unionByName(allowMissingColumns=True)` semantics at storage level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


class SchemaEvolutionError(ValueError):
    pass


def merge_schemas(table: T.StructType, batch: T.StructType) -> T.StructType:
    """Additive merge: table schema + any new batch columns (nullable).

    Raises on type conflicts — a CDC stream changing a column's type is a
    producer bug, not something to paper over silently.
    """
    by_name = {f.name: f for f in table.fields}
    out = list(table.fields)
    for f in batch.fields:
        cur = by_name.get(f.name)
        if cur is None:
            out.append(T.StructField(f.name, f.dataType, nullable=True))
        elif cur.dataType != f.dataType:
            raise SchemaEvolutionError(
                f"column {f.name!r}: incompatible type change "
                f"{cur.dataType.simpleString()} -> {f.dataType.simpleString()}"
            )
    return T.StructType(out)


def align_to(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project ``df`` to ``schema``: add missing columns as typed nulls,
    cast nothing, order columns per schema. Columns of ``df`` that are
    not in ``schema`` are dropped (caller merges schemas first if they
    must survive)."""
    have = set(df.columns)
    cols = []
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
