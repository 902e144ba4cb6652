"""Fuzzy key resolution against a canonical universe (JOIN-CTRY, SURVEY
§2.3): the Spark re-expression of the reference's free-text country-name
resolution (``/root/reference/etl/methology/country.py:1-3`` over the
synonym table ``etl/resources/all_countrynames_list.json:3``): dirty
inbound keys (case drift, stray punctuation/whitespace, colloquial
aliases) are resolved to the canonical key set in two broadcast-join
tiers, and anything still unmatched is kept and labeled — never silently
dropped (the reference's "unknown code" audit).

Scale: both the canonical universe and the synonym table are dimension-
sized → broadcast joins, so the fact side never shuffles; normalization
is pure Catalyst string expressions inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def normalize_key(col) -> F.Column:
    """Canonicalize a dirty key: lowercase, strip everything but
    [a-z0-9 ], collapse whitespace runs, trim. Pure Catalyst; the DuckDB
    twin is ``trim(regexp_replace(regexp_replace(lower(x),
    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))``."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), "[^a-z0-9 ]", ""), " +", " "
        )
    )


def resolve_keys(
    df: DataFrame,
    key_col: str,
    canonical: DataFrame,
    canon_col: str,
    synonyms: DataFrame | None = None,
    alias_col: str = "alias",
    syn_canon_col: str = "canonical",
) -> DataFrame:
    """Resolve ``df[key_col]`` against the canonical key set.

    Tiers (first match wins):
    1. ``canonical`` — normalized exact match against the universe;
    2. ``synonyms`` — normalized match against an alias→canonical map;
    3. unresolved — ``resolved`` stays NULL, ``method = 'unresolved'``.

    Adds two columns: ``resolved`` (canonical key or NULL) and ``method``
    ('canonical' | 'canonical_ambiguous' | 'synonym' |
    'synonym_ambiguous' | 'unresolved'). Both lookup sides are broadcast;
    the input keeps all its columns and EXACTLY its rows: each lookup
    side is collapsed to one row per normalized key before the join
    (deterministic min-canonical winner), so two canonical keys — or two
    synonym targets — that normalize to the same string can never fan an
    input row out into duplicates; such collisions surface as the
    ``*_ambiguous`` method label instead.
    """
    canon = F.broadcast(
        canonical.select(
            normalize_key(F.col(canon_col)).alias("_norm"),
            F.col(canon_col).alias("_canon"),
        )
        .groupBy("_norm")
        .agg(
            F.min("_canon").alias("_canon"),
            (F.count_distinct("_canon") > 1).alias("_canon_amb"),
        )
    )
    out = df.withColumn("_norm", normalize_key(F.col(key_col))).join(
        canon, "_norm", "left"
    )
    if synonyms is not None:
        syn = F.broadcast(
            synonyms.select(
                normalize_key(F.col(alias_col)).alias("_norm"),
                F.col(syn_canon_col).alias("_syn_canon"),
            )
            .groupBy("_norm")
            .agg(
                F.min("_syn_canon").alias("_syn_canon"),
                (F.count_distinct("_syn_canon") > 1).alias("_syn_amb"),
            )
        )
        out = out.join(syn, "_norm", "left")
    else:
        out = out.withColumn("_syn_canon", F.lit(None).cast("string")).withColumn(
            "_syn_amb", F.lit(False)
        )
    return out.select(
        *df.columns,
        F.coalesce("_canon", "_syn_canon").alias("resolved"),
        F.when(
            F.col("_canon").isNotNull(),
            F.when(F.col("_canon_amb"), "canonical_ambiguous").otherwise("canonical"),
        )
        .when(
            F.col("_syn_canon").isNotNull(),
            F.when(F.col("_syn_amb"), "synonym_ambiguous").otherwise("synonym"),
        )
        .otherwise("unresolved")
        .alias("method"),
    )


def unresolved_audit(resolved_df: DataFrame, key_col: str) -> DataFrame:
    """Distinct unresolved raw keys with occurrence counts — the
    reference's unknown-code report (left_anti shape via the method
    label; SURVEY §2.2 FILT-UNKNOWN)."""
    return (
        resolved_df.filter(F.col("method") == "unresolved")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
