"""Config-driven source registry.

The reference selects sources per edition from ``source_selection.json``
and builds one adapter per source through a factory
(``/root/reference/etl/source_adapter/__init__.py:1-3`` — SRC-FACTORY,
SURVEY.md §2.1; abstract template ``abstract.py:1-3``). Here the same
pattern is a registry of reader functions keyed by format, each returning
a DataFrame, plus a ``read_source(spark, spec)`` entry point driven by a
plain dict (the config row).
"""

from .registry import SourceSpec, read_source, register_source

__all__ = ["SourceSpec", "read_source", "register_source"]
