"""Record-shaping scalar functions (SURVEY.md F12/F13).

* F13 — header flatten: the reference stores HTTP headers as a flat
  alternating array ``[K1, V1, K2, V2, …]`` with uppercased keys
  (``/root/reference/starbelly/storage.py:90-94``).
* F12 — MIME parse: content-type → (type, subtype) columns
  (``extractor.py:147``, ``storage.py:23``).

Pure JVM column expressions (map_entries/transform/flatten — no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def header_flatten_expr(map_col: Column) -> Column:
    """map<string,string> → array [K1, V1, …] with uppercased keys."""
    return F.flatten(
        F.transform(
            F.map_entries(map_col),
            lambda e: F.array(F.upper(e.getField("key")), e.getField("value")),
        )
    )


def mime_type_expr(content_type_col: Column) -> Column:
    """'text/html; charset=x' → 'text' (F12)."""
    return F.lower(F.split(F.split(content_type_col, ";").getItem(0), "/").getItem(0))


def mime_subtype_expr(content_type_col: Column) -> Column:
    return F.lower(
        F.trim(F.split(F.split(content_type_col, ";").getItem(0), "/").getItem(1))
    )
