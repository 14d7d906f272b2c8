"""Small scalar/array helper functions (the reference's helper.py family).

  * ``header_lookup``  — F8 (reference helper.py get_header_value +
    nodes.py header scans): first value in an array<struct<name,value>>
    whose name matches case-insensitively; null when absent. Pure
    higher-order functions — no explode, no shuffle, no UDF.
  * ``ref_cleanup``    — F16 url_cleanup drop-rules + P4 local-only
    predicate (reference helper.py:130-201 rewrite rules; har2tree.py's
    local-URL skip): strip wrapping quotes/whitespace, truncate at the
    first internal whitespace, drop refs whose prefix class can never
    resolve in the key universe. Returns (clean_ref, drop_reason) — a
    null clean_ref always carries a reason, mirroring the reference's
    quarantine-not-fail posture.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# prefix classes that can never resolve in the key universe (the
# about:blank / file:// / data: skip-list analogue)
LOCAL_PREFIXES = ("local:", "about:", "data:")


def header_lookup(headers: Column, name: str) -> Column:
    """First ``value`` whose ``name`` matches case-insensitively."""
    hits = F.filter(headers, lambda h: F.lower(h["name"]) == F.lit(name.lower()))
    return F.get(hits, 0)["value"]


def ref_cleanup(ref: Column) -> tuple[Column, Column]:
    """(clean_ref, drop_reason) for a raw ref string."""
    base = F.trim(F.coalesce(ref, F.lit("")))
    # strip one layer of wrapping quotes (the reference strips quotes and
    # backslashes that crawlers leave around attribute values)
    unq = F.when(
        base.rlike("^\".*\"\\z") | base.rlike("^'.*'\\z"),
        F.trim(F.substring(base, 2, F.length(base) - 2)),
    ).otherwise(base)
    # truncate at the first internal whitespace (mangled concatenations)
    first = F.split_part(unq, F.lit(" "), F.lit(1))
    is_local = None
    for p in LOCAL_PREFIXES:
        cond = first.startswith(p)
        is_local = cond if is_local is None else (is_local | cond)
    reason = (
        F.when(first == "", "empty")
        .when(is_local, "local_only")
        .otherwise(F.lit(None).cast("string"))
    )
    clean = F.when(reason.isNull(), first)
    return clean, reason
