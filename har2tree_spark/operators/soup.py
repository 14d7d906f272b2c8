"""Markup parse + JS-redirect extraction — the F17/F18/F19/F26 family.

The reference parses each rendered body with BeautifulSoup (reference
helper.py:283-294), walks tags/attributes for external resources
(helper.py:356-466), hashes the tag-name sequence into a domhash
(nodes.py:83-85) and scans script bodies for JS redirects, which count as
redirects only when the target resolves against the document's known-URL
universe (nodes.py:573-590).

Re-grounded Spark-first: the markup grammar of the synthetic bodies is
regular, so tag/attribute extraction is `regexp_extract_all` — pure JVM
codegen, no Python soup in the hot path (the reference's own profiling
notes name soup parsing as its dominant cost; at 100 TB a per-row Python
HTML parser is exactly what this engine must not do). A real-world HTML
corpus with a non-regular grammar would swap in an lxml `mapInPandas`
behind the same column contract — the plumbing (schema, joins, gates)
stays identical.

  * soup_features  — tag sequence, lowercased; domhash = first 32 hex of
                     sha256 of the '|'-joined tag names (F26 contract);
                     resource surface (F18) = the reference's full
                     attribute set src/srcset/longdesc/poster/href/data
                     (helper.py:356-426) PLUS the CSS arms — url(...)
                     functions and @import url/string preludes
                     (helper.py:300-353) — concatenated in that order.
  * js_redirects   — regex over the body for location.href / .replace /
                     .assign and meta-refresh url= targets (F19), then a
                     per-doc semi-join against the span-key universe: a
                     target that resolves is a redirect edge
                     (redirect_url); one that does not is flagged
                     redirect_to_nothing (F20 nodes.py:626-641 contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TAG_RE = "<([a-zA-Z][a-zA-Z0-9]*)"
# the reference's attribute surface: img(src srcset longdesc) script(src)
# video(poster src) audio/iframe/embed/source(src[set]) link(href)
# object(data) — helper.py:356-426
ATTR_RE = '\\b(?:src|srcset|longdesc|poster|href|data)="([^"]*)"'
# CSS url() function tokens + @import url/string preludes (helper.py:300-353)
CSS_URL_RE = "url\\(['\"]?([^'\")]+)['\"]?\\)"
CSS_IMPORT_RE = "@import\\s+['\"]([^'\"]+)['\"]"
JS_REDIRECT_RE = r"location\.(?:href\s*=|replace\(|assign\()\s*'([^']*)'"
META_REFRESH_RE = 'http-equiv="refresh"[^>]*url=([^">]*)'


def _extract_all(body: Column, pattern: str) -> Column:
    return F.regexp_extract_all(body, F.lit(pattern), F.lit(1))


def soup_features(df: DataFrame, body_col: str = "body") -> DataFrame:
    """Adds (tags, domhash, res_refs, n_tags, n_res) for a markup column.
    ``res_refs`` = attribute refs ++ CSS url() refs ++ @import refs, in
    that deterministic order (the reference appends per category too)."""
    body = F.col(body_col)
    tags = F.transform(_extract_all(body, TAG_RE), F.lower)
    df = df.withColumn("tags", tags)
    res = F.concat(
        _extract_all(body, ATTR_RE),
        _extract_all(body, CSS_URL_RE),
        _extract_all(body, CSS_IMPORT_RE),
    )
    return (
        df.withColumn(
            "domhash",
            F.when(
                F.size("tags") > 0,
                F.substring(F.sha2(F.concat_ws("|", "tags"), 256), 1, 32),
            ),
        )
        .withColumn("res_refs", res)
        .withColumn("n_tags", F.size("tags"))
        .withColumn("n_res", F.size("res_refs"))
    )


def js_redirects(
    df: DataFrame,
    features: DataFrame,
    body_col: str = "body",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Per span: the first JS-redirect / meta-refresh target found in the
    body, resolved against the doc's key universe.

    Returns (doc_id, span_idx, redirect_url, redirect_kind) where
    redirect_kind is 'js' | 'meta' | null and redirect_url is null when
    the target does not resolve (redirect_to_nothing: flagged, kept).
    The universe join ships only (doc_id, key) — hash early, join small.
    """
    body = F.col(body_col)
    js_t = F.regexp_extract(body, JS_REDIRECT_RE, 1)
    meta_t = F.regexp_extract(body, META_REFRESH_RE, 1)
    cand = df.select(
        doc_col,
        "span_idx",
        F.when(js_t != "", js_t)
        .when(meta_t != "", meta_t)
        .alias("target"),
        F.when(js_t != "", "js").when(meta_t != "", "meta").alias("redirect_kind"),
    ).filter(F.col("target").isNotNull())
    universe = (
        features.filter(F.col("key").isNotNull())
        .select(doc_col, F.col("key").alias("target"))
        .dropDuplicates()
    )
    return (
        cand.join(
            universe.withColumn("resolved", F.lit(True)),
            [doc_col, "target"],
            "left",
        )
        .select(
            doc_col,
            "span_idx",
            F.when(F.col("resolved"), F.col("target")).alias("redirect_url"),
            "redirect_kind",
            F.coalesce(~F.col("resolved"), F.lit(True)).alias(
                "redirect_to_nothing"
            ),
        )
    )
