"""Deterministic interleaved-document derivation from the driver's `events`
table.

The driver's correctness gate (CORRECTNESS_r{N}.json) cross-checks Spark
queries against DuckDB SQL over the SAME parquet inputs — so the engine's
spans-shaped input table is derived *in-query* from `events` with pure
window/arithmetic SQL that both engines compute bit-identically:

  * one document per user_id, spans ordered by (ts, event_id);
  * span key     k(1 + event_id % 997)  — repeats across docs (hot cells);
  * kind         view->html, click->img, signup->js, purchase->redirect,
                 error-> empty|iframe (by value threshold);
  * media_ref    img/js -> previous span's key (referer/initiator);
                 redirect -> next span's key (forward pointer);
  * text         html embeds the next two keys, iframe the next one
                 (resource/frame extraction joins).

This exercises every cascade stage: redirect chains, frame children,
initiator, referer, resource and dedup-suppression (error spans whose key
collides with a valid span).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


KEY_MOD = 997
EMPTY_VALUE_CUTOFF = 8.0


def flat_spans_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat span rows (doc_id, span_idx, kind, text, media_ref, offset)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "doc_id", F.concat(F.lit("d"), F.col("user_id").cast("string"))
    )
    # window over doc_id (bijective with user_id, identical groups): the
    # downstream nest groupBy("doc_id") then reuses this exchange's
    # hashpartitioning instead of reshuffling the whole events table
    w = Window.partitionBy("doc_id").orderBy("ts", "event_id")
    key = F.concat(F.lit("k"), (1 + F.pmod(F.col("event_id"), F.lit(KEY_MOD))))
    base = ev.select(
        "doc_id",
        (F.row_number().over(w) - 1).alias("span_idx"),
        F.col("event_type"),
        F.col("value"),
        key.alias("key"),
        F.lag(key).over(w).alias("prev_key"),
        F.lead(key, 1).over(w).alias("next1"),
        F.lead(key, 2).over(w).alias("next2"),
    )
    kind = (
        F.when(F.col("event_type") == "view", "html")
        .when(F.col("event_type") == "click", "img")
        .when(F.col("event_type") == "signup", "js")
        .when(F.col("event_type") == "purchase", "redirect")
        .otherwise(
            F.when(F.col("value") < EMPTY_VALUE_CUTOFF, "empty").otherwise("iframe")
        )
    )
    out = base.select(
        "doc_id",
        "span_idx",
        kind.alias("kind"),
        F.when(kind == "html", F.concat_ws(" ", "key", "next1", "next2"))
        .when(kind == "iframe", F.concat_ws(" ", "key", "next1"))
        .otherwise(F.col("key"))
        .alias("text"),
        F.when(kind == "redirect", F.coalesce("next1", F.lit("")))
        .when(kind.isin("img", "js"), F.coalesce("prev_key", F.lit("")))
        .otherwise(F.lit(""))
        .alias("media_ref"),
        (F.col("span_idx") * 10).alias("offset"),
    )
    return out


def documents_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested documents(doc_id, spans) — the engine's input_hint shape."""
    return nest_spans(flat_spans_from_events(spark, sf_dir))


def nest_spans(flat: DataFrame) -> DataFrame:
    """(doc_id, span_idx, kind, text, media_ref, offset) flat rows ->
    documents(doc_id, spans) in span_idx order."""
    nested = (
        flat.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("span_idx", "kind", "text", "media_ref", "offset")
                    )
                ),
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].cast("int").alias("offset"),
                ),
            ).alias("spans")
        )
    )
    return nested.select(
        F.col("doc_id").cast("string").alias("doc_id"), F.col("spans")
    )


# ----------------------------------------------------------- DuckDB side ---
SQL_FLAT_SPANS = f"""
  base AS (
    SELECT 'd' || CAST(user_id AS VARCHAR) AS doc_id,
           CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS span_idx,
           event_type, value,
           'k' || CAST(1 + (event_id % {KEY_MOD}) AS VARCHAR) AS key,
           LAG('k' || CAST(1 + (event_id % {KEY_MOD}) AS VARCHAR)) OVER w AS prev_key,
           LEAD('k' || CAST(1 + (event_id % {KEY_MOD}) AS VARCHAR), 1) OVER w AS next1,
           LEAD('k' || CAST(1 + (event_id % {KEY_MOD}) AS VARCHAR), 2) OVER w AS next2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ),
  spans AS (
    SELECT doc_id, span_idx,
           CASE event_type
             WHEN 'view' THEN 'html'
             WHEN 'click' THEN 'img'
             WHEN 'signup' THEN 'js'
             WHEN 'purchase' THEN 'redirect'
             ELSE CASE WHEN value < {EMPTY_VALUE_CUTOFF} THEN 'empty' ELSE 'iframe' END
           END AS kind,
           key, prev_key, next1, next2,
           span_idx * 10 AS "offset",
           CAST(SUBSTR(key, 2, 18) AS BIGINT) AS key_num
    FROM base
  ),
  spans2 AS (
    SELECT doc_id, span_idx, kind, key, key_num, "offset",
           CASE WHEN kind = 'html' THEN concat_ws(' ', key, next1, next2)
                WHEN kind = 'iframe' THEN concat_ws(' ', key, next1)
                ELSE key END AS text,
           CASE WHEN kind = 'redirect' THEN COALESCE(next1, '')
                WHEN kind IN ('img', 'js') THEN COALESCE(prev_key, '')
                ELSE '' END AS media_ref,
           next1, next2,
           (kind <> 'empty') AS valid
    FROM spans
  ),
  live AS (
    SELECT s.*
    FROM spans2 s
    WHERE NOT (NOT s.valid AND EXISTS (
      SELECT 1 FROM spans2 t
      WHERE t.doc_id = s.doc_id AND t.key = s.key AND t.valid))
  ),
  roots AS (
    SELECT doc_id, span_idx AS root_idx
    FROM (SELECT doc_id, span_idx,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "offset", span_idx) AS rn
          FROM live)
    WHERE rn = 1
  )
"""
